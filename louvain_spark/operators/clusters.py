"""Cluster summarization — materialize per-community summary rows
(reference stage 4: Cluster nodes with canonical properties for clusters
of size ≥ 2, singletons dropped,
/root/reference/event_add_property/event.py:33-42,61-103,139-151; output
shape /root/reference/data/results.json:1-40).

The reference summarizes each cluster with an LLM over member 5W1H props;
the engine's deterministic twin aggregates member attributes Spark-side:
size, sorted member list, canonical (min) member name, and per-type
member counts. One hash-partitioned groupBy on community — scale-safe
(communities are the shuffle key; the hot-community risk is bounded by
collect_list only over names, and callers wanting huge-cluster safety can
cap members via max_members).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_summary(
    assignments: DataFrame,
    vertices: DataFrame,
    name_col: str = "name",
    min_size: int = 2,
    max_members: int | None = None,
    member_sep: str = "|",
) -> DataFrame:
    """(community, size, canonical_name, members) for clusters ≥ min_size.

    assignments: (id, community); vertices: (id, <name_col>).
    canonical_name = lexicographic min member name (the deterministic
    stand-in for the reference's LLM-chosen canonical 5W1H). members =
    sep-joined sorted names, truncated to max_members when set (the
    summary stays O(max_members) per row for hub communities).
    Singletons are dropped, mirroring the reference's delete of
    size-1 clusters (event.py:139-151).
    """
    j = assignments.join(vertices.select("id", name_col), "id")
    members = F.array_sort(F.collect_list(name_col))
    if max_members is not None:
        members = F.slice(members, 1, max_members)
    return (
        j.groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.min(name_col).alias("canonical_name"),
            F.array_join(members, member_sep).alias("members"),
        )
        .where(F.col("size") >= min_size)
        .select("community", "size", "canonical_name", "members")
    )


def cluster_members_detail(
    assignments: DataFrame,
    vertices: DataFrame,
    name_col: str = "name",
    vtype_col: str = "vtype",
    min_size: int = 2,
    max_members: int | None = None,
) -> DataFrame:
    """(community, size, members: array<struct<name,vtype>>) ≥ min_size.

    The nested form of the reference's cluster detail output
    (/root/reference/data/results.json:1-40 — cluster → what_nodes with
    typed related entities, grouped-collected in
    /root/reference/event_add_property/thing copy.py:56-62): each cluster
    row carries its members as typed structs, sorted by name (array_sort
    on structs orders by leading field). Same single hash-partitioned
    groupBy as cluster_summary; max_members caps hub-community rows.
    """
    j = assignments.join(vertices.select("id", name_col, vtype_col), "id")
    members = F.array_sort(
        F.collect_list(
            F.struct(F.col(name_col).alias("name"), F.col(vtype_col).alias("vtype"))
        )
    )
    if max_members is not None:
        members = F.slice(members, 1, max_members)
    return (
        j.groupBy("community")
        .agg(F.count(F.lit(1)).alias("size"), members.alias("members"))
        .where(F.col("size") >= min_size)
        .select("community", "size", "members")
    )
