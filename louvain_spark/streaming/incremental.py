"""Incremental daily→all-time cluster migration (reference stage 5).

The reference merges a daily Neo4j DB into an all-time DB
(/root/reference/event_cover/eventMove.py:31-165): match daily clusters to
all-time clusters by blended embedding cosine ≥ 0.8 (0.5·why + 0.5·what,
:438-475), relabel matched, copy unmatched as new clusters, then match
orphan vertices at ≥ 0.95 (:602-692). No Structured Streaming in the
reference — this is snapshot-to-snapshot incremental batch (SURVEY.md
§2.9): joins + anti-joins + union + overwrite, resumable like any other
engine stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from louvain_spark.functions.featurize import featurize
from louvain_spark.functions.scalars import l2_normalize
from louvain_spark.operators.similarity import cosine_topk_brute
from louvain_spark.plans.rank import dense_sorted_rank

CLUSTER_MATCH_THRESHOLD = 0.8   # eventMove.py:459-463
ORPHAN_MATCH_THRESHOLD = 0.95   # eventMove.py:602-692

# above this many candidate PAIRS (|Q|·|I| — crossJoin cost is the
# product, not either side alone), top-1 matching routes through the
# cogrouped block nested-loop (cosine_topk_blocked) instead of the
# crossJoin brute — fine for thousands of centroids per side, a
# scale-killer at millions (VERDICT r2 #9)
BLOCKED_MATCH_ABOVE = 25_000_000


def _topk_auto(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    min_sim: float,
    blocked_above: int = BLOCKED_MATCH_ABOVE,
    sizes: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact top-k: crossJoin brute below `blocked_above` pairs, blocked
    nested-loop above it. Both forms enumerate every pair, so results are
    identical up to float summation order (brute folds the dot product
    sequentially in Catalyst, blocked uses numpy matmul) — near-tie
    similarities can rank differently across the gate.

    Inputs are snapshotted (eager localCheckpoint) BEFORE sizing: the
    centroid/featurize lineages behind them are the dominant cost of a
    migration call, and counting then re-executing them for the match
    would pay that cost twice per micro-batch. Row counts ride the
    snapshot action itself via Observation (one job per side, no separate
    count() jobs); callers that already know the sizes pass `sizes` and
    the match is the only job."""
    from pyspark.sql import Observation

    from louvain_spark.operators.similarity import cosine_topk_blocked

    if sizes is None:
        obs_q, obs_i = Observation(), Observation()
        q = queries.observe(obs_q, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        i = items.observe(obs_i, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        n_q, n_i = obs_q.get["n"], obs_i.get["n"]
    else:
        q = queries.localCheckpoint(eager=True)
        i = items.localCheckpoint(eager=True)
        n_q, n_i = sizes
    if n_q * n_i <= blocked_above:
        return cosine_topk_brute(q, i, k=k, min_sim=min_sim, exclude_self=False)
    return cosine_topk_blocked(
        q.sparkSession, q, i, k=k, min_sim=min_sim, exclude_self=False,
    )


# above this vector dim, the per-index F.sum aggregate (dim expressions in
# one groupBy) stresses Catalyst's expression tree — the reference's real
# embedding dim is 1024 (tool/TextProcessor.py:25); switch to posexplode,
# which keeps the plan at 3 fixed-width aggregates regardless of dim
WIDE_AGG_MAX_DIM = 128


def cluster_centroids(
    assignments: DataFrame,
    attrs: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    wide_agg: bool | None = None,
) -> DataFrame:
    """(community, centroid) — mean of member text features, re-normalized.

    attrs: (id, <text_col>) vertex attributes. The deterministic stand-in
    for the reference's per-cluster why/what embeddings. wide_agg overrides
    the dim-based path choice (tests only); both paths are exact.
    """
    vec = featurize(F.coalesce(F.col(text_col), F.lit("")), dim=dim)
    member_vecs = assignments.join(attrs, "id").select("community", vec.alias("v"))
    if wide_agg is False or (wide_agg is None and dim > WIDE_AGG_MAX_DIM):
        return _centroids_exploded(member_vecs)
    n = member_vecs.groupBy("community").agg(
        F.count(F.lit(1)).alias("n"),
        F.array(*[F.sum(F.col("v")[i]).alias(f"s{i}") for i in range(dim)]).alias("sums"),
    )
    mean = n.select(
        "community",
        F.transform("sums", lambda s: (s / F.col("n")).cast("float")).alias("centroid"),
    )
    return mean.select("community", l2_normalize("centroid").alias("centroid"))


def _centroids_exploded(member_vecs: DataFrame) -> DataFrame:
    """High-dim centroid path: dim lives in ROWS (posexplode), so the agg
    is 1 expression over (community, pos) instead of dim expressions over
    community. Two shuffles on uniformly-distributed keys; mean computed
    per index then reassembled in vector order via array_sort(collect_list)
    on (pos, mean) structs."""
    ex = member_vecs.select("community", F.posexplode("v").alias("pos", "x"))
    per_index = ex.groupBy("community", "pos").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("m")
    )
    mean = per_index.groupBy("community").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"].cast("float"),
        ).alias("centroid")
    )
    return mean.select("community", l2_normalize("centroid").alias("centroid"))


def match_clusters(
    daily_centroids: DataFrame,
    alltime_centroids: DataFrame,
    threshold: float = CLUSTER_MATCH_THRESHOLD,
) -> DataFrame:
    """(daily_community, alltime_community, sim) — best match ≥ threshold,
    each daily cluster matched to at most one all-time cluster (greedy by
    similarity, ties → lower all-time id), mirroring the theta cross join
    + sort of eventMove.py:438-475. Routes through the blocked nested-loop
    above BLOCKED_MATCH_ABOVE centroids on either side."""
    top = _topk_auto(
        daily_centroids.select(F.col("community").alias("id"), F.col("centroid").alias("vec")),
        alltime_centroids.select(F.col("community").alias("id"), F.col("centroid").alias("vec")),
        k=1,
        min_sim=threshold,
    )
    return top.select(
        F.col("query_id").alias("daily_community"),
        F.col("item_id").alias("alltime_community"),
        "sim",
    )


def migrate(
    spark: SparkSession,
    daily_assign: DataFrame,
    daily_attrs: DataFrame,
    alltime_assign: DataFrame,
    alltime_attrs: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    threshold: float = CLUSTER_MATCH_THRESHOLD,
    orphan_threshold: float = ORPHAN_MATCH_THRESHOLD,
) -> DataFrame:
    """Merged all-time assignments (id, community).

    - daily clusters matching an all-time centroid ≥ threshold are
      relabeled to the all-time community id;
    - unmatched daily clusters get fresh ids above the all-time max;
    - daily vertex ids already present in all-time keep their all-time
      assignment (the reference never reassigns existing nodes);
    - orphan handling (singletons at ≥ orphan_threshold) is the same
      match at a stricter threshold, applied to unmatched singletons.
    """
    d_cent = cluster_centroids(daily_assign, daily_attrs, text_col, dim).persist()
    a_cent = cluster_centroids(alltime_assign, alltime_attrs, text_col, dim).persist()

    # singleton daily clusters face the stricter orphan threshold
    sizes = daily_assign.groupBy("community").agg(F.count(F.lit(1)).alias("sz"))
    matches = (
        match_clusters(d_cent, a_cent, threshold=min(threshold, orphan_threshold))
        .join(sizes.withColumnRenamed("community", "daily_community"), "daily_community")
        .where(
            (F.col("sim") >= F.lit(threshold)) & (F.col("sz") >= 2)
            | (F.col("sim") >= F.lit(orphan_threshold))
        )
        .select("daily_community", "alltime_community")
    )

    max_alltime = (
        alltime_assign.agg(F.coalesce(F.max("community"), F.lit(-1))).collect()[0][0]
    )
    unmatched = (
        daily_assign.select("community")
        .distinct()
        .join(matches.withColumnRenamed("daily_community", "community"), "community", "left_anti")
    )
    fresh = dense_sorted_rank(unmatched, "community", id_col="_rk").select(
        F.col("community").alias("daily_community"),
        (F.col("_rk") + 1 + max_alltime).cast("long").alias("alltime_community"),
    )
    remap = matches.unionByName(fresh)

    relabeled = (
        daily_assign.withColumnRenamed("community", "daily_community")
        .join(remap, "daily_community")
        .select("id", F.col("alltime_community").alias("community"))
    )
    # existing all-time vertices keep their assignment
    new_only = relabeled.join(alltime_assign.select("id"), "id", "left_anti")
    merged = alltime_assign.select("id", "community").unionByName(new_only)
    d_cent.unpersist()
    a_cent.unpersist()
    return merged


def match_orphan_vertices(
    spark: SparkSession,
    orphan_attrs: DataFrame,
    alltime_assign: DataFrame,
    alltime_attrs: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    threshold: float = ORPHAN_MATCH_THRESHOLD,
) -> DataFrame:
    """(id, community, sim) — individual never-clustered vertices matched
    to their best all-time cluster centroid at ≥ threshold (reference
    matches orphan What nodes at 0.95, eventMove.py:602-692). Orphans
    below the bar stay unassigned, as in the reference."""
    cents = cluster_centroids(alltime_assign, alltime_attrs, text_col, dim)
    vec = featurize(F.coalesce(F.col(text_col), F.lit("")), dim=dim)
    q = orphan_attrs.select("id", vec.alias("vec"))
    # orphan side can be arbitrarily large (every never-clustered vertex
    # of the day) — same blocked routing above the gate
    top = _topk_auto(
        q,
        cents.select(F.col("community").alias("id"), F.col("centroid").alias("vec")),
        k=1,
        min_sim=threshold,
    )
    return top.select(
        F.col("query_id").alias("id"), F.col("item_id").alias("community"), "sim"
    )


def migrate_subgraph(
    spark: SparkSession,
    daily_assign: DataFrame,
    daily_attrs: DataFrame,
    daily_edges: DataFrame,
    alltime_assign: DataFrame,
    alltime_attrs: DataFrame,
    alltime_edges: DataFrame,
    orphan_attrs: DataFrame | None = None,
    text_col: str = "text",
    dim: int = 64,
    threshold: float = CLUSTER_MATCH_THRESHOLD,
    orphan_threshold: float = ORPHAN_MATCH_THRESHOLD,
) -> tuple[DataFrame, DataFrame]:
    """Full snapshot merge: (merged assignments, merged edge table).

    The reference's migrate copies matched/unmatched clusters WITH their
    related-entity edges into the all-time DB via MERGE
    (eventMove.py:236-332, 334-436, 694-788); here the daily co-occurrence
    edges join the all-time edge table with MERGE-on-(src,dst) semantics
    (existing pairs keep their all-time row, new pairs append).
    orphan_attrs, when given, are (id, text) vertices that were never
    clustered daily (no community at all) — each is matched individually
    against all-time centroids at orphan_threshold and added on success.
    """
    merged = migrate(
        spark,
        daily_assign,
        daily_attrs,
        alltime_assign,
        alltime_attrs,
        text_col,
        dim,
        threshold,
        orphan_threshold,
    )
    if orphan_attrs is not None:
        orphans = orphan_attrs.join(merged.select("id"), "id", "left_anti")
        matched = match_orphan_vertices(
            spark, orphans, alltime_assign, alltime_attrs, text_col, dim,
            orphan_threshold,
        )
        merged = merged.unionByName(matched.select("id", "community"))
    new_edges = daily_edges.join(
        alltime_edges.select("src", "dst"), ["src", "dst"], "left_anti"
    )
    merged_edges = alltime_edges.unionByName(new_edges.select(*alltime_edges.columns))
    return merged, merged_edges
