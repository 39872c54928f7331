"""Distributed dense global-sort rank (no single-partition window).

`Window.orderBy(col)` with no partition spec moves ALL rows to one task —
the classic "No Partition Defined" scale-killer. This helper produces the
exact same rank with a two-phase construction: range-partition by the sort
key (disjoint, ordered ranges by the range partitioner's contract), rank
within each partition, then add per-partition offsets (one tiny collect of
partition counts). Deterministic and cluster-size-independent — never
monotonically_increasing_id, whose values depend on partition layout.

Every vertex-dictionary build in the engine (entity_vertices,
events_vertices, streaming compaction, migration fresh-id assignment) goes
through here, so the entity dictionary never funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_sorted_rank(
    df: DataFrame,
    order_col: str,
    id_col: str = "id",
    partitions: int = 64,
    checkpoint: bool = True,
) -> DataFrame:
    """Add `id_col` = 0-based global rank of `order_col` (ascending).

    Input rows must be distinct on order_col for the rank to be a dense id
    (callers pass dictionaries, which are). Output keeps all input columns.
    """
    # cache the (small) dictionary: the range partitioner runs a separate
    # sampling job over its input, which would otherwise re-execute the
    # caller's whole distinct/shuffle lineage a second time (the sampling
    # job itself materializes the cache — no extra count pass)
    src = df.persist()
    # eager localCheckpoint (NOT persist): the collected per-partition
    # counts bake this exact layout into the offset expression, and a
    # persisted frame whose cached blocks are evicted would re-run the
    # range sampler and may pick different boundaries — silently wrong ids.
    # Checkpoint blocks are never recomputed: lost blocks FAIL the job
    # instead, and are freed with the frame (no persist leak in either
    # checkpoint branch).
    parts = (
        src.repartitionByRange(partitions, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    src.unpersist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    off_expr = F.lit(0)
    acc = 0
    for pid in sorted(counts):
        if acc:
            off_expr = F.when(F.col("_pid") == pid, F.lit(acc)).otherwise(off_expr)
        acc += counts[pid]
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = parts.select(
        (F.row_number().over(w) - 1 + off_expr).cast("long").alias(id_col),
        *[c for c in df.columns],
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
    return out
