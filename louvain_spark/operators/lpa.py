"""Synchronous weighted label propagation (SURVEY.md §2.8).

Superstep: neighbor-label histogram groupBy(node, label).sum(w) → argmax
with deterministic tie-break (max weight, then MIN label) via one window;
all nodes update simultaneously; stop at fixpoint or max_iter (synchronous
LPA can 2-cycle on bipartite-ish structures — max_iter bounds it, and the
moved-count is recorded per superstep in the ledger).
Oracle: seeded synchronous numpy/dict reimplementation with the same
tie-break (tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from louvain_spark.operators.graph import symmetrize, vertex_ids
from louvain_spark.plans.loop import StepResult, SuperstepRunner


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    weight_col: str | None = "weight",
    max_iter: int = 20,
    runner: SuperstepRunner | None = None,
    broadcast_nodes: int = 4_000_000,
    start_state: DataFrame | None = None,
) -> DataFrame:
    """assignments(id, community) — community = converged label (init: own id).

    Pass (runner, start_state) from SuperstepRunner.resume to continue an
    interrupted run mid-iteration from its last durable checkpoint.

    Below broadcast_nodes vertices the per-superstep label table ships as
    broadcast hash joins (one shuffle per superstep: the histogram
    groupBy); above it, shuffle joins.
    """
    if runner is None:
        runner = SuperstepRunner(spark, "adhoc", "lpa")

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    adj = symmetrize(edges.select("src", "dst", w.cast("double").alias("w")), "w").persist()
    adj.count()
    ids = vertex_ids(edges, vertices).persist()
    jb = F.broadcast if ids.count() <= broadcast_nodes else (lambda df: df)

    if start_state is not None:
        labels = start_state
    else:
        labels = ids.select("id", F.col("id").alias("community"))
        labels = runner.advance(StepResult(labels))

    for _ in range(max_iter):
        hist = (
            adj.join(
                jb(labels.select(F.col("id").alias("dst"), F.col("community").alias("nbr_label"))),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("nbr_label"))
            .agg(F.sum("w").alias("s"))
        )
        win = Window.partitionBy("id").orderBy(F.col("s").desc(), F.col("nbr_label").asc())
        best = (
            hist.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("id", F.col("nbr_label").alias("new_label"))
        )
        # labels spans exactly the vertex set (initialized from ids,
        # preserved by construction) — joining ids back in would be a
        # third join of pure per-superstep serial floor
        new_labels = labels.join(jb(best), "id", "left").select(
            "id", F.coalesce("new_label", "community").alias("community"),
            (F.coalesce("new_label", "community") != F.col("community")).alias("_moved"),
        )
        # moved-count rides the checkpoint action — one job per superstep
        obs = Observation()
        observed = new_labels.observe(
            obs, F.coalesce(F.sum(F.col("_moved").cast("long")), F.lit(0)).alias("moved")
        )
        labels = runner.advance(
            StepResult(
                observed.select("id", "community"), observation=obs, moved_key="moved"
            )
        )
        moved = int(obs.get["moved"])
        if moved == 0:
            break
    adj.unpersist()
    ids.unpersist()
    return labels
