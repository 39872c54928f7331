"""PageRank as superstep joins + aggregations (SURVEY.md §2.8).

ranks init 1/N; per superstep: contribs = edges ⋈ ranks on src →
rank·w/out_strength per dst → groupBy(dst).sum; damping
(1-d)/N + d·(contribs + dangling_mass/N); iterate until L∞ < tol.
Dangling mass handled via one scalar aggregation per superstep.
Oracle: numpy power iteration, allclose 1e-6 (BASELINE.md).

Scale notes: ranks and out-strengths are (id, value) tables shuffled on
id; the contrib join is the only wide op per superstep and AQE's skew
split covers hot dst ids. Convergence scalar = one tiny agg per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from louvain_spark.operators.graph import symmetrize, vertex_ids
from louvain_spark.plans.loop import StepResult, SuperstepRunner


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 100,
    weight_col: str | None = "weight",
    directed: bool = False,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """scores(id, score) summing to 1.0 at convergence."""
    if runner is None:
        runner = SuperstepRunner(spark, "adhoc", "pagerank")

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    adj = (
        edges.select("src", "dst", w.cast("double").alias("w"))
        if directed
        else symmetrize(edges.select("src", "dst", w.cast("double").alias("w")), "w")
    )
    ids = vertex_ids(edges, vertices)
    n = ids.count()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")

    out_strength = adj.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalized contribution fraction per edge is loop-invariant: cache it
    frac = (
        adj.join(out_strength, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .persist()
    )
    frac.count()

    ranks = ids.select("id", F.lit(1.0 / n).alias("score"))
    ranks = runner.advance(StepResult(ranks))
    # dangling = vertices with no out-edges; mark once (broadcastable dim)
    dangle_ids = ids.join(
        out_strength.select(F.col("src").alias("id")), "id", "left_anti"
    ).withColumn("_dangling", F.lit(True))
    dangling = ranks.join(dangle_ids, "id", "left_semi").agg(
        F.coalesce(F.sum("score"), F.lit(0.0))
    ).collect()[0][0]

    for _ in range(max_iter):
        contribs = (
            frac.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("frac") * F.col("score")).alias("c"))
        )
        new_ranks = ids.join(contribs, "id", "left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("score"),
        )
        # one scalar job per superstep: L∞ delta + next step's dangling mass
        new_ranks = runner.advance(StepResult(new_ranks))
        stats = (
            new_ranks.join(ranks.withColumnRenamed("score", "old"), "id")
            .join(dangle_ids.select("id", "_dangling"), "id", "left")
            .agg(
                F.max(F.abs(F.col("score") - F.col("old"))).alias("delta"),
                F.coalesce(
                    F.sum(F.when(F.col("_dangling"), F.col("score"))), F.lit(0.0)
                ).alias("dangling"),
            )
            .collect()[0]
        )
        delta, dangling = float(stats["delta"]), float(stats["dangling"])
        ranks = new_ranks
        if delta < tol:
            break
    frac.unpersist()
    return ranks
