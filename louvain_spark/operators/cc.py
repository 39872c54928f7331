"""Connected components via alternating large-star / small-star.

Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC 2014):
alternate two local rewrites until fixpoint; both are a groupBy(min) plus a
re-emit, so each round is one shuffle and the edge set converges to stars
(every node linked directly to its component's minimum id) in O(log²n)
rounds — O(log n) in practice. No floats, exact result; oracle =
networkx.connected_components (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from louvain_spark.operators.graph import canonicalize, checksum, symmetrize, vertex_ids
from louvain_spark.plans.loop import StepResult, SuperstepRunner


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.

    The per-u neighborhood minimum rides a window over the symmetric view
    (ONE shuffle per rewrite) instead of a groupBy + self-join (two)."""
    from pyspark.sql import Window

    sym = symmetrize(edges)
    w = Window.partitionBy("src")
    tagged = sym.withColumn("_m", F.least(F.col("src"), F.min("dst").over(w)))
    out = tagged.where(F.col("dst") > F.col("src")).select(
        F.col("dst").alias("src"), F.col("_m").alias("dst")
    )
    return canonicalize(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient u = max(pair); m = min(Γ_small(u) ∪ {u});
    emit (v, m) for v ∈ Γ_small(u) ∪ {u}, v ≠ m. Window-min, one shuffle."""
    from pyspark.sql import Window

    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    w = Window.partitionBy("src")
    tagged = oriented.withColumn("_m", F.min("dst").over(w))
    out1 = tagged.where(F.col("dst") != F.col("_m")).select(
        F.col("dst").alias("src"), F.col("_m").alias("dst")
    )
    # out2 one row per edge (not per distinct src) — canonicalize's
    # distinct dedups the union in the same shuffle
    out2 = tagged.select("src", F.col("_m").alias("dst"))
    return canonicalize(out1.unionByName(out2))


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    runner: SuperstepRunner | None = None,
    start_state: DataFrame | None = None,
) -> DataFrame:
    """assignments(id, component) with component = min vertex id reachable.

    Pass a SuperstepRunner for durable checkpoints/ledger; pass
    (runner, start_state) from SuperstepRunner.resume to continue a run.
    """
    if runner is None:
        runner = SuperstepRunner(spark, "adhoc", "cc")
    cur = start_state if start_state is not None else canonicalize(edges)
    if start_state is None:
        cur = runner.advance(StepResult(cur))
    prev_sig = checksum(cur, "src", "dst")
    for _ in range(max_iter):
        # fixpoint checksum rides the checkpoint action as observed
        # metrics — one Spark job per superstep, no re-scan
        obs = Observation()
        nxt = _small_star(_large_star(cur)).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        )
        nxt = runner.advance(StepResult(nxt))
        vals = obs.get
        sig = (int(vals["n"]), int(vals["h"]))
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig

    # After convergence the edge set is a union of stars rooted at each
    # component's min id: label = min(id, min neighbor).
    ids = vertex_ids(edges, vertices)
    sym = symmetrize(cur)
    mn = sym.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("_mn"))
    return ids.join(mn, "id", "left").select(
        "id", F.least("id", F.coalesce("_mn", "id")).alias("component")
    )
