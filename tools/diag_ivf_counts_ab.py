"""A/B the r6 per-list IVF chunk-count derivation at the sf0.1 bench shape.

The r6 bench record read ivf_ann_topk 17.2s against 6.8s in the
pre-per-list-chunking artifact (same in-band session quality, louvain
quiet in both) — this isolates whether the in-plan `counts` aggregate
re-executing the Arrow assignment kernel per consumer explains it, by
timing the shipped operator against a variant whose assigned-items frame
is materialized once (localCheckpoint) before counts/re-rank read it.

Usage: python tools/diag_ivf_counts_ab.py [reps=3]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from louvain_spark.session import get_spark  # noqa: E402
from louvain_spark.operators import similarity as sim  # noqa: E402


def build_vecs(spark, n_vec=30000, dim_v=64):
    n_clusters = max(10, n_vec // 600)
    raw = spark.range(n_vec).select(
        "id",
        F.when(
            F.col("id") < int(n_vec * 0.8), F.pmod("id", F.lit(n_clusters))
        ).otherwise(-F.col("id")).alias("c"),
    )
    rawvec = F.transform(
        F.sequence(F.lit(0), F.lit(dim_v - 1)),
        lambda d: F.cos(F.col("c") * (d + 1) * 0.7)
        + 0.03 * F.cos(F.col("id") * (d + 13) * 1.3),
    )
    vnorm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    import tempfile

    work = tempfile.mkdtemp(prefix="ivf_ab_")
    raw.select("id", rawvec.alias("v")).select(
        "id", F.transform("v", lambda x: x / vnorm).alias("vec")
    ).repartition(32).write.mode("overwrite").parquet(f"{work}/vecs")
    return spark.read.parquet(f"{work}/vecs"), work


def nockpt_ivf(spark, queries, items, **kw):
    """The pre-fix form: ix0 NOT materialized (counts + item side each
    re-execute the Arrow assignment)."""
    orig = sim.cosine_topk_ivf
    # monkeypatch-free variant: inline copy of the tail with a checkpoint
    from pyspark.sql import Window

    k = kw.get("k", 10)
    dim = kw["dim"]
    n_lists = kw.get("n_lists", 64)
    n_probe = kw.get("n_probe", 8)
    item_block_rows = 65536
    q = queries.select(F.col("id").alias("query_id"), F.col("vec").alias("_qv")).localCheckpoint(eager=True)
    i = items.select(F.col("id").alias("item_id"), F.col("vec").alias("_iv")).localCheckpoint(eager=True)
    centroids = sim.train_ivf_centroids(i, dim, n_lists=n_lists, kmeans_iters=5, sample=4096, i_vec="_iv", i_id="item_id")
    n_probe = min(int(n_probe), len(centroids))
    assign1 = sim._ivf_assign_udf(centroids, 1)
    assign_p = sim._ivf_assign_udf(centroids, n_probe)
    ix0 = i.withColumn("list_id", F.element_at(assign1(F.col("_iv")), 1))
    counts = ix0.groupBy("list_id").agg(
        F.greatest(F.lit(1), F.ceil(F.count(F.lit(1)) / F.lit(int(item_block_rows)))).cast("int").alias("_nck")
    )
    ix = (
        ix0.join(F.broadcast(counts), "list_id")
        .withColumn("_chunk", F.pmod(F.xxhash64("item_id"), F.col("_nck")).cast("int"))
        .drop("_nck")
    )
    qx = (
        q.withColumn("list_id", F.explode(assign_p(F.col("_qv"))))
        .join(F.broadcast(counts), "list_id")
        .withColumn("_chunk", F.explode(F.sequence(F.lit(0), F.col("_nck") - 1)))
        .drop("_nck")
    )
    cell = sim._make_topk_cell_arrow(int(k), None, True)
    scored = (
        qx.groupby("list_id", "_chunk")
        .cogroup(ix.groupby("list_id", "_chunk"))
        .applyInArrow(cell, "query_id long, item_id long, sim double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("item_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def main():
    """One COLD measurement per process: arg1 = arm (shipped|nockpt|parity).

    The warm in-process A/B is misleading here (python-worker spin-up and
    codegen dominate the first call and amortize across reps); the bench
    stage this reproduces is a single cold call. Drive alternating fresh
    processes from the shell.
    """
    arm = sys.argv[1] if len(sys.argv) > 1 else "shipped"
    spark = get_spark(master="local[32]")
    vecs, work = build_vecs(spark)
    vecs.count()
    if arm == "parity":
        a = sim.cosine_topk_ivf(spark, vecs, vecs, k=10, dim=64, n_lists=64, n_probe=8)
        b = nockpt_ivf(spark, vecs, vecs, k=10, dim=64, n_lists=64, n_probe=8)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print("parity exceptAll diff rows:", diff)
    else:
        fn = (
            (lambda: sim.cosine_topk_ivf(spark, vecs, vecs, k=10, dim=64, n_lists=64, n_probe=8))
            if arm == "shipped"
            else (lambda: nockpt_ivf(spark, vecs, vecs, k=10, dim=64, n_lists=64, n_probe=8))
        )
        t0 = time.time()
        n = fn().count()
        print(f"{arm}: cold={round(time.time() - t0, 2)}s rows={n}", flush=True)
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
