"""Phase-level timing inside cosine_topk_ivf on the bench scaling corpus.

diag_ivf_pair.py reproduced W-eff 0.437 on a quiet host; pure matmul work
is ~60 GFLOP (~10s at 1 pinned core), so ~85s of the 95s @1 wall is NOT
matmul. This isolates: item assign, query explode, cogroup-only, window.
  DIAG_CPUS=1|4 python tools/diag_ivf_phases.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

from pyspark.sql import SparkSession, Window, functions as F

CPUS = int(os.environ.get("DIAG_CPUS", "4"))
N_VEC = int(os.environ.get("DIAG_N_VEC", "60000"))
N_LISTS, N_PROBE, K = 64, 8, 10

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.default.parallelism", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", os.environ.get("DIAG_MEM", f"{4*CPUS}g"))
    .config(
        "spark.driver.extraJavaOptions",
        os.environ.get("DIAG_JAVA_OPTS", "-XX:+UseG1GC"),
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from louvain_spark.operators.similarity import (  # noqa: E402
    _ivf_assign_udf,
    _make_topk_cell,
    train_ivf_centroids,
)

n_clusters = max(10, N_VEC // 600)
dim_v = 64
raw = spark.range(N_VEC).select(
    "id",
    F.when(F.col("id") < int(N_VEC * 0.8), F.pmod("id", F.lit(n_clusters)))
    .otherwise(-F.col("id"))
    .alias("c"),
)
rawvec = F.transform(
    F.sequence(F.lit(0), F.lit(dim_v - 1)),
    lambda d: F.cos(F.col("c") * (d + 1) * 0.7)
    + 0.03 * F.cos(F.col("id") * (d + 13) * 1.3),
)
vnorm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
work = f"/tmp/diag_ivfp_{os.getpid()}"
raw.select("id", rawvec.alias("v")).select(
    "id", F.transform("v", lambda x: x / vnorm).alias("vec")
).repartition(64).write.mode("overwrite").parquet(f"{work}/vecs")
cvecs = spark.read.parquet(f"{work}/vecs")
cvecs.count()

t = {}
t0 = time.monotonic()
cents = train_ivf_centroids(cvecs, dim_v, n_lists=N_LISTS, i_vec="vec", i_id="id")
t["train"] = round(time.monotonic() - t0, 2)

q = cvecs.select(F.col("id").alias("query_id"), F.col("vec").alias("_qv")).localCheckpoint(eager=True)
i = cvecs.select(F.col("id").alias("item_id"), F.col("vec").alias("_iv")).localCheckpoint(eager=True)

assign1 = _ivf_assign_udf(cents, 1)
assign_p = _ivf_assign_udf(cents, N_PROBE)
n_i = i.count()
n_chunks = max(1, math.ceil(n_i / (N_LISTS * 65536)))

ix = i.withColumn("list_id", F.element_at(assign1(F.col("_iv")), 1)).withColumn(
    "_chunk", F.pmod(F.xxhash64("item_id"), F.lit(n_chunks)).cast("int")
)
qx = q.withColumn("list_id", F.explode(assign_p(F.col("_qv")))).withColumn(
    "_chunk", F.explode(F.array(*[F.lit(c) for c in range(n_chunks)]))
)

t0 = time.monotonic()
ix.count()
t["item_assign_count"] = round(time.monotonic() - t0, 2)
t0 = time.monotonic()
qx.count()
t["query_assign_count"] = round(time.monotonic() - t0, 2)

cell = _make_topk_cell(K, None, True)
scored = (
    qx.groupby("list_id", "_chunk")
    .cogroup(ix.groupby("list_id", "_chunk"))
    .applyInPandas(cell, "query_id long, item_id long, sim double")
)
t0 = time.monotonic()
n_scored = scored.count()
t["cogroup_count"] = round(time.monotonic() - t0, 2)
t["n_scored"] = n_scored

w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("item_id").asc())
full = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= K)
t0 = time.monotonic()
full.count()
t["full_with_window"] = round(time.monotonic() - t0, 2)

# repeat cogroup once more to see warm stability
t0 = time.monotonic()
scored.count()
t["cogroup_count_2"] = round(time.monotonic() - t0, 2)

print(json.dumps({"cpus": CPUS, "timings": t}))
spark.stop()
import shutil  # noqa: E402

shutil.rmtree(work, ignore_errors=True)
