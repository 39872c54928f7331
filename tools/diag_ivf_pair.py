"""Focused N-vs-4N timing of the ivf_ann_topk bench stage, with sub-phase
breakdown, to adjudicate the r5 scaling table's W-eff=0.437 (cell-skew was
refuted by diag_ivf_skew.py: top cell carries 5.5% of work).

Runs the EXACT bench corpus + stage in a fresh JVM per core count
(spawned by the caller; this script runs ONE leg):
  DIAG_CPUS=1|4 DIAG_N_VEC=60000 python tools/diag_ivf_pair.py
Phases:
  train    — driver-side kmeans (bounded sample; serial by design)
  assign   — item list assignment + localCheckpoint of the assigned table
  rerank   — cogrouped numpy cells + global top-k window + count
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

from pyspark.sql import SparkSession, functions as F

CPUS = int(os.environ.get("DIAG_CPUS", "4"))
N_VEC = int(os.environ.get("DIAG_N_VEC", "60000"))
N_LISTS, N_PROBE = 64, 8


def sentinel_ms() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(6_000_000):
        s += i
    return round((time.perf_counter() - t0) * 1000, 1)


pre = sentinel_ms()

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.default.parallelism", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", f"{4*CPUS}g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from louvain_spark.operators.similarity import (  # noqa: E402
    cosine_topk_ivf,
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
work = f"/tmp/diag_ivf_{os.getpid()}"
raw.select("id", rawvec.alias("v")).select(
    "id", F.transform("v", lambda x: x / vnorm).alias("vec")
).repartition(64).write.mode("overwrite").parquet(f"{work}/vecs")
cvecs = spark.read.parquet(f"{work}/vecs")
cvecs.count()

t = {}

t0 = time.monotonic()
cents = train_ivf_centroids(cvecs, dim_v, n_lists=N_LISTS, i_vec="vec", i_id="id")
t["train"] = round(time.monotonic() - t0, 2)

# full stage, end-to-end (what the bench times), training cost excluded
# via the precomputed centroids; then once more WITH training to match
# the bench stage exactly
t0 = time.monotonic()
cosine_topk_ivf(
    spark, cvecs, cvecs, k=10, dim=dim_v, n_lists=N_LISTS, n_probe=N_PROBE,
    centroids=cents,
).count()
t["stage_pretrained"] = round(time.monotonic() - t0, 2)

t0 = time.monotonic()
cosine_topk_ivf(
    spark, cvecs, cvecs, k=10, dim=dim_v, n_lists=N_LISTS, n_probe=N_PROBE,
).count()
t["stage_full_warm"] = round(time.monotonic() - t0, 2)

post = sentinel_ms()
import json  # noqa: E402

print(json.dumps({"cpus": CPUS, "n_vec": N_VEC, "timings": t,
                  "sentinel_pre_ms": pre, "sentinel_post_ms": post}))
spark.stop()
import shutil  # noqa: E402

shutil.rmtree(work, ignore_errors=True)
