"""Decompose the IVF re-rank cogroup: upstream assign/explode vs shuffle+
Arrow transport vs cell compute (arrow vs pandas kernel) vs window merge.

Stages qx/ix through parquet first so each cogroup timing re-reads columnar
input with NO python-UDF upstream — the trivial cell then isolates pure
transport (shuffle + JVM cogroup sort + Arrow serialization of the vector
rows into python workers and empty results back).

  DIAG_CPUS=1|4 DIAG_N_VEC=60000 python tools/diag_ivf_cell.py
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
    .config("spark.driver.memory", f"{4 * CPUS}g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from louvain_spark.operators.similarity import (  # noqa: E402
    _ivf_assign_udf,
    _make_topk_cell,
    _make_topk_cell_arrow,
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
work = f"/tmp/diag_ivfc_{os.getpid()}"
raw.select("id", rawvec.alias("v")).select(
    "id", F.transform("v", lambda x: x / vnorm).alias("vec")
).repartition(64).write.mode("overwrite").parquet(f"{work}/vecs")
cvecs = spark.read.parquet(f"{work}/vecs")
cvecs.count()

t = {}
t0 = time.monotonic()
cents = train_ivf_centroids(cvecs, dim_v, n_lists=N_LISTS, i_vec="vec", i_id="id")
t["train"] = round(time.monotonic() - t0, 2)

q = cvecs.select(F.col("id").alias("query_id"), F.col("vec").alias("_qv"))
i = cvecs.select(F.col("id").alias("item_id"), F.col("vec").alias("_iv"))
assign1 = _ivf_assign_udf(cents, 1)
assign_p = _ivf_assign_udf(cents, N_PROBE)
n_chunks = 1

# --- upstream: assign + explode, materialized to parquet ---
t0 = time.monotonic()
i.withColumn("list_id", F.element_at(assign1(F.col("_iv")), 1)).withColumn(
    "_chunk", F.lit(0)
).write.mode("overwrite").parquet(f"{work}/ix")
t["ix_parquet"] = round(time.monotonic() - t0, 2)

t0 = time.monotonic()
q.withColumn("list_id", F.explode(assign_p(F.col("_qv")))).withColumn(
    "_chunk", F.lit(0)
).write.mode("overwrite").parquet(f"{work}/qx")
t["qx_parquet"] = round(time.monotonic() - t0, 2)

qx = spark.read.parquet(f"{work}/qx")
ix = spark.read.parquet(f"{work}/ix")
out_schema = "query_id long, item_id long, sim double"

# --- transport only: trivial cell ---
import pyarrow as pa  # noqa: E402

empty = pa.schema(
    [("query_id", pa.int64()), ("item_id", pa.int64()), ("sim", pa.float64())]
).empty_table()


def trivial(qt, it):
    return empty


t0 = time.monotonic()
n_triv = (
    qx.groupby("list_id", "_chunk")
    .cogroup(ix.groupby("list_id", "_chunk"))
    .applyInArrow(trivial, out_schema)
    .count()
)
t["cogroup_trivial"] = round(time.monotonic() - t0, 2)

# --- real cells ---
cell_a = _make_topk_cell_arrow(K, None, True)
scored_a = (
    qx.groupby("list_id", "_chunk")
    .cogroup(ix.groupby("list_id", "_chunk"))
    .applyInArrow(cell_a, out_schema)
)
t0 = time.monotonic()
t["n_scored"] = scored_a.count()
t["cogroup_arrow"] = round(time.monotonic() - t0, 2)

cell_p = _make_topk_cell(K, None, True)
scored_p = (
    qx.groupby("list_id", "_chunk")
    .cogroup(ix.groupby("list_id", "_chunk"))
    .applyInPandas(cell_p, out_schema)
)
t0 = time.monotonic()
scored_p.count()
t["cogroup_pandas"] = round(time.monotonic() - t0, 2)

# --- window merge on top of the arrow cells ---
w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("item_id").asc())
t0 = time.monotonic()
scored_a.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= K).count()
t["arrow_plus_window"] = round(time.monotonic() - t0, 2)

post = sentinel_ms()
print(
    json.dumps(
        {
            "cpus": CPUS,
            "n_vec": N_VEC,
            "timings": t,
            "sentinel_pre_ms": pre,
            "sentinel_post_ms": post,
        }
    )
)
spark.stop()
import shutil  # noqa: E402

shutil.rmtree(work, ignore_errors=True)
