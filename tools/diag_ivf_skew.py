"""Diagnose IVF re-rank cell skew on the bench scaling corpus.

The r5 scaling pair measured ivf_ann_topk W-eff 0.437 (data-part speedup
only ~1.75x at 4x cores). Hypothesis: at scale4 (60k clustered vectors,
n_lists=64, n_chunks=1) the cogrouped (list_id, chunk) re-rank cells are
work-skewed — a few hot cells serialize the stage. This script rebuilds
the exact bench corpus, trains the same centroids, and prints the
per-cell work distribution  w_cell = |Q probing L| * |I in L|.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession, functions as F

from louvain_spark.operators.similarity import _ivf_assign_udf, train_ivf_centroids

N_VEC = int(os.environ.get("DIAG_N_VEC", "60000"))
N_LISTS, N_PROBE = 64, 8

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

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
vecs = (
    raw.select("id", rawvec.alias("v"))
    .select("id", F.transform("v", lambda x: x / vnorm).alias("vec"))
    .localCheckpoint()
)

cents = train_ivf_centroids(vecs, dim_v, n_lists=N_LISTS, i_vec="vec", i_id="id")
print(f"trained {len(cents)} centroids on {N_VEC} vectors ({n_clusters} clusters)")

items = vecs.select(
    "id", F.element_at(_ivf_assign_udf(cents, 1)(F.col("vec")), 1).alias("list_id")
)
queries = vecs.select(
    "id", F.explode(_ivf_assign_udf(cents, N_PROBE)(F.col("vec"))).alias("list_id")
)
ic = {r["list_id"]: r["n"] for r in items.groupBy("list_id").agg(F.count("*").alias("n")).collect()}
qc = {r["list_id"]: r["n"] for r in queries.groupBy("list_id").agg(F.count("*").alias("n")).collect()}

lists = sorted(set(ic) | set(qc))
work = {l: ic.get(l, 0) * qc.get(l, 0) for l in lists}
tot = sum(work.values()) or 1
w = np.array(sorted(work.values(), reverse=True), dtype=float)
isz = np.array(sorted(ic.values(), reverse=True), dtype=float)
print(f"non-empty lists: {sum(1 for v in ic.values() if v)} / {N_LISTS}")
print(f"item-count per list: max={isz.max():.0f} p90={np.percentile(isz,90):.0f} "
      f"median={np.median(isz):.0f} (balanced would be {N_VEC/N_LISTS:.0f})")
print(f"cell work (q*i dot products): total={tot:.3g}")
print(f"  top cell share      = {w[0]/tot:.3f}")
print(f"  top-4 cells share   = {w[:4].sum()/tot:.3f}")
print(f"  top-8 cells share   = {w[:8].sum()/tot:.3f}")
print(f"  max speedup bound at 4 workers ~= {1.0/max(w[0]/tot, 0.25):.2f}x "
      f"(work-limited; 4.0 = perfectly balanceable)")
top = sorted(work.items(), key=lambda kv: -kv[1])[:8]
for l, ww in top:
    print(f"  list {l:3d}: items={ic.get(l,0):6d} probing-queries={qc.get(l,0):7d} "
          f"work={ww:.3g} ({ww/tot:.1%})")
spark.stop()
