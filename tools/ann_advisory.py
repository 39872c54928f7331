"""One-leg 10x advisory for the ANN family (superlinearity check).

Mirrors bench.py's clustered-vector synth (bench.py:283-304) at 10x the
scale4 vector count (600k vs 60k) on local[32], timing lsh_ann_topk and
ivf_ann_topk. IVF's n_lists scales with the corpus (64 @ 60k -> 1024 @
600k) so candidates-per-query stay ~constant — the knob a real deployment
turns; LSH keeps its structural max_bucket cap. Writes walls + per-vector
times vs the scale4 reference numbers for the BENCH advisory note.

Usage: python tools/ann_advisory.py [n_vec]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from louvain_spark import get_spark  # noqa: E402
from louvain_spark.operators.similarity import (  # noqa: E402
    cosine_topk_ivf,
    cosine_topk_lsh,
)


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    dim_v = 64
    n_clusters = max(10, n_vec // 600)
    spark = get_spark("ann-advisory", master="local[32]")
    work = tempfile.mkdtemp(prefix="ann_advisory_")

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
    raw.select("id", rawvec.alias("v")).select(
        "id", F.transform("v", lambda x: x / vnorm).alias("vec")
    ).repartition(64).write.mode("overwrite").parquet(f"{work}/vecs")
    cvecs = spark.read.parquet(f"{work}/vecs")

    out = {"n_vec": n_vec, "dim": dim_v, "n_clusters": n_clusters}

    t0 = time.monotonic()
    cosine_topk_lsh(
        spark, cvecs, cvecs, k=10, dim=dim_v, n_planes=10, n_tables=4,
        max_bucket=128,
    ).count()
    out["lsh_ann_topk_s"] = round(time.monotonic() - t0, 1)

    n_lists = max(64, 1 << (n_vec // 600).bit_length())  # ~n/600, pow2
    t0 = time.monotonic()
    cosine_topk_ivf(
        spark, cvecs, cvecs, k=10, dim=dim_v, n_lists=n_lists, n_probe=8,
    ).count()
    out["ivf_ann_topk_s"] = round(time.monotonic() - t0, 1)
    out["ivf_n_lists"] = n_lists

    for k in ("lsh_ann_topk_s", "ivf_ann_topk_s"):
        out[k.replace("_s", "_us_per_vec")] = round(out[k] * 1e6 / n_vec, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
