"""One-leg 10x advisory for the dedup/curation family (r5 VERDICT #6).

Mirrors bench.py's clustered near-dup corpus synth (80% of docs in
~n/40 near-dup families, 20% unique — the shape that blew up the LSH
ANN re-rank in r5) at 10x the scale4 doc count (1.5M vs 150k) on
local[32], timing:

- minhash_lsh_pairs  (banded LSH candidate generation) + the candidate-
  pair count — quadratic-cell evidence: 80%-dup families put ~family²/2
  pairs in every matching band bucket, so pair count is where banded
  LSH superlinearity shows first;
- near_dup_clusters  (pairs → distributed CC → canonical) end-to-end;
- ngram_contamination (hash_split train/holdout, 8-gram overlap);
- pack_documents + stratified_sample (window/sampling family).

Writes one JSON line with walls, per-doc costs, and candidate/cluster
telemetry for BENCH/dedup_10x_advisory.md.

Usage: python tools/dedup_advisory.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from louvain_spark import get_spark  # noqa: E402
from louvain_spark.operators.dedup import (  # noqa: E402
    lsh_cluster_edges,
    minhash_lsh_pairs,
    near_dup_clusters,
    ngram_contamination,
)
from louvain_spark.operators.sampling import (  # noqa: E402
    hash_split,
    pack_documents,
    stratified_sample,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    # family SIZE (docs per near-dup family). Default 32 = the bench
    # synth shape (n/40 families over the 80% dup fraction). Passing a
    # larger size with the same corpus probes the genuinely-quadratic
    # regime: LSH candidate pairs within a family are ~size²/2 BY SPEC
    # (every pair really is a near-dup), so this leg measures whether the
    # engine survives materializing them, not whether it avoids them.
    fam_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "dedup-advisory",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.default.parallelism": "64",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dedup_advisory_", dir=base)

    # same synth as bench.py's scaling corpus: 80% of docs in near-dup
    # families sharing 40 family words + 1 unique token, 20% fully unique
    n_fams = max(1, int(n_docs * 0.8) // fam_size)
    fam = F.when(
        F.col("id") < int(n_docs * 0.8), F.pmod("id", F.lit(n_fams))
    ).otherwise(-F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.substring(
            F.md5(F.concat_ws("-", F.col("fam").cast("string"), i.cast("string"))),
            1, 8,
        ),
    )
    spark.range(n_docs).select("id", fam.alias("fam")).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(words, " "), F.lit(" "),
            F.substring(F.md5(F.col("id").cast("string")), 1, 8),
        ).alias("text"),
    ).repartition(64).write.mode("overwrite").parquet(f"{work}/docs")
    docs = spark.read.parquet(f"{work}/docs")
    out = {"n_docs": n_docs, "families": n_fams, "fam_size": fam_size, "dup_frac": 0.8}

    # SPARK_GRAFT_DEDUP_SKIP_PAIRS=1 measures only the star path — used
    # to show the star form completing under a memory footprint where the
    # all-pairs form OOMs (BENCH/dedup_10x_advisory.md)
    if not os.environ.get("SPARK_GRAFT_DEDUP_SKIP_PAIRS"):
        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3)
        pairs.write.mode("overwrite").parquet(f"{work}/pairs")
        out["minhash_lsh_pairs_s"] = round(time.monotonic() - t0, 1)
        pairs = spark.read.parquet(f"{work}/pairs")
        out["candidate_pairs"] = pairs.count()

        t0 = time.monotonic()
        nd = near_dup_clusters(spark, pairs)
        out["near_dup_docs"] = nd.count()
        out["near_dup_clusters_s"] = round(time.monotonic() - t0, 1)
        out["near_dup_groups"] = nd.where("is_canonical").count()

    # star-edge clustering path: connectivity-equivalent to the all-pairs
    # candidates for unverified transitive dedup, O(bucket) edges
    t0 = time.monotonic()
    stars = lsh_cluster_edges(docs, num_hashes=16, bands=4, n=3)
    stars.write.mode("overwrite").parquet(f"{work}/stars")
    out["lsh_star_edges_s"] = round(time.monotonic() - t0, 1)
    stars = spark.read.parquet(f"{work}/stars")
    out["star_edges"] = stars.count()
    t0 = time.monotonic()
    nds = near_dup_clusters(spark, stars)
    out["near_dup_docs_star"] = nds.count()
    out["near_dup_clusters_star_s"] = round(time.monotonic() - t0, 1)
    out["near_dup_groups_star"] = nds.where("is_canonical").count()

    t0 = time.monotonic()
    lab = hash_split(docs, "doc_id")
    ngram_contamination(
        lab.where(F.col("split") == "train"),
        lab.where(F.col("split") == "holdout"),
        n=8, threshold=0.5,
    ).count()
    out["contamination_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    pack_documents(docs, budget=512, shard_chars=2).agg(
        F.sum("offset"), F.max("pack_id")
    ).collect()
    out["pack_documents_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    grp = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    stratified_sample(docs.withColumn("_grp", grp), "_grp", 50, "doc_id").count()
    out["stratified_sample_s"] = round(time.monotonic() - t0, 1)

    for k in list(out):
        if k.endswith("_s"):
            out[k[:-2] + "_us_per_doc"] = round(out[k] * 1e6 / n_docs, 2)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
