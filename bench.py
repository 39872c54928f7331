"""Benchmark harness — one JSON line per run (driver contract).

Headline workload (BASELINE.md targets): co-occurrence edge induction from
synthetic transcripts (edges/sec), Louvain modularity convergence, connected
components, PageRank supersteps — plus relational/dedup/ANN queries over the
driver testdata at $SPARK_GRAFT_SF_DIR.

Modes:
  python bench.py                 # single run → one JSON line on stdout
  python bench.py --scaling       # run the same job at local[8] and
                                  # local[32] in fresh processes, report
                                  # throughput + efficiency, update
                                  # BENCH/BASELINE.md

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_PRESET = {"0.001": "tiny", "0.01": "small", "0.1": "bench"}


def run_bench(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from louvain_spark import get_spark
    from louvain_spark.operators.cc import connected_components
    from louvain_spark.operators.dedup import minhash_lsh_pairs
    from louvain_spark.operators.induce import cooccurrence_edges
    from louvain_spark.operators.louvain import louvain
    from louvain_spark.operators.pagerank import pagerank
    from louvain_spark.operators.similarity import cosine_topk_blocked
    from louvain_spark.sources.tables import load
    from louvain_spark.synth import transcripts_df

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    preset = SF_PRESET.get(sf, "small")

    spark = get_spark(
        "louvain_spark-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(cpus * 2, 8)),
            "spark.default.parallelism": str(cpus),
        },
    )
    timings: dict[str, float] = {}
    extra: dict[str, float] = {"cpus": cpus}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.monotonic()

            def __exit__(self, *a):
                timings[name] = round(time.monotonic() - self.t0, 3)

        return _T()

    # --- headline: transcripts → co-occurrence edges → graph operators ----
    # stage through parquet: the engine reads tables, not inline local
    # relations (whose lineage otherwise rides along in every task binary)
    import tempfile

    work = tempfile.mkdtemp(prefix="louvain-bench-")
    with timed("synth_write"):
        transcripts_df(spark, preset=preset).write.mode("overwrite").parquet(
            f"{work}/transcripts"
        )
    t = spark.read.parquet(f"{work}/transcripts")
    n_turns = t.count()
    extra["turns"] = n_turns

    with timed("induce_edges"):
        verts, edges = cooccurrence_edges(t, window=8)
        edges.write.mode("overwrite").parquet(f"{work}/edges")
        verts.write.mode("overwrite").parquet(f"{work}/vertices")
        edges = spark.read.parquet(f"{work}/edges")
        verts = spark.read.parquet(f"{work}/vertices")
        n_edges = edges.count()
    extra["edges"] = n_edges
    extra["edges_per_sec"] = round(n_edges / max(timings["induce_edges"], 1e-9), 1)

    ids = verts.select("id").persist()
    with timed("connected_components"):
        cc = connected_components(spark, edges, vertices=ids)
        cc.count()

    with timed("pagerank_10it"):
        pr = pagerank(spark, edges, vertices=ids, max_iter=10, tol=0.0)
        pr.count()

    with timed("louvain_parallel"):
        assign, mod = louvain(spark, edges, vertices=ids, mode="parallel")
        assign.count()
    extra["louvain_modularity"] = round(mod, 6)
    extra["louvain_edges_per_sec"] = round(n_edges / max(timings["louvain_parallel"], 1e-9), 1)

    # --- relational over driver testdata ----------------------------------
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    with timed("pricing_summary"):
        lineitem.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1))
        ).collect()
    with timed("top3_window"):
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
        orders.withColumn("rn", F.row_number().over(w)).where("rn <= 3").count()

    # --- training-data ops -------------------------------------------------
    docs = load(spark, sf_dir, "documents")
    with timed("minhash_lsh"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3).count()
    emb = load(spark, sf_dir, "embeddings")
    with timed("ann_topk"):
        norm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x))
        unit = emb.select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: (x / norm).cast("float")).alias("vec"),
        )
        cosine_topk_blocked(spark, unit, unit, k=10).count()

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "louvain_spark bench: co-occurrence induction + graph ops + relational + dedup/ANN",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extra": extra,
    }
    spark.stop()
    return result


def run_subprocess(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def scaling(sf_dir: str) -> None:
    """N vs 4N parallelism on the same input (sandbox proxy for the
    north_rule's two-cluster-size scaling criterion)."""
    r8 = run_subprocess(sf_dir, 8)
    r32 = run_subprocess(sf_dir, 32)
    rows = []
    effs = {}
    for key in ("induce_edges", "connected_components", "pagerank_10it", "louvain_parallel"):
        t8, t32 = r8["queries"][key], r32["queries"][key]
        eff = t8 / (4.0 * t32) if t32 > 0 else float("nan")
        effs[key] = round(eff, 3)
        rows.append((key, t8, t32, round(t8 / t32, 2), round(eff, 3)))
    eps8 = r8["extra"]["edges_per_sec"]
    eps32 = r32["extra"]["edges_per_sec"]
    eff_eps = round(eps32 / (4.0 * eps8), 3)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("# BENCH/BASELINE — N vs 4N scaling (sandbox proxy)\n\n")
        f.write(
            "Same job, same input, local[8] vs local[32] in fresh JVMs\n"
            "(driver-mandated substitute for N vs 4N executors; no real\n"
            "cluster exists in this sandbox).\n\n"
        )
        f.write(f"- input: {r8['extra']['turns']:.0f} synthetic transcript turns → "
                f"{r8['extra']['edges']:.0f} co-occurrence edges; sf_dir={sf_dir}\n")
        f.write(f"- induction throughput: {eps8:.0f} edges/s @8 cores, {eps32:.0f} edges/s @32 cores\n")
        f.write(f"- **edges/sec scaling efficiency eps(32)/(4·eps(8)) = {eff_eps}** (target ≥ 0.8)\n")
        f.write(f"- louvain modularity (identical both runs): {r8['extra']['louvain_modularity']} / {r32['extra']['louvain_modularity']}\n\n")
        f.write("| stage | t@8 (s) | t@32 (s) | speedup | efficiency t8/(4·t32) |\n")
        f.write("|---|---|---|---|---|\n")
        for name, t8, t32, sp, eff in rows:
            f.write(f"| {name} | {t8} | {t32} | {sp}x | {eff} |\n")
    print(json.dumps({"eff_edges_per_sec": eff_eps, "per_stage": effs,
                      "eps8": eps8, "eps32": eps32}))


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        scaling(sf_dir)
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, cpus)))
