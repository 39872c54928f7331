"""Benchmark harness — one JSON line per run (driver contract).

Headline workload (BASELINE.md targets): co-occurrence edge induction from
synthetic transcripts (edges/sec), Louvain modularity convergence, connected
components, PageRank supersteps — plus relational/dedup/ANN queries over the
driver testdata at $SPARK_GRAFT_SF_DIR.

Modes:
  python bench.py                 # single run → one JSON line on stdout
  python bench.py --scaling       # run the same job at local[N] and
                                  # local[4N] (default N=1) in fresh
                                  # processes, report throughput +
                                  # efficiency, update BENCH/BASELINE.md

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


# logical parallelism is FIXED across runs (like a real cluster scaling
# test: same partitioning, more executors) — only physical cores vary
SHUFFLE_PARTITIONS = 64


def host_sentinel_ms() -> float:
    """Wall-ms for a fixed single-thread pure-CPU workload (no Spark, no
    allocation). Recorded with every bench leg: this shared VM drifts
    10-50% day to day, so absolute bench numbers are only comparable when
    their sentinels agree. Nominal ~350ms on a quiet host."""
    t0 = time.monotonic()
    acc = 0
    for i in range(3_000_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return round((time.monotonic() - t0) * 1000.0 + (acc & 0), 1)


def _sentinel_work(_):
    acc = 0
    for i in range(3_000_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return acc


def host_sentinel_par_ms(workers: int = 16) -> float:
    """Wall-ms for the same fixed workload run on `workers` processes at
    once. The single-thread sentinel misses MULTI-core contention from
    co-tenant VMs (observed: warm ann_topk 1.6s -> 8.0s with the 1-thread
    sentinel unchanged); when this parallel sentinel disagrees with the
    serial one by much more than the host's known oversubscription
    (~1.5x at 16 workers), wide-parallel stage times are not comparable
    across runs. Nominal ~450-700ms quiet (includes ~150ms spawn
    overhead)."""
    import multiprocessing as mp

    # spawn, not fork: the sentinel also runs while the py4j/JVM gateway
    # threads are live, and forking a multi-threaded process can deadlock
    # a worker on an inherited lock (e.g. the logging module lock)
    t0 = time.monotonic()
    with mp.get_context("spawn").Pool(workers) as p:
        p.map(_sentinel_work, range(workers))
    return round((time.monotonic() - t0) * 1000.0, 1)


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
    preset = os.environ.get("SPARK_GRAFT_PRESET") or SF_PRESET.get(sf, "small")

    spark = get_spark(
        "louvain_spark-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(SHUFFLE_PARTITIONS),
            "spark.default.parallelism": str(SHUFFLE_PARTITIONS),
            # small inputs must still split across cores: a 60MB parquet
            # is 1 partition at the 128MB default → serial scan stages
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    timings: dict[str, float] = {}
    extra: dict[str, float] = {
        "cpus": cpus,
        "host_sentinel_pre_ms": host_sentinel_ms(),
        "host_sentinel_par16_pre_ms": host_sentinel_par_ms(),
    }

    def timed(name):
        class _T:
            def __enter__(self):
                print(f"[bench] {name} start", file=sys.stderr, flush=True)
                self.t0 = time.monotonic()

            def __exit__(self, *a):
                timings[name] = round(time.monotonic() - self.t0, 3)
                print(
                    f"[bench] {name} done {timings[name]}s",
                    file=sys.stderr, flush=True,
                )
                # drop py4j refs from the finished stage so ContextCleaner
                # can release its localCheckpoint/broadcast blocks before
                # the next stage builds (at 4g/core a stale CC state plus a
                # fresh |V| broadcast was enough to OOM the PR frac build)
                import gc

                gc.collect()

        return _T()

    # --- headline: transcripts → co-occurrence edges → graph operators ----
    # stage through parquet: the engine reads tables, not inline local
    # relations (whose lineage otherwise rides along in every task binary)
    import shutil
    import tempfile

    # stage on tmpfs: checkpoint/table parquet on the sandbox's virtual
    # disk otherwise bottlenecks every stage on serial I/O
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tempfile.tempdir = base  # louvain sweep checkpoints inherit this
    work = tempfile.mkdtemp(prefix="louvain-bench-", dir=base)
    with timed("synth_write"):
        transcripts_df(spark, preset=preset).repartition(SHUFFLE_PARTITIONS).write.mode(
            "overwrite"
        ).parquet(f"{work}/transcripts")
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
    # durable parquet checkpoints every 4 supersteps + per-superstep ledger
    # are the bench default — the resumability contract (north_rule) is
    # measured, not just tested; the ledger appends are driver-side
    # pyarrow (no extra Spark jobs)
    from louvain_spark.plans.loop import SuperstepRunner

    with timed("connected_components"):
        cc_runner = SuperstepRunner(
            spark, "bench-cc", "cc",
            checkpoint_dir=f"{work}/ckpt-cc", checkpoint_every=4,
        )
        cc = connected_components(spark, edges, vertices=ids, runner=cc_runner)
        cc.count()
    # round count is data-dependent (graph diameter): the tiny-preset floor
    # leg converges in fewer rounds than the scale legs, so the per-stage
    # floor decomposition needs this to round-match F (BASELINE.md r5)
    extra["cc_rounds"] = cc_runner.superstep + 1

    with timed("pagerank_10it"):
        pr = pagerank(
            spark, edges, vertices=ids, max_iter=10, tol=0.0,
            steps_per_action=2,
            runner=SuperstepRunner(
                spark, "bench-pr", "pagerank",
                checkpoint_dir=f"{work}/ckpt-pr", checkpoint_every=4,
            ),
        )
        pr.count()

    # louvain's block count and auto-threshold derive from
    # spark.default.parallelism, which is pinned above — so the level-0
    # block structure (and thus the algorithm's trajectory) is identical
    # across cpu counts. mode='auto' = parallel sweeps while the level
    # graph is large, exact single-block once it has coarsened (the 100TB
    # execution story, VERDICT r1 #9).
    with timed("louvain_parallel"):
        assign, mod = louvain(spark, edges, vertices=ids, mode="auto")
        assign.count()
    extra["louvain_mode"] = "auto"
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
    # Scaling presets synthesize a preset-scaled corpus (the sf_dir docs
    # table is fixed at 5k docs for sf0.1, which left the r4 minhash stage
    # floor-dominated in the N-vs-4N pair — W-eff unmeasurable). 80% of
    # docs sit in ~n/40 near-dup families (family text + one per-doc
    # token), 20% unique — so the LSH band join has real matches. All
    # JVM-side expressions, staged through parquet like the vectors.
    # sf1 gets a 10x-of-bench synthesized corpus so the curation/dedup
    # stages have a meaningful advisory leg (the sf_dir docs table is a
    # fixed 5k rows)
    n_docs = {"scale": 60000, "scale4": 150000, "sf1": 50000}.get(preset)
    if n_docs:
        fam = F.when(
            F.col("id") < int(n_docs * 0.8), F.pmod("id", F.lit(n_docs // 40))
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
        ).repartition(SHUFFLE_PARTITIONS).write.mode("overwrite").parquet(
            f"{work}/docs"
        )
        docs = spark.read.parquet(f"{work}/docs")
    else:
        docs = load(spark, sf_dir, "documents")
    extra["minhash_docs"] = docs.count()
    with timed("minhash_lsh"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3).count()

    # --- curation family: the end-to-end actions a training pipeline runs
    # over the FULL corpus (r5 VERDICT #5 — driver-oracled at sf0.01 but
    # previously benchless). Same docs frame as minhash_lsh.
    from louvain_spark.operators.dedup import near_dup_clusters, ngram_contamination
    from louvain_spark.operators.sampling import (
        hash_split,
        pack_documents,
        stratified_sample,
    )

    with timed("near_dup_clusters"):
        nd = near_dup_clusters(
            spark, minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3)
        )
        extra["near_dup_docs"] = nd.count()
    with timed("contamination"):
        lab = hash_split(docs, "doc_id")
        ngram_contamination(
            lab.where(F.col("split") == "train"),
            lab.where(F.col("split") == "holdout"),
            n=8,
            threshold=0.5,
        ).count()
    with timed("pack_documents"):
        # aggregate over the window outputs so column pruning cannot elide
        # the per-shard running sum a bare count() would allow
        pack_documents(docs, budget=512, shard_chars=2).agg(
            F.sum("offset"), F.max("pack_id")
        ).collect()
    with timed("stratified_sample"):
        grp = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        stratified_sample(docs.withColumn("_grp", grp), "_grp", 50, "doc_id").count()
    # --- quality/text analysis over the same corpus: the row-local signal
    # family (repetition + PII scrub — pure map, zero shuffle) and the
    # aggregation family (vocabulary + TF-IDF — explode + combinable aggs
    # + distributed rank). Aggregated so column pruning can't elide any
    # signal column.
    with timed("quality_signals"):
        from louvain_spark.operators.curation import pii_scrub
        from louvain_spark.operators.textstats import repetition_scores

        repetition_scores(docs).agg(
            F.sum("n_words"),
            F.sum("dup_5gram_frac"),
            F.sum("top_bigram_char_frac"),
            F.sum("dup_line_char_frac"),
        ).collect()
        pii_scrub(docs).agg(
            F.sum("n_email"), F.sum(F.length("clean_text"))
        ).collect()
    with timed("vocab_tfidf"):
        from louvain_spark.operators.webstats import build_vocab, tfidf_top_terms

        # assign the vocab here so encode_lm can reuse the eagerly
        # checkpointed frame: its timer should measure encode+LM only,
        # not a duplicate of this stage's vocab build
        vocab = build_vocab(docs, top_k=5000, min_df=2)
        extra["vocab_terms"] = vocab.count()
        tfidf_top_terms(docs, k=3).agg(F.sum("score")).collect()
    with timed("encode_lm"):
        # bulk tokenization against a top-5k vocab + in-corpus bigram-LM
        # scoring: the explode+keyed-join+re-collect family (aggregated so
        # pruning can't drop the encoded arrays or the LM sums)
        from louvain_spark.operators.encoding import bigram_lm_scores, encode_documents

        encode_documents(docs, vocab).agg(
            F.sum("n_tokens"), F.sum(F.size("token_ids"))
        ).collect()
        bigram_lm_scores(docs).agg(F.sum("sum_nll_u"), F.sum("score")).collect()
    with timed("boilerplate"):
        # C4-style boilerplate line removal over a deterministic
        # newline-every-8-words rewrite of the same corpus (the synth text
        # is single-line); line-DF distinct agg + offender-set broadcast +
        # per-doc reassembly
        from louvain_spark.operators.curation import strip_boilerplate_lines

        multi = docs.select(
            "doc_id",
            F.regexp_replace(
                "text", r"((?:\S+\s+){7}\S+)\s+", "$1\n"
            ).alias("text"),
        )
        strip_boilerplate_lines(multi, max_line_df=2).agg(
            F.sum("n_lines"), F.sum("n_kept"), F.sum(F.length("clean_text"))
        ).collect()

    emb = load(spark, sf_dir, "embeddings")
    with timed("ann_topk"):
        norm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x))
        unit = emb.select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: (x / norm).cast("float")).alias("vec"),
        )
        cosine_topk_blocked(spark, unit, unit, k=10).count()
    # the single cold call above is dominated by first-call codegen/Arrow
    # warmup and measures 2-4x noisier than the operator itself (observed
    # 4.7-13.3s cold vs 1.6-2.0s warm on a sentinel-quiet host) — record
    # the steady-state number alongside it
    t0 = time.monotonic()
    cosine_topk_blocked(spark, unit, unit, k=10).count()
    extra["ann_topk_warm_s"] = round(time.monotonic() - t0, 3)

    # --- LSH ANN at scale on CLUSTERED vectors (the declared 100TB path's
    # worst case: tight near-duplicate clusters land whole in one bucket
    # per table — hot cells). Vectors are synthesized JVM-side (80% in
    # ~n/600 tight clusters, 20% background) and staged through parquet;
    # max_bucket caps hot cells so cost is linear, not quadratic, in
    # cluster size. Candidate count recorded as the ≪|Q|·|I| evidence.
    from louvain_spark.operators.similarity import (
        _lsh_candidates,
        cosine_topk_lsh,
        rademacher_planes,
    )

    # scaling presets get enough vectors that the parallel work clears the
    # per-stage serial floor (r4's incidental 0.52 at 6k vectors was
    # floor-dominated, not informative — VERDICT r4 "missing" #3)
    n_vec = {
        "tiny": 2000, "small": 6000, "bench": 30000,
        "scale": 30000, "scale4": 60000,
    }.get(preset, 6000)
    n_clusters = max(10, n_vec // 600)
    dim_v = 64
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
    ).repartition(SHUFFLE_PARTITIONS).write.mode("overwrite").parquet(f"{work}/vecs")
    cvecs = spark.read.parquet(f"{work}/vecs")
    planes = rademacher_planes(dim_v, 10, 4, 42)
    extra["lsh_vectors"] = n_vec
    # candidate-count instrumentation costs a full candidate enumeration
    # per family — skip it in scaling legs so the pair measures the
    # operator, not the telemetry
    count_candidates = preset not in ("scale", "scale4")
    if count_candidates:
        extra["lsh_candidates"] = _lsh_candidates(
            cvecs.select(F.col("id").alias("query_id"), F.col("vec").alias("_qv")),
            cvecs.select(F.col("id").alias("item_id"), F.col("vec").alias("_iv")),
            planes, 4, True, 128,
        ).count()
        extra["lsh_candidate_frac"] = round(extra["lsh_candidates"] / (n_vec * n_vec), 5)
    with timed("lsh_ann_topk"):
        cosine_topk_lsh(
            spark, cvecs, cvecs, k=10, dim=dim_v, n_planes=10, n_tables=4,
            max_bucket=128,
        ).count()

    # --- IVF-Flat ANN over the same clustered vectors: the data-adaptive
    # complement to LSH (lists follow the cluster structure, so clustered
    # corpora get balanced candidate sets without a hot-cell cap). The
    # timed stage includes the bounded driver-side k-means training; the
    # candidate count is measured outside it, mirroring the LSH stage.
    from louvain_spark.operators.similarity import (
        _ivf_assign_udf,
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    ivf_lists, ivf_probe = 64, 8
    if count_candidates:
        cents = train_ivf_centroids(
            cvecs, dim_v, n_lists=ivf_lists, i_vec="vec", i_id="id"
        )
        ivf_ib = cvecs.select(
            F.col("id").alias("item_id"),
            F.element_at(_ivf_assign_udf(cents, 1)(F.col("vec")), 1).alias("list_id"),
        )
        ivf_qb = cvecs.select(
            F.col("id").alias("query_id"),
            F.explode(_ivf_assign_udf(cents, ivf_probe)(F.col("vec"))).alias("list_id"),
        )
        extra["ivf_candidates"] = (
            ivf_qb.join(ivf_ib, "list_id")
            .where(F.col("query_id") != F.col("item_id"))
            .dropDuplicates(["query_id", "item_id"])
            .count()
        )
        extra["ivf_candidate_frac"] = round(extra["ivf_candidates"] / (n_vec * n_vec), 5)
    with timed("ivf_ann_topk"):
        cosine_topk_ivf(
            spark, cvecs, cvecs, k=10, dim=dim_v,
            n_lists=ivf_lists, n_probe=ivf_probe,
        ).count()

    extra["host_sentinel_post_ms"] = host_sentinel_ms()
    extra["host_sentinel_par16_post_ms"] = host_sentinel_par_ms()
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
    shutil.rmtree(work, ignore_errors=True)
    return result


def run_subprocess(
    sf_dir: str, cpus: int, preset: str | None = None, mem: str | None = None
) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        # children run ONE raw bench (no sentinel-gate recursion)
        SPARK_GRAFT_BENCH_CHILD="1",
    )
    if preset:
        env["SPARK_GRAFT_PRESET"] = preset
    if mem:
        env["SPARK_GRAFT_DRIVER_MEM"] = mem
    # Pin per-process BLAS to one thread (python workers inherit this env
    # in local mode). Unpinned OpenBLAS fans each small numpy matmul in the
    # Arrow/cogrouped kernels across ALL host cores, which (a) breaks the
    # N-vs-4N core-budget premise of the scaling proxy — a local[1] leg's
    # python workers were silently using the whole host, measured as a
    # fake 7.8x "speedup" on ivf_ann_topk — and (b) is slower in absolute
    # terms on these cell-sized matmuls (ivf@1: 202s unpinned → 142s
    # pinned). A real cluster behaves like the pinned config: Spark sets
    # OMP_NUM_THREADS to the task's core count on executors (SPARK-28843).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        env.setdefault(var, "1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(
            f"bench subprocess rc={out.returncode}, no JSON line; tail of "
            f"child stderr:\n{out.stderr[-4000:]}\n"
        )
        raise RuntimeError("bench subprocess produced no JSON line")
    return json.loads(lines[-1])


STAGES = ("induce_edges", "connected_components", "pagerank_10it", "louvain_parallel")
# LLM-pipeline (dedup/ANN) stages: measured in the same N→4N pair with
# the same floor decomposition, but excluded from the speedup<2
# contention predicate — their bucketed/capped profiles can be
# legitimately floor-heavy and a legitimate <2 would loop the retry.
ANN_STAGES = ("minhash_lsh", "lsh_ann_topk", "ivf_ann_topk")
# curation-family stages (r5 VERDICT #5): measured in the same N->4N
# pair/floor framework as the ANN stages, excluded from the speedup<2
# contention predicate for the same reason
CURATION_STAGES = (
    "near_dup_clusters", "contamination", "pack_documents", "stratified_sample",
    "quality_signals", "vocab_tfidf", "encode_lm", "boilerplate",
)

# Quiet-host bands for the recorded run (max of pre/post, ms). From the
# r2-r4 measurement history on this shared VM: serial nominal ~300-380
# quiet with contended runs >550; par16 nominal ~450-700 quiet (includes
# ~150ms spawn overhead) with contended runs >1000. A committed
# BENCH_r*.json whose sentinels exceed these is not comparable across
# rounds (the r4 artifact of record was exactly that — VERDICT r4).
QUIET_SERIAL_MS = 520.0
QUIET_PAR16_MS = 800.0


def sentinels_in_band(res: dict) -> tuple[bool, str]:
    e = res["extra"]
    s = max(e["host_sentinel_pre_ms"], e["host_sentinel_post_ms"])
    p = max(e["host_sentinel_par16_pre_ms"], e["host_sentinel_par16_post_ms"])
    ok = s <= QUIET_SERIAL_MS and p <= QUIET_PAR16_MS
    return ok, (
        f"serial {s:.0f}ms (quiet ≤ {QUIET_SERIAL_MS:.0f}), "
        f"par16 {p:.0f}ms (quiet ≤ {QUIET_PAR16_MS:.0f})"
    )


def record(sf_dir: str, cpus: int, max_attempts: int = 4) -> dict:
    """Sentinel-gated recorded run, committed as PER-STAGE MINIMA across
    at least two in-band fresh-JVM runs (r5 VERDICT #7).

    A single in-band run can still hide a 40% stage swing inside the
    quiet band (r5's committed louvain read 60.0s against three same-
    night quiet runs of 38.9-47.4s). The per-stage minimum over >=2
    independent in-band JVMs is the best noise floor this shared VM
    allows — a stage's true wall is its fastest contention-free
    observation. The artifact keeps every attempt's per-stage timings
    and sentinels in extra['attempts'] so a reader can audit the spread.

    Degraded modes (the driver contract requires one JSON line): one
    in-band run → report it with a note; zero → fastest attempt with
    the existing out-of-band note.
    """
    inband: list[dict] = []
    best = None
    for attempt in range(1, max_attempts + 1):
        res = run_subprocess(sf_dir, cpus)
        ok, desc = sentinels_in_band(res)
        res["extra"]["sentinel_band"] = (
            f"max(pre,post): serial<={QUIET_SERIAL_MS:.0f}ms "
            f"par16<={QUIET_PAR16_MS:.0f}ms"
        )
        res["extra"]["sentinel_in_band"] = ok
        res["extra"]["sentinel_attempt"] = attempt
        if best is None or res["value"] < best["value"]:
            best = res
        if ok:
            inband.append(res)
            if len(inband) >= 2:
                break
        else:
            print(
                f"[bench] attempt {attempt}/{max_attempts} sentinel out of "
                f"band ({desc}) — retrying in a fresh JVM",
                file=sys.stderr,
            )

    def attempt_digest(r: dict) -> dict:
        e = r["extra"]
        return {
            # copy: the min-merge below mutates base["queries"] in place,
            # and a by-reference digest of the base run would silently
            # show the merged minima instead of that run's real timings
            "queries": dict(r["queries"]),
            "total": r["value"],
            "sentinel_in_band": e["sentinel_in_band"],
            "serial_ms": round(
                max(e["host_sentinel_pre_ms"], e["host_sentinel_post_ms"]), 1
            ),
            "par16_ms": round(
                max(e["host_sentinel_par16_pre_ms"], e["host_sentinel_par16_post_ms"]), 1
            ),
        }

    if not inband:
        best["extra"]["sentinel_note"] = (
            f"all {max_attempts} attempts out of band; reporting the fastest — "
            "absolute times are inflated by host contention"
        )
        return best
    base = min(inband, key=lambda r: r["value"])
    if len(inband) == 1:
        base["extra"]["sentinel_note"] = (
            "only one in-band attempt — single-run stage times, not minima"
        )
        base["extra"]["attempts"] = [attempt_digest(base)]
        return base
    # snapshot the audit digests BEFORE the min-merge mutates base
    digests = [attempt_digest(r) for r in inband]
    # per-stage minima across the in-band set
    mins = {
        k: min(r["queries"][k] for r in inband) for k in base["queries"]
    }
    base["queries"] = mins
    base["value"] = round(sum(mins.values()), 3)
    e = base["extra"]
    e["attempts"] = digests
    e["stage_times_are"] = f"per-stage minima over {len(inband)} in-band fresh-JVM runs"
    # rates derived from stage walls must match the committed walls
    if "edges" in e and "induce_edges" in mins:
        e["edges_per_sec"] = round(e["edges"] / max(mins["induce_edges"], 1e-9), 1)
    if "edges" in e and "louvain_parallel" in mins:
        e["louvain_edges_per_sec"] = round(
            e["edges"] / max(mins["louvain_parallel"], 1e-9), 1
        )
    return base


def scaling(sf_dir: str) -> None:
    """N vs 4N parallelism on the same input (sandbox proxy for the
    north_rule's two-cluster-size scaling criterion).

    Methodology (mirrors a real N→4N executor scale-up):
    - identical input and identical LOGICAL parallelism (shuffle
      partitions, louvain blocks) in both runs — only cores change;
    - memory per core held constant (a 4N-executor cluster has 4N× the
      memory) via the driver-heap env;
    - N defaults to 1 (→ 4N=4): this sandbox is a shared VM whose own
      measured pure-CPU ceiling at 32 threads is ~0.67, so high-thread
      pairs measure the host, not the engine; at 1↔4 threads the host has
      full headroom AND each core carries the most work per fixed driver
      second — closest to the 10^12-turn regime the rule targets, where
      driver orchestration time vanishes against executor work;
    - preset 'scale4' (19M turns): per-run serial floor (job scheduling,
      range-sampler, plan time, ~15-20s) must be small against per-core
      work, or the pair measures overhead amortization, not partitioning;
    - host-noise guard: any stage with speedup < 2.0 at 4× cores flags a
      contended run → both levels re-measured once, per-stage min taken
      (the shared VM shows multi-minute interference spikes); raw attempt
      JSONs persist to BENCH/scaling_attempts.json so a later session can
      re-measure a single level and merge.
    """
    preset = os.environ.get("SPARK_GRAFT_SCALING_PRESET", "scale4")
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
    n4 = 4 * n
    mem_per_core = int(os.environ.get("SPARK_GRAFT_MEM_PER_CORE_GB", "4"))

    def measure_pair():
        rs = run_subprocess(sf_dir, n, preset=preset, mem=f"{mem_per_core * n}g")
        rb = run_subprocess(sf_dir, n4, preset=preset, mem=f"{mem_per_core * n4}g")
        return rs, rb

    # Independent serial-floor estimate per stage and core count: the
    # SAME stage structure at preset 'tiny' (~zero data), so its wall is
    # almost pure job-scheduling + planning + fixed per-action cost.
    # This makes W-efficiency = (t_N − F_N) / (4·(t_4N − F_4N)) a real
    # measurement (r4 VERDICT #6): fitting F from the same (t_N, t_4N)
    # pair would make W-eff ≡ 1 by construction.
    # Floors are tiny-data and noise-light; a same-session re-attempt can
    # reuse the persisted ones instead of re-paying ~12 min of floor legs.
    floor_s = floor_b = None
    if os.environ.get("SPARK_GRAFT_SCALING_REUSE_FLOORS"):
        try:
            with open(os.path.join(REPO, "BENCH", "scaling_attempts.json")) as f:
                prior = json.load(f)
            fs, fb = prior["floors"]
            # stage-superset check: floors recorded before a stage was
            # added would KeyError at table time — regenerate instead
            want = set(STAGES + ANN_STAGES + CURATION_STAGES)
            if (
                fs["extra"]["cpus"] == n
                and fb["extra"]["cpus"] == n4
                and set(fs["queries"]) >= want
                and set(fb["queries"]) >= want
            ):
                floor_s, floor_b = fs, fb
        except (OSError, KeyError, ValueError, TypeError, AttributeError):
            # old-format (list) or malformed attempts file: fall back to
            # fresh floors rather than crashing the scaling run
            pass
    if floor_s is None:
        floor_s = run_subprocess(sf_dir, n, preset="tiny", mem=f"{mem_per_core * n}g")
        floor_b = run_subprocess(sf_dir, n4, preset="tiny", mem=f"{mem_per_core * n4}g")

    attempts = [measure_pair()]

    def pair_anomaly(pair) -> str | None:
        """Contention check on EITHER side of the pair (an inflated N
        baseline inflates apparent speedup and would otherwise pass
        silently — ADVICE r3). Two symmetric signals:
        - a stage with speedup < 2.0 at 4x cores (slow 4N side);
        - the pure-CPU sentinel disagreeing > 25% between the two legs
          (whichever side was contended, sentinel drift exposes it)."""
        rs, rb = pair
        if any(rb["queries"][k] > rs["queries"][k] / 2.0 for k in STAGES):
            return "stage speedup < 2.0 at 4x cores"
        # >4x speedup from 4x cores is physically impossible for the
        # JVM-side gate stages (BLAS is pinned in children, memory is
        # per-core-constant): it means the N leg ran contended — the
        # FLATTERING failure mode the sentinels watch for, caught here
        # directly (observed: induce 540s@1 vs 132s@4 = 4.09x in a window
        # whose par16 sentinels sat above the quiet band on both legs)
        if any(rs["queries"][k] > 4.2 * rb["queries"][k] for k in STAGES):
            return "superlinear stage speedup > 4.2x (inflated N-leg wall)"
        sents = [
            min(r["extra"]["host_sentinel_pre_ms"], r["extra"]["host_sentinel_post_ms"])
            for r in (rs, rb)
        ]
        if max(sents) > 1.25 * min(sents):
            return f"host sentinel drift {sents[0]:.0f}ms vs {sents[1]:.0f}ms"
        # the serial sentinel misses multi-core co-tenant contention (it
        # can inflate the N baseline and FLATTER efficiency); compare the
        # 16-worker sentinel too, with a wider band — it is noisier
        pars = [
            min(
                r["extra"]["host_sentinel_par16_pre_ms"],
                r["extra"]["host_sentinel_par16_post_ms"],
            )
            for r in (rs, rb)
        ]
        if max(pars) > 1.4 * min(pars):
            return f"par16 sentinel drift {pars[0]:.0f}ms vs {pars[1]:.0f}ms"
        # drift guards compare the legs to EACH OTHER, so a day where both
        # legs run equally contended slips through (observed twice on
        # 2026-08-17: both pairs' par16 sentinels sat at 630-970ms vs the
        # documented 378-516ms quiet band and ivf@4 measured 3x its
        # isolated quiet-window wall). Gate each leg against the same
        # ABSOLUTE quiet band the recorded bench uses (max of pre/post,
        # matching sentinels_in_band).
        worst_serial = max(
            max(r["extra"]["host_sentinel_pre_ms"], r["extra"]["host_sentinel_post_ms"])
            for r in (rs, rb)
        )
        worst_par = max(
            max(
                r["extra"]["host_sentinel_par16_pre_ms"],
                r["extra"]["host_sentinel_par16_post_ms"],
            )
            for r in (rs, rb)
        )
        if worst_serial > QUIET_SERIAL_MS or worst_par > QUIET_PAR16_MS:
            return (
                f"leg outside absolute quiet band (worst serial "
                f"{worst_serial:.0f}ms ≤{QUIET_SERIAL_MS:.0f}, worst par16 "
                f"{worst_par:.0f}ms ≤{QUIET_PAR16_MS:.0f})"
            )
        return None

    max_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_PAIRS", "2"))
    while len(attempts) < max_pairs:
        anomaly = pair_anomaly(attempts[-1])
        if not anomaly:
            break
        print(
            f"[scaling] pair {len(attempts)} anomalous ({anomaly}); re-measuring",
            file=sys.stderr, flush=True,
        )
        attempts.append(measure_pair())
    # Optionally merge prior persisted attempts measured with the SAME
    # harness (per-stage minima are the best contention estimator the
    # shared VM allows — each stage's true wall is the fastest observed).
    # Only merge runs that are measurement-comparable; the caller asserts
    # that by setting the flag.
    if os.environ.get("SPARK_GRAFT_SCALING_MERGE_PRIOR"):
        try:
            with open(os.path.join(REPO, "BENCH", "scaling_attempts.json")) as f:
                prior = json.load(f)
            for pa in prior.get("attempts", []):
                if (
                    pa[0]["extra"]["cpus"] == n
                    and pa[1]["extra"]["cpus"] == n4
                    and set(pa[0]["queries"]) >= set(STAGES + ANN_STAGES + CURATION_STAGES)
                ):
                    attempts.append((pa[0], pa[1]))
        except (OSError, KeyError, ValueError, IndexError, TypeError, AttributeError):
            # old-format (list) attempts file has no .get/'floors' — skip merge
            pass
    # persist raw attempts so a later session can re-measure one level and
    # merge per-stage minima instead of repeating the full (slow) pair
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_attempts.json"), "w") as f:
        json.dump({"attempts": attempts, "floors": [floor_s, floor_b]}, f, indent=1)

    def best(level: int, key: str) -> float:
        return min(a[level]["queries"][key] for a in attempts)

    r_small, r_big = attempts[0]
    rows = []
    effs = {}
    weffs = {}
    for key in STAGES + ANN_STAGES + CURATION_STAGES:
        t_s, t_b = best(0, key), best(1, key)
        f_s = floor_s["queries"][key]
        f_b = floor_b["queries"][key]
        eff = t_s / (4.0 * t_b) if t_b > 0 else float("nan")
        w_s, w_b = t_s - f_s, t_b - f_b
        weff = (
            w_s / (4.0 * w_b)
            if w_s > 0 and w_b > 0
            else float("nan")  # stage at/below its own floor: not measurable
        )
        effs[key] = round(eff, 3)
        weffs[key] = round(weff, 3)
        rows.append(
            (
                key, t_s, t_b, round(t_s / t_b, 2), round(eff, 3),
                round(f_s, 2), round(f_b, 2), round(weff, 3),
            )
        )
    # Round-matched CC floor bracket (BASELINE r5 note): CC's round count
    # is data-dependent (graph diameter), so the tiny floor leg converges
    # in fewer supersteps than the scale leg and F under-counts the
    # per-round serial cost — a DOWNWARD bias on W-eff. Scaling the whole
    # tiny wall by the round ratio over-counts instead (the floor also
    # contains fixed session/plan cost that does not repeat per round), an
    # UPWARD bias. Report both: true CC work efficiency lies in between.
    cc_bracket = None
    try:
        rounds_s = r_small["extra"]["cc_rounds"]
        rounds_b = r_big["extra"]["cc_rounds"]
        fr_s = floor_s["extra"]["cc_rounds"]
        fr_b = floor_b["extra"]["cc_rounds"]
        fm_s = floor_s["queries"]["connected_components"] * rounds_s / fr_s
        fm_b = floor_b["queries"]["connected_components"] * rounds_b / fr_b
        wm_s = best(0, "connected_components") - fm_s
        wm_b = best(1, "connected_components") - fm_b
        if wm_s > 0 and wm_b > 0:
            cc_bracket = {
                "rounds": (rounds_s, rounds_b, fr_s, fr_b),
                "f_matched": (round(fm_s, 2), round(fm_b, 2)),
                "weff_hi": round(wm_s / (4.0 * wm_b), 3),
            }
    except (KeyError, ZeroDivisionError, TypeError):
        pass
    n_edges = r_small["extra"]["edges"]
    eps_s = round(n_edges / best(0, "induce_edges"), 1)
    eps_b = round(n_edges / best(1, "induce_edges"), 1)
    eff_eps = round(eps_b / (4.0 * eps_s), 3)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("# BENCH/BASELINE — N vs 4N scaling (sandbox proxy)\n\n")
        f.write(
            f"Same job, same input, identical logical parallelism "
            f"({SHUFFLE_PARTITIONS} shuffle partitions), local[{n}] vs "
            f"local[{n4}] in fresh JVMs with per-core-constant memory — the\n"
            f"driver-mandated substitute for N vs 4N executors (no real "
            f"cluster exists in this sandbox).\n\n"
        )
        f.write(f"- input: {r_small['extra']['turns']:.0f} synthetic transcript turns → "
                f"{r_small['extra']['edges']:.0f} co-occurrence edges; sf_dir={sf_dir}\n")
        f.write(f"- induction throughput: {eps_s:.0f} edges/s @{n} cores, {eps_b:.0f} edges/s @{n4} cores\n")
        f.write(f"- **edges/sec scaling efficiency eps({n4})/(4·eps({n})) = {eff_eps}** (target ≥ 0.8)\n")
        f.write(f"- louvain modularity (identical both runs — same trajectory): "
                f"{r_small['extra']['louvain_modularity']} / {r_big['extra']['louvain_modularity']}\n\n")
        f.write(
            "Per-stage decomposition: F = the stage's wall at preset "
            "'tiny' (~zero data) at the same core count — an INDEPENDENT "
            "serial-floor estimate (schedule+plan+fixed per-action cost); "
            "W-eff = (t−F)@N / (4·(t−F)@4N) is the scaling efficiency of "
            "the parallel WORK, the floor-aware gate (target ≥ 0.8). "
            "Stages at/below their own floor report nan (not measurable "
            "at this input size).\n\n"
        )
        f.write(
            f"| stage | t@{n} (s) | t@{n4} (s) | speedup | raw eff | "
            f"F@{n} | F@{n4} | W-eff |\n"
        )
        f.write("|---|---|---|---|---|---|---|---|\n")
        for name, t_s, t_b, sp, eff, f_s, f_b, weff in rows:
            f.write(
                f"| {name} | {t_s} | {t_b} | {sp}x | {eff} | "
                f"{f_s} | {f_b} | {weff} |\n"
            )
        if cc_bracket:
            rs_, rb_, fs_, fb_ = cc_bracket["rounds"]
            fms, fmb = cc_bracket["f_matched"]
            f.write(
                f"\nCC round-matched floor bracket: scale legs ran "
                f"{rs_}/{rb_} supersteps vs {fs_}/{fb_} in the tiny floor "
                f"legs; scaling F by the round ratio gives F'={fms}/{fmb} "
                f"and W-eff' = {cc_bracket['weff_hi']} — an UPPER bound "
                f"(the floor's fixed session cost does not repeat per "
                f"round), while the unmatched W-eff in the table is the "
                f"LOWER bound. True CC work efficiency lies between.\n"
            )
        f.write(
            f"\npreset={preset}; attempts per level: {len(attempts)}"
            f"{f' (host-noise anomaly [{anomaly}] → re-measured, per-stage min)' if len(attempts) > 1 else ''}\n"
        )
        for ai, att in enumerate(attempts):
            sent = [
                (
                    r["extra"]["host_sentinel_pre_ms"],
                    r["extra"]["host_sentinel_post_ms"],
                    r["extra"]["host_sentinel_par16_pre_ms"],
                    r["extra"]["host_sentinel_par16_post_ms"],
                )
                for r in att
            ]
            f.write(
                f"host sentinel attempt {ai} (serial/par16 pure-CPU ms, "
                f"pre+post; equal sentinels ⇒ comparable legs): "
                f"@{n}: {sent[0][0]}/{sent[0][1]} par {sent[0][2]}/{sent[0][3]}, "
                f"@{n4}: {sent[1][0]}/{sent[1][1]} par {sent[1][2]}/{sent[1][3]}\n"
            )
        f.write(
            f"\n### Why N={n} (not 8↔32)\n\n"
            "This sandbox is a shared VM: a pure-CPU microbenchmark "
            "(multiprocessing sum loop, no Spark) sustains only ~0.67 "
            "efficiency from 8→32 threads (per-task wall time rises ~15%), "
            "i.e. the host cannot deliver 4× compute between 8 and 32 "
            "threads — that pair measures the host's oversubscription, not "
            "the engine's shuffle/partition design. At low thread counts "
            "the host has full headroom, so the pair isolates the engine; "
            "N=1→4 additionally maximizes per-core work against the fixed "
            "driver-orchestration floor (~15-20s/run of job scheduling + "
            "planning), which is the regime the 10^12-turn rule describes "
            "— on a real cluster that floor is amortized over thousands of "
            "executor-seconds per stage. Memory is held per-core-constant "
            f"({mem_per_core}g/core), as a 4N-executor cluster has 4N× the "
            "memory. The partitioning (64 shuffle partitions ≫ cores) is "
            "the same one that fans out on a real 4N-executor cluster.\n"
        )
    print(json.dumps({
        "n": n, "n4": n4, "eff_edges_per_sec": eff_eps, "per_stage": effs,
        "per_stage_w_eff": weffs, "cc_weff_upper": (
            cc_bracket["weff_hi"] if cc_bracket else None
        ),
        f"eps{n}": eps_s, f"eps{n4}": eps_b,
    }))


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        scaling(sf_dir)
    elif os.environ.get("SPARK_GRAFT_BENCH_CHILD") or "--raw" in sys.argv:
        # raw single run (scaling legs / gated-record children)
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, cpus)))
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(record(sf_dir, cpus)))
