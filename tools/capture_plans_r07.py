"""Capture .explain('formatted') plans for every bench stage/query touched
in optimization round 7, at the bench shape (sf0.1 / 600k-turn synth).

Usage:  python tools/capture_plans_r07.py <out_dir> <suffix>
  e.g.  python tools/capture_plans_r07.py plans/r07 after

Run it once from HEAD (suffix 'after') and once from a worktree of the
round-start commit with the same script + plans/explain.py + loop dump
hooks patched in (suffix 'before'). Stateless stages capture the frame's
formatted plan directly; iterative stages (louvain sweep, pagerank batch,
CC round) are captured by the env-gated dump hooks at their first
steady-state iteration ($SPARK_GRAFT_EXPLAIN_DIR).
"""

from __future__ import annotations

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = sys.argv[1] if len(sys.argv) > 1 else "plans/r07"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "after"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

os.makedirs(OUT, exist_ok=True)
os.environ["SPARK_GRAFT_EXPLAIN_DIR"] = os.path.abspath(
    tempfile.mkdtemp(prefix="explain-hooks-")
)

from pyspark.sql import functions as F  # noqa: E402

from louvain_spark import get_spark  # noqa: E402
from louvain_spark.plans.explain import formatted  # noqa: E402

spark = get_spark(
    "capture-plans-r07",
    master="local[32]",
    extra_conf={
        "spark.sql.shuffle.partitions": "64",
        "spark.default.parallelism": "64",
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    },
)


def save(name, df):
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(formatted(df))
    print("captured", path, flush=True)


tempfile.tempdir = "/dev/shm"
work = tempfile.mkdtemp(prefix="capture-r07-")

from louvain_spark.synth import transcripts_df  # noqa: E402

transcripts_df(spark, preset="bench").repartition(64).write.mode("overwrite").parquet(
    f"{work}/transcripts"
)
t = spark.read.parquet(f"{work}/transcripts")

# --- induce (banded pair join + dictionary rank) --------------------------
from louvain_spark.operators.induce import cooccurrence_edges, entity_vertices, membership  # noqa: E402

verts, edges = cooccurrence_edges(t, window=8)
save("induce_edges", edges)
save("entity_vertices", entity_vertices(membership(t), rank_partitions=64))
edges.write.mode("overwrite").parquet(f"{work}/edges")
verts.write.mode("overwrite").parquet(f"{work}/vertices")
edges = spark.read.parquet(f"{work}/edges")
ids = spark.read.parquet(f"{work}/vertices").select("id").persist()
ids.count()

# --- loop stages (hook dumps) ---------------------------------------------
from louvain_spark.operators.cc import connected_components  # noqa: E402
from louvain_spark.operators.louvain import louvain  # noqa: E402
from louvain_spark.operators.pagerank import pagerank  # noqa: E402
from louvain_spark.plans.loop import SuperstepRunner  # noqa: E402

connected_components(
    spark, edges, vertices=ids,
    runner=SuperstepRunner(spark, "cap-cc", "cc", checkpoint_dir=f"{work}/ckpt-cc", checkpoint_every=4),
).count()
pagerank(
    spark, edges, vertices=ids, max_iter=4, tol=0.0, steps_per_action=2,
    runner=SuperstepRunner(spark, "cap-pr", "pagerank", checkpoint_dir=f"{work}/ckpt-pr", checkpoint_every=4),
).count()
assign, mod = louvain(spark, edges, vertices=ids, mode="auto")
assign.count()
print("louvain modularity", round(mod, 6), flush=True)

hook_dir = os.environ["SPARK_GRAFT_EXPLAIN_DIR"]
for tag in ("cc_round", "pagerank_batch", "louvain_sweep"):
    src = os.path.join(hook_dir, f"{tag}.txt")
    if os.path.exists(src):
        os.replace(src, os.path.join(OUT, f"{tag}_{SUFFIX}.txt"))
        print("captured (hook)", tag, flush=True)
    else:
        print("MISSING hook dump", tag, flush=True)

# --- doc stages ------------------------------------------------------------
from louvain_spark.sources.tables import load  # noqa: E402

docs = load(spark, SF_DIR, "documents")

from louvain_spark.operators.curation import pii_scrub, strip_boilerplate_lines  # noqa: E402
from louvain_spark.operators.dedup import minhash_lsh_pairs, ngram_contamination  # noqa: E402
from louvain_spark.operators.encoding import bigram_lm_scores, encode_documents  # noqa: E402
from louvain_spark.operators.sampling import hash_split, pack_documents, stratified_sample  # noqa: E402
from louvain_spark.operators.textstats import repetition_scores  # noqa: E402
from louvain_spark.operators.webstats import build_vocab, tfidf_top_terms  # noqa: E402

save("repetition_scores", repetition_scores(docs))
save("pii_scrub", pii_scrub(docs))
save("minhash_lsh_pairs", minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3))
lab = hash_split(docs, "doc_id")
save(
    "contamination",
    ngram_contamination(
        lab.where(F.col("split") == "train"),
        lab.where(F.col("split") == "holdout"),
        n=8, threshold=0.5,
    ),
)
save("pack_documents", pack_documents(docs, budget=512, shard_chars=2))
save(
    "stratified_sample",
    stratified_sample(
        docs.withColumn("_grp", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)),
        "_grp", 50, "doc_id",
    ),
)
vocab = build_vocab(docs, top_k=5000, min_df=2)
save("build_vocab", vocab)
save("tfidf_top_terms", tfidf_top_terms(docs, k=3))
save("encode_documents", encode_documents(docs, vocab))
save("bigram_lm_scores", bigram_lm_scores(docs))
multi = docs.select(
    "doc_id", F.regexp_replace("text", r"((?:\S+\s+){7}\S+)\s+", "$1\n").alias("text")
)
save("boilerplate", strip_boilerplate_lines(multi, max_line_df=2))

# --- ANN stages ------------------------------------------------------------
n_vec, dim_v = 30000, 64
n_clusters = max(10, n_vec // 600)
raw = spark.range(n_vec).select(
    "id",
    F.when(F.col("id") < int(n_vec * 0.8), F.pmod("id", F.lit(n_clusters)))
    .otherwise(-F.col("id")).alias("c"),
)
rawvec = F.transform(
    F.sequence(F.lit(0), F.lit(dim_v - 1)),
    lambda d: F.cos(F.col("c") * (d + 1) * 0.7) + 0.03 * F.cos(F.col("id") * (d + 13) * 1.3),
)
vnorm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
raw.select("id", rawvec.alias("v")).select(
    "id", F.transform("v", lambda x: x / vnorm).alias("vec")
).repartition(64).write.mode("overwrite").parquet(f"{work}/vecs")
cvecs = spark.read.parquet(f"{work}/vecs")

from louvain_spark.operators.similarity import cosine_topk_ivf, cosine_topk_lsh  # noqa: E402

save(
    "lsh_ann_topk",
    cosine_topk_lsh(spark, cvecs, cvecs, k=10, dim=dim_v, n_planes=10, n_tables=4, max_bucket=128),
)
save(
    "ivf_ann_topk",
    cosine_topk_ivf(spark, cvecs, cvecs, k=10, dim=dim_v, n_lists=64, n_probe=8),
)

spark.stop()
import shutil  # noqa: E402

shutil.rmtree(work, ignore_errors=True)
print("done", flush=True)
