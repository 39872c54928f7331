"""One-leg 10x advisory for the text/vocab/encode/LM/boilerplate family
(superlinearity check, the ANN/dedup-advisory pattern).

Mirrors bench.py's preset doc-corpus synth (bench.py:228-248: 80% of
docs in n/40 near-dup families, 40 md5 words + 1 unique suffix token),
with a newline every 10 words so the family lines are true cross-doc
boilerplate (each family's 4 body lines recur in ~40 docs; the suffix
line is unique). Times build_vocab, tfidf_top_terms, encode_documents,
bigram_lm_scores and strip_boilerplate_lines at the given corpus size
on local[32]; run once at the scale4 size (150k) and once at 10x
(1.5M) in FRESH processes and compare per-doc cost.

The family's scale risks this probes: vocabulary/bigram-type tables
grow ~linearly with docs here (each doc carries a unique token, so
distinct terms ~2n) — the distinct-aggregate and rank stages must not
go superlinear; encode's per-doc re-collect; boilerplate's offender
key set (0.1n lines) staying broadcastable and its line-DF distinct
aggregate.

Usage: python tools/text_10x_advisory.py [n_docs] [cores]

With `cores` given, runs at local[cores] with the bench pair's fixed
logical parallelism (shuffle partitions 64) — run once at 1 and once at
4 in fresh processes for a raw N->4N efficiency read (advisory only:
not floor-corrected like bench.py --scaling).
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
from louvain_spark.operators.curation import strip_boilerplate_lines  # noqa: E402
from louvain_spark.operators.encoding import (  # noqa: E402
    bigram_lm_scores,
    encode_documents,
)
from louvain_spark.operators.webstats import (  # noqa: E402
    build_vocab,
    tfidf_top_terms,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "text-advisory",
        master=f"local[{cores}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.default.parallelism": "64",
        },
    )
    work = tempfile.mkdtemp(prefix="text_advisory_")

    fam = F.when(
        F.col("id") < int(n_docs * 0.8),
        F.pmod("id", F.lit(max(1, n_docs // 40))),  # ANSI: pmod by 0 raises
    ).otherwise(-F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.substring(
            F.md5(F.concat_ws("-", F.col("fam").cast("string"), i.cast("string"))),
            1, 8,
        ),
    )
    # newline every 10 words: 4 shared body lines per family + a unique
    # suffix line per doc
    line = lambda k: F.array_join(F.slice(F.col("w"), k * 10 + 1, 10), " ")  # noqa: E731
    spark.range(n_docs).select("id", fam.alias("fam")).select(
        "id", words.alias("w")
    ).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            line(0), line(1), line(2), line(3),
            F.substring(F.md5(F.col("id").cast("string")), 1, 8),
        ).alias("text"),
    ).repartition(64).write.mode("overwrite").parquet(f"{work}/docs")
    docs = spark.read.parquet(f"{work}/docs")
    out = {"n_docs": n_docs, "cores": cores}

    t0 = time.monotonic()
    vocab = build_vocab(docs, top_k=5000, min_df=2)
    out["vocab_terms"] = vocab.count()
    out["vocab_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    tfidf_top_terms(docs, k=3).agg(F.sum("score")).collect()
    out["tfidf_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    encode_documents(docs, vocab).agg(
        F.sum("n_tokens"), F.sum(F.size("token_ids"))
    ).collect()
    out["encode_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    bigram_lm_scores(docs).agg(F.sum("sum_nll_u"), F.sum("score")).collect()
    out["lm_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    bp = strip_boilerplate_lines(docs, max_line_df=2)
    kept = bp.agg(
        F.sum("n_lines").alias("nl"), F.sum("n_kept").alias("nk")
    ).collect()[0]
    out["boilerplate_s"] = round(time.monotonic() - t0, 1)
    out["lines_total"] = kept["nl"]
    out["lines_kept"] = kept["nk"]

    for k in ("vocab", "tfidf", "encode", "lm", "boilerplate"):
        out[f"{k}_us_per_doc"] = round(out[f"{k}_s"] * 1e6 / n_docs, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
