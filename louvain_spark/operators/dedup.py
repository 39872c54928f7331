"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame ops where possible so DuckDB can replay
them as oracle SQL (the MinHash family deliberately builds on md5-hex
string minima — md5 is identical across engines, unlike xxhash64):

- exact: group by md5(text) (hash-groupBy; one shuffle keyed by digest)
- ngram-Jaccard: shingle explode → self-join on shingle → |∩|/|∪| filter
- MinHash + LSH: shingle → per-seed min(md5(seed‖shingle)) signature →
  band buckets via md5(band signature) → bucket join for candidates
- SimHash: 64-bit signed-bit-sum signature via vectorized pandas UDF
  (Arrow batches), Hamming-distance candidate filter
- embedding cosine near-dup: see similarity.cosine_topk_* (delegated)

Scale notes: every join here is keyed by content-derived digests, which
hash-distribute uniformly (no skew salting needed except the shingle join,
where stop-shingles are the hot keys — df filter via a document-frequency
cap, the standard trick).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col):
    """Lowercase, collapse whitespace — the reference's title-normalize
    pattern (/root/reference/data/south_china.py:12)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, group_id, group_size, is_canonical) for docs whose
    normalized text appears more than once; canonical = min doc_id."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(normalize_text(F.col(text_col))).alias("digest")
    )
    grouped = keyed.groupBy("digest").agg(
        F.count(F.lit(1)).alias("group_size"), F.min("doc_id").alias("group_id")
    )
    return (
        keyed.join(grouped, "digest")
        .where(F.col("group_size") > 1)
        .select(
            "doc_id",
            "group_id",
            "group_size",
            (F.col("doc_id") == F.col("group_id")).alias("is_canonical"),
        )
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingle table (doc_id, shingle), distinct per doc."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """(src, dst, jaccard) canonical pairs with shingle-set Jaccard ≥ thr.

    max_df drops shingles appearing in more than max_df docs (stop-shingle
    skew cap — the same degree-histogram-then-cap pattern as edge induction).
    """
    sh = shingles(docs, id_col, text_col, n)
    if max_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(dfreq.where(F.col("_df") <= max_df), "shingle").select("doc_id", "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnRenamed("doc_id", "src")
    b = sh.withColumnRenamed("doc_id", "dst")
    inter = (
        a.join(b, "shingle")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "src").withColumnRenamed("n_sh", "na"), "src")
        .join(sizes.withColumnRenamed("doc_id", "dst").withColumnRenamed("n_sh", "nb"), "dst")
        .select(
            "src",
            "dst",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, sig: array<string>) — per-seed min of md5(seed‖shingle).

    String-min over md5 hex is engine-portable (DuckDB md5 == Spark md5),
    unlike xxhash64; any uniform hash family gives the Jaccard estimate.
    """
    sh = shingles(docs, id_col, text_col, n)
    mins = sh.groupBy("doc_id").agg(
        F.array(
            *[
                F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("shingle"))))
                for i in range(num_hashes)
            ]
        ).alias("sig")
    )
    return mins


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    Signature split into `bands` bands of num_hashes/bands rows; docs
    sharing any band bucket (md5 of the band's mins) become a candidate
    pair. verify_threshold, if set, re-checks candidates with exact
    shingle Jaccard and filters.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, id_col, text_col, n)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)])
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", *band_cols)
    bucket = banded.select(
        "doc_id",
        F.explode(
            F.array(*[F.concat(F.lit(f"{b}:"), F.col(f"b{b}")) for b in range(bands)])
        ).alias("bucket"),
    )
    a = bucket.withColumnRenamed("doc_id", "src")
    b = bucket.withColumnRenamed("doc_id", "dst")
    pairs = (
        a.join(b, "bucket").where(F.col("src") < F.col("dst")).select("src", "dst").distinct()
    )
    if verify_threshold is not None:
        exact = ngram_jaccard_pairs(docs, 0.0, id_col, text_col, n)
        pairs = pairs.join(exact, ["src", "dst"]).where(
            F.col("jaccard") >= verify_threshold
        )
    return pairs


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(doc_id, simhash: long) — signed bit-sum over token FNV hashes.

    Vectorized pandas UDF (Arrow batches); the per-token hash is FNV-1a
    for cross-run determinism.
    """

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = str(t).lower().split()
            if not toks:
                continue
            acc = np.zeros(bits, dtype=np.int64)
            for tok in toks:
                h = np.uint64(14695981039346656037)
                for byte in tok.encode("utf-8"):
                    h = np.uint64(h ^ np.uint64(byte)) * np.uint64(1099511628211)
                hv = int(h)
                for bpos in range(bits):
                    acc[bpos] += 1 if (hv >> bpos) & 1 else -1
            sig = 0
            for bpos in range(bits):
                if acc[bpos] > 0:
                    sig |= 1 << bpos
            # wrap to signed 64-bit
            if sig >= 1 << 63:
                sig -= 1 << 64
            out[i] = sig
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("doc_id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(src, dst, hamming) pairs within Hamming distance via 4-block LSH:
    signatures agreeing on any 16-bit block are candidates (a signature
    pair within distance 3 must agree on ≥1 of 4 blocks — pigeonhole)."""
    sigs = simhash_signatures(docs, id_col, text_col).persist()
    blocks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{i}:"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .cast("string"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("block"),
    )
    a = blocks.select(F.col("doc_id").alias("src"), F.col("simhash").alias("ha"), "block")
    b = blocks.select(F.col("doc_id").alias("dst"), F.col("simhash").alias("hb"), "block")
    cand = (
        a.join(b, "block")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "ha", "hb")
        .distinct()
    )
    out = cand.select(
        "src", "dst", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
    return out
