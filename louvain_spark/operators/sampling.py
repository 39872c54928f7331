"""Curation sampling for training-data pipelines.

Deterministic, engine-portable selection (md5-keyed — DuckDB md5 ==
Spark md5, so every op here hash-matches an ANSI-SQL oracle):

- stratified_sample: exact per-group top-k by hash rank, built to survive
  a hot group (one lang/source holding 10^10 of 10^11 rows) — a plain
  row_number window per group would funnel the whole group through one
  task; instead a uniform-hash prefilter keeps ~oversample*k candidates
  per group (map-side filter, no shuffle of the dropped rows) and only
  the candidates hit the window. A deficiency fallback re-admits whole
  groups whose candidate count fell below k, so the result is EXACTLY
  the plain-window semantics (the oracle SQL) for any input.
- hash_split: leakage-free train/holdout assignment by comparing the
  md5 hex of (salt:id) against a 32-hex-char threshold literal —
  pure-ASCII string compare, identical in every engine, stable under
  reshuffling/re-partitioning because it depends on the id alone.

The reference selects documents driver-side with ad-hoc list slicing
(/root/reference/data/south_china.py:96-104 — filter loop over the full
JSON corpus in memory); these are the distributed replacements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_key(id_col: str, salt: str):
    """md5 over 'salt:id' — the portable uniform ranking key."""
    return F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    salt: str = "s0",
    oversample: float = 4.0,
) -> DataFrame:
    """Exact deterministic per-group k-sample: the k rows with the
    smallest md5(salt:id) in each group, with their rank.

    Equivalent by construction to
        row_number() OVER (PARTITION BY group ORDER BY md5_key, id) <= k
    but scale-safe: a prefilter keeps rows whose 32-bit hash prefix falls
    under ~oversample*k/n_group (uniform, so ~oversample*k survivors per
    group), then the window ranks only survivors. Groups whose survivor
    count lands below min(k, n) — possible but exponentially unlikely at
    oversample=4 — are re-admitted in full, so the output is exact, not
    approximate. All side tables are one row per group (broadcast-sized
    even at 100 TB, where groups are languages/sources/domains).
    """
    key = _rank_key(id_col, salt)
    # 32-bit uniform u in [0,1) from the first 8 hex chars
    u = F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / float(16**8)
    tagged = df.withColumn("_key", key).withColumn("_u", u)

    counts = tagged.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    bound = F.least(F.lit(1.0), F.lit(oversample * k) / F.col("_n"))
    cand = (
        tagged.join(F.broadcast(counts.select(group_col, bound.alias("_p"))), group_col)
        .where(F.col("_u") < F.col("_p"))
        .drop("_p")
    )
    # deficiency fallback: any group with fewer survivors than min(k, n)
    # gets its full row set back (rare; keeps the semantics exact)
    survivors = cand.groupBy(group_col).agg(F.count(F.lit(1)).alias("_m"))
    deficient = (
        counts.join(survivors, group_col, "left")
        .where(
            F.coalesce(F.col("_m"), F.lit(0)) < F.least(F.lit(k), F.col("_n"))
        )
        .select(group_col)
    )
    refill = tagged.join(F.broadcast(deficient), group_col, "left_semi")
    pool = cand.select(tagged.columns).unionByName(refill).dropDuplicates(
        [group_col, id_col]
    )

    w = Window.partitionBy(group_col).orderBy("_key", id_col)
    return (
        pool.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("_key", "_u")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    threshold_hex: str = "c" * 32,
    salt: str = "split",
    left_label: str = "train",
    right_label: str = "holdout",
) -> DataFrame:
    """Add a `split` column: left_label iff md5(salt:id) < threshold_hex.

    threshold_hex is a 32-char lowercase hex literal — 'c'*32 is the
    largest fraction representable as a repeated digit ≈ 0.8; any
    fraction f is floor(f*16^32) rendered as hex. ASCII compare of md5
    hex is identical across engines and independent of partitioning, so
    membership never drifts between runs or clusters (the property that
    keeps a holdout set leakage-free as the corpus grows: a doc's split
    depends only on its id, never on which batch it arrived in).
    """
    if len(threshold_hex) != 32 or set(threshold_hex) - set("0123456789abcdef"):
        raise ValueError("threshold_hex must be 32 lowercase hex chars")
    key = _rank_key(id_col, salt)
    return df.withColumn(
        "split",
        F.when(key < F.lit(threshold_hex), F.lit(left_label)).otherwise(
            F.lit(right_label)
        ),
    )


def pack_documents(
    df: DataFrame,
    budget: int,
    shard_chars: int = 2,
    id_col: str = "doc_id",
    count_col: str | None = None,
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, shard, n_tokens, offset, pack_id) — deterministic
    concat-and-chunk sequence packing, the pretraining batch-prep step:
    documents tile a virtual token stream per shard; `pack_id` is the
    fixed-`budget` chunk a document STARTS in (docs may straddle chunk
    boundaries, exactly as concat-and-chunk training pipelines do).

    Deterministic and engine-portable by construction: the shard is the
    first `shard_chars` hex chars of md5(salt:id) (16^shard_chars uniform
    shards — no numeric hex parsing, the label is the substring itself),
    the order within a shard is (md5 key, id), and the offset is a
    running sum over that order. Re-running on a re-partitioned or
    re-shuffled corpus yields byte-identical packs, so a training run can
    be reproduced from the raw corpus alone.

    Scale: each shard's window is a sort of ~|corpus|/16^shard_chars rows
    keyed by a uniform hash — raise shard_chars until a shard fits an
    executor (4 hex chars = 65536 shards ≈ 1.5 GB/shard at 100 TB).
    The sort is the price of a reproducible global order; there is no
    cheaper deterministic packing.
    """
    if count_col is None:
        from .textstats import token_count

        cnt = token_count(F.col(text_col))
    else:
        cnt = F.col(count_col)
    key = _rank_key(id_col, salt)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        cnt.cast("long").alias("n_tokens"),
        key.alias("_key"),
        F.substring(key, 1, shard_chars).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("offset")
    out = base.select("doc_id", "shard", "n_tokens", offset)
    return out.select(
        "doc_id",
        "shard",
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / budget).cast("long").alias("pack_id"),
    )
