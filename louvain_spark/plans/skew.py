"""Explicit skew handling: salted aggregation + hub detection.

AQE splits skewed *joins* at runtime but not skewed *aggregations*
(SURVEY.md §4.1). Power-law hubs in co-occurrence graphs (a ubiquitous
tool entity, a very long conversation) need two-level salted aggregation:
partial agg on (key, salt), then final agg on key. For algebraic aggs
(count/sum/min/max) this composes exactly; COUNT(DISTINCT x) composes when
the salt is a pure function of x (distinct values partition cleanly across
salt buckets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str | Column, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Add a deterministic salt column in [0, buckets) derived from a column."""
    src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return df.withColumn(col_name, F.pmod(F.xxhash64(src), F.lit(buckets)).cast("int"))


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    out_col: str,
    buckets: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY group_cols, skew-safe.

    Salt = hash(distinct_col) % buckets, so each distinct value lands in
    exactly one bucket: per-bucket distinct counts sum to the true count.
    Map-side partial aggregation then bounds any single reducer's load at
    ~1/buckets of the hottest group.
    """
    salted = with_salt(df, distinct_col, buckets)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.count_distinct(distinct_col).alias("_partial")
    )
    return partial.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))


def salted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str,
    buckets: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """SUM(value_col) GROUP BY group_cols via two-level salted aggregation."""
    salted = with_salt(df, salt_from or value_col, buckets)
    partial = salted.groupBy(*group_cols, "_salt").agg(F.sum(value_col).alias("_partial"))
    return partial.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))


def heavy_keys(df: DataFrame, key_col: str, min_count: int) -> DataFrame:
    """Keys whose row count exceeds an ABSOLUTE bound — the salting
    trigger for bounded-per-task self-joins (induce.cooccurrence_edges):
    a key above the bound would put > min_count rows into one join group.
    Complements quantile-based hub_keys, which flags relative outliers
    even when every absolute group size is harmless."""
    return (
        df.groupBy(key_col)
        .count()
        .where(F.col("count") > min_count)
        .select(key_col, "count")
    )


def hub_keys(df: DataFrame, key_col: str, quantile: float = 0.999) -> DataFrame:
    """Degree-histogram pre-pass: keys whose frequency exceeds a quantile.

    Mirrors the reference's 'histogram first' pattern
    (/root/reference/tool/Neo4jLouvainProcessor.py:371) used here to decide
    which keys get salted/replicated treatment (SURVEY.md §4.3).
    """
    counts = df.groupBy(key_col).count()
    thr = counts.agg(
        F.percentile_approx("count", quantile).alias("thr")
    )
    return counts.join(F.broadcast(thr)).where(F.col("count") >= F.col("thr")).select(key_col, "count")
