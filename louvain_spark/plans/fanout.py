"""Opt-in scan fan-out for per-row-CPU-heavy operators.

sources.tables.load marks frames whose parquet scan cannot reach the
session's parallelism on its own (single-row-group testdata files: scan
parallelism is bounded by ROW GROUPS, not byte splits) with a
``_scan_fanout`` attribute. Operators whose per-row work is expensive —
regex/HOF passes at ~ms/row that would otherwise run serially on the one
scan task — call ``apply_scan_fanout`` to fan the rows out before their
hot map. Aggregation-dominated consumers simply don't call it, so they
never pay the extra exchange (measured +0.1-0.8s per stage when the
repartition lived unconditionally in load()).

The attribute rides the exact DataFrame object load() returned; any
transformation produces a new frame without the mark, which is correct —
the mark describes the SCAN of that frame, and the opt-in call sites sit
directly on their input table. Pure partitioning: results are identical
with or without the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def apply_scan_fanout(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the marked parallelism, if marked."""
    n = getattr(df, "_scan_fanout", None)
    if n:
        out = df.repartition(int(n))
        return out
    return df
