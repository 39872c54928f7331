"""Formatted-plan capture helpers (diagnostics only — no query-path use).

`formatted(df)` returns .explain("formatted") as a string; `dump(df, tag)`
writes it under $SPARK_GRAFT_EXPLAIN_DIR when that env var is set and is a
no-op otherwise. Iterative operators (louvain sweeps, pagerank batches,
CC rounds) call dump() at their first steady-state iteration so the
committed plans/r07 artifacts show the real per-iteration plan instead of
a checkpoint scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def dump(df: DataFrame, tag: str) -> None:
    base = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR")
    if not base:
        return
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, f"{tag}.txt")
    if os.path.exists(path):  # first iteration only
        return
    with open(path, "w") as f:
        f.write(formatted(df))
