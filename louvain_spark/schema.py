"""Explicit StructType schemas for every engine table.

The reference keeps schemas implicit (pandas inference + schema-free Neo4j,
see /root/reference/tool/upload.py:53-61); the engine pins them explicitly
so Parquet/Iceberg scans prune columns and every operator has a stable
contract (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input (BASELINE.json input_hint): Iceberg-style transcripts table.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Entity membership: one row per (turn, entity) occurrence — the analog of
# the reference's What->entity edges (/root/reference/tool/upload.py:118-163).
MEMBERSHIP = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("etype", T.StringType(), False),
    ]
)

# Vertex table: stable long ids assigned by sorted-name rank (never
# monotonically_increasing_id — breaks parity; FIXTURES.md §2).
VERTICES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("vtype", T.StringType(), False),
    ]
)

# Canonical undirected edge table: src < dst, one row per pair.
EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("etypes", T.ArrayType(T.StringType()), True),
    ]
)

ASSIGNMENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("community", T.LongType(), False),
    ]
)

SCORES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# Superstep run ledger: one row per (superstep, partition) — per-partition
# lineage + counters so any run resumes mid-iteration (north_rule; SURVEY §4.4).
LEDGER = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("operator", T.StringType(), False),
        T.StructField("superstep", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("moved", T.LongType(), True),
        T.StructField("metric", T.DoubleType(), True),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("checkpoint_path", T.StringType(), True),
    ]
)


# Documents table (training-data pipeline family — matches the testdata
# documents.parquet shape).
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)
