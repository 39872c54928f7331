"""Table sources: driver testdata parquet + events→graph induction.

The events table doubles as a second co-occurrence source (FIXTURES.md §5):
entities are event types and users, a context is a (user, hour) session,
and two entities co-occurring in a context get an edge weighted by distinct
context count — the same induction as transcripts→edges (operators/induce.py),
kept SQL-expressible so DuckDB can replay it as the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_membership(events: DataFrame) -> DataFrame:
    """(context, entity) distinct — entities 'type:<t>' and 'user:<u>',
    context = '<user>:<yyyy-MM-dd HH>' (hour session)."""
    ctx = F.concat_ws(
        ":", F.col("user_id").cast("string"), F.date_format("ts", "yyyy-MM-dd HH")
    )
    m = events.select(
        ctx.alias("context"),
        F.explode(
            F.array(
                F.concat(F.lit("type:"), F.col("event_type")),
                F.concat(F.lit("user:"), F.col("user_id").cast("string")),
            )
        ).alias("entity"),
    )
    return m.distinct()


def events_vertices(mem: DataFrame) -> DataFrame:
    """(id, name) — dense sorted rank over distinct entities, via the
    two-phase distributed rank (plans/rank.py; no single-partition window)."""
    from louvain_spark.plans.rank import dense_sorted_rank

    ents = mem.select("entity").distinct()
    return dense_sorted_rank(ents, "entity").select("id", F.col("entity").alias("name"))


def events_cooc(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vertices(id,name), edges(src,dst,weight)) co-occurrence graph."""
    mem = events_membership(events)
    verts = events_vertices(mem)
    mi = mem.join(F.broadcast(verts.withColumnRenamed("name", "entity")), "entity").select(
        "context", "id"
    )
    a = mi.alias("a")
    b = mi.alias("b")
    pairs = (
        a.join(b, "context")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("double").alias("weight"))
    return verts, edges


# Shared DuckDB CTE replaying the same induction — the oracle-side twin of
# events_cooc; every graph oracle query builds on these.
EVENTS_COOC_SQL = """
WITH m AS (
  SELECT DISTINCT
    user_id::VARCHAR || ':' || strftime(ts, '%Y-%m-%d %H') AS context,
    entity
  FROM events, UNNEST(['type:' || event_type, 'user:' || user_id::VARCHAR]) AS t(entity)
),
v AS (
  SELECT entity AS name, row_number() OVER (ORDER BY entity) - 1 AS id
  FROM (SELECT DISTINCT entity FROM m)
),
mi AS (SELECT m.context, v.id FROM m JOIN v ON m.entity = v.name),
e AS (
  SELECT a.id AS src, b.id AS dst, count(*)::DOUBLE AS weight
  FROM mi a JOIN mi b ON a.context = b.context AND a.id < b.id
  GROUP BY 1, 2
)
"""
