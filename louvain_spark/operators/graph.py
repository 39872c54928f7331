"""Shared graph-table helpers: canonicalization, symmetrization, degrees.

Edge tables are canonical undirected: one row per pair with src < dst
(the reference's tuple(sorted((a,b))) dedup,
/root/reference/tool/Neo4jLouvainProcessor.py:149-151). Iterative
operators derive a symmetric adjacency view on demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Make (src < dst) canonical pairs, dropping self loops and dupes."""
    out = edges.select(
        F.least(src, dst).alias("src"), F.greatest(src, dst).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    return out.distinct()


def symmetrize(edges: DataFrame, weight_col: str | None = None) -> DataFrame:
    """Both directions of a canonical edge table: (u, v[, w]).

    Self-loops (src == dst) are kept as a single row.
    """
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    fwd = edges.select(*cols)
    rev = edges.where(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *([weight_col] if weight_col else []),
    )
    return fwd.unionByName(rev)


def vertex_ids(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """All vertex ids: endpoints of edges ∪ (optional) explicit vertex table.

    The reference adds all nodes before edges so isolated vertices survive
    (/root/reference/tool/Neo4jLouvainProcessor.py:270-271).
    """
    ids = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    )
    if vertices is not None:
        ids = ids.union(vertices.select("id"))
    return ids.distinct()


def degrees(edges: DataFrame, weight_col: str | None = None) -> DataFrame:
    """Per-vertex degree and strength (A10). Self-loops count twice, as in
    networkx degree semantics the reference inherits."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    sym = edges.select("src", "dst", w.alias("w"))
    both = sym.select(F.col("src").alias("id"), "w", (F.col("src") == F.col("dst")).alias("loop")).union(
        sym.select(F.col("dst").alias("id"), "w", (F.col("src") == F.col("dst")).alias("loop"))
    )
    return both.groupBy("id").agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("w").alias("strength"),
    )


def checksum(df: DataFrame, *cols: str) -> tuple[int, int]:
    """(row_count, order-insensitive hash) — cheap fixpoint detector."""
    # sum in decimal(38,0): ANSI mode (Spark 4 default) rejects long overflow
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])
