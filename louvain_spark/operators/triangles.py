"""Triangle counting via degree-oriented wedge join (SURVEY.md §2.8).

Orient each undirected edge from the lower-(degree, id) endpoint to the
higher one — every triangle is counted exactly once, and the wedge join's
fan-out per vertex is bounded by out-degree ≤ O(sqrt(m)), the classical
skew bound (Suri & Vassilvitskii, WWW'11 "Counting triangles and the curse
of the last reducer"). Oracle: networkx.triangles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from louvain_spark.operators.graph import canonicalize, symmetrize


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical edges by (degree, id): low endpoint → high endpoint."""
    e = canonicalize(edges)
    deg = symmetrize(e).groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    withd = (
        e.join(deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "sd"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    lower_first = (F.col("sd") < F.col("dd")) | (
        (F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return withd.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )


def triangle_vertices(edges: DataFrame) -> DataFrame:
    """One row (u, v, w) per triangle (all three vertex ids, u<v<w order
    not guaranteed — ids are the triangle's corners)."""
    o = _oriented(edges).persist()
    # wedges a→b, a→c (b < c to emit each wedge once under orientation)
    w1 = o.select(F.col("a"), F.col("b").alias("x"))
    w2 = o.select(F.col("a"), F.col("b").alias("y"))
    wedges = w1.join(w2, "a").where(F.col("x") < F.col("y"))
    # closing edge x—y must exist in the oriented table (either direction
    # is impossible: orientation is a total order, so check both anyway via
    # canonical closure on (min,max))
    closure = o.select(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    )
    tri = wedges.join(
        closure,
        on=[
            F.least(wedges["x"], wedges["y"]) == closure["x"],
            F.greatest(wedges["x"], wedges["y"]) == closure["y"],
        ],
        how="inner",
    ).select(F.col("a"), wedges["x"].alias("b"), wedges["y"].alias("c"))
    o.unpersist()
    return tri


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the graph."""
    return triangle_vertices(edges).count()


def triangles_per_vertex(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates in."""
    tri = triangle_vertices(edges)
    corners = (
        tri.select(F.col("a").alias("id"))
        .union(tri.select(F.col("b").alias("id")))
        .union(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    if vertices is not None:
        counts = vertices.select("id").join(counts, "id", "left").select(
            "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
        )
    return counts
