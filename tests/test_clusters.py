"""Cluster summarization (reference stage 4) — singleton drop, canonical
name, sorted member list, max_members cap, and composition with Louvain."""

from pyspark.sql import functions as F

from louvain_spark.operators.clusters import cluster_summary
from louvain_spark.operators.louvain import louvain
from tests import graphs
from tests.conftest import edges_df


def _verts(spark, names):
    return spark.createDataFrame(list(enumerate(names)), "id long, name string")


def test_cluster_summary_basics(spark):
    assign = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 20), (4, 30), (5, 30)],
        "id long, community long",
    )
    verts = _verts(spark, ["zeta", "alpha", "mid", "solo", "b", "a"])
    got = {r["community"]: r for r in cluster_summary(assign, verts).collect()}
    # singleton community 20 dropped (reference deletes size-1 clusters)
    assert set(got) == {10, 30}
    assert got[10]["size"] == 3
    assert got[10]["canonical_name"] == "alpha"
    assert got[10]["members"] == "alpha|mid|zeta"
    assert got[30]["members"] == "a|b"


def test_cluster_summary_max_members_cap(spark):
    assign = spark.createDataFrame([(i, 1) for i in range(6)], "id long, community long")
    verts = _verts(spark, ["f", "e", "d", "c", "b", "a"])
    row = cluster_summary(assign, verts, max_members=3).collect()[0]
    assert row["size"] == 6  # size counts all members, list is capped
    assert row["members"] == "a|b|c"


def test_cluster_summary_over_louvain(spark):
    """End-to-end: louvain assignments → cluster summaries, one summary
    per clique of the ring (every clique has ≥2 members)."""
    edges, n = graphs.g_ring_of_cliques(k=4, c=5)
    e = edges_df(spark, edges)
    verts = spark.createDataFrame(
        [(i, f"v{i:03d}") for i in range(n)], "id long, name string"
    )
    assign, _ = louvain(spark, e, vertices=verts.select("id"), mode="exact")
    got = cluster_summary(assign, verts).orderBy("canonical_name").collect()
    assert len(got) == 4
    assert [r["size"] for r in got] == [5, 5, 5, 5]
    assert got[0]["members"] == "v000|v001|v002|v003|v004"


def test_cluster_members_detail_nested(spark):
    from louvain_spark.operators.clusters import cluster_members_detail
    from pyspark.sql import functions as F

    verts = spark.createDataFrame(
        [(0, "type:a", "type"), (1, "user:9", "user"), (2, "type:b", "type"),
         (3, "user:7", "user")],
        "id long, name string, vtype string",
    )
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 0)], "id long, community long"
    )
    rows = {r["community"]: r for r in cluster_members_detail(assign, verts).collect()}
    assert set(rows) == {0}  # community 1 is a singleton, dropped
    got = [(m["name"], m["vtype"]) for m in rows[0]["members"]]
    assert got == [("type:a", "type"), ("user:7", "user"), ("user:9", "user")]
    assert rows[0]["size"] == 3
    capped = cluster_members_detail(assign, verts, max_members=2).collect()
    assert len([m for r in capped for m in r["members"]]) == 2
