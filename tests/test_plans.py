"""Physical-plan quality gates: pushdown, pruning, broadcast, codegen.

These assert the *plans* the engine produces, not just results — a scan
that reads all columns for a 2-column projection, or a dict join that
shuffles instead of broadcasting, is a perf bug at 100TB even when the
answer is right.
"""

import re

from pyspark.sql import functions as F

from louvain_spark.operators.induce import cooccurrence_edges, entity_vertices, membership
from louvain_spark.sources.tables import load
from louvain_spark.synth import transcripts_df

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    df = load(spark, SF, "orders").where(F.col("o_totalprice") > 1000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*GreaterThan\(o_totalprice", plan), plan


def test_column_pruning_reaches_parquet(spark):
    df = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_dictionary_join_broadcasts(spark):
    """The membership→id dictionary join must be a broadcast, not a
    shuffle, while the dictionary is small: the entity dictionary is tiny
    relative to the turn table."""
    from louvain_spark.operators.induce import _with_ids

    t = transcripts_df(spark, preset="tiny")
    mem = membership(t)
    verts = entity_vertices(mem)
    plan = _plan(_with_ids(mem, verts))
    assert "BroadcastHashJoin" in plan, plan


def test_dictionary_join_shuffles_above_gate(spark):
    """Above broadcast_nodes the dictionary is O(|conversations|) — at the
    10^12-turn design point ~10^10 rows, never broadcastable; the gate
    must fall back to a shuffled join on entity name (r5 VERDICT #2)."""
    from louvain_spark.operators.induce import _with_ids

    t = transcripts_df(spark, preset="tiny")
    mem = membership(t)
    verts = entity_vertices(mem)
    plan = _plan(_with_ids(mem, verts, broadcast_nodes=0))
    assert "BroadcastHashJoin" not in plan, plan
    assert re.search(r"ShuffledHashJoin|SortMergeJoin", plan), plan


def test_renumber_remap_join_gated(spark, monkeypatch):
    """_renumber's community remap is |communities|-sized — worst-case
    O(|V|) at level 0 — so its broadcast must be count-gated too
    (r5 VERDICT #2). Below the gate: broadcast; above: shuffled join,
    identical assignments."""
    from louvain_spark.operators import louvain as lv

    assign = spark.createDataFrame(
        [(i, 100 + (i % 3) * 7) for i in range(30)], "id long, community long"
    )
    small = lv._renumber(assign)
    assert "BroadcastHashJoin" in _plan(small)
    monkeypatch.setattr(lv, "_RENUMBER_BROADCAST_LIMIT", 0)
    big = lv._renumber(assign)
    plan = _plan(big)
    assert "BroadcastHashJoin" not in plan, plan
    assert re.search(r"ShuffledHashJoin|SortMergeJoin", plan), plan
    assert sorted(small.collect()) == sorted(big.collect())


def test_cooccurrence_plan_has_partial_aggregation(spark):
    """The final pair-count groupBy must show a partial (map-side) agg
    before the exchange — the skew-resistance property the induction
    relies on (SURVEY.md §4.3)."""
    t = transcripts_df(spark, preset="tiny")
    _, edges = cooccurrence_edges(t, window=4)
    plan = _plan(edges)
    assert "HashAggregate" in plan
    # partial_count/partial aggregation markers appear in formatted plans
    assert re.search(r"partial_count|Partial", plan), plan


def test_whole_stage_codegen_on_relational(spark):
    df = (
        load(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    # AQE finalizes the physical plan only at execution: run the query,
    # then assert the executed adaptive plan ran inside codegen stages
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' is the WholeStageCodegen stage marker in executed-plan strings
    assert re.search(r"\*\(\d+\)", plan), plan[:600]
    assert "isFinalPlan=true" in plan


def test_dense_sorted_rank_matches_global_sort_and_stays_partitioned(spark):
    """The two-phase rank (plans/rank.py) must equal the single-partition
    Window.orderBy rank exactly, with NO single-partition exchange in its
    plan — the vertex dictionary path must never funnel through one task."""
    from pyspark.sql import Window

    from louvain_spark.plans.rank import dense_sorted_rank

    names = spark.range(0, 997).select(
        F.concat(F.lit("e"), F.format_string("%05d", (F.col("id") * 7919) % 997)).alias(
            "entity"
        )
    ).distinct()
    got = dense_sorted_rank(names, "entity", partitions=8, checkpoint=False)
    want = names.select(
        (F.row_number().over(Window.orderBy("entity")) - 1).cast("long").alias("id"),
        "entity",
    )
    assert "SinglePartition" not in _plan(got), _plan(got)
    got_rows = {(r["id"], r["entity"]) for r in got.collect()}
    want_rows = {(r["id"], r["entity"]) for r in want.collect()}
    assert got_rows == want_rows


def test_lsh_ann_dedup_exchange_carries_only_ids(spark):
    """VERDICT r2 #4, generalized for the r5 bucket-local default: NO
    pair-wide exchange may carry the vectors — at 1024-dim embeddings
    that would move ~8KB per candidate row (the exact shuffle explosion
    the r5 10x advisory caught, BENCH/ann_10x_advisory.md). rejoin mode
    dedups bare id pairs (2 columns); bucket mode's pair-wide exchange is
    the sim dedup groupBy (ids + one 8-byte partial max)."""
    from louvain_spark.operators.similarity import cosine_topk_lsh

    emb = load(spark, SF, "embeddings")
    norm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x))
    unit = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x / norm).alias("vec"),
    )
    for mode, max_cols in (("rejoin", "2"), ("bucket", "3")):
        top = cosine_topk_lsh(
            spark, unit.where(F.col("id") < 20), unit, k=5, dim=64,
            n_planes=6, n_tables=3, rerank=mode,
        )
        plan = _plan(top)
        dedup_exchanges = [
            b
            for b in re.split(r"\n(?=\(\d+\) )", plan)
            if b.split("\n")[0].endswith("Exchange")
            and re.search(r"hashpartitioning\(query_id#\d+L, item_id#\d+L", b)
        ]
        assert dedup_exchanges, (mode, plan)
        for b in dedup_exchanges:
            m = re.search(r"Input \[(\d+)\]: \[([^\]]*)\]", b)
            assert m and int(m.group(1)) <= int(max_cols), (mode, b)
            assert "_qv" not in b and "_iv" not in b, (mode, b)


def test_events_vertices_plan_has_no_single_partition_window(spark):
    """events_cooc's dictionary build (the path every graph entry query
    takes) must not contain an unpartitioned window (VERDICT r1 #3)."""
    from louvain_spark.sources.tables import events_cooc

    events = load(spark, SF, "events")
    verts, edges = events_cooc(events)
    # the dictionary is checkpointed inside dense_sorted_rank; assert the
    # downstream plans carry no single-partition exchange either
    assert "SinglePartition" not in _plan(verts)
    assert "SinglePartition" not in _plan(edges)
