"""Skew-path tests: hub conversations and hub entities (SURVEY §4.3)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from louvain_spark.operators.induce import cooccurrence_edges
from louvain_spark.plans.skew import hub_keys, salted_sum, with_salt
from louvain_spark.schema import TRANSCRIPTS


def _long_conv(spark, n_turns=2000, n_tools=5):
    """One pathological conversation with n_turns turns (the quadratic
    co-occurrence risk the turn-window cap bounds)."""
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "conv_id": ["cbig"] * n_turns,
            "turn_idx": np.arange(n_turns, dtype=np.int32),
            "role": ["user", "assistant"] * (n_turns // 2),
            "text": [f"t{i}" for i in range(n_turns)],
            "tool": [
                f"t{rng.randint(n_tools):03d}" if i % 2 else None
                for i in range(n_turns)
            ],
            "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(np.arange(n_turns), "s"),
        }
    )
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS)


def test_windowed_induction_bounds_hub_conversation(spark):
    t = _long_conv(spark, n_turns=2000)
    _, edges = cooccurrence_edges(t, window=3)
    rows = edges.collect()
    # entity universe: 1 conv + 2-3 roles + ≤5 tools → ≤ C(9,2) pairs
    assert 0 < len(rows) <= 45
    # weight = distinct convs = 1 for every pair (single conversation)
    assert all(r["weight"] == 1.0 for r in rows)


def test_windowed_vs_unwindowed_pair_counts(spark):
    """The window cap must strictly reduce the candidate pair volume on a
    long conversation (the 10^12-turn tractability argument)."""
    t = _long_conv(spark, n_turns=400)
    _, capped = cooccurrence_edges(t, window=2)
    _, full = cooccurrence_edges(t, window=None)
    assert capped.count() <= full.count()


def test_hub_keys_detects_zipf_head(spark):
    from louvain_spark.operators.induce import membership
    from louvain_spark.synth import transcripts_df

    mem = membership(transcripts_df(spark, preset="small"))
    hubs = hub_keys(mem, "entity", quantile=0.99)
    names = [r["entity"] for r in hubs.collect()]
    # role entities appear on every turn → always in the hub head
    assert any(n.startswith("role:") for n in names)


def test_salted_sum_equals_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 13).cast("double").alias("v")
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        r["k"]: r["s"]
        for r in salted_sum(df, ["k"], "v", "s", buckets=8, salt_from="v").collect()
    }
    assert plain == salted


def test_with_salt_range(spark):
    df = spark.range(0, 1000).select(F.col("id").cast("string").alias("x"))
    out = with_salt(df, "x", buckets=16)
    vals = [r["_salt"] for r in out.select("_salt").distinct().collect()]
    assert all(0 <= v < 16 for v in vals)
    assert len(vals) > 8  # spreads across most buckets
