"""Golden guard for the semantic_blend_events driver row.

Same contract as the louvain/IVF golden guards: (1) the committed golden
still matches what the independent reimplementation (scalar FNV-1a +
numpy pipeline, tools/gen_semantic_golden.py) produces on the current
sf0.01 data; (2) the engine pipeline (featurize_fields → semantic_pairs
→ blend_weights via q_semantic_blend) reproduces the golden.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PARQUET = os.path.join(GOLDEN_DIR, "semantic_blend_events_sf0_01.parquet")
SQL = os.path.join(GOLDEN_DIR, "semantic_blend_events_sf0_01.sql")

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason="sf0.01 testdata not present",
)


def _golden_rows():
    import pyarrow.parquet as pq

    t = pq.read_table(PARQUET)
    return sorted(zip(*[t.column(c).to_pylist() for c in t.column_names]))


@needs_data
def test_golden_matches_fresh_oracle():
    from tools.gen_semantic_golden import compute_golden

    fresh = sorted(compute_golden(SF_DIR))
    assert fresh == _golden_rows(), (
        "committed golden is stale — rerun tools/gen_semantic_golden.py"
    )


@needs_data
def test_golden_sql_matches_parquet():
    import duckdb

    rows = duckdb.connect().execute(open(SQL).read()).fetchall()
    assert sorted(tuple(r) for r in rows) == _golden_rows()


@needs_data
def test_engine_reproduces_golden(spark):
    import __spark_entry__ as entry

    got = sorted(
        (r["src"], r["dst"], r["weight"], r["semantic_r6"], r["relation_r6"], r["final_r6"])
        for r in entry.q_semantic_blend(spark, SF_DIR).collect()
    )
    gold = _golden_rows()
    assert [g[:3] for g in got] == [g[:3] for g in gold]
    for a, b in zip(got, gold):
        for x, y in zip(a[3:], b[3:]):
            assert abs(x - y) < 1e-12
