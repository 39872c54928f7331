"""Golden guard for the louvain_auto_events driver row.

The auto-mode golden is engine-derived (no independent implementation of
the parallel sweep schedule exists), so these tests enforce the two
properties that keep it honest:

  1. engine determinism — the current engine reproduces the committed
     partition exactly (drift in the parallel kernel, block assignment,
     or coarsening fails here first);
  2. independent quality — the committed partition's modularity,
     recomputed from the raw edges with numpy (tools/
     gen_louvain_auto_golden.modularity_of, no engine code), stays
     within MOD_SLACK of the independent vendored-oracle partition's.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PARQUET = os.path.join(GOLDEN_DIR, "louvain_auto_events_sf0_01.parquet")
SQL = os.path.join(GOLDEN_DIR, "louvain_auto_events_sf0_01.sql")

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason="sf0.01 testdata not present",
)


def _golden_rows():
    import pyarrow.parquet as pq

    t = pq.read_table(PARQUET)
    return dict(zip(t.column("id").to_pylist(), t.column("community").to_pylist()))


@needs_data
def test_golden_sql_matches_parquet():
    import duckdb

    rows = duckdb.connect().execute(open(SQL).read()).fetchall()
    assert dict(rows) == _golden_rows()


@needs_data
def test_engine_auto_reproduces_golden(spark):
    """The driver gate itself: auto mode at pinned LOUVAIN_AUTO_OPTS
    reproduces the committed partition bit-for-bit."""
    import __spark_entry__ as entry

    got = {r.id: r.community for r in entry.q_louvain_auto(spark, SF_DIR).collect()}
    assert got == _golden_rows()


@needs_data
def test_golden_modularity_clears_independent_gate():
    from tools.gen_louvain_auto_golden import MOD_SLACK, _edges, modularity_of
    from tools.gen_louvain_golden import oracle_partition

    edges = _edges(SF_DIR)
    q_auto = modularity_of(_golden_rows(), edges)
    q_oracle = modularity_of(oracle_partition(SF_DIR), edges)
    assert q_auto >= q_oracle - MOD_SLACK
