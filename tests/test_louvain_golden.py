"""Golden-partition guard for the louvain_events driver row.

The driver verifies louvain_events against a committed golden
(tests/golden/louvain_events_sf0_01.{parquet,sql}) generated from the
independent vendored oracle by tools/gen_louvain_golden.py. These tests
close the two ways that gate could silently rot:

  1. stale golden — the committed files no longer match what the vendored
     oracle produces on the current sf0.01 data (regenerate-and-compare);
  2. engine drift — exact mode no longer reproduces the oracle partition
     on the real events graph (the actual cross-check the driver runs).
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tests", "golden")
PARQUET = os.path.join(GOLDEN_DIR, "louvain_events_sf0_01.parquet")
SQL = os.path.join(GOLDEN_DIR, "louvain_events_sf0_01.sql")

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason="sf0.01 testdata not present",
)


def _golden_rows():
    import pyarrow.parquet as pq

    t = pq.read_table(PARQUET)
    return dict(zip(t.column("id").to_pylist(), t.column("community").to_pylist()))


@needs_data
def test_golden_matches_fresh_oracle():
    from tools.gen_louvain_golden import oracle_partition

    fresh = oracle_partition(SF_DIR)
    assert _golden_rows() == fresh, (
        "committed golden is stale — rerun tools/gen_louvain_golden.py"
    )


@needs_data
def test_golden_sql_matches_parquet():
    import duckdb

    rows = duckdb.connect().execute(open(SQL).read()).fetchall()
    assert dict(rows) == _golden_rows()


@needs_data
def test_engine_exact_reproduces_golden(spark):
    """The driver gate itself: engine exact mode == vendored oracle on the
    sf0.01 events graph, bit-for-bit after min-id canonicalization."""
    import __spark_entry__ as entry

    got = {
        r.id: r.community for r in entry.q_louvain(spark, SF_DIR).collect()
    }
    assert got == _golden_rows()
