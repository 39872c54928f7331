"""record() must commit per-stage MINIMA over >=2 in-band fresh-JVM runs
(r5 VERDICT #7): a single contended-but-in-band run (the committed-r5
louvain 60s) can no longer define the round's artifact. Pure-python —
run_subprocess is stubbed, no Spark."""

import bench


def _res(queries, serial=300.0, par16=500.0, extra=None):
    e = {
        "cpus": 32,
        "host_sentinel_pre_ms": serial,
        "host_sentinel_post_ms": serial,
        "host_sentinel_par16_pre_ms": par16,
        "host_sentinel_par16_post_ms": par16,
        "edges": 1000,
    }
    e.update(extra or {})
    return {
        "metric": "m",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": dict(queries),
        "sf": 0.1,
        "extra": e,
    }


def test_record_takes_per_stage_minima(monkeypatch):
    runs = [
        _res({"induce_edges": 10.0, "louvain_parallel": 60.0}),  # contended stage
        _res({"induce_edges": 12.0, "louvain_parallel": 40.0}),
    ]
    monkeypatch.setattr(bench, "run_subprocess", lambda *a, **k: runs.pop(0))
    out = bench.record("/x/sf0.1", 32)
    assert out["queries"] == {"induce_edges": 10.0, "louvain_parallel": 40.0}
    assert out["value"] == 50.0
    e = out["extra"]
    assert len(e["attempts"]) == 2
    assert e["stage_times_are"].startswith("per-stage minima over 2")
    # derived rates recomputed from the committed minima
    assert e["edges_per_sec"] == round(1000 / 10.0, 1)
    assert e["louvain_edges_per_sec"] == round(1000 / 40.0, 1)
    # the audit digests must carry each run's REAL stage times, not the
    # post-merge minima (the base run's dict is mutated by the merge —
    # digests are snapshotted before it)
    assert e["attempts"][0]["queries"] == {
        "induce_edges": 10.0, "louvain_parallel": 60.0,
    }
    assert e["attempts"][0]["total"] == 70.0
    assert e["attempts"][1]["queries"] == {
        "induce_edges": 12.0, "louvain_parallel": 40.0,
    }


def test_record_single_inband_is_flagged(monkeypatch):
    runs = [
        _res({"induce_edges": 10.0}, serial=900.0),  # out of band
        _res({"induce_edges": 11.0}),                # in band
        _res({"induce_edges": 12.0}, serial=900.0),
        _res({"induce_edges": 13.0}, serial=900.0),
    ]
    monkeypatch.setattr(bench, "run_subprocess", lambda *a, **k: runs.pop(0))
    out = bench.record("/x/sf0.1", 32, max_attempts=4)
    assert out["queries"] == {"induce_edges": 11.0}
    assert "single-run" in out["extra"]["sentinel_note"]


def test_record_zero_inband_reports_fastest_with_note(monkeypatch):
    runs = [
        _res({"induce_edges": 10.0}, serial=900.0),
        _res({"induce_edges": 9.0}, serial=900.0),
    ]
    monkeypatch.setattr(bench, "run_subprocess", lambda *a, **k: runs.pop(0))
    out = bench.record("/x/sf0.1", 32, max_attempts=2)
    assert out["queries"] == {"induce_edges": 9.0}
    assert "out of band" in out["extra"]["sentinel_note"]
