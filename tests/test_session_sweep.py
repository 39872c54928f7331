"""The orphaned-local-dir sweep must only ever delete Spark-created
entries (spark-*, blockmgr-*) — pointing SPARK_GRAFT_LOCAL_DIR at a
shared directory like /tmp must not destroy unrelated files, and a live
JVM (detected by name or command line) must suppress the sweep entirely
(r5 ADVICE, medium)."""

import os
import subprocess

from louvain_spark import session as sess


def _fake_run(returncodes):
    calls = []

    def run(cmd, capture_output=True):
        calls.append(cmd)

        class R:
            returncode = returncodes[min(len(calls) - 1, len(returncodes) - 1)]

        return R()

    return run, calls


def test_sweep_only_removes_spark_prefixed_entries(tmp_path, monkeypatch):
    base = tmp_path / "local"
    base.mkdir()
    (base / "spark-abc123").mkdir()
    (base / "blockmgr-def").mkdir()
    (base / "user-data").mkdir()
    (base / "precious.txt").write_text("keep me")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(base))
    run, _ = _fake_run([1])  # no JVM alive on either probe
    monkeypatch.setattr(subprocess, "run", run)
    sess._sweep_orphaned_local_dirs()
    left = sorted(os.listdir(base))
    assert left == ["precious.txt", "user-data"]


def test_sweep_suppressed_when_jvm_alive_by_name(tmp_path, monkeypatch):
    base = tmp_path / "local"
    base.mkdir()
    (base / "spark-abc123").mkdir()
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(base))
    run, calls = _fake_run([0])  # first probe (pgrep -x java) hits
    monkeypatch.setattr(subprocess, "run", run)
    sess._sweep_orphaned_local_dirs()
    assert os.listdir(base) == ["spark-abc123"]
    assert len(calls) == 1


def test_sweep_suppressed_when_jvm_alive_by_cmdline(tmp_path, monkeypatch):
    # a JVM launched under a non-'java' binary name: name probe misses,
    # the org.apache.spark command-line probe must still suppress
    base = tmp_path / "local"
    base.mkdir()
    (base / "blockmgr-xyz").mkdir()
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(base))
    run, calls = _fake_run([1, 0])
    monkeypatch.setattr(subprocess, "run", run)
    sess._sweep_orphaned_local_dirs()
    assert os.listdir(base) == ["blockmgr-xyz"]
    assert len(calls) == 2
