"""Same-session A/B of the louvain bench stage: r4 code vs current HEAD.

r5's committed BENCH louvain stage read 60.0s vs r4's 42.9s with in-band
sentinels on both sides, unexplained by the builder's own quiet-host
minima (VERDICT r5 'what's wrong' #3). This harness adjudicates host vs
code the way BENCH/ab_ann_r4.md did for ANN: one session, interleaved
legs (A,B,A,B,...), identical pre-built input, fresh JVM per leg,
sentinels around every leg.

Method:
- build the bench-preset edge table ONCE with HEAD code (the induction
  output is byte-stable across r4..r6 — oracle hashes unchanged);
- each leg is a fresh python subprocess whose sys.path points at either
  the r4 worktree or HEAD, running ONLY `louvain(..., mode='auto')` with
  the exact bench conf (local[32], shuffle 64, 8MB split);
- optional third arm 'r6-malloc-off' reruns HEAD with the glibc malloc
  env pinned back to defaults, bisecting the one r5 session change that
  reaches the louvain python workers.

Usage: python tools/ab_louvain_r6.py [reps=3] [--with-malloc-arm]
Writes BENCH/ab_louvain_r6.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import host_sentinel_ms, host_sentinel_par_ms  # noqa: E402

R4_COMMIT = "1839db6"
WORK = "/dev/shm/ab-louvain-r6"

LEG_SCRIPT = textwrap.dedent(
    """
    import json, os, sys, tempfile, time
    repo, data = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)
    tempfile.tempdir = "/dev/shm"  # louvain sweep checkpoints, as in bench
    from louvain_spark import get_spark
    from louvain_spark.operators.louvain import louvain
    spark = get_spark(
        "ab-louvain",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.default.parallelism": "64",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    edges = spark.read.parquet(data + "/edges")
    ids = spark.read.parquet(data + "/vertices").select("id").persist()
    ids.count()
    t0 = time.monotonic()
    assign, mod = louvain(spark, edges, vertices=ids, mode="auto")
    assign.count()
    wall = time.monotonic() - t0
    print(json.dumps({"t": round(wall, 3), "mod": round(mod, 6)}))
    spark.stop()
    """
)

BUILD_SCRIPT = textwrap.dedent(
    """
    import os, sys
    repo, data = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)
    from louvain_spark import get_spark
    from louvain_spark.operators.induce import cooccurrence_edges
    from louvain_spark.synth import transcripts_df
    spark = get_spark(
        "ab-build", master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.default.parallelism": "64",
        },
    )
    t = transcripts_df(spark, preset="bench").repartition(64)
    t.write.mode("overwrite").parquet(data + "/transcripts")
    t = spark.read.parquet(data + "/transcripts")
    verts, edges = cooccurrence_edges(t, window=8)
    edges.write.mode("overwrite").parquet(data + "/edges")
    verts.write.mode("overwrite").parquet(data + "/vertices")
    print("edges:", spark.read.parquet(data + "/edges").count())
    spark.stop()
    """
)


def run_leg(repo: str, data: str, label: str, extra_env: dict | None = None) -> dict:
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        env.setdefault(var, "1")
    # each leg decides its own malloc env — don't leak ours into the child
    for var in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_", "MALLOC_MMAP_MAX_"):
        env.pop(var, None)
    if extra_env:
        env.update(extra_env)
    pre_s, pre_p = host_sentinel_ms(), host_sentinel_par_ms()
    out = subprocess.run(
        [sys.executable, "-c", LEG_SCRIPT, repo, data],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    post_s, post_p = host_sentinel_ms(), host_sentinel_par_ms()
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:] + "\n")
        raise RuntimeError(f"leg {label} produced no JSON")
    rec = json.loads(lines[-1])
    rec.update(
        label=label,
        sentinel_serial_ms=round(max(pre_s, post_s), 1),
        sentinel_par16_ms=round(max(pre_p, post_p), 1),
    )
    print(
        f"[ab] {label}: {rec['t']}s mod={rec['mod']} "
        f"(serial {rec['sentinel_serial_ms']}ms par16 {rec['sentinel_par16_ms']}ms)",
        flush=True,
    )
    return rec


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    with_malloc_arm = "--with-malloc-arm" in sys.argv
    data = os.path.join(WORK, "data")
    r4 = os.path.join(WORK, "r4code")
    os.makedirs(WORK, exist_ok=True)

    if not os.path.isdir(os.path.join(r4, "louvain_spark")):
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", r4, R4_COMMIT],
            cwd=REPO, check=True,
        )
    if not os.path.isdir(os.path.join(data, "edges")):
        subprocess.run(
            [sys.executable, "-c", BUILD_SCRIPT, REPO, data], check=True
        )

    arms = [("r4", r4, None), ("r6", REPO, None)]
    if with_malloc_arm:
        # glibc defaults: dynamic threshold (re-pin to 128KB static) — the
        # r4-era worker allocator behavior, on r6 code
        arms.append(
            (
                "r6-malloc-off",
                REPO,
                {
                    "MALLOC_MMAP_THRESHOLD_": "131072",
                    "MALLOC_TRIM_THRESHOLD_": "131072",
                },
            )
        )

    legs = []
    for rep in range(reps):
        for label, repo, env in arms:
            legs.append(run_leg(repo, data, f"{label}#{rep}", env))

    summary = {}
    for label, _, _ in arms:
        ts = [l["t"] for l in legs if l["label"].startswith(label + "#")]
        summary[label] = {"min": min(ts), "all": ts}
    out = {"legs": legs, "summary": summary, "r4_commit": R4_COMMIT, "reps": reps}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_louvain_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
