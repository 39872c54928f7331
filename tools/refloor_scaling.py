"""Re-measure the scaling pair's per-stage serial floors and min-merge.

The N→4N table divides out an INDEPENDENT per-stage floor F (the stage's
wall at preset 'tiny' ≈ zero data). A floor is by construction a MINIMUM
serial cost — a contended tiny leg only inflates F and corrupts
W-eff = (t−F)@N / (4·(t−F)@4N) in either direction (observed: the r6 pair's
tiny@1 leg measured ivf_ann_topk F=42.8s vs 8.96s at @4 and 24.6s in r5 —
a host spike, which alone collapsed ivf W-eff to 0.333 on raw eff 0.691).

This tool runs `k` fresh tiny legs per core count, min-merges them with
the floors already recorded in BENCH/scaling_attempts.json, recomputes the
per-stage table from the UNCHANGED scale-leg attempts, appends the
corrected table to BENCH/BASELINE.md, and writes the min-merged floors
back (so SPARK_GRAFT_SCALING_REUSE_FLOORS picks up the best estimate).

Usage: python tools/refloor_scaling.py [k]   (default k=1 extra per level)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ATT = os.path.join(REPO, "BENCH", "scaling_attempts.json")
BASE = os.path.join(REPO, "BENCH", "BASELINE.md")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(ATT) as f:
        prior = json.load(f)
    floor_s, floor_b = prior["floors"]
    n = floor_s["extra"]["cpus"]
    n4 = floor_b["extra"]["cpus"]
    mem_per_core = int(os.environ.get("SPARK_GRAFT_MEM_PER_CORE_GB", "4"))

    fresh = {n: [], n4: []}
    for _ in range(k):
        for cpus in (n, n4):
            r = bench.run_subprocess(
                sf_dir, cpus, preset="tiny", mem=f"{mem_per_core * cpus}g"
            )
            fresh[cpus].append(r)
            print(
                f"[refloor] tiny@{cpus}: "
                + json.dumps({s: round(v, 2) for s, v in r["queries"].items()})
            )

    merged = []
    n_att = {}
    for base_floor, cpus in ((floor_s, n), (floor_b, n4)):
        m = dict(base_floor)
        m["queries"] = dict(base_floor["queries"])
        for r in fresh[cpus]:
            for s, v in r["queries"].items():
                m["queries"][s] = min(m["queries"].get(s, v), v)
        m.setdefault("extra", {})["floor_attempts"] = 1 + len(fresh[cpus])
        n_att[cpus] = 1 + len(fresh[cpus])
        merged.append(m)
    floor_s, floor_b = merged

    # recompute the table from the UNCHANGED scale attempts (per-stage min
    # across attempts, as scaling() reports)
    attempts = prior["attempts"]
    if not attempts:
        # set.intersection(*()) would raise a bare TypeError here, masking
        # the real condition (ADVICE r6 #3)
        raise SystemExit(
            "no recorded scale attempts in the prior artifact — run the "
            "full scaling pair first (bench.py --scaling)"
        )
    # restrict to stages every recorded attempt actually carries: attempts
    # recorded before a stage existed would otherwise KeyError at table
    # time, AFTER the fresh tiny legs were measured (wasted minutes)
    recorded = set.intersection(
        *(set(pair[side]["queries"]) for pair in attempts for side in (0, 1))
    )
    stages = tuple(
        k
        for k in bench.STAGES + bench.ANN_STAGES + bench.CURATION_STAGES
        if k in recorded
    )
    skipped = [
        k
        for k in bench.STAGES + bench.ANN_STAGES + bench.CURATION_STAGES
        if k not in recorded
    ]
    if skipped:
        print(f"[refloor] skipping stages absent from recorded attempts: {skipped}")

    def best(side: int, key: str) -> float:
        return min(pair[side]["queries"][key] for pair in attempts)

    lines = [
        "",
        "## Floor re-measurement (same session, min-merged)",
        "",
        f"Floors re-measured with {k} extra tiny leg(s) per core count and "
        f"MIN-merged with the recorded ones ({n_att[n]} attempts @{n}, "
        f"{n_att[n4]} @{n4}); scale legs unchanged. A floor is a minimum "
        "serial cost by definition — a contended tiny leg can only inflate "
        "F and corrupt W-eff (it cannot deflate it), so the min across "
        "attempts is the right estimator.",
        "",
        "| stage | t@%d (s) | t@%d (s) | raw eff | F@%d | F@%d | W-eff |"
        % (n, n4, n, n4),
        "|---|---|---|---|---|---|---|",
    ]
    for key in stages:
        t_s, t_b = best(0, key), best(1, key)
        f_s = floor_s["queries"][key]
        f_b = floor_b["queries"][key]
        eff = t_s / (4.0 * t_b) if t_b > 0 else float("nan")
        w_s, w_b = t_s - f_s, t_b - f_b
        weff = w_s / (4.0 * w_b) if w_s > 0 and w_b > 0 else float("nan")
        lines.append(
            f"| {key} | {round(t_s, 3)} | {round(t_b, 3)} | {round(eff, 3)} "
            f"| {round(f_s, 2)} | {round(f_b, 2)} | {round(weff, 3)} |"
        )
    with open(BASE, "a") as f:
        f.write("\n".join(lines) + "\n")

    prior["floors"] = [floor_s, floor_b]
    prior.setdefault("floor_raw_attempts", []).extend(
        [r for cpus in (n, n4) for r in fresh[cpus]]
    )
    with open(ATT, "w") as f:
        json.dump(prior, f)
    print(f"[refloor] appended corrected table to {BASE}")


if __name__ == "__main__":
    main()
