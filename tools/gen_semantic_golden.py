"""Generate the golden semantic-blend result for the sf0.01 events graph.

Covers the reference's semantic edge-weight stages 2-4/6 (featurize →
candidate kNN with dynamic prefilter → field-weighted blend threshold →
relation blend; /root/reference/tool/Neo4jLouvainProcessor.py:84-261)
through the driver gate. The engine path is deterministic (FNV-1a
hashing featurizer, complete blocked kNN, fixed weights), so the
expected output is committed as a golden and SELECTed by the DuckDB
oracle.

INDEPENDENT derivation — no engine code: the graph comes from the
DuckDB induction twin (EVENTS_COOC_SQL is shared oracle SQL, not engine
execution), the featurizer is re-implemented here from the public
FNV-1a spec (scalar, per-gram), and the pipeline (fp32 mean-combine,
float64 kNN, blend, relation weights) is plain numpy/python.

Float-safety: per-field vectors are BIT-IDENTICAL across
implementations (signed-count accumulators are exact integers in
float64; normalization is deterministic), and the combined vector's
fp32 cast quantizes away sub-ulp noise. The JVM-side refine/blend dots
are the only cross-engine float risk; outputs are rounded to 6
decimals and every thresholded or rounded decision is ASSERTED to
clear MARGIN, so a cross-engine ulp difference cannot flip a row.

Pinned parameters (must match q_semantic_blend in __spark_entry__.py):
  fields name_text/why_text/how_text = name / prefix before ':' /
  reversed(name); dim=64 ngram=3; k=10; threshold=0.6;
  relation type weights {'type': 0.7, 'user': 0.1};
  sf_dir=/root/testdata/sf0.01.

Outputs (committed):
  tests/golden/semantic_blend_events_sf0_01.parquet
  tests/golden/semantic_blend_events_sf0_01.sql  (inline VALUES)

Usage: python tools/gen_semantic_golden.py [sf_dir] [--report]
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
NGRAM = 3
K = 10
THRESHOLD = 0.6
FIELD_WEIGHTS = [("name_text", 0.4), ("why_text", 0.4), ("how_text", 0.2)]
TYPE_WEIGHTS = {"type": 0.7, "user": 0.1}
SEMANTIC_BLEND, RELATION_BLEND = 0.7, 0.3
MARGIN = 1e-9

_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_M64 = (1 << 64) - 1


def _fnv1a(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _M64
    return h


def featurize_text(text: str | None) -> np.ndarray:
    """Scalar FNV-1a hashing-trick featurizer (public spec): byte
    trigrams → signed buckets → L2-normalized float32. None → zeros;
    len<NGRAM → the whole byte string as one gram."""
    acc = np.zeros(DIM, dtype=np.float64)
    if text is None:
        return acc.astype(np.float32)
    raw = text.encode("utf-8")
    grams = (
        [raw[i : i + NGRAM] for i in range(len(raw) - NGRAM + 1)]
        if len(raw) >= NGRAM
        else [raw]
    )
    for g in grams:
        h = _fnv1a(g)
        acc[(h >> 1) % DIM] += 1.0 if (h & 1) == 0 else -1.0
    n = np.linalg.norm(acc)
    return (acc / n if n > 0 else acc).astype(np.float32)


def round_half_up6(v: float) -> float:
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _assert_margin(kind: str, margin: float, allow_exact_tie: bool = False) -> None:
    """A decision is flip-safe when its margin clears MARGIN — or, for
    stages whose arithmetic is BIT-IDENTICAL in both engines (the kNN
    stage: numpy float64 over identical fp32 inputs in the engine's cell
    kernel and here), when it is an EXACT tie (margin == 0.0), because
    both engines then resolve it by the same deterministic id
    tie-break. Only 0 < margin <= MARGIN is a cross-engine hazard."""
    if allow_exact_tie and margin == 0.0:
        return
    assert margin > MARGIN, (
        f"{kind} margin {margin:.3e} <= {MARGIN:.0e}: a cross-engine ulp "
        "difference could flip this decision — pick different parameters"
    )


def _graph(sf_dir: str):
    import duckdb

    from louvain_spark.sources.tables import EVENTS_COOC_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    verts = con.execute(EVENTS_COOC_SQL + "SELECT id, name FROM v ORDER BY id").fetchall()
    edges = con.execute(
        EVENTS_COOC_SQL + "SELECT src, dst, weight FROM e ORDER BY src, dst"
    ).fetchall()
    return verts, edges


def compute_golden(sf_dir: str, report: bool = False):
    verts, edges = _graph(sf_dir)
    ids = [v[0] for v in verts]
    names = {v[0]: v[1] for v in verts}

    # per-field fp32 vectors; combined = fp32 sequential field sum,
    # fp64 /n, fp64 normalize, fp32 cast (pinned Spark semantics:
    # float+float stays float in zip_with)
    fv: dict[str, dict[int, np.ndarray]] = {f: {} for f, _ in FIELD_WEIGHTS}
    comb: dict[int, np.ndarray] = {}
    for i in ids:
        nm = names[i]
        texts = {
            "name_text": nm,
            "why_text": nm.split(":", 1)[0],
            "how_text": nm[::-1],
        }
        vecs = []
        for f, _ in FIELD_WEIGHTS:
            v = featurize_text(texts[f])
            fv[f][i] = v
            vecs.append(v)
        s = vecs[0]
        for v in vecs[1:]:
            s = (s + v).astype(np.float32)  # fp32 pairwise-sequential adds
        mean = s.astype(np.float64) / float(len(vecs))
        nrm = np.sqrt((mean * mean).sum())
        comb[i] = (mean / nrm).astype(np.float32) if nrm > 0 else vecs[0]

    # candidate kNN (complete nested loop, float64 over fp32 inputs —
    # identical arithmetic to the engine's blocked numpy kernel):
    # top-K by (sim desc, id asc), prefilter at 0.8*threshold
    c_ids = np.array(ids, dtype=np.int64)
    c_mat = np.array([comb[i] for i in ids], dtype=np.float64)
    sims = c_mat @ c_mat.T
    np.fill_diagonal(sims, -np.inf)
    pre = 0.8 * THRESHOLD
    pairs: set[tuple[int, int]] = set()
    for r in range(len(ids)):
        order = np.lexsort((c_ids, -sims[r]))[:K]
        kept = [j for j in order if sims[r, j] >= pre]
        if not report:
            # margins: prefilter boundary for every candidate row, and the
            # K-th-rank boundary if the prefilter kept a full K
            for j in order:
                if sims[r, j] > -np.inf:
                    _assert_margin(
                        "prefilter-boundary", abs(sims[r, j] - pre),
                        allow_exact_tie=True,
                    )
            if len(kept) == K and len(ids) > K:
                rest = np.delete(np.arange(len(ids)), order)
                _assert_margin(
                    "knn-rank-boundary",
                    float(sims[r, order[-1]] - sims[r, rest].max()),
                    allow_exact_tie=True,
                )
        for j in kept:
            a, b = int(c_ids[r]), int(c_ids[j])
            pairs.add((min(a, b), max(a, b)))

    if report:
        flat = sims[np.isfinite(sims)]
        print(f"combined sims: max={flat.max():.4f} p99={np.quantile(flat,0.99):.4f}")

    # refine: field-weighted blend on candidates, keep >= threshold
    sem: dict[tuple[int, int], float] = {}
    blends = []
    for a, b in sorted(pairs):
        blend = 0.0
        for f, w in FIELD_WEIGHTS:
            blend += w * float(fv[f][a].astype(np.float64) @ fv[f][b].astype(np.float64))
        blends.append(blend)
        if not report:
            _assert_margin("blend-threshold", abs(blend - THRESHOLD))
        if blend >= THRESHOLD:
            sem[(a, b)] = blend
    if report:
        bl = np.array(blends)
        print(
            f"blends: n={len(bl)} max={bl.max():.4f} "
            f">=thr({THRESHOLD})={int((bl >= THRESHOLD).sum())}"
        )
        for t in (0.5, 0.6, 0.7, 0.8):
            print(f"  >= {t}: {int((bl >= t).sum())}")
        return None

    # blend with relation edges (left join, semantic default 0.0)
    rows = []
    for src, dst, w in edges:
        etypes = [names[src].split(":", 1)[0], names[dst].split(":", 1)[0]]
        rel = sum(TYPE_WEIGHTS.get(t, 0.0) for t in etypes) / len(etypes)
        s = sem.get((min(src, dst), max(src, dst)), 0.0)
        final = SEMANTIC_BLEND * s + RELATION_BLEND * rel
        for v in (s, rel, final):
            frac = abs(v) * 1e6
            _assert_margin("rounding-boundary", abs((frac % 1.0) - 0.5))
        rows.append(
            (
                int(src), int(dst), float(w),
                round_half_up6(s), round_half_up6(rel), round_half_up6(final),
            )
        )
    rows.sort()
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if "--report" in sys.argv:
        compute_golden(sf_dir, report=True)
        return
    rows = compute_golden(sf_dir)

    out_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.int64()),
                "dst": pa.array([r[1] for r in rows], pa.int64()),
                "weight": pa.array([r[2] for r in rows], pa.float64()),
                "semantic_r6": pa.array([r[3] for r in rows], pa.float64()),
                "relation_r6": pa.array([r[4] for r in rows], pa.float64()),
                "final_r6": pa.array([r[5] for r in rows], pa.float64()),
            }
        ),
        os.path.join(out_dir, "semantic_blend_events_sf0_01.parquet"),
    )
    values = ",\n".join(
        f"  ({s}, {d}, {w:.1f}, {a:.6f}, {b:.6f}, {c:.6f})"
        for s, d, w, a, b, c in rows
    )
    sql = (
        "-- generated by tools/gen_semantic_golden.py — do not edit\n"
        f"-- sf_dir={sf_dir} dim={DIM} ngram={NGRAM} k={K} threshold={THRESHOLD}\n"
        "SELECT src::BIGINT AS src, dst::BIGINT AS dst, weight::DOUBLE AS weight,\n"
        "       semantic_r6::DOUBLE AS semantic_r6,\n"
        "       relation_r6::DOUBLE AS relation_r6,\n"
        "       final_r6::DOUBLE AS final_r6 FROM (VALUES\n"
        f"{values}\n"
        ") AS golden(src, dst, weight, semantic_r6, relation_r6, final_r6)\n"
    )
    with open(os.path.join(out_dir, "semantic_blend_events_sf0_01.sql"), "w") as f:
        f.write(sql)
    n_sem = sum(1 for r in rows if r[3] > 0)
    print(f"golden: {len(rows)} edges, {n_sem} with semantic weight -> {out_dir}")


if __name__ == "__main__":
    main()
