"""Generate the golden IVF-Flat ANN top-k for the sf0.01 embeddings.

The engine's IVF path (operators/similarity.py:cosine_topk_ivf) is
deterministic end-to-end — hash-ordered bounded training sample, fixed-
iteration spherical k-means, zero RNG — so its expected output can be
committed as a golden and SELECTed by the DuckDB oracle. This script
derives that golden from an INDEPENDENT reimplementation (pyarrow +
numpy only; the one Spark-specific ingredient, xxhash64 over a long, is
re-implemented from the public XXH64 spec and pinned against Spark by
tests/test_ivf_golden.py), NOT from the engine, so the driver row stays
a real cross-check. Reference analog: the candidate-capped kNN the IVF
path generalizes (/root/reference/tool/Neo4jLouvainProcessor.py:109-153).

Pinned parameters (must match q_ivf_ann_topk in __spark_entry__.py):
  dim=64, n_lists=16, n_probe=4, kmeans_iters=5, sample=4096, k=5,
  queries = vec_id < 20, exclude_self=True, sf_dir=/root/testdata/sf0.01

Float-safety: Spark computes dots with sequential JVM summation, this
script with numpy — they can differ in the last ulp. The emitted sims
are rounded to 4 decimals (matching the engine query), and the script
ASSERTS every decision this rounding cannot absorb has a margin far
above ulp noise: item-assignment argmax margins, query probe-boundary
margins, top-k rank-boundary margins, and distance of every sim from a
rounding boundary. A failed assertion means "choose other parameters",
never "commit a flaky golden".

Outputs (committed):
  tests/golden/ivf_ann_topk_sf0_01.parquet
      (query_id:int64, item_id:int64, rank:int32, sim_r4:double)
  tests/golden/ivf_ann_topk_sf0_01.sql       (inline VALUES oracle SQL)
  tests/golden/ivf_centroids_sf0_01.parquet  (list_id:int32, centroid:list<double>)

Usage: python tools/gen_ivf_golden.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DIM = 64
N_LISTS = 16
N_PROBE = 4
KMEANS_ITERS = 5
SAMPLE = 4096
K = 5
QUERY_MAX_ID = 20
# decisions the 4-decimal rounding cannot absorb must clear this margin
# (JVM-vs-numpy summation noise is ~1e-15 at dim 64)
MARGIN = 1e-9

# -- public XXH64 for a single long, Spark semantics (seed 42, 8-byte
#    little-endian block == the specialized hashLong path) ----------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64_long(value: int, seed: int = 42) -> int:
    """Signed XXH64 of one long — bit-equal to Spark's F.xxhash64(longcol)
    (pinned against Spark in tests/test_ivf_golden.py)."""
    value &= _M64
    h = (seed + _P5 + 8) & _M64
    k1 = (value * _P2) & _M64
    k1 = _rotl(k1, 31)
    k1 = (k1 * _P1) & _M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def round_half_up4(v: float) -> float:
    """Spark F.round semantics (HALF_UP on the shortest decimal repr)."""
    return float(Decimal(repr(v)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _assert_margin(kind: str, margin: float) -> None:
    assert margin > MARGIN, (
        f"{kind} margin {margin:.3e} <= {MARGIN:.0e}: a cross-engine ulp "
        "difference could flip this decision — pick different parameters"
    )


def compute_golden(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    assert emb.shape[1] == DIM, f"expected dim {DIM}, got {emb.shape[1]}"

    # _unit_embeddings twin: vec = embedding / sqrt(sum x*x)
    unit = emb / np.sqrt((emb * emb).sum(axis=1, keepdims=True))

    # train_ivf_centroids twin: hash-ordered bounded sample, first-K init,
    # fixed-iteration spherical k-means
    hashes = np.asarray([xxh64_long(int(i)) for i in ids], dtype=np.int64)
    order = np.lexsort((ids, hashes))[:SAMPLE]
    x = unit[order]
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = min(N_LISTS, len(x))
    c = x[:k].copy()
    for _ in range(KMEANS_ITERS):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 1e-12:
                    c[j] = m / nrm

    # item -> nearest list (argmax dot, ties to smaller index)
    item_dots = unit @ c.T
    item_list = np.argmax(item_dots, axis=1)
    srt = np.sort(item_dots, axis=1)
    _assert_margin("item-assignment", float((srt[:, -1] - srt[:, -2]).min()))

    # query -> n_probe nearest lists
    q_mask = ids < QUERY_MAX_ID
    q_ids, q_vec = ids[q_mask], unit[q_mask]
    q_dots = q_vec @ c.T
    probe_sorted = np.sort(q_dots, axis=1)
    _assert_margin(
        "probe-boundary", float((probe_sorted[:, -N_PROBE] - probe_sorted[:, -N_PROBE - 1]).min())
    )
    probes = np.argsort(-q_dots, axis=1, kind="stable")[:, :N_PROBE]

    rows: list[tuple[int, int, int, float]] = []
    for qi in range(len(q_ids)):
        cand_mask = np.isin(item_list, probes[qi]) & (ids != q_ids[qi])
        cand_ids = ids[cand_mask]
        sims = unit[cand_mask] @ q_vec[qi]
        order2 = np.lexsort((cand_ids, -sims))
        take = order2[: K + 1]  # +1 for the rank-boundary margin check
        if len(take) > K:
            _assert_margin("rank-boundary", float(sims[take[K - 1]] - sims[take[K]]))
            take = take[:K]
        for r, idx in enumerate(take, start=1):
            s = float(sims[idx])
            # distance from the nearest 0.0001-grid HALF_UP boundary
            frac = abs(s) * 10000.0
            _assert_margin("rounding-boundary", abs((frac % 1.0) - 0.5))
            rows.append((int(q_ids[qi]), int(cand_ids[idx]), r, round_half_up4(s)))
    rows.sort()
    return rows, c


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows, centroids = compute_golden(sf_dir)

    out_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "item_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int32()),
            "sim_r4": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "ivf_ann_topk_sf0_01.parquet"))
    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(range(len(centroids)), pa.int32()),
                "centroid": pa.array(
                    [[float(v) for v in row] for row in centroids],
                    pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(out_dir, "ivf_centroids_sf0_01.parquet"),
    )

    values = ",\n".join(f"  ({q}, {i}, {r}, {s:.4f})" for q, i, r, s in rows)
    sql = (
        "-- generated by tools/gen_ivf_golden.py — do not edit\n"
        f"-- sf_dir={sf_dir} dim={DIM} n_lists={N_LISTS} n_probe={N_PROBE}"
        f" kmeans_iters={KMEANS_ITERS} sample={SAMPLE} k={K}\n"
        "SELECT query_id::BIGINT AS query_id, item_id::BIGINT AS item_id,\n"
        "       rank::INT AS rank, sim_r4::DOUBLE AS sim_r4 FROM (VALUES\n"
        f"{values}\n"
        ") AS golden(query_id, item_id, rank, sim_r4)\n"
    )
    with open(os.path.join(out_dir, "ivf_ann_topk_sf0_01.sql"), "w") as f:
        f.write(sql)
    print(f"golden: {len(rows)} top-k rows, {len(centroids)} centroids -> {out_dir}")


if __name__ == "__main__":
    main()
