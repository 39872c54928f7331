"""Pin _topk_core's blocked/bufferized implementation to the reference
per-row formulation — selection, tie-breaks, threshold, self-exclusion,
and emission order must all be bit-identical for any block size (the ANN
driver goldens depend on this; see similarity._topk_core docstring for
why the kernel blocks)."""

import numpy as np

from louvain_spark.operators.similarity import _topk_core


def _reference_core(qids, qv, b_ids, mat, kk, thr, excl):
    """The original unblocked per-row formulation (r4 engine)."""
    sims = qv @ mat.T
    if excl:
        sims = np.where(qids[:, None] == b_ids[None, :], -np.inf, sims)
    n_take = min(kk, sims.shape[1])
    part = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
    out_q, out_i, out_s = [], [], []
    for row in range(sims.shape[0]):
        cand = part[row]
        order = np.lexsort((b_ids[cand], -sims[row, cand]))
        sel = cand[order]
        s = sims[row, sel]
        keep = s > -np.inf
        if thr is not None:
            keep &= s >= thr
        sel, s = sel[keep], s[keep]
        out_q.extend([qids[row]] * len(sel))
        out_i.extend(b_ids[sel])
        out_s.extend(s)
    return (
        np.asarray(out_q, dtype=np.int64),
        np.asarray(out_i, dtype=np.int64),
        np.asarray(out_s, dtype=np.float64),
    )


def test_topk_core_matches_reference_across_block_sizes():
    rng = np.random.default_rng(7)
    for trial in range(80):
        nq = int(rng.integers(1, 400))
        ni = int(rng.integers(1, 300))
        kk = int(rng.integers(1, 15))
        dim = int(rng.integers(2, 17))
        # quantized values force sim ties; overlapping id spaces force
        # self-exclusion hits on a subset of rows
        qv = np.round(rng.standard_normal((nq, dim)) * 2) / 4
        mat = np.round(rng.standard_normal((ni, dim)) * 2) / 4
        qids = rng.choice(np.arange(500), size=nq, replace=False).astype(np.int64)
        b_ids = rng.choice(np.arange(500), size=ni, replace=False).astype(np.int64)
        thr = None if trial % 3 else 0.1
        excl = bool(trial % 2)
        block_rows = int(rng.integers(1, nq + 1))
        ref = _reference_core(qids, qv, b_ids, mat, kk, thr, excl)
        got = _topk_core(qids, qv, b_ids, mat, kk, thr, excl, block_rows=block_rows)
        for r, g in zip(ref, got):
            assert len(r) == len(g)
            assert np.array_equal(r, g), (trial, nq, ni, kk, thr, excl, block_rows)


def test_topk_core_all_excluded_row_emits_nothing():
    # a query whose only candidate is itself must vanish entirely
    qids = np.array([5], dtype=np.int64)
    b_ids = np.array([5], dtype=np.int64)
    qv = np.ones((1, 4))
    mat = np.ones((1, 4))
    out_q, out_i, out_s = _topk_core(qids, qv, b_ids, mat, 3, None, True)
    assert len(out_q) == len(out_i) == len(out_s) == 0


def test_topk_core_threshold_filters_per_row():
    qids = np.array([1, 2], dtype=np.int64)
    b_ids = np.array([10, 11], dtype=np.int64)
    qv = np.array([[1.0, 0.0], [0.0, 1.0]])
    mat = np.array([[1.0, 0.0], [0.0, 0.5]])
    out_q, out_i, out_s = _topk_core(qids, qv, b_ids, mat, 2, 0.9, False)
    # row 1: sims (1.0, 0.0) -> only item 10; row 2: sims (0.0, 0.5) -> none
    assert out_q.tolist() == [1]
    assert out_i.tolist() == [10]
    assert out_s.tolist() == [1.0]
