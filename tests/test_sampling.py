"""Curation sampling ops vs pure-python md5 oracles."""

import hashlib

import pytest

from louvain_spark.operators.sampling import hash_split, stratified_sample

ROWS = [(i, f"g{i % 3}") for i in range(60)]
SCHEMA = "id long, grp string"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _expected_sample(k: int, salt: str = "s0"):
    by_grp = {}
    for i, g in ROWS:
        by_grp.setdefault(g, []).append(i)
    out = {}
    for g, ids in by_grp.items():
        ranked = sorted(ids, key=lambda i: (_md5(f"{salt}:{i}"), i))
        for rn, i in enumerate(ranked[:k], start=1):
            out[(g, i)] = rn
    return out


@pytest.mark.parametrize("oversample", [4.0, 0.01])
def test_stratified_sample_exact_vs_python(spark, oversample):
    """oversample=0.01 starves the prefilter so the deficiency fallback
    must re-admit whole groups — the result must be identical either way
    (the fallback keeps the semantics exact, not approximate)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        (r["grp"], r["id"]): r["rn"]
        for r in stratified_sample(
            df, "grp", 4, "id", oversample=oversample
        ).collect()
    }
    assert got == _expected_sample(4)


def test_stratified_sample_k_exceeds_group(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = stratified_sample(df, "grp", 1000, "id").collect()
    assert len(out) == len(ROWS)  # every row sampled, ranked
    assert {r["rn"] for r in out if r["grp"] == "g0"} == set(range(1, 21))


def test_hash_split_matches_python_and_is_stable(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["id"]: r["split"] for r in hash_split(df, "id").collect()}
    exp = {
        i: "train" if _md5(f"split:{i}") < "c" * 32 else "holdout"
        for i, _ in ROWS
    }
    assert got == exp
    # repartitioning must not move any row across the split
    got2 = {
        r["id"]: r["split"] for r in hash_split(df.repartition(7), "id").collect()
    }
    assert got2 == got


def test_hash_split_rejects_bad_threshold(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        hash_split(df, "id", threshold_hex="zz")


def test_ngram_contamination_vs_python(spark):
    """Known overlap: t1 copies d1's text (fully contaminated), t2 shares
    half its 3-grams with d2, t3 is clean. Checked against a pure-python
    shingle-set oracle with the same clamped-slice semantics."""
    from louvain_spark.operators.dedup import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),
            (11, "one two three four nine ten eleven twelve"),
            (12, "totally different words appear here only"),
        ],
        "doc_id long, text string",
    )

    def sh(t, n=3):
        w = t.split()
        return {
            " ".join(w[i : i + n]) for i in range(max(len(w) - n, 0) + 1)
        }

    tr = sh("alpha beta gamma delta epsilon zeta") | sh(
        "one two three four five six seven eight"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contaminated"])
        for r in ngram_contamination(train, test, n=3, threshold=0.5).collect()
    }
    for doc_id, text in [
        (10, "alpha beta gamma delta epsilon zeta"),
        (11, "one two three four nine ten eleven twelve"),
        (12, "totally different words appear here only"),
    ]:
        s = sh(text)
        hit = len(s & tr)
        assert got[doc_id] == (len(s), hit, hit / len(s) >= 0.5), doc_id


def test_ngram_contamination_keeps_zero_shingle_docs(spark):
    """Null-text test docs yield zero shingles but must still appear in
    the audit output (n_shingles=0, frac null, contaminated=false) —
    silently dropping the degenerate docs is exactly what an auditor
    would want flagged (r5 ADVICE)."""
    from louvain_spark.operators.dedup import ngram_contamination

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_contamination(train, test, n=3, threshold=0.5).collect()
    }
    assert set(rows) == {10, 11}
    r = rows[11]
    assert r["n_shingles"] == 0 and r["n_hit"] == 0
    assert r["frac_r6"] is None
    assert r["contaminated"] is False
    assert rows[10]["contaminated"] is True


def test_corpus_stats_approx_close_to_exact(spark):
    """The sketch mode (the 100 TB path) stays within its documented rank
    error of exact quantiles on a skewed value distribution."""
    from louvain_spark.operators.textstats import corpus_stats

    rows = [(i, "t", "en" if i % 4 else "de", f"s{i % 5}", i * i % 997)
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    ex = {r["lang"]: r for r in corpus_stats(df, exact=True).collect()}
    ap = {r["lang"]: r for r in corpus_stats(df, exact=False).collect()}
    assert set(ex) == set(ap) == {"en", "de"}
    for lang in ex:
        assert ap[lang]["n_docs"] == ex[lang]["n_docs"]
        assert ap[lang]["mean_val"] == ex[lang]["mean_val"]
        for q in ("p50_val", "p90_val"):
            # approx returns an actual element near the exact quantile
            assert abs(ap[lang][q] - ex[lang][q]) <= 50, (lang, q)


def test_pack_documents_contiguous_and_repartition_stable(spark):
    """Offsets tile each shard's token stream with no gaps or overlaps,
    pack_id = floor(offset/budget), and the packing is byte-identical
    under an adversarial repartition (reproducible-training contract)."""
    from louvain_spark.operators.sampling import pack_documents

    rows = [(i, "w " * (5 + i % 17)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_documents(df, budget=32, shard_chars=1).collect()

    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
        assert r["pack_id"] == r["offset"] // 32
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["offset"])
        cum = 0
        for r in rs:
            assert r["offset"] == cum, (shard, r)
            cum += r["n_tokens"]

    out2 = pack_documents(df.repartition(13), budget=32, shard_chars=1).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
