"""Unit tests for web-corpus curation operators (hand-computed
expectations on tiny corpora)."""

import math

from pyspark.sql import functions as F

from louvain_spark.operators.webstats import (
    build_vocab,
    domain_counts,
    mix_allocation,
    tfidf_top_terms,
    url_stats,
)


def _docs(spark, rows, schema="doc_id int, text string"):
    return spark.createDataFrame(rows, schema)


def test_url_stats(spark):
    df = _docs(
        spark,
        [
            (1, "a https://a.com/x b http://b.org c https://a.com/y"),
            (2, "no urls at all"),
            (3, None),
            (4, "ported https://h.io:8080/path?q=1 end"),
        ],
    )
    got = {r["doc_id"]: r for r in url_stats(df).collect()}
    assert (got[1]["n_urls"], got[1]["n_domains"], got[1]["first_domain"]) == (
        3, 2, "a.com",
    )
    assert (got[2]["n_urls"], got[2]["n_domains"], got[2]["first_domain"]) == (
        0, 0, "",
    )
    assert got[3]["n_urls"] == 0
    assert (got[4]["n_urls"], got[4]["first_domain"]) == (1, "h.io")


def test_url_stats_zero_shuffle_plan(spark):
    df = _docs(spark, [(1, "https://a.com")])
    plan = url_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_counts(spark):
    df = _docs(
        spark,
        [
            (1, "https://a.com/x then https://a.com/y and http://b.org"),
            (2, "https://a.com again"),
        ],
    )
    got = {r["domain"]: r for r in domain_counts(df).collect()}
    assert (got["a.com"]["n_mentions"], got["a.com"]["n_docs"]) == (3, 2)
    assert (got["b.org"]["n_mentions"], got["b.org"]["n_docs"]) == (1, 1)


def test_build_vocab_order_ties_min_df(spark):
    # tf: bb=4 (2 docs), aa=3 (3 docs), cc=3 (2 docs), dd=1 (1 doc)
    df = _docs(
        spark,
        [(1, "AA bb cc bb"), (2, "aa bb cc bb cc dd"), (3, "aa")],
    )
    rows = build_vocab(df, top_k=10, min_df=2).collect()
    by_id = {r["term_id"]: r for r in rows}
    # dd dropped by min_df; tie aa/cc at tf=3 broken by term asc
    assert [by_id[i]["term"] for i in range(3)] == ["bb", "aa", "cc"]
    assert (by_id[0]["tf"], by_id[0]["df"]) == (4, 2)
    assert (by_id[1]["tf"], by_id[1]["df"]) == (3, 3)  # AA lowercased
    assert (by_id[2]["tf"], by_id[2]["df"]) == (3, 2)
    assert len(rows) == 3


def test_build_vocab_top_k_cut(spark):
    df = _docs(spark, [(1, "a b c a b a"), (2, "a b c")])
    rows = build_vocab(df, top_k=2, min_df=1).collect()
    assert sorted(r["term"] for r in rows) == ["a", "b"]


def test_tfidf_top_terms(spark):
    # 3 docs; 'rare' only in doc 1 -> highest idf there
    df = _docs(
        spark,
        [(1, "common rare common"), (2, "common stuff"), (3, "common stuff")],
    )
    out = tfidf_top_terms(df, k=2).collect()
    d1 = sorted(
        [r for r in out if r["doc_id"] == 1], key=lambda r: r["rn"]
    )
    idf = lambda df_, n=3: math.log((n + 1) / (df_ + 1)) + 1  # noqa: E731
    assert d1[0]["term"] == "common"  # tf=2 beats rare's idf here
    assert d1[0]["score"] == round(2 * idf(3), 6)
    assert d1[1]["term"] == "rare"
    assert d1[1]["score"] == round(1 * idf(1), 6)
    assert all(r["rn"] <= 2 for r in out)


def test_mix_allocation_clamp_and_default(spark):
    df = spark.createDataFrame(
        [("s1", "one two three"), ("s1", "four five"), ("s2", "a b c d")],
        "source string, text string",
    )
    got = {
        r["source"]: r
        for r in mix_allocation(df, {"s1": 0.5, "s3": 0.5}, 8).collect()
    }
    # s1: 5 tokens available, target 4 -> rate 0.8, alloc 4
    assert (got["s1"]["total_tokens"], got["s1"]["target_tokens"]) == (5, 4)
    assert got["s1"]["sample_rate"] == 0.8
    assert got["s1"]["alloc_tokens"] == 4
    # s2 unlisted -> rate 0; s3 has no docs -> absent (left join from data)
    assert got["s2"]["sample_rate"] == 0.0
    assert got["s2"]["alloc_tokens"] == 0
    assert "s3" not in got


def test_mix_allocation_clamps_at_one(spark):
    df = spark.createDataFrame([("s1", "one two")], "source string, text string")
    got = mix_allocation(df, {"s1": 1.0}, 100).collect()[0]
    assert got["sample_rate"] == 1.0
    assert got["alloc_tokens"] == 2
