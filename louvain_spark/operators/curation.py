"""Corpus curation operators: PII scrubbing and sequential filter funnels.

Reference analog: the ad-hoc per-file clean/filter passes in the
reference's data scripts (/root/reference/data/south_china.py:7-16 is the
dedup cousin); here they are declarative DataFrame transforms so Catalyst
fuses them into the scan.

Everything is JVM-side expressions from the Java∩RE2 portable regex
subset, so DuckDB can replay each operator as oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable (Java regex == RE2) PII patterns. Deliberately conservative:
# ASCII word boundaries, no lookarounds, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"

# redaction order is part of the contract: emails first (an IP-looking
# host inside a kept email is then still caught by the IP pass), phones
# last (a phone can never contain a prior redaction token).
PII_PASSES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, clean_text) — detect and redact
    emails / IPv4 addresses / NANP-style phone numbers.

    Counts are measured on the ORIGINAL text per category (independent
    signals for audit dashboards); `clean_text` applies the three
    redaction passes sequentially in PII_PASSES order. Pure row-local
    regexp work — zero shuffle, fuses into the scan at any scale.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    clean = t
    counts = []
    for name, pat, token in PII_PASSES:
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, clean.alias("clean_text")
    )


def filter_funnel(
    docs: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Sequential curation-funnel report: one row per rule with
    (rule_idx, rule, n_in, n_fail, n_out), where rule i is evaluated only
    over documents that passed rules 0..i-1 (the standard quality-filter
    funnel a training pipeline publishes next to its dataset card).

    A NULL predicate counts as FAIL (curation must be conservative).

    Scale note: ONE pass — every rule's boolean and the cumulative AND
    are row-local projections, and the whole funnel reduces in a single
    partially-aggregated `agg` (map-side combine ships k counters per
    partition, not rows). k rules do NOT cost k scans, and nothing is
    collected to the driver.
    """
    if not rules:
        raise ValueError("filter_funnel needs at least one rule")
    passing = F.lit(True)
    aggs = []
    for i, (_, pred) in enumerate(rules):
        before = passing
        passing = before & F.coalesce(pred.cast("boolean"), F.lit(False))
        aggs.append(
            F.coalesce(F.sum(before.cast("long")), F.lit(0)).alias(f"in_{i}")
        )
        aggs.append(
            F.coalesce(F.sum(passing.cast("long")), F.lit(0)).alias(f"out_{i}")
        )
    row = docs.agg(*aggs)
    rows = [
        F.struct(
            F.lit(i).alias("rule_idx"),
            F.lit(name).alias("rule"),
            F.col(f"in_{i}").alias("n_in"),
            (F.col(f"in_{i}") - F.col(f"out_{i}")).alias("n_fail"),
            F.col(f"out_{i}").alias("n_out"),
        )
        for i, (name, _) in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
