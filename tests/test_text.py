"""TF-IDF / BM25 vs a tiny in-Python oracle (mirrors the reference's
naive-reference test pattern, cpp/tests/*, SURVEY.md §5.1)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from raft_spark.operators import text
from raft_spark.operators.selectk import select_k


def _tiny_coo(spark):
    rows = [
        (0, "a", 2.0),
        (0, "b", 1.0),
        (1, "a", 1.0),
        (1, "c", 3.0),
        (2, "c", 1.0),
    ]
    return spark.createDataFrame(rows, "doc_id long, term string, tf double")


def test_tfidf_matches_formula(spark):
    out = {(r.doc_id, r.term): r.tfidf for r in text.encode_tfidf(_tiny_coo(spark)).collect()}
    n = 3
    df = {"a": 2, "b": 1, "c": 2}
    for (d, t), v in out.items():
        tf = {(0, "a"): 2.0, (0, "b"): 1.0, (1, "a"): 1.0, (1, "c"): 3.0, (2, "c"): 1.0}[(d, t)]
        # reference transform_tfidf: log-tf, idf = log(N/df + 1)
        expect = math.log(tf) * math.log(n / df[t] + 1)
        assert abs(v - expect) < 1e-9


def test_bm25_matches_formula(spark):
    k1, b = 1.6, 0.75
    out = {(r.doc_id, r.term): r.bm25 for r in text.encode_bm25(_tiny_coo(spark)).collect()}
    n, df = 3, {"a": 2, "b": 1, "c": 2}
    dl = {0: 3.0, 1: 4.0, 2: 1.0}
    avgdl = (3 + 4 + 1) / 3
    for (d, t), v in out.items():
        tf = {(0, "a"): 2.0, (0, "b"): 1.0, (1, "a"): 1.0, (1, "c"): 3.0, (2, "c"): 1.0}[(d, t)]
        # reference transform_bm25: log-tf, denom k1*(1-b+b*dl/avgdl)+tf
        idf = math.log(n / df[t] + 1)
        ltf = math.log(tf)
        expect = idf * (k1 + 1) * ltf / (k1 * (1 - b + b * dl[d] / avgdl) + ltf)
        assert abs(v - expect) < 1e-9


def test_select_k_strategies_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    coo = text.tokenize(docs)
    outs = {}
    for strat in ("window", "agg", "partial", "salted"):
        top = select_k(coo, ["doc_id"], "tf", 3, payload_cols=["term"], strategy=strat)
        outs[strat] = sorted(
            (r.doc_id, r.rank, r.term, r.tf) for r in top.collect()
        )
    assert outs["window"] == outs["agg"] == outs["partial"] == outs["salted"]
    assert len(outs["window"]) > 0


def test_select_k_partial_bounded_on_hot_group(spark):
    """One group holding 10⁶ rows: the partial strategy must (a) return
    the exact top-k, (b) do ZERO shuffle before the Python partial pass
    (phase-1 state is O(k) per group per task — the r2 salted variant
    buffered |group|/32 rows in one agg buffer), (c) shuffle only the
    ≤ partitions·k phase-1 survivors."""
    from raft_spark.plans.audit import audit_plan

    n = 1_000_000
    df = (
        spark.range(n)
        .withColumn("g", F.lit(0))
        .withColumn("v", F.pmod(F.col("id") * 48271, F.lit(n)).cast("double"))
    )
    top = select_k(df, ["g"], "v", 5, payload_cols=["id"], strategy="partial")
    rows = sorted((r.rank, r.v) for r in top.collect())
    # v is a permutation of 0..n-1, so top-5 desc is n-1 .. n-5
    assert [v for _, v in rows] == [float(n - 1 - i) for i in range(5)]
    plan = audit_plan(top)
    # exactly one exchange: the phase-2 merge of ≤ partitions·k rows;
    # the raw 10⁶ rows never shuffle (count the AQE final plan only —
    # the formatted text repeats operators in the Initial Plan section)
    import re

    final = plan.text.split("== Initial Plan ==")[0]
    assert len(re.findall(r"(?<!Reused)Exchange \(\d+\)", final)) == 1, plan.text
    assert "MapInPandas" in final


def test_exact_dedup_numeric_canonical_for_string_ids(spark):
    """Canonical id must be the NUMERIC minimum even when ids arrive
    as strings ("9" vs "10" — lexicographic min is "10")."""
    from raft_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [("9", "same text"), ("10", "same text"), ("2", "other")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: (r["canonical_id"], r["is_dup"]) for r in exact_dedup(docs).collect()}
    assert got[9] == (9, 0) and got[10] == (9, 1) and got[2] == (2, 0)


def test_duplicated_spans_matches_python_reference(spark):
    """duplicated_spans ≡ a pure-python sliding-window reference on a
    corpus with one planted repeated 8-gram (cross-doc), one repeated
    span WITHIN a doc, and clean/short docs."""
    from raft_spark.operators.dedup import duplicated_spans

    span = "a b c d e f g h"
    docs = [
        (0, f"x1 x2 {span} y1 y2"),           # planted, doc 0
        (1, f"z1 {span} z2 z3"),              # planted, doc 1
        (2, f"{span} q1 {span}"),             # repeated within one doc
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),    # clean, no dups
        (4, "short doc"),                     # ntok < n
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_spans(df, n=8, min_count=2).collect()}

    # python reference
    from collections import Counter

    toks = {d: t.split() for d, t in docs}
    windows = Counter()
    for d, t in toks.items():
        for i in range(len(t) - 7):
            windows[" ".join(t[i : i + 8])] += 1
    expect = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - 7):
            if windows[" ".join(t[i : i + 8])] >= 2:
                covered |= set(range(i, i + 8))
        expect[d] = (len(t), len(covered), (len(covered) * 1_000_000) // max(len(t), 1))
    for d in toks:
        r = got[d]
        assert (r["n_tokens"], r["dup_tokens"], r["dup_frac_ppm"]) == expect[d], d
    assert got[3]["dup_tokens"] == 0 and got[4]["dup_tokens"] == 0
    assert got[2]["dup_tokens"] > 0  # within-doc repeat counts


def test_pii_stats_and_redaction(spark):
    """Planted PII: counts per category are exact, redaction removes
    every match (stats over redacted text are all zero) and leaves
    clean text untouched."""
    from raft_spark.operators.textquality import pii_stats, redact_pii

    docs = [
        (0, "contact me at jane.doe+x@example.org or bob@sub.example.co"),
        (1, "server at 10.0.255.7 answered; backup 192.168.1.1 did not"),
        (2, "call +1 555 0100 999 or +44-20-7946-0958 now"),
        (3, "a perfectly clean sentence with no identifiers"),
        (4, "mixed: a@b.io from 8.8.8.8 dialed +33 1 2345 6789"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == (2, 0, 0)
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 2, 0)
    assert got[2]["n_email"] == 0 and got[2]["n_ipv4"] == 0 and got[2]["n_phone"] == 2
    assert got[3]["has_pii"] == 0
    assert got[4]["has_pii"] == 1 and got[4]["n_email"] == 1 and got[4]["n_ipv4"] == 1

    red = redact_pii(df)
    after = {r["doc_id"]: r for r in pii_stats(red).collect()}
    for d in range(5):
        assert after[d]["has_pii"] == 0, d
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert texts[3] == docs[3][1]  # clean text untouched
    assert "[PII]" in texts[0] and "example.org" not in texts[0]
