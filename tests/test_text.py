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
    for strat in ("window", "agg", "salted"):
        top = select_k(coo, ["doc_id"], "tf", 3, payload_cols=["term"], strategy=strat)
        outs[strat] = sorted(
            (r.doc_id, r.rank, r.term, r.tf) for r in top.collect()
        )
    assert outs["window"] == outs["agg"] == outs["salted"]
    assert len(outs["window"]) > 0
