"""Sketch accuracy pins against the exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_spark.operators import sketches as SK
from raft_spark.operators.reductions import quantiles
from raft_spark.sources.tables import load


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load(spark, "events", sf_dir)
    got = {r["col"]: r["approx_distinct"]
           for r in SK.approx_distinct(ev, ["user_id", "event_type"], rsd=0.02).collect()}
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_type").alias("t"),
    ).collect()[0]
    assert abs(got["user_id"] - exact["u"]) <= max(3, 0.1 * exact["u"])
    assert got["event_type"] == exact["t"]  # tiny cardinality: exact


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    ev = load(spark, "events", sf_dir).select("value", "event_id")
    ps = [0.5, 0.9, 0.99]
    approx = {r["p"]: r["value"]
              for r in SK.approx_quantiles(ev, "value", ps).collect()}
    exact = {r["p"]: r["value"]
             for r in quantiles(ev, "value", ps, tie_cols=["event_id"]).collect()}
    lo = ev.agg(F.min("value")).collect()[0][0]
    hi = ev.agg(F.max("value")).collect()[0][0]
    span = hi - lo
    for p in ps:
        assert abs(approx[p] - exact[p]) <= 0.05 * span, (p, approx[p], exact[p])


def test_jsonl_roundtrip_and_corrupt_handling(spark, sf_dir, tmp_path):
    from raft_spark.sources.tables import read_jsonl_corpus, write_jsonl_corpus

    docs = load(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    p = str(tmp_path / "corpus")
    write_jsonl_corpus(docs, p, partitions=4)
    # Spark refuses plans referencing ONLY the internal corrupt-record
    # column of a json scan; cache() materializes past the restriction
    back = read_jsonl_corpus(spark, p).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    a = {(r["doc_id"], r["lang"], r["text"]) for r in docs.collect()}
    b = {(r["doc_id"], r["lang"], r["text"])
         for r in back.select("doc_id", "lang", "text").collect()}
    assert a == b
    # corrupt line lands in _corrupt_record, not a job failure
    bad = tmp_path / "corpus" / "zz-bad.json"
    bad.write_text('{"doc_id": 1, "lang": "en", "text": "ok"}\n{oops not json\n')
    spark.catalog.refreshByPath(p)  # file-listing cache hides new files
    back2 = read_jsonl_corpus(spark, p).cache()
    assert back2.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert back2.count() == len(a) + 2


def test_token_count_model_fallback(spark, sf_dir):
    from raft_spark.operators.textquality import token_count_model, re_token_count

    docs = load(spark, "documents", sf_dir)
    out = token_count_model(docs)
    rows = out.collect()
    assert {r["method"] for r in rows} <= {"regex_fallback", "bpe_model"}
    exact = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", re_token_count("text").alias("n")).collect()}
    if rows[0]["method"] == "regex_fallback":
        for r in rows:
            assert r["n_tokens"] == exact[r["doc_id"]]
