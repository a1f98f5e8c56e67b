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


def test_count_min_lower_bound_and_merge(spark):
    """est >= true count for EVERY key (collisions only inflate), the
    sketch of a union equals the counter-sum of the shard sketches,
    and heavy_hitters matches a naive recount."""
    import pyspark.sql.functions as F

    from raft_spark.operators.sketches import (
        count_min, count_min_estimate, heavy_hitters,
    )

    # zipf-ish synthetic: key k appears ~1000/k times
    rows = [(f"k{k}",) for k in range(1, 80) for _ in range(1000 // k)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    truth: dict[str, int] = {}
    for (v,) in rows:
        truth[v] = truth.get(v, 0) + 1

    sk = count_min(df, "v", width=256, depth=4)
    keys = spark.createDataFrame([(k,) for k in truth], "v string")
    est = {
        r["key"]: r["est"]
        for r in count_min_estimate(sk, keys, "v", width=256, depth=4).collect()
    }
    n = len(rows)
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] <= t + 4 * n / 256, (k, est[k], t)  # generous eps

    # mergeability: shard sketches sum to the whole-corpus sketch
    a = df.filter(F.xxhash64("v") % 2 == 0)
    b = df.filter(F.xxhash64("v") % 2 != 0)
    merged = (
        count_min(a, "v", width=256, depth=4)
        .unionByName(count_min(b, "v", width=256, depth=4))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["depth"], r["bucket"]): r["cnt"] for r in sk.collect()}
    for r in merged.collect():
        assert whole[(r["depth"], r["bucket"])] == r["cnt"]

    hh = {r["key"]: r["cnt"] for r in heavy_hitters(df, "v", 0.05).collect()}
    want = {k: t for k, t in truth.items() if t >= 0.05 * n}
    assert hh == want
