"""Structured Streaming operators vs their batch equivalents on the
same events data (availableNow trigger drains the file source, memory
sink collects; results must equal the one-shot batch aggregation)."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from raft_spark.streaming import incremental as S


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # File-source streams list a directory; stage the single parquet
    # file into one (simulates files arriving in an object-store path).
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark, events_dir):
    return S.read_events_batch(spark, events_dir)


def _rows(spark, name):
    return spark.sql(f"select * from {name}").collect()


def test_windowed_moments_matches_batch(spark, events_dir, batch_events):
    stream = S.windowed_moments(S.read_events_stream(spark, events_dir))
    S.run_to_memory_sink(stream, "moments_sink", output_mode="complete")
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["mean"], r["min_v"], r["max_v"])
        for r in _rows(spark, "moments_sink")
    }
    expect = {
        (r["win_start"], r["event_type"]): (r["n"], r["mean"], r["min_v"], r["max_v"])
        for r in batch_events.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("mean"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "mean", "min_v", "max_v")
        .collect()
    }
    assert got.keys() == expect.keys() and len(got) > 0
    for k, (n, mean, lo, hi) in expect.items():
        gn, gmean, glo, ghi = got[k]
        assert gn == n and abs(gmean - mean) < 1e-9 and glo == lo and ghi == hi


def test_windowed_histogram_matches_batch(spark, events_dir, batch_events):
    stream = S.windowed_histogram(S.read_events_stream(spark, events_dir))
    S.run_to_memory_sink(stream, "hist_sink", output_mode="complete")
    got = {(r["win_start"], r["bin"]): r["cnt"] for r in _rows(spark, "hist_sink")}
    bin_col = F.least(
        F.greatest(F.floor((F.col("value") - 0.0) / 25.0), F.lit(0)), F.lit(7)
    ).cast("long")
    expect = {
        (r["win_start"], r["bin"]): r["cnt"]
        for r in batch_events.groupBy(
            F.window("ts", "1 hour").alias("win"), bin_col.alias("bin")
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "bin", "cnt")
        .collect()
    }
    assert got == expect and len(got) > 0


def test_streaming_topk_two_phase(spark, events_dir, batch_events):
    stream = S.windowed_topk_events(S.read_events_stream(spark, events_dir))
    S.run_to_memory_sink(stream, "topk_sink", output_mode="complete")
    partials = spark.sql("select * from topk_sink")
    got = {
        (r["win_start"], r["rank"]): (r["user_id"], r["total"])
        for r in S.finalize_topk(partials, k=3).collect()
    }
    from pyspark.sql.window import Window

    w = Window.partitionBy("win_start").orderBy(
        F.desc("total"), F.desc("user_id")
    )
    expect = {
        (r["win_start"], r["rank"]): (r["user_id"], r["total"])
        for r in batch_events.groupBy(
            F.window("ts", "1 hour").alias("win"), "user_id"
        )
        .agg(F.sum("value").alias("total"))
        .select(F.col("win.start").alias("win_start"), "user_id", "total")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got.keys() == expect.keys() and len(got) > 0
    for k, (uid, total) in expect.items():
        assert abs(got[k][1] - total) < 1e-9  # ties may swap user ids


def test_running_topk_stateful(spark, events_dir, batch_events):
    stream = S.running_topk_stateful(S.read_events_stream(spark, events_dir), k=4)
    S.run_to_memory_sink(stream, "state_sink", output_mode="update")
    # last update per key is the final running top-k
    rows = _rows(spark, "state_sink")
    got: dict[str, list[tuple[float, int]]] = {}
    for r in rows:  # memory sink appends every trigger's updates; one trigger here
        got.setdefault(r["event_type"], []).append((r["rank"], r["value"], r["event_id"]))
    expect = (
        batch_events.groupBy("event_type")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("value", "event_id")), asc=False),
                1,
                4,
            ).alias("top")
        )
        .collect()
    )
    assert len(got) > 0
    for r in expect:
        vals = sorted((e["value"] for e in r["top"]), reverse=True)
        got_vals = sorted((v for _, v, _ in got[r["event_type"]]), reverse=True)
        assert got_vals == pytest.approx(vals)


def test_streaming_neardup_matches_batch(spark, sf_dir, tmp_path_factory):
    """Stream-static near-dup lookup: streaming the corpus against its
    own precomputed band index must reproduce the batch twin exactly
    (the signature expression is stateless, so stream == batch)."""
    import shutil as _sh

    from raft_spark.operators.dedup import band_table
    from raft_spark.sources.tables import load

    d = tmp_path_factory.mktemp("docs_stream")
    _sh.copy(f"{sf_dir}/documents.parquet", d / "part-0.parquet")
    docs = load(spark, "documents", sf_dir)
    index = band_table(docs)

    sch = spark.read.parquet(str(d)).schema
    doc_stream = spark.readStream.schema(sch).parquet(str(d))
    out = S.streaming_neardup_candidates(doc_stream, index)
    S.run_to_memory_sink(out, "neardup_sink", output_mode="append")
    got = {(r["doc_id"], r["cand_id"], r["band"]) for r in _rows(spark, "neardup_sink")}

    sb = band_table(docs)
    want = {
        (r["doc_id"], r["cand_id"], r["band"])
        for r in sb.join(
            index.select(F.col("doc_id").alias("cand_id"), "band", "bsig"),
            ["band", "bsig"],
        )
        .filter(F.col("doc_id") != F.col("cand_id"))
        .select("doc_id", "cand_id", "band")
        .collect()
    }
    assert got == want
    assert len(got) > 0  # the synthetic corpus has near-dups


def test_streaming_index_ingest_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming IVF assignment must equal the batch quantizer's
    (stateless pass ⇒ stream == batch row-for-row)."""
    import shutil as _sh

    from raft_spark.operators.similarity import ivf_assign, kmeans_centroids
    from raft_spark.sources.tables import embeddings_matrix

    corpus = embeddings_matrix(spark, sf_dir).select("id", "features")
    cents = kmeans_centroids(corpus, k=4, n_iters=2)

    d = tmp_path_factory.mktemp("emb_stream")
    _sh.copy(f"{sf_dir}/embeddings.parquet", d / "part-0.parquet")
    sch = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(sch).parquet(str(d))
        .select(F.col("vec_id").alias("id"),
                F.col("embedding").cast("array<double>").alias("features"))
    )
    out = S.streaming_index_ingest(stream, cents)
    S.run_to_memory_sink(out.select("id", "list_id"), "ingest_sink",
                         output_mode="append")
    got = {(r["id"], r["list_id"]) for r in _rows(spark, "ingest_sink")}
    want = {(r["id"], r["list_id"])
            for r in ivf_assign(corpus, cents).select("id", "list_id").collect()}
    assert got == want and len(got) == corpus.count()


def test_windowed_approx_distinct_matches_batch(spark, events_dir, batch_events):
    """HLL register merges are order-independent: the streamed estimate
    must EQUAL the batch estimate over the same rows, and sit within
    the rsd band of the exact distinct."""
    stream = S.windowed_approx_distinct(S.read_events_stream(spark, events_dir))
    S.run_to_memory_sink(stream, "hll_sink", output_mode="complete")
    got = {r["win_start"]: r["user_id_distinct"] for r in _rows(spark, "hll_sink")}
    expect = {
        r["win_start"]: r["user_id_distinct"]
        for r in batch_events.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.approx_count_distinct("user_id", 0.05).alias("user_id_distinct"))
        .select(F.col("win.start").alias("win_start"), "user_id_distinct")
        .collect()
    }
    assert got == expect and len(got) > 0
    exact = {
        r["win_start"]: r["d"]
        for r in batch_events.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.countDistinct("user_id").alias("d"))
        .select(F.col("win.start").alias("win_start"), "d")
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(0.15 * exact[k], 2)


@pytest.mark.slow  # multi-minute battery: default selection is driver-window sized (pytest.ini)
def test_windowed_count_min_matches_batch(spark, events_dir, batch_events):
    """Counter increments commute: the streamed CM sketch equals the
    batch sketch of the same window cell-for-cell, and its estimates
    dominate the true per-key counts."""
    stream = S.windowed_count_min(S.read_events_stream(spark, events_dir))
    S.run_to_memory_sink(stream, "cms_sink", output_mode="complete")
    got = {
        (r["win_start"], r["depth"], r["bucket"]): r["cnt"]
        for r in _rows(spark, "cms_sink")
    }
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(F.xxhash64(F.col("event_type"), F.lit(7 + i)), F.lit(256))
                .alias("bucket"),
            )
            for i in range(4)
        ]
    )
    expect = {
        (r["win_start"], r["depth"], r["bucket"]): r["cnt"]
        for r in batch_events.select("ts", F.explode(pairs).alias("_p"))
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            F.col("_p.depth").alias("depth"),
            F.col("_p.bucket").alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "depth", "bucket", "cnt")
        .collect()
    }
    assert got == expect and len(got) > 0
    truth = {
        (r["win_start"], r["event_type"]): r["cnt"]
        for r in batch_events.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "event_type", "cnt")
        .collect()
    }
    for (win, key), cnt in truth.items():
        est = min(
            got[(win, i, _bucket(spark, key, 7 + i, 256))] for i in range(4)
        )
        assert est >= cnt


def _bucket(spark, key: str, seed: int, width: int) -> int:
    return spark.sql(
        f"SELECT pmod(xxhash64('{key}', {seed}), {width}) AS b"
    ).collect()[0]["b"]


def test_streaming_dedup_and_moments_overflow_guard(spark, events_dir, batch_events):
    """dropDuplicatesWithinWatermark path still equals batch distinct,
    and the decimal per-row square keeps stddev finite for |value| past
    the old int64 wrap point (~3037)."""
    stream = S.streaming_dedup(S.read_events_stream(spark, events_dir))
    S.run_to_memory_sink(stream, "dedup_sink2")
    n_stream = spark.sql("select count(distinct event_id) c from dedup_sink2").collect()[0]["c"]
    assert n_stream == batch_events.select("event_id").distinct().count()

    big = batch_events.withColumn("value", F.col("value") + F.lit(10_000.0))
    from pyspark.sql import functions as FF
    out = S.windowed_moments(big).collect()  # batch path of same expr
    assert len(out) > 0
    for r in out:
        if r["n"] > 1:
            assert r["stddev"] is not None and r["stddev"] >= 0.0


def test_running_topk_long_key(spark, events_dir):
    """The stateful top-k must honor the key column's real type
    (user_id is long — the schema used to hardcode string)."""
    stream = S.running_topk_stateful(
        S.read_events_stream(spark, events_dir), key="user_id", k=3
    )
    S.run_to_memory_sink(stream, "topk_long_sink", output_mode="update")
    rows = _rows(spark, "topk_long_sink")
    assert len(rows) > 0
    assert all(isinstance(r["user_id"], int) for r in rows)


def test_streaming_span_flags_match_batch(spark, sf_dir, tmp_path_factory):
    """Stream-static span-duplication lookup: streaming the corpus
    against its own duplicated-hash index reproduces the batch join
    exactly (window hashing is a stateless expression)."""
    import shutil as _sh

    from raft_spark.operators.dedup import span_hash_table
    from raft_spark.sources.tables import load

    d = tmp_path_factory.mktemp("span_stream")
    _sh.copy(f"{sf_dir}/documents.parquet", d / "part-0.parquet")
    docs = load(spark, "documents", sf_dir)
    sh = span_hash_table(docs)
    index = (
        sh.groupBy("h").count().filter(F.col("count") >= 2).select("h")
        .localCheckpoint(eager=True)
    )

    sch = spark.read.parquet(str(d)).schema
    doc_stream = spark.readStream.schema(sch).parquet(str(d))
    out = S.streaming_span_flags(doc_stream, index)
    S.run_to_memory_sink(out, "span_sink", output_mode="append")
    got = {(r["doc_id"], r["start"]) for r in _rows(spark, "span_sink")}

    want = {
        (r["doc_id"], r["start"])
        for r in sh.join(index, "h").select("doc_id", "start").collect()
    }
    assert got == want
    assert len(got) > 0  # the synthetic corpus has repeated spans


def test_streaming_semantic_lookup_matches_batch(spark, sf_dir, tmp_path_factory):
    """Stream-static semantic near-dup lookup: streaming the embeddings
    corpus against its own semantic_index (axis-sign buckets) emits the
    exact directed within-bucket cosine->=tau matches — equal to the
    batch twin row-for-row, and symmetric-closure-equal to the batch
    pair operator semantic_pairs_exact under the same assignment."""
    import shutil as _sh

    from raft_spark.operators.dedup import semantic_index, semantic_pairs_exact
    from raft_spark.sources.tables import embeddings_matrix

    d = tmp_path_factory.mktemp("sem_stream")
    _sh.copy(f"{sf_dir}/embeddings.parquet", d / "part-0.parquet")
    corpus = embeddings_matrix(spark, sf_dir).select("id", "features")
    bucket = None
    for j in range(8):
        bit = (F.col("features")[j] > 0).cast("long") * (2 ** j)
        bucket = bit if bucket is None else bucket + bit
    asg = corpus.select("id", bucket.alias("cluster"))
    idx = semantic_index(corpus, asg).localCheckpoint(eager=True)

    sch = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(sch).parquet(str(d))
        .select(F.col("vec_id").alias("id"),
                F.col("embedding").cast("array<double>").alias("features"))
        .withColumn("cluster", bucket)
    )
    out = S.streaming_semantic_lookup(stream, idx, tau=0.4)
    S.run_to_memory_sink(out, "semlookup_sink", output_mode="append")
    got = {(r["id"], r["cand_id"]) for r in _rows(spark, "semlookup_sink")}

    pairs = {
        (r["a"], r["b"])
        for r in semantic_pairs_exact(corpus, asg, tau=0.4).collect()
    }
    want = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    assert got == want
    assert len(got) > 0  # the corpus plants near-duplicate embeddings


def test_semantic_index_roundtrip_lookup(spark, sf_dir, tmp_path_factory):
    """Persisted semantic index (write/read, partitioned by cluster)
    serves the streaming lookup identically to the in-memory build —
    the restart seam of the incremental near-dup pipeline."""
    import shutil as _sh

    from raft_spark.operators.dedup import (
        read_semantic_index,
        semantic_index,
        write_semantic_index,
    )
    from raft_spark.sources.tables import embeddings_matrix

    d = tmp_path_factory.mktemp("sem_idx_stream")
    _sh.copy(f"{sf_dir}/embeddings.parquet", d / "part-0.parquet")
    corpus = embeddings_matrix(spark, sf_dir).select("id", "features")
    bucket = None
    for j in range(8):
        bit = (F.col("features")[j] > 0).cast("long") * (2 ** j)
        bucket = bit if bucket is None else bucket + bit
    asg = corpus.select("id", bucket.alias("cluster"))
    idx = semantic_index(corpus, asg).localCheckpoint(eager=True)
    ipath = str(tmp_path_factory.mktemp("sem_idx") / "index")
    write_semantic_index(idx, ipath)
    idx2 = read_semantic_index(spark, ipath)
    assert dict(idx2.dtypes)["cluster"] == "bigint"

    sch = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(sch).parquet(str(d))
        .select(F.col("vec_id").alias("id"),
                F.col("embedding").cast("array<double>").alias("features"))
        .withColumn("cluster", bucket)
    )
    out = S.streaming_semantic_lookup(stream, idx2, tau=0.4)
    S.run_to_memory_sink(out, "semlookup_rt_sink", output_mode="append")
    got = {(r["id"], r["cand_id"]) for r in _rows(spark, "semlookup_rt_sink")}

    batch = S.streaming_semantic_lookup(
        corpus.withColumn("cluster", bucket), idx, tau=0.4
    )
    want = {(r["id"], r["cand_id"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_run_to_memory_sink_failure_names_sink_and_cause(spark, events_dir):
    # the r6 driver artifact preserved only a logical plan as the err —
    # the hardened runner must lead with the sink name and surface the
    # ROOT cause (not 2000 chars of plan), and a same-name retry after
    # the failure must not trip over the dead query's registration
    from pyspark.sql.types import LongType
    from pyspark.sql.functions import udf

    @udf(LongType())
    def boom(x):
        raise ValueError("intentional-root-cause-marker")

    stream = S.read_events_stream(spark, events_dir).select(
        boom(F.col("event_id")).alias("x")
    )
    with pytest.raises(RuntimeError) as ei:
        S.run_to_memory_sink(stream, "sink_boom", output_mode="append")
    msg = str(ei.value)
    assert msg.startswith("streaming sink 'sink_boom' failed")
    assert "intentional-root-cause-marker" in msg[:3000]

    # recovery path: the same sink name must be startable again
    ok = S.read_events_stream(spark, events_dir).select("event_id")
    S.run_to_memory_sink(ok, "sink_boom", output_mode="append")
    assert spark.sql("select count(*) n from sink_boom").collect()[0]["n"] > 0
