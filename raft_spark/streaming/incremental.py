"""Structured Streaming variants of the aggregation-shaped operators.

The reference has no streaming (SURVEY.md §2.12) — this is the engine's
extension: the moments / histogram / top-k primitives (stats/mean.cuh,
stats/histogram.cuh, matrix/select_k.cuh semantics) recomputed
incrementally over an event stream with watermarked event-time windows.

Design for scale:
- All windowed aggregates use built-in partial-aggregating functions
  (count/sum/avg/stddev) — state per (window, key) only, map-side
  combined, no per-event state.
- Late data bounded by the watermark; state is evicted when windows
  close (append mode), so state size = open windows × keys.
- Grouped top-k is split "stream partial, batch finalize": the stream
  maintains the per-(window,key) sums (cheap, incremental); the exact
  top-k over a closed window runs as a batch select_k on the sink —
  the same two-phase shape as the batch operator's partial-then-merge.
- ``running_topk_stateful`` shows the custom-stateful path
  (applyInPandasWithState): bounded O(k) state per key, Arrow-batched.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# events.ts has shipped as EITHER raw INT64 epoch-nanoseconds (no
# parquet logical type — read as long via nanosAsLong, converted
# explicitly) OR parquet TIMESTAMP(MICROS) (read natively). Readers
# probe the file's real schema and _with_event_time normalizes both
# encodings to one event-time timestamp, so a testdata regeneration
# can't silently collapse windows again.
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _with_event_time(df: DataFrame) -> DataFrame:
    t = dict(df.dtypes)["ts"]
    if t in ("bigint", "long"):
        # exact integer FLOOR division, NOT `/1000` + cast (float
        # division of an int64 epoch ~1.7e18 > 2^53 rounds the last
        # microsecond) and NOT a bare `div` (truncation-toward-zero
        # rounds pre-1970 timestamps UP a microsecond, shifting
        # boundary events into the adjacent window vs a flooring
        # engine): subtract the positive residue first.
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
        )
    # timestamp / timestamp_ntz: one cast; session tz is UTC, so the
    # wall-clock reading matches DuckDB's naive TIMESTAMP exactly.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def read_events_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Batch read of an events parquet (file or directory) with the
    event-time column normalized — the single seam every batch query
    over `events` goes through."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _with_event_time(spark.read.parquet(events_path))


_EVENTS_SCHEMA_CACHE: dict = {}


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    At scale this is the replayable on-arrival source (object-store
    listing); swap for Kafka by replacing this one reader — every
    operator below is source-agnostic.
    """
    # needed only for the legacy raw-nanos encoding; harmless otherwise
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # probe the on-disk schema instead of forcing one — the stream
    # source requires an explicit schema. The probe is a one-task Spark
    # job, so it is cached per directory: every stream query over the
    # same source pays it once per session, not once per query. Keyed
    # on the live context's applicationId (id(gateway) could be reused
    # by CPython after a JVM relaunch and serve a schema bound to the
    # dead JVM) PLUS a fingerprint of the directory's top-level listing
    # (names/mtimes/sizes), so a source whose files evolve schema
    # mid-session re-probes instead of silently pinning the old schema.
    try:
        with os.scandir(events_dir) as it:
            fp = hash(tuple(sorted(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                for e in it if not e.name.startswith((".", "_"))
            )))
    except OSError:
        fp = None
    key = (spark.sparkContext.applicationId, events_dir, fp)
    sch = _EVENTS_SCHEMA_CACHE.get(key)
    if sch is None:
        # entries are schema-sized; superseded fingerprints just fall
        # out of use (bounded by source-change events per session)
        sch = _EVENTS_SCHEMA_CACHE[key] = spark.read.parquet(events_dir).schema
    return _with_event_time(spark.readStream.schema(sch).parquet(events_dir))


def windowed_moments(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    key: str = "event_type",
) -> DataFrame:
    """Incremental per-window moments (stats/mean.cuh, stddev.cuh,
    minmax.cuh semantics): count/mean/stddev/min/max of ``value`` per
    (event-time window, key). Pure built-in aggregates → incremental
    partial aggregation, state evicted at watermark.

    mean/stddev derive from INTEGER-scaled sums: each value is
    quantized per-row to v_int = round(value·10⁶) (a pure row function,
    identical on any engine), and Σv_int / Σv_int² are exact int64
    sums — order-INDEPENDENT, so the streaming state's micro-batch
    merge order and a batch engine's scan order produce bit-identical
    sums, and the derived mean/stddev cannot drift across engines
    (float sums differed at ~1e-8 and flipped rounded cells at sf0.1).

    The sums accumulate as decimal(38,0): with |v|≤100, v_int²≈10¹⁶,
    so an int64 Σv_int² would wrap SILENTLY (non-ANSI sum) after only
    ~922 rows per (window,key) group while DuckDB widens to HUGEINT —
    decimal(38,0) keeps both engines exact to ~10²² rows. Each per-row
    term is computed in DECIMAL too — an int64 _vi·_vi would itself
    wrap silently once |value| ≥ ~3037 (vi² > 2⁶³); casting one operand
    BEFORE the multiply keeps the per-row product exact as well.
    """
    vi = F.round(F.col("value") * 1_000_000).cast("long")
    vi_dec = F.col("_vi").cast("decimal(38,0)")
    base = (
        events.withColumn("_vi", vi)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col(key))
        .agg(
            F.count("*").alias("n"),
            F.sum(vi_dec).alias("_s"),
            F.sum((vi_dec * F.col("_vi")).cast("decimal(38,0)")).alias("_ssq"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    s = F.col("_s").cast("double") / 1e6
    ssq = F.col("_ssq").cast("double") / 1e12
    var = (ssq - s * s / F.col("n")) / (F.col("n") - 1)
    return base.select(
        F.col("win.start").alias("win_start"),
        F.col(key),
        "n",
        (s / F.col("n")).alias("mean"),
        F.when(F.col("n") > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("stddev"),
        "min_v",
        "max_v",
    )


def windowed_histogram(
    events: DataFrame,
    lo: float = 0.0,
    width: float = 25.0,
    n_bins: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Incremental fixed-width histogram per window (stats/histogram.cuh
    semantics, same binning as the batch ``histogram_events`` query):
    bin = clamp(floor((value-lo)/width), 0, n_bins-1)."""
    bin_col = F.least(
        F.greatest(F.floor((F.col("value") - lo) / width), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), bin_col.alias("bin"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "bin", "cnt")
    )


def windowed_topk_events(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming partial stage of grouped top-k (matrix/select_k.cuh
    shape): per-(window, user) value sums, incrementally maintained.
    Finalize on the sink with ``finalize_topk`` once windows close —
    rank-within-group is not incrementally maintainable in append mode,
    and the two-phase split keeps streaming state O(windows×users)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("user_id"))
        .agg(F.sum("value").alias("total"))
        .select(F.col("win.start").alias("win_start"), "user_id", "total")
    )


def finalize_topk(partials: DataFrame, k: int = 5) -> DataFrame:
    """Batch finalizer: exact top-k users per closed window from the
    streamed partial sums, through the bounded two-phase ``select_k``
    (O(k) aggregation state per task — a windows-worth of users never
    buffers in one collect_list, the same unbounded-state trap the
    salted select_k phase-1 had). Ties: total desc, user_id asc."""
    from raft_spark.operators.selectk import select_k

    return select_k(
        partials, group_cols=["win_start"], order_col="total", k=k,
        ascending=False, payload_cols=["user_id"],
    ).select("win_start", "rank", "user_id", "total")


def running_topk_stateful(
    events: DataFrame, k: int = 5, key: str = "event_type"
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    top-k of (value, event_id) per key across the whole stream.

    State is the current top-k list only (O(k) per key, never the
    events); each trigger merges the Arrow batch into the state with a
    vectorized sort+head — the streaming analogue of select_k's
    per-partition partial top-k (matrix/select_k.cuh:75).

    Ties break by event_id ascending — a STRICT total order
    (value desc, event_id asc), which makes the running top-k equal to
    the batch top-k under the same order for ANY batching of the
    stream (the true top-k under a total order survives every
    intermediate cut), so the final state is exactly SQL-checkable.
    """

    # the key column's REAL type rides into the output schema — a
    # hardcoded string broke any non-string key (user_id is long)
    key_type = dict(events.dtypes)[key]
    out_schema = f"{key} {key_type}, rank int, value double, event_id long"
    state_schema = "values array<double>, ids array<long>"

    def update(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            vals, ids = state.get
            cur = pd.DataFrame({"value": list(vals), "event_id": list(ids)})
        else:
            cur = pd.DataFrame({"value": [], "event_id": []})
        for pdf in pdfs:
            cur = pd.concat([cur, pdf[["value", "event_id"]]], ignore_index=True)
            cur = cur.sort_values(
                ["value", "event_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
        cur = cur.reset_index(drop=True)
        state.update((cur["value"].tolist(), cur["event_id"].astype("int64").tolist()))
        yield pd.DataFrame(
            {
                key: key_tuple[0],
                "rank": range(1, len(cur) + 1),
                "value": cur["value"],
                "event_id": cur["event_id"].astype("int64"),
            }
        )

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion over the currently
    available files (availableNow trigger) into an in-memory sink table
    ``name`` — the test/bench harness runner.

    Hardened (r7, after the r6 gate artifact preserved only a logical
    plan as the failure reason): (a) any still-active query with the
    same name is stopped first — a prior run's orphan would make
    start() itself fail; (b) every sink gets its own unique
    checkpointLocation (never a shared/implied temp dir two sinks could
    race on); (c) a failure re-raises ONE RuntimeError that leads with
    the sink name and the DEEPEST causes first, so a bounded error
    field always contains the root cause, not 2000 chars of plan."""
    import uuid

    spark = stream_df.sparkSession
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    # ephemeral per-run checkpoint (memory sinks are never recovered —
    # each run gets a fresh uuid dir). The offset/commit WAL is
    # rename-heavy HDFS-style IO; on a disk-backed /tmp it costs
    # ~0.4 s per stream query (measured 1.46 -> 1.05 s warm drain), so
    # prefer a tmpfs when one exists. Production deployments that NEED
    # recovery set $SPARK_GRAFT_CKPT_DIR to durable storage — the knob
    # is parameterised, not pinned to the local layout (guide §6).
    base = os.environ.get("SPARK_GRAFT_CKPT_DIR")
    if base is None:
        base = "/dev/shm/raft_spark_ckpt" if os.path.isdir("/dev/shm") \
            else "/tmp/raft_spark_ckpt"
    ckpt = f"{base}/{name}-{uuid.uuid4().hex}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        # the WAL is dead weight once the availableNow drain finished;
        # leaving it would accumulate one dir per sink per run
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    except BaseException as e:  # noqa: BLE001 — re-raised with context
        chain: list[BaseException] = []
        cur: BaseException | None = e
        while cur is not None and cur not in chain and len(chain) < 8:
            chain.append(cur)
            cur = cur.__cause__ or cur.__context__
        # JVM exceptions put "Caused by: <root>" lines INSIDE one giant
        # message (after the plan); surface those lines explicitly too
        caused = [
            ln.strip()
            for c in chain
            for ln in str(c).splitlines()
            if ln.strip().startswith("Caused by:")
        ]
        parts = [f"streaming sink '{name}' failed (checkpoint {ckpt})"]
        parts += caused[:4]
        parts += [f"{type(c).__name__}: {str(c)[:1200]}" for c in reversed(chain)]
        raise RuntimeError(" || ".join(parts)) from e


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregation (gap-based): events of one key closer
    than ``gap`` merge into one session; emits per-session count/sum
    and the session start. Works identically on batch and streaming
    input (pass ``watermark`` for streams; state is evicted once a
    session's end falls behind it).

    This is the classic stateful operator the reference cannot express
    (no streaming, SURVEY.md §2.12); Spark's session_window keeps
    per-open-session state only.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col(key),
            "n_events",
            "total_value",
        )
    )


def streaming_neardup_candidates(
    doc_stream: DataFrame,
    static_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming near-duplicate candidate lookup: each arriving document
    is banded by the STATELESS per-row MinHash expression
    (dedup.minhash_signature_expr — no vocab, no aggregation, so the
    stream carries zero state) and equi-joined against a precomputed
    static band index (dedup.band_table over the reference corpus).
    Emits (doc_id, cand_id, band) in append mode.

    The stream-static join re-plans the static side per micro-batch;
    at scale the index is a bucketed/partitioned table on (band, bsig)
    so each batch's probe is a pruned lookup, and candidates feed the
    same exact-verify stage as the batch pipeline (est_jaccard /
    ngram_jaccard on the candidate pairs only).
    """
    from raft_spark.operators.dedup import band_table

    stream_bands = band_table(doc_stream, text_col=text_col, id_col=id_col)
    idx = static_index.select(
        F.col("doc_id").alias("cand_id"), "band", "bsig"
    )
    return (
        stream_bands.join(idx, ["band", "bsig"])
        .filter(F.col("doc_id") != F.col("cand_id"))
        .select("doc_id", "cand_id", "band")
    )


def streaming_span_flags(
    doc_stream: DataFrame,
    dup_hash_index: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming span-duplication lookup: each arriving document's
    n-token window hashes (dedup.span_hash_table — a stateless in-row
    expression, zero stream state) are stream-static joined against a
    batch-built index of known-duplicated hashes (duplicated_spans'
    ``dup`` set, refreshed offline). Emits (doc_id, start) per flagged
    window in append mode — the consumer masks/drops those spans or
    aggregates per doc, exactly as the batch twin does.

    At scale the index is a bucketed table on h so each micro-batch's
    probe is a pruned hash-join — the same contract as
    streaming_neardup_candidates."""
    from raft_spark.operators.dedup import span_hash_table

    spans = span_hash_table(doc_stream, n=n, text_col=text_col, id_col=id_col)
    return spans.join(dup_hash_index.select("h"), "h").select("doc_id", "start")


def streaming_index_ingest(
    vec_stream: DataFrame,
    centroids,
    vec_col: str = "features",
) -> DataFrame:
    """Streaming ANN-index ingest: arriving embeddings are assigned to
    their IVF list by the same stateless Arrow-batched argmin pass the
    batch quantizer uses (centroids in the task closure — zero stream
    state, append mode). Write the result partitioned by ``list_id``
    and the batch probe path reads the growing index unchanged: index
    maintenance becomes ordinary streaming file output."""
    from raft_spark.operators.similarity import _assign_lists

    return _assign_lists(vec_stream, centroids, vec_col, list_col="list_id")


def streaming_semantic_lookup(
    vec_stream: DataFrame,
    index: DataFrame,
    tau: float = 0.92,
    id_col: str = "id",
    vec_col: str = "features",
    scale: float = 1e6,
) -> DataFrame:
    """Streaming semantic near-dup lookup (the SemDeDup predicate as an
    incremental check): each arriving embedding is quantized by the
    stateless shared expression (dedup.quantized_embeddings) and
    stream-static joined on ``cluster`` against a batch-built
    dedup.semantic_index; a candidate is emitted iff the EXACT integer
    cosine predicate 10⁸·S² ≥ τq²·Na·Nb ∧ S > 0 holds — the identical
    decision the batch pair operator makes, evaluated here in
    decimal(38,0) column arithmetic. Zero stream state, append mode.

    The stream must already carry ``cluster``, produced by the SAME
    assignment used to build the index — a deterministic bucket
    expression, or similarity._assign_lists over the index's k-means
    centroids (the streaming_index_ingest pass). Per-candidate JVM
    evaluation is the right physical shape for a LOOKUP: an arriving
    row's candidate set is one cluster's list, never a corpus
    self-join (the batch tile path covers that case). Emits
    (id, cand_id). Overflow contract enforced at index build time."""
    from raft_spark.operators.dedup import quantized_embeddings

    q = quantized_embeddings(
        vec_stream, id_col=id_col, vec_col=vec_col, scale=scale,
        keep=("cluster",),
    )
    tau_q = int(round(tau * 10_000))
    s = F.aggregate(
        F.zip_with("_q", "_qc", lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    dec = "decimal(38,0)"
    sd = F.col("_s").cast(dec)
    pred = (F.col("_s") > 0) & (
        sd * sd * F.lit(100_000_000).cast(dec)
        >= F.lit(tau_q * tau_q).cast(dec)
        * F.col("_n2").cast(dec) * F.col("_nc").cast(dec)
    )
    return (
        q.join(index, "cluster")
        .filter(F.col("id") != F.col("cand_id"))
        .withColumn("_s", s)
        .filter(pred)
        .select("id", "cand_id")
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once projection of a stream with redelivery: drop exact
    duplicates by event_id within the watermark horizon.

    dropDuplicatesWithinWatermark, NOT dropDuplicates([\"event_id\"]):
    the plain variant only evicts state when the event-time column is
    part of the dedup keys, so keying on event_id alone would keep one
    state entry per distinct id FOREVER — a global distinct in
    disguise, the exact unbounded-state trap this operator exists to
    avoid. The within-watermark variant evicts ids once they age past
    the watermark, so state = ids inside the horizon only."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def windowed_approx_distinct(
    events: DataFrame,
    cols: Iterable[str] = ("user_id",),
    window: str = "1 hour",
    watermark: str = "2 hours",
    rsd: float = 0.05,
) -> DataFrame:
    """Streaming HLL++ distinct counts per event-time window →
    (win_start, <col>_distinct…). approx_count_distinct's register
    state is max-merged, so micro-batch arrival order cannot change
    the estimate — a stream and a batch run over the same rows agree
    EXACTLY (pinned in tests), and state per window is O(2^p)
    registers per column instead of one entry per distinct key (the
    whole point at 100 TB: distinct users/day without per-user
    state)."""
    aggs = [
        F.approx_count_distinct(c, rsd).alias(f"{c}_distinct") for c in cols
    ]
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"),
                *[f"{c}_distinct" for c in cols])
    )


def windowed_count_min(
    events: DataFrame,
    col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    width: int = 256,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Streaming count-min sketch per event-time window →
    (win_start, depth, bucket, cnt): the long-form CM counters of
    :func:`raft_spark.operators.sketches.count_min` maintained
    incrementally. Counter increments commute, so the streamed sketch
    is IDENTICAL to the batch sketch of the same window (pinned in
    tests), and per-window state is depth×width counters regardless of
    key cardinality — the streaming heavy-hitter / hot-key detector."""
    from raft_spark.operators.sketches import _cm_pairs

    pairs = _cm_pairs(col, width, depth, seed)
    return (
        events.withWatermark("ts", watermark)
        .select("ts", F.explode(pairs).alias("_p"))
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("_p.depth").alias("depth"),
            F.col("_p.bucket").alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "depth", "bucket", "cnt")
    )


def dedup_state_ingest_stream(
    doc_stream: DataFrame,
    state_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **ingest_kwargs,
):
    """Streaming twin of batch :func:`~raft_spark.operators.dedup.
    dedup_state_ingest`: each arriving micro-batch of documents is
    deduped against the persisted corpus state (snapshot-stable MinHash
    signatures + LSH band join + star-edge contraction) and the state
    is updated in place, via foreachBatch — the ingest-time shape of
    cross-snapshot dedup (continuous deliveries instead of monthly
    snapshots; same operator, same state layout, so batch bootstraps
    and streaming continues seamlessly).

    Replay safety is the foreachBatch recovery contract: Structured
    Streaming re-runs a batch after a crash (at-least-once), and the
    ingest anti-joins already-present doc_ids out, so redelivery leaves
    the state byte-identical (pinned in tests). Returns the started
    StreamingQuery (caller awaits/stops)."""
    from raft_spark.operators.dedup import dedup_state_ingest

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        # the stream's product IS the state update; skip the full-table
        # resolve (an O(corpus) read-side agg) the discarded return
        # would otherwise pay per micro-batch
        ingest_kwargs.setdefault("return_full", False)
        dedup_state_ingest(
            batch_df, state_path, text_col=text_col, id_col=id_col,
            **ingest_kwargs,
        )

    return (
        doc_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def semantic_state_ingest_stream(
    vec_stream: DataFrame,
    state_path: str,
    checkpoint: str,
    assign_fn,
    tau: float = 0.92,
    id_col: str = "id",
    vec_col: str = "features",
    **ingest_kwargs,
):
    """Streaming twin of :func:`~raft_spark.operators.dedup.
    semantic_state_ingest`: each micro-batch of embeddings is deduped
    against the persisted semantic state and the state updated, via
    foreachBatch. ``assign_fn(batch_df) -> (id, cluster)`` is the
    cluster-assignment seam and must be a pure per-row function (an
    axis-sign bucket expression, or an IVF quantizer frozen with the
    index) — that purity is what makes continuous ingest equal the
    from-scratch batch dedup. Replay-safe under at-least-once
    foreachBatch recovery (already-present ids are anti-joined out).
    Returns the started StreamingQuery."""
    from raft_spark.operators.dedup import semantic_state_ingest

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_kwargs.setdefault("return_full", False)  # see dedup twin
        semantic_state_ingest(
            batch_df, assign_fn(batch_df), state_path, tau=tau,
            id_col=id_col, vec_col=vec_col, **ingest_kwargs,
        )

    return (
        vec_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def postings_add_stream(
    coo_stream: DataFrame,
    index_path: str,
    checkpoint: str,
):
    """Streaming twin of :func:`~raft_spark.operators.sparse.
    postings_add`: each arriving micro-batch of long-form sparse rows
    (row, col, value) is appended into the persisted postings index via
    foreachBatch — the sparse-corpus rendering of the persisted-state
    ingest family (dedup_state_ingest_stream / ivf-pq extend).
    Replay-safe under at-least-once recovery: postings_add anti-joins
    already-indexed row ids against the norms sidecar, so a re-run
    micro-batch appends nothing. Returns the started StreamingQuery."""
    from raft_spark.operators.sparse import postings_add

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        postings_add(batch_df.select("row", "col", "value"), index_path)

    return (
        coo_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def span_state_ingest_stream(
    doc_stream: DataFrame,
    state_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **ingest_kwargs,
):
    """Streaming twin of :func:`~raft_spark.operators.dedup.
    span_state_ingest`: each arriving micro-batch of documents folds
    its token-window hashes into the persisted span state via
    foreachBatch (the substring-dedup rendering of the ingest family).
    Replay-safe under at-least-once recovery (doc ids already in the
    state are anti-joined out). Returns the started StreamingQuery."""
    from raft_spark.operators.dedup import span_state_ingest

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        ingest_kwargs.setdefault("return_full", False)
        span_state_ingest(
            batch_df, state_path, text_col=text_col, id_col=id_col,
            **ingest_kwargs,
        )

    return (
        doc_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
