"""Structured-Streaming operator queries (engine extension; the
reference has no streaming, SURVEY.md §2.12 — these are the
aggregation-shaped operators recomputed incrementally over `events`).

Each query drains the events file-source with an availableNow trigger
into a memory sink, then returns the sink as a batch DataFrame; the
DuckDB oracle computes the same windowed aggregate over the parquet
directly, so the streaming path is held to the exact batch answer
(complete output mode ⇒ every window, closed or open, is emitted).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.queries.registry import query
from raft_spark.streaming import incremental as S

# DuckDB reads the parquet TIMESTAMP(NANOS) column natively (Spark
# must read it as long + convert, see session.py nanosAsLong); hour
# truncation is identical at either precision.
SQL_EVT = """
evt AS (
    SELECT ts::TIMESTAMP AS ts, user_id, event_type, value, event_id
    FROM events
)
"""


def _stage_events_dir(sf_dir: str) -> str:
    """File-source streams need a directory: stage a symlink to the
    events parquet under /tmp (read-only testdata stays untouched)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    d = f"/tmp/raft_spark_stream/{name}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def _drain(spark: SparkSession, stream: DataFrame, name: str) -> DataFrame:
    S.run_to_memory_sink(stream, name, output_mode="complete")
    return spark.sql(f"select * from {name}")


@query(
    "stream_windowed_moments",
    oracle=f"""
WITH {SQL_EVT},
q AS (SELECT ts, event_type, value,
             round(value * 1000000)::BIGINT AS vi FROM evt),
b AS (
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*)::BIGINT AS n,
           sum(vi)::BIGINT AS si,
           sum(vi * vi)::BIGINT AS ssqi,
           round(min(value), 6) AS min_v,
           round(max(value), 6) AS max_v
    FROM q GROUP BY 1, 2
)
SELECT win_start, event_type, n,
       floor(((si / 1e6) / n) * 1e5 + 0.5) / 1e5 AS mean,
       CASE WHEN n > 1
            THEN floor(sqrt(greatest(
                     ((ssqi / 1e12) - (si / 1e6) * (si / 1e6) / n) / (n - 1),
                     0.0)) * 1e5 + 0.5) / 1e5 END AS stddev,
       min_v, max_v
FROM b
""",
)
def q_stream_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental per-hour moments over the event stream
    (stats/mean.cuh / stddev.cuh / minmax.cuh semantics, streaming)."""
    stream = S.windowed_moments(S.read_events_stream(spark, _stage_events_dir(sf_dir)))
    out = _drain(spark, stream, "sink_stream_moments")
    # mean/stddev come from exact integer-scaled sums (see incremental.
    # windowed_moments) so both engines feed IDENTICAL doubles into
    # identical formulas; the output rounding is the explicit
    # floor(x·1e5+0.5)/1e5 on BOTH engines — F.round/duckdb round()
    # have different implementations (exact-decimal vs float) and can
    # disagree by 1 ulp on the same input.
    def r5(c):
        return F.floor(F.col(c) * 1e5 + 0.5) / 1e5

    return out.select(
        "win_start",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        r5("mean").alias("mean"),
        F.when(F.col("stddev").isNotNull(), r5("stddev")).alias("stddev"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
    )


@query(
    "stream_windowed_histogram",
    oracle=f"""
WITH {SQL_EVT}
SELECT date_trunc('hour', ts) AS win_start,
       least(greatest(floor(value / 25.0), 0), 7)::BIGINT AS bin,
       count(*)::BIGINT AS cnt
FROM evt GROUP BY 1, 2
""",
)
def q_stream_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental per-hour fixed-width histogram of event values
    (stats/histogram.cuh semantics, streaming)."""
    stream = S.windowed_histogram(S.read_events_stream(spark, _stage_events_dir(sf_dir)))
    out = _drain(spark, stream, "sink_stream_histogram")
    return out.select(
        "win_start",
        F.col("bin").cast("bigint").alias("bin"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


@query(
    "stream_topk_users",
    oracle=f"""
WITH {SQL_EVT},
sums AS (
    SELECT date_trunc('hour', ts) AS win_start, user_id,
           sum(value) AS total
    FROM evt GROUP BY 1, 2
),
ranked AS (
    SELECT win_start, user_id, total,
           row_number() OVER (
               PARTITION BY win_start ORDER BY total DESC, user_id ASC
           ) AS rank
    FROM sums
)
SELECT win_start, rank::BIGINT AS rank, user_id,
       round(total, 6) AS total
FROM ranked WHERE rank <= 3
""",
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase streaming grouped top-k (matrix/select_k.cuh shape):
    stream maintains per-(hour, user) sums; batch finalizer takes exact
    top-3 per closed window via single-groupBy partial top-k."""
    stream = S.windowed_topk_events(S.read_events_stream(spark, _stage_events_dir(sf_dir)))
    partials = _drain(spark, stream, "sink_stream_topk")
    out = S.finalize_topk(partials, k=3)
    return out.select(
        "win_start",
        F.col("rank").cast("bigint").alias("rank"),
        "user_id",
        F.round("total", 6).alias("total"),
    )


@query(
    "stream_running_topk",
    # The stateful operator keeps a strict total order (value desc,
    # event_id asc), so its final state over a fully drained stream IS
    # the batch top-k — directly SQL-checkable.
    oracle=f"""
WITH {SQL_EVT},
ranked AS (
    SELECT event_type, value, event_id,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY value DESC, event_id
           ) AS rank
    FROM evt
)
SELECT event_type, rank::BIGINT AS rank, round(value, 6) AS value, event_id
FROM ranked WHERE rank <= 4
""",
)
def q_stream_running_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running top-4 events per type — custom
    bounded-state streaming operator (O(k) state per key). The staged
    source is a single file → one availableNow trigger, so the update-
    mode memory sink holds exactly the final state."""
    stream = S.running_topk_stateful(
        S.read_events_stream(spark, _stage_events_dir(sf_dir)), k=4
    )
    S.run_to_memory_sink(stream, "sink_stream_running_topk", output_mode="update")
    out = spark.sql("select * from sink_stream_running_topk")
    return out.select(
        "event_type",
        F.col("rank").cast("bigint").alias("rank"),
        F.round("value", 6).alias("value"),
        "event_id",
    )


@query(
    "sessionize_events",
    oracle=f"""
WITH {SQL_EVT},
marked AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM evt
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
islands AS (
    SELECT user_id, ts, value,
           sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
    FROM marked
)
SELECT min(ts) AS session_start, user_id,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS total_value
FROM islands GROUP BY user_id, sess
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) via session_window — the
    operator runs unchanged on batch or stream input; oracle is the
    classic gaps-and-islands SQL."""
    ev = S.read_events_batch(spark, f"{sf_dir}/events.parquet")
    out = S.sessionize(ev, gap="30 minutes")
    return out.select(
        "session_start",
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("total_value", 6).alias("total_value"),
    )


@query(
    "stream_dedup",
    oracle="""
SELECT event_type, count(*)::BIGINT AS n
FROM events GROUP BY 1
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming exact-dedup: the source is read TWICE
    (simulating at-least-once redelivery), dropDuplicates(event_id)
    restores exactly-once; counts per type must equal the batch truth."""
    d = _stage_events_dir(sf_dir)
    doubled = S.read_events_stream(spark, d).unionAll(S.read_events_stream(spark, d))
    deduped = S.streaming_dedup(doubled)
    S.run_to_memory_sink(deduped, "sink_stream_dedup", output_mode="append")
    out = spark.sql("select * from sink_stream_dedup")
    return out.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
