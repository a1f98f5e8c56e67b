"""Temporal-join gate queries: as-of join (backward / forward /
tolerance) and the banded range join over the events table.

The oracle is DuckDB's NATIVE ``ASOF JOIN`` — an independent engine
implementation of the same semantics, not a mirrored clause — plus a
plain inequality join for the band member. Every output column is
int64 (ids, epoch-microsecond gaps), so the value hash is engine-exact
with no quantization step. The right side of each member is tie-free
on (user_id, ts) in this corpus, and the operator additionally pins
tie order via its tiebreak column, so the match set is a pure function
of the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.operators.temporal import (
    asof_join,
    asof_join_auto,
    asof_join_broadcast,
    asof_join_skew,
    range_join,
    rolling_aggregates,
    rolling_aggregates_prefix,
    rolling_aggregates_skew,
)
from raft_spark.queries.registry import query
from raft_spark.sources.tables import load

_HOUR = 3_600_000_000  # microseconds


@query(
    "temporal_join_suite",
    oracle="""
WITH l AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
)
SELECT 'asof' AS op, l.event_id::BIGINT AS a,
       coalesce(r.event_id, -1)::BIGINT AS b,
       coalesce(epoch_us(l.ts) - epoch_us(r.ts), -1)::BIGINT AS v
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
UNION ALL
SELECT 'asof_fwd', l.event_id::BIGINT,
       coalesce(r.event_id, -1)::BIGINT,
       coalesce(epoch_us(r.ts) - epoch_us(l.ts), -1)::BIGINT
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
UNION ALL
SELECT 'asof_tol', l.event_id::BIGINT,
       (CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000
             THEN r.event_id ELSE -1 END)::BIGINT,
       (CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000
             THEN epoch_us(l.ts) - epoch_us(r.ts) ELSE -1 END)::BIGINT
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
UNION ALL
SELECT 'range', l.event_id::BIGINT, r.event_id::BIGINT,
       (epoch_us(l.ts) - epoch_us(r.ts))::BIGINT
FROM l JOIN r ON l.user_id = r.user_id
 AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 3600000000
UNION ALL
SELECT 'asof_skew', l.event_id::BIGINT,
       coalesce(r.event_id, -1)::BIGINT,
       coalesce(epoch_us(l.ts) - epoch_us(r.ts), -1)::BIGINT
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
UNION ALL
SELECT 'asof_bcast', l.event_id::BIGINT,
       coalesce(r.event_id, -1)::BIGINT,
       coalesce(epoch_us(l.ts) - epoch_us(r.ts), -1)::BIGINT
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
UNION ALL
SELECT 'asof_auto', l.event_id::BIGINT,
       coalesce(r.event_id, -1)::BIGINT,
       coalesce(epoch_us(r.ts) - epoch_us(l.ts), -1)::BIGINT
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
UNION ALL
SELECT 'rolling', event_id::BIGINT, roll_n::BIGINT, roll_sum_q::BIGINT
FROM (
    SELECT event_id,
           count(*) OVER w AS roll_n,
           coalesce(sum(qv) OVER w, 0) AS roll_sum_q
    FROM (
        SELECT event_id, user_id, epoch_us(ts) AS tsu,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
        FROM events WHERE event_type = 'click'
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                 RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
)
UNION ALL
SELECT 'rolling_prefix', event_id::BIGINT, roll_n::BIGINT, roll_sum_q::BIGINT
FROM (
    SELECT event_id,
           count(*) OVER w AS roll_n,
           coalesce(sum(qv) OVER w, 0) AS roll_sum_q
    FROM (
        SELECT event_id, user_id, epoch_us(ts) AS tsu,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
        FROM events WHERE event_type = 'click'
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                 RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
)
UNION ALL
SELECT 'rolling_skew', event_id::BIGINT, roll_n::BIGINT, roll_sum_q::BIGINT
FROM (
    SELECT event_id,
           count(*) OVER w AS roll_n,
           coalesce(sum(qv) OVER w, 0) AS roll_sum_q
    FROM (
        SELECT event_id, user_id, epoch_us(ts) AS tsu,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
        FROM events WHERE event_type = 'click'
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                 RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
)
""",
)
def q_temporal_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of + range joins (operators/temporal.py) of clicks against
    views per user: backward, forward, 1-hour tolerance, and the ±1 h
    band — each checked against DuckDB's native ASOF JOIN / inequality
    join. Unmatched members encode (-1, -1) so the left-join row count
    is itself gate-checked."""
    ev = load(spark, "events", sf_dir)
    l = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    r = ev.filter("event_type = 'view'").select("event_id", "user_id", "ts")

    def _shape(df: DataFrame, op: str, gap_col: str = "gap_us") -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            F.col("event_id").cast("long").alias("a"),
            F.coalesce(F.col("event_id_r"), F.lit(-1)).cast("long").alias("b"),
            F.coalesce(F.col(gap_col), F.lit(-1)).cast("long").alias("v"),
        )

    back = _shape(
        asof_join(l, r, right_cols=("event_id",), tiebreak_col="event_id"),
        "asof",
    )
    fwd = _shape(
        asof_join(l, r, right_cols=("event_id",), direction="forward",
                  tiebreak_col="event_id"),
        "asof_fwd",
    )
    tol = _shape(
        asof_join(l, r, right_cols=("event_id",), tolerance_us=_HOUR,
                  tiebreak_col="event_id"),
        "asof_tol",
    )
    # r7: the skew strategies are gate members of their own — same
    # DuckDB clauses as their plain twins, different physical plan
    # (small n_parts forces multiple time cells at gate scale)
    skew = _shape(
        asof_join_skew(l, r, right_cols=("event_id",),
                       tiebreak_col="event_id", n_parts=8),
        "asof_skew",
    )
    # r8: the broadcast strategy and the auto router get BATCH gate rows
    # of their own (same DuckDB native ASOF clauses as their plain
    # twins). Until now broadcast's only driver row was the streaming
    # one — the ANSI element_at bug hid there for two rounds; every
    # physical strategy now has a batch row the driver greens/reds
    # independently (reference shape: every select_k algorithm variant
    # is tested, cpp/tests/matrix/select_k.cu, not just kAuto's pick).
    # The corpus contains unmatched-within-key left rows (encoded -1),
    # so the empty-candidate path is exercised under the driver's ANSI
    # session. asof_auto runs FORWARD so the router + the forward
    # try_element_at arm are both covered; at gate scale the right side
    # is dimension-sized, so the router picks broadcast.
    bcast = _shape(
        asof_join_broadcast(l, r, right_cols=("event_id",),
                            tiebreak_col="event_id"),
        "asof_bcast",
    )
    auto = _shape(
        asof_join_auto(l, r, right_cols=("event_id",), direction="forward",
                       tiebreak_col="event_id"),
        "asof_auto",
    )
    band = range_join(l, r, width_us=_HOUR, right_cols=("event_id",)).select(
        F.lit("range").alias("op"),
        F.col("event_id").cast("long").alias("a"),
        F.col("event_id_r").cast("long").alias("b"),
        F.col("delta_us").alias("v"),
    )
    roll = rolling_aggregates(
        ev.filter("event_type = 'click'")
        .select("event_id", "user_id", "ts", "value"),
        window_us=_HOUR,
    ).select(
        F.lit("rolling").alias("op"),
        F.col("event_id").cast("long").alias("a"),
        F.col("roll_n").alias("b"),
        F.col("roll_sum_q").alias("v"),
    )
    # r8: the linear prefix-sum strategy (dense frames — Spark's
    # sliding RANGE frame is O(rows · frame); 10M/1-key probe 240 s →
    # 14 s after the rewrite) gates under the same DuckDB clause
    rollpx = rolling_aggregates_prefix(
        ev.filter("event_type = 'click'")
        .select("event_id", "user_id", "ts", "value"),
        window_us=_HOUR,
    ).select(
        F.lit("rolling_prefix").alias("op"),
        F.col("event_id").cast("long").alias("a"),
        F.col("roll_n").alias("b"),
        F.col("roll_sum_q").alias("v"),
    )
    rollsk = rolling_aggregates_skew(
        ev.filter("event_type = 'click'")
        .select("event_id", "user_id", "ts", "value"),
        window_us=_HOUR, n_parts=8,
    ).select(
        F.lit("rolling_skew").alias("op"),
        F.col("event_id").cast("long").alias("a"),
        F.col("roll_n").alias("b"),
        F.col("roll_sum_q").alias("v"),
    )
    return (
        back.unionByName(fwd).unionByName(tol).unionByName(skew)
        .unionByName(bcast).unionByName(auto)
        .unionByName(band).unionByName(roll).unionByName(rollpx)
        .unionByName(rollsk)
    )
