"""Temporal gate queries, split into two rows (r9 — one red member
must not mark two operator families unverified at once):

- ``asof_suite``: as-of join (backward / forward / tolerance) in all
  three physical strategies (plain window / skew cells / broadcast)
  plus the auto router and the banded range join.
- ``rolling_suite``: trailing-window features in all three physical
  strategies (sliding window / dual-growing-frame prefix / skew
  cells) plus the auto router, whose routing decision on the gate
  corpus is pytest-asserted — the kAuto-next-to-every-fixed-algorithm
  discipline of cpp/tests/matrix/select_k.cu.

The as-of oracle is DuckDB's NATIVE ``ASOF JOIN`` — an independent
engine implementation of the same semantics, not a mirrored clause —
plus a plain inequality join for the band member; the rolling oracle
is DuckDB's RANGE frame. Every output column is int64 (ids,
epoch-microsecond gaps, quantized sums), so the value hash is
engine-exact with no quantization step. The right side of each as-of
member is tie-free on (user_id, ts) in this corpus, and the operator
additionally pins tie order via its tiebreak column, so the match set
is a pure function of the data."""

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
    rolling_aggregates_auto,
    rolling_aggregates_prefix,
    rolling_aggregates_skew,
)
from raft_spark.queries.registry import query
from raft_spark.sources.tables import load

_HOUR = 3_600_000_000  # microseconds
_MONTH = 30 * 86_400_000_000  # 30 days — spans the whole gate corpus


def _rolling_oracle_member(name: str, window_us: int) -> str:
    return f"""
SELECT '{name}' AS op, event_id::BIGINT AS a, roll_n::BIGINT AS b,
       roll_sum_q::BIGINT AS v
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
                 RANGE BETWEEN {window_us} PRECEDING AND 1 PRECEDING)
)
"""


@query(
    "asof_suite",
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
""",
)
def q_asof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of + range joins (operators/temporal.py) of clicks against
    views per user: backward, forward, 1-hour tolerance, the ±1 h
    band, and the three physical strategies (skew cells, broadcast,
    auto router) — each checked against DuckDB's native ASOF JOIN /
    inequality join. Unmatched members encode (-1, -1) so the
    left-join row count is itself gate-checked. The corpus contains
    unmatched-within-key left rows, so the empty-candidate
    try_element_at path is exercised under the driver's ANSI session
    (the r6/r7 lesson). asof_auto runs FORWARD so the router + the
    forward arm are both covered; at gate scale the right side is
    dimension-sized, so the router picks broadcast."""
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
    skew = _shape(
        asof_join_skew(l, r, right_cols=("event_id",),
                       tiebreak_col="event_id", n_parts=8),
        "asof_skew",
    )
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
    return (
        back.unionByName(fwd).unionByName(tol).unionByName(skew)
        .unionByName(bcast).unionByName(auto).unionByName(band)
    )


@query(
    "rolling_suite",
    oracle=(
        _rolling_oracle_member("rolling", _HOUR)
        + "UNION ALL"
        + _rolling_oracle_member("rolling_prefix", _HOUR)
        + "UNION ALL"
        + _rolling_oracle_member("rolling_skew", _HOUR)
        + "UNION ALL"
        + _rolling_oracle_member("rolling_auto", _MONTH)
    ),
)
def q_rolling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe trailing-window features over clicks per user in
    all three physical strategies — sliding RANGE window (the fixed
    legacy algorithm: Spark re-aggregates its frame per row,
    O(rows·frame) — 240 s at 10M/1-key/1-hour), the one-WindowExec
    dual-growing-frame prefix form (O(rows) at any density, 7 s on the
    same probe, 33 s at 100M), skew time-cells — plus the auto router,
    all under the same DuckDB RANGE-frame clause.

    The rolling_auto member runs a 30-day (corpus-spanning) window so
    its oracle clause is distinct from the 1-hour members; the router
    probes the corpus (max key share ~1% < 10%) and picks the PREFIX
    route at both sf0.01 and sf0.1 (pytest asserts the route, and that
    a shaped hot-key input flips it to skew; the gate checks the
    routed plan's values against the independent oracle)."""
    ev = load(spark, "events", sf_dir)
    clicks = ev.filter("event_type = 'click'").select(
        "event_id", "user_id", "ts", "value"
    )

    def _shape(df: DataFrame, op: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            F.col("event_id").cast("long").alias("a"),
            F.col("roll_n").alias("b"),
            F.col("roll_sum_q").alias("v"),
        )

    roll = _shape(rolling_aggregates(clicks, window_us=_HOUR), "rolling")
    rollpx = _shape(
        rolling_aggregates_prefix(clicks, window_us=_HOUR), "rolling_prefix"
    )
    rollsk = _shape(
        rolling_aggregates_skew(clicks, window_us=_HOUR, n_parts=8),
        "rolling_skew",
    )
    rollauto = _shape(
        rolling_aggregates_auto(clicks, window_us=_MONTH), "rolling_auto"
    )
    return roll.unionByName(rollpx).unionByName(rollsk).unionByName(rollauto)
