"""Temporal-join operator invariants (operators/temporal.py).

Cross-engine equality of the gate suite rides on check_oracle /
test_gate_immunity (DuckDB's native ASOF JOIN is the oracle); here we
pin the semantics the oracle data cannot exercise: tie-breaking on
duplicate right timestamps, inclusive boundaries, unmatched nulls, and
the band join against a brute-force cross product.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from raft_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s), float(v))
         for (i, u, s, v) in rows],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )


def test_asof_ties_inclusive_and_unmatched(spark):
    left = _ev(spark, [(100, 1, 10, 0), (101, 1, 5, 0), (102, 2, 10, 0)])
    # user 1: two right rows at the SAME ts=10 (ids 7, 8) and one at 3;
    # user 2 has no right rows at all
    right = _ev(spark, [(7, 1, 10, 0), (8, 1, 10, 0), (5, 1, 3, 0)])

    back = {
        r["event_id"]: (r["event_id_r"], r["gap_us"])
        for r in asof_join(
            left, right, right_cols=("event_id",), tiebreak_col="event_id"
        ).collect()
    }
    # inclusive: left ts=10 matches right ts=10; tie -> LARGEST id (8)
    assert back[100] == (8, 0)
    assert back[101] == (5, 2_000_000)
    assert back[102] == (None, None)

    fwd = {
        r["event_id"]: (r["event_id_r"], r["gap_us"])
        for r in asof_join(
            left, right, right_cols=("event_id",), direction="forward",
            tiebreak_col="event_id",
        ).collect()
    }
    # forward tie -> SMALLEST id (7); left ts=5 looks ahead to ts=10
    assert fwd[100] == (7, 0)
    assert fwd[101] == (7, 5_000_000)
    assert fwd[102] == (None, None)


def test_asof_tolerance_boundary(spark):
    left = _ev(spark, [(1, 1, 100, 0), (2, 1, 200, 0)])
    right = _ev(spark, [(9, 1, 90, 0)])
    out = {
        r["event_id"]: (r["event_id_r"], r["gap_us"])
        for r in asof_join(
            left, right, right_cols=("event_id",),
            tolerance_us=10_000_000,
        ).collect()
    }
    # gap exactly == tolerance stays matched (inclusive); beyond -> null
    assert out[1] == (9, 10_000_000)
    assert out[2] == (None, None)


def test_range_join_equals_bruteforce(spark):
    import itertools

    rows_l = [(i, i % 3, 7 * i, 0) for i in range(40)]
    rows_r = [(100 + i, i % 3, 11 * i + 2, 0) for i in range(40)]
    left, right = _ev(spark, rows_l), _ev(spark, rows_r)
    w = 30_000_000  # 30 s band
    got = {
        (r["event_id"], r["event_id_r"], r["delta_us"])
        for r in range_join(left, right, width_us=w).collect()
    }
    want = {
        (i, j, (sl - sr) * 1_000_000)
        for (i, ul, sl, _), (j, ur, sr, _) in itertools.product(rows_l, rows_r)
        if ul == ur and abs(sl - sr) * 1_000_000 <= w
    }
    assert got == want and len(got) > 0
    # boundary pairs (|delta| == w exactly) must be present
    assert any(abs(d) == w for (_, _, d) in got)


def test_range_join_partition_invariant(spark):
    rows_l = [(i, i % 5, 13 * i, 0) for i in range(60)]
    rows_r = [(200 + i, i % 5, 17 * i + 1, 0) for i in range(60)]
    left, right = _ev(spark, rows_l), _ev(spark, rows_r)
    a = {
        (r["event_id"], r["event_id_r"])
        for r in range_join(left, right, width_us=60_000_000).collect()
    }
    b = {
        (r["event_id"], r["event_id_r"])
        for r in range_join(
            left.repartition(7), right.repartition(3), width_us=60_000_000
        ).collect()
    }
    assert a == b and len(a) > 0


def test_asof_broadcast_equals_window(spark, sf_dir):
    """The broadcast (dimension-right) physical strategy must emit the
    identical match set as the window variant on real data — both
    directions and the tolerance path."""
    from raft_spark.operators.temporal import asof_join_broadcast

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    l = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    r = ev.filter("event_type = 'view'").select("event_id", "user_id", "ts")
    for kw in (
        {},
        {"direction": "forward"},
        {"tolerance_us": 3_600_000_000},
    ):
        a = sorted(
            (x["event_id"], x["event_id_r"], x["gap_us"])
            for x in asof_join(
                l, r, right_cols=("event_id",), tiebreak_col="event_id", **kw
            ).collect()
        )
        b = sorted(
            (x["event_id"], x["event_id_r"], x["gap_us"])
            for x in asof_join_broadcast(
                l, r, right_cols=("event_id",), tiebreak_col="event_id", **kw
            ).collect()
        )
        assert a == b and len(a) > 0, kw


def test_asof_broadcast_ties(spark):
    from raft_spark.operators.temporal import asof_join_broadcast

    left = _ev(spark, [(100, 1, 10, 0)])
    right = _ev(spark, [(7, 1, 10, 0), (8, 1, 10, 0)])
    back = asof_join_broadcast(
        left, right, right_cols=("event_id",), tiebreak_col="event_id"
    ).collect()[0]
    assert (back["event_id_r"], back["gap_us"]) == (8, 0)
    fwd = asof_join_broadcast(
        left, right, right_cols=("event_id",), direction="forward",
        tiebreak_col="event_id",
    ).collect()[0]
    assert (fwd["event_id_r"], fwd["gap_us"]) == (7, 0)


def test_asof_broadcast_streams(spark, sf_dir, tmp_path_factory):
    """asof_join_broadcast is a stateless broadcast join + JVM array
    pick, so it runs UNCHANGED on a streaming fact side — the streamed
    enrichment must equal the batch twin row-for-row (the stream-static
    dimension-lookup pattern: events arriving against a slowly-changing
    attributes table)."""
    import shutil as _sh

    from raft_spark.operators.temporal import asof_join_broadcast
    from raft_spark.streaming.incremental import run_to_memory_sink

    d = tmp_path_factory.mktemp("asof_stream")
    _sh.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    ev = spark.read.parquet(str(d))
    r = ev.filter("event_type = 'view'") \
        .select("event_id", "user_id", "ts").localCheckpoint(eager=True)

    sch = ev.schema
    stream = (
        spark.readStream.schema(sch).parquet(str(d))
        .filter("event_type = 'click'")
        .select("event_id", "user_id", "ts")
    )
    out = asof_join_broadcast(
        stream, r, right_cols=("event_id",), tiebreak_col="event_id"
    )
    run_to_memory_sink(out, "asof_stream_sink", output_mode="append")
    got = {
        (x["event_id"], x["event_id_r"], x["gap_us"])
        for x in spark.sql("select * from asof_stream_sink").collect()
    }

    l = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    want = {
        (x["event_id"], x["event_id_r"], x["gap_us"])
        for x in asof_join_broadcast(
            l, r, right_cols=("event_id",), tiebreak_col="event_id"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_rolling_aggregates_boundaries(spark):
    """Trailing-window features: strictly-before exclusivity (a row
    never sees itself or same-timestamp peers), inclusive lower edge
    at exactly ts - window, exact quantized sums."""
    from raft_spark.operators.temporal import rolling_aggregates

    rows = [
        (1, 1, 0, 1.5),    # t=0
        (2, 1, 60, 2.25),  # t=60s
        (3, 1, 60, 4.0),   # same ts as 2 — peers exclude each other
        (4, 1, 120, 8.0),  # window [60s+1us, 120s): sees 2,3 not 1? no —
                           # window is [120-60, 120) = [60, 120) → 2,3
        (5, 2, 30, 1.0),   # other key
    ]
    df = _ev(spark, rows)
    out = {
        r["event_id"]: (r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates(
            df, window_us=60_000_000
        ).collect()
    }
    assert out[1] == (0, 0)
    # t=60: window [0, 60) → event 1 only; peers at t=60 excluded
    assert out[2] == (1, 1_500_000)
    assert out[3] == (1, 1_500_000)
    # t=120: window [60, 120) → events 2 and 3 (inclusive lower edge)
    assert out[4] == (2, 6_250_000)
    assert out[5] == (0, 0)


def test_asof_randomized_bruteforce(spark):
    """Randomized adversarial check: small key space and coarse
    timestamps force heavy (key, ts) collisions; both physical
    strategies must equal a Python brute force under the documented
    tie rule (backward: max (ts, tiebreak) among ts <= t; forward:
    min among ts >= t)."""
    import random

    from raft_spark.operators.temporal import asof_join, asof_join_broadcast

    rng = random.Random(1234)
    rows_l = [(i, rng.randrange(4), rng.randrange(12), 0.0)
              for i in range(120)]
    rows_r = [(1000 + i, rng.randrange(4), rng.randrange(12), 0.0)
              for i in range(120)]
    left, right = _ev(spark, rows_l), _ev(spark, rows_r)

    def brute(direction):
        out = {}
        for (i, u, s, _) in rows_l:
            if direction == "backward":
                cand = [(rs, rid) for (rid, ru, rs, _) in rows_r
                        if ru == u and rs <= s]
                pick = max(cand) if cand else None
                gap = (s - pick[0]) * 1_000_000 if pick else None
            else:
                cand = [(rs, rid) for (rid, ru, rs, _) in rows_r
                        if ru == u and rs >= s]
                pick = min(cand) if cand else None
                gap = (pick[0] - s) * 1_000_000 if pick else None
            out[i] = (pick[1] if pick else None, gap)
        return out

    for direction in ("backward", "forward"):
        want = brute(direction)
        for fn in (asof_join, asof_join_broadcast):
            got = {
                r["event_id"]: (r["event_id_r"], r["gap_us"])
                for r in fn(
                    left, right, right_cols=("event_id",),
                    direction=direction, tiebreak_col="event_id",
                ).collect()
            }
            assert got == want, (direction, fn.__name__)


def test_asof_null_payload_field_is_atomic(spark):
    # the matched (newest) right row carries a NULL payload FIELD: the
    # output must attach that row's NULL (merge_asof semantics), never
    # backfill the field from an OLDER right row while gap/other
    # columns come from the newer one
    left = _ev(spark, [(100, 1, 20, 0.0)])
    right = spark.createDataFrame(
        [
            (7, 1, T0 + dt.timedelta(seconds=5), 55.0),   # older, value set
            (8, 1, T0 + dt.timedelta(seconds=10), None),  # match, value NULL
        ],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    got = asof_join(
        left, right, right_cols=("event_id", "value"), tiebreak_col="event_id"
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["event_id_r"] == 8
    assert r["value_r"] is None          # NOT 55.0 from row 7
    assert r["gap_us"] == 10_000_000


def test_range_join_far_epoch_exact_bucketing(spark):
    # epoch-µs ~1.4e16 (year ~2413) with a 7 µs band: floor(ts/width)
    # in double arithmetic misbuckets cell-edge rows (0.5 ulp = 0.25 >
    # 1/7) — the integer floor-division must still find every pair
    base = 14_000_000_000_000_000
    w = 7
    lrows = [(i, 1, base + i) for i in range(60)]
    rrows = [(1000 + i, 1, base + 3 * i - 15) for i in range(40)]

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, us long"
        ).select(
            "event_id", "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
        )

    got = {
        (r["event_id"], r["event_id_r"])
        for r in range_join(mk(lrows), mk(rrows), width_us=w).collect()
    }
    want = {
        (li, ri)
        for (li, _, lu) in lrows
        for (ri, _, ru) in rrows
        if abs(lu - ru) <= w
    }
    assert want, "degenerate test: no true pairs"
    assert got == want


def test_asof_skew_equals_window_randomized(spark):
    # the two-phase skew strategy must equal the plain window (and the
    # brute-force rule) under heavy (key, ts) collisions AND with few
    # range partitions so keys straddle partition boundaries
    import random

    from raft_spark.operators.temporal import asof_join, asof_join_skew

    rng = random.Random(99)
    rows_l = [(i, rng.randrange(3), rng.randrange(10), 0.0)
              for i in range(150)]
    rows_r = [(1000 + i, rng.randrange(3), rng.randrange(10), 0.0)
              for i in range(150)]
    left, right = _ev(spark, rows_l), _ev(spark, rows_r)

    for direction in ("backward", "forward"):
        for tol in (None, 3_000_000):
            kw = dict(right_cols=("event_id",), direction=direction,
                      tolerance_us=tol, tiebreak_col="event_id")
            want = sorted(
                (r["event_id"], r["event_id_r"], r["gap_us"])
                for r in asof_join(left, right, **kw).collect()
            )
            got = sorted(
                (r["event_id"], r["event_id_r"], r["gap_us"])
                for r in asof_join_skew(left, right, n_parts=7, **kw).collect()
            )
            assert got == want, (direction, tol)


def test_asof_skew_single_hot_key(spark):
    # ONE key for every row: the plain window serializes this into one
    # task; the skew strategy spreads it over n_parts and must still
    # produce the identical match for every left row
    from raft_spark.operators.temporal import asof_join, asof_join_skew

    rows_l = [(i, 1, 2 * i, 0.0) for i in range(300)]
    rows_r = [(1000 + i, 1, 3 * i, 0.0) for i in range(200)]
    left, right = _ev(spark, rows_l), _ev(spark, rows_r)
    kw = dict(right_cols=("event_id",), tiebreak_col="event_id")
    want = {r["event_id"]: (r["event_id_r"], r["gap_us"])
            for r in asof_join(left, right, **kw).collect()}
    got = {r["event_id"]: (r["event_id_r"], r["gap_us"])
           for r in asof_join_skew(left, right, n_parts=8, **kw).collect()}
    assert got == want
    assert sum(1 for v in want.values() if v[0] is not None) > 250


def test_asof_auto_routes_all_strategies(spark):
    # force each router branch via thresholds; all three must agree
    from raft_spark.operators.temporal import asof_join, asof_join_auto

    rows_l = [(i, i % 2, 5 * (i % 9), 0.0) for i in range(200)]
    rows_r = [(1000 + i, i % 2, 7 * (i % 8), 0.0) for i in range(80)]
    left, right = _ev(spark, rows_l), _ev(spark, rows_r)
    kw = dict(right_cols=("event_id",), tiebreak_col="event_id")
    want = sorted(
        (r["event_id"], r["event_id_r"], r["gap_us"])
        for r in asof_join(left, right, **kw).collect()
    )
    for forced in (
        dict(broadcast_rows=10_000),              # -> broadcast
        dict(broadcast_rows=0, skew_share=0.05),  # -> skew (top key 50%)
        dict(broadcast_rows=0, skew_share=0.99),  # -> plain window
    ):
        got = sorted(
            (r["event_id"], r["event_id_r"], r["gap_us"])
            for r in asof_join_auto(left, right, **kw, **forced).collect()
        )
        assert got == want, forced


def test_rolling_skew_equals_plain(spark):
    # the cell-replicated skew strategy must equal the plain RANGE
    # window under heavy ts collisions, across every cell width the
    # n_parts knob induces (cells smaller/larger than the data span)
    import random

    from raft_spark.operators.temporal import (
        rolling_aggregates,
        rolling_aggregates_skew,
    )

    rng = random.Random(4242)
    rows = [(i, rng.randrange(3), rng.randrange(40), float(rng.randrange(100)))
            for i in range(250)]
    df = _ev(spark, rows)
    kw = dict(window_us=7_000_000, quantize=1e6)
    want = sorted(
        (r["event_id"], r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates(df, **kw).collect()
    )
    for n_parts in (1, 4, 16):
        got = sorted(
            (r["event_id"], r["roll_n"], r["roll_sum_q"])
            for r in rolling_aggregates_skew(df, n_parts=n_parts, **kw).collect()
        )
        assert got == want, n_parts


def test_rolling_skew_single_hot_key(spark):
    from raft_spark.operators.temporal import (
        rolling_aggregates,
        rolling_aggregates_skew,
    )

    rows = [(i, 1, i, float(i % 7)) for i in range(400)]
    df = _ev(spark, rows)
    kw = dict(window_us=10_000_000, quantize=1e6)
    want = sorted(
        (r["event_id"], r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates(df, **kw).collect()
    )
    got = sorted(
        (r["event_id"], r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates_skew(df, n_parts=8, **kw).collect()
    )
    assert got == want
    # windows genuinely non-trivial: 10 s window over 1 s spacing
    assert max(n for (_, n, _) in want) == 10


def test_asof_broadcast_empty_candidates_under_ansi(spark):
    """Regression for the r6/r7 driver red: a left row whose key EXISTS
    on the right but precedes every right timestamp (backward) — or
    follows every one (forward) — filters the packed history down to an
    EMPTY array. element_at(±1) on that empty array throws
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode (the Spark 4 and
    correctness-driver default); try_element_at must return NULL — the
    operator's documented unmatched contract. Pinned explicitly under
    ansi=true so a future session-conf change cannot re-mask it."""
    from raft_spark.operators.temporal import asof_join_broadcast

    saved = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        left = _ev(spark, [(1, 1, 5, 0), (2, 1, 50, 0), (3, 2, 10, 0)])
        right = _ev(spark, [(9, 1, 10, 0)])  # key 1 only, ts=10

        back = {
            r["event_id"]: (r["event_id_r"], r["gap_us"])
            for r in asof_join_broadcast(
                left, right, right_cols=("event_id",)
            ).collect()
        }
        # ts=5 precedes every right row for its key -> empty candidates
        assert back[1] == (None, None)
        assert back[2] == (9, 40_000_000)
        assert back[3] == (None, None)  # key absent entirely

        fwd = {
            r["event_id"]: (r["event_id_r"], r["gap_us"])
            for r in asof_join_broadcast(
                left, right, right_cols=("event_id",), direction="forward"
            ).collect()
        }
        # ts=50 follows every right row for its key -> empty candidates
        assert fwd[2] == (None, None)
        assert fwd[1] == (9, 5_000_000)
        assert fwd[3] == (None, None)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", saved)


def test_rolling_prefix_boundaries_and_equality(spark):
    """The linear prefix form must reproduce rolling_aggregates exactly:
    the pinned boundary scenario (strictly-before exclusivity, peers,
    inclusive lower edge) plus randomized inputs with heavy (key, ts)
    collisions — the tie cases where a wrong carry order would show."""
    import random

    from raft_spark.operators.temporal import (
        rolling_aggregates,
        rolling_aggregates_prefix,
    )

    rows = [
        (1, 1, 0, 1.5), (2, 1, 60, 2.25), (3, 1, 60, 4.0),
        (4, 1, 120, 8.0), (5, 2, 30, 1.0),
    ]
    out = {
        r["event_id"]: (r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates_prefix(
            _ev(spark, rows), window_us=60_000_000
        ).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (1, 1_500_000)
    assert out[3] == (1, 1_500_000)
    assert out[4] == (2, 6_250_000)
    assert out[5] == (0, 0)

    rng = random.Random(13)
    rows = [
        (i, rng.randrange(4), rng.randrange(50), float(rng.randrange(20)))
        for i in range(300)
    ]
    df = _ev(spark, rows)
    kw = dict(window_us=10_000_000, quantize=1e6)
    want = sorted(
        (r["event_id"], r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates(df, **kw).collect()
    )
    got = sorted(
        (r["event_id"], r["roll_n"], r["roll_sum_q"])
        for r in rolling_aggregates_prefix(df, **kw).collect()
    )
    assert got == want
    # ties are actually present (coarse ts space)
    assert len({(u, s) for (_, u, s, _) in rows}) < len(rows)


def test_rolling_auto_routes_all_strategies(spark):
    """rolling_route must pick each strategy on shaped inputs, and
    rolling_aggregates_auto's output must equal the plain operator on
    every route (strategies choose plans, never answers). r9: the
    sliding-window route is retired (the one-pass prefix form matches
    its shuffle count and beat it in every swept cell) — non-skew
    inputs route to prefix regardless of frame density; 'window'
    remains only the empty-input degenerate."""
    from raft_spark.operators.temporal import (
        rolling_aggregates,
        rolling_aggregates_auto,
        rolling_route,
    )

    # 1000 rows: keys 0..19 uniform (top share 5% < skew gate),
    # 100 s span, 1 s window -> sparse frames
    sparse = _ev(spark, [(i, i % 20, i // 10, float(i % 5)) for i in range(1000)])
    # one hot key holding everything
    hot = _ev(spark, [(i, 1, i % 50, float(i % 5)) for i in range(500)])
    # dense frames: 10 keys, 50 s span, 40 s window -> ~200 rows/frame
    dense = _ev(spark, [(i, i % 10, i % 50, float(i % 5)) for i in range(2000)])

    assert rolling_route(sparse, window_us=1_000_000) == "prefix"
    assert rolling_route(hot, window_us=1_000_000) == "skew"
    assert rolling_route(dense, window_us=40_000_000, skew_share=0.5) == "prefix"
    empty = sparse.filter("event_id < 0")
    assert rolling_route(empty, window_us=1_000_000) == "window"

    for df, w_us, auto_kw in (
        (sparse, 1_000_000, {}),
        (hot, 1_000_000, {}),
        (dense, 40_000_000, {"skew_share": 0.5}),
    ):
        want = sorted(
            (r["event_id"], r["roll_n"], r["roll_sum_q"])
            for r in rolling_aggregates(df, window_us=w_us).collect()
        )
        got = sorted(
            (r["event_id"], r["roll_n"], r["roll_sum_q"])
            for r in rolling_aggregates_auto(
                df, window_us=w_us, **auto_kw
            ).collect()
        )
        assert got == want
