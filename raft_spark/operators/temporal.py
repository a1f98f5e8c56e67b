"""Temporal joins: as-of join and banded range join over event tables.

Spark has no native as-of join (the pandas merge_asof / kdb aj shape:
for each left row, the single most recent right row at or before its
timestamp, per key). The scalable DataFrame form is the union+window
trick: tag both sides, sort (key, ts) once, and let a running
last-non-null carry each right row forward to the left rows it
matches — ONE shuffle (the window partition), no per-row lookup, no
theta join. The banded range join avoids Spark's O(n·m) broadcast
nested loop for |l.ts − r.ts| ≤ w predicates by bucketing time into
w-sized cells and equi-joining each left cell against the right cell
and its two neighbors — every true pair matches exactly once (|Δts| ≤
w ⟹ |Δbucket| ≤ 1), so no post-dedup.

Both are exact integer-time operators (epoch microseconds, int64):
the DuckDB gate oracle checks the as-of members against DuckDB's
NATIVE ``ASOF JOIN`` — an independent implementation, not a mirrored
clause — and the range member against a plain inequality join.

Scale notes: the as-of window partitions by the join key (user, ...)
— high-cardinality, small per-key state. A pathological single hot
key (null-bucket user, bot traffic) would serialize its window task;
:func:`asof_join_skew` is the escape hatch — the
mixing.token_budget_mixture two-phase prefix pattern generalized to a
grouped running carry — and :func:`asof_join_auto` probes the inputs
and picks between the three physical strategies (window / skew /
broadcast), the reference's select_k auto-selection discipline
(matrix/select_k_types.hpp:28-69) applied to the as-of join. The
range join's per-(key, cell) groups bound the join fan-out by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raft_spark.operators import statestore as SS


def _asof_tagged(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: tuple,
    direction: str,
    tiebreak_col: str | None,
) -> DataFrame:
    """Shared tagged-union frame of every as-of strategy: both sides
    stacked with (_by, _ts signed-sort-space, _side right-before-left,
    _tb tiebreak, _l left struct, _rrec right record struct). The
    carried match is ONE struct of (match ts, payload...) built only on
    right rows — non-null per right row even when payload FIELDS are
    null, so a running last(ignorenulls) advances the whole record
    atomically and every output column (payloads AND gap_us) comes from
    the SAME matched right row (per-column windows backfilled a null
    payload field from an older right row; the pandas merge_asof
    contract attaches the matched row's null instead)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    sgn = 1 if direction == "backward" else -1
    # events carry TIMESTAMP_NTZ; the session timezone is pinned UTC
    # (session.py), so the cast is epoch-exact vs the oracle's epoch_us
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tb = (
        (F.col(tiebreak_col) * sgn) if tiebreak_col is not None else F.lit(0)
    )
    from pyspark.sql.types import LongType, StructField, StructType

    rdtypes = {f.name: f.dataType for f in right.schema.fields}
    rrec_type = StructType(
        [StructField("_rts", LongType())]
        + [StructField(f"_p_{c}", rdtypes[c]) for c in right_cols]
    )
    l_ = left.select(
        F.col(by).alias("_by"), (ts_us * sgn).alias("_ts"),
        F.lit(1).alias("_side"), F.lit(0).cast("long").alias("_tb"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rrec_type).alias("_rrec"),
    )
    r_ = right.select(
        F.col(by).alias("_by"), (ts_us * sgn).alias("_ts"),
        F.lit(0).alias("_side"), tb.cast("long").alias("_tb"),
        F.lit(None).cast(l_.schema["_l"].dataType).alias("_l"),
        F.struct(
            (ts_us * sgn).alias("_rts"),
            *[F.col(c).alias(f"_p_{c}") for c in right_cols],
        ).alias("_rrec"),
    )
    return l_.unionByName(r_)


def _asof_finish(
    matched: DataFrame,
    lcols: list,
    right_cols: tuple,
    tolerance_us: int | None,
) -> DataFrame:
    """Shared output stage: ``matched`` holds left rows with _l, _ts
    and the carried match struct _m; unpack payloads, derive gap_us
    (both _ts and _m._rts live in the signed sort space and the match
    sorts at-or-before the left row, so the difference IS the
    non-negative real gap in either direction), apply tolerance."""
    out = matched.select(
        "_l",
        *[F.col("_m").getField(f"_p_{c}").alias(f"{c}_r") for c in right_cols],
        (F.col("_ts") - F.col("_m").getField("_rts")).cast("long").alias("gap_us"),
    )
    if tolerance_us is not None:
        keep = F.col("gap_us") <= F.lit(int(tolerance_us))
        out = out.select(
            "_l",
            *[F.when(keep, F.col(f"{c}_r")).alias(f"{c}_r")
              for c in right_cols],
            F.when(keep, F.col("gap_us")).alias("gap_us"),
        )
    return out.select(
        *[F.col("_l").getField(c).alias(c) for c in lcols],
        *[f"{c}_r" for c in right_cols],
        "gap_us",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("event_id",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``ts`` ≤ left.ts (``backward``; inclusive) or the smallest ``ts`` ≥
    left.ts (``forward``; inclusive) sharing ``by``. Adds each
    ``right_cols`` column as ``<name>_r`` plus ``gap_us`` (non-negative
    int64 microseconds; NULL when unmatched). ``tolerance_us`` nulls
    matches farther than the tolerance. Ties on right ``ts`` are broken
    by ``tiebreak_col`` (largest wins for backward, smallest for
    forward) — pass one whenever right (by, ts) pairs can repeat, or
    the match would be partition-order-dependent.

    One shuffle: the (by)-partitioned sort window. Left columns pass
    through unchanged. Key cardinality is the parallelism — for a
    skewed/hot key use :func:`asof_join_skew` (identical output), or
    let :func:`asof_join_auto` pick.
    """
    from pyspark.sql.window import Window

    lcols = left.columns
    u = _asof_tagged(left, right, by, ts_col, right_cols, direction, tiebreak_col)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) → the
    # inclusive contract; the running last-non-null carries the most
    # recent right record (largest (_ts, _tb) seen so far) forward
    w = (
        Window.partitionBy("_by")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_side", "_ts", "_l",
        F.last("_rrec", ignorenulls=True).over(w).alias("_m"),
    )
    return _asof_finish(
        carried.filter(F.col("_side") == 1), lcols, right_cols, tolerance_us
    )


def asof_join_skew(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("event_id",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """:func:`asof_join` for SKEWED keys — identical output (pinned in
    pytest), different physical plan: the mixing.token_budget_mixture
    two-phase prefix pattern generalized to a grouped running carry.

    A hot key's rows spread over ``n_parts`` contiguous TIME buckets
    (deterministic approx-quantile boundaries of the tagged union's
    sort timestamp — a pure row expression, so no RangePartitioner
    sample to pin and no checkpoint) instead of landing in one hash
    bucket. Phase 1 computes the running last-right-record per
    (bucket, key) locally — window groups are bounded by bucket size,
    so parallelism = n_parts, not key cardinality. Phase 2 broadcasts
    the per-(bucket, key) carry-in — the latest right record from
    EARLIER buckets (every earlier-bucket row sorts strictly before
    every row of this bucket, so the latest earlier record is exactly
    the window's carry at the bucket boundary) — and the match is
    coalesce(local running carry, boundary carry-in).

    Cost: one quantile pass + one tiny (bucket, key) aggregate + the
    same single big window shuffle the plain strategy pays. The carry
    table is O(distinct keys × n_parts) rows — dimension-sized in the
    hot-key / low-cardinality regimes this strategy exists for (the
    auto router sends high-cardinality inputs to the plain window,
    where per-key groups are already small)."""
    from pyspark.sql.window import Window

    lcols = left.columns
    u = _asof_tagged(left, right, by, ts_col, right_cols, direction, tiebreak_col)
    n_parts = n_parts or left.sparkSession.sparkContext.defaultParallelism
    qs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(set(u.approxQuantile("_ts", qs, 0.001))) if qs else []
    if bounds:
        barr = F.array(*[F.lit(int(b)).cast("long") for b in bounds])
        pid = F.aggregate(
            barr, F.lit(0),
            lambda acc, b: acc + (F.col("_ts") >= b).cast("int"),
        )
    else:
        pid = F.lit(0)
    parted = u.withColumn("_pid", pid)
    # per (bucket, key): the latest right record (max ignores NULLs,
    # so left rows don't contribute; struct order = (_ts, _tb) first)
    pk = parted.groupBy("_pid", "_by").agg(
        F.max(
            F.when(F.col("_side") == 0, F.struct("_ts", "_tb", "_rrec"))
        ).alias("_mrec")
    )
    carry = (
        pk.withColumn(
            "_cin",
            F.last("_mrec", ignorenulls=True).over(
                Window.partitionBy("_by").orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .filter(F.col("_cin").isNotNull())
        .select("_pid", "_by", F.col("_cin").getField("_rrec").alias("_cin"))
    )
    wl = (
        Window.partitionBy("_pid", "_by")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        parted.withColumn("_loc", F.last("_rrec", ignorenulls=True).over(wl))
        .join(F.broadcast(carry), ["_pid", "_by"], "left")
        .filter(F.col("_side") == 1)
        # any local right record sorts AFTER every earlier partition's,
        # so the local carry wins whenever present
        .withColumn("_m", F.coalesce(F.col("_loc"), F.col("_cin")))
    )
    return _asof_finish(matched, lcols, right_cols, tolerance_us)


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("event_id",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
    broadcast_rows: int = 1_000_000,
    skew_share: float = 0.10,
    probe_rows: int = 1_000_000,
) -> DataFrame:
    """Strategy-selecting as-of join (the reference's select_k
    auto-selection shape, matrix/select_k_types.hpp:28-69): all three
    strategies produce IDENTICAL output, so the probe only chooses the
    physical plan. (1) a dimension-sized right side (≤ broadcast_rows)
    → :func:`asof_join_broadcast` (zero fact shuffle); (2) else a
    seeded left-key sample whose top key holds ≥ skew_share of rows →
    :func:`asof_join_skew` (hot key would serialize the plain window);
    (3) else the plain one-shuffle :func:`asof_join`. Probe cost: one
    right count + one sampled left groupBy (~probe_rows rows)."""
    kw = dict(
        by=by, ts_col=ts_col, right_cols=right_cols, direction=direction,
        tolerance_us=tolerance_us, tiebreak_col=tiebreak_col,
    )
    strategy = asof_route(
        left, right, by=by,
        broadcast_rows=broadcast_rows, skew_share=skew_share,
        probe_rows=probe_rows,
    )
    fn = {
        "broadcast": asof_join_broadcast,
        "skew": asof_join_skew,
        "window": asof_join,
    }[strategy]
    return fn(left, right, **kw)


def asof_route(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    broadcast_rows: int = 1_000_000,
    skew_share: float = 0.10,
    probe_rows: int = 1_000_000,
) -> str:
    """The routing decision behind :func:`asof_join_auto`, exposed so
    tests and scale probes can assert WHICH physical strategy a shaped
    input selects (the reference's select_k heuristics are similarly
    unit-probed, cpp/tests/matrix/select_k.cu): ``"broadcast"`` |
    ``"skew"`` | ``"window"``. Cost: one right count, and — only past
    the broadcast gate — one left count + a ≤ probe_rows sampled
    groupBy."""
    if right.count() <= broadcast_rows:
        return "broadcast"
    n_left = left.count()
    frac = min(1.0, probe_rows / max(n_left, 1))
    sample = left.sample(fraction=frac, seed=7) if frac < 1.0 else left
    with SS._no_aqe(left.sparkSession):  # probe: map-side collapse
        top = (
            sample.groupBy(by).count()
            .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
            .collect()[0]
        )
    if top["tot"] and top["mx"] / top["tot"] >= skew_share:
        return "skew"
    return "window"


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    width_us: int = 300_000_000,
    right_cols: tuple = ("event_id",),
) -> DataFrame:
    """All (left, right) pairs sharing ``by`` with |l.ts − r.ts| ≤
    ``width_us`` (inclusive band): left columns + ``<name>_r`` right
    columns + signed ``delta_us`` (l.ts − r.ts, int64). Bucketed band
    join — each side keyed by floor(ts/width); right rows explode to
    their bucket and both neighbors, so the equi-join on (by, bucket)
    sees every true pair exactly once and nothing farther than one
    cell away. Shuffle O(|L| + 3|R|), never a nested loop."""
    lcols = left.columns
    w = int(width_us)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # exact int64 floor-division, NOT floor(ts/width): the double
    # division misbuckets a cell-edge row by one once |ts_us|·(1/width)
    # error exceeds its distance to an integer (|ts_us| > ~2^52 at
    # epoch-µs, sooner for µs-scale widths), silently dropping true
    # band pairs. Subtracting the non-negative pmod residue first makes
    # the dividend exactly divisible, so DIV is a true floor for
    # negative timestamps too.
    lb = F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) "
        f"- pmod(unix_micros(cast({ts_col} as timestamp)), {w})) DIV {w}"
    )
    l_ = left.select(
        F.col(by).alias("_by"), lb.alias("_cell"),
        ts_us.alias("_lts"),
        F.struct(*lcols).alias("_l"),
    )
    r_ = right.select(
        F.col(by).alias("_by"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_cell"),
        ts_us.alias("_rts"),
        *[F.col(c).alias(f"{c}_r") for c in right_cols],
    )
    return (
        l_.join(r_, ["_by", "_cell"])
        .filter(F.abs(F.col("_lts") - F.col("_rts")) <= F.lit(int(width_us)))
        .select(
            *[F.col("_l").getField(c).alias(c) for c in lcols],
            *[f"{c}_r" for c in right_cols],
            (F.col("_lts") - F.col("_rts")).cast("long").alias("delta_us"),
        )
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("event_id",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """:func:`asof_join` for a DIMENSION-sized right side (slowly
    changing attributes: config versions, exchange rates, model
    checkpoints): the right table aggregates to ONE time-sorted array
    per key and broadcasts, so the as-of pick is a JVM array
    filter + element_at per left row — ZERO shuffle of the fact side
    (the window variant shuffles every left row into the keyed sort).
    Same contract and output columns as asof_join; equality is pinned
    in pytest. Right side must fit the broadcast budget: Σ per-key
    history lengths, i.e. the whole dimension table."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    back = direction == "backward"
    lcols = left.columns
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tb = F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0).cast("long")
    # struct field order (_t, _k, payload...) drives sort_array's
    # lexicographic order — max/min of (_t, _k) IS the tie-pinned match
    packed = right.groupBy(F.col(by).alias("_by")).agg(
        F.sort_array(
            F.collect_list(F.struct(
                ts_us.alias("_t"), tb.alias("_k"),
                *[F.col(c).alias(f"_p_{c}") for c in right_cols],
            ))
        ).alias("_arr")
    )
    lts = ts_us
    j = left.join(
        F.broadcast(packed), F.col(by) == F.col("_by"), "left"
    ).withColumn("_lts", lts)
    # try_element_at, NOT element_at: when a left row's key exists on
    # the right but every right timestamp is strictly after (backward)
    # or before (forward) it, `cand` is EMPTY — element_at on an empty
    # array throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode
    # (the Spark 4 default); try_element_at returns NULL, which is
    # exactly this operator's documented unmatched contract.
    if back:
        cand = F.filter("_arr", lambda s: s["_t"] <= F.col("_lts"))
        pick = F.try_element_at(cand, F.lit(-1))
    else:
        cand = F.filter("_arr", lambda s: s["_t"] >= F.col("_lts"))
        pick = F.try_element_at(cand, F.lit(1))
    gap = (
        (F.col("_lts") - F.col("_m._t")) if back
        else (F.col("_m._t") - F.col("_lts"))
    )
    out = j.withColumn("_m", pick).withColumn("gap_us", gap.cast("long"))
    if tolerance_us is not None:
        keep = F.col("gap_us") <= F.lit(int(tolerance_us))
        return out.select(
            *lcols,
            *[F.when(keep, F.col(f"_m._p_{c}")).alias(f"{c}_r")
              for c in right_cols],
            F.when(keep, F.col("gap_us")).alias("gap_us"),
        )
    return out.select(
        *lcols,
        *[F.col(f"_m._p_{c}").alias(f"{c}_r") for c in right_cols],
        "gap_us",
    )


def rolling_aggregates(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    quantize: float = 1e6,
) -> DataFrame:
    """Leakage-safe trailing-window features per key: for each row,
    the COUNT and quantized SUM of ``value_col`` over events of the
    same key in [ts − window_us, ts) — strictly BEFORE the current
    event (the training-feature convention: a row's features never see
    its own label time). One RANGE-frame window over epoch
    microseconds; the sum runs over floor(v·quantize + 0.5) int64
    values, so both outputs are exact integers (engine- and
    partition-order-independent). Adds ``roll_n`` and ``roll_sum_q``.

    Same skew caveat as asof_join: one pathological hot key serializes
    its window task; key cardinality is the parallelism.

    DENSE-FRAME caveat (measured, not theoretical): Spark's sliding
    RANGE frame re-aggregates the ENTIRE frame every time the lower
    bound moves (SlidingWindowFunctionFrame has no retract), so this
    single-window form costs O(n · avg_frame_rows), not O(n) — a
    10M-row/1-key/1-hour-window input (~14k rows per frame) measured
    ~240 s where the dual-growing-frame form
    (:func:`rolling_aggregates_prefix`) is linear AT THE SAME shuffle
    count. Since the r9 rewrite the prefix form is never
    asymptotically worse; this sliding form survives as the
    reference-discipline fixed algorithm (and wins only the last few
    percent on very sparse frames). Route unknown inputs through
    :func:`rolling_aggregates_auto`."""
    from pyspark.sql.window import Window

    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    qv = F.floor(F.col(value_col) * F.lit(quantize) + F.lit(0.5)).cast("long")
    base = df.withColumn("_ts_us", ts_us).withColumn("_qv", qv)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_ts_us"))
        .rangeBetween(-int(window_us), -1)
    )
    return (
        base.withColumn("roll_n", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn(
            "roll_sum_q",
            F.coalesce(F.sum("_qv").over(w), F.lit(0)).cast("long"),
        )
        .drop("_ts_us", "_qv")
    )


def _roll_dual_frame(base: DataFrame, part_cols: list, window_us: int) -> DataFrame:
    """Shared linear-time trailing-window engine (r9 rewrite):
    ``agg over [ts − w, ts)`` = ``cum(≤ ts−1) − cum(≤ ts−w−1)`` — the
    DIFFERENCE OF TWO GROWING FRAMES, both ``rangeBetween(unbounded
    Preceding, offset)``. Spark evaluates a growing frame with the
    add-only incremental UnboundedPrecedingWindowFunctionFrame (O(1)
    per row), and both frames share one partition/order spec, so the
    whole thing is ONE WindowExec: one keyed shuffle, one sort, O(rows)
    aggregation at ANY frame density. This supersedes the r8 two-pass
    prefix-sum core (cums pass + tagged-union as-of carry): identical
    output (pinned in pytest), but one shuffle instead of two and —
    decisively at scale — the full row width crosses the exchange and
    the window buffer ONCE (the 100M-row/1000-key probe measured 209 s
    two-pass vs 33 s here; the sliding RANGE frame, which re-aggregates
    the whole frame per row, took ~240 s already at 10M/1-key).

    Correctness of the bounds (integer-µs timestamps): rows with
    t' ≤ t−1 ⟺ t' < t, minus rows with t' ≤ t−w−1 ⟺ t' < t−w, leaves
    exactly [t−w, t) — and RANGE frames include all peers, so ties are
    handled deterministically on both sides of the difference.

    ``base`` columns: ``part_cols...``, ``_ts_us`` (long), ``_qv``
    (long), ``_tgt`` (1 → emit a result row). Non-target rows (e.g.
    the skew strategy's ghost contributors) enter both cums and
    cancel out of neither — they are frame contributors — but produce
    no output row. Returns the base columns plus ``roll_n`` /
    ``roll_sum_q`` for target rows."""
    from pyspark.sql.window import Window

    w_ex = (
        Window.partitionBy(*part_cols).orderBy("_ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_bd = (
        Window.partitionBy(*part_cols).orderBy("_ts_us")
        .rangeBetween(Window.unboundedPreceding, -(int(window_us) + 1))
    )
    return (
        base.withColumn(
            "roll_n",
            (F.count(F.lit(1)).over(w_ex) - F.count(F.lit(1)).over(w_bd))
            .cast("long"),
        )
        .withColumn(
            "roll_sum_q",
            (
                F.coalesce(F.sum("_qv").over(w_ex), F.lit(0))
                - F.coalesce(F.sum("_qv").over(w_bd), F.lit(0))
            ).cast("long"),
        )
        .filter(F.col("_tgt") == 1)
    )


def rolling_aggregates_prefix(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    quantize: float = 1e6,
) -> DataFrame:
    """:func:`rolling_aggregates` in LINEAR time regardless of frame
    density — identical output (pinned in pytest), computed as the
    difference of two growing cumulative frames in one WindowExec
    (:func:`_roll_dual_frame`) instead of one sliding RANGE frame that
    Spark re-aggregates per row (O(rows · frame) — ~240 s at
    10M/1-key/1-hour vs 7 s here; 33 s at 100M/1000-key where the r8
    two-pass prefix form took 209 s). Same shuffle count as the
    sliding form (one keyed exchange), so it is never asymptotically
    worse — the sliding strategy survives only as the
    reference-discipline fixed algorithm next to it."""
    lcols = df.columns
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    qv = F.floor(F.col(value_col) * F.lit(quantize) + F.lit(0.5)).cast("long")
    base = df.select(
        *lcols, ts_us.alias("_ts_us"), qv.alias("_qv"), F.lit(1).alias("_tgt")
    )
    return _roll_dual_frame(base, [by], int(window_us)).select(
        *lcols, "roll_n", "roll_sum_q"
    )


def rolling_aggregates_skew(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    quantize: float = 1e6,
    n_parts: int | None = None,
) -> DataFrame:
    """:func:`rolling_aggregates` for SKEWED keys — identical output
    (pinned in pytest), the asof_join_skew discipline applied to a
    trailing window: a hot key's rows spread over uniform TIME cells
    of width W = max(window_us, span/n_parts) instead of one
    hash-window task. Every row is emitted to its own cell (as a
    target AND in-cell contributor) and as a GHOST contributor to the
    next cell — W ≥ window_us guarantees each target's [ts − w, ts)
    frame lies inside its own cell ∪ the previous one, so the ghost
    copies are exactly the missing contributors and nothing double
    counts (the ghost and its original live in different cells, hence
    different window partitions).

    Within each (cell, key) the frame aggregates run through the
    linear dual-growing-frame engine (:func:`_roll_dual_frame`) — one
    WindowExec per pass, O(rows), any frame density. Ghost rows null
    out the payload struct so the 2× replication shuffles keys + two
    longs, not a second copy of every source column. Parallelism =
    time cells, independent of key cardinality."""
    lcols = df.columns
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    qv = F.floor(F.col(value_col) * F.lit(quantize) + F.lit(0.5)).cast("long")
    base = df.select(
        F.struct(*lcols).alias("_o"), ts_us.alias("_ts_us"), qv.alias("_qv"),
        F.col(by).alias("_by"),
    )
    with SS._no_aqe(df.sparkSession):  # probe: map-side collapse
        lo, hi = base.agg(F.min("_ts_us"), F.max("_ts_us")).first()
    if lo is None:
        cell_w = int(window_us)
    else:
        cell_w = max(int(window_us), -(-(int(hi) - int(lo) + 1) // n_parts))
    # exact int64 floor-division (the range_join discipline)
    cell = F.expr(f"(_ts_us - pmod(_ts_us, {cell_w})) DIV {cell_w}")
    tagged = base.withColumn("_cell", cell).withColumn("_tgt", F.lit(1))
    # ghosts contribute only (_ts_us, _qv) to the cums — drop their
    # payload struct so the 2× replication shuffles keys + two longs,
    # not a second copy of every source column
    ghosts = (
        base.withColumn("_cell", cell + 1).withColumn("_tgt", F.lit(0))
        .withColumn("_o", F.lit(None).cast(base.schema["_o"].dataType))
    )
    res = _roll_dual_frame(
        tagged.unionByName(ghosts), ["_cell", "_by"], int(window_us)
    )
    return res.select(
        *[F.col("_o").getField(c).alias(c) for c in lcols],
        "roll_n", "roll_sum_q",
    )


def rolling_route(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
    skew_share: float = 0.10,
    probe_rows: int = 1_000_000,
) -> str:
    """Routing decision behind :func:`rolling_aggregates_auto`:
    ``"skew"`` | ``"prefix"`` (| ``"window"`` for empty input, where no
    physical shape matters). One count + one sampled groupBy
    (≤ probe_rows) estimating the top-key share; a hot key
    (share ≥ skew_share) serializes any single hash-window task, so it
    routes to the cell-parallel skew strategy; everything else takes
    the dual-growing-frame prefix form.

    Until r9 this probe also estimated frame density to choose between
    the sliding RANGE window and the (then two-shuffle) prefix form.
    The r9 one-WindowExec rewrite of :func:`rolling_aggregates_prefix`
    made prefix the same shuffle count as the sliding window AND
    O(rows) at any density — the re-swept crossover grid (BASELINE v9,
    frames {4, 64, 1024} × payload {narrow, 256 B}) measures prefix at
    or below the sliding window in EVERY cell, so the sliding route is
    retired from the router (it remains a callable fixed strategy and
    gate member), and the ``dense_frame_rows`` knob that drove that
    choice was removed with it (r10 — a documented-but-ignored tuning
    parameter is a trap for the next caller)."""
    n = df.count()
    if n == 0:
        return "window"
    frac = min(1.0, probe_rows / n)
    sample = df.sample(fraction=frac, seed=7) if frac < 1.0 else df
    with SS._no_aqe(df.sparkSession):  # probe: map-side collapse
        stats = (
            sample.groupBy(F.col(by).alias("_by"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.max("_c").alias("mx"), F.sum("_c").alias("tot"))
            .collect()[0]
        )
    if not stats["tot"]:
        return "window"
    if stats["mx"] / stats["tot"] >= skew_share:
        return "skew"
    return "prefix"


def rolling_aggregates_auto(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    quantize: float = 1e6,
    skew_share: float = 0.10,
    probe_rows: int = 1_000_000,
    n_parts: int | None = None,
) -> DataFrame:
    """Strategy-selecting trailing-window features (the asof_join_auto
    discipline): all strategies are output-identical, the probe only
    picks the physical plan — skew (hot key: cell-parallel dual
    growing frames) or prefix (everything else; since the r9 rewrite
    it matches the sliding window's shuffle count and beats it at
    every measured frame density, so the sliding form is reached only
    by calling :func:`rolling_aggregates` explicitly)."""
    strategy = rolling_route(
        df, by=by, ts_col=ts_col, window_us=window_us,
        skew_share=skew_share, probe_rows=probe_rows,
    )
    kw = dict(by=by, ts_col=ts_col, value_col=value_col,
              window_us=window_us, quantize=quantize)
    if strategy == "skew":
        return rolling_aggregates_skew(df, n_parts=n_parts, **kw)
    if strategy == "prefix":
        return rolling_aggregates_prefix(df, **kw)
    return rolling_aggregates(df, **kw)
