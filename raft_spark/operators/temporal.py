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
— high-cardinality, small per-key state; a pathological single hot
key serializes its window task (the mixing.token_budget_mixture
two-phase prefix pattern is the escape hatch if that ever bites).
The range join's per-(key, cell) groups bound the join fan-out by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    through unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    sgn = 1 if direction == "backward" else -1
    lcols = left.columns
    # events carry TIMESTAMP_NTZ; the session timezone is pinned UTC
    # (session.py), so the cast is epoch-exact vs the oracle's epoch_us
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tb = (
        (F.col(tiebreak_col) * sgn) if tiebreak_col is not None else F.lit(0)
    )
    # the carried match is ONE struct of (match ts, payload...) built
    # only on right rows — the struct is non-null per right row even
    # when payload FIELDS are null, so last(ignorenulls) advances the
    # whole record atomically and every output column (payloads AND
    # gap_us) comes from the SAME matched right row (per-column
    # last(ignorenulls) windows backfilled a null payload field from an
    # older right row — the pandas merge_asof contract attaches the
    # matched row's null instead)
    from pyspark.sql.types import LongType, StructField, StructType

    rdtypes = {f.name: f.dataType for f in right.schema.fields}
    rrec_type = StructType(
        [StructField("_rts", LongType())]
        + [StructField(f"_p_{c}", rdtypes[c]) for c in right_cols]
    )
    l_ = left.select(
        F.col(by).alias("_by"), (ts_us * sgn).alias("_ts"),
        F.lit(1).alias("_side"), F.lit(0).cast("long").alias("_tb"),
        F.struct(*lcols).alias("_l"),
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
    from pyspark.sql.window import Window

    # right rows sort BEFORE left rows at equal ts (side 0 < 1) → the
    # inclusive contract; the running last-non-null carries the most
    # recent right record (largest (_ts, _tb) seen so far) forward
    w = (
        Window.partitionBy("_by")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_.unionByName(r_).select(
        "_side", "_ts", "_l",
        F.last("_rrec", ignorenulls=True).over(w).alias("_m"),
    )
    # both _ts and _m._rts live in the signed sort space, and the
    # carried match always sorts at-or-before the left row — the
    # difference IS the non-negative real gap in either direction
    out = carried.filter(F.col("_side") == 1).select(
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
    if back:
        cand = F.filter("_arr", lambda s: s["_t"] <= F.col("_lts"))
        pick = F.element_at(cand, -1)
    else:
        cand = F.filter("_arr", lambda s: s["_t"] >= F.col("_lts"))
        pick = F.element_at(cand, 1)
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
    its window task; key cardinality is the parallelism."""
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
