"""Data mixing for training-data pipelines: deterministic stratified
sampling and per-stratum token-budget selection.

A 100 TB pre-training corpus is assembled as a MIXTURE: each source
(web crawl, books, code, ...) contributes either a fixed sampling rate
or a fixed token budget. Both selections here are pure functions of
(id, stratum, mixture spec) — no RNG state, no driver decisions — so
the same spec replayed over re-partitioned, re-ordered, or incremental
data picks the identical document set (the property that makes a
mixture reproducible across pipeline re-runs and engines; the DuckDB
gate oracle recomputes every decision independently).

Physical shape at scale:
- the mixture spec is a tiny dim table → broadcast join, zero shuffle
  for the Bernoulli path (a narrow filter over the corpus scan);
- the budget path needs a per-stratum prefix sum → ONE shuffle
  partitioned by stratum (a window, map-side-prunable since AQE sees
  the broadcast filter first). Strata counts are ~10-100, far below
  executor counts, so skew is the concern at 100 TB: a single giant
  stratum serializes its window. The mitigation is the standard
  two-phase rank (reductions.global_rank) applied per stratum; at the
  gate's strata sizes the plain window is the right plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Two composed minstd LCG steps over the 2^31-1 Mersenne prime field.
# Every intermediate fits int64 (operands < 2^31, products < 2^62) so
# Spark and DuckDB evaluate it bit-identically in BIGINT arithmetic —
# the engine-exactness contract the md5/xxhash alternatives can't give
# (xxhash64 is Spark-only; hex-parsing md5 differs across engines).
P31 = 2_147_483_647
_A1 = 48_271
_A2 = 279_470_273


def mix_priority(id_col) -> Column:
    """Deterministic pseudo-uniform priority in [0, 2^31-1) from an
    integer id: two composed multiplicative-congruential steps. The id
    is reduced INTO the field before any multiply — h0 = ((id % P) + P
    + 1) % P — so every operand is < 2^31 and every product < 2^62 for
    ANY int64 id (xxhash64-mapped ids ~1.9e19 would otherwise wrap
    silently in Spark's non-ANSI long math while DuckDB BIGINT raises;
    negative ids would yield negative priorities that pass every
    ``pri % 10^6 < rate`` filter). For 0 ≤ id < P the reduction equals
    the old ``id + 1``, so small-id outputs are unchanged. The SQL twin
    is ``(((id % 2147483647) + 2147483648) % 2147483647) * 48271
    % 2147483647 * 279470273 % 2147483647`` (both engines truncate
    ``%`` toward zero, so the twin is bit-identical).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h0 = ((c.cast("long") % F.lit(P31)) + F.lit(P31 + 1)) % F.lit(P31)
    h1 = (h0 * F.lit(_A1)) % F.lit(P31)
    return (h1 * F.lit(_A2)) % F.lit(P31)


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "source",
    rate_col: str = "rate_ppm",
) -> DataFrame:
    """Deterministic Bernoulli mixture: keep a row iff
    priority(id) % 10^6 < rate_ppm for its stratum. ``rates`` is the
    mixture spec (strata_col, rate_ppm) — broadcast, so the whole
    selection is a narrow projection over the corpus scan (0 shuffles).
    Adds ``keep_frac`` (0/1 int); rows from strata absent in the spec
    are dropped (inner join — an unspecified stratum has no rate).

    Table-spec twin of functions/rng.stratified_sample (the dict-spec
    filter flavor over the counter-based float RNG): use that one for
    inline literal mixes, this one when the mixture spec is itself
    data (a weights table produced upstream) or when the decision must
    be integer-exact across engines (the gate oracle recomputes it).
    """
    pri = mix_priority(id_col)
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn(
            "keep_frac",
            (pri % F.lit(1_000_000) < F.col(rate_col)).cast("int"),
        )
    )


def token_budget_mixture(
    df: DataFrame,
    budgets: DataFrame,
    token_col: str = "ntok",
    id_col: str = "doc_id",
    strata_col: str = "source",
    budget_col: str = "token_budget",
    two_phase: bool = True,
    n_parts: int | None = None,
) -> DataFrame:
    """Per-stratum token-budget selection: rank each stratum's rows by
    (priority, id) and keep the prefix whose cumulative ``token_col``
    stays within the stratum's budget (inclusive — the document that
    exactly reaches the budget is kept; the one that would cross it is
    not). Deterministic: the kept set is a pure function of
    (ids, token counts, spec). Adds ``keep_budget`` (0/1 int) and
    ``cum_tokens``.

    ``two_phase=True`` (default) computes the prefix sum WITHOUT a
    per-stratum single-task window (the reductions.global_rank shape
    generalized to a grouped running sum): range-repartition on
    (stratum, priority, id) — so each stratum spans contiguous
    partitions in priority order — cumsum locally per partition, then
    add broadcast per-(partition, stratum) token offsets. A stratum
    holding 50% of a 100 TB corpus parallelizes across its partition
    range instead of serializing one window task. ``two_phase=False``
    is the plain per-stratum window (the small-data twin the pytest
    pins equality against).
    """
    from pyspark.sql.window import Window

    pri = mix_priority(id_col)
    j = df.join(F.broadcast(budgets), strata_col)
    if not two_phase:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(pri.asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return j.withColumn("cum_tokens", F.sum(F.col(token_col)).over(w)) \
            .withColumn(
                "keep_budget",
                (F.col("cum_tokens") <= F.col(budget_col)).cast("int"),
            )

    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    # materialize ONCE: RangePartitioner samples boundaries per plan
    # instance — the offsets branch and the cumsum branch below must
    # see the SAME physical partitioning (global_rank's contract).
    parted = (
        j.withColumn("_pri", pri)
        .repartitionByRange(n_parts, strata_col, "_pri", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offsets = (
        parted.groupBy("_pid", strata_col)
        .agg(F.sum(token_col).alias("_t"))
        .withColumn(
            "_off",
            F.sum("_t").over(
                Window.partitionBy(strata_col)
                .orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .fillna(0, ["_off"])
        .drop("_t")
    )
    local = F.sum(token_col).over(
        Window.partitionBy("_pid", strata_col)
        .orderBy(F.col("_pri").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.withColumn("_lc", local)
        .join(F.broadcast(offsets), ["_pid", strata_col])
        .withColumn("cum_tokens", (F.col("_off") + F.col("_lc")).cast("long"))
        .withColumn(
            "keep_budget",
            (F.col("cum_tokens") <= F.col(budget_col)).cast("int"),
        )
        .drop("_pid", "_pri", "_lc", "_off")
    )
