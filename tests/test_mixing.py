"""Data-mixing operator invariants (operators/mixing.py).

The selections must be pure functions of (ids, token counts, spec):
re-partitioning cannot change the kept sets, rates 0/10^6 are the
empty/full sets, and the budget selection is prefix-closed in priority
order with the inclusive-boundary contract. Cross-engine equality of
the composed gate query rides on check_oracle / test_gate_immunity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_spark.operators import mixing as MIX


def _toy(spark, n=200, strata=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % strata).cast("string")).alias(
            "source"
        ),
        (F.col("id") % 37 + 3).alias("ntok"),
    )


def _spec(spark, strata=4, rate=500_000, budget=300):
    return spark.createDataFrame(
        [(f"s{i}", rate, budget) for i in range(strata)],
        "source string, rate_ppm long, token_budget long",
    )


def test_rate_extremes_and_determinism(spark):
    d = _toy(spark)
    none = MIX.stratified_sample(d, _spec(spark, rate=0))
    full = MIX.stratified_sample(d, _spec(spark, rate=1_000_000))
    assert none.agg(F.sum("keep_frac")).first()[0] == 0
    assert full.agg(F.sum("keep_frac")).first()[0] == 200

    spec = _spec(spark)
    a = {
        r["doc_id"]
        for r in MIX.stratified_sample(d, spec).filter("keep_frac = 1").collect()
    }
    b = {
        r["doc_id"]
        for r in MIX.stratified_sample(d.repartition(7), spec)
        .filter("keep_frac = 1")
        .collect()
    }
    assert a == b and 0 < len(a) < 200


def test_budget_prefix_closed_and_inclusive(spark):
    d = _toy(spark)
    out = MIX.token_budget_mixture(d, _spec(spark)).withColumn(
        "pri", MIX.mix_priority("doc_id")
    )
    rows = sorted(
        out.collect(), key=lambda r: (r["source"], r["pri"], r["doc_id"])
    )
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        # cum_tokens is the running sum in (priority, id) order
        run = 0
        for r in rs:
            run += r["ntok"]
            assert r["cum_tokens"] == run
        keeps = [r["keep_budget"] for r in rs]
        # prefix-closed: once a row is dropped, every later row is too
        assert keeps == sorted(keeps, reverse=True)
        # inclusive boundary: last kept row's cum_tokens <= budget and
        # the first dropped row (if any) crosses it
        kept = [r for r in rs if r["keep_budget"] == 1]
        assert kept and kept[-1]["cum_tokens"] <= 300
        dropped = [r for r in rs if r["keep_budget"] == 0]
        if dropped:
            assert dropped[0]["cum_tokens"] > 300


def test_budget_determinism_under_partitioning(spark):
    d = _toy(spark)
    spec = _spec(spark)
    a = {
        r["doc_id"]
        for r in MIX.token_budget_mixture(d, spec)
        .filter("keep_budget = 1")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in MIX.token_budget_mixture(d.repartition(13), spec)
        .filter("keep_budget = 1")
        .collect()
    }
    assert a == b and len(a) > 0


def test_two_phase_equals_plain_window(spark):
    d = _toy(spark, n=500, strata=3)
    spec = _spec(spark, strata=3, budget=900)
    a = sorted(
        (r["doc_id"], r["cum_tokens"], r["keep_budget"])
        for r in MIX.token_budget_mixture(d, spec, two_phase=True).collect()
    )
    b = sorted(
        (r["doc_id"], r["cum_tokens"], r["keep_budget"])
        for r in MIX.token_budget_mixture(d, spec, two_phase=False).collect()
    )
    assert a == b and len(a) == 500


def test_priority_extreme_ids_engine_exact(spark):
    # xxhash64-scale, negative, and boundary ids: the priority must be
    # (a) in [0, 2^31-1) — never negative, never wrapped — and
    # (b) bit-identical to the DuckDB SQL twin evaluated in BIGINT
    import duckdb

    ids = [0, 1, 2**31 - 2, 2**31 - 1, 2**40 + 17, 2**62 + 12345,
           2**63 - 5, -1, -17, -(2**62) - 99]
    got = {
        r["doc_id"]: r["pri"]
        for r in spark.createDataFrame([(i,) for i in ids], "doc_id long")
        .select("doc_id", MIX.mix_priority("doc_id").alias("pri"))
        .collect()
    }
    twin = (
        "SELECT doc_id, (((doc_id % 2147483647) + 2147483648) % 2147483647)"
        " * 48271 % 2147483647 * 279470273 % 2147483647 AS pri"
        " FROM ids"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ids AS SELECT unnest(?::BIGINT[]) AS doc_id", [ids]
    )
    want = dict(con.execute(twin).fetchall())
    assert got == want
    assert all(0 <= p < 2_147_483_647 for p in got.values())
    # small non-negative ids keep the pre-fix outputs (gate stability)
    assert got[0] == (1 * 48271 % 2_147_483_647) * 279_470_273 % 2_147_483_647


def test_stratified_sample_negative_ids_not_kept_wholesale(spark):
    # pre-fix, negative ids gave negative priorities, so pri % 1e6 <
    # rate held for EVERY row and a 1% mixture kept 100% of the stratum
    d = spark.range(400).select(
        (-F.col("id") - 1).alias("doc_id"), F.lit("s0").alias("source"),
    )
    rates = spark.createDataFrame([("s0", 10_000)], "source string, rate_ppm long")
    kept = (
        MIX.stratified_sample(d, rates, id_col="doc_id")
        .agg(F.sum("keep_frac").alias("k")).collect()[0]["k"]
    )
    assert kept < 100  # ~1% of 400 expected; 400 == the pre-fix bug
