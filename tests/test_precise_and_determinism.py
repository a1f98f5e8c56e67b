"""Compensated summation vs math.fsum (reference KBN parity,
linalg/detail/coalesced_reduction-inl.cuh:36) and the SURVEY §5.5
determinism contract: fixed seed ⇒ identical results across
partitionings."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from raft_spark.functions import precise, rng


ADVERSARIAL = [1e16, 1.0, -1e16, 1.0, 1e100, 1.0, -1e100, math.pi, -math.pi, 1e-8]


def test_fsum_column_exact(spark):
    # plain double sum of this series is wrong; fsum must be exact
    df = spark.createDataFrame([(x,) for x in ADVERSARIAL * 50], "v double")
    df = df.repartition(7)
    got = precise.fsum_column(df, "v")
    expect = math.fsum(ADVERSARIAL * 50)
    assert got == expect
    naive = df.agg(F.sum("v")).collect()[0][0]
    assert naive != expect  # the built-in really does lose the 1e-8s


def test_kahan_array_expr_beats_naive(spark):
    vals = [1e16, 1.0, 1.0, -1e16]  # naive left fold gives 0.0
    df = spark.createDataFrame([([float(x) for x in vals],)], "arr array<double>")
    kahan = df.select(precise.kahan_sum_expr("arr").alias("s")).collect()[0]["s"]
    naive = df.select(
        F.aggregate("arr", F.lit(0.0), lambda a, x: a + x).alias("s")
    ).collect()[0]["s"]
    assert kahan == 2.0
    assert naive == 0.0


def test_rng_partitioning_invariance(spark):
    """Counter-based RNG: values are a pure function of (id, seed) —
    identical under any partitioning (SURVEY §5.5 item 4)."""
    base = spark.range(10_000)
    a = base.select("id", rng.normal("id", seed=5).alias("x"))
    b = base.repartition(13).select("id", rng.normal("id", seed=5).alias("x"))
    diff = (
        a.join(b.withColumnRenamed("x", "y"), "id")
        .filter(F.col("x") != F.col("y"))
        .count()
    )
    assert diff == 0


def test_grouped_aggregation_partitioning_invariance(spark, sf_dir):
    """Rounded grouped aggregates are partitioning-independent."""
    from raft_spark.sources.tables import embeddings_matrix

    m = embeddings_matrix(spark, sf_dir)
    out1 = {
        (r["label"],): r["s"]
        for r in m.groupBy("label")
        .agg(F.round(F.sum(F.element_at("features", 1)), 6).alias("s"))
        .collect()
    }
    out2 = {
        (r["label"],): r["s"]
        for r in m.repartition(17)
        .groupBy("label")
        .agg(F.round(F.sum(F.element_at("features", 1)), 6).alias("s"))
        .collect()
    }
    assert out1 == out2


def test_int8_quantization_roundtrip_bound(spark):
    """quantize_int8 -> dequantize_int8 error is bounded by scale/254
    per entry (half a quantization step), codes are integral in
    [-127, 127], and all-zero rows survive."""
    import numpy as np

    from raft_spark.functions import arrays as A

    rng = np.random.RandomState(0)
    vecs = [rng.uniform(-5, 5, 16).tolist() for _ in range(50)] + [[0.0] * 16]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, features array<double>"
    )
    out = df.select(
        "id",
        A.quantize_int8("features").alias("q"),
        A.dequantize_int8("features").alias("dq"),
    ).collect()
    for r in out:
        orig = np.array(vecs[r["id"]])
        q = np.array(r["q"])
        dq = np.array(r["dq"])
        assert np.all(q == np.round(q)) and np.all(np.abs(q) <= 127)
        scale = np.abs(orig).max()
        if scale == 0:
            assert np.all(q == 0) and np.all(dq == 0)
            continue
        assert np.all(np.abs(orig - dq) <= scale / 254 + 1e-12), r["id"]


def test_gram_matrix_exact_split_dgemm_matches_python_int(spark):
    """The hi/lo split-dgemm Gram pass must be bit-exact vs a direct
    arbitrary-precision oracle — negatives, mixed magnitudes, several
    partitions — and robust past the dgemm-exactness bound (fallback)."""
    import numpy as np

    from raft_spark.operators.solvers import gram_matrix_exact

    rs = np.random.RandomState(7)
    # mixed magnitudes incl. negatives; the second block pushes hi =
    # q >> 13 past HI_MAX = isqrt(2^53/4096) ~= 1.48e6 (|x| ~ 1e8 at
    # scale 1e6 -> hi ~ 1.2e10) so the Python-int fallback branch is
    # genuinely exercised, not just the split-dgemm path
    # the 2e4 block is the regression case: it PASSED the old (wrong)
    # hi-x-lo gate while hi-x-hi entries exceeded 2^53 and lost bits
    x = np.concatenate(
        [
            rs.uniform(-100, 100, (400, 8)),
            rs.uniform(-2e4, 2e4, (30, 8)),
            rs.uniform(-1e8, 1e8, (30, 8)),
        ]
    )
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, features array<double>",
    ).repartition(7)
    g, s, n = gram_matrix_exact(df, scale=1e6)
    q = [[int(math.floor(v * 1e6 + 0.5)) for v in row] for row in x]
    assert n == len(q)
    d = len(q[0])
    for j in range(d):
        assert s[j] == sum(r[j] for r in q)
    for i in range(d):
        for j in range(d):
            assert g[i][j] == sum(r[i] * r[j] for r in q), (i, j)
