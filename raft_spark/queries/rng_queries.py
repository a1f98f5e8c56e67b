"""Random-generation / sampling queries (SURVEY.md §2.7).

All generators are counter-based (value = pure function of row id and
seed — the same contract as the reference's Philox/PCG, ``random/
rng_state.hpp``), so results are partitioning-independent and the
DuckDB oracle recomputes them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from raft_spark.functions import rng
from raft_spark.queries._sqlutil import sql_normal, sql_uniform
from raft_spark.queries.registry import query

N_GEN = 10_000
SEED = 42


@query(
    "rng_distributions",
    oracle=f"""
SELECT i::BIGINT AS id,
       round({sql_uniform('i', SEED, 0)}, 6) AS uniform,
       round({sql_normal('i', 0.0, 1.0, SEED)}, 6) AS normal,
       round(-ln(1.0 - {sql_uniform('i', SEED, 3)}) / 0.5, 6) AS exponential,
       round(-ln(-ln({sql_uniform('i', SEED, 4)})), 6) AS gumbel,
       round(exp({sql_normal('i', 0.0, 1.0, SEED)}), 6) AS lognormal,
       (CASE WHEN {sql_uniform('i', SEED, 5)} < 0.3 THEN 1 ELSE 0 END)::INTEGER AS bernoulli,
       (CASE WHEN {sql_uniform('i', SEED, 6)} < 0.2 THEN 0
             WHEN {sql_uniform('i', SEED, 6)} < 0.5 THEN 1
             ELSE 2 END)::INTEGER AS discrete
FROM range(0, {N_GEN}) t(i)
""",
)
def q_rng_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/rng.cuh distribution family: uniform, normal (Box–Muller),
    exponential, gumbel, lognormal, bernoulli, discrete(0.2/0.3/0.5) —
    all counter-based (zero shuffle, partitioning-independent)."""
    df = spark.range(N_GEN)
    return df.select(
        F.col("id"),
        F.round(rng.uniform("id", SEED), 6).alias("uniform"),
        F.round(rng.normal("id", 0.0, 1.0, SEED), 6).alias("normal"),
        F.round(rng.exponential("id", 0.5, SEED, stream=3), 6).alias("exponential"),
        F.round(rng.gumbel("id", 0.0, 1.0, SEED, stream=4), 6).alias("gumbel"),
        F.round(rng.lognormal("id", 0.0, 1.0, SEED), 6).alias("lognormal"),
        rng.bernoulli("id", 0.3, SEED, stream=5).alias("bernoulli"),
        rng.discrete("id", [0.2, 0.3, 0.5], SEED, stream=6).alias("discrete"),
    )


@query(
    "make_blobs",
    oracle=f"""
SELECT i::BIGINT AS id, (i % 5)::INTEGER AS cluster,
       round((i % 5) * 10.0 + {sql_normal('i', 0.0, 1.5, 101)}, 6) AS x,
       round((i % 5) * -5.0 + {sql_normal('i', 0.0, 1.5, 102)}, 6) AS y
FROM range(0, {N_GEN}) t(i)
""",
)
def q_make_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/make_blobs.cuh:24 — isotropic Gaussian clusters: cluster
    assignment = id mod k, center + σ·N(0,1) per dim."""
    df = spark.range(N_GEN)
    cluster = (F.col("id") % 5).cast("int")
    return df.select(
        "id",
        cluster.alias("cluster"),
        F.round(cluster * 10.0 + rng.normal("id", 0.0, 1.5, seed=101), 6).alias("x"),
        F.round(cluster * -5.0 + rng.normal("id", 0.0, 1.5, seed=102), 6).alias("y"),
    )


@query(
    "make_regression",
    oracle=f"""
WITH x AS (
    SELECT i::BIGINT AS id,
           {sql_uniform('i', 201, 0)} * 2 - 1 AS x1,
           {sql_uniform('i', 201, 1)} * 2 - 1 AS x2,
           {sql_uniform('i', 201, 2)} * 2 - 1 AS x3,
           {sql_normal('i', 0.0, 0.1, 202)} AS noise
    FROM range(0, {N_GEN}) t(i)
)
SELECT id, round(x1, 6) AS x1, round(x2, 6) AS x2, round(x3, 6) AS x3,
       round(3.0 * x1 - 2.0 * x2 + 0.5 * x3 + 1.0 + noise, 6) AS y
FROM x
""",
)
def q_make_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/make_regression.cuh:29 — linear targets w·x + bias + noise
    with fixed informative weights (3, −2, 0.5), bias 1, σ=0.1."""
    df = spark.range(N_GEN)
    x1 = rng.uniform("id", 201, stream=0) * 2 - 1
    x2 = rng.uniform("id", 201, stream=1) * 2 - 1
    x3 = rng.uniform("id", 201, stream=2) * 2 - 1
    noise = rng.normal("id", 0.0, 0.1, seed=202)
    return df.select(
        "id",
        F.round(x1, 6).alias("x1"),
        F.round(x2, 6).alias("x2"),
        F.round(x3, 6).alias("x3"),
        F.round(3.0 * x1 - 2.0 * x2 + 0.5 * x3 + 1.0 + noise, 6).alias("y"),
    )


@query(
    "sample_without_replacement",
    oracle=f"""
WITH keyed AS (
    SELECT l_orderkey, l_partkey, l_quantity,
           -ln({sql_uniform('l_orderkey * 10 + l_linenumber', 303, 0)}) / l_quantity AS k
    FROM lineitem
),
ranked AS (
    SELECT l_orderkey, l_partkey, row_number() OVER (ORDER BY k ASC, l_orderkey, l_partkey) AS rn
    FROM keyed
)
SELECT l_orderkey::BIGINT AS l_orderkey, l_partkey::BIGINT AS l_partkey, rn::BIGINT AS rn
FROM ranked WHERE rn <= 100
""",
)
def q_sample_without_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/sample_without_replacement.cuh:48 via the Gumbel/exp-sort
    trick (rng.cuh:775): keep the 100 smallest −ln(u)/w keys, weight =
    l_quantity. Global top-k → TakeOrderedAndProject, no full sort."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = rng.exp_sort_key(
        F.col("l_orderkey") * 10 + F.col("l_linenumber"), F.col("l_quantity"), seed=303
    )
    keyed = li.select("l_orderkey", "l_partkey", key.alias("k"))
    # orderBy().limit() → TakeOrderedAndProject: per-partition partial
    # top-k merged on the driver — no global sort, no single-partition
    # window. The rank window then runs over just 100 rows.
    top = keyed.orderBy(F.col("k").asc(), "l_orderkey", "l_partkey").limit(100)
    ranked = top.withColumn(
        "rn", F.row_number().over(W.orderBy(F.col("k").asc(), "l_orderkey", "l_partkey"))
    )
    return ranked.select("l_orderkey", "l_partkey", "rn")


@query(
    "permute",
    oracle=f"""
SELECT vec_id::BIGINT AS id,
       row_number() OVER (ORDER BY {sql_uniform('vec_id', 404, 0)}, vec_id)::BIGINT AS new_pos
FROM embeddings
""",
)
def q_permute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/permute.cuh:58 — random row permutation by seeded sort key."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        F.col("vec_id").cast("long").alias("id"),
        F.row_number()
        .over(W.orderBy(rng.uniform("vec_id", 404), "vec_id"))
        .cast("long")
        .alias("new_pos"),
    )
