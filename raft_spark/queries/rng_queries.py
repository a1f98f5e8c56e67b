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
             ELSE 2 END)::INTEGER AS discrete,
       round({sql_normal('i', 10.0, 3.0, SEED + 1)})::BIGINT AS normal_int,
       round({sql_normal('i', -1.0, 0.5, SEED + 7919)}, 6) AS ntable_0,
       round({sql_normal('i', 2.0, 1.5, SEED + 15838)}, 6) AS ntable_1
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
        rng.normal_int("id", 10.0, 3.0, seed=SEED + 1).alias("normal_int"),
        F.round(rng.normal_table("id", [-1.0, 2.0], [0.5, 1.5], seed=SEED)[0], 6).alias("ntable_0"),
        F.round(rng.normal_table("id", [-1.0, 2.0], [0.5, 1.5], seed=SEED)[1], 6).alias("ntable_1"),
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
    from raft_spark.sources.tables import load

    li = load(spark, "lineitem", sf_dir)
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
    """random/permute.cuh:58 — random row permutation by seeded sort
    key, ranked by the two-phase distributed rank (no global window)."""
    from raft_spark.operators.reductions import global_rank
    from raft_spark.sources.tables import load

    e = load(spark, "embeddings", sf_dir).select(
        F.col("vec_id").cast("long").alias("id"),
        rng.uniform("vec_id", 404).alias("_k"),
    )
    out = global_rank(e, ["_k", "id"], rank_name="new_pos")
    return out.select("id", "new_pos")


# ---- R-MAT generator (random/rmat_rectangular_generator.cuh) ---------------

_RMAT_LEVELS = 6
_RMAT_EDGES = 2000
_RMAT_SEED = 777
# theta quadrant probs (a,b,c,d) = (0.57, 0.19, 0.19, 0.05): cumulative
# splits at 0.57 / 0.76 / 0.95 pick (rbit, cbit) per recursion level.


def _rmat_sql() -> str:
    rbits, cbits = [], []
    for l in range(_RMAT_LEVELS):
        u = sql_uniform("i", _RMAT_SEED, stream=l)
        rbits.append(f"(CASE WHEN {u} >= 0.76 THEN {1 << l} ELSE 0 END)")
        cbits.append(
            f"(CASE WHEN ({u} >= 0.57 AND {u} < 0.76) OR {u} >= 0.95"
            f" THEN {1 << l} ELSE 0 END)"
        )
    return f"""
SELECT i::BIGINT AS edge_id,
       ({' + '.join(rbits)})::BIGINT AS row,
       ({' + '.join(cbits)})::BIGINT AS col
FROM range(0, {_RMAT_EDGES}) t(i)
"""


@query("rmat_graph", oracle=_rmat_sql())
def q_rmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/rmat_rectangular_generator.cuh:22 — per-edge recursive
    quadrant sampling over a 2^6×2^6 adjacency: level l consumes one
    counter-based uniform (edge_id, stream=l), so edges are independent
    rows and the generator is embarrassingly parallel at any scale."""
    e = spark.range(_RMAT_EDGES)
    row = F.lit(0)
    col = F.lit(0)
    for l in range(_RMAT_LEVELS):
        u = rng.uniform("id", _RMAT_SEED, stream=l)
        row = row + F.when(u >= 0.76, F.lit(1 << l)).otherwise(0)
        col = col + F.when(
            ((u >= 0.57) & (u < 0.76)) | (u >= 0.95), F.lit(1 << l)
        ).otherwise(0)
    return e.select(
        F.col("id").cast("bigint").alias("edge_id"),
        row.cast("bigint").alias("row"),
        col.cast("bigint").alias("col"),
    )


# ---- multi-variable Gaussian (random/multi_variable_gaussian.cuh) ----------

_MVN_SEED = 888
_MVN_N = 5000
_MVN_COV = [[4.0, 2.0, 1.0], [2.0, 3.0, 0.5], [1.0, 0.5, 2.0]]


def _mvn_chol() -> list[list[float]]:
    import numpy as np

    return np.linalg.cholesky(np.array(_MVN_COV)).tolist()


def _mvn_sql() -> str:
    L = _mvn_chol()
    zs = [sql_normal("i", 0.0, 1.0, _MVN_SEED + j) for j in range(3)]
    xs = []
    for r in range(3):
        terms = [f"({L[r][j]!r} * {zs[j]})" for j in range(r + 1)]
        xs.append(f"round({' + '.join(terms)}, 6) AS x{r}")
    return f"""
SELECT i::BIGINT AS id, {', '.join(xs)}
FROM range(0, {_MVN_N}) t(i)
"""


@query("mvn_sample", oracle=_mvn_sql())
def q_mvn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """random/multi_variable_gaussian.cuh — MVN(0, Σ) sampling via
    driver-side Cholesky of the (small) covariance + distributed
    counter-based standard normals: x = L·z, a narrow projection."""
    L = _mvn_chol()
    e = spark.range(_MVN_N)
    zs = [rng.normal("id", 0.0, 1.0, seed=_MVN_SEED + j) for j in range(3)]
    xs = []
    for r in range(3):
        acc = F.lit(L[r][0]) * zs[0]
        for j in range(1, r + 1):
            acc = acc + F.lit(L[r][j]) * zs[j]
        xs.append(F.round(acc, 6).alias(f"x{r}"))
    return e.select(F.col("id").cast("bigint").alias("id"), *xs)


@query(
    "stratified_sample",
    oracle=f"""
SELECT doc_id::BIGINT AS doc_id, lang,
       round({sql_uniform('doc_id', SEED, 0)}, 6) AS draw
FROM documents
WHERE {sql_uniform('doc_id', SEED, 0)} <
      CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25 ELSE 0.1 END
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample (language-mix
    rebalance): keep iff uniform(doc_id) < frac(lang). Counter-based
    draw — reproducible across engines, partitionings and retries."""
    from raft_spark.sources.tables import load

    docs = load(spark, "documents", sf_dir)
    out = rng.stratified_sample(
        docs, "lang", {"en": 0.5, "es": 0.25}, id_col="doc_id",
        seed=SEED, default_frac=0.1,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.round("_draw", 6).alias("draw"),
    )
