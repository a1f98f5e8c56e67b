"""Sparse / graph / label operator queries (SURVEY.md §2.4, §2.5, §2.9).

Canonical sparse inputs, derived deterministically from the testdata:
- ``coo_li``  : lineitem → (row=l_orderkey, col=l_partkey, value=l_quantity)
  — naturally contains duplicate (row,col) pairs for the dedup ops.
- ``graph``   : 50×50 weighted adjacency from lineitem
  (row=l_partkey%50, col=l_suppkey%50, weight=edge count, no self
  loops), then symmetrized — square input for Laplacian/degree.
- ``coo_emb`` : thresholded embeddings long form (|x| > 0.1).
- generated dense matrices: long-form (row, col, value) with
  value = LCG-uniform(flat index) — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.functions import rng
from raft_spark.operators import sparse as SP
from raft_spark.queries._sqlutil import sql_uniform
from raft_spark.queries.registry import query
from raft_spark.sources.tables import embeddings_matrix, load

# ---- canonical inputs ------------------------------------------------------

SQL_COO_LI = """
coo_li AS (
    SELECT l_orderkey AS row, l_partkey AS col, l_quantity AS value FROM lineitem
)
"""

SQL_GRAPH = """
edges AS (
    SELECT (l_partkey % 50) AS row, (l_suppkey % 50) AS col,
           count(*)::DOUBLE AS value
    FROM lineitem
    WHERE (l_partkey % 50) <> (l_suppkey % 50)
    GROUP BY 1, 2
),
adj AS (
    SELECT row, col, sum(value) AS value FROM (
        SELECT row, col, value FROM edges
        UNION ALL
        SELECT col AS row, row AS col, value FROM edges
    ) GROUP BY 1, 2
)
"""

SQL_COO_EMB = """
coo_emb AS (
    SELECT vec_id AS row, generate_subscripts(embedding, 1) - 1 AS col,
           unnest(embedding::DOUBLE[]) AS x
    FROM embeddings
),
coo_emb_f AS (SELECT row, col, x AS value FROM coo_emb WHERE abs(x) > 0.1)
"""


def _coo_li(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.select(
        F.col("l_orderkey").alias("row"),
        F.col("l_partkey").alias("col"),
        F.col("l_quantity").cast("double").alias("value"),
    )


def _graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    edges = (
        li.select(
            (F.col("l_partkey") % 50).alias("row"),
            (F.col("l_suppkey") % 50).alias("col"),
        )
        .filter(F.col("row") != F.col("col"))
        .groupBy("row", "col")
        .agg(F.count("*").cast("double").alias("value"))
    )
    return SP.symmetrize(edges)


def _coo_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = embeddings_matrix(spark, sf_dir)
    long = m.select(
        F.col("id").alias("row"), F.posexplode("features").alias("col", "value")
    ).withColumn("col", F.col("col").cast("long"))
    return long.filter(F.abs("value") > 0.1)


def _gen_dense(spark: SparkSession, n: int, k: int, seed: int) -> DataFrame:
    """Long-form (row, col, value) with value = uniform(flat_idx, seed)."""
    return spark.range(n * k).select(
        (F.col("id") / k).cast("long").alias("row"),
        (F.col("id") % k).alias("col"),
        rng.uniform("id", seed).alias("value"),
    )


def _sql_gen_dense(name: str, n: int, k: int, seed: int) -> str:
    return f"""
{name} AS (
    SELECT (i // {k}) AS row, (i % {k}) AS col,
           {sql_uniform('i', seed)} AS value
    FROM range(0, {n * k}) t(i)
)
"""


# ---- queries ---------------------------------------------------------------


@query(
    "coo_dedup_max",
    oracle="WITH " + SQL_COO_LI + """
SELECT row::BIGINT AS row, col::BIGINT AS col,
       round(max(value), 6) AS value, count(*)::BIGINT AS n_dup
FROM coo_li GROUP BY 1, 2
""",
)
def q_coo_dedup_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/op/reduce.cuh:39,62 — DISTINCT-with-max over dup (row,col)."""
    out = SP.max_duplicates(_coo_li(spark, sf_dir))
    return out.select("row", "col", F.round("value", 6).alias("value"), "n_dup")


@query(
    "coo_filter_slice",
    oracle="WITH " + SQL_COO_LI + """
SELECT row::BIGINT AS row, col::BIGINT AS col, round(value, 6) AS value
FROM coo_li WHERE value <> 1.0 AND row BETWEEN 1 AND 500
""",
)
def q_coo_filter_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/op/filter.cuh:38 remove_scalar + op/slice.cuh:30 row slice
    — both pure predicates, pushed to the parquet scan."""
    out = SP.csr_row_slice(SP.coo_remove_scalar(_coo_li(spark, sf_dir), 1.0), 1, 500)
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "symmetrize_graph",
    oracle="WITH " + SQL_GRAPH + """
SELECT row::BIGINT AS row, col::BIGINT AS col, round(value, 6) AS value FROM adj
""",
)
def q_symmetrize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/symmetrize.cuh:19 — A ∪ Aᵀ with value sum."""
    out = _graph(spark, sf_dir)
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "degree_graph",
    oracle="WITH " + SQL_GRAPH + """
SELECT row::BIGINT AS row, count(*)::BIGINT AS deg, round(sum(value), 6) AS wdeg
FROM adj GROUP BY 1
""",
)
def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/degree.cuh:19 — nnz + weighted degree per row."""
    out = SP.degree(_graph(spark, sf_dir))
    return out.select("row", "deg", F.round("wdeg", 6).alias("wdeg"))


@query(
    "csr_row_normalize_l1",
    oracle="WITH " + SQL_COO_EMB + """
SELECT row::BIGINT AS row, col::BIGINT AS col,
       round(value / sum(abs(value)) OVER (PARTITION BY row), 6) AS value
FROM coo_emb_f
""",
)
def q_csr_row_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/norm.cuh:20 — L1 row normalize of thresholded COO."""
    out = SP.csr_row_normalize(_coo_emb(spark, sf_dir), "l1")
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "laplacian",
    oracle="WITH " + SQL_GRAPH + """,
deg AS (SELECT row, sum(value) AS d FROM adj GROUP BY 1)
SELECT row::BIGINT AS row, col::BIGINT AS col, round(value, 6) AS value FROM (
    SELECT row, row AS col, d AS value FROM deg
    UNION ALL
    SELECT row, col, -value FROM adj
)
""",
)
def q_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/laplacian.cuh:20 — L = D − A in long form."""
    out = SP.laplacian(_graph(spark, sf_dir), normalized=False)
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "laplacian_normalized",
    oracle="WITH " + SQL_GRAPH + """,
deg AS (SELECT row, sum(value) AS d FROM adj GROUP BY 1)
SELECT row::BIGINT AS row, col::BIGINT AS col, round(value, 6) AS value FROM (
    SELECT row, row AS col, 1.0 AS value FROM deg
    UNION ALL
    SELECT a.row, a.col, -a.value / sqrt(dr.d * dc.d)
    FROM adj a
    JOIN deg dr ON a.row = dr.row
    JOIN deg dc ON a.col = dc.row
)
""",
)
def q_laplacian_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/laplacian.cuh:60 — I − D^{-1/2} A D^{-1/2}."""
    out = SP.laplacian(_graph(spark, sf_dir), normalized=True)
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "spmm",
    oracle="WITH " + SQL_GRAPH + "," + _sql_gen_dense("b", 50, 8, 13) + """
SELECT a.row::BIGINT AS row, b.col::BIGINT AS col,
       round(sum(a.value * b.value), 6) AS value
FROM adj a JOIN b ON a.col = b.row
GROUP BY 1, 2
""",
)
def q_spmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/spmm.hpp:42 — adjacency × generated 50×8 dense."""
    out = SP.spmm(_graph(spark, sf_dir), _gen_dense(spark, 50, 8, 13))
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "sddmm",
    oracle="WITH "
    + SQL_GRAPH
    + ","
    + _sql_gen_dense("u", 50, 8, 17)
    + ","
    + _sql_gen_dense("v", 50, 8, 19)
    + """
SELECT p.row::BIGINT AS row, p.col::BIGINT AS col,
       round(sum(u.value * v.value), 6) AS value
FROM adj p
JOIN u ON u.row = p.row
JOIN v ON v.row = p.col AND v.col = u.col
GROUP BY 1, 2
""",
)
def q_sddmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/sddmm.hpp:43 (α=1, β=0) — C = (U·Vᵀ)∘spy(A);
    masked_matmul (masked_matmul.cuh:47) is this with a 0/1 mask."""
    out = SP.sddmm(
        _graph(spark, sf_dir),
        _gen_dense(spark, 50, 8, 17),
        _gen_dense(spark, 50, 8, 19),
    )
    return out.select("row", "col", F.round("value", 6).alias("value"))


@query(
    "gemm",
    oracle="WITH "
    + _sql_gen_dense("a", 40, 8, 23)
    + ","
    + _sql_gen_dense("b2", 8, 30, 29)
    + """
SELECT a.row::BIGINT AS row, b2.col::BIGINT AS col,
       round(sum(a.value * b2.value), 6) AS value
FROM a JOIN b2 ON a.col = b2.row
GROUP BY 1, 2
""",
)
def q_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/gemm.cuh:51 — long-form C = A·B (40×8 · 8×30)."""
    out = SP.gemm(_gen_dense(spark, 40, 8, 23), _gen_dense(spark, 8, 30, 29))
    return out.select("row", "col", F.round("value", 6).alias("value"))


def _gen_dense_int(spark: SparkSession, n: int, k: int, seed: int) -> DataFrame:
    """Integer-valued dense operand (value = floor(uniform·1000)): every
    scalar product ≤ 999² and every K-term sum stays far under 2⁵³, so
    BLAS-tile, join-agg, and DuckDB summation orders all yield the SAME
    exact double — the gate's no-float-ambiguity discipline."""
    return _gen_dense(spark, n, k, seed).withColumn(
        "value", F.floor(F.col("value") * 1000).cast("double")
    )


def _sql_gen_dense_int(name: str, n: int, k: int, seed: int) -> str:
    return f"""
{name} AS (
    SELECT (i // {k}) AS row, (i % {k}) AS col,
           floor(({sql_uniform('i', seed)}) * 1000)::DOUBLE AS value
    FROM range(0, {n * k}) t(i)
)
"""


@query(
    "dgemm_blocked",
    oracle="WITH "
    + _sql_gen_dense_int("a", 67, 13, 31)
    + ","
    + _sql_gen_dense_int("b2", 13, 41, 37)
    + """
SELECT a.row::BIGINT AS row, b2.col::BIGINT AS col,
       sum(a.value * b2.value) AS value
FROM a JOIN b2 ON a.col = b2.row
GROUP BY 1, 2
""",
)
def q_dgemm_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/gemm.cuh:51, blocked-BLAS physical strategy
    (sparse.dense_gemm): C = A·B at 67×13 · 13×41 with block sizes that
    do NOT divide the dims, forcing ragged edge tiles and multi-tile
    assembly. Integer-valued operands make the result summation-order
    exact (see _gen_dense_int), so this member hashes bit-stable against
    both the join-agg plan and the DuckDB oracle."""
    out = SP.dense_gemm(
        _gen_dense_int(spark, 67, 13, 31),
        _gen_dense_int(spark, 13, 41, 37),
        row_block=32,
        col_block=16,
    )
    return out.select("row", "col", "value")


@query(
    "label_ops",
    oracle="""
WITH distinct_labels AS (
    SELECT label, dense_rank() OVER (ORDER BY label) - 1 AS mono
    FROM (SELECT DISTINCT label FROM embeddings)
)
SELECT vec_id::BIGINT AS id, e.label::BIGINT AS label,
       mono::BIGINT AS mono,
       (CASE WHEN e.label = 3 THEN 1 ELSE 0 END)::INTEGER AS ovr
FROM embeddings e JOIN distinct_labels USING (label)
""",
)
def q_label_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label/classlabels.cuh:81 make_monotonic + getOvrlabels one-vs-rest
    (positive class = 3). The rank table is k rows, broadcast back."""
    m = embeddings_matrix(spark, sf_dir).select("id", "label")
    mono = SP.make_monotonic(m, "label")
    out = SP.binarize_ovr(mono, "label", 3)
    return out.select(
        "id", F.col("label").cast("long").alias("label"),
        F.col("_mono").alias("mono"), "ovr",
    )
