"""Matrix-manipulation operator queries (SURVEY.md §2.1, §2.3, §2.4
gaps): gather, slice, shift/reverse, col-wise sort, triangular,
bitset/popc, masked matmul, sparse select_k. All DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.operators import matrixops as M
from raft_spark.operators.selectk import select_k
from raft_spark.queries.registry import query
from raft_spark.sources.tables import embeddings_matrix, load


@query(
    "matrix_gather",
    oracle="""
WITH map AS (
    SELECT range AS out_id,
           (range * 37) % (SELECT count(*) FROM embeddings) AS src
    FROM range(0, 200)
)
SELECT m.out_id::BIGINT AS out_id, e.vec_id::BIGINT AS id,
       list_transform(e.embedding::DOUBLE[], x -> round(x, 6)) AS features
FROM map m JOIN embeddings e ON e.vec_id = m.src
""",
)
def q_matrix_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/gather.cuh:25 — 200 rows selected (with repetition) by a
    deterministic modular map; tiny map side → broadcast join."""
    m = embeddings_matrix(spark, sf_dir)
    n = m.count()
    index_map = spark.range(200).select(
        F.col("id").alias("out_id"), ((F.col("id") * 37) % n).alias("src_id")
    )
    out = M.gather(m, index_map)
    return out.select(
        F.col("out_id").cast("bigint").alias("out_id"),
        F.col("id").cast("bigint").alias("id"),
        F.transform("features", lambda x: F.round(x, 6)).alias("features"),
    )


@query(
    "matrix_scatter",
    oracle="""
WITH map AS (
    SELECT range AS src, (range * 7 + 3) % 500 AS dst FROM range(0, 500)
)
SELECT m.dst::BIGINT AS out_id, e.vec_id::BIGINT AS id,
       list_transform(e.embedding::DOUBLE[], x -> round(x, 6)) AS features
FROM map m JOIN embeddings e ON e.vec_id = m.src
""",
)
def q_matrix_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/scatter.cuh:16 — permute the first 500 rows through the
    bijection dst = (7·src + 3) mod 500 (gcd(7,500)=1); forward map is
    tiny → broadcast join, big side never shuffles."""
    m = embeddings_matrix(spark, sf_dir).filter(F.col("id") < 500)
    index_map = spark.range(500).select(
        F.col("id").alias("src_id"),
        ((F.col("id") * 7 + 3) % 500).alias("dst_id"),
    )
    out = M.scatter(m, index_map)
    return out.select(
        F.col("out_id").cast("bigint").alias("out_id"),
        F.col("id").cast("bigint").alias("id"),
        F.transform("features", lambda x: F.round(x, 6)).alias("features"),
    )


@query(
    "matrix_slice",
    oracle="""
SELECT vec_id::BIGINT AS id,
       list_transform((embedding::DOUBLE[])[9:16], x -> round(x, 6)) AS features
FROM embeddings WHERE vec_id BETWEEN 100 AND 199
""",
)
def q_matrix_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/slice.cuh:36 — rows 100..199 × cols 8..15; the row filter
    is a pushed-down scan predicate, the col slice a narrow projection."""
    m = embeddings_matrix(spark, sf_dir)
    out = M.matrix_slice(m, 100, 199, 8, 8)
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.transform("features", lambda x: F.round(x, 6)).alias("features"),
    )


@query(
    "matrix_shift_reverse",
    oracle="""
WITH sl AS (
    SELECT vec_id, (embedding::DOUBLE[])[1:8] AS f
    FROM embeddings WHERE vec_id < 50
)
SELECT a.vec_id::BIGINT AS id,
       list_transform(
           list_concat([0.0, 0.0], a.f[1:6]),
           x -> round(x, 6)) AS shifted,
       list_transform(list_reverse(a.f), x -> round(x, 6)) AS reversed,
       list_transform(
           coalesce(b.f, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
           x -> round(x, 6)) AS rshifted,
       list_transform(c.f, x -> round(x, 6)) AS rreversed
FROM sl a
LEFT JOIN sl b ON b.vec_id = a.vec_id - 3
JOIN sl c ON c.vec_id = 49 - a.vec_id
""",
)
def q_matrix_shift_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/shift.cuh:18 (col right-shift by 2, zero fill), :64 (ROW
    down-shift by 3, zero fill), matrix/reverse.cuh:43 (flip each row)
    and :23 (flip the ROW order) over a 50×8 slice."""
    base = M.matrix_slice(embeddings_matrix(spark, sf_dir), 0, 49, 0, 8)
    shifted = M.shift_cols(base, 2).withColumnRenamed("features", "shifted")
    reversed_ = M.reverse_cols(base).withColumnRenamed("features", "reversed")
    rshift = M.shift_rows(base, 3).withColumnRenamed("features", "rshifted")
    rrev = M.reverse_rows(base, n_rows=50).withColumnRenamed("features", "rreversed")
    out = shifted.join(reversed_, "id").join(rshift, "id").join(rrev, "id")
    r6 = lambda c: F.transform(c, lambda x: F.round(x, 6))  # noqa: E731
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        r6("shifted").alias("shifted"),
        r6("reversed").alias("reversed"),
        r6("rshifted").alias("rshifted"),
        r6("rreversed").alias("rreversed"),
    )


@query(
    "sort_cols_per_row",
    oracle="""
WITH base AS (
    SELECT vec_id,
           unnest((embedding::DOUBLE[])[1:8]) AS x,
           generate_subscripts((embedding::DOUBLE[])[1:8], 1) - 1 AS pos
    FROM embeddings WHERE vec_id < 100
)
SELECT vec_id::BIGINT AS id,
       (row_number() OVER (PARTITION BY vec_id ORDER BY x, pos) - 1)::BIGINT AS rank,
       round(x, 6) AS x, pos::BIGINT AS pos
FROM base
""",
)
def q_sort_cols_per_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/col_wise_sort.cuh:33 — per-row sorted values + the
    permutation of original indices, as one narrow array_sort pass
    (no window, no shuffle: the sort happens inside each row)."""
    base = M.matrix_slice(embeddings_matrix(spark, sf_dir), 0, 99, 0, 8)
    srt = M.sort_cols_per_row(base)
    out = srt.select(
        "id",
        F.posexplode(F.arrays_zip(F.col("sorted_vals").alias("x"), F.col("perm").alias("pos"))).alias("rank", "e"),
    )
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("rank").cast("bigint").alias("rank"),
        F.round(F.col("e.x"), 6).alias("x"),
        F.col("e.pos").cast("bigint").alias("pos"),
    )


@query(
    "triangular_upper",
    oracle="""
SELECT l_orderkey::BIGINT AS row, l_partkey::BIGINT AS col,
       round(l_quantity, 6) AS value
FROM lineitem WHERE l_partkey >= l_orderkey
""",
)
def q_triangular_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/triangular.cuh:22 — upper-triangular extraction in long
    form; the col>=row predicate pushes into the parquet scan."""
    li = load(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("row"),
        F.col("l_partkey").alias("col"),
        F.col("l_quantity").cast("double").alias("value"),
    )
    out = M.triangular_upper(li)
    return out.select(
        F.col("row").cast("bigint").alias("row"),
        F.col("col").cast("bigint").alias("col"),
        F.round("value", 6).alias("value"),
    )


@query(
    "bitset_popc",
    oracle="""
SELECT count(*)::BIGINT AS n,
       count(*) FILTER (WHERE label % 3 = 0)::BIGINT AS popc_a,
       count(*) FILTER (WHERE label % 3 <> 0)::BIGINT AS popc_not_a,
       count(*) FILTER (WHERE label % 3 = 0 AND vec_id % 2 = 0)::BIGINT AS popc_and,
       count(*) FILTER (WHERE label % 3 = 0 OR vec_id % 2 = 0)::BIGINT AS popc_or,
       count(*) FILTER (WHERE (label % 3 = 0) <> (vec_id % 2 = 0))::BIGINT AS popc_xor,
       round(count(*) FILTER (WHERE label % 3 = 0) / count(*)::DOUBLE, 6) AS sparsity_a
FROM embeddings
""",
)
def q_bitset_popc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """core/bitset.hpp:368-406 test/flip/count + util/popc.cuh — bitset
    algebra as boolean-column aggregates (one partial-agg pass)."""
    e = load(spark, "embeddings", sf_dir)
    return M.bitset_stats(e, F.col("label") % 3 == 0, F.col("vec_id") % 2 == 0)


@query(
    "masked_matmul",
    oracle="""
WITH longe AS (
    SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings WHERE vec_id < 60
),
mask AS (
    SELECT (range // 60) AS i, (range % 60) AS j
    FROM range(0, 3600)
    WHERE ((range // 60) * 31 + (range % 60) * 17) % 23 = 0
)
SELECT m.i::BIGINT AS i, m.j::BIGINT AS j,
       round(sum(a.x * b.x), 6) AS value
FROM mask m
JOIN longe a ON a.vec_id = m.i
JOIN longe b ON b.vec_id = m.j AND b.pos = a.pos
GROUP BY 1, 2
""",
)
def q_masked_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/linalg/masked_matmul.cuh:47 — C=(A·Bᵀ)∘mask; the mask
    join prunes pairs before any dot product (O(nnz(mask)·d) work)."""
    ab = embeddings_matrix(spark, sf_dir).filter(F.col("id") < 60)
    mask = spark.range(3600).select(
        (F.col("id") / 60).cast("long").alias("i"),
        (F.col("id") % 60).alias("j"),
    ).filter((F.col("i") * 31 + F.col("j") * 17) % 23 == 0)
    out = M.masked_matmul(ab, ab, mask)
    return out.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round("value", 6).alias("value"),
    )


@query(
    "select_k_csr",
    oracle="""
WITH coo AS (
    SELECT l_orderkey AS row, l_partkey AS col, sum(l_quantity) AS value
    FROM lineitem GROUP BY 1, 2
),
ranked AS (
    SELECT row, col, value,
           row_number() OVER (PARTITION BY row ORDER BY value DESC, col) AS rank
    FROM coo
)
SELECT row::BIGINT AS row, col::BIGINT AS col,
       round(value, 6) AS value, rank::BIGINT AS rank
FROM ranked WHERE rank <= 3
""",
)
def q_select_k_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/matrix/select_k.cuh:64 — top-3 per row of a CSR (long
    form, deduped); same two-phase partial top-k as the dense path."""
    li = load(spark, "lineitem", sf_dir)
    coo = (
        li.groupBy(
            F.col("l_orderkey").alias("row"), F.col("l_partkey").alias("col")
        ).agg(F.sum(F.col("l_quantity").cast("double")).alias("value"))
    )
    out = select_k(coo, ["row"], "value", k=3, payload_cols=["col"])
    return out.select(
        F.col("row").cast("bigint").alias("row"),
        F.col("col").cast("bigint").alias("col"),
        F.round("value", 6).alias("value"),
        F.col("rank").cast("bigint").alias("rank"),
    )
