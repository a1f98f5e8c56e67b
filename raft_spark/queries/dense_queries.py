"""Dense row-vector operator queries (SURVEY.md §2.1–§2.3) over the
embeddings table, each with a DuckDB oracle.

Conventions: positions are 0-based bigint on both sides (DuckDB's
generate_subscripts is 1-based → minus 1); floats rounded to 6; the
features column is cast float→double on both sides before reductions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.functions import arrays as A
from raft_spark.operators import reductions as R
from raft_spark.operators.selectk import select_k_dense
from raft_spark.queries.registry import query
from raft_spark.sources.tables import embeddings_matrix, load

# Shared literal vector (64 dims): v_j = 0.01*j - 0.3, identical IEEE
# arithmetic in Spark and DuckDB.
DIM = 64
LIT_VEC_SQL = "list_transform(range(0, 64), j -> 0.01*j - 0.3)"


def _lit_vec():
    return F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), lambda j: 0.01 * j - 0.3)


# DuckDB long-form CTE over embeddings (0-based pos, double values).
SQL_LONG = """
long AS (
    SELECT vec_id, label,
           unnest(embedding::DOUBLE[]) AS x,
           generate_subscripts(embedding, 1) - 1 AS pos
    FROM embeddings
)
"""


@query(
    "row_norms",
    oracle="""
SELECT vec_id::BIGINT AS id,
       round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS l2,
       round(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS linf
FROM embeddings
""",
)
def q_row_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/norm.cuh:51 — L1/L2/Linf row norms in one pass."""
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        "id",
        F.round(A.row_norm("features", "l1"), 6).alias("l1"),
        F.round(A.row_norm("features", "l2"), 6).alias("l2"),
        F.round(A.row_norm("features", "linf"), 6).alias("linf"),
    )


@query(
    "row_normalize",
    oracle="""
SELECT vec_id::BIGINT AS id,
       list_transform(embedding::DOUBLE[],
           x -> round(x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y))), 6)
       ) AS features
FROM embeddings
""",
)
def q_row_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/normalize.cuh:48 — L2 row normalization (zero-shuffle)."""
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        "id",
        F.transform(A.normalize("features", "l2"), lambda x: F.round(x, 6)).alias("features"),
    )


@query(
    "col_moments",
    oracle="WITH "
    + SQL_LONG
    + """
SELECT pos::BIGINT AS pos,
       round(sum(x), 6) AS sum, round(avg(x), 6) AS mean,
       round(var_samp(x), 6) AS var, round(stddev_samp(x), 6) AS std,
       round(min(x), 6) AS min, round(max(x), 6) AS max
FROM long GROUP BY 1
""",
)
def q_col_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/{sum,mean,stddev,meanvar,minmax}.cuh — fused per-column
    moments; shuffle is partitions×64 rows after partial agg."""
    m = embeddings_matrix(spark, sf_dir)
    out = R.col_moments(m)
    return out.select(
        "pos",
        *[F.round(c, 6).alias(c) for c in ("sum", "mean", "var", "std", "min", "max")],
    )


@query(
    "col_weighted_mean",
    oracle="WITH "
    + SQL_LONG
    + """
SELECT pos::BIGINT AS pos,
       round(sum((label + 1.0) * x) / sum(label + 1.0), 6) AS wmean
FROM long GROUP BY 1
""",
)
def q_col_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/weighted_mean.cuh:43 — column weighted mean, w = label+1."""
    m = embeddings_matrix(spark, sf_dir).withColumn(
        "w", (F.col("label") + 1.0).cast("double")
    )
    return R.col_weighted_mean(m, "w").select("pos", F.round("wmean", 6).alias("wmean"))


@query(
    "mean_center",
    oracle="WITH "
    + SQL_LONG
    + """,
cm AS (SELECT pos, avg(x) AS m FROM long GROUP BY 1)
SELECT vec_id::BIGINT AS id,
       list(round(x - m, 6) ORDER BY pos) AS features
FROM long JOIN cm USING (pos)
GROUP BY 1
""",
)
def q_mean_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/mean_center.cuh:20 — broadcast the 1×64 means row back."""
    m = embeddings_matrix(spark, sf_dir)
    out = R.mean_center(m)
    return out.select(
        "id", F.transform("features", lambda x: F.round(x, 6)).alias("features")
    )


@query(
    "argminmax",
    oracle="""
SELECT vec_id::BIGINT AS id,
       (list_indexof(embedding::DOUBLE[], list_max(embedding::DOUBLE[])) - 1)::BIGINT AS amax,
       (list_indexof(embedding::DOUBLE[], list_min(embedding::DOUBLE[])) - 1)::BIGINT AS amin
FROM embeddings
""",
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/argmax.cuh:22, argmin.cuh:22 — first occurrence wins."""
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        "id",
        A.argmax("features").alias("amax"),
        A.argmin("features").alias("amin"),
    )


@query(
    "matvec_sub",
    oracle="WITH "
    + SQL_LONG
    + f"""
SELECT vec_id::BIGINT AS id,
       list(round(x - (0.01*pos - 0.3), 6) ORDER BY pos) AS features
FROM long GROUP BY 1
""",
)
def q_matvec_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/matrix_vector_op.cuh:24 — broadcast-subtract a vector."""
    m = embeddings_matrix(spark, sf_dir)
    out = m.select(
        "id", A.matrix_vector_op("features", _lit_vec(), lambda a, b: a - b).alias("_f")
    )
    return out.select("id", F.transform("_f", lambda x: F.round(x, 6)).alias("features"))


@query(
    "gemv",
    oracle=f"""
SELECT vec_id::BIGINT AS id,
       round(list_dot_product(embedding::DOUBLE[], {LIT_VEC_SQL}), 6) AS y
FROM embeddings
""",
)
def q_gemv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/gemv.cuh:44 — y = A·x with broadcast x (zero-shuffle)."""
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        "id", F.round(A.dot("features", _lit_vec()), 6).alias("y")
    )


@query(
    "row_mse",
    oracle=f"""
SELECT vec_id::BIGINT AS id,
       round(list_sum(list_transform(list_zip(embedding::DOUBLE[], {LIT_VEC_SQL}),
             p -> (p[1] - p[2]) * (p[1] - p[2]))) / 64, 6) AS mse
FROM embeddings
""",
)
def q_row_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/mean_squared_error.cuh:20 per row vs the literal vector."""
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        "id", F.round(A.mean_squared_error("features", _lit_vec()), 6).alias("mse")
    )


@query(
    "row_ratio_threshold",
    oracle="""
SELECT vec_id::BIGINT AS id,
       list_transform(embedding::DOUBLE[],
           x -> round(x / list_sum(embedding::DOUBLE[]), 6)) AS ratio,
       list_transform(embedding::DOUBLE[],
           x -> CASE WHEN abs(x) < 0.05 THEN 0.0 ELSE round(x, 6) END) AS thresholded
FROM embeddings
""",
)
def q_row_ratio_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/ratio.cuh:22 + matrix/threshold.cuh:22 per row."""
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        "id",
        F.transform(A.ratio("features"), lambda x: F.round(x, 6)).alias("ratio"),
        F.transform(
            A.threshold("features", 0.05), lambda x: F.round(x, 6)
        ).alias("thresholded"),
    )


@query(
    "select_k_dense",
    oracle="WITH "
    + SQL_LONG
    + """,
ranked AS (
    SELECT vec_id, pos, x,
           row_number() OVER (PARTITION BY vec_id ORDER BY x DESC, pos ASC) AS rank
    FROM long
)
SELECT vec_id::BIGINT AS id, pos::INTEGER AS idx, round(x, 6) AS value, rank::INTEGER AS rank
FROM ranked WHERE rank <= 3
""",
)
def q_select_k_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix/select_k.cuh:75 dense form — top-3 (value, idx) per row,
    computed as a zero-shuffle per-row sort+slice."""
    m = embeddings_matrix(spark, sf_dir)
    out = select_k_dense(m, k=3, ascending=False)
    return out.select("id", "idx", F.round("value", 6).alias("value"), "rank")


@query(
    "histogram_events",
    oracle="""
SELECT least(greatest(floor(value / 5.0), 0), 19)::BIGINT AS bin,
       count(*)::BIGINT AS count
FROM events GROUP BY 1
""",
)
def q_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/histogram.cuh:34 — 20 fixed-width bins over events.value."""
    ev = load(spark, "events", sf_dir)
    return R.histogram(ev, "value", 0.0, 100.0, 20)


@query(
    "reduce_rows_by_key",
    oracle="WITH "
    + SQL_LONG
    + """
SELECT label::BIGINT AS key, pos::BIGINT AS pos,
       round(sum(x), 6) AS sum,
       round(sum((label + 1.0) * x), 6) AS wsum
FROM long GROUP BY 1, 2
""",
)
def q_reduce_rows_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/reduce_rows_by_key.cuh:31 (+weighted :74) — k-means-update
    shaped grouped row-sum, long-form output."""
    m = embeddings_matrix(spark, sf_dir)
    long = m.select(
        F.col("label").cast("long").alias("key"),
        (F.col("label") + 1.0).alias("w"),
        F.posexplode("features").alias("pos", "x"),
    )
    return (
        long.groupBy("key", "pos")
        .agg(
            F.round(F.sum("x"), 6).alias("sum"),
            F.round(F.sum(F.col("w") * F.col("x")), 6).alias("wsum"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
    )


@query(
    "reduce_cols_by_key",
    oracle="WITH "
    + SQL_LONG
    + """
SELECT vec_id::BIGINT AS id, (pos % 8)::BIGINT AS key, round(sum(x), 6) AS sum
FROM long GROUP BY 1, 2
""",
)
def q_reduce_cols_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/reduce_cols_by_key.cuh:40 — col-key = pos % 8, computed as
    a per-row expression (zero shuffle)."""
    m = embeddings_matrix(spark, sf_dir)
    out = R.reduce_cols_by_key(m, [j % 8 for j in range(DIM)])
    return out.select("id", "key", F.round("sum", 6).alias("sum"))


@query(
    "covariance",
    # FULLY integer gate (round-4 fix for the 3-round hash-red row):
    # both engines half-up-quantize x to q = floor(x·1e6 + 0.5), sum q
    # and q_i·q_j EXACTLY (int64 partials / HUGEINT merge — order-free),
    # then emit cov_q = round_half_away( (n·Sxy − Sx·Sy) /
    # (n·(n−1)·1e6) ) computed with EXACT integer division on both
    # engines — round_half_away(a/b) = sign·((2|a| + b) // (2b)), using
    # truncating integer division (identical in Spark `div` / Python
    # `//`-on-abs / DuckDB `//`).  cov_q equals round(cov·1e6) of the
    # sample covariance; no floating-point op — and in particular no
    # engine round(double, n), whose HALF_UP-on-exact-expansion (Spark)
    # vs multiplier-based (DuckDB) implementations split boundary cells
    # — touches the output at all.
    oracle="WITH "
    + SQL_LONG
    + """,
q AS (SELECT vec_id, pos, CAST(floor(x * 1000000.0 + 0.5) AS HUGEINT) AS qx FROM long),
s AS (SELECT pos, sum(qx) AS sx, count(*) AS n FROM q GROUP BY 1),
g AS (SELECT a.pos AS i, b.pos AS j, sum(a.qx * b.qx) AS sxy
      FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
nd AS (SELECT g.i, g.j,
              sa.n * g.sxy - sa.sx * sb.sx AS num,
              sa.n * (sa.n - 1) * CAST(1000000 AS HUGEINT) AS den
       FROM g JOIN s sa ON sa.pos = g.i JOIN s sb ON sb.pos = g.j)
SELECT i::BIGINT AS i, j::BIGINT AS j,
       (CASE WHEN num < 0 THEN -((2 * (-num) + den) // (2 * den))
             ELSE (2 * num + den) // (2 * den) END)::BIGINT AS cov_q
FROM nd
""",
)
def q_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/cov.cuh:18 — 64×64 covariance via the distributed exact
    Gram pass (one mapInPandas int64 partial per partition, d² shuffle
    scalars merged as decimal(38,0)); the final d² rationals are
    rounded to integer-quantized bigints in arbitrary-precision Python
    int arithmetic (driver-scale: d²=4096 scalars)."""
    from raft_spark.operators.solvers import gram_matrix_exact

    m = embeddings_matrix(spark, sf_dir)
    g, sx, n = gram_matrix_exact(m, "features", scale=1e6)
    d = len(sx)
    den = n * (n - 1) * 1_000_000

    def half_away(num: int) -> int:
        a = -num if num < 0 else num
        r = (2 * a + den) // (2 * den)
        return -r if num < 0 else r

    rows = [
        (i, j, half_away(n * g[i][j] - sx[i] * sx[j]))
        for i in range(d)
        for j in range(d)
    ]
    return spark.createDataFrame(rows, "i long, j long, cov_q long")
