"""Model-evaluation / statistics metric queries (SURVEY.md §2.6).

Truth labels come from the data (embeddings.label); predictions are
derived deterministically via the shared LCG RNG so the DuckDB oracle
can recompute them bit-identically (no randomness crosses the engine
boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.functions import rng
from raft_spark.operators import stats as S
from raft_spark.queries._sqlutil import sql_uniform_int, sql_uniform_range
from raft_spark.queries.registry import query
from raft_spark.sources.tables import embeddings_matrix, load

# ---- shared prediction framings -------------------------------------------

PRED_SEED = 7
REG_SEED = 11

SQL_CLS = f"""
cls AS (
    SELECT label::BIGINT AS truth,
           {sql_uniform_int('vec_id', 0, 10, PRED_SEED)} AS pred
    FROM embeddings
)
"""

SQL_REG = f"""
reg AS (
    SELECT value AS y,
           {sql_uniform_range('event_id', 0.0, 100.0, REG_SEED)} AS yhat
    FROM events
)
"""


def _cls_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = embeddings_matrix(spark, sf_dir)
    return m.select(
        F.col("label").cast("long").alias("truth"),
        rng.uniform_int("id", 0, 10, seed=PRED_SEED).alias("pred"),
        "features",
        F.col("id"),
    )


def _reg_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ev.select(
        F.col("value").alias("y"),
        rng.uniform_range("event_id", 0.0, 100.0, seed=REG_SEED).alias("yhat"),
    )


# ---- queries ---------------------------------------------------------------


@query(
    "accuracy",
    oracle="WITH " + SQL_CLS + """
SELECT round(avg(CASE WHEN truth = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy FROM cls
""",
)
def q_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/accuracy.cuh:20."""
    out = S.accuracy(_cls_df(spark, sf_dir), "truth", "pred")
    return out.select(F.round("accuracy", 6).alias("accuracy"))


@query(
    "regression_metrics",
    oracle="WITH " + SQL_REG + """
SELECT round(avg(abs(y - yhat)), 6) AS mae,
       round(avg((y - yhat) * (y - yhat)), 6) AS mse,
       round(quantile_cont(abs(y - yhat), 0.5), 6) AS medae
FROM reg
""",
)
def q_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/regression_metrics.cuh:21 — MAE, MSE, exact median AE."""
    out = S.regression_metrics(_reg_df(spark, sf_dir), "y", "yhat")
    return out.select(
        F.round("mae", 6).alias("mae"),
        F.round("mse", 6).alias("mse"),
        F.round("medae", 6).alias("medae"),
    )


@query(
    "r2_score",
    oracle="WITH " + SQL_REG + """
SELECT round(1.0 - sum((y - yhat) * (y - yhat))
           / (sum(y * y) - sum(y) * sum(y) / count(*)), 6) AS r2
FROM reg
""",
)
def q_r2_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/r2_score.cuh — one-pass variance identity."""
    out = S.r2_score(_reg_df(spark, sf_dir), "y", "yhat")
    return out.select(F.round("r2", 6).alias("r2"))


@query(
    "contingency_matrix",
    oracle="WITH " + SQL_CLS + """
SELECT truth, pred, count(*)::BIGINT AS n FROM cls GROUP BY 1, 2
""",
)
def q_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/contingency_matrix.cuh:23 — long-form cross-tab."""
    return S.contingency_matrix(_cls_df(spark, sf_dir), "truth", "pred")


@query(
    "cluster_metrics",
    oracle="WITH " + SQL_CLS + """,
ct AS (SELECT truth, pred, count(*)::DOUBLE AS n FROM cls GROUP BY 1, 2),
rm AS (SELECT truth, sum(n) AS ni FROM ct GROUP BY 1),
cm AS (SELECT pred, sum(n) AS nj FROM ct GROUP BY 1),
tot AS (SELECT sum(n) AS ntot FROM ct),
core AS (
    SELECT sum(n / ntot * ln(ntot * n / (ni * nj))) AS mi,
           -sum(n / ntot * ln(n / nj)) AS h_c_given_k,
           -sum(n / ntot * ln(n / ni)) AS h_k_given_c,
           sum(n * (n - 1) / 2.0) AS sum_cij
    FROM ct JOIN rm USING (truth) JOIN cm USING (pred) CROSS JOIN tot
),
hc AS (SELECT -sum(ni / ntot * ln(ni / ntot)) AS h_c, sum(ni * (ni - 1) / 2.0) AS sum_ci
       FROM rm CROSS JOIN tot),
hk AS (SELECT -sum(nj / ntot * ln(nj / ntot)) AS h_k, sum(nj * (nj - 1) / 2.0) AS sum_cj
       FROM cm CROSS JOIN tot),
fin AS (
    SELECT h_c, h_k, mi, sum_cij, sum_ci, sum_cj,
           CASE WHEN h_c = 0 THEN 1.0 ELSE 1.0 - h_c_given_k / h_c END AS homo,
           CASE WHEN h_k = 0 THEN 1.0 ELSE 1.0 - h_k_given_c / h_k END AS comp,
           ntot * (ntot - 1) / 2.0 AS cn2
    FROM core CROSS JOIN hc CROSS JOIN hk CROSS JOIN tot
)
SELECT round(h_c, 6) AS entropy_truth,
       round(h_k, 6) AS entropy_pred,
       round(mi, 6) AS mutual_info,
       round(homo, 6) AS homogeneity,
       round(comp, 6) AS completeness,
       round(2 * homo * comp / (homo + comp), 6) AS v_measure,
       round((cn2 + 2 * sum_cij - sum_ci - sum_cj) / cn2, 6) AS rand_index,
       round((sum_cij - sum_ci * sum_cj / cn2)
           / ((sum_ci + sum_cj) / 2.0 - sum_ci * sum_cj / cn2), 6) AS adjusted_rand_index
FROM fin
""",
)
def q_cluster_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entropy / mutual_info / homogeneity / completeness / v_measure /
    rand_index / ARI (stats/*.cuh) — all from one contingency table."""
    out = S.cluster_metrics(_cls_df(spark, sf_dir), "truth", "pred")
    return out.select(*[F.round(c, 6).alias(c) for c in out.columns])


@query(
    "kl_divergence",
    oracle="WITH " + SQL_CLS + """,
tot AS (SELECT count(*)::DOUBLE AS n FROM cls),
p AS (SELECT truth AS k, count(*) / n AS p FROM cls CROSS JOIN tot GROUP BY 1, n),
q AS (SELECT pred AS k, count(*) / n AS q FROM cls CROSS JOIN tot GROUP BY 1, n)
SELECT round(sum(p.p * ln(p.p / q.q)), 6) AS kl FROM p JOIN q USING (k)
""",
)
def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/kl_divergence.cuh:20 — KL between truth and pred class
    distributions."""
    out = S.kl_divergence(_cls_df(spark, sf_dir), "truth", "pred")
    return out.select(F.round("kl", 6).alias("kl"))


@query(
    "dispersion",
    oracle="""
WITH long AS (
    SELECT label AS k, unnest(embedding::DOUBLE[]) AS x,
           generate_subscripts(embedding, 1) - 1 AS pos
    FROM embeddings
),
cl AS (SELECT k, pos, sum(x) AS s, count(*) AS nc FROM long GROUP BY 1, 2),
gm AS (SELECT pos, avg(x) AS g FROM long GROUP BY 1),
per AS (
    SELECT k, any_value(nc) AS nc, sum(pow(s / nc - g, 2)) AS sq
    FROM cl JOIN gm USING (pos) GROUP BY k
)
SELECT round(sum(nc * sq), 6) AS dispersion,
       count(DISTINCT k)::BIGINT AS n_clusters
FROM per
""",
)
def q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/dispersion.cuh:22 — between-cluster scatter Σ n_c‖μ_c−μ‖²."""
    m = embeddings_matrix(spark, sf_dir)
    out = S.dispersion(m, "label", "features")
    return out.select(
        F.round("dispersion", 6).alias("dispersion"), F.col("n_clusters")
    )


@query(
    "silhouette",
    oracle="""
WITH pts AS (SELECT vec_id AS i, label AS li, embedding::DOUBLE[] AS f FROM embeddings),
pairs AS (
    SELECT a.i, a.li, b.li AS lj, list_distance(a.f, b.f) AS d
    FROM pts a JOIN pts b ON a.i <> b.i
),
tocl AS (SELECT i, li, lj, avg(d) AS d FROM pairs GROUP BY 1, 2, 3),
own AS (SELECT i, d AS a FROM tocl WHERE li = lj),
oth AS (SELECT i, min(d) AS b FROM tocl WHERE li <> lj GROUP BY 1)
SELECT round(avg((b - a) / greatest(a, b)), 6) AS silhouette
FROM own JOIN oth USING (i)
""",
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/silhouette_score.cuh:20 — O(n²) pairwise; sampled at scale."""
    m = embeddings_matrix(spark, sf_dir)
    out = S.silhouette_score(m, "id", "label", "features")
    return out.select(F.round("silhouette", 6).alias("silhouette"))


@query(
    "information_criterion",
    oracle="WITH " + SQL_REG + """,
base AS (SELECT avg((y - yhat) * (y - yhat)) AS mse, count(*)::DOUBLE AS n FROM reg),
llh AS (SELECT n, mse, -n / 2.0 * (ln(2 * 3.141592653589793 * mse) + 1.0) AS l FROM base)
SELECT round(-2.0 * l + 2.0 * 3, 6) AS aic,
       round(-2.0 * l + 2.0 * 3 + 2.0 * 3 * 4 / (n - 4), 6) AS aicc,
       round(-2.0 * l + 3 * ln(n), 6) AS bic
FROM llh
""",
)
def q_information_criterion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/information_criterion.cuh:7 — AIC/AICc/BIC, k=3 params."""
    out = S.information_criterion(_reg_df(spark, sf_dir), "y", "yhat", n_params=3)
    return out.select(
        F.round("aic", 6).alias("aic"),
        F.round("aicc", 6).alias("aicc"),
        F.round("bic", 6).alias("bic"),
    )


# ---- neighborhood metrics (SURVEY §2.6 tail) -------------------------------

_SQL_PAIR_SIMS = """
v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS f FROM embeddings WHERE vec_id < {n}),
l AS (SELECT id, unnest(f) AS x, generate_subscripts(f, 1) AS pos FROM v),
l16 AS (SELECT id, x, pos FROM l WHERE pos <= 16),
nrm AS (SELECT id, sqrt(sum(x*x)) AS n FROM l GROUP BY 1),
nrm16 AS (SELECT id, sqrt(sum(x*x)) AS n FROM l16 GROUP BY 1),
sim_full AS (
    SELECT a.id AS i, b.id AS j, sum(a.x*b.x) / (na.n * nb.n) AS sim
    FROM l a JOIN l b ON a.pos = b.pos AND a.id <> b.id
    JOIN nrm na ON na.id = a.id JOIN nrm nb ON nb.id = b.id
    GROUP BY 1, 2, na.n, nb.n
),
sim_16 AS (
    SELECT a.id AS i, b.id AS j, sum(a.x*b.x) / (na.n * nb.n) AS sim
    FROM l16 a JOIN l16 b ON a.pos = b.pos AND a.id <> b.id
    JOIN nrm16 na ON na.id = a.id JOIN nrm16 nb ON nb.id = b.id
    GROUP BY 1, 2, na.n, nb.n
)
"""


@query(
    "neighborhood_recall",
    oracle=f"""
WITH {_SQL_PAIR_SIMS.format(n=80)},
truth AS (
    SELECT i, j FROM (
        SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rk
        FROM sim_full) WHERE rk <= 5
),
pred AS (
    SELECT i, j FROM (
        SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rk
        FROM sim_16) WHERE rk <= 5
)
SELECT round(count(*) / (80 * 5.0), 6) AS recall
FROM pred JOIN truth USING (i, j)
""",
)
def q_neighborhood_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/neighborhood_recall.cuh:31 — recall@5 of the 16-dim-
    projection ANN against the exact 64-dim cosine top-5 (n=80)."""
    from pyspark.sql.window import Window

    base = embeddings_matrix(spark, sf_dir).filter(F.col("id") < 80)
    emb16 = base.select("id", F.slice("features", 1, 16).alias("features"))
    w = Window.partitionBy("i").orderBy(F.desc("sim"), F.asc("j"))
    truth = (
        S._pairwise_sims(base)
        .select("i", "j", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .select("i", "j")
    )
    pred = (
        S._pairwise_sims(emb16)
        .select("i", "j", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .select("i", "j")
    )
    return S.neighborhood_recall(truth, pred, n=80, k=5)


@query(
    "trustworthiness",
    oracle=f"""
WITH {_SQL_PAIR_SIMS.format(n=60)},
r_orig AS (
    SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rank_orig
    FROM sim_full
),
nn_emb AS (
    SELECT i, j FROM (
        SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) AS rank_emb
        FROM sim_16) WHERE rank_emb <= 5
),
pen AS (
    SELECT coalesce(sum(rank_orig - 5), 0) AS p
    FROM nn_emb JOIN r_orig USING (i, j) WHERE rank_orig > 5
)
SELECT round(1.0 - (2.0 / (60 * 5.0 * (2.0*60 - 3.0*5 - 1))) * p, 6) AS trustworthiness
FROM pen
""",
)
def q_trustworthiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats/trustworthiness_score.cuh:19 — rank-penalty quality of the
    16-dim projection as an embedding of the 64-dim data (n=60, k=5)."""
    base = embeddings_matrix(spark, sf_dir).filter(F.col("id") < 60)
    emb16 = base.select("id", F.slice("features", 1, 16).alias("features"))
    return S.trustworthiness_score(base, emb16, k=5)
