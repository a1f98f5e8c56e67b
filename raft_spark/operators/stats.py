"""Statistics / model-evaluation metrics (SURVEY.md §2.6).

Every metric reduces to groupBy counts + scalar algebra, exactly the
structure of the reference kernels:

- accuracy: ``stats/accuracy.cuh:20``
- regression metrics (MAE/MSE/median-AE): ``stats/regression_metrics.cuh:21``
- r2: ``stats/r2_score.cuh``
- contingency matrix: ``stats/contingency_matrix.cuh:23``
- entropy: ``stats/entropy.cuh:19``; mutual info: ``stats/mutual_info_score.cuh:20``
- homogeneity/completeness/v-measure: ``stats/homogeneity_score.cuh:20``,
  ``completeness_score.cuh:20``, ``v_measure.cuh:20``
- rand index / adjusted rand index: ``stats/rand_index.cuh:20``,
  ``stats/adjusted_rand_index.cuh:25``
- KL divergence: ``stats/kl_divergence.cuh:20``
- cluster dispersion: ``stats/dispersion.cuh:22``
- silhouette score: ``stats/silhouette_score.cuh:20`` (O(n²) pairwise —
  gate by sampling at scale, like the reference's batched variant)
- information criteria: ``stats/information_criterion.cuh:7``

Scale notes: all metrics are one or two map-side-combinable aggregates
over (truth, pred) or (label, features); the contingency table itself
is k×k (driver-scale). Silhouette is the only O(n²) op — at 100 TB it
must run on a sample (the reference's batched form chunks the same
crossJoin); the implementation takes the DataFrame it is given and
leaves sampling policy to the caller.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from raft_spark.functions import arrays as A


def accuracy(df: DataFrame, truth: str, pred: str) -> DataFrame:
    """Fraction of exact matches (stats/accuracy.cuh:20)."""
    return df.agg(
        F.avg((F.col(truth) == F.col(pred)).cast("double")).alias("accuracy")
    )


def regression_metrics(df: DataFrame, y: str, yhat: str) -> DataFrame:
    """MAE / MSE / median absolute error (stats/regression_metrics.cuh)."""
    err = F.col(y) - F.col(yhat)
    return df.agg(
        F.avg(F.abs(err)).alias("mae"),
        F.avg(err * err).alias("mse"),
        F.expr(f"percentile(abs({y} - {yhat}), 0.5)").alias("medae"),
    )


def r2_score(df: DataFrame, y: str, yhat: str) -> DataFrame:
    """R² (stats/r2_score.cuh): 1 - SSres/SStot in one pass (SStot via
    the variance identity Σ(y-ȳ)² = Σy² - (Σy)²/n)."""
    err = F.col(y) - F.col(yhat)
    return df.agg(
        (
            1.0
            - F.sum(err * err)
            / (F.sum(F.col(y) * F.col(y)) - F.pow(F.sum(y), 2) / F.count("*"))
        ).alias("r2")
    )


def contingency_matrix(df: DataFrame, truth: str, pred: str) -> DataFrame:
    """Label cross-tab (stats/contingency_matrix.cuh:23), long form."""
    return (
        df.groupBy(F.col(truth).cast("long").alias("truth"), F.col(pred).cast("long").alias("pred"))
        .agg(F.count("*").alias("n"))
    )


def _comb2(c: Column) -> Column:
    return c * (c - 1) / 2.0


def cluster_metrics(df: DataFrame, truth: str, pred: str) -> DataFrame:
    """All contingency-derived clustering metrics in one small plan:
    entropies, mutual information, homogeneity/completeness/v-measure,
    rand index, adjusted rand index. Natural log, sklearn conventions
    (matching the reference's definitions in stats/*.cuh).

    Physically: one shuffle to build the k×k contingency table, then
    three tiny aggregates + a 1-row join — everything after the first
    groupBy is driver-scale.
    """
    # ONE aggregation DAG over the k×k contingency table: row/col/total
    # sums attach as window aggregates (three trivial exchanges of a
    # k×k frame) and every metric reduces in a single global agg — no
    # cache, no separate count() job, no crossJoined sub-aggregates.
    # The marginal-only sums fold to cell level through Σ_j nij = ni:
    #   H(C)  = -Σ_i  ni/N·ln(ni/N)  = -Σ_cells nij/N·ln(ni/N)
    #   Σ_i C(ni,2) = Σ_cells nij·(ni−1)/2   (exact — integer halves)
    # so the fused plan computes the identical values (the comb2 sums
    # bit-identically; the entropy sums to f64 roundoff, ~1e-15, far
    # under the 1e-6 oracle rounding).
    ct = contingency_matrix(df, truth, pred)
    per = ct.select(
        F.col("n"),
        F.sum("n").over(Window.partitionBy("truth")).alias("ni"),
        F.sum("n").over(Window.partitionBy("pred")).alias("nj"),
        F.sum("n").over(Window.partitionBy()).alias("_N"),
    )
    nij, ni, nj = F.col("n"), F.col("ni"), F.col("nj")
    N = F.col("_N").cast("double")

    out = per.agg(
        F.sum(nij / N * F.log(N * nij / (ni * nj))).alias("mi"),
        # H(C|K) = -Σ nij/N ln(nij/nj);  H(K|C) = -Σ nij/N ln(nij/ni)
        (-F.sum(nij / N * F.log(nij / nj))).alias("h_c_given_k"),
        (-F.sum(nij / N * F.log(nij / ni))).alias("h_k_given_c"),
        F.sum(_comb2(nij)).alias("sum_cij"),
        (-F.sum(nij / N * F.log(ni / N))).alias("h_c"),
        F.sum(nij * (ni - 1) / 2.0).alias("sum_ci"),
        (-F.sum(nij / N * F.log(nj / N))).alias("h_k"),
        F.sum(nij * (nj - 1) / 2.0).alias("sum_cj"),
        F.first(N).alias("_Nd"),
    )

    homo = F.when(F.col("h_c") == 0, F.lit(1.0)).otherwise(
        1.0 - F.col("h_c_given_k") / F.col("h_c")
    )
    comp = F.when(F.col("h_k") == 0, F.lit(1.0)).otherwise(
        1.0 - F.col("h_k_given_c") / F.col("h_k")
    )
    cn2 = _comb2(F.col("_Nd"))
    expected = F.col("sum_ci") * F.col("sum_cj") / cn2
    return out.select(
        F.col("h_c").alias("entropy_truth"),
        F.col("h_k").alias("entropy_pred"),
        F.col("mi").alias("mutual_info"),
        homo.alias("homogeneity"),
        comp.alias("completeness"),
        (2 * homo * comp / (homo + comp)).alias("v_measure"),
        (
            (cn2 + 2 * F.col("sum_cij") - F.col("sum_ci") - F.col("sum_cj")) / cn2
        ).alias("rand_index"),
        (
            (F.col("sum_cij") - expected)
            / ((F.col("sum_ci") + F.col("sum_cj")) / 2.0 - expected)
        ).alias("adjusted_rand_index"),
    )


def kl_divergence(df: DataFrame, p_label: str, q_label: str) -> DataFrame:
    """KL(P‖Q) between the class distributions of two label columns
    (stats/kl_divergence.cuh:20). Classes present in P but absent in Q
    contribute +inf in theory; here inner-join (reference modifies 0
    terms to skip, detail/kl_divergence.cuh uses p*log(p/q) with q>0).
    """
    n = df.count()
    p = df.groupBy(F.col(p_label).alias("k")).agg((F.count("*") / n).alias("p"))
    q = df.groupBy(F.col(q_label).alias("k")).agg((F.count("*") / n).alias("q"))
    return p.join(q, "k").agg(
        F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))).alias("kl")
    )


def dispersion(df: DataFrame, label: str = "label", features: str = "features") -> DataFrame:
    """Cluster dispersion (stats/dispersion.cuh:22): Σ_c n_c·‖μ_c − μ‖²
    — the between-cluster scatter used by the elbow method. Returns
    (dispersion, n_clusters)."""
    long = df.select(F.col(label).alias("k"), F.posexplode(features).alias("pos", "x"))
    cl = long.groupBy("k", "pos").agg(F.sum("x").alias("s"), F.count("x").alias("nc"))
    glob = long.groupBy("pos").agg(F.avg("x").alias("g"))
    j = cl.join(glob, "pos")
    per_cluster = j.groupBy("k").agg(
        F.first("nc").alias("nc"),
        F.sum(F.pow(F.col("s") / F.col("nc") - F.col("g"), 2)).alias("sq"),
    )
    return per_cluster.agg(
        F.sum(F.col("nc") * F.col("sq")).alias("dispersion"),
        F.countDistinct("k").cast("long").alias("n_clusters"),
    )


def silhouette_score(
    df: DataFrame, id_col: str = "id", label: str = "label",
    features: str = "features", metric: str = "l2",
) -> DataFrame:
    """Mean silhouette coefficient (stats/silhouette_score.cuh:20 — the
    reference version is metric-templated; ``metric`` accepts any
    DISTANCE from the pairwise family, default Euclidean with the
    identical expression tree the gate has always hashed).

    O(n²) crossJoin — the caller samples first at scale (the
    reference's batched variant chunks the same computation,
    silhouette_score.cuh:74).
    """
    from raft_spark.operators.similarity import _METRICS, SYMMETRIC_DISTANCES

    if metric not in SYMMETRIC_DISTANCES:
        raise ValueError(
            f"silhouette needs a symmetric distance, not {metric!r}: "
            f"one of {sorted(SYMMETRIC_DISTANCES)}")
    a = df.select(
        F.col(id_col).alias("i"), F.col(label).alias("li"), F.col(features).alias("fi")
    )
    b = df.select(
        F.col(id_col).alias("j"), F.col(label).alias("lj"), F.col(features).alias("fj")
    )
    pairs = a.join(b, F.col("i") != F.col("j"))
    dist = _METRICS[metric]("fi", "fj")
    # mean distance from point i to every cluster lj
    to_cluster = pairs.groupBy("i", "li", "lj").agg(F.avg(dist).alias("d"))
    own = to_cluster.filter(F.col("li") == F.col("lj")).select("i", F.col("d").alias("a"))
    other = (
        to_cluster.filter(F.col("li") != F.col("lj"))
        .groupBy("i")
        .agg(F.min("d").alias("b"))
    )
    s = own.join(other, "i").select(
        ((F.col("b") - F.col("a")) / F.greatest("a", "b")).alias("s")
    )
    return s.agg(F.avg("s").alias("silhouette"))


def information_criterion(
    df: DataFrame, y: str, yhat: str, n_params: int
) -> DataFrame:
    """AIC / AICc / BIC from a Gaussian log-likelihood of the residuals
    (stats/information_criterion.cuh:7; types stats/stats_types.hpp:63)."""
    err = F.col(y) - F.col(yhat)
    base = df.agg(F.avg(err * err).alias("mse"), F.count("*").alias("n"))
    two_pi = 6.283185307179586
    llh = -F.col("n") / 2.0 * (F.log(F.lit(two_pi) * F.col("mse")) + 1.0)
    k = F.lit(float(n_params))
    aic = -2.0 * llh + 2.0 * k
    return base.select(
        aic.alias("aic"),
        (aic + 2.0 * k * (k + 1.0) / (F.col("n") - k - 1.0)).alias("aicc"),
        (-2.0 * llh + k * F.log(F.col("n"))).alias("bic"),
    )


def _pairwise_sims(a: DataFrame, features: str = "features") -> DataFrame:
    """All ordered pairs (i,j), i≠j, with cosine similarity — the
    pairwise kernel behind recall/trustworthiness. O(n²) shuffle by
    construction: gate by sampling before calling (the reference's
    batched silhouette takes the same chunked approach,
    stats/detail/silhouette_score.cuh)."""
    l = a.select(
        F.col("id").alias("i"),
        F.col(features).alias("_fa"),
    )
    r = a.select(F.col("id").alias("j"), F.col(features).alias("_fb"))
    dot = F.aggregate(
        F.zip_with("_fa", "_fb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    na = F.sqrt(F.aggregate(F.transform("_fa", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform("_fb", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return (
        l.crossJoin(r)
        .filter(F.col("i") != F.col("j"))
        .select("i", "j", (dot / (na * nb)).alias("sim"))
    )


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 5,
    q_col: str = "qid",
    item_col: str = "nid",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality metrics over a ranked result table (the ANN
    stack's evaluation companion; extends the reference's stats family
    the way neighborhood_recall does) → one row
    (precision_at_k, map_at_k, ndcg_at_k) averaged over queries.

    ``ranked``: (qid, nid, rank) — e.g. knn_* output; ``relevant``:
    (qid, nid) ground-truth pairs. Binary relevance; ideal DCG assumes
    ≥k relevant items exist per query (standard NDCG@k convention —
    callers with fewer should pass their own k). Shape: one broadcast-
    able join + per-query aggregation + global mean — no per-item
    state beyond the top-k rows themselves.
    """
    r = ranked.filter(F.col(rank_col) <= k).select(
        F.col(q_col).alias("_q"), F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_r"),
    )
    rel = relevant.select(
        F.col(q_col).alias("_q"), F.col(item_col).alias("_i"), F.lit(1).alias("_hit")
    )
    j = r.join(rel, ["_q", "_i"], "left").select(
        "_q", "_r", F.coalesce("_hit", F.lit(0)).alias("_hit")
    )
    log2 = float(np.log(2.0))
    # per-query: precision, AP@k (precision at each hit rank / k-cap),
    # DCG; ideal DCG = sum over first k ranks
    idcg = float(sum(1.0 / (np.log(i + 2.0) / log2) for i in range(k)))
    w = Window.partitionBy("_q").orderBy("_r")
    per_q = (
        j.withColumn("_cumhits", F.sum("_hit").over(w))
        .groupBy("_q")
        .agg(
            (F.sum("_hit") / k).alias("_prec"),
            (F.sum(F.col("_hit") * F.col("_cumhits") / F.col("_r")) / k).alias("_ap"),
            (
                F.sum(F.col("_hit") / (F.log(F.col("_r") + 1.0) / F.lit(log2)))
                / F.lit(idcg)
            ).alias("_ndcg"),
        )
    )
    return per_q.agg(
        F.avg("_prec").alias("precision_at_k"),
        F.avg("_ap").alias("map_at_k"),
        F.avg("_ndcg").alias("ndcg_at_k"),
    )


def neighborhood_recall(
    truth_topk: DataFrame, pred_topk: DataFrame, n: int, k: int
) -> DataFrame:
    """stats/neighborhood_recall.cuh:31 — fraction of (query, neighbor)
    pairs in the predicted top-k that appear in the true top-k:
    |pred ∩ truth| / (n·k). A join + one count."""
    hits = pred_topk.join(truth_topk, ["i", "j"], "left_semi").count()
    spark = truth_topk.sparkSession
    return spark.createDataFrame(
        [(round(hits / (n * k), 6),)], "recall double"
    )


def trustworthiness_score(
    orig: DataFrame, emb: DataFrame, k: int, features: str = "features"
) -> DataFrame:
    """stats/trustworthiness_score.cuh:19 — rank-penalty score of an
    embedding: T = 1 - 2/(n·k·(2n-3k-1)) · Σ_{j∈kNN_emb(i)\\kNN_orig(i)}
    (rank_orig(i,j) - k).

    Both rank tables come from the pairwise-similarity windows; the
    penalty is one join + aggregate. Distance = 1 - cosine here (the
    metric is a template parameter in the reference too).
    """
    n = orig.count()
    w = Window.partitionBy("i").orderBy(F.desc("sim"), F.asc("j"))
    r_orig = _pairwise_sims(orig, features).select(
        "i", "j", F.row_number().over(w).alias("rank_orig")
    )
    nn_emb = (
        _pairwise_sims(emb, features)
        .select("i", "j", F.row_number().over(w).alias("rank_emb"))
        .filter(F.col("rank_emb") <= k)
    )
    penalty = (
        nn_emb.join(r_orig, ["i", "j"])
        .filter(F.col("rank_orig") > k)
        .agg(F.coalesce(F.sum(F.col("rank_orig") - k), F.lit(0)).alias("p"))
        .collect()[0]["p"]
    )
    t = 1.0 - (2.0 / (n * k * (2.0 * n - 3.0 * k - 1.0))) * float(penalty)
    spark = orig.sparkSession
    return spark.createDataFrame([(round(t, 6),)], "trustworthiness double")
