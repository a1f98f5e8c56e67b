"""kmeans_balanced: size-penalized Lloyd must produce materially more
even cluster sizes than plain Lloyd on skewed data, without destroying
cluster quality, and must leave the unbalanced path bit-identical."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import similarity as SIM

K = 8


@pytest.fixture(scope="module")
def skewed(spark):
    """One tight heavy natural cluster + K−1 light far clusters — the
    hot-list shape that wrecks IVF probe cost when each natural
    cluster gets one centroid."""
    rng = np.random.default_rng(11)
    parts = [rng.normal(0, 0.05, size=(790, 16))]
    for j in range(K - 1):
        center = np.zeros(16)
        center[j] = 10.0 * (j + 1)
        parts.append(rng.normal(0, 0.05, size=(30, 16)) + center)
    X = np.vstack(parts)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "id long, features array<double>",
    ).cache()
    yield df, X
    df.unpersist()


def _ratio(assign_df):
    s = assign_df.groupBy("cluster").count().agg(
        F.max("count").alias("mx"), F.avg("count").alias("av")
    ).first()
    return float(s["mx"]) / float(s["av"])


def _diverse_init(X):
    """One centroid per natural cluster (the k-means++-style diverse
    init both paths start from — identical, so the comparison isolates
    the balance penalty)."""
    idx = [0] + [790 + 30 * j for j in range(K - 1)]
    return X[idx]


def test_balanced_beats_plain_on_skew(spark, skewed):
    df, X = skewed
    init = _diverse_init(X)
    # plain Lloyd from the diverse init: the heavy natural cluster
    # keeps ONE list → max/avg ≈ K·0.79
    plain_cents = SIM.kmeans_centroids(df, k=K, n_iters=8, init_cents=init)
    plain = SIM._assign_lists(
        df.select("id", "features"), plain_cents, "features",
        list_col="cluster", dist_col="sq_dist",
    )
    plain_ratio = _ratio(plain)
    assert plain_ratio > 3.0, f"fixture lost its skew ({plain_ratio})"
    bal, cents, bal_ratio = SIM.kmeans_balanced(
        df, k=K, n_iters=8, init_cents=init
    )
    # the penalty must claw back a material share of the hot list
    assert bal_ratio <= 0.6 * plain_ratio, (bal_ratio, plain_ratio)
    # still a clustering, not a random partition: every point assigned,
    # true (unweighted) inertia within a sane factor of plain Lloyd's
    assert bal.count() == df.count()
    # balance is bought with quality BY DESIGN (a teleported center
    # abandons its small cluster) — but it must still be a clustering:
    # far below the single-centroid inertia of the same data
    mean_vec = X.mean(axis=0)
    k1_inertia = float(((X - mean_vec) ** 2).sum())
    bal_inertia = bal.agg(F.sum("sq_dist")).first()[0]
    assert bal_inertia < 0.5 * k1_inertia
    assert cents.shape == (K, 16)


def test_balanced_sq_dist_is_geometric(spark, skewed):
    """sq_dist must be the TRUE squared distance to the assigned
    centroid (penalty affects selection only)."""
    df, _ = skewed
    bal, cents, _r = SIM.kmeans_balanced(df, k=K, n_iters=4)
    rows = bal.orderBy("id").limit(20).collect()
    X = {r["id"]: r for r in
         df.filter(F.col("id") < 40).collect()}
    for r in rows:
        x = np.array(X[r["id"]]["features"])
        d2 = float(((x - cents[r["cluster"]]) ** 2).sum())
        assert abs(r["sq_dist"] - d2) < 1e-6


def test_power_zero_path_unchanged(spark, skewed):
    """balance_power=0 must reproduce plain kmeans_centroids exactly
    (the unweighted argmin branch is untouched)."""
    df, _ = skewed
    c1 = SIM.kmeans_centroids(df, k=K, n_iters=3)
    c2, w = SIM.kmeans_centroids(df, k=K, n_iters=3,
                                 balance_power=0.0, return_weights=True)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(w, np.ones(K))


def test_weighted_assign_reports_true_distance(spark, skewed):
    """_assign_lists with weights: selection may move, dist stays d²."""
    df, _ = skewed
    cents = SIM.kmeans_centroids(df, k=4, n_iters=2)
    w = np.array([4.0, 1.0, 1.0, 1.0])
    out = SIM._assign_lists(
        df.select("id", "features"), cents, "features",
        list_col="cluster", dist_col="sq_dist", weights=w,
    ).limit(10).collect()
    C = np.asarray(cents, dtype=float)
    src = {r["id"]: np.array(r["features"])
           for r in df.limit(2000).collect()}
    for r in out:
        d2 = float(((src[r["id"]] - C[r["cluster"]]) ** 2).sum())
        assert abs(r["sq_dist"] - d2) < 1e-6


@pytest.fixture(scope="module")
def angular(spark):
    """Unit-sphere hot-spot corpus (knn_ivf quantizes in normalized
    space): 790 vectors in one tight cone + 7 spread cones of 30."""
    rng = np.random.default_rng(17)

    def cone(axis, n, jitter):
        v = axis[None, :] + rng.normal(0, jitter, size=(n, 16))
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    hot = np.zeros(16); hot[0] = 1.0
    parts = [cone(hot, 790, 0.02)]
    for j in range(7):
        ax = np.zeros(16); ax[j + 1] = 1.0
        parts.append(cone(ax, 30, 0.02))
    X = np.vstack(parts)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "id long, features array<double>",
    ).cache()
    yield df, X
    df.unpersist()


def test_balanced_ivf_evens_lists_and_keeps_recall(spark, angular):
    df, X = angular
    init = X[[0] + [790 + 30 * j for j in range(7)]]
    plain_c = SIM.kmeans_centroids(df, k=K, n_iters=6, init_cents=init)
    bal_c = SIM.balanced_centroids(df, k=K, n_iters=6, init_cents=init)

    def ratio_of(cents):
        a = SIM.ivf_assign(df.select("id", "features"), cents)
        s = a.groupBy("list_id").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("av")).first()
        return float(s["mx"]) / float(s["av"])

    r_plain, r_bal = ratio_of(plain_c), ratio_of(bal_c)
    assert r_plain > 3.0, f"fixture lost its skew ({r_plain})"
    assert r_bal <= 0.6 * r_plain, (r_bal, r_plain)

    # recall floor: the balanced index must still answer (hot queries
    # land in split cells whose union is the old hot cell)
    queries = df.filter(F.col("id") % 100 == 0)
    exact = SIM.knn_brute(df, queries, k=5)
    approx = SIM.knn_ivf(df, queries, k=5, n_lists=K, n_probe=3,
                         kmeans_iters=6, balanced=True)
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (queries.count() * 5)
    assert recall >= 0.6, f"recall {recall}"


def test_balanced_ivf_pq_index_builds(spark, angular):
    df, _ = angular
    idx = SIM.build_ivf_pq_index(df, n_lists=4, m_subspaces=4,
                                 n_codes=8, balanced=True)
    assert idx["centroids"].shape == (4, 16)
    assert idx["codes"].count() == df.count()
