"""Full pairwise metric family vs independent numpy formulas, plus the
exact-refine operator (the cuVS ``neighbors::refine`` contract:
re-ranking the full candidate set under the exact metric must reproduce
the brute-force ranking, and refining a lossy shortlist must never
lower its recall)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import similarity as SIM

N, D = 12, 8


def _np_metric(m, x, y, p=None):
    if m == "l1":
        return np.sum(np.abs(x - y))
    if m == "l2":
        return np.sqrt(np.sum((x - y) ** 2))
    if m == "sqeuclidean":
        return np.sum((x - y) ** 2)
    if m == "chebyshev":
        return np.max(np.abs(x - y))
    if m == "canberra":
        den = np.abs(x) + np.abs(y)
        return np.sum(np.where(den > 0, np.abs(x - y) / np.where(den > 0, den, 1), 0))
    if m == "braycurtis":
        return np.sum(np.abs(x - y)) / np.sum(np.abs(x + y))
    if m == "hamming":
        return np.mean(x != y)
    if m == "jaccard":
        d = np.dot(x, y)
        return 1 - d / (np.dot(x, x) + np.dot(y, y) - d)
    if m == "hellinger":
        return np.sqrt(max(0.0, 1 - np.sum(np.sqrt(x * y))))
    if m == "kl_divergence":
        return np.sum(np.where(x > 0, x * np.log(np.where(x > 0, x, 1) / y), 0))
    if m == "jensenshannon":
        mid = (x + y) / 2
        t = np.where(x > 0, x * np.log(np.where(x > 0, x, 1) / mid), 0) + np.where(
            y > 0, y * np.log(np.where(y > 0, y, 1) / mid), 0
        )
        return np.sqrt(max(0.0, 0.5 * np.sum(t)))
    if m == "correlation":
        xc, yc = x - x.mean(), y - y.mean()
        return 1 - np.dot(xc, yc) / np.sqrt(np.dot(xc, xc) * np.dot(yc, yc))
    if m == "minkowski":
        return np.sum(np.abs(x - y) ** p) ** (1.0 / p)
    if m == "russellrao":
        n = len(x)
        return (n - np.sum((x != 0) & (y != 0))) / n
    if m == "dice":
        ctt = np.sum((x != 0) & (y != 0))
        return 1 - 2 * ctt / (np.sum(x != 0) + np.sum(y != 0))
    if m == "cosine":
        return np.dot(x, y) / np.sqrt(np.dot(x, x) * np.dot(y, y))
    if m == "inner":
        return np.dot(x, y)
    raise KeyError(m)


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(42)
    # nonneg + bounded away from 0: one matrix satisfies every metric's
    # contract (hellinger/js/kl need nonneg, kl needs y>0, correlation
    # needs non-constant)
    return np.abs(rng.normal(size=(N, D))) + 0.1


@pytest.fixture(scope="module")
def vdf(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(N)],
        "id long, features array<double>",
    ).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def bvecs():
    rng = np.random.default_rng(43)
    b = (rng.random((N, D)) > 0.5).astype(float)
    b[0] = 1.0  # no all-zero rows (dice/jaccard denominators)
    return b


@pytest.fixture(scope="module")
def bdf(spark, bvecs):
    df = spark.createDataFrame(
        [(i, [float(v) for v in bvecs[i]]) for i in range(N)],
        "id long, features array<double>",
    ).cache()
    yield df
    df.unpersist()


ALL_METRICS = [
    "l1", "l2", "sqeuclidean", "chebyshev", "canberra", "braycurtis",
    "hamming", "jaccard", "hellinger", "kl_divergence", "jensenshannon",
    "correlation", "cosine", "inner",
]


@pytest.mark.parametrize("metric", ALL_METRICS)
def test_pairwise_matches_numpy(spark, vdf, vecs, metric):
    got = {(r["a"], r["b"]): r["dist"]
           for r in SIM.pairwise_distances(vdf, metric=metric).collect()}
    assert len(got) == N * (N - 1) // 2
    for (a, b), v in got.items():
        exp = round(float(_np_metric(metric, vecs[a], vecs[b])), 6)
        assert abs(v - exp) <= 2e-6, (metric, a, b, v, exp)


def test_pairwise_minkowski(spark, vdf, vecs):
    got = {(r["a"], r["b"]): r["dist"]
           for r in SIM.pairwise_distances(vdf, metric="minkowski", p=3.0).collect()}
    for (a, b), v in got.items():
        exp = round(float(_np_metric("minkowski", vecs[a], vecs[b], p=3.0)), 6)
        assert abs(v - exp) <= 2e-6


@pytest.mark.parametrize("metric", ["russellrao", "dice"])
def test_pairwise_binary_metrics(spark, bdf, bvecs, metric):
    got = {(r["a"], r["b"]): r["dist"]
           for r in SIM.pairwise_distances(bdf, metric=metric).collect()}
    for (a, b), v in got.items():
        exp = round(float(_np_metric(metric, bvecs[a], bvecs[b])), 6)
        assert abs(v - exp) <= 2e-6


def test_asymmetric_kl_is_id_oriented(spark, vdf, vecs):
    """KL(a‖b) must be measured min-id → max-id regardless of which
    block-join orientation produced the pair."""
    got = {(r["a"], r["b"]): r["dist"]
           for r in SIM.pairwise_distances(vdf, metric="kl_divergence").collect()}
    for (a, b), v in got.items():
        assert a < b
        exp = round(float(_np_metric("kl_divergence", vecs[a], vecs[b])), 6)
        assert abs(v - exp) <= 2e-6


def test_unknown_metric_raises(spark, vdf):
    with pytest.raises(ValueError, match="unknown metric"):
        SIM.pairwise_distances(vdf, metric="nope")
    with pytest.raises(ValueError, match="requires p"):
        SIM.pairwise_distances(vdf, metric="minkowski")


# ---------------------------------------------------------------------------
# knn_refine — exact re-rank of a candidate shortlist
# ---------------------------------------------------------------------------


def test_refine_full_candidates_equals_brute(spark, vdf):
    """Refining the COMPLETE candidate set under cosine is brute force."""
    queries = vdf.filter(F.col("id") < 4)
    exact = SIM.knn_brute(vdf, queries, k=3)
    cands = queries.select(F.col("id").alias("qid")).crossJoin(
        vdf.select(F.col("id").alias("nid"))
    )
    ref = SIM.knn_refine(cands, vdf, queries, k=3, metric="cosine")
    e = {(r["qid"], r["nid"], r["rank"]) for r in exact.collect()}
    g = {(r["qid"], r["nid"], r["rank"]) for r in ref.collect()}
    assert e == g


def test_refine_never_lowers_shortlist_recall(spark, vdf):
    """Refine(top-3 of a 6-wide LSH-ish shortlist) ⊇-recall the raw
    shortlist's head: the exact re-rank can only promote true
    neighbors within the candidates."""
    queries = vdf.filter(F.col("id") < 4)
    exact = SIM.knn_brute(vdf, queries, k=3)
    # lossy shortlist: l1-ranked 6-wide candidates (a DIFFERENT metric,
    # so its head ordering is wrong for cosine)
    short = SIM.knn_refine(
        queries.select(F.col("id").alias("qid")).crossJoin(
            vdf.select(F.col("id").alias("nid"))),
        vdf, queries, k=6, metric="l1",
    )
    head = short.filter(F.col("rank") <= 3)
    refined = SIM.knn_refine(short.select("qid", "nid"), vdf, queries,
                             k=3, metric="cosine")
    hits_head = head.join(exact, ["qid", "nid"], "left_semi").count()
    hits_ref = refined.join(exact, ["qid", "nid"], "left_semi").count()
    assert hits_ref >= hits_head
    # refined output is k rows per query, ranked 1..k
    per_q = refined.groupBy("qid").count().collect()
    assert all(r["count"] == 3 for r in per_q)


def test_refine_distance_metric_orders_ascending(spark, vdf, vecs):
    queries = vdf.filter(F.col("id") == 0)
    cands = queries.select(F.col("id").alias("qid")).crossJoin(
        vdf.select(F.col("id").alias("nid"))
    )
    ref = SIM.knn_refine(cands, vdf, queries, k=5, metric="l2").collect()
    dists = [r["dist"] for r in sorted(ref, key=lambda r: r["rank"])]
    assert dists == sorted(dists)
    # rank-1 is the true nearest non-self row under l2
    d = np.sqrt(((vecs[1:] - vecs[0]) ** 2).sum(axis=1))
    assert ref[0]["nid"] == int(np.argmin(d)) + 1 or dists[0] == round(
        float(d.min()), 6
    )


def test_pairwise_haversine(spark):
    """Great-circle distance on [lat, lon] radian pairs vs the numpy
    haversine formula."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-np.pi / 2, np.pi / 2, 8)
    lon = rng.uniform(-np.pi, np.pi, 8)
    P = np.stack([lat, lon], axis=1)
    df = spark.createDataFrame(
        [(i, [float(lat[i]), float(lon[i])]) for i in range(8)],
        "id long, features array<double>",
    )
    got = {(r["a"], r["b"]): r["dist"]
           for r in SIM.pairwise_distances(df, metric="haversine").collect()}
    assert len(got) == 28
    for (a, b), v in got.items():
        dphi, dlmb = lat[a] - lat[b], lon[a] - lon[b]
        h = np.sin(dphi / 2) ** 2 + np.cos(lat[a]) * np.cos(lat[b]) * np.sin(dlmb / 2) ** 2
        exp = round(float(2 * np.arcsin(np.sqrt(h))), 6)
        assert abs(v - exp) <= 2e-6, (a, b, v, exp)


def test_knn_metric_l2_matches_numpy(spark, vdf, vecs):
    """knn_metric under l2: per-query ranking equals the numpy
    distance sort (ascending, self excluded)."""
    queries = vdf.filter(F.col("id") < 3)
    got = SIM.knn_metric(vdf, queries, k=4, metric="l2").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["nid"], r["dist"]))
    for q, rows in by_q.items():
        rows.sort()
        d = np.sqrt(((vecs - vecs[q]) ** 2).sum(axis=1))
        order = [int(i) for i in np.argsort(d, kind="stable") if i != q][:4]
        assert [nid for _, nid, _ in rows] == order
        dists = [dd for _, _, dd in rows]
        assert dists == sorted(dists)


def test_knn_metric_cosine_matches_brute(spark, vdf):
    """knn_metric(metric='cosine') reproduces knn_brute's neighbor sets
    (same rounding, same tie-break)."""
    queries = vdf.filter(F.col("id") < 3)
    a = {(r["qid"], r["nid"], r["rank"])
         for r in SIM.knn_metric(vdf, queries, k=3, metric="cosine").collect()}
    b = {(r["qid"], r["nid"], r["rank"])
         for r in SIM.knn_brute(vdf, queries, k=3).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# knn_ivf_metric — metric-general IVF
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bigger(spark):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(300, 12))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(300)],
        "id long, features array<double>",
    ).cache()
    yield df
    df.unpersist()


def test_ivf_metric_full_probe_equals_exact(spark, bigger):
    """n_probe = n_lists ⇒ identical to knn_metric (rounding and
    tie-break included)."""
    queries = bigger.filter(F.col("id") % 60 == 0)
    a = {(r["qid"], r["nid"], r["rank"]) for r in SIM.knn_ivf_metric(
        bigger, queries, k=4, metric="l1", n_lists=4, n_probe=4,
        kmeans_iters=2).collect()}
    b = {(r["qid"], r["nid"], r["rank"]) for r in SIM.knn_metric(
        bigger, queries, k=4, metric="l1").collect()}
    assert a == b


def test_ivf_metric_l2_recall_floor(spark, bigger):
    queries = bigger.filter(F.col("id") % 30 == 0)
    exact = SIM.knn_metric(bigger, queries, k=5, metric="l2")
    approx = SIM.knn_ivf_metric(bigger, queries, k=5, metric="l2",
                                n_lists=4, n_probe=2, kmeans_iters=3)
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (queries.count() * 5)
    assert recall >= 0.6, f"recall {recall}"


def test_ivf_metric_balanced_path_runs(spark, bigger):
    queries = bigger.filter(F.col("id") % 100 == 0)
    out = SIM.knn_ivf_metric(bigger, queries, k=3, metric="chebyshev",
                             n_lists=4, n_probe=4, kmeans_iters=2,
                             balanced=True)
    rows = out.collect()
    assert {r["qid"] for r in rows} == {0, 100, 200}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["dist"])
    for q, ds in per_q.items():
        assert len(ds) == 3 and sorted(ds) == ds


def test_silhouette_metric_param(spark):
    """Metric-templated silhouette (the reference template arg): l1
    scores differ from l2 but both match a numpy re-derivation."""
    rng = np.random.default_rng(21)
    X = np.vstack([rng.normal(0, 0.3, (10, 4)),
                   rng.normal(4, 0.3, (10, 4))])
    lab = [0] * 10 + [1] * 10
    df = spark.createDataFrame(
        [(i, lab[i], [float(v) for v in X[i]]) for i in range(20)],
        "id long, label int, features array<double>",
    )
    from raft_spark.operators.stats import silhouette_score

    def np_sil(metricf):
        import itertools
        D = np.zeros((20, 20))
        for i, j in itertools.product(range(20), range(20)):
            if i != j:
                D[i, j] = metricf(X[i], X[j])
        s = []
        for i in range(20):
            own = [j for j in range(20) if j != i and lab[j] == lab[i]]
            oth = [j for j in range(20) if lab[j] != lab[i]]
            a = D[i, own].mean(); bb = D[i, oth].mean()
            s.append((bb - a) / max(a, bb))
        return float(np.mean(s))

    got_l2 = silhouette_score(df).first()["silhouette"]
    got_l1 = silhouette_score(df, metric="l1").first()["silhouette"]
    exp_l2 = np_sil(lambda x, y: np.sqrt(((x - y) ** 2).sum()))
    exp_l1 = np_sil(lambda x, y: np.abs(x - y).sum())
    assert abs(got_l2 - exp_l2) < 1e-6
    assert abs(got_l1 - exp_l1) < 1e-6
    assert abs(got_l1 - got_l2) > 1e-3  # genuinely different metric

    with pytest.raises(ValueError, match="needs a symmetric distance"):
        silhouette_score(df, metric="cosine")


def test_dbscan_chebyshev(spark, vdf, vecs):
    """DBSCAN under any distance of the family: chebyshev neighborhoods
    equal a naive numpy re-derivation of the pair set."""
    from raft_spark.operators.similarity import dbscan

    out = dbscan(vdf, eps=0.8, min_pts=2, metric="chebyshev").collect()
    got = {r["id"]: r["cluster"] for r in out}
    # naive: chebyshev eps-graph, connected components over core edges
    n = len(vecs)
    adj = {
        (a, b)
        for a in range(n) for b in range(a + 1, n)
        if np.max(np.abs(vecs[a] - vecs[b])) <= 0.8 + 1e-9
    }
    deg = {i: 0 for i in range(n)}
    for a, b in adj:
        deg[a] += 1; deg[b] += 1
    core = {i for i in range(n) if deg[i] >= 1}  # min_pts=2 → ≥1 neighbor
    # noise points (no core adjacency) must be -1 in the engine output
    for i in range(n):
        if i not in core and not any(
            (min(i, j), max(i, j)) in adj and j in core for j in range(n)
        ):
            assert got[i] == -1, (i, got[i])
    # any two cores joined by an edge share a cluster
    for a, b in adj:
        if a in core and b in core:
            assert got[a] == got[b]


def test_pairwise_group_cols(spark, vecs):
    """group_cols: only within-group pairs, values identical to the
    ungrouped computation restricted to the group."""
    lab = [i % 3 for i in range(N)]
    df = spark.createDataFrame(
        [(i, lab[i], [float(v) for v in vecs[i]]) for i in range(N)],
        "id long, lang int, features array<double>",
    )
    got = SIM.pairwise_distances(df, metric="l2",
                                 group_cols=["lang"]).collect()
    pairs = {(r["a"], r["b"]): (r["lang"], r["dist"]) for r in got}
    expected = {(a, b) for a in range(N) for b in range(a + 1, N)
                if lab[a] == lab[b]}
    assert set(pairs) == expected
    for (a, b), (g, v) in pairs.items():
        assert g == lab[a] == lab[b]
        exp = round(float(np.sqrt(((vecs[a] - vecs[b]) ** 2).sum())), 6)
        assert abs(v - exp) <= 2e-6


def test_pairwise_group_cols_reserved_names_and_nulls(spark, vecs):
    """r10 (ADVICE): group names colliding with the output columns are
    rejected; NULL group keys form ONE group (struct equality is
    null-safe), documented rather than silently dropped."""
    import pytest

    df = spark.createDataFrame(
        [(i, None if i < 4 else i % 2, [float(v) for v in vecs[i]])
         for i in range(8)],
        "id long, b int, features array<double>",
    )
    with pytest.raises(ValueError, match="group_cols"):
        SIM.pairwise_distances(df, metric="l2", group_cols=["b"])
    got = SIM.pairwise_distances(
        df.withColumnRenamed("b", "grp"), metric="l2", group_cols=["grp"]
    ).collect()
    null_pairs = {(r["a"], r["b"]) for r in got if r["grp"] is None}
    assert null_pairs == {(a, b) for a in range(4) for b in range(a + 1, 4)}
