"""pairwise_distances vs numpy on the embeddings fixture: every metric,
symmetric self-product and rectangular cross-product, blocked-join plan
(no nested-loop broadcast)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators.similarity import pairwise_distances
from raft_spark.plans import audit_plan
from raft_spark.sources.tables import embeddings_matrix


@pytest.fixture(scope="module")
def xs(spark, sf_dir):
    df = embeddings_matrix(spark, sf_dir).select("id", "features")
    sub = df.filter(F.col("id") < 40).cache()
    rows = {r["id"]: np.array(r["features"]) for r in sub.collect()}
    yield sub, rows
    sub.unpersist()


def _np_metric(metric, u, v):
    if metric == "inner":
        return float(u @ v)
    if metric == "cosine":
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
    if metric == "sqeuclidean":
        return float(((u - v) ** 2).sum())
    if metric == "l2":
        return float(np.sqrt(((u - v) ** 2).sum()))
    if metric == "l1":
        return float(np.abs(u - v).sum())
    raise AssertionError(metric)


@pytest.mark.parametrize("metric", ["l2", "sqeuclidean", "l1", "cosine", "inner"])
def test_pairwise_self_matches_numpy(spark, xs, metric):
    sub, rows = xs
    got = {(r["a"], r["b"]): r["dist"] for r in pairwise_distances(sub, metric=metric).collect()}
    n = len(rows)
    assert len(got) == n * (n - 1) // 2
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            want = _np_metric(metric, rows[a], rows[b])
            assert got[(a, b)] == pytest.approx(want, abs=2e-6), (a, b, metric)


def test_pairwise_rectangular(spark, xs):
    sub, rows = xs
    left = sub.filter(F.col("id") < 10)
    got = {(r["a"], r["b"]): r["dist"]
           for r in pairwise_distances(left, sub, metric="l2").collect()}
    n_left = sum(1 for i in rows if i < 10)
    assert len(got) == n_left * len(rows)  # includes self-pairs (dist 0)
    for a in (i for i in rows if i < 10):
        assert got[(a, a)] == 0.0


def test_pairwise_plan_is_blocked(spark, xs):
    sub, _ = xs
    rep = audit_plan(pairwise_distances(sub, metric="l1"))
    assert "BroadcastNestedLoopJoin" not in rep.text
    assert "CartesianProduct" not in rep.text


def test_dbscan_matches_naive(spark):
    """DBSCAN composition vs a naive driver implementation on blobby
    2-D points: identical core/border/noise kinds and identical cluster
    partitions (labels compared up to renaming)."""
    import numpy as np

    from raft_spark.operators.similarity import dbscan

    rng = np.random.RandomState(7)
    pts = np.vstack([
        rng.normal((0, 0), 0.3, (30, 2)),
        rng.normal((5, 5), 0.3, (30, 2)),
        rng.normal((0, 5), 0.3, (5, 2)),     # small group (below min_pts reach)
        rng.uniform(-10, 10, (8, 2)),        # scattered noise
    ])
    n = len(pts)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], "id long, features array<double>"
    )
    eps, min_pts = 0.9, 4
    got = {r["id"]: (r["cluster"], r["kind"]) for r in dbscan(df, eps, min_pts).collect()}
    assert len(got) == n

    # naive reference
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(2) ** 0.5
    # mirror the operator's rounding of distances before thresholding
    d2 = np.sign(d2) * np.floor(np.abs(d2) * 1e6 + 0.5) / 1e6
    neigh = [set(np.nonzero((d2[i] <= eps))[0]) - {i} for i in range(n)]
    is_core = [len(neigh[i]) >= min_pts - 1 for i in range(n)]
    lab = [-1] * n
    for i in range(n):
        if is_core[i] and lab[i] == -1:
            stack, comp = [i], []
            seen = {i}
            while stack:
                u = stack.pop()
                comp.append(u)
                for v in neigh[u]:
                    if is_core[v] and v not in seen:
                        seen.add(v)
                        stack.append(v)
            m = min(comp)
            for u in comp:
                lab[u] = m
    kinds = []
    for i in range(n):
        if is_core[i]:
            kinds.append("core")
        elif any(is_core[v] for v in neigh[i]):
            kinds.append("border")
            lab[i] = min(lab[v] for v in neigh[i] if is_core[v])
        else:
            kinds.append("noise")

    for i in range(n):
        assert got[i][1] == kinds[i], (i, got[i], kinds[i])
        assert got[i][0] == lab[i], (i, got[i], lab[i])
