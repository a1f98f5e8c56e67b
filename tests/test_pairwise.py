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
