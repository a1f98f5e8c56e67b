"""Single-linkage agglomerative clustering (similarity.single_linkage).

Adjudicated against an INDEPENDENT naive implementation: an O(n³)
agglomerative merge loop over the full distance matrix (repeatedly fuse
the two clusters with the smallest single-link distance) — not the
MST formulation the engine uses, so agreement checks the Gower–Ross
identity itself, not a shared code path.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import similarity as SIM


def naive_single_linkage(X: np.ndarray, k: int):
    """Textbook agglomerative loop → (partition: list[set], heights)."""
    n = len(X)
    dm = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    clusters: list[set[int]] = [{i} for i in range(n)]
    heights: list[float] = []
    while len(clusters) > k:
        best = None
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = min(dm[a, b] for a in clusters[i] for b in clusters[j])
                if best is None or d < best[0]:
                    best = (d, i, j)
        d, i, j = best
        heights.append(d)
        clusters[i] |= clusters[j]
        del clusters[j]
    return clusters, heights


def _frame(spark, X):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows, "id long, features array<double>")


def _partition(rows) -> set[frozenset[int]]:
    by_label: dict[int, set[int]] = {}
    for r in rows:
        by_label.setdefault(r["cluster"], set()).add(r["id"])
    return {frozenset(s) for s in by_label.values()}


@pytest.fixture(scope="module")
def blob_data():
    rng = np.random.default_rng(77)
    # three well-separated blobs + a few stragglers: nontrivial merges
    # at several scales, distances generic (no ties)
    X = np.concatenate(
        [
            rng.normal(0.0, 0.3, (18, 3)),
            rng.normal(4.0, 0.3, (16, 3)),
            rng.normal((0.0, 6.0, 0.0), 0.3, (12, 3)),
            rng.uniform(-2, 8, (4, 3)),
        ]
    )
    return X


@pytest.mark.parametrize("k", [2, 3, 5, 9])
def test_fixed_k_matches_naive_agglomerative(spark, blob_data, k):
    df = _frame(spark, blob_data)
    out = SIM.single_linkage(df, n_clusters=k).collect()
    got = _partition(out)
    want, _ = naive_single_linkage(blob_data, k)
    assert got == {frozenset(s) for s in want}
    # label = smallest member id
    for r in out:
        members = next(s for s in got if r["id"] in s)
        assert r["cluster"] == min(members)


def test_threshold_mode_matches_numpy_union_find(spark, blob_data):
    t = 1.1
    df = _frame(spark, blob_data)
    out = SIM.single_linkage(df, distance_threshold=t).collect()
    # independent reference: union-find over the SAME int64-quantized
    # predicate eps_pairs_exact applies (q = floor(x·1e6 + .5))
    q = np.floor(blob_data * 1e6 + 0.5).astype(np.int64)
    tq = round(t * 1e6)
    parent = list(range(len(q)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            if int(((q[i] - q[j]) ** 2).sum()) <= tq * tq:
                parent[find(i)] = find(j)
    want: dict[int, set[int]] = {}
    for i in range(len(q)):
        want.setdefault(find(i), set()).add(i)
    assert _partition(out) == {frozenset(s) for s in want.values()}


def test_dendrogram_heights_match_naive_merge_heights(spark, blob_data):
    df = _frame(spark, blob_data)
    dend = SIM.single_linkage_dendrogram(df).collect()
    _, heights = naive_single_linkage(blob_data, 1)
    got = sorted(r["height"] for r in dend)
    assert len(got) == len(blob_data) - 1
    # pairwise_distances emits round(dist, 6) (the gate convention)
    np.testing.assert_allclose(got, sorted(heights), atol=1.1e-6)
    # merge_order is the (height, row, col) global rank: 1..n-1, and
    # heights are non-decreasing along it
    orders = sorted(r["merge_order"] for r in dend)
    assert orders == list(range(1, len(blob_data)))
    by_order = sorted(dend, key=lambda r: r["merge_order"])
    hs = [r["height"] for r in by_order]
    assert all(a <= b for a, b in zip(hs, hs[1:]))


def test_partitioning_invariance(spark, blob_data):
    df = _frame(spark, blob_data)
    a = sorted(
        (r["id"], r["cluster"])
        for r in SIM.single_linkage(df, n_clusters=4).collect()
    )
    b = sorted(
        (r["id"], r["cluster"])
        for r in SIM.single_linkage(df.repartition(7), n_clusters=4).collect()
    )
    assert a == b


def test_precomputed_weighted_pairs_seam(spark, blob_data):
    df = _frame(spark, blob_data)
    pairs = SIM.pairwise_distances(df, metric="l2")
    via_pairs = sorted(
        (r["id"], r["cluster"])
        for r in SIM.single_linkage(df, n_clusters=3, pairs=pairs).collect()
    )
    direct = sorted(
        (r["id"], r["cluster"])
        for r in SIM.single_linkage(df, n_clusters=3).collect()
    )
    assert via_pairs == direct


def test_argument_validation(spark, blob_data):
    df = _frame(spark, blob_data)
    with pytest.raises(ValueError, match="exactly one"):
        SIM.single_linkage(df)
    with pytest.raises(ValueError, match="exactly one"):
        SIM.single_linkage(df, n_clusters=2, distance_threshold=1.0)
    with pytest.raises(ValueError, match="not a symmetric distance"):
        SIM.single_linkage(df, n_clusters=2, metric="cosine")
    # unreachable k: pairs graph with two components cannot make 1 cut
    # below its component count
    pairs = spark.createDataFrame(
        [(0, 1, 0.5), (2, 3, 0.5)], "a long, b long, dist double"
    )
    four = _frame(spark, blob_data[:4])
    with pytest.raises(ValueError, match="unreachable"):
        SIM.single_linkage(four, n_clusters=1, pairs=pairs)
    # ... but k == component count works without any cut
    out = SIM.single_linkage(four, n_clusters=2, pairs=pairs).collect()
    assert _partition(out) == {frozenset({0, 1}), frozenset({2, 3})}


def test_mst_strategies_identical_with_ties(spark):
    # Kruskal (driver) and Borůvka (distributed) compare edges by the
    # same refined total order (value, row, col); an MST is unique
    # under a strict total order, so the trees must be IDENTICAL —
    # weights drawn from a tiny set force heavy ties on purpose
    from raft_spark.operators.solvers import mst_edges_auto

    rng = np.random.default_rng(5)
    n = 30
    rows = []
    seen = set()
    while len(rows) < 180:
        a, b = rng.integers(0, n, 2)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        rows.append((int(min(a, b)), int(max(a, b)), float(rng.integers(1, 5))))
    coo = spark.createDataFrame(rows, "row long, col long, value double")
    driver = sorted(
        (r["row"], r["col"], r["value"])
        for r in mst_edges_auto(coo).collect()
    )
    dist = sorted(
        (r["row"], r["col"], r["value"])
        for r in mst_edges_auto(coo, driver_threshold=0).collect()
    )
    assert driver == dist
    # tree invariants: |E| = |V| - components, spans every node
    nodes = {x for r in rows for x in r[:2]}
    got_nodes = {x for e in driver for x in e[:2]}
    assert got_nodes <= nodes


def test_isolated_nodes_keep_own_id(spark, blob_data):
    # threshold so small nothing pairs: every point its own cluster
    df = _frame(spark, blob_data[:10])
    out = SIM.single_linkage(df, distance_threshold=1e-9).collect()
    assert all(r["cluster"] == r["id"] for r in out)
