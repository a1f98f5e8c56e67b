"""IVF ANN vs brute force: the approximate index must stay in the
exact result's neighborhood (recall bound), and its k-means quantizer
must partition the corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from raft_spark.operators import similarity as SIM
from raft_spark.sources.tables import embeddings_matrix


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    df = embeddings_matrix(spark, sf_dir).select("id", "features").cache()
    yield df
    df.unpersist()


def test_kmeans_partitions_corpus(spark, corpus):
    cents = SIM.kmeans_centroids(corpus, k=4, n_iters=2)
    assert 2 <= len(cents) <= 4
    assigned = SIM.ivf_assign(corpus, cents)
    counts = {r["list_id"]: r["c"] for r in assigned.groupBy("list_id").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == corpus.count()
    assert len(counts) >= 2  # not everything in one cell


def test_ivf_recall_vs_brute(spark, corpus):
    queries = corpus.filter(F.col("id") % 40 == 0)
    exact = SIM.knn_brute(corpus, queries, k=5)
    approx = SIM.knn_ivf(corpus, queries, k=5, n_lists=4, n_probe=2, kmeans_iters=2)
    n_q = queries.count()
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (n_q * 5)
    # 2/4 cells probed: recall must beat random cell coverage by a wide margin
    assert recall >= 0.6, f"recall {recall}"
    # every query answered with k rows
    per_q = approx.groupBy("qid").count().agg(F.min("count")).collect()[0][0]
    assert per_q == 5


def test_knn_lsh_recall(spark, corpus):
    queries = corpus.filter(F.col("id") % 40 == 0)
    exact = SIM.knn_brute(corpus, queries, k=5)
    approx = SIM.knn_lsh(corpus, queries, k=5, n_planes=4)
    n_q = queries.count()
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    # 4 planes → 16 buckets: random-bucket baseline is 1/16 ≈ 0.06; for
    # this corpus true neighbors have cosine ≈ 0.3 (θ≈72°), so theory
    # predicts same-bucket ≈ (1-θ/π)^4 ≈ 0.13 — pin comfortably above
    # the random baseline, below the theoretical expectation
    assert hits / (n_q * 5) >= 0.1
    # all reported neighbors come from the corpus and beat nothing exact
    assert approx.filter(F.col("qid") == F.col("nid")).count() == 0


def test_knn_lsh_multiprobe_recall_monotone(spark, corpus):
    """Multi-table LSH (the documented multi-probe path): candidate
    sets are supersets as n_tables grows (per-table seeds are fixed),
    so recall@5 vs brute force must be non-decreasing in n_tables —
    and visibly better than one table by 4 tables."""
    queries = corpus.filter(F.col("id") % 40 == 0)
    exact = SIM.knn_brute(corpus, queries, k=5)
    n_q = queries.count()
    recalls = []
    for t in (1, 2, 4):
        approx = SIM.knn_lsh(corpus, queries, k=5, n_planes=4, n_tables=t)
        hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
        recalls.append(hits / (n_q * 5))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] > recalls[0]
    assert recalls[-1] >= 0.25, f"4-table recall {recalls[-1]}"


def test_lsh_buckets_multi_matches_per_table_banks(spark):
    """lsh_buckets_multi's stacked one-pass banks are BIT-IDENTICAL to
    calling lsh_buckets per table with seed+9973t — the contract that
    makes multi-table recall reproducible across the one-pass and
    single-table code paths (and across the inline-JVM vs numpy
    plane generators, which share the LCG)."""
    import numpy as np

    rng = np.random.default_rng(1)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    multi = {
        (r["id"], r["table"]): r["bucket"]
        for r in SIM.lsh_buckets_multi(df, n_planes=4, n_tables=3, seed=77).collect()
    }
    for t in range(3):
        single = {
            r["id"]: r["bucket"]
            for r in SIM.lsh_buckets(df, n_planes=4, seed=77 + 9973 * t).collect()
        }
        assert all(single[i] == multi[(i, t)] for i in single)


def test_nn_descent_graph_recall_and_determinism(spark):
    """NN-descent converges to the exact kNN graph on clustered data
    (recall ~1.0 in 3 rounds), holds a floor on structureless uniform
    data, and the seeded build is identical across partitionings."""
    import numpy as np

    from raft_spark.operators.similarity import knn_brute, nn_descent_graph

    rs = np.random.RandomState(4)
    cents = rs.randn(8, 32) * 3
    x = np.concatenate([c + rs.randn(40, 32) for c in cents])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, features array<double>",
    ).localCheckpoint(eager=True)
    exact = {
        (r["qid"], r["nid"]) for r in knn_brute(df, df, k=8).collect()
    }
    g1 = {
        (r["id"], r["nid"])
        for r in nn_descent_graph(df.repartition(3), k=8, n_iters=3).collect()
    }
    assert len(g1 & exact) / len(exact) >= 0.95
    g2 = {
        (r["id"], r["nid"])
        for r in nn_descent_graph(df.repartition(11), k=8, n_iters=3).collect()
    }
    assert g1 == g2  # seeded build, partitioning-invariant


def test_knn_ivf_distributed_fallback_beyond_collect_guard(spark, corpus, monkeypatch):
    """A query side past the Q<<N collect guard must degrade to the
    fully distributed probe path (assign + equi-join + JVM dot), not
    raise — and at full probe its neighbor set must match brute force
    (same quantization, candidate set = whole corpus)."""
    monkeypatch.setattr(SIM, "MAX_COLLECT_QUERIES", 10)
    queries = corpus.filter(F.col("id") % 4 == 0)  # far beyond 10
    out = SIM.knn_ivf(corpus, queries, k=3, n_lists=4, n_probe=4,
                      kmeans_iters=2)
    per_q = out.groupBy("qid").count().agg(F.min("count")).collect()[0][0]
    assert per_q == 3
    exact = {
        (r["qid"], r["nid"])
        for r in SIM.knn_brute(corpus, queries, k=3).collect()
    }
    got = {(r["qid"], r["nid"]) for r in out.collect()}
    # full probe scans every candidate; only 1e-6-quantization boundary
    # ties may differ from the BLAS brute path
    assert len(got & exact) / len(exact) >= 0.99


def test_eps_pairs_decimal_fallback_matches_int64(spark):
    """Inputs past the int64 overflow bound switch eps_pairs_exact to a
    decimal(38,0) accumulator; scaling the whole space by a constant
    must preserve the (scaled-eps) pair set, not corrupt it by
    wraparound."""
    import numpy as np

    from raft_spark.operators.similarity import eps_pairs_exact

    rs = np.random.RandomState(7)
    x = rs.randn(60, 8)
    small = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, features array<double>",
    )
    big = spark.createDataFrame(
        [(i, [float(v) * 1e4 for v in row]) for i, row in enumerate(x)],
        "id long, features array<double>",
    )
    want = {(r["a"], r["b"]) for r in eps_pairs_exact(small, eps=1.5).collect()}
    # |q|max ~ 4e10 > 2^30/sqrt(8): decimal path engages
    got = {(r["a"], r["b"]) for r in eps_pairs_exact(big, eps=1.5e4).collect()}
    assert got == want and len(want) > 0


def test_knn_graph_search_recall_and_round_monotone(spark, corpus):
    """Greedy beam walk over the nn_descent graph: recall@5 vs brute
    clears a floor far above the entry-point baseline, and is monotone
    in rounds (the frontier is unioned into its own expansion)."""
    queries = corpus.filter(F.col("id") % 40 == 0)
    n_q = queries.count()
    exact = SIM.knn_brute(corpus, queries, k=5)
    graph = SIM.nn_descent_graph(corpus, k=10).select("id", "nid") \
        .localCheckpoint(eager=True)
    recalls = []
    for rounds in (1, 3):
        approx = SIM.knn_graph_search(
            corpus, queries, graph=graph, k=5, beam=32, n_rounds=rounds
        )
        hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
        recalls.append(hits / (n_q * 5))
    assert recalls[1] >= recalls[0], f"not monotone: {recalls}"
    assert recalls[1] >= 0.5, f"3-round recall {recalls[1]}"
    per_q = (
        SIM.knn_graph_search(corpus, queries, graph=graph, k=5, beam=32)
        .groupBy("qid").count().agg(F.min("count")).collect()[0][0]
    )
    assert per_q == 5
