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
