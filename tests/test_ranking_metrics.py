"""ranking_metrics vs a hand-computed numpy reference on a tiny fixed
case, plus structural properties on real kNN output."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators.stats import ranking_metrics


def test_ranking_metrics_hand_case(spark):
    # q1: hits at ranks 1 and 3 of k=3; q2: no hits
    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "qid long, nid long, rank long",
    )
    relevant = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 99)], "qid long, nid long"
    )
    k = 3
    row = ranking_metrics(ranked, relevant, k=k).collect()[0]
    # q1 precision 2/3, q2 0
    assert row["precision_at_k"] == pytest.approx((2 / 3 + 0) / 2)
    # q1 AP@3 = (1/1 + 2/3)/3; q2 0
    assert row["map_at_k"] == pytest.approx(((1 + 2 / 3) / 3) / 2)
    idcg = sum(1 / np.log2(i + 2) for i in range(k))
    dcg1 = 1 / np.log2(2) + 1 / np.log2(4)
    assert row["ndcg_at_k"] == pytest.approx((dcg1 / idcg) / 2)


def test_ranking_metrics_on_knn_output(spark, sf_dir):
    from raft_spark.operators.similarity import knn_brute
    from raft_spark.sources.tables import embeddings_matrix

    m = embeddings_matrix(spark, sf_dir).select("id", "features")
    queries = m.filter(F.col("id") % 40 == 0)
    out = knn_brute(m, queries, k=5)
    # self-relevance: exact top-5 as ground truth -> perfect scores
    row = ranking_metrics(out, out.select("qid", "nid"), k=5).collect()[0]
    assert row["precision_at_k"] == pytest.approx(1.0)
    assert row["map_at_k"] == pytest.approx(1.0)
    assert row["ndcg_at_k"] == pytest.approx(1.0)
