"""Cross-checks against MLlib's implementations (SURVEY §7 Phase 6:
"PCA/tSVD (MLlib cross-check)") — two independent engines must agree
on the same data."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import solvers as SV
from raft_spark.sources.tables import embeddings_matrix


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = embeddings_matrix(spark, sf_dir).cache()
    yield df
    # unpersist so later plan-audit tests see the parquet scan, not a
    # cache-substituted InMemoryRelation (which reads every column)
    df.unpersist()


def test_pca_matches_mllib(spark, emb):
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector

    k = 4
    _, ev, ratio, _ = SV.pca_fit(emb, n_components=k)

    vecs = emb.select(array_to_vector(F.col("features")).alias("features"))
    model = MLPCA(k=k, inputCol="features", outputCol="pc").fit(vecs)
    ml_ratio = np.array(model.explainedVariance.toArray())
    assert np.allclose(ratio, ml_ratio, rtol=1e-6)


def test_lstsq_matches_mllib_normal_solver(spark, emb):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    df = emb.select(
        F.element_at("features", 1).alias("x1"),
        F.element_at("features", 2).alias("x2"),
        (
            2.0 * F.element_at("features", 1)
            - 3.0 * F.element_at("features", 2)
            + F.element_at("features", 3) * 0.1
            + 1.0
        ).alias("y"),
    )
    w = SV.lstsq_normal(df, ["x1", "x2"], "y")

    assembled = VectorAssembler(inputCols=["x1", "x2"], outputCol="f").transform(df)
    lr = LinearRegression(featuresCol="f", labelCol="y", solver="normal", regParam=0.0)
    model = lr.fit(assembled)
    assert abs(w[0] - model.intercept) < 1e-6
    assert np.allclose(w[1:], np.array(model.coefficients.toArray()), atol=1e-6)


def test_kmeans_quality_vs_mllib(spark, emb):
    """Our Lloyd k-means must reach inertia within 15% of MLlib's
    KMeans on the same data/k (exact centroids differ by init), and
    every point must sit with its nearest centroid."""
    import numpy as np

    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    from raft_spark.operators.similarity import kmeans

    k = 4
    out, C, inertia = kmeans(emb, k=k, n_iters=10)
    rows = out.collect()
    X = {r["id"]: None for r in rows}
    feats = {r["id"]: np.array(r["features"]) for r in emb.collect()}
    for r in rows:
        d = ((feats[r["id"]] - C) ** 2).sum(1)
        assert r["cluster"] == int(d.argmin())
        assert abs(r["sq_dist"] - d.min()) < 1e-6

    ml = MLKMeans(k=k, seed=1, maxIter=10).fit(
        emb.select(array_to_vector("features").alias("features"))
    )
    ml_inertia = ml.summary.trainingCost
    assert inertia <= ml_inertia * 1.15, (inertia, ml_inertia)
