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
