"""GPU-seam parity: with RAFT_SPARK_GPU=1 the cupy-backed partial
passes must reproduce the numpy source of truth bit-comparably at the
operators' documented rounding (SURVEY §2.11; raft_spark/functions/
xp.py). Skipped entirely when no GPU / cupy is present — CPU answers
are what the correctness gate checks either way."""

from __future__ import annotations

import os

import numpy as np
import pytest

cupy = pytest.importorskip("cupy")
try:  # pragma: no cover - only runs on GPU hosts
    cupy.cuda.runtime.getDeviceCount()
except Exception:  # pragma: no cover
    pytest.skip("cupy present but no usable GPU", allow_module_level=True)


@pytest.fixture()
def gpu_flag():
    os.environ["RAFT_SPARK_GPU"] = "1"
    yield
    os.environ.pop("RAFT_SPARK_GPU", None)


def test_xp_switches_on_flag(gpu_flag):
    from raft_spark.functions.xp import xp

    assert xp() is cupy
    os.environ.pop("RAFT_SPARK_GPU", None)
    assert xp() is np


def test_gram_matrix_parity(spark, gpu_flag):
    from raft_spark.operators.solvers import gram_matrix

    rng = np.random.default_rng(7)
    a = rng.standard_normal((200, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(len(a))],
        "id long, features array<double>",
    )
    g_gpu, s_gpu, n_gpu = gram_matrix(df)
    os.environ.pop("RAFT_SPARK_GPU", None)
    g_cpu, s_cpu, n_cpu = gram_matrix(df)
    assert n_gpu == n_cpu
    assert np.allclose(g_gpu, g_cpu, atol=1e-9)
    assert np.allclose(s_gpu, s_cpu, atol=1e-9)


def test_knn_parity(spark, gpu_flag):
    from raft_spark.operators.similarity import knn_brute

    rng = np.random.default_rng(11)
    a = rng.standard_normal((100, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(len(a))],
        "id long, features array<double>",
    )
    out_gpu = sorted(map(tuple, knn_brute(df, df.limit(5), k=3).collect()))
    os.environ.pop("RAFT_SPARK_GPU", None)
    out_cpu = sorted(map(tuple, knn_brute(df, df.limit(5), k=3).collect()))
    assert out_gpu == out_cpu  # identical after engine-exact rounding
