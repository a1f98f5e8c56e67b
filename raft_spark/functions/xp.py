"""CPU/GPU array-module seam (SURVEY §2.11; BASELINE `spark_approach`
optional GPU acceleration).

The engine's only dense-BLAS hot spots are the Arrow-batched partial
passes — gram_matrix / rsvd's zg_pass (solvers.py), the brute-force
kNN partial top-k and the IVF list assignment (similarity.py). Those
are exactly the bodies a GPU accelerates in the reference (cuBLAS
gemm under stats/cov.cuh, linalg/rsvd.cuh, select_k pipelines), so
the seam is one function: ``xp()`` returns cupy when the operator is
explicitly opted in via ``RAFT_SPARK_GPU=1`` AND cupy imports on the
worker, else numpy.

CPU (numpy) remains the SOURCE OF TRUTH: the correctness gates run
with the flag unset, and the GPU path is held to numpy's answers by
``tests/test_gpu_parity.py`` (skipped when no GPU is present). Only
the matmul/accumulate stage ever runs on the device — ordering,
tie-breaking and rounding always happen on the host in float64, so
engine-exact semantics (half-away rounding, total orders) are
identical on both paths.
"""

from __future__ import annotations

import os

import numpy as np


def xp():
    """Array module for partial-pass matmuls: cupy iff RAFT_SPARK_GPU=1
    and cupy is importable (checked per call — executors decide
    locally), else numpy."""
    if os.environ.get("RAFT_SPARK_GPU") == "1":
        try:
            import cupy  # noqa: F401

            return cupy
        except Exception:  # pragma: no cover - no GPU in CI
            return np
    return np


def to_np(a):
    """Bring an xp array back to host numpy (no-op for numpy)."""
    if hasattr(a, "get"):  # cupy ndarray
        return a.get()
    return np.asarray(a)
