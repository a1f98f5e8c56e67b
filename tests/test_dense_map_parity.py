"""dense_map_suite ↔ operator parity.

The round-4 gate rewrite made dense_map_suite a pure integer-quantized
query (cross-engine hash determinism), which means the gate no longer
routes through the float-path operators themselves. This test restores
the "broken operator reddens CI" property: every suite member's
vq/1e6 must agree with the corresponding user-API operator output
(A.normalize, R.mean_center, R.standardize, A.ratio, A.threshold,
A.quantize_int8, A.dequantize_int8, A.matrix_vector_op) to within the
input-quantization error bound. Tolerances are the propagated bound of
the ≤5e-7 input quantization through each op plus the 5e-7 output
quantization, with ~4× margin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from raft_spark.functions import arrays as A
from raft_spark.operators import reductions as R
from raft_spark.queries import dense_queries as DQ
from raft_spark.queries.suites import q_dense_map_suite
from raft_spark.sources.tables import embeddings_matrix


# quant_i8's vq IS the int8 code (unscaled); every other member's vq is
# the value half-up-quantized at 1e-6.
_SCALE = {"quant_i8": 1.0}


@pytest.fixture(scope="module")
def suite_vals(spark, sf_dir):
    rows = q_dense_map_suite(spark, sf_dir).collect()
    out: dict[str, dict[tuple[int, int], float]] = {}
    for r in rows:
        s = _SCALE.get(r["op"], 1e6)
        out.setdefault(r["op"], {})[(r["id"], r["pos"])] = r["vq"] / s
    return out


def _op_vals(frame, col="features"):
    vals = {}
    for r in frame.select("id", F.posexplode(col).alias("pos", "x")).collect():
        vals[(r["id"], r["pos"])] = r["x"]
    return vals


MEMBERS = [
    ("normalize", lambda m: m.select("id", A.normalize("features", "l2").alias("features")), 2e-6),
    ("center", lambda m: R.mean_center(m), 2e-6),
    ("matvec_sub", lambda m: m.select(
        "id", A.matrix_vector_op("features", DQ._lit_vec(), lambda a, b: a - b).alias("features")
    ), 2e-6),
    # ratio divides by the row SUM, whose 64·5e-7 quantization error is
    # amplified by 1/|rs| on rows whose elements nearly cancel — checked
    # with the analytic per-row bound below, not a flat tolerance.
    ("ratio", lambda m: m.select("id", A.ratio("features").alias("features")), None),
    ("threshold", lambda m: m.select("id", A.threshold("features", 0.05).alias("features")), 2e-6),
    # exact-integer vs float rounding of |x|/mx·127 can differ by one
    # code at boundaries.
    ("quant_i8", lambda m: m.select("id", A.quantize_int8("features").alias("features")), 1.0 + 1e-9),
    # one int8 code back-scales to mx/127 ≈ 5e-3.
    ("dequant_i8", lambda m: m.select("id", A.dequantize_int8("features").alias("features")), 6e-3),
    ("standardize", lambda m: R.standardize(m), 5e-5),
]


@pytest.mark.parametrize("member,builder,tol", MEMBERS, ids=[m[0] for m in MEMBERS])
def test_suite_member_matches_operator(spark, sf_dir, suite_vals, member, builder, tol):
    m = embeddings_matrix(spark, sf_dir)
    op_vals = _op_vals(builder(m))
    sv = suite_vals[member]
    assert set(sv) == set(op_vals)
    if tol is None:  # ratio: per-row analytic bound ε·(1 + 64·|op|)/|rs|
        rs = {
            r["id"]: r["rs"]
            for r in m.select(
                "id", F.aggregate("features", F.lit(0.0), lambda a, x: a + x).alias("rs")
            ).collect()
        }
        eps = 5e-7
        for (i, p), v in sv.items():
            bound = 4 * (eps * (1 + 64 * abs(op_vals[(i, p)])) / abs(rs[i]) + eps)
            assert abs(v - op_vals[(i, p)]) <= bound, (
                f"{member}: row {i} pos {p} diff "
                f"{abs(v - op_vals[(i, p)])} > bound {bound}"
            )
        return
    worst = max(abs(sv[k] - op_vals[k]) for k in sv)
    assert worst <= tol, f"{member}: max |suite - operator| = {worst}"
