"""Element-wise and per-row (coalesced) ops on ``array<T>`` columns.

This is the Spark rendering of RAFT's dense ``linalg``/``matrix``
element-wise layer — every function returns a Column expression so the
whole thing stays inside whole-stage codegen (no Python in the hot
path). Reference semantics:

- map / unary_op / binary_op / ternary_op
  (``cpp/include/raft/linalg/map.cuh:54``, ``unary_op.cuh:44``,
  ``binary_op.cuh:51``, ``ternary_op.cuh:50``)
- add/subtract/multiply/divide/power/sqrt (+ scalar variants)
  (``cpp/include/raft/linalg/add.cuh:27-159`` etc.)
- divide-check-zero semantics: 0 when denominator is 0
  (``cpp/include/raft/core/operators.hpp:146`` ``div_checkzero_op``)
- per-row reduce with main_op/reduce_op/final_op
  (``cpp/include/raft/linalg/reduce.cuh:63``; coalesced direction)
- L1/L2/Linf norms + normalize
  (``cpp/include/raft/linalg/norm.cuh:51``, ``normalize.cuh:48``)
- dot / axpy (``cpp/include/raft/linalg/dot.cuh:38``, ``axpy.cuh:36``)
- matrix_vector_op broadcast (``linalg/matrix_vector_op.cuh:24``)
- argmin/argmax (``cpp/include/raft/matrix/argmax.cuh:22``) via the
  KeyValuePair idiom (``core/operators.hpp`` argmin_op/argmax_op)
- slice / reverse / ratio / threshold / reciprocal / sqrt / power
  (``cpp/include/raft/matrix/*.cuh``)

Scale notes: every op here is a narrow per-row projection — zero
shuffle, survives any partitioning, and Catalyst prunes unused array
columns at the parquet scan.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnLike = Column | str


def _c(col: ColumnLike) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# map / elementwise (linalg/map.cuh, unary_op/binary_op/ternary_op)
# ---------------------------------------------------------------------------

def unary_op(x: ColumnLike, f: Callable[[Column], Column]) -> Column:
    """Elementwise 1-input map (linalg/unary_op.cuh:44)."""
    return F.transform(_c(x), f)


def map_offset(x: ColumnLike, f: Callable[[Column, Column], Column]) -> Column:
    """Elementwise map that also receives the flat index
    (linalg/map.cuh:150 map_offset)."""
    return F.transform(_c(x), f)


def binary_op(x: ColumnLike, y: ColumnLike, f: Callable[[Column, Column], Column]) -> Column:
    """Elementwise 2-input map (linalg/binary_op.cuh:51)."""
    return F.zip_with(_c(x), _c(y), f)


def ternary_op(
    x: ColumnLike, y: ColumnLike, z: ColumnLike,
    f: Callable[[Column, Column, Column], Column],
) -> Column:
    """Elementwise 3-input map (linalg/ternary_op.cuh:50): zip twice."""
    paired = F.zip_with(_c(x), _c(y), lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return F.zip_with(paired, _c(z), lambda p, c: f(p["a"], p["b"], c))


def add(x: ColumnLike, y: ColumnLike) -> Column:
    return binary_op(x, y, lambda a, b: a + b)


def subtract(x: ColumnLike, y: ColumnLike) -> Column:
    return binary_op(x, y, lambda a, b: a - b)


def multiply(x: ColumnLike, y: ColumnLike) -> Column:
    return binary_op(x, y, lambda a, b: a * b)


def divide(x: ColumnLike, y: ColumnLike) -> Column:
    return binary_op(x, y, lambda a, b: a / b)


def divide_checkzero(x: ColumnLike, y: ColumnLike) -> Column:
    """a/b with 0 where b==0 (core/operators.hpp:146 div_checkzero_op)."""
    return binary_op(x, y, lambda a, b: F.when(b == 0, F.lit(0.0)).otherwise(a / b))


def add_scalar(x: ColumnLike, s) -> Column:
    return unary_op(x, lambda a: a + F.lit(s))


def multiply_scalar(x: ColumnLike, s) -> Column:
    return unary_op(x, lambda a: a * F.lit(s))


def power_scalar(x: ColumnLike, s) -> Column:
    return unary_op(x, lambda a: F.pow(a, F.lit(s)))


def sqrt(x: ColumnLike) -> Column:
    return unary_op(x, F.sqrt)


def reciprocal(x: ColumnLike) -> Column:
    """matrix/reciprocal.cuh:23 (non-finite guarded to NULL→0 not applied;
    divide-by-zero yields NULL under non-ANSI semantics)."""
    return unary_op(x, lambda a: F.lit(1.0) / a)


def threshold(x: ColumnLike, t: float) -> Column:
    """Zero entries with |x| < t (matrix/threshold.cuh:22)."""
    return unary_op(x, lambda a: F.when(F.abs(a) < F.lit(t), F.lit(0.0)).otherwise(a))


def ratio(x: ColumnLike) -> Column:
    """x / sum(x) within the row (matrix/ratio.cuh:22)."""
    xc = _c(x)
    return let_bind(
        F.aggregate(xc, F.lit(0.0), lambda acc, v: acc + v),
        lambda total: F.transform(xc, lambda a: a / total),
    )


def _int8_code(a, scale):
    """The shared int8 code expression: sign·min(floor(|a|/scale·127 +
    0.5), 127), zero when scale = 0 — ONE definition so quantize and
    dequantize can never drift apart (the scale/254 round-trip bound
    holds only while both use the identical code)."""
    raw = F.floor(F.abs(a) / scale * 127.0 + 0.5)
    return F.when(scale == 0, F.lit(0.0)).otherwise(
        F.signum(a) * F.least(raw, F.lit(127.0))
    )


def quantize_int8(x: ColumnLike) -> Column:
    """Symmetric per-row int8 quantization: scale = max|x|/127,
    code = clip(round_half_away(x/scale), ±127) — the standard storage
    compression for large embedding tables (4 f32 bytes → 1 byte/dim;
    at 100 TB this is what makes the corpus ADC/rerank tiers fit).
    All-zero rows quantize to zero codes. Pure expression, zero
    shuffle; SQL-reproducible (no float rounding ambiguity: the code
    is sign·floor(|x|/scale·127 + 0.5))."""
    xc = _c(x)
    return let_bind(
        F.array_max(F.transform(xc, F.abs)),
        lambda scale: F.transform(xc, lambda a: _int8_code(a, scale)),
    )


def dequantize_int8(x: ColumnLike) -> Column:
    """Round-trip reconstruction of :func:`quantize_int8` (code·scale/127)
    — quantize→dequantize bounds the per-entry error at scale/254."""
    xc = _c(x)
    return let_bind(
        F.array_max(F.transform(xc, F.abs)),
        lambda scale: F.transform(
            xc, lambda a: _int8_code(a, scale) * scale / 127.0
        ),
    )


def slice_cols(x: ColumnLike, start: int, length: int) -> Column:
    """Column-range slice (matrix/slice.cuh:36); 0-based start."""
    return F.slice(_c(x), start + 1, length)


def reverse(x: ColumnLike) -> Column:
    """Flip each row (matrix/reverse.cuh:23)."""
    return F.reverse(_c(x))


# ---------------------------------------------------------------------------
# per-row reductions (linalg/reduce.cuh coalesced direction)
# ---------------------------------------------------------------------------

def row_reduce(
    x: ColumnLike,
    init=0.0,
    main_op: Callable[[Column], Column] | None = None,
    reduce_op: Callable[[Column, Column], Column] | None = None,
    final_op: Callable[[Column], Column] | None = None,
) -> Column:
    """Generic fused row reduction with main/reduce/final ops
    (linalg/reduce.cuh:35-42,63). Default = plain sum.

    Spark evaluates the fold sequentially inside codegen, so summation
    order is deterministic left-to-right (RAFT uses Kahan compensation;
    we compute in f64 and document tolerance instead, SURVEY §4).
    """
    main_op = main_op or (lambda v: v)
    reduce_op = reduce_op or (lambda a, b: a + b)
    final_op = final_op or (lambda a: a)
    acc = F.aggregate(_c(x), F.lit(init).cast("double"), lambda a, v: reduce_op(a, main_op(v)))
    return final_op(acc)


def row_sum(x: ColumnLike) -> Column:
    return row_reduce(x)


def let_bind(bound: Column, body) -> Column:
    """Let-bind a per-row scalar expression: evaluate ``bound`` ONCE
    per row and hand it to ``body`` as a lambda variable.

    Catalyst does not common-subexpression-eliminate across
    higher-order-function lambda boundaries: an aggregate referenced
    inside a ``transform`` element lambda is re-evaluated PER ELEMENT —
    O(d²) work per row for a row norm/sum (measured 23 s/1M rows at
    d=64 vs ~2 s bound). Wrapping the scalar in a one-element array and
    transforming over it makes it a bound lambda variable, which IS
    evaluated once.
    """
    return F.element_at(F.transform(F.array(bound), body), 1)


def row_norm(x: ColumnLike, kind: str = "l2", final_sqrt: bool = True) -> Column:
    """L1/L2/Linf row norms (linalg/norm.cuh:51; types norm_types.hpp:13-22)."""
    if kind == "l1":
        return row_reduce(x, main_op=F.abs)
    if kind == "l2":
        out = row_reduce(x, main_op=lambda v: v * v)
        return F.sqrt(out) if final_sqrt else out
    if kind == "linf":
        return row_reduce(x, init=0.0, main_op=F.abs, reduce_op=F.greatest)
    raise ValueError(f"unknown norm kind: {kind}")


def normalize(x: ColumnLike, kind: str = "l2") -> Column:
    """Row normalization by chosen norm (linalg/normalize.cuh:48).

    Rows with zero norm pass through unchanged (RAFT divides and
    produces nan/inf; we follow the safer div_checkzero convention
    used by its L1/Linf row-normalize, sparse/linalg/norm.cuh:20).
    """
    xc = _c(x)
    return let_bind(
        row_norm(xc, kind),
        lambda n: F.transform(
            xc, lambda a: F.when(n == 0, a).otherwise(a / n)
        ),
    )


def dot(x: ColumnLike, y: ColumnLike) -> Column:
    """BLAS-1 dot (linalg/dot.cuh:38): sequential fold → deterministic."""
    return F.aggregate(
        F.zip_with(_c(x), _c(y), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def axpy(alpha, x: ColumnLike, y: ColumnLike) -> Column:
    """y ← α·x + y (linalg/axpy.cuh:36)."""
    return binary_op(x, y, lambda a, b: F.lit(alpha) * a + b)


def mean_squared_error(x: ColumnLike, y: ColumnLike, weight: float = 1.0) -> Column:
    """Row-level mean((a-b)^2)·w (linalg/mean_squared_error.cuh:20)."""
    xc = _c(x)
    sq = F.aggregate(
        F.zip_with(xc, _c(y), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return sq / F.size(xc) * F.lit(weight)


def cosine_similarity(x: ColumnLike, y: ColumnLike) -> Column:
    """dot(x,y)/(|x||y|) — composition used by similarity search.
    Zero-norm rows map to 0.0 (the module's div_checkzero convention):
    Spark's non-ANSI x/0 yields NULL, which would silently DROP the
    row from kNN filters/sorts instead of ranking it last."""
    denom = row_norm(x) * row_norm(y)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(x, y) / denom)


# ---------------------------------------------------------------------------
# argmin/argmax (matrix/argmax.cuh:22, kvp.hpp KeyValuePair)
# ---------------------------------------------------------------------------

def argmax(x: ColumnLike) -> Column:
    """0-based index of the row max; first occurrence wins on ties
    (RAFT argmax_op keeps the lower index, core/operators.hpp:380)."""
    return F.array_position(_c(x), F.array_max(_c(x))).cast("long") - 1


def argmin(x: ColumnLike) -> Column:
    return F.array_position(_c(x), F.array_min(_c(x))).cast("long") - 1


# ---------------------------------------------------------------------------
# matrix ⊗ vector broadcast (linalg/matrix_vector_op.cuh:24)
# ---------------------------------------------------------------------------

def matrix_vector_op(
    x: ColumnLike, vec: list[float] | Column,
    f: Callable[[Column, Column], Column] = lambda a, b: a - b,
) -> Column:
    """Broadcast a dense vector across every row with binary op ``f``.

    ``vec`` may be a Python list (embedded as a literal — the Spark
    equivalent of RAFT's device vector argument) or a Column of equal
    length (e.g. a collected means array re-broadcast via crossJoin).
    """
    vcol = F.array(*[F.lit(float(v)) for v in vec]) if isinstance(vec, list) else vec
    return F.zip_with(_c(x), vcol, f)


def sorted_row(x: ColumnLike, asc: bool = True) -> Column:
    """Per-row sorted copy (matrix/col_wise_sort.cuh:33)."""
    out = F.array_sort(_c(x))
    return out if asc else F.reverse(out)
