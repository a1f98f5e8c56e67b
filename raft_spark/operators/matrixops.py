"""Matrix manipulation operators (SURVEY.md §2.1, §2.3, §2.4):
gather/scatter, slice, shift, reverse, triangular, sort-cols-per-row,
bitset/popc, and masked matmul.

Reference parity (all semantics, Spark-first physical plans):
- gather / gather_if:    matrix/gather.cuh:25-186   (join on row map)
- scatter:               matrix/scatter.cuh:16      (join on inverse map)
- slice:                 matrix/slice.cuh:36        (filter + array slice)
- shift (cols):          matrix/shift.cuh:18        (slice+concat fill)
- reverse rows/cols:     matrix/reverse.cuh:23,43
- triangular (upper):    matrix/triangular.cuh:22   (long-form filter)
- sort_cols_per_row:     matrix/col_wise_sort.cuh:33 (array_sort of structs)
- bitset test/flip/count: core/bitset.hpp:368-406; popc util/popc.cuh
- masked_matmul:         sparse/linalg/masked_matmul.cuh:47 (mask join
  prunes the pair space BEFORE any dot product is computed — the join
  IS the mask, so work is O(nnz(mask)·d), never O(n²·d))

Scale notes: gather/scatter are equi-joins on the map — broadcast the
map when small (it usually is), shuffle-hash otherwise; everything
else is a narrow per-row projection or a long-form filter that
Catalyst pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gather(df: DataFrame, index_map: DataFrame, id_col: str = "id") -> DataFrame:
    """Rows of ``df`` selected (with repetition) by ``index_map``
    (out_id, src_id). matrix/gather.cuh:25 — the map is typically tiny
    → broadcast join, no shuffle of the big side."""
    m = F.broadcast(index_map)
    return (
        df.join(m, df[id_col] == m["src_id"])
        .drop("src_id")
        .select("out_id", *[c for c in df.columns])
    )


def scatter(df: DataFrame, index_map: DataFrame, id_col: str = "id") -> DataFrame:
    """Permute rows so row i lands at position map[i]
    (matrix/scatter.cuh:16): join on the forward map keyed by source."""
    m = F.broadcast(index_map)
    return (
        df.join(m, df[id_col] == m["src_id"])
        .drop("src_id")
        .select(F.col("dst_id").alias("out_id"), *[c for c in df.columns])
    )


def matrix_slice(
    df: DataFrame, row_lo: int, row_hi: int, col_lo: int, col_len: int,
    id_col: str = "id", features: str = "features",
) -> DataFrame:
    """Rectangular submatrix (matrix/slice.cuh:36): row-range filter
    (pushed to the scan) + per-row array slice (1-based F.slice)."""
    return df.filter(F.col(id_col).between(row_lo, row_hi)).select(
        id_col, F.slice(features, col_lo + 1, col_len).alias(features)
    )


def shift_cols(
    df: DataFrame, k: int, fill: float = 0.0, features: str = "features"
) -> Column | DataFrame:
    """Shift each row's values right (k>0) or left (k<0) by |k|, filling
    vacated slots (matrix/shift.cuh:18)."""
    n = F.size(features)
    pad = F.array_repeat(F.lit(float(fill)), abs(k))
    if k >= 0:
        shifted = F.concat(pad, F.slice(features, 1, n - k))
    else:
        shifted = F.concat(F.slice(features, -k + 1, n + k), pad)
    return df.withColumn(features, shifted)


def reverse_cols(df: DataFrame, features: str = "features") -> DataFrame:
    """matrix/reverse.cuh:43 — flip each row."""
    return df.withColumn(features, F.reverse(features))


def shift_rows(
    df: DataFrame, k: int, fill: float = 0.0,
    id_col: str = "id", features: str = "features",
) -> DataFrame:
    """Shift ROWS down (k>0) / up (k<0) by |k|, vacated rows filled
    with ``fill`` (matrix/shift.cuh:64 — the row-dimension variant of
    shift_cols). Row ids are the matrix's row index, so the shift is
    one equi-join on (id − k) — no matrix-wide data movement; Spark
    co-partitions both sides on the id."""
    d = df.select(F.size(features).alias("d")).first()["d"]
    moved = df.select(
        (F.col(id_col) + F.lit(k)).alias(id_col), F.col(features).alias("_f")
    )
    return (
        df.select(id_col)
        .join(moved, id_col, "left")
        .select(
            id_col,
            F.coalesce("_f", F.array_repeat(F.lit(float(fill)), d)).alias(features),
        )
    )


def reverse_rows(
    df: DataFrame, n_rows: int, id_col: str = "id", features: str = "features"
) -> DataFrame:
    """matrix/reverse.cuh:23 — flip the ROW order: row i receives row
    (n_rows−1−i). A pure id-relabeling projection (zero shuffle; any
    downstream keyed op re-clusters on the new id lazily)."""
    return df.select(
        (F.lit(n_rows - 1) - F.col(id_col)).alias(id_col), features
    )


def triangular_upper(coo: DataFrame, strict: bool = False) -> DataFrame:
    """Upper-triangular extraction in long form
    (matrix/triangular.cuh:22): a pushdown-able filter."""
    cond = F.col("col") > F.col("row") if strict else F.col("col") >= F.col("row")
    return coo.filter(cond)


def sort_cols_per_row(
    df: DataFrame, features: str = "features", asc: bool = True
) -> DataFrame:
    """Sort each row's values returning (sorted values, permutation of
    original indices) — matrix/col_wise_sort.cuh:33. One narrow pass:
    array_sort over zipped (value, index) structs; ties break on the
    original index, matching a stable sort.

    NaN contract: NaN sorts LAST in BOTH directions. Ascending is
    Spark's native order (NaN greater than every double); descending
    sorts on the negated key and −NaN is still NaN, so it stays last —
    intentionally mirroring select_k's NaN-last semantics rather than
    the reverse(array_sort(...)) formulation, which placed NaN first
    in descending output (and broke stable ties)."""
    n = F.size(features)
    # descending sorts on a NEGATED key struct instead of
    # reverse(array_sort(...)): reversing flips tie order (index
    # DEscending on equal values), breaking the stable-sort contract
    key = F.col(features) if asc else F.transform(features, lambda v: -v)
    zipped = F.arrays_zip(
        key.alias("k"),
        F.sequence(F.lit(0), n - 1).alias("i"),
        F.col(features).alias("v"),
    )
    srt = F.array_sort(zipped)
    return df.select(
        "id",
        F.transform(srt, lambda e: e["v"]).alias("sorted_vals"),
        F.transform(srt, lambda e: e["i"]).alias("perm"),
    )


def bitset_stats(df: DataFrame, mask_a: Column, mask_b: Column) -> DataFrame:
    """Bitset algebra as boolean-column aggregates
    (core/bitset.hpp:368-406 test/set/flip/count; util/popc.cuh):
    popcount, NOT (flip), AND, OR, XOR counts and sparsity."""
    a = mask_a.cast("boolean")
    b = mask_b.cast("boolean")
    n = F.count(F.lit(1))
    return df.agg(
        n.cast("bigint").alias("n"),
        F.count_if(a).cast("bigint").alias("popc_a"),
        F.count_if(~a).cast("bigint").alias("popc_not_a"),
        F.count_if(a & b).cast("bigint").alias("popc_and"),
        F.count_if(a | b).cast("bigint").alias("popc_or"),
        F.count_if(a != b).cast("bigint").alias("popc_xor"),
        F.round(F.count_if(a) / n, 6).alias("sparsity_a"),
    )


def row_op(
    df: DataFrame,
    fn,
    schema: str,
    group_col: str = "id",
) -> DataFrame:
    """Arbitrary per-row-group computation (matrix/detail row_op /
    linewise custom lambdas that no expression covers): groups by
    ``group_col`` and runs ``fn(pandas.DataFrame) -> pandas.DataFrame``
    per group via applyInPandas (Arrow-batched; the LAP solver is the
    canonical in-repo instance of this pattern).

    Use ONLY when expressions genuinely can't express the semantics —
    one Python crossing per group; expressions and mapInPandas batches
    beat it whenever applicable.
    """
    return df.groupBy(group_col).applyInPandas(fn, schema=schema)


def bitmap_to_csr(df: DataFrame, bits_col: str, row_col: str = "id") -> DataFrame:
    """Bitmap matrix (row, bits: array<boolean|numeric>) → CSR/COO long
    form (row, col, value=1.0) of the SET positions
    (core/bitset.hpp:200 bitset_to_csr / bitmap.hpp conversions).

    One narrow posexplode + filter — the explode emits only set bits
    downstream of the filter pushout, so output volume is nnz.
    """
    return (
        df.select(
            F.col(row_col).alias("row"),
            F.posexplode(bits_col).alias("col", "_b"),
        )
        .filter(F.col("_b").cast("boolean"))
        .select("row", F.col("col").cast("long").alias("col"), F.lit(1.0).alias("value"))
    )


def masked_matmul(
    a: DataFrame, b: DataFrame, mask: DataFrame
) -> DataFrame:
    """C[i,j] = <A_i, B_j> computed ONLY for (i,j) in ``mask``
    (sparse/linalg/masked_matmul.cuh:47). Inputs: a=(id, features),
    b=(id, features), mask=(i, j).

    Physical plan: mask ⋈ A on i, then ⋈ B on j, then a zip_with dot
    per surviving pair — the mask join prunes the pair space up front
    exactly like the reference's bitmask skips tiles. With a small
    mask both joins broadcast; with a big mask they shuffle on i / j,
    which co-locates each pair's two vectors."""
    am = a.select(F.col("id").alias("i"), F.col("features").alias("_fa"))
    bm = b.select(F.col("id").alias("j"), F.col("features").alias("_fb"))
    return (
        mask.join(am, "i")
        .join(bm, "j")
        .select(
            "i",
            "j",
            F.aggregate(
                F.zip_with("_fa", "_fb", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("value"),
        )
    )
