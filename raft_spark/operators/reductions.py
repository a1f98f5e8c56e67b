"""Column-direction reductions & grouped reductions over row-vector tables.

Reference semantics:
- strided (column-wise) reduce: ``linalg/reduce.cuh:63`` with
  ``Apply::ALONG_COLUMNS`` → ``linalg/detail/strided_reduction.cuh``
- per-column moments: ``stats/sum.cuh:21``, ``stats/mean.cuh:23``,
  ``stats/stddev.cuh:20``, fused ``stats/meanvar.cuh:19``
- per-column minmax: ``stats/minmax.cuh:24``
- weighted mean: ``stats/weighted_mean.cuh:21``
- mean_center / mean_add: ``stats/mean_center.cuh:20,41``
- histogram: ``stats/histogram.cuh:34``
- reduce_rows_by_key: ``linalg/reduce_rows_by_key.cuh:31``
- reduce_cols_by_key: ``linalg/reduce_cols_by_key.cuh:40``
- covariance: ``stats/cov.cuh:18``

Physical shape (100 TB notes): column-direction reductions route
through ``posexplode`` + ``groupBy(pos)``. The explode is a narrow
flatMap; partial (map-side) aggregation reduces each partition to
``n_cols`` rows before the shuffle, so shuffle volume is
``partitions × n_cols`` regardless of row count — the exact analogue
of RAFT's per-block partial reduction + atomic merge. No collect()
anywhere except the deliberate k×k/driver-scale outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_positions(
    df: DataFrame, features_col: str = "features", keep: list[str] | None = None
) -> DataFrame:
    """Row-vector table → long form (keep…, pos, x)."""
    keep = keep or []
    return df.select(*keep, F.posexplode(features_col).alias("pos", "x"))


def col_reduce(
    df: DataFrame,
    aggs: list[Column],
    features_col: str = "features",
) -> DataFrame:
    """Column-wise reduce: one output row per position with given aggs."""
    return (
        explode_positions(df, features_col)
        .groupBy("pos")
        .agg(*aggs)
        .withColumn("pos", F.col("pos").cast("long"))
    )


def col_moments(
    df: DataFrame, features_col: str = "features", rowids: DataFrame | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Fused per-column sum/mean/var/std/min/max (stats/meanvar.cuh —
    one pass, sample semantics like RAFT's default sample=true).

    ``rowids``: optional (id) frame restricting the reduction to a row
    subset — the stats/minmax.cuh:70 rowids overload; a left-semi join
    (broadcast when small) ahead of the reduction.
    """
    if rowids is not None:
        df = df.join(rowids.select(F.col(rowids.columns[0]).alias(id_col)),
                     id_col, "left_semi")
    return col_reduce(
        df,
        [
            F.sum("x").alias("sum"),
            F.avg("x").alias("mean"),
            F.var_samp("x").alias("var"),
            F.stddev_samp("x").alias("std"),
            F.min("x").alias("min"),
            F.max("x").alias("max"),
        ],
        features_col,
    )


def col_weighted_mean(
    df: DataFrame, weight_col: str, features_col: str = "features"
) -> DataFrame:
    """Per-column weighted mean (stats/weighted_mean.cuh:43 col version)."""
    long = df.select(F.col(weight_col).alias("w"), F.posexplode(features_col).alias("pos", "x"))
    return (
        long.groupBy("pos")
        .agg((F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("wmean"))
        .withColumn("pos", F.col("pos").cast("long"))
    )


def mean_center(
    df: DataFrame,
    features_col: str = "features",
    add: bool = False,
    means: list[float] | None = None,
) -> DataFrame:
    """Subtract (or add back) per-column means (stats/mean_center.cuh:
    mean_center subtracts; mean_add at :41 ADDS an explicit mean
    vector).

    With ``means=None`` the vector is computed from ``df`` itself —
    correct for centering, but USELESS for ``add=True`` (a centered
    frame's own means are ~0, so adding them back is a no-op): to
    invert a centering, pass the ORIGINAL means explicitly, exactly
    like the reference's mean_add takes its mean argument. Computed
    means stay a 1×n_cols aggregate broadcast back via crossJoin
    (never collected to Python); explicit means embed as a literal.
    """
    op = (lambda a, b: a + b) if add else (lambda a, b: a - b)
    if means is not None:
        vec = F.array(*[F.lit(float(m)) for m in means])
        return df.withColumn(
            features_col, F.zip_with(features_col, vec, op)
        )
    mdf = (
        explode_positions(df, features_col)
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
        .select(F.transform("_pm", lambda s: s["m"]).alias("_means"))
    )
    return df.crossJoin(F.broadcast(mdf)).withColumn(
        features_col, F.zip_with(features_col, "_means", op)
    ).drop("_means")


def standardize(df: DataFrame, features_col: str = "features") -> DataFrame:
    """Per-column z-score: (x − μ_col) / σ_col (population σ) — the
    feature-scaling companion of mean_center (stats/stddev.cuh +
    mean_center.cuh composed). Same shape: one map-side-combined
    aggregate produces the 2×n_cols stat vectors, broadcast back, then
    a zero-shuffle zip_with per row. Zero-variance columns map to 0."""
    stats = (
        explode_positions(df, features_col)
        .groupBy("pos")
        .agg(F.avg("x").alias("m"), F.stddev_pop("x").alias("s"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m", "s"))).alias("_pm"))
        .select(
            F.transform("_pm", lambda t: t["m"]).alias("_means"),
            F.transform("_pm", lambda t: t["s"]).alias("_stds"),
        )
    )
    centered = F.zip_with(features_col, "_means", lambda a, b: a - b)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            features_col,
            F.zip_with(
                centered, "_stds",
                lambda a, s: F.when(s == 0, F.lit(0.0)).otherwise(a / s),
            ),
        )
        .drop("_means", "_stds")
    )


def histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Fixed-width binned counts (stats/histogram.cuh:34). Values outside
    [lo, hi) are clamped into the edge bins like RAFT's binner."""
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.greatest(F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return df.select(bucket.alias("bin")).groupBy("bin").agg(F.count("*").alias("count"))


def reduce_rows_by_key(
    df: DataFrame,
    key_col: str,
    features_col: str = "features",
    weight_col: str | None = None,
) -> DataFrame:
    """Σ rows per key → long form (key, pos, sum) — the k-means-update
    primitive (linalg/reduce_rows_by_key.cuh:31; weighted :74).

    Long-form output keeps the shuffle map-side combinable; re-pack to
    arrays with ``pack_rows`` only when the per-key vector is needed
    as a value.
    """
    cols = [F.col(key_col).alias("key"), F.posexplode(features_col).alias("pos", "x")]
    if weight_col:
        long = df.select(F.col(weight_col).alias("w"), *cols)
        val = F.sum(F.col("w") * F.col("x"))
    else:
        long = df.select(*cols)
        val = F.sum("x")
    return (
        long.groupBy("key", "pos")
        .agg(val.alias("sum"))
        .withColumn("pos", F.col("pos").cast("long"))
    )


def reduce_cols_by_key(
    df: DataFrame,
    col_keys: list[int],
    features_col: str = "features",
    id_col: str = "id",
) -> DataFrame:
    """Σ columns grouped by a column-key vector → (id, key, sum)
    (linalg/reduce_cols_by_key.cuh:40). col_keys[j] = key of column j.

    Computed as a pure per-row expression (zero shuffle): for each
    distinct key, fold the positions carrying it.
    """
    keys = sorted(set(col_keys))
    key_arr = F.array(*[F.lit(k) for k in col_keys])
    pairs = F.zip_with(
        F.col(features_col), key_arr, lambda x, k: F.struct(k.alias("k"), x.alias("x"))
    )
    out_rows = []
    for k in keys:
        s = F.aggregate(
            F.filter(pairs, lambda p: p["k"] == F.lit(k)),
            F.lit(0.0),
            lambda acc, p: acc + p["x"],
        )
        out_rows.append(F.struct(F.lit(k).cast("long").alias("key"), s.alias("sum")))
    exploded = F.explode(F.array(*out_rows))
    return df.select(F.col(id_col).alias("id"), exploded.alias("_e")).select(
        "id", F.col("_e.key").alias("key"), F.col("_e.sum").alias("sum")
    )


def pack_rows(long_df: DataFrame, key_cols: list[str], pos_col: str = "pos", val_col: str = "x") -> DataFrame:
    """(keys…, pos, x) long form → (keys…, features array) ordered by pos."""
    return (
        long_df.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(F.struct(pos_col, val_col))).alias("_pv"))
        .withColumn("features", F.transform("_pv", lambda s: s[val_col]))
        .drop("_pv")
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_name: str = "rank",
    n_parts: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` WITHOUT a
    single-partition window (random/permute.cuh:58 shape).

    Two-phase: range-repartition on the sort key (partition p holds
    keys ≤ partition p+1's — Spark's RangePartitioner contract), rank
    within each partition via a PARTITIONED window, then add each
    partition's row-count prefix sum (a partitions-sized table,
    broadcast back). Exact for any tie-free total order; scales as a
    sort, not as one task.
    """
    from pyspark.sql.window import Window

    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    # materialize ONCE: RangePartitioner samples boundaries per plan
    # instance, so if the counts branch and the rank branch below each
    # re-planned this exchange (exchange reuse off, AQE divergence) the
    # offsets would be computed against a DIFFERENT partitioning than
    # the ranks — silent corruption. localCheckpoint pins one physical
    # partitioning for both consumers.
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("_pid").agg(F.count("*").alias("_n"))
    # offsets table is O(partitions) rows — the window below runs on
    # that tiny frame only, then broadcasts back.
    offsets = counts.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_off"),
    ).fillna(0, ["_off"])
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    return (
        parted.withColumn("_lr", local)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(rank_name, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )


def quantiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT distributed quantiles → (p, value): the element at 1-based
    rank ``floor(p·(n−1)) + 1`` under the total order
    (value, *tie_cols) — lower-interpolation discrete percentile with a
    deterministic tie-break, so the result is unique and
    SQL-reproducible. ``p·(n−1)`` is evaluated in IEEE double on BOTH
    engines (the gate oracle floors the identical product), so a p
    whose product is fractionally below an integer in float — e.g.
    0.7·10 = 6.999…9 — selects that float's floor, one rank below the
    exact-decimal reading; the contract is the float semantics, which
    every SQL engine computing floor(p*(n-1)) reproduces bit-for-bit.

    Runs on :func:`global_rank` (range repartition + partitioned
    window + offset join): scales as a distributed sort, never a
    single-partition window — the shape percentile_disc needs at
    100 TB. One count() for n, one broadcast of the |ps| target ranks.
    """
    tie_cols = tie_cols or []
    order = [value_col, *tie_cols]
    ranked = global_rank(df.select(*order), order, rank_name="_r")
    n = df.count()
    targets = [(float(p), int(p * (n - 1)) + 1) for p in ps]
    tdf = df.sparkSession.createDataFrame(targets, "p double, _r long")
    return (
        ranked.join(F.broadcast(tdf), "_r")
        .select("p", F.col(value_col).alias("value"))
    )


def covariance(
    df: DataFrame,
    features_col: str = "features",
    sample: bool = True,
    quantize: float | None = None,
) -> DataFrame:
    """Covariance matrix in long form (i, j, cov) — stats/cov.cuh:18
    (gemm then subtract the mean outer product).

    Routed through the mapInPandas Gram pass (solvers.gram_matrix):
    shuffle carries O(partitions·d²) partial scalars — constant in row
    count — where the old double-posexplode formulation shuffled d²×
    the input rows. Output is d×d (driver-scale by design):
    cov = (XᵀX − n·μμᵀ) / (n − sample).

    With ``quantize=s`` the pass runs over the half-up-quantized
    integers ``q = floor(x·s + 0.5)`` with exact (order-independent)
    integer sums, then evaluates
    ``cov = (Sxy − Sx·Sy/n) / (n − sample) / s²`` in one fixed IEEE
    expression — any engine that mirrors the same quantization and
    expression produces the bit-identical double (the streaming-moments
    trick, streaming/incremental.py, applied to the Gram pass).
    """
    from raft_spark.operators.solvers import gram_matrix, gram_matrix_exact

    import numpy as np

    ddof = 1 if sample else 0
    if quantize is None:
        g, sx, n = gram_matrix(df, features_col)
        mu = sx / n
        cov = (g - n * np.outer(mu, mu)) / (n - ddof)
    else:
        gi, sxi, n = gram_matrix_exact(df, features_col, scale=quantize)
        sxf = np.array([float(v) for v in sxi])
        gf = np.array([[float(v) for v in row] for row in gi])
        # fixed op order: (Sxy − (Sx·Sy)/n) / (n−ddof) / s² — mirrored
        # verbatim by the DuckDB oracle so doubles match bit-for-bit.
        cov = (gf - np.outer(sxf, sxf) / n) / (n - ddof) / (quantize * quantize)
    d = cov.shape[0]
    rows = [
        (int(i), int(j), float(cov[i, j])) for i in range(d) for j in range(d)
    ]
    return df.sparkSession.createDataFrame(rows, "i long, j long, cov double")
