"""Approximate sketches for pipeline planning at scale: cardinality
(HLL++) and quantiles (Greenwald-Khanna via percentile_approx).

These wrap Spark's JVM-side sketch aggregates (single pass, map-side
combinable, O(sketch) state — the 100 TB shapes) behind the same
operator conventions as the exact paths; the exact twins
(count(distinct), reductions.quantiles) remain the oracle-checkable
source of truth, and tests pin the approximation error against them.
Use the sketch when the answer feeds a plan decision (how many distinct
shingles → LSH band budget; value quantiles → histogram bin edges), the
exact path when the answer IS the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct count per column → (col, approx_distinct).
    One pass, O(2^p) registers per column; relative standard deviation
    ``rsd`` (Spark's approx_count_distinct)."""
    aggs = [F.approx_count_distinct(c, rsd).alias(c) for c in cols]
    row = df.agg(*aggs)
    parts = [
        row.select(F.lit(c).alias("col"), F.col(c).cast("long").alias("approx_distinct"))
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def approx_quantiles(
    df: DataFrame, value_col: str, ps: list[float], accuracy: int = 10_000
) -> DataFrame:
    """Approximate quantiles → (p, value): Greenwald-Khanna sketch
    (percentile_approx), error ≤ 1/accuracy of rank. The exact twin is
    ``reductions.quantiles`` (rank-based, oracle-checked)."""
    arr = F.percentile_approx(value_col, [float(p) for p in ps], accuracy)
    row = df.agg(arr.alias("_q"))
    out = row.select(
        F.posexplode("_q").alias("_i", "value")
    ).select(F.col("_i"), "value")
    pdf = df.sparkSession.createDataFrame(
        [(i, float(p)) for i, p in enumerate(ps)], "_i int, p double"
    )
    return out.join(F.broadcast(pdf), "_i").select("p", "value")


def _cm_pairs(col: str, width: int, depth: int, seed: int):
    """The (depth, bucket) hash-pair expression shared by the batch
    sketch, the point-query probe, and the streaming sketch — ONE
    definition so build and probe can never drift apart (a seed or
    modulus mismatch silently voids the est ≥ true guarantee)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(F.xxhash64(F.col(col), F.lit(seed + i)), F.lit(width))
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def count_min(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4, seed: int = 7
) -> DataFrame:
    """Count-min sketch in long form → (depth, bucket, cnt): ``depth``
    independent hash rows of ``width`` counters. One explode + one
    map-side-combinable groupBy — shuffle is depth×width counters
    regardless of input size, and sketches of shards/days MERGE by
    adding counters (the property that makes it a 100 TB planning
    tool where an exact per-key count would be a corpus-sized state).
    Deterministic for fixed (data, seed): estimates are reproducible.
    """
    pairs = _cm_pairs(col, width, depth, seed)
    return (
        df.select(F.explode(pairs).alias("_p"))
        .select("_p.depth", "_p.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-query the sketch for each key → (key, est). est =
    min over rows of the key's counter; the classic guarantee:
    est ≥ true count ALWAYS (collisions only inflate), and
    est ≤ true + ε·N with probability 1−δ (ε = e/width, δ = e^−depth).
    One broadcast-able join per key set."""
    probes = keys.select(
        F.col(col).alias("key"),
        F.explode(_cm_pairs(col, width, depth, seed)).alias("_p"),
    ).select("key", "_p.depth", "_p.bucket")
    return (
        probes.join(sketch, ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def heavy_hitters(
    df: DataFrame, col: str, min_frac: float = 0.01
) -> DataFrame:
    """Exact heavy hitters → (key, cnt, frac): values occurring in at
    least ``min_frac`` of the rows. One map-side-combinable groupBy +
    a broadcast scalar total — the curation pass that finds boilerplate
    shingles, spam domains, hot buckets before they melt a join."""
    total = df.select(F.count("*").alias("_n"))
    return (
        df.groupBy(F.col(col).alias("key"))
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("_n") * min_frac)
        .select("key", "cnt", (F.col("cnt") / F.col("_n")).alias("frac"))
    )
