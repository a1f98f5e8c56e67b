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
