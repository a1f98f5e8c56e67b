"""Compensated summation (SURVEY.md §4 custom-work item 2).

The reference's add-reductions use Kahan–Babushka–Neumaier compensation
(linalg/detail/coalesced_reduction-inl.cuh:36); Spark's built-in sum is
a plain double accumulator. For the rare pipeline that needs exactly-
rounded sums (ill-conditioned series, unit tests of tolerance), this
provides a two-level exact path:

- partition level: Shewchuk expansion of the partial sum, emitted as
  its unrounded non-overlapping components (a handful of doubles);
- merge level: ``math.fsum`` over all components on the driver —
  exactly-rounded, partitioning-independent (strictly stronger than
  the reference's KBN compensation).

Scale: one narrow pandas pass + a tiny merge; the grouped variant
(``fsum_agg``) is a GROUPED_AGG pandas UDF — exact within each group
because the whole group reaches one fsum call.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def fsum_agg():
    """Exactly-rounded sum aggregate (grouped or global). Built lazily:
    pandas_udf registration needs an active SparkSession."""

    @pandas_udf("double")
    def _fsum(v: pd.Series) -> float:
        return math.fsum(v.dropna())

    return _fsum


def _shewchuk_partials(xs) -> list[float]:
    """Exact expansion of a running sum as non-overlapping doubles
    (Shewchuk's algorithm — the core of math.fsum, kept UNROUNDED so
    partials can be merged across partitions without losing the small
    components to a premature final rounding)."""
    partials: list[float] = []
    for x in xs:
        x = float(x)
        i = 0
        for y in partials:
            if abs(x) < abs(y):
                x, y = y, x
            hi = x + y
            lo = y - (hi - x)
            if lo:
                partials[i] = lo
                i += 1
            x = hi
        partials[i:] = [x]
    return partials


def fsum_column(df: DataFrame, col: str) -> float:
    """Exact global sum of a column, distributed: each partition emits
    its UNROUNDED Shewchuk expansion (a handful of doubles that sum to
    the partial exactly); the driver fsums the concatenated components
    — exactly-rounded and partitioning-independent. Rounding each
    partition to one double first would lose small terms before
    cross-partition cancellation."""

    def per_partition(batches):
        for pdf in batches:
            yield pd.DataFrame({"c": _shewchuk_partials(pdf[col].dropna())})

    comps = df.select(col).mapInPandas(per_partition, "c double").collect()
    return math.fsum(r["c"] for r in comps)


def kahan_sum_expr(arr: Column | str) -> Column:
    """KBN-compensated sum of an ARRAY column as a pure expression
    (per-row, inside codegen — the literal port of the reference's
    in-kernel compensation): carries (sum, c) through aggregate()."""
    c = F.col(arr) if isinstance(arr, str) else arr
    acc = F.aggregate(
        c,
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("c")),
        lambda a, x: F.struct(
            (a["s"] + x).alias("s"),
            (
                a["c"]
                + F.when(
                    F.abs(a["s"]) >= F.abs(x),
                    (a["s"] - (a["s"] + x)) + x,
                ).otherwise((x - (a["s"] + x)) + a["s"])
            ).alias("c"),
        ),
        lambda a: a["s"] + a["c"],
    )
    return acc
