"""Sinks: persist engine outputs as partitioned / bucketed parquet (and
delimited text for interchange).

RAFT's persistence story is host-side ``.npy`` serialization
(``python/pylibraft/pylibraft/common/device_ndarray.py``); the Spark
equivalent of "a matrix you can hand to the next job" is a parquet
dataset, and the SCALE-relevant choices live here:

- ``write_parquet(partition_by=...)`` — directory partitioning: a
  downstream filter on the partition column prunes whole directories
  at the SCAN (no task even reads the footer).
- ``write_bucketed(...)`` — hash-bucketed + sorted table via
  ``saveAsTable``: two tables bucketed on the same key and count join
  with ZERO exchange on either side (SortMergeJoin reads co-located
  buckets) — the Spark analogue of the reference pre-partitioning
  device matrices across ranks once and reusing the layout every
  iteration (SURVEY §2.10). tests/test_sinks.py pins the no-exchange
  plan.
- ``write_csv`` / ``read_csv`` — delimited interchange for tools that
  speak neither parquet nor Arrow.

All writers accept long-form COO or row-vector frames unchanged (plain
columns; arrays nest fine in parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Parquet dataset, optionally directory-partitioned.

    ``max_records_per_file`` bounds file size at huge scale (prevents
    the few-giant-files shape that kills downstream split parallelism
    — the inverse of the single-row-group problem this repo's loader
    works around)."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (+ sorted) managed table. Joins/groupBys keyed on
    ``bucket_cols`` between tables with matching bucketing read
    co-located buckets and skip their shuffles entirely."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True,
    sep: str = ",",
) -> None:
    """CSV writer. Spark's CSV source cannot hold array columns, so
    array<…> columns (row-vector ``features``) are serialized to JSON
    strings in place — round-trippable via from_json on read — instead
    of failing the whole write with an AnalysisException."""
    from pyspark.sql.types import ArrayType

    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    out.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, header: bool = True,
    sep: str = ",",
) -> DataFrame:
    r = spark.read.option("header", header).option("sep", sep)
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    return r.csv(path)
