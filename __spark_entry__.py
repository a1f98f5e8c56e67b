"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` maps operator
names → (spark, sf_dir) → DataFrame; ``oracle_sql()`` gives the DuckDB
ANSI-SQL equivalent for the correctness gate (CORRECTNESS_r{N}.json).

Conventions (driver compares row-count + column names + value hash,
order-insensitive, columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- hash-exact rows emit INTEGER-QUANTIZED values (floor(x*1e6+0.5)
  bigints, exact int/decimal(38,0) <-> HUGEINT arithmetic) so no
  engine rounding implementation sits between the engines at all;
  remaining float outputs are round(x, 6) on both sides and derive
  from order-independent aggregates only;
- ids/ranks/counts are cast to bigint on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from raft_spark.queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25-weight the documents doc-term matrix, L2-normalize
    per doc, return top-5 terms per document (SURVEY.md §7 Phase 1)."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
