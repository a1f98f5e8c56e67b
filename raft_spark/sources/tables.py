"""Parquet sources + canonical data-model constructors.

RAFT has no file readers — the caller hands it typed device arrays
(reference: ``python/pylibraft/pylibraft/common/device_ndarray.py``).
Our engine's canonical representations (SURVEY.md §1.3):

1. row-vector table  ``(id: long, features: array<double>)`` — maps to
   ``device_matrix_view<T, row_major>``
   (reference: ``cpp/include/raft/core/mdspan_types.hpp:30-37``).
2. COO long-form     ``(row: long, col: long, value: double)`` — maps to
   ``coo_matrix`` / ``csr_matrix``
   (reference: ``cpp/include/raft/core/coo_matrix.hpp:195``).
3. label/key columns; scalar results as 1-row DataFrames.

Scale notes: the parquet scans are the only I/O; every constructor
below is a narrow projection (no shuffle), so Catalyst pushes column
pruning and filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one synthetic table (see /root/repo/TESTDATA.md).

    The testdata ships as single-row-group files, so the scan yields
    ONE task no matter how heavy the downstream per-row compute is
    (shingling, 64-dim dot products). Repartition UP to the session's
    parallelism when the scan under-splits — compute-bound-but-small
    inputs are exactly the case Spark's size-based splitting misses.
    On a real cluster the scan already produces thousands of splits,
    so this is a no-op there (we never repartition DOWN). Catalyst
    still pushes filters/pruning through the repartition node into
    the scan (PushDownPredicates handles Repartition).
    """
    # events.ts is raw INT64 epoch-nanos; this is a runtime SQL conf, so
    # set it HERE (not only in our session builder) — the correctness
    # driver runs queries under its own SparkSession and must still be
    # able to read the table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        # hash-repartition on the table's leading key (not round-robin):
        # downstream groupBy/join keyed on it — doc_terms' (doc_id,term)
        # count, shingle distinct — then SATISFIES its clustering from
        # this exchange and skips its own shuffle.
        df = df.repartition(target, df[df.columns[0]])
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load(spark, t, sf_dir) for t in TABLES}


DOCS_SCHEMA = "doc_id long, lang string, text string"


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """LLM corpora ship as JSONL (one JSON doc per line, often
    gzip-compressed — Spark's json source handles .gz transparently).
    An EXPLICIT schema is required: schema inference re-reads the whole
    input on the driver-coordinated sampling pass, which at 100 TB is a
    second full scan before any work starts. Corrupt lines land in
    ``_corrupt_record`` instead of failing the job (PERMISSIVE mode) so
    one bad shard cannot kill a corpus-wide run."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl_corpus(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a corpus back to JSONL shards (one file per partition —
    the interchange format downstream tokenizer/training jobs expect)."""
    out = df if partitions is None else df.repartition(partitions)
    out.write.mode("overwrite").json(path)


def embeddings_matrix(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Canonical dense row-vector table from the embeddings parquet.

    Features cast float→double once at the scan so every downstream
    reduction computes in f64 (RAFT reductions accumulate in the output
    type; we standardize on double and document tolerance, SURVEY §2.2).
    """
    return load(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label"),
    )


def lineitem_matrix(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Dense 4-col matrix view over lineitem numerics (for moments etc.)."""
    li = load(spark, "lineitem", sf_dir)
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.array(
            F.col("l_quantity").cast("double"),
            F.col("l_extendedprice").cast("double"),
            F.col("l_discount").cast("double"),
            F.col("l_tax").cast("double"),
        ).alias("features"),
    )


def doc_terms(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """COO doc-term counts ``(doc_id, term, tf)`` from documents.text.

    The sparse doc-term matrix that feeds TF-IDF / BM25 (reference:
    ``cpp/include/raft/sparse/matrix/preprocessing.cuh:28,101``).
    One shuffle (groupBy doc×term); at 100 TB this is a classic
    map-side-combinable word-count — partial aggregation bounds the
    shuffle to distinct (doc, term) pairs.
    """
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
