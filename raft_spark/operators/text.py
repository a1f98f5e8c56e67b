"""Text-statistics encodings over the COO doc-term table: TF-IDF, BM25.

Reference: ``cpp/include/raft/sparse/matrix/preprocessing.cuh`` —
``encode_tfidf`` (:28 COO, :63 CSR) and ``encode_bm25`` (:101, :167),
impl ``sparse/matrix/detail/preprocessing.cuh`` (``transform_tfidf``
:199, ``transform_bm25`` :162). The reference computes, per nonzero
(doc, term, raw count c):

  tf               = log(c)                      (log-damped, NOT raw)
  idf(term)        = log(N / df(term) + 1)
  tfidf            = tf * idf
  bm25             = idf * (k1+1)*tf / (k1*(1 - b + b*dl/avgdl) + tf)

with N = #docs, df = #docs containing term (featIdCount), dl = doc
length (sum of raw counts over the doc, fit_bm25's rowFeatCnts),
avgdl = total count / N (fullFeatCount / num_rows), defaults k1 = 1.6,
b = 0.75. Note log(1) = 0: single-occurrence terms weigh 0 — that is
the reference's behavior, reproduced exactly.

Spark plan shape (and why it scales):
- df(term):   groupBy(term) count — map-side combinable, shuffle is
              |vocab| rows.
- dl(doc):    groupBy(doc) sum — same, |docs| rows.
- N, avgdl:   single-row aggregate, crossJoin-broadcast (1 row).
- join back:  the df table is vocabulary-sized → broadcast when small;
              at 100 TB vocab can be huge → it stays a shuffle join on
              term, co-partitioned with the main table's term key. The
              dl join is on doc_id, co-partitioned with the doc key.
No UDFs anywhere — the whole encoding is 3 aggregates + 2 joins + one
projection, all inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_stats(coo: DataFrame, doc_col: str, term_col: str, value_col: str):
    n_docs = coo.select(F.countDistinct(doc_col).alias("n_docs"))
    df_tbl = coo.groupBy(term_col).agg(F.countDistinct(doc_col).alias("term_df"))
    return n_docs, df_tbl


def idf_table(
    coo: DataFrame, doc_col: str = "doc_id", term_col: str = "term"
) -> DataFrame:
    """Per-term idf = log(N/df + 1)
    (detail/preprocessing.cuh transform_tfidf:199 idf_in + 1)."""
    n_docs, df_tbl = _doc_stats(coo, doc_col, term_col, "tf")
    return df_tbl.crossJoin(F.broadcast(n_docs)).select(
        term_col,
        "term_df",
        F.log(F.col("n_docs") / F.col("term_df") + 1.0).alias("idf"),
    )


def encode_tfidf(
    coo: DataFrame,
    doc_col: str = "doc_id",
    term_col: str = "term",
    value_col: str = "tf",
) -> DataFrame:
    """TF-IDF weight per nonzero (sparse/matrix/preprocessing.cuh:28):
    log(c) * log(N/df + 1), exactly transform_tfidf:199."""
    idf = idf_table(coo, doc_col, term_col)
    return coo.join(idf, term_col).select(
        doc_col, term_col, (F.log(value_col) * F.col("idf")).alias("tfidf")
    )


def encode_bm25(
    coo: DataFrame,
    doc_col: str = "doc_id",
    term_col: str = "term",
    value_col: str = "tf",
    k1: float = 1.6,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 weight per nonzero (sparse/matrix/preprocessing.cuh:101,
    transform_bm25:162): tf = log(c), denominator k1*(1-b+b*dl/avgdl)+tf."""
    idf = idf_table(coo, doc_col, term_col)
    dl = coo.groupBy(doc_col).agg(F.sum(value_col).alias("doc_len"))
    avg = dl.select(F.avg("doc_len").alias("avg_dl"))
    tf = F.log(value_col)
    denom = F.lit(k1) * (1.0 - F.lit(b) + F.lit(b) * F.col("doc_len") / F.col("avg_dl")) + tf
    return (
        coo.join(idf, term_col)
        .join(dl, doc_col)
        .crossJoin(F.broadcast(avg))
        .select(
            doc_col,
            term_col,
            (F.col("idf") * (F.lit(k1) + 1.0) * tf / denom).alias("bm25"),
        )
    )


def tokenize(docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id") -> DataFrame:
    """documents → COO (doc, term, tf) — see sources.tables.doc_terms."""
    return (
        docs.select(doc_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(doc_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
