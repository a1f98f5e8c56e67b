"""Text-encoding queries: TF-IDF, BM25, and the flagship BM25→normalize→
top-k pipeline (SURVEY.md §7 Phase 1).

Reference parity: ``sparse/matrix/preprocessing.cuh:28`` (tfidf),
``:101`` (bm25), ``linalg/normalize.cuh:48`` (row normalize),
``matrix/select_k.cuh:75`` (grouped top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from raft_spark.operators import text
from raft_spark.operators.selectk import select_k
from raft_spark.queries.registry import query
from raft_spark.sources.tables import doc_terms

# Shared tokenization CTE (mirrors sources.tables.doc_terms).
SQL_COO = r"""
tok AS (
    SELECT doc_id, t.term
    FROM documents, unnest(string_split_regex(text, '\s+')) AS t(term)
    WHERE t.term <> ''
),
coo AS (
    SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
)
"""

# Reference formulas (detail/preprocessing.cuh transform_bm25:162):
# tf = ln(count), idf = ln(N/df + 1), denom = k1*(1-b+b*dl/avgdl) + tf.
SQL_BM25 = (
    SQL_COO
    + r""",
stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM coo),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS term_df FROM coo GROUP BY 1),
dl AS (SELECT doc_id, sum(tf) AS doc_len FROM coo GROUP BY 1),
avgdl AS (SELECT avg(doc_len) AS avg_dl FROM dl),
bm AS (
    SELECT c.doc_id, c.term,
           ln(n_docs / term_df + 1.0)
             * (1.6 + 1.0) * ln(c.tf)
             / (1.6 * (1.0 - 0.75 + 0.75 * doc_len / avg_dl) + ln(c.tf)) AS bm25
    FROM coo c
    JOIN dfreq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats CROSS JOIN avgdl
)
"""
)


@query(
    "tfidf",
    oracle="WITH "
    + SQL_COO
    + r""",
stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM coo),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS term_df FROM coo GROUP BY 1)
SELECT c.doc_id::BIGINT AS doc_id, c.term AS term,
       round(ln(c.tf) * ln(n_docs / term_df + 1.0), 6) AS tfidf
FROM coo c JOIN dfreq USING (term) CROSS JOIN stats
""",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the tokenize+count once: the encoding plan reads the
    # COO table 2-4x (idf, doc-length, main join)
    coo = doc_terms(spark, sf_dir).localCheckpoint(eager=True)
    out = text.encode_tfidf(coo)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.round("tfidf", 6).alias("tfidf"),
    )


@query(
    "bm25",
    oracle="WITH "
    + SQL_BM25
    + r"""
SELECT doc_id::BIGINT AS doc_id, term, round(bm25, 6) AS bm25 FROM bm
""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the tokenize+count once: the encoding plan reads the
    # COO table 2-4x (idf, doc-length, main join)
    coo = doc_terms(spark, sf_dir).localCheckpoint(eager=True)
    out = text.encode_bm25(coo)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.round("bm25", 6).alias("bm25"),
    )


@query(
    "bm25_topk",
    oracle="WITH "
    + SQL_BM25
    + r""",
nz AS (SELECT doc_id, term, bm25 FROM bm WHERE bm25 > 0),
norm AS (
    SELECT doc_id, term,
           bm25 / sqrt(sum(bm25 * bm25) OVER (PARTITION BY doc_id)) AS w
    FROM nz
),
ranked AS (
    SELECT doc_id, term, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term ASC) AS rank
    FROM norm
)
SELECT doc_id::BIGINT AS doc_id, term, round(w, 6) AS weight, rank::BIGINT AS rank
FROM ranked WHERE rank <= 5
""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Flagship: BM25 → sparse L2 row-normalize → top-k terms per doc.

    Zero-weight entries (log-tf makes single-occurrence terms 0) are
    dropped before normalization: a doc whose terms ALL weigh 0 would
    otherwise divide by a zero norm."""
    bm = text.encode_bm25(doc_terms(spark, sf_dir).localCheckpoint(eager=True))
    bm = bm.filter(F.col("bm25") > 0)
    w = W.partitionBy("doc_id")
    normed = bm.select(
        "doc_id",
        "term",
        (F.col("bm25") / F.sqrt(F.sum(F.col("bm25") * F.col("bm25")).over(w))).alias("weight"),
    )
    top = select_k(
        normed,
        group_cols=["doc_id"],
        order_col="weight",
        k=k,
        ascending=False,
        payload_cols=["term"],
        strategy="auto",
    )
    return top.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.round("weight", 6).alias("weight"),
        F.col("rank").cast("long").alias("rank"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_bm25_topk(spark, sf_dir)
