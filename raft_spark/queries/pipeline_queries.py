"""Training-data pipeline queries: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding near-dup), similarity search, text analysis,
multimodal metadata plumbing.

These extend the reference's own operator surface per the north star in
BASELINE.json; each is oracle-checked except the multimodal mapInPandas
query (driver records rows-only — the decode is a stubbed UDF, but its
metadata output is still deterministic and cross-checked here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.operators import dedup as D
from raft_spark.operators import multimodal as MM
from raft_spark.operators import similarity as SIM
from raft_spark.operators import textquality as TQ
from raft_spark.queries.registry import query
from raft_spark.queries.text_queries import SQL_COO
from raft_spark.sources.tables import doc_terms, embeddings_matrix, load

P31 = 2_147_483_647

SQL_VOCAB = """
vocab AS (
    SELECT term, dense_rank() OVER (ORDER BY term) AS tid
    FROM (SELECT DISTINCT term FROM coo)
),
wt AS (SELECT doc_id, tid, tf FROM coo JOIN vocab USING (term)),
perms AS (
    SELECT i AS perm,
           ((i + 1) * 12582917) % 2147483647 AS a,
           ((i + 1) * 4256249 + 7) % 2147483647 AS b
    FROM range(0, 16) t(i)
)
"""

SQL_SIGS = """
sigs AS (
    SELECT doc_id, perm, min((a * tid + b) % 2147483647) AS mh
    FROM wt CROSS JOIN perms GROUP BY 1, 2
)
"""


@query(
    "exact_dedup",
    oracle="""
WITH m AS (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM documents
)
SELECT doc_id::BIGINT AS doc_id, canon::BIGINT AS canonical_id,
       (CASE WHEN doc_id <> canon THEN 1 ELSE 0 END)::INTEGER AS is_dup
FROM m
""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, canonical = min doc_id."""
    return D.exact_dedup(load(spark, "documents", sf_dir))


@query(
    "minhash_lsh",
    oracle="WITH " + SQL_COO + "," + SQL_VOCAB + "," + SQL_SIGS + """,
bands AS (
    SELECT doc_id, (perm // 4) AS band,
           string_agg(mh::VARCHAR, '_' ORDER BY perm) AS sig
    FROM sigs GROUP BY 1, 2
),
keep AS (SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= 256),
bandsk AS (SELECT b.* FROM bands b JOIN keep USING (band, sig)),
cand AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM bandsk l JOIN bandsk r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
)
SELECT a::BIGINT AS a, b::BIGINT AS b,
       round(avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS est_jaccard
FROM cand
JOIN sigs sa ON sa.doc_id = cand.a
JOIN sigs sb ON sb.doc_id = cand.b AND sb.perm = sa.perm
GROUP BY 1, 2
""",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 perms) + LSH (4 bands × 4 rows) near-dup candidates
    with estimated Jaccard. Candidates come from the band-bucket join,
    never an all-pairs product."""
    # materialize the tokenize+count once: the encoding plan reads the
    # COO table 2-4x (idf, doc-length, main join)
    coo = doc_terms(spark, sf_dir).localCheckpoint(eager=True)
    # signatures feed the band explode AND both sides of the pair join —
    # cache the doc-sized signature table so the vocab-rank + min-agg
    # pipeline runs once
    sigs = D.minhash_signatures(coo).cache()
    out = D.minhash_lsh_candidates(sigs)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.round("est_jaccard", 6).alias("est_jaccard"),
    )


@query(
    "dedup_clusters",
    oracle="WITH RECURSIVE " + SQL_COO + "," + SQL_VOCAB + "," + SQL_SIGS + """,
bands AS (
    SELECT doc_id, (perm // 4) AS band,
           string_agg(mh::VARCHAR, '_' ORDER BY perm) AS sig
    FROM sigs GROUP BY 1, 2
),
keep AS (SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= 256),
bandsk AS (SELECT b.* FROM bands b JOIN keep USING (band, sig)),
cand AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM bandsk l JOIN bandsk r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
est AS (
    SELECT a, b FROM (
        SELECT cand.a, cand.b,
               avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS ej
        FROM cand
        JOIN sigs sa ON sa.doc_id = cand.a
        JOIN sigs sb ON sb.doc_id = cand.b AND sb.perm = sa.perm
        GROUP BY 1, 2
    ) WHERE ej >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM est UNION SELECT b, a FROM est),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
lab AS (SELECT u AS node, least(u, min(v)) AS label FROM reach GROUP BY u),
base AS (
    SELECT d.doc_id::BIGINT AS doc_id,
           coalesce(l.label, d.doc_id)::BIGINT AS cluster_id
    FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
),
cs AS (SELECT cluster_id, count(*) AS n FROM base GROUP BY 1)
SELECT base.doc_id, base.cluster_id, cs.n::BIGINT AS cluster_size,
       (CASE WHEN base.doc_id = base.cluster_id THEN 1 ELSE 0 END)::INTEGER AS is_canonical
FROM base JOIN cs USING (cluster_id)
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy-dedup grouping: MinHash-LSH candidates
    thresholded at est_jaccard ≥ 0.5 → connected components (pointer-
    jumped smallest-label propagation) → per-doc cluster id / size /
    canonical flag — the keep-one-per-component policy an actual
    curation pipeline applies after candidate generation. The DuckDB
    oracle recomputes the components with a recursive reachability CTE."""
    coo = doc_terms(spark, sf_dir).localCheckpoint(eager=True)
    sigs = D.minhash_signatures(coo).cache()
    pairs = D.minhash_lsh_candidates(sigs).filter(F.col("est_jaccard") >= 0.5)
    return D.dedup_clusters(pairs, load(spark, "documents", sf_dir))


# From-scratch fuzzy dedup over ALL documents with the snapshot-stable
# md5 term ids (dedup.stable_term_id_expr — the DuckDB hex fold mirrors
# Spark's conv(substring(md5(term),1,15),16,10) % P31 bit-for-bit) —
# the independent oracle the INCREMENTAL two-batch ingest must equal.
_INCREMENTAL_DEDUP_ORACLE = r"""
WITH RECURSIVE tok AS (
    SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\s+'))) AS term
    FROM documents
),
ht AS (
    SELECT doc_id,
           (list_reduce(list_prepend(0::BIGINT,
                list_transform(string_split(substring(md5(term), 1, 15), ''),
                    c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)),
            (a, b) -> a * 16 + b)) % 2147483647 AS tid
    FROM tok
),
perms AS (
    SELECT i AS perm,
           ((i + 1) * 12582917) % 2147483647 AS a,
           ((i + 1) * 4256249 + 7) % 2147483647 AS b
    FROM range(0, 16) t(i)
),
sigs AS (
    SELECT doc_id, perm, min((a * tid + b) % 2147483647) AS mh
    FROM ht CROSS JOIN perms GROUP BY 1, 2
),
bands AS (
    SELECT doc_id, (perm // 4) AS band,
           string_agg(mh::VARCHAR, '_' ORDER BY perm) AS sig
    FROM sigs GROUP BY 1, 2
),
keep AS (SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= 256),
bandsk AS (SELECT b.* FROM bands b JOIN keep USING (band, sig)),
cand AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM bandsk l JOIN bandsk r
      ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
est AS (
    SELECT a, b FROM (
        SELECT cand.a, cand.b,
               avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS ej
        FROM cand
        JOIN sigs sa ON sa.doc_id = cand.a
        JOIN sigs sb ON sb.doc_id = cand.b AND sb.perm = sa.perm
        GROUP BY 1, 2
    ) WHERE ej >= 0.5
),
edges AS (SELECT a AS u, b AS v FROM est UNION SELECT b, a FROM est),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
lab AS (SELECT u AS node, least(u, min(v)) AS label FROM reach GROUP BY u),
base AS (
    SELECT d.doc_id::BIGINT AS doc_id,
           coalesce(l.label, d.doc_id)::BIGINT AS cluster_id
    FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
),
cs AS (SELECT cluster_id, count(*) AS n FROM base GROUP BY 1)
SELECT base.doc_id, base.cluster_id, cs.n::BIGINT AS cluster_size,
       (CASE WHEN base.doc_id = base.cluster_id THEN 1 ELSE 0 END)::INTEGER AS is_canonical
FROM base JOIN cs USING (cluster_id)
UNION ALL
SELECT -1::BIGINT, -1::BIGINT, 1::BIGINT, 1::INTEGER
"""


@query("incremental_dedup", oracle=_INCREMENTAL_DEDUP_ORACLE)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CROSS-SNAPSHOT dedup (dedup.dedup_state_ingest): the
    corpus arrives as two deliveries (even doc_ids, then odd doc_ids);
    batch 1 is ingested into an empty persisted state, batch 2 is
    deduped AGAINST that state (snapshot-stable signatures + band join
    + star-edge contraction) and the state is updated. The returned
    full-corpus cluster table must equal the FROM-SCRATCH dedup of
    batch₁ ∪ batch₂, which the DuckDB oracle recomputes independently
    (md5 term ids, recursive-CTE components) — the equality contract a
    100 TB ingest pipeline rests on. Replay safety (re-ingesting a
    delivered batch is a no-op) is pinned in
    tests/test_incremental_dedup.py.

    r11 gates the COMPACTION leg inside the same row:
    compact_dedup_state runs between the two deliveries, so the main
    oracle equality also certifies that compaction preserved every
    state decision (delivery 2 ingests into a compacted state); a
    sentinel member row (doc_id = cluster_id = -1) additionally pins
    that the post-compaction resolve of the bootstrap state equals the
    pre-compaction resolve row-for-row, carried in cluster_size (1 =
    equal) against the oracle's literal 1."""
    import shutil
    import tempfile

    docs = load(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="raft_spark_deltadedup_")
    try:
        r1 = D.dedup_state_ingest(b1, tmp + "/state")
        D.compact_dedup_state(spark, tmp + "/state")
        # multiset equality of the pre-/post-compaction resolves — the
        # same predicate as the r13 one-action full-outer comparison
        # (itself ≡ the original two exceptAll counts), rendered
        # driver-side for small states (resolve_dedup_state_rows reads
        # the compacted overlay via pyarrow, zero scheduled jobs;
        # r1.collect() on a driver-resolved ingest is a local-relation
        # read). Corpus-sized states keep the Spark comparison.
        rows_c = D.resolve_dedup_state_rows(spark, tmp + "/state")
        if rows_c is not None:
            from collections import Counter

            cnt1 = Counter(tuple(r) for r in r1.collect())
            compact_eq = (
                sum(cnt1.values()) > 0 and cnt1 == Counter(rows_c)
            )
        else:
            r1c = D.read_dedup_state(spark, tmp + "/state")[1] \
                .localCheckpoint(eager=True)
            cols = ["doc_id", "cluster_id", "cluster_size", "is_canonical"]
            g1 = r1.groupBy(*cols).agg(F.count("*").alias("_n1"))
            g2 = r1c.groupBy(*cols).agg(F.count("*").alias("_n2"))
            eq_row = g1.join(g2, cols, "full_outer").select(
                F.sum(
                    (F.coalesce("_n1", F.lit(0))
                     != F.coalesce("_n2", F.lit(0))).cast("int")
                ).alias("_mismatch"),
                F.sum("_n1").alias("_n_left"),
            ).first()
            compact_eq = (
                (eq_row["_mismatch"] or 0) == 0
                and (eq_row["_n_left"] or 0) > 0
            )
        out = D.dedup_state_ingest(b2, tmp + "/state")
        # out is eagerly checkpointed by the operator, so removing the
        # state directory underneath it is safe
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    import pyarrow as pa

    flag = spark.createDataFrame(pa.table({
        "doc_id": pa.array([-1], pa.int64()),
        "cluster_id": pa.array([-1], pa.int64()),
        "cluster_size": pa.array([1 if compact_eq else 0], pa.int64()),
        "is_canonical": pa.array([1], pa.int32()),
    }))
    return out.unionByName(flag)


@query(
    "simhash",
    oracle="WITH " + SQL_COO + "," + SQL_VOCAB + """,
votes AS (
    SELECT doc_id, perm AS j,
           sum(tf * (CASE WHEN ((a * tid + b) % 2147483647) % 2 = 1
                          THEN 1 ELSE -1 END)) AS s
    FROM wt CROSS JOIN perms GROUP BY 1, 2
)
SELECT doc_id::BIGINT AS doc_id,
       sum(CASE WHEN s > 0 THEN pow(2, j) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY 1
""",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit weighted SimHash fingerprint per document."""
    out = D.simhash(doc_terms(spark, sf_dir).localCheckpoint(eager=True))
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "simhash")


@query(
    "ngram_jaccard",
    oracle=r"""
WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
shl AS (
    SELECT doc_id,
           list_transform(range(1, greatest(len(ts) - 1, 1)),
                          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shs
    FROM tok
),
sh0 AS (SELECT DISTINCT doc_id, unnest(shs) AS shingle FROM shl),
okshingle AS (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 512),
sh AS (SELECT sh0.* FROM sh0 JOIN okshingle USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
common AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
    FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
)
SELECT a::BIGINT AS a, b::BIGINT AS b,
       round(c / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = common.a
JOIN sizes sb ON sb.doc_id = common.b
""",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard for pairs sharing ≥1 shingle (inverted-index
    candidate join)."""
    # NOTE: deliberately not cached — the shingle subplan is a cheap
    # narrow projection; recomputing it in the 3 consuming branches is
    # faster cold than serializing a cache copy first.
    sh = D.shingles(load(spark, "documents", sf_dir))
    out = D.ngram_jaccard_pairs(sh)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


@query(
    "embedding_neardup",
    oracle="""
SELECT a.vec_id::BIGINT AS a, b.vec_id::BIGINT AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
""",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (τ=0.45). Exact all-pairs
    here; at scale the LSH-bucketed path prunes candidates first."""
    m = embeddings_matrix(spark, sf_dir)
    return SIM.cosine_pairs(m, min_cosine=0.45)


@query(
    "knn_cosine",
    oracle="""
WITH q AS (SELECT * FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
    SELECT q.vec_id AS qid, c.vec_id AS nid,
           round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
    FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
),
ranked AS (
    SELECT qid, nid, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
    FROM scored
)
SELECT qid::BIGINT AS qid, nid::BIGINT AS nid, cosine,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= 5
""",
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the query subset
    (vec_id % 50 = 0): broadcast queries × corpus scan → salted
    two-phase select_k. The exact-baseline ANN path."""
    m = embeddings_matrix(spark, sf_dir)
    queries_df = m.filter(F.col("id") % 50 == 0)
    out = SIM.knn_brute(m, queries_df, k=5)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("nid").cast("long").alias("nid"),
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )


@query(
    "text_stats",
    oracle=r"""
SELECT doc_id::BIGINT AS doc_id,
       len(string_split_regex(text, '\s+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+'))::BIGINT AS re_tokens,
       CASE WHEN regexp_extract_all(text, '[a-zA-Z]') = [] THEN 0.0
            ELSE len(regexp_extract_all(text, '[aeiouAEIOU]'))
                 / len(regexp_extract_all(text, '[a-zA-Z]')) END AS vowel_ratio,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) / length(text) END AS punct_ratio,
       list_reduce(
           list_prepend(0::BIGINT,
               list_transform(string_split(substring(text, 1, 64), ''), c -> ascii(c)::BIGINT)),
           (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), vowel/punct ratios,
    rolling-hash fingerprint — single narrow projection."""
    docs = load(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        TQ.ws_token_count("text").alias("ws_tokens"),
        TQ.re_token_count("text").alias("re_tokens"),
        TQ.vowel_ratio("text").alias("vowel_ratio"),
        TQ.punct_ratio("text").alias("punct_ratio"),
        TQ.fingerprint("text").alias("fingerprint"),
    )


def _pii_oracle() -> str:
    from raft_spark.operators.textquality import PII_PATTERNS as P

    em, ip, ph = P["email"], P["ipv4"], P["phone"]
    return f"""
WITH inj AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' user' || doc_id
                     || '@example.com from 10.0.0.1 call +44 20 7946 0958'
                ELSE text END AS t
    FROM documents
),
red AS (
    SELECT doc_id, t,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{em}', '[PII]', 'g'),
               '{ph}', '[PII]', 'g'),
               '{ip}', '[PII]', 'g') AS rt
    FROM inj
)
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(t, '{em}'))::BIGINT AS n_email,
       len(regexp_extract_all(t, '{ip}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(t, '{ph}'))::BIGINT AS n_phone,
       (CASE WHEN len(regexp_extract_all(t, '{em}'))
                + len(regexp_extract_all(t, '{ip}'))
                + len(regexp_extract_all(t, '{ph}')) > 0
             THEN 1 ELSE 0 END)::INTEGER AS has_pii,
       (CASE WHEN len(regexp_extract_all(rt, '{em}'))
                + len(regexp_extract_all(rt, '{ip}'))
                + len(regexp_extract_all(rt, '{ph}')) > 0
             THEN 1 ELSE 0 END)::INTEGER AS pii_after_redact
FROM red
"""


@query("pii_gate", oracle=_pii_oracle())
def q_pii_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact (textquality.pii_stats / redact_pii) as a
    gate member: the corpus carries no natural PII, so a deterministic
    email/ipv4/phone payload is injected in-query for doc_id % 7 == 0 —
    BOTH engines derive the identical text, count matches with the
    shared RE2-and-Java-safe patterns, run the same three-stage
    redaction chain, and recount (pii_after_redact must be 0 per doc).
    Promoted from pytest-only (r6 verdict: PII was the one curation
    operator with no driver row)."""
    docs = load(spark, "documents", sf_dir)
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0.0.1 call +44 20 7946 0958"),
            ),
        ).otherwise(F.col("text")),
    )
    stats = TQ.pii_stats(injected)
    after = TQ.pii_stats(TQ.redact_pii(injected)).select(
        "doc_id", F.col("has_pii").alias("pii_after_redact")
    )
    return stats.join(after, "doc_id")


@query(
    "lang_quality",
    oracle=r"""
WITH f AS (
    SELECT doc_id, lang, text,
           CASE WHEN regexp_extract_all(text, '[a-zA-Z]') = [] THEN 0.0
                ELSE len(regexp_extract_all(text, '[aeiouAEIOU]'))
                     / len(regexp_extract_all(text, '[a-zA-Z]')) END AS vr,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) / length(text) END AS pr,
           len(string_split_regex(text, '\s+')) AS nt,
           len(list_filter(string_split_regex(text, '\s+'),
               t -> list_contains(['the','a','of','and','to','in','is'], t))) AS stops
    FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       CASE WHEN vr >= 0.40 THEN 'en' WHEN vr >= 0.34 THEN 'es'
            WHEN vr >= 0.28 THEN 'fr' WHEN vr >= 0.22 THEN 'de'
            ELSE 'zh' END AS pred_lang,
       lang AS true_lang,
       round(least(1.0, greatest(0.0,
           0.2 + 1.5 * (CASE WHEN nt = 0 THEN 0.0 ELSE stops / nt END)
               - 2.0 * pr + least(nt, 200) / 500.0)), 6) AS quality
FROM f
""",
)
def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + composite quality score per document."""
    docs = load(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        TQ.lang_id("text").alias("pred_lang"),
        F.col("lang").alias("true_lang"),
        F.round(TQ.quality_score("text"), 6).alias("quality"),
    )


@query(
    "repetition_stats",
    oracle=r"""
WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
g AS (
    SELECT doc_id, ts, list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]) AS bs
    FROM tok
)
SELECT doc_id::BIGINT AS doc_id,
       round(CASE WHEN len(ts) = 0 THEN 0.0
             ELSE (len(ts) - len(list_distinct(ts))) / len(ts) END, 6) AS dup_word_frac,
       round(CASE WHEN len(ts) = 0 THEN 0.0
             ELSE list_max(list_transform(list_distinct(ts),
                  w -> len(list_filter(ts, t -> t = w)))) / len(ts) END, 6) AS top_word_frac,
       round(CASE WHEN len(bs) = 0 THEN 0.0
             ELSE list_max(list_transform(list_distinct(bs),
                  b -> len(list_filter(bs, x -> x = b)))) / len(bs) END, 6) AS top_bigram_frac
FROM g
""",
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition filters (duplicate-word
    fraction, most-frequent word/bigram share) — pure expressions,
    zero shuffle: the narrow pre-filter projection shape."""
    docs = load(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(TQ.dup_word_frac("text"), 6).alias("dup_word_frac"),
        F.round(TQ.top_word_frac("text"), 6).alias("top_word_frac"),
        F.round(TQ.top_bigram_frac("text"), 6).alias("top_bigram_frac"),
    )


@query(
    "contamination",
    oracle=r"""
WITH tokc AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
shc AS (
    SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(ts) - 3, 1)),
        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])) AS shingle
    FROM tokc
),
shb AS (SELECT DISTINCT shingle FROM shc WHERE doc_id % 97 = 0),
hits AS (
    SELECT shc.doc_id, count(*) AS h
    FROM shc JOIN shb USING (shingle) GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(h, 0)::BIGINT AS bench_hits,
       (CASE WHEN coalesce(h, 0) > 0 THEN 1 ELSE 0 END)::INTEGER AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
""",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-benchmark decontamination: flag documents sharing ≥1 word
    5-gram with the benchmark subset (doc_id % 97 = 0; benchmark docs
    flag themselves by construction). Broadcast join against the tiny
    benchmark shingle set — no corpus-sized shuffle."""
    docs = load(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return TQ.contamination(docs, bench, n=5)


@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id::BIGINT AS doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (16 + ascii(substring(text, 1, 1)) % 64)::INTEGER AS width,
       (16 + octet_length(encode(text)) % 64)::INTEGER AS height,
       'FAKE' AS format
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: utf-8 payload → mapInPandas (Arrow
    batches) → typed metadata. The decoder is a deterministic stub
    (real image libs absent); the Spark-side schema/batch path is
    real and this oracle checks the full pipeline output."""
    frame = MM.with_binary_payload(load(spark, "documents", sf_dir))
    return MM.decode_image_meta(frame)



def ann_shared(spark: SparkSession, sf_dir: str):
    """Shared ANN-gate fixtures: (corpus m, queries, n_q, exact top-5)
    computed ONCE and passed into every ann_recall_suite member — the
    suite previously re-ran the identical knn_brute six times (63 s of
    redundant exact scans per gate pass). Standalone member queries
    still build their own when called directly."""
    m = embeddings_matrix(spark, sf_dir).select("id", "features") \
        .localCheckpoint(eager=True)
    queries = m.filter(F.col("id") % 50 == 0)
    n_q = queries.count()
    exact = SIM.knn_brute(m, queries, k=5).localCheckpoint(eager=True)
    return m, queries, n_q, exact


@query(
    "knn_ivf_recall",
    # The k-means quantizer is deterministic but not SQL-expressible;
    # the adjudicable contract is the recall floor: the query emits
    # recall@5 >= 0.5 as an int, the oracle the literal 1. A quantizer
    # or probe regression drops recall and reddens the row (the exact
    # recall value is pinned by tests/test_similarity_ivf.py).
    oracle="SELECT 1::INTEGER AS recall_ok",
)
def q_knn_ivf_recall(spark: SparkSession, sf_dir: str, shared=None) -> DataFrame:
    """IVF ANN (spherical k-means coarse quantizer, 8 lists, 3 probes)
    scored by recall@5 against the exact brute-force neighbors — the
    scale path for similarity search (probe fraction bounds candidate
    volume at n_probe/n_lists of brute force)."""
    m, queries, n_q, exact = shared or ann_shared(spark, sf_dir)
    approx = SIM.knn_ivf(m, queries, k=5, n_lists=8, n_probe=3, kmeans_iters=2)
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (n_q * 5.0)
    return spark.createDataFrame(
        [(int(recall >= 0.5),)], "recall_ok int"
    )


@query(
    "pairwise_dist",
    oracle="""
SELECT a.vec_id::BIGINT AS a, b.vec_id::BIGINT AS b,
       round(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
""",
)
def q_pairwise_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise L2 distances (reference distance namespace) over
    the blocked block-pair join — never a nested-loop broadcast —
    on the vec_id % 10 subset (all-pairs output is O(n²) by nature)."""
    m = embeddings_matrix(spark, sf_dir).filter(F.col("id") % 10 == 0)
    return SIM.pairwise_distances(m, metric="l2").select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("dist"),
    )


@query(
    "knn_pq_recall",
    # PQ codebooks (sampled k-means) are deterministic but not
    # SQL-expressible; the adjudicable contract is the recall floor
    # against exact brute force, same pattern as knn_ivf_recall (the
    # exact recall value is pinned by tests/test_similarity_ivf.py).
    oracle="SELECT 1::INTEGER AS recall_ok",
)
def q_knn_pq_recall(spark: SparkSession, sf_dir: str, shared=None) -> DataFrame:
    """Product-quantization ANN (16 subspaces × 16 codes, ADC lookup
    scoring over compressed codes, exact refinement of the 8k-deep
    shortlist) scored by recall@5 against exact brute force — the
    memory-compression scale path: corpus floats are replaced by m
    small ints, so a 100 TB embedding table ADC-scans from a few TB
    of codes."""
    m, queries, n_q, exact = shared or ann_shared(spark, sf_dir)
    approx = SIM.knn_pq(m, queries, k=5, m_subspaces=16, n_codes=16, refine_factor=8)
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (n_q * 5.0)
    return spark.createDataFrame([(int(recall >= 0.5),)], "recall_ok int")


@query(
    "multimodal_frames",
    oracle="""
SELECT doc_id::BIGINT AS doc_id,
       unnest(range(0, greatest(octet_length(encode(text)) // 256, 1)))::BIGINT AS frame_idx
FROM documents
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per 256-byte payload window —
    the explode-to-frames / process-per-frame / re-aggregate shape of
    video pipelines, with the decode stubbed (multimodal.py)."""
    frame = MM.with_binary_payload(load(spark, "documents", sf_dir))
    out = MM.frame_sample(frame, every_n_bytes=256)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
    )


def q_ivf_pq_checks(spark: SparkSession, sf_dir: str, shared=None) -> DataFrame:
    """IVF-PQ (neighbors/ivf_pq.cuh semantics) gate members — the
    round-3 verdict's 'pytest-only' gap closed: (method, recall_ok)
    rows for (a) the recall@5 floor of the composite coarse-quantizer
    + residual-PQ + refine path, (b) probe monotonicity — recall at
    n_probe=n_lists must be ≥ recall at n_probe=1 (the reference's
    probe/recall contract), and (c) the persistent index round-trip —
    querying a write_ivf_pq_index → read_ivf_pq_index copy must return
    the identical neighbor set (index maintenance is ordinary parquet
    IO, so a reloaded index IS the index). One index build shared by
    all three members; exact recall values pinned in
    tests/test_similarity_ivf.py."""
    m, queries, n_q, exact = shared or ann_shared(spark, sf_dir)
    index = SIM.build_ivf_pq_index(m, n_lists=8, m_subspaces=16, n_codes=16)
    index["codes"] = index["codes"].localCheckpoint(eager=True)

    def recall(n_probe: int, idx: dict) -> tuple[float, set]:
        approx = SIM.knn_ivf_pq(
            m, queries, k=5, n_probe=n_probe, refine_factor=8, index=idx
        )
        pairs = {(r["qid"], r["nid"]) for r in approx.select("qid", "nid").collect()}
        hits = sum((q, n) in pairs for q, n in (
            (r["qid"], r["nid"]) for r in exact.select("qid", "nid").collect()
        ))
        return hits / (n_q * 5.0), pairs

    r_low, _ = recall(1, index)
    # n_probe=4: observed recall ~0.70 at sf0.01 (2 probes sit at 0.46,
    # just under the 0.5 floor — the curve is 0.26/0.46/0.70/0.94 for
    # 1/2/4/8 probes, pinned by the probe-monotonicity member below)
    r_mid, pairs_mid = recall(4, index)
    r_full, _ = recall(8, index)

    # unique dir per run: a fixed path races when two gate replicas run
    # concurrently on one host (writer A overwrites while reader B is
    # mid-roundtrip → spurious roundtrip failure); removed afterwards so
    # repeated gate runs don't accumulate indexes in /tmp
    import shutil
    import tempfile

    import numpy as np

    tmp = tempfile.mkdtemp(prefix="raft_spark_ivfpq_")
    try:
        SIM.write_ivf_pq_index(index, tmp + "/index")
        loaded = SIM.read_ivf_pq_index(spark, tmp + "/index")
        _, pairs_loaded = recall(4, loaded)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # r9 (promoted from tests/test_pq_and_clusters.py): the sidecar
    # NUMERIC state (centroids + PQ codebooks) must survive the
    # round-trip bit-for-bit, not just the neighbor set — a lossy
    # sidecar could still return equal neighbors on the gate corpus
    # while corrupting a larger index
    sidecar_eq = int(
        np.array_equal(loaded["centroids"], index["centroids"])
        and np.array_equal(loaded["codebooks"], index["codebooks"])
    )

    # r9 delta-extend member (the reference's build/extend split,
    # neighbors/ivf_pq.cuh): build the index MODEL on the even half,
    # persist, ivf_pq_index_add the odd half. The grown index must
    # (a) hold exactly one code row per corpus id, (b) have left the
    # original half's rows byte-identical (append-only), and (c) still
    # answer queries at the recall floor probing all lists. The
    # codes-level equality vs a frozen-model from-scratch encode is
    # pinned in tests/test_pq_and_clusters.py.
    half = m.filter(F.col("id") % 2 == 0)
    idx_h = SIM.build_ivf_pq_index(half, n_lists=8, m_subspaces=16, n_codes=16)
    idx_h["codes"] = idx_h["codes"].localCheckpoint(eager=True)
    tmp2 = tempfile.mkdtemp(prefix="raft_spark_ivfpq_delta_")
    try:
        SIM.write_ivf_pq_index(idx_h, tmp2 + "/index")
        n_added = SIM.ivf_pq_index_add(
            m.filter(F.col("id") % 2 == 1), tmp2 + "/index"
        )
        grown = SIM.read_ivf_pq_index(spark, tmp2 + "/index")
        gcodes = grown["codes"].localCheckpoint(eager=True)
        n_corpus = m.count()
        complete = (
            gcodes.count() == n_corpus
            and gcodes.select("id").distinct().count() == n_corpus
            and n_added > 0
        )
        old_rows = gcodes.filter(F.col("id") % 2 == 0) \
            .select("id", "codes", "list_id")
        base_rows = idx_h["codes"].select("id", "codes", "list_id")
        untouched = (
            old_rows.exceptAll(base_rows).count() == 0
            and base_rows.exceptAll(old_rows).count() == 0
        )
        grown["codes"] = gcodes
        r_grown, pairs_grown = recall(8, grown)
        delta_eq = int(complete and untouched and r_grown >= 0.5)
        # r11 compaction member: ivf_pq_index_compact is a pure
        # file-layout rewrite — the compacted codes must be
        # content-identical to the delta-grown index AND answer the
        # same queries (ingest → compact → lookup equality)
        SIM.ivf_pq_index_compact(spark, tmp2 + "/index")
        comp = SIM.read_ivf_pq_index(spark, tmp2 + "/index")
        ccodes = comp["codes"].localCheckpoint(eager=True)
        csel = ccodes.select("id", "codes", "list_id")
        gsel = gcodes.select("id", "codes", "list_id")
        cdiff = csel.exceptAll(gsel).count() + gsel.exceptAll(csel).count()
        comp["codes"] = ccodes
        _, pairs_comp = recall(8, comp)
        compact_eq = int(
            cdiff == 0 and pairs_comp == pairs_grown and len(pairs_grown) > 0
        )
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)

    rows = [
        ("ivf_pq", int(r_mid >= 0.5)),
        ("ivf_pq_probe_mono", int(r_full >= r_low)),
        ("ivf_pq_roundtrip", int(pairs_loaded == pairs_mid and len(pairs_mid) > 0)),
        ("ivf_pq_sidecar_eq", sidecar_eq),
        ("ivf_pq_delta_eq", delta_eq),
        ("ivf_pq_compact_eq", compact_eq),
    ]
    return spark.createDataFrame(rows, "method string, recall_ok int")


@query(
    "duplicated_spans",
    oracle=r"""
WITH bt AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS ntok
    FROM documents
),
pos AS (
    SELECT doc_id, w, unnest(range(0, ntok - 7)) AS start
    FROM bt WHERE ntok >= 8
),
sh AS (
    SELECT doc_id, start,
           md5(array_to_string(w[start + 1 : start + 8], ' ')) AS h
    FROM pos
),
dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 2),
cov AS (
    SELECT DISTINCT s.doc_id, s.start + x.j AS p
    FROM sh s JOIN dup USING (h), range(0, 8) x(j)
),
cnt AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
SELECT bt.doc_id::BIGINT AS doc_id, ntok::BIGINT AS n_tokens,
       coalesce(cnt.dup_tokens, 0)::BIGINT AS dup_tokens,
       floor(coalesce(cnt.dup_tokens, 0) * 1000000.0
             / greatest(ntok, 1))::BIGINT AS dup_frac_ppm
FROM bt LEFT JOIN cnt USING (doc_id)
""",
)
def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication stats (dedup.duplicated_spans): per-doc
    count and ppm fraction of token positions covered by an 8-token
    window that repeats anywhere in the corpus — exact integer/string
    pipeline after tokenization, mirrored clause-for-clause in SQL."""
    return D.duplicated_spans(load(spark, "documents", sf_dir), n=8, min_count=2)


@query(
    "semantic_dedup",
    # Full-pipeline oracle: axis-sign bucket assignment (SQL-exact), the
    # 10^8*S^2 >= tau_q^2*Na*Nb integer cosine predicate in HUGEINT, and
    # min-label closure for the groups — zero float arithmetic after the
    # shared quantization, so every row is engine-exact.
    oracle="""
WITH RECURSIVE v AS (
    SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings
),
q AS (
    SELECT id,
           ((CASE WHEN e[1] > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN e[2] > 0 THEN 2 ELSE 0 END)
          + (CASE WHEN e[3] > 0 THEN 4 ELSE 0 END)
          + (CASE WHEN e[4] > 0 THEN 8 ELSE 0 END)
          + (CASE WHEN e[5] > 0 THEN 16 ELSE 0 END)
          + (CASE WHEN e[6] > 0 THEN 32 ELSE 0 END)
          + (CASE WHEN e[7] > 0 THEN 64 ELSE 0 END)
          + (CASE WHEN e[8] > 0 THEN 128 ELSE 0 END)) AS cluster,
           list_transform(e, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv
    FROM v
),
n AS (
    SELECT id, cluster, qv,
           CAST(list_dot_product(qv, qv) AS BIGINT) AS n2
    FROM q
),
pairs AS (
    SELECT a.id AS a, b.id AS b
    FROM n a JOIN n b ON a.cluster = b.cluster AND a.id < b.id
    WHERE CAST(list_dot_product(a.qv, b.qv) AS BIGINT) > 0
      AND 100000000::HUGEINT
          * CAST(list_dot_product(a.qv, b.qv) AS HUGEINT)
          * CAST(list_dot_product(a.qv, b.qv) AS HUGEINT)
          >= 84640000::HUGEINT * a.n2::HUGEINT * b.n2::HUGEINT
),
sym AS (
    SELECT a AS row, b AS col FROM pairs
    UNION ALL SELECT b, a FROM pairs
),
reach AS (
    SELECT row AS node, row AS lab FROM sym
    UNION
    SELECT s.col AS node, r.lab FROM reach r JOIN sym s ON s.row = r.node
),
grp AS (SELECT node, min(lab) AS g FROM reach GROUP BY node)
SELECT n.id::BIGINT AS id, n.cluster::BIGINT AS cluster,
       coalesce(g.g, n.id)::BIGINT AS grp,
       (CASE WHEN coalesce(g.g, n.id) = n.id THEN 1 ELSE 0 END)::INTEGER AS keep
FROM n LEFT JOIN grp g ON g.node = n.id
""",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding-level dedup (dedup.semantic_dedup) over
    the embeddings table: per-id (cluster, duplicate-group, keep flag)
    at cosine ≥ 0.92. The gate variant assigns clusters by the
    deterministic axis-sign bucket of the first 8 dims (SQL-exact;
    production passes k-means/IVF assignments through the same seam);
    the within-cluster cosine predicate and the min-label groups are
    exact-integer on both engines — no float after quantization."""
    m = embeddings_matrix(spark, sf_dir).select("id", "features")
    bucket = None
    for j in range(8):
        bit = (F.col("features")[j] > 0).cast("long") * (2 ** j)
        bucket = bit if bucket is None else bucket + bit
    asg = m.select("id", bucket.alias("cluster"))
    out = D.semantic_dedup(m, tau=0.92, assignments=asg)
    return out.select(
        "id", "cluster", F.col("group").alias("grp"), "keep"
    )


def q_knn_lsh_checks(spark: SparkSession, sf_dir: str, shared=None) -> DataFrame:
    """Multi-table LSH ANN (similarity.knn_lsh n_tables — the
    documented multi-probe path, r4) gate members: (a) recall@5 floor
    0.5 at 4 planes × 8 tables (observed 0.66 at sf0.001, 0.78 at
    sf0.01 — margin at both gate scales; LSH is fully deterministic:
    LCG plane banks, exact rounded cosine), and (b) table
    monotonicity — recall at 8 tables ≥ recall at 2 (candidate sets
    are supersets by construction; a regression in the per-table
    seeding or the union/dedup breaks exactly this)."""
    m, queries, n_q, exact = shared or ann_shared(spark, sf_dir)

    def recall(n_tables: int) -> float:
        approx = SIM.knn_lsh(m, queries, k=5, n_planes=4, n_tables=n_tables)
        hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
        return hits / (n_q * 5.0)

    r2t = recall(2)
    r8t = recall(8)
    rows = [
        ("lsh", int(r8t >= 0.5)),
        ("lsh_table_mono", int(r8t >= r2t)),
    ]
    return spark.createDataFrame(rows, "method string, recall_ok int")


def q_knn_graph_checks(
    spark: SparkSession, sf_dir: str, shared=None, graph=None
) -> DataFrame:
    """Graph-ANN serving gate members (similarity.knn_graph_search —
    the CAGRA-style beam walk over the nn_descent graph, r4):
    (a) recall@5 floor 0.5 at 3 rounds × beam 32 (observed 1.0 at
    sf0.001, 0.96 at sf0.01 — the walk converges to near-exact on this
    corpus), (b) round monotonicity — recall at 3 rounds ≥ recall at
    1 (the frontier unions into its own expansion). Both deterministic:
    seeded nn_descent build + deterministic tie-broken select_k."""
    m, queries, n_q, exact = shared or ann_shared(spark, sf_dir)
    if graph is None:
        graph = SIM.nn_descent_graph(m, k=10).select("id", "nid") \
            .localCheckpoint(eager=True)

    def recall(rounds: int) -> float:
        approx = SIM.knn_graph_search(
            m, queries, graph=graph, k=5, beam=32, n_rounds=rounds
        )
        hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
        return hits / (n_q * 5.0)

    r1 = recall(1)
    r3 = recall(3)
    rows = [
        ("graph", int(r3 >= 0.5)),
        ("graph_round_mono", int(r3 >= r1)),
    ]
    return spark.createDataFrame(rows, "method string, recall_ok int")


def q_nn_descent_recall(spark: SparkSession, sf_dir: str, graph=None) -> DataFrame:
    """NN-descent all-neighbors graph (similarity.nn_descent_graph,
    seeded = deterministic) scored by edge recall vs the exact
    brute-force kNN graph — the graph-ANN build path. Floor 0.5;
    observed ~0.81 on the structureless uniform embeddings (the hard
    case; clustered data converges to ~1.0, pinned in pytest)."""
    m = embeddings_matrix(spark, sf_dir).select("id", "features") \
        .localCheckpoint(eager=True)
    exact = SIM.knn_brute(m, m, k=10).select(
        F.col("qid").alias("id"), "nid"
    )
    approx = (
        graph if graph is not None
        else SIM.nn_descent_graph(m, k=10, n_iters=4).select("id", "nid")
    )
    n_exact = exact.count()
    hits = approx.join(exact, ["id", "nid"], "left_semi").count()
    return spark.createDataFrame(
        [(int(hits / n_exact >= 0.5),)], "recall_ok int"
    )


@query(
    "data_mixture",
    oracle=r"""
WITH spec AS (
    SELECT source,
           CAST(regexp_extract(source, '[0-9]+') AS BIGINT) AS s
    FROM (SELECT DISTINCT source FROM documents)
),
d AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(text, '\s+'),
                           x -> x <> ''))::BIGINT AS ntok,
           (((doc_id % 2147483647) + 2147483648) % 2147483647)
               * 48271 % 2147483647 * 279470273
               % 2147483647 AS pri
    FROM documents
),
j AS (
    SELECT d.*, 100000 + 40000 * s AS rate_ppm,
           400 + 120 * s AS token_budget
    FROM d JOIN spec USING (source)
),
r AS (
    SELECT *,
           sum(ntok) OVER (PARTITION BY source ORDER BY pri, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM j
)
SELECT doc_id::BIGINT AS doc_id, source, ntok::BIGINT AS ntok,
       (CASE WHEN pri % 1000000 < rate_ppm
             THEN 1 ELSE 0 END)::INTEGER AS keep_frac,
       cum_tokens::BIGINT AS cum_tokens,
       (CASE WHEN cum_tokens <= token_budget
             THEN 1 ELSE 0 END)::INTEGER AS keep_budget
FROM r
""",
)
def q_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing (mixing.stratified_sample +
    mixing.token_budget_mixture): each source contributes (a) a
    Bernoulli fraction rate_ppm and (b) a token-budget prefix, both
    derived from the source index so the spec is self-contained. Every
    decision is exact BIGINT arithmetic (two-step LCG priority), so the
    oracle recomputes the identical kept sets clause-for-clause."""
    from raft_spark.operators import mixing as MIX

    docs = load(spark, "documents", sf_dir)
    s = F.regexp_extract("source", r"([0-9]+)", 1).cast("long")
    # the spec is ~20 rows; derive once (eager) so the two mixture
    # passes don't each re-aggregate the corpus for it — a real caller
    # passes the mixture weights as a literal dim table instead
    spec = docs.select("source").distinct().select(
        "source",
        (F.lit(100_000) + F.lit(40_000) * s).alias("rate_ppm"),
        (F.lit(400) + F.lit(120) * s).alias("token_budget"),
    ).localCheckpoint(eager=True)
    ntok = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != "")
    ).cast("long")
    d = docs.select("doc_id", "source", ntok.alias("ntok"))
    out = MIX.stratified_sample(
        d, spec.select("source", "rate_ppm"), id_col="doc_id",
        strata_col="source",
    )
    out = MIX.token_budget_mixture(
        out, spec.select("source", "token_budget"), token_col="ntok",
        id_col="doc_id", strata_col="source",
    )
    return out.select(
        "doc_id", "source", "ntok", "keep_frac", "cum_tokens",
        "keep_budget",
    )
