"""The README's end-to-end curation pipeline, executed for real:
filter → decontaminate → fuzzy-dedup → rebalance → pack → JSONL out.
Asserts the structural contracts of each stage rather than golden
values (quality thresholds keep some docs, dedup only removes
non-canonicals, packs respect the budget, output shards parse back)."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_spark.functions.rng import stratified_sample
from raft_spark.operators import dedup as D
from raft_spark.operators import textquality as TQ
from raft_spark.operators.packing import pack_sequences
from raft_spark.sources.tables import load


def test_readme_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = load(spark, "documents", sf_dir)
    n_docs = docs.count()

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    keep = (
        docs.withColumn("quality", TQ.quality_score("text"))
        .withColumn("dup_frac", TQ.dup_word_frac("text"))
        .filter((F.col("quality") >= 0.3) & (F.col("dup_frac") <= 0.8))
        .join(TQ.contamination(docs, bench, n=5), "doc_id")
        .filter(F.col("contaminated") == 0)
    )
    n_keep = keep.count()
    assert 0 < n_keep < n_docs  # filters bite but don't wipe the corpus

    sigs = D.minhash_signatures(
        keep.select("doc_id", F.explode(F.split("text", r"\s+")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    pairs = D.minhash_lsh_candidates(sigs).filter(F.col("est_jaccard") >= 0.5)
    clusters = D.dedup_clusters(pairs, keep)
    assert clusters.count() == n_keep
    deduped = keep.join(
        clusters.filter(F.col("is_canonical") == 1).select("doc_id"), "doc_id"
    )
    n_dedup = deduped.count()
    n_dups = clusters.filter(F.col("is_canonical") == 0).count()
    assert n_dedup == n_keep - n_dups

    mixed = stratified_sample(
        deduped, "lang", {"en": 0.9, "zh": 0.9}, id_col="doc_id", default_frac=0.5
    )
    n_mixed = mixed.count()
    assert 0 < n_mixed <= n_dedup

    from raft_spark.operators.mixing import token_budget_mixture

    budgets = mixed.select("source").distinct().select(
        "source", F.lit(2_000).alias("token_budget")
    )
    capped = token_budget_mixture(
        mixed.withColumn("ntok", TQ.ws_token_count("text")), budgets,
        token_col="ntok", id_col="doc_id", strata_col="source",
    ).filter("keep_budget = 1")
    n_capped = capped.count()
    assert 0 < n_capped <= n_mixed
    over_budget = (
        capped.groupBy("source").agg(F.sum("ntok").alias("t"))
        .filter(F.col("t") > 2_000).count()
    )
    assert over_budget == 0
    mixed = capped

    packed = pack_sequences(mixed, budget=512)
    assert packed.count() == n_capped
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.max("truncated").alias("tr"))
        .filter((F.col("t") > 512) & (F.col("tr") == 0))
        .count()
    )
    assert over == 0

    from raft_spark.sources.tables import read_jsonl_corpus, write_jsonl_corpus

    out = mixed.select("doc_id", "lang", "text").join(
        packed.select("doc_id", "pack_id"), "doc_id"
    )
    p = str(tmp_path / "corpus_out")
    write_jsonl_corpus(out, p, partitions=2)
    back = read_jsonl_corpus(spark, p, schema="doc_id long, lang string, text string, pack_id long")
    assert back.count() == n_capped
