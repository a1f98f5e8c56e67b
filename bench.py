"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count() over the result — forces
full materialization without driver-side row transfer). A warmup query
absorbs session/JIT startup so per-query numbers measure the plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import raft_spark.queries  # noqa: E402, F401  (registration side-effects)
from raft_spark.queries.registry import QUERIES  # noqa: E402  (ALL members, not just the curated gate)
from raft_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, the scale-relevant ones.
HEADLINE = [
    "bm25_topk",          # text encoding + window normalize + grouped top-k
    "tfidf",              # aggregate + join encoding
    "row_norms",          # zero-shuffle per-row reduction
    "col_moments",        # column-direction reduction (posexplode + partial agg)
    "covariance",         # 64x64 gram / centered cross-products
    "select_k_dense",     # per-row top-k
    "histogram_events",   # fixed-width binning
    "reduce_rows_by_key", # grouped row-sum (k-means update shape)
    "cluster_metrics",    # contingency-derived metric stack
    "coo_dedup_max",      # sparse dedup groupBy
    "symmetrize_graph",   # union + re-aggregate
    "spmm",               # sparse x dense join-agg
    "gemm",               # long-form matmul
    "minhash_lsh",        # signature + band join dedup
    "simhash",            # bit-vote fingerprint
    "ngram_jaccard",      # shingle inverted-index join
    "knn_cosine",         # brute-force ANN baseline + salted top-k
    "knn_pq_recall",      # PQ-compressed ADC scan + exact refine (vs brute)
    "dedup_clusters",     # LSH candidates -> connected components -> clusters
    "semantic_dedup",     # embedding clusters -> exact-int cosine pairs -> CC
    "duplicated_spans",   # repeated n-gram windows -> covered positions
    "exact_dedup",        # content-hash dedup
    "text_stats",         # narrow text projection stack
    "lang_quality",       # narrow text projection stack
    "rng_distributions",  # generator throughput
    "sample_without_replacement",  # exp-sort weighted sampling
    "select_k_csr",       # per-group top-k over sparse long form
    "masked_matmul",      # mask-join-pruned pairwise dot products
    "matrix_gather",      # broadcast-join row gather
    "sort_cols_per_row",  # in-row sort (zero shuffle)
    "stream_windowed_moments",  # structured-streaming incremental agg
    "data_mixture",       # stratified + token-budget corpus mixing
    "asof_suite",         # as-of joins, all strategies + banded range join
    "rolling_suite",      # trailing-window features: sliding/prefix/skew/auto
    "incremental_dedup",  # cross-snapshot delta dedup vs persisted state
    "pagerank",           # integer-exact iterative join-agg (12 rounds)
    "dbscan",             # quantized eps-pairs -> core/border/noise
    "triangles",          # wedge-join exact triangle count
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="raft_spark_bench")

    # Warmup: session + codegen + parquet footer reads, plus one tiny
    # mapInPandas to fork the Python/Arrow worker pool (long-lived on a
    # real cluster; without this the first Pandas-UDF query pays ~10 s
    # of daemon startup and the bench misattributes it to the plan).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _warm(it):
        # pre-import the heavy per-worker modules so the first real
        # Pandas-UDF query measures its plan, not 32 workers importing
        # numpy/pandas/decimal (long-lived workers on a real cluster)
        import decimal  # noqa: F401

        import numpy  # noqa: F401
        import pandas  # noqa: F401

        return it

    spark.range(64).repartition(32).mapInPandas(_warm, "id long").count()

    # best-of-2: the host shows multi-second noise spikes (same plan
    # measured 0.5 s and 15 s minutes apart); min-of-two passes reports
    # the plan's real cost. Second pass skipped for long queries to
    # bound total bench time.
    import gc

    def _measure(name: str) -> float:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        t = round(time.perf_counter() - t0, 3)
        # drop references to per-query cached/checkpointed RDDs so the
        # ContextCleaner frees their blocks — otherwise 29 queries of
        # accumulated localCheckpoint state degrade later passes
        gc.collect()
        return t

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = _measure(name)
    for name in HEADLINE:
        # re-measure anything under 60 s: the host's noise spikes hit
        # 20-40 s on queries that warm-measure ~2 s, and a one-pass
        # number at that magnitude poisons the whole total
        if timings[name] > 60.0:
            continue
        t = _measure(name)
        spread[name] = abs(t - timings[name]) / max(min(t, timings[name]), 1e-9)
        timings[name] = min(timings[name], t)
    for name in HEADLINE:
        # third pass only where the first two disagreed badly (>50%):
        # both samples may have landed on a noise spike, so neither is
        # trustworthy; one more draw bounds the damage at ~no extra cost
        # in quiet windows
        if spread.get(name, 0.0) <= 0.5 or timings[name] > 60.0:
            continue
        timings[name] = min(timings[name], _measure(name))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # relative pass-to-pass disagreement per query
                # (|t1-t2|/min): lets a reader separate host noise
                # (large spread) from real plan drift (small spread,
                # shifted min) without re-running the bench
                "spreads": {k: round(v, 3) for k, v in sorted(spread.items())},
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
