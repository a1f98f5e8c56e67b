"""Scale probe: the headline distributed paths at 1M+ generated rows
(500x the sf0.1 embeddings table) — evidence that the partition/shuffle
shapes hold well past the driver testdata, not just at toy scale.

Inputs are generated distributed from the counter-based RNG (a narrow
projection — no driver data, no parquet), so the probe isolates
operator cost from scan cost and is reproducible anywhere:

- dense row-vector table N x d: per-row arrays of uniform draws
- gram_matrix (float) vs gram_matrix_exact (int64-quantized, split
  dgemm): the exact pass must stay within ~2x of the float pass
- select_k "partial" over ONE giant group (the skew worst case: task
  state must stay O(k), wall time flat vs grouped)
- knn_brute numpy path: 100 queries against the full corpus

Prints one JSON line; run:  python tools/scale_probe.py [N] [d]
"""

from __future__ import annotations

import os
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from raft_spark.functions.rng import uniform  # noqa: E402
from raft_spark.session import get_spark  # noqa: E402
from tools.datagen import events_table  # noqa: E402


def dense_table(spark, n: int, d: int):
    base = spark.range(n).select(F.col("id"))
    feats = F.array(
        *[uniform(F.col("id") * d + j, seed=7) - F.lit(0.5) for j in range(d)]
    )
    return base.select("id", feats.alias("features"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="raft_spark_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (__import__("numpy"), __import__("pandas"), it)[-1], "id long"
    ).count()

    out: dict[str, float] = {}
    df = dense_table(spark, n, d).localCheckpoint(eager=True)
    out["n_rows"] = df.count()

    from raft_spark.operators.solvers import gram_matrix, gram_matrix_exact

    t = time.perf_counter()
    g, s, cnt = gram_matrix(df)
    out["gram_float_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    gi, si, cnti = gram_matrix_exact(df, scale=1e6)
    out["gram_exact_s"] = round(time.perf_counter() - t, 2)
    assert cnt == cnti == n
    # cross-check: exact integer Gram tracks the float Gram
    err = max(
        abs(gi[i][j] / 1e12 - g[i][j]) for i in range(d) for j in range(d)
    )
    out["gram_max_absdiff"] = round(err, 6)

    from raft_spark.operators.selectk import select_k

    flat = df.select(
        F.lit(0).alias("g"), F.col("id"),
        F.element_at("features", 1).alias("v"),
    )
    t = time.perf_counter()
    k1 = select_k(flat, ["g"], "v", k=16, payload_cols=["id"],
                  strategy="partial").count()
    out["select_k_one_group_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    k1j = select_k(flat, ["g"], "v", k=16, payload_cols=["id"],
                   strategy="jvm").count()
    out["select_k_one_group_jvm_s"] = round(time.perf_counter() - t, 2)
    assert k1j == 16
    grouped = df.select(
        (F.col("id") % 1000).alias("g"), F.col("id"),
        F.element_at("features", 1).alias("v"),
    )
    t = time.perf_counter()
    k2 = select_k(grouped, ["g"], "v", k=16, payload_cols=["id"],
                  strategy="partial").count()
    out["select_k_1000_groups_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    k2j = select_k(grouped, ["g"], "v", k=16, payload_cols=["id"],
                   strategy="jvm").count()
    out["select_k_1000_groups_jvm_s"] = round(time.perf_counter() - t, 2)
    assert k2j == 16_000
    assert k1 == 16 and k2 == 16_000

    from raft_spark.operators.similarity import knn_brute

    queries = df.filter(F.col("id") < 100)
    t = time.perf_counter()
    kn = knn_brute(df, queries, k=10).count()
    out["knn_1m_corpus_100q_s"] = round(time.perf_counter() - t, 2)
    assert kn == 1000

    # text paths: 100k generated docs of 200 words from a 500-word vocab
    from raft_spark.operators import dedup as D
    from raft_spark.operators import textquality as TQ

    words = F.transform(
        F.sequence(F.lit(0), F.lit(199)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.col("id") * 7919 + i * 104729, F.lit(500)).cast("string"),
        ),
    )
    docs = (
        spark.range(100_000)
        .select("id", F.array_join(words, " ").alias("text"))
        .localCheckpoint(eager=True)
    )
    t = time.perf_counter()
    docs.select(
        TQ.top_word_frac("text").alias("a"),
        TQ.top_bigram_frac("text").alias("b"),
        TQ.dup_word_frac("text").alias("c"),
    ).agg(F.sum("a"), F.sum("b"), F.sum("c")).collect()
    out["repetition_100k_docs_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    docs.select(
        D.minhash_signature_expr("text").alias("sig")
    ).select(F.sum(F.element_at("sig", 1))).collect()
    out["minhash_sig_expr_100k_docs_s"] = round(time.perf_counter() - t, 2)

    # ANN scale tiers at the same 1M corpus
    from raft_spark.operators.similarity import knn_ivf

    t = time.perf_counter()
    ki = knn_ivf(df, queries, k=10, n_lists=32, n_probe=4,
                 kmeans_iters=2).count()
    out["knn_ivf_1m_s"] = round(time.perf_counter() - t, 2)
    assert ki == 1000

    # multi-table LSH at the same 1M corpus: one Arrow pass hashes all
    # 8 tables; the (table, bucket) equi-join bounds candidates
    from raft_spark.operators.similarity import knn_lsh

    t = time.perf_counter()
    kl = knn_lsh(df, queries, k=10, n_planes=10, n_tables=8).count()
    out["knn_lsh_8tab_1m_s"] = round(time.perf_counter() - t, 2)
    assert kl >= 900  # sparse buckets may leave a few queries short

    # r6 probes (VERDICT r5 task 3): the curation paths whose 100x
    # behavior sf0.1 cannot witness.

    # semantic_dedup's O(Σc²) seam under a deliberately skewed
    # precomputed assignment: 10% of the corpus in ONE cluster (≈
    # (n/10)² candidate pairs) — the blocked within-cluster self-join
    # must spread that hot cluster over block-pairs, not serialize it
    # on one join key. Run at a 10x-reduced corpus so the cell stays
    # minutes, not hours, on local[32]; the candidate count still
    # dwarfs any sf0.1 input by ~100x.
    from raft_spark.operators.dedup import semantic_pairs_exact

    n_sem = max(n // 10, 10_000)
    sem = df.filter(F.col("id") < n_sem)
    asg = spark.range(n_sem).select(
        "id",
        F.when(F.col("id") < n_sem // 10, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)) + 1)
        .alias("cluster"),
    )
    t = time.perf_counter()
    semantic_pairs_exact(sem, asg, tau=0.92).count()
    out["semantic_pairs_skew_s"] = round(time.perf_counter() - t, 2)

    # span-level dedup at 100k x 200-word docs: window hashing stays
    # in-row, the hash count is the only corpus-wide shuffle, and the
    # covered-position union is bounded by total tokens
    t = time.perf_counter()
    D.duplicated_spans(docs, n=8, min_count=2, id_col="id").agg(
        F.sum("dup_tokens")
    ).collect()
    out["duplicated_spans_100k_docs_s"] = round(time.perf_counter() - t, 2)

    # the distributed rank that underpins quantiles / vocab ids —
    # earlier sections' checkpointed frames are released first so the
    # 10M-row shuffle isn't measured under their memory pressure
    import gc

    del df, docs, queries
    gc.collect()

    from raft_spark.operators.reductions import global_rank

    big = spark.range(10_000_000).select(
        "id", (F.xxhash64("id") % 1_000_000).alias("v")
    ).localCheckpoint(eager=True)
    t = time.perf_counter()
    gr = global_rank(big, ["v", "id"], rank_name="r").count()
    out["global_rank_10m_s"] = round(time.perf_counter() - t, 2)
    assert gr == 10_000_000

    # connected components at 10M candidate edges over ~3M nodes —
    # forces the distributed pointer-jump path (edge count >> the 500k
    # driver-union-find threshold); a sparse random graph at mean
    # degree ~6.7 has a giant component plus long chains, so the
    # O(log V) jump rounds are genuinely exercised
    from raft_spark.operators.solvers import connected_components_auto

    edges = spark.range(10_000_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(3_000_000))).alias("row"),
        (F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(3_000_000))).alias("col"),
    ).localCheckpoint(eager=True)
    t = time.perf_counter()
    nlab = connected_components_auto(edges).count()
    out["cc_10m_edges_s"] = round(time.perf_counter() - t, 2)
    assert nlab > 1_000_000

    # blocked-BLAS dense gemm vs the long-form join-agg plan at
    # 1024³ dense (the join-agg intermediate is m·n·K ≈ 1.07e9 rows;
    # blocked replicates block-level only) — the ≥5x gap is the reason
    # dense operands route to dense_gemm
    from raft_spark.operators.sparse import dense_gemm, gemm as long_gemm

    def _dense_long(nr, nc, seed):
        return spark.range(nr * nc).select(
            (F.col("id") / nc).cast("long").alias("row"),
            (F.col("id") % nc).alias("col"),
            (uniform(F.col("id"), seed=seed) - 0.5).alias("value"),
        )

    ga = _dense_long(1024, 1024, 11).localCheckpoint(eager=True)
    gb = _dense_long(1024, 1024, 12).localCheckpoint(eager=True)
    t = time.perf_counter()
    assert dense_gemm(ga, gb).count() == 1024 * 1024
    out["dense_gemm_blocked_1k_s"] = round(time.perf_counter() - t, 2)
    t = time.perf_counter()
    assert long_gemm(ga, gb).count() == 1024 * 1024
    out["dense_gemm_longform_1k_s"] = round(time.perf_counter() - t, 2)

    # token-budget mixing at 10M docs with ONE stratum holding 50%
    # (the skew worst case for the per-stratum prefix sum): the
    # two-phase path must parallelize the hot stratum across its
    # partition range — a plain per-stratum window would serialize 5M
    # rows into one task
    from raft_spark.operators.mixing import token_budget_mixture

    mix = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(2)) == 0, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("s"), F.pmod(F.xxhash64(F.col("id") + 7), F.lit(50)))
        )
        .alias("source"),
        (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(400)) + 50).alias("ntok"),
    ).localCheckpoint(eager=True)
    specs = [("hot", 600_000_000)] + [(f"s{i}", 12_000_000) for i in range(50)]
    spec = spark.createDataFrame(
        specs, "source string, token_budget long"
    )
    t = time.perf_counter()
    kept = (
        token_budget_mixture(mix, spec, two_phase=True)
        .agg(F.sum("keep_budget")).first()[0]
    )
    out["token_budget_skew_10m_s"] = round(time.perf_counter() - t, 2)
    assert kept and kept > 1_000_000

    # temporal joins at 10M x 10M events / 1000 keys: the as-of window
    # sorts 20M tagged rows once (the aggregate forces the window —
    # count() alone lets Catalyst prune it); the 1s-band range join
    # emits ~10M pairs through the cell equi-join, never a nested loop.
    # Release the earlier sections' checkpointed frames first — a full
    # probe pass otherwise measures these cells under the accumulated
    # block-manager pressure of the 10M-row sections (observed 7x
    # inflation vs the solo best-of-3 recorded in BASELINE.md v6)
    del big, edges, ga, gb, mix, spec
    gc.collect()

    from raft_spark.operators.temporal import asof_join, range_join

    def _ev(n, seed):
        return events_table(spark, n, keys=1000, seed=seed)

    evl, evr = _ev(10_000_000, 1), _ev(10_000_000, 2)
    t = time.perf_counter()
    arow = asof_join(evl, evr, right_cols=("event_id",),
                     tiebreak_col="event_id") \
        .agg(F.sum("gap_us"), F.count("event_id_r").alias("n")).first()
    out["asof_join_10m_s"] = round(time.perf_counter() - t, 2)
    assert arow["n"] == 10_000_000
    t = time.perf_counter()
    npairs = range_join(evl, evr, width_us=1_000_000).count()
    out["range_join_10m_1s_s"] = round(time.perf_counter() - t, 2)
    assert npairs > 1_000_000

    # as-of hot-key escape hatch (r7): 10M left rows on ONE key — the
    # plain window serializes this into a single task; the two-phase
    # skew strategy must land within ~2x of the 1000-key window cell
    # above (the r6 verdict's acceptance bar). Right side 1M rows on
    # the same key (a genuinely hot dimension history).
    from raft_spark.operators.temporal import asof_join_skew

    del evl, evr
    gc.collect()

    def _hot(n, seed):
        # keys=1: pmod(xxhash64, 1) == 0 — the same single hot key
        return events_table(spark, n, keys=1, seed=seed)

    hl, hr = _hot(10_000_000, 3), _hot(1_000_000, 4)
    t = time.perf_counter()
    hrow = asof_join_skew(hl, hr, right_cols=("event_id",),
                          tiebreak_col="event_id") \
        .agg(F.sum("gap_us"), F.count("event_id_r").alias("n")).first()
    out["asof_skew_10m_1key_s"] = round(time.perf_counter() - t, 2)
    assert hrow["n"] > 9_000_000

    # rolling trailing-window twin: 10M rows, ONE key, 1-hour window —
    # the plain RANGE window serializes this; the cell-replicated skew
    # strategy spreads it (ghost duplication = 2x shuffle volume)
    from raft_spark.operators.temporal import rolling_aggregates_skew

    del hr
    gc.collect()
    hv = hl.withColumn("value", (F.col("event_id") % 97).cast("double"))
    t = time.perf_counter()
    rrow = rolling_aggregates_skew(hv, window_us=3_600_000_000) \
        .agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
    out["rolling_skew_10m_1key_s"] = round(time.perf_counter() - t, 2)
    assert rrow["n"] == 10_000_000 and rrow["s"] > 0

    # rolling_route at 10M rows (r8): the dense-frame cell must route
    # to the linear prefix strategy (Spark's sliding RANGE frame is
    # O(rows · frame): this shape — 1000 keys, 1-day span, 1-hour
    # window, ~400 rows per frame — would pay ~4·10⁹ re-aggregations
    # through the sliding form) and the sparse 30-day shape must keep
    # the one-shuffle window.
    from raft_spark.operators.temporal import (
        rolling_aggregates_prefix,
        rolling_route,
    )

    def _vev(n, keys, span_days, seed):
        return events_table(spark, n, keys=keys, seed=seed,
                            span_days=span_days, with_value=True)

    dense = _vev(10_000_000, 1000, 1, 9)
    assert rolling_route(dense) == "prefix"
    # r9: the router no longer has a sliding-window route (the one-pass
    # prefix form matches its shuffle count and beats it at every
    # swept density) — sparse shapes route to prefix too
    sparse_shape = _vev(1_000_000, 1000, 30, 10)
    assert rolling_route(sparse_shape) == "prefix"
    t = time.perf_counter()
    prow = rolling_aggregates_prefix(dense) \
        .agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
    out["rolling_prefix_10m_dense_s"] = round(time.perf_counter() - t, 2)
    assert prow["n"] == 10_000_000 and prow["s"] > 0
    del dense, sparse_shape
    gc.collect()

    # prefix rolling one decade up (r9): 100M rows / 1000 keys / dense
    # frames — the O(rows) claim must hold across a 10× scale-up (cell
    # within ~10× of the 10M one), and the router must still probe its
    # way to prefix on the big input. Opt-in (PROBE_ROLLING_100M=1):
    # ~100-200 s and ~4 GB of checkpoint, too heavy for the default
    # probe loop.
    # incremental cross-snapshot dedup at 1M docs (r9): bootstrap a
    # 1M-doc state, then delta-ingest 50k new docs — the delta must
    # cost a small fraction of the bootstrap (the whole point of
    # persisted-state ingest; measured 78 s vs 13 s). Opt-in:
    # PROBE_INC_DEDUP=1 (~90 s).
    if os.environ.get("PROBE_INC_DEDUP") == "1":
        import shutil
        import tempfile

        from raft_spark.operators.dedup import dedup_state_ingest

        def _docs(n, id_off, seed):
            # 100-word docs from a 5000-word vocab; ~1% near-dup pairs
            # via id aliasing (i and i+1 share the generator @ i%97==0)
            base = (
                F.when((F.col("id") % 97 == 0) & (F.col("id") + 1 < n),
                       F.col("id"))
                .when(F.col("id") % 97 == 1, F.col("id") - 1)
                .otherwise(F.col("id"))
            )
            ws = F.transform(
                F.sequence(F.lit(0), F.lit(99)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod((base + id_off) * 7919 + i * 104729 + seed,
                           F.lit(5000)).cast("string"),
                ),
            )
            return spark.range(n).select(
                (F.col("id") + id_off).alias("doc_id"),
                F.array_join(ws, " ").alias("text"),
            ).localCheckpoint(eager=True)

        # r10: TWO corpus sizes — the O(delta) state claim is 'the same
        # 50k delta costs the same against a 1M corpus and a 2M corpus'
        # (return_full=False measures the ingest path alone; the full-
        # table resolve is a read-side O(corpus) agg the production
        # consumer doesn't pay per delivery)
        for scale in (1, 2):
            n_corpus = scale * 1_000_000
            corpus = _docs(n_corpus, 0, 0)
            delta = _docs(50_000, n_corpus, 3)
            tmpd = tempfile.mkdtemp(prefix="raft_spark_incdedup_")
            try:
                t = time.perf_counter()
                dedup_state_ingest(corpus, tmpd + "/s")
                out[f"incdedup_bootstrap_{scale}m_docs_s"] = round(
                    time.perf_counter() - t, 2
                )
                t = time.perf_counter()
                dedup_state_ingest(delta, tmpd + "/s", return_full=False)
                out[f"incdedup_delta_50k_into_{scale}m_s"] = round(
                    time.perf_counter() - t, 2
                )
                t = time.perf_counter()
                from raft_spark.operators.dedup import read_dedup_state

                n_res = read_dedup_state(spark, tmpd + "/s")[1].count()
                out[f"incdedup_resolve_{scale}m_s"] = round(
                    time.perf_counter() - t, 2
                )
                assert n_res == n_corpus + 50_000
            finally:
                shutil.rmtree(tmpd, ignore_errors=True)
            del corpus, delta
            gc.collect()

    if os.environ.get("PROBE_ROLLING_100M") == "1":
        big = _vev(100_000_000, 1000, 10, 11)  # 10-day span: ~417-row frames
        assert rolling_route(big) == "prefix"
        # best-of-2: the first pass pays cold page-cache on the 100M
        # checkpoint blocks (measured 17-62 s run-to-run on one host);
        # the min is the plan-cost record, matching bench.py discipline
        best = None
        for _ in range(2):
            t = time.perf_counter()
            brow = rolling_aggregates_prefix(big) \
                .agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
            assert brow["n"] == 100_000_000 and brow["s"] > 0
        out["rolling_prefix_100m_dense_s"] = round(best, 2)
        del big
        gc.collect()

    # asof_join_auto router at 10M left rows (r8): three shaped inputs,
    # one per physical strategy — asof_route must pick broadcast for a
    # dimension-sized right, skew for a hot-key left past the broadcast
    # gate, window otherwise; each cell then times the routed join
    # end-to-end (probe cost included — that IS auto's price).
    from raft_spark.operators.temporal import asof_join_auto, asof_route

    del hl, hv
    gc.collect()

    cells = [
        # (name, left_rows, left_keys, right_rows, right_keys, expect)
        ("auto_bcast", 10_000_000, 1000, 100_000, 1000, "broadcast"),
        ("auto_skew", 10_000_000, 1, 2_000_000, 1, "skew"),
        ("auto_window", 10_000_000, 1000, 2_000_000, 1000, "window"),
    ]

    def _keyed(n, keys, seed):
        return events_table(spark, n, keys=keys, seed=seed)

    for name, nl, kl, nr, kr, expect in cells:
        al, ar = _keyed(nl, kl, 5), _keyed(nr, kr, 6)
        got = asof_route(al, ar)
        assert got == expect, f"{name}: routed {got}, expected {expect}"
        t = time.perf_counter()
        row = asof_join_auto(al, ar, right_cols=("event_id",),
                             tiebreak_col="event_id") \
            .agg(F.sum("gap_us"), F.count("event_id_r").alias("n")).first()
        out[f"asof_{name}_10m_s"] = round(time.perf_counter() - t, 2)
        assert row["n"] > 9_000_000
        del al, ar
        gc.collect()

    # r9 ANN additions (opt-in, PROBE_ANN_R9=1): exact shortlist refine
    # at 1M corpus (cost ∝ candidate count + one corpus scan for the
    # nid join — NOT Q·N), and balanced vs plain quantizer training at
    # k=64 (the split rounds add ≤ n_adjust count-passes + bounded
    # sample collects on top of Lloyd).
    if os.environ.get("PROBE_ANN_R9") == "1":
        from raft_spark.operators.similarity import (
            balanced_centroids, ivf_assign, kmeans_centroids, knn_refine,
        )

        corpus = dense_table(spark, 1_000_000, 64).localCheckpoint(eager=True)
        queries = corpus.filter(F.col("id") % 10_000 == 0)  # 100 queries
        cands = queries.select(F.col("id").alias("qid")).crossJoin(
            spark.range(64).select((F.col("id") * 13_777 + 7).alias("nid"))
        )
        t = time.perf_counter()
        nref = knn_refine(cands, corpus, queries, k=10,
                          metric="cosine").count()
        out["refine_1m_100q_64cand_s"] = round(time.perf_counter() - t, 2)
        assert nref == 100 * 10

        for nm, trainer in (("kmeans_plain", kmeans_centroids),
                            ("kmeans_balanced", balanced_centroids)):
            t = time.perf_counter()
            cents = trainer(corpus, 64, n_iters=3)
            stats = (
                ivf_assign(corpus, cents).groupBy("list_id").count()
                .agg(F.max("count").alias("mx"), F.avg("count").alias("av"))
                .first()
            )
            out[f"{nm}_1m_k64_s"] = round(time.perf_counter() - t, 2)
            out[f"{nm}_1m_k64_ratio"] = round(
                float(stats["mx"]) / float(stats["av"]), 2)
        del corpus, queries, cands
        gc.collect()

    # r9 sparse pairwise (opt-in, PROBE_SPARSE_R9=1): 1M nnz over 100k
    # rows × 100k cols (mean df 10 → support ≈ Σ C(df,2) ≈ 4.5M pairs).
    # The claim under test: cost tracks the SUPPORT (df² per column),
    # not n² = 10¹⁰.
    if os.environ.get("PROBE_SPARSE_R9") == "1":
        from raft_spark.operators.sparse import max_duplicates, sparse_pairwise

        coo = max_duplicates(
            spark.range(1_000_000).select(
                (F.col("id") % 100_000).alias("row"),
                F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("col"),
                (uniform(F.col("id"), seed=3) + F.lit(0.1)).alias("value"),
            )
        ).select("row", "col", "value").localCheckpoint(eager=True)
        t = time.perf_counter()
        npairs = sparse_pairwise(coo, metric="cosine").count()
        out["sparse_pairwise_1m_nnz_s"] = round(time.perf_counter() - t, 2)
        out["sparse_pairwise_1m_nnz_pairs"] = int(npairs)
        t = time.perf_counter()
        nthr = sparse_pairwise(coo, metric="cosine", threshold=0.9).count()
        out["sparse_pairwise_1m_nnz_thr_s"] = round(time.perf_counter() - t, 2)
        assert nthr <= npairs
        del coo
        gc.collect()

    # r10 incremental span-state ingest (opt-in, PROBE_SPAN_INGEST=1):
    # bootstrap a 200k-doc span state (100-token docs -> ~18.6M window
    # hashes), then delta-ingest 10k new docs — the delta must cost a
    # small fraction of the bootstrap (the flag overlay + additive
    # counts never rewrite corpus state).
    if os.environ.get("PROBE_SPAN_INGEST") == "1":
        import shutil
        import tempfile

        from raft_spark.operators.dedup import span_state_ingest

        def _sdocs(n_docs, id_off, seed):
            # ~2% of docs share a 32-token run with their neighbor
            base = (
                F.when((F.col("id") % 53 == 0) & (F.col("id") + 1 < n_docs),
                       F.col("id"))
                .when(F.col("id") % 53 == 1, F.col("id") - 1)
                .otherwise(F.col("id"))
            )
            ws = F.transform(
                F.sequence(F.lit(0), F.lit(99)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.when(i < 32,
                           F.pmod(base * 6007 + i * 31, F.lit(40_000)))
                    .otherwise(
                        F.pmod((F.col("id") + id_off) * 7919
                               + i * 104729 + seed, F.lit(40_000))
                    ).cast("string"),
                ),
            )
            return spark.range(n_docs).select(
                (F.col("id") + id_off).alias("doc_id"),
                F.array_join(ws, " ").alias("text"),
            ).localCheckpoint(eager=True)

        # r11: TWO corpus sizes — after the _ph partition-pruned probe
        # fix, the same 10k delta must cost the same against a 200k and
        # a 400k corpus (the PROBE_INC_DEDUP flat-delta-cost pattern)
        for scale in (1, 2):
            n_docs = scale * 200_000
            corpus = _sdocs(n_docs, 0, 0)
            delta = _sdocs(10_000, n_docs, 3)
            tmpd = tempfile.mkdtemp(prefix="raft_spark_spaningest_")
            try:
                t = time.perf_counter()
                span_state_ingest(corpus, tmpd + "/s", return_full=False)
                out[f"spaningest_bootstrap_{scale}x200k_docs_s"] = round(
                    time.perf_counter() - t, 2
                )
                t = time.perf_counter()
                span_state_ingest(delta, tmpd + "/s", return_full=False)
                out[f"spaningest_delta_10k_into_{scale}x200k_s"] = round(
                    time.perf_counter() - t, 2
                )
                from raft_spark.operators.dedup import read_span_state

                t = time.perf_counter()
                n_res = read_span_state(spark, tmpd + "/s").count()
                out[f"spaningest_resolve_{scale}x200k_s"] = round(
                    time.perf_counter() - t, 2
                )
                assert n_res == n_docs + 10_000
            finally:
                shutil.rmtree(tmpd, ignore_errors=True)
            del corpus, delta
            gc.collect()

    # r10 postings index at 10M nnz (opt-in, PROBE_POSTINGS_R10=1): the
    # lookup claim under test — batch cost tracks the batch's TOUCHED
    # slice (its columns' postings), not the index size; the delta
    # append is O(delta) IO.
    if os.environ.get("PROBE_POSTINGS_R10") == "1":
        import shutil
        import tempfile

        from raft_spark.operators.sparse import (
            max_duplicates, postings_add, sparse_lookup, write_postings,
        )

        def _coo(n_nnz, n_rows, id_off, seed):
            return max_duplicates(
                spark.range(n_nnz).select(
                    (F.col("id") % n_rows + id_off).alias("row"),
                    F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("col"),
                    (uniform(F.col("id"), seed=seed) + F.lit(0.1))
                    .alias("value"),
                )
            ).select("row", "col", "value").localCheckpoint(eager=True)

        big = _coo(10_000_000, 1_000_000, 0, 5)       # mean df 10
        delta = _coo(500_000, 50_000, 1_000_000, 6)   # 5% delta
        batch = _coo(100_000, 10_000, 2_000_000, 7)   # 1% probe batch
        tmpd = tempfile.mkdtemp(prefix="raft_spark_postings_")
        try:
            t = time.perf_counter()
            write_postings(big, tmpd + "/idx")
            out["postings_build_10m_nnz_s"] = round(time.perf_counter() - t, 2)
            t = time.perf_counter()
            postings_add(delta, tmpd + "/idx")
            out["postings_add_500k_nnz_s"] = round(time.perf_counter() - t, 2)
            t = time.perf_counter()
            nlk = sparse_lookup(batch, spark, tmpd + "/idx",
                                metric="cosine", threshold=0.5).count()
            out["postings_lookup_100k_nnz_s"] = round(
                time.perf_counter() - t, 2
            )
            out["postings_lookup_100k_nnz_pairs"] = int(nlk)
        finally:
            shutil.rmtree(tmpd, ignore_errors=True)
        del big, delta, batch
        gc.collect()

    # r11 binary quantization at 1M rows (opt-in, PROBE_BQ=1): the
    # packed-Hamming shortlist scan vs the f32 brute scan over the SAME
    # 1M x 64 corpus and 100 queries — the 32x-smaller-scan claim,
    # measured instead of asserted (the quantize cost is inside the
    # knn_bq number; both paths end in the bounded two-phase select_k).
    # r12 adds the SERVED paths: write_bq_index once, then answer
    # through the persisted codes — the per-query-batch corpus quantize
    # pass (BASELINE v11 measured it as the brute-vs-bq gap) amortizes
    # into the build.
    if os.environ.get("PROBE_BQ") == "1":
        import shutil
        import tempfile

        from raft_spark.operators.similarity import (
            knn_bq, knn_brute as _kb, knn_sq, write_bq_index,
        )

        bq_corpus = dense_table(spark, 1_000_000, 64) \
            .localCheckpoint(eager=True)
        bq_queries = bq_corpus.filter(F.col("id") < 100) \
            .localCheckpoint(eager=True)
        t = time.perf_counter()
        nbq = knn_bq(bq_corpus, bq_queries, k=5, refine_factor=8).count()
        out["knn_bq_1m_100q_s"] = round(time.perf_counter() - t, 2)
        t = time.perf_counter()
        nsq = knn_sq(bq_corpus, bq_queries, k=5, refine_factor=8).count()
        out["knn_sq_1m_100q_s"] = round(time.perf_counter() - t, 2)
        t = time.perf_counter()
        nbr = _kb(bq_corpus, bq_queries, k=5).count()
        out["knn_brute_1m_100q_s"] = round(time.perf_counter() - t, 2)
        assert nbq == 500 and nsq == 500 and nbr == 500
        tmpq = tempfile.mkdtemp(prefix="raft_spark_bqserve_")
        try:
            t = time.perf_counter()
            write_bq_index(bq_corpus, tmpq + "/idx")
            out["bq_index_build_1m_s"] = round(time.perf_counter() - t, 2)
            t = time.perf_counter()
            nbs = knn_bq(bq_corpus, bq_queries, k=5, refine_factor=8,
                         index_path=tmpq + "/idx").count()
            out["knn_bq_served_1m_100q_s"] = round(
                time.perf_counter() - t, 2
            )
            assert nbs == 500
        finally:
            shutil.rmtree(tmpq, ignore_errors=True)
        del bq_corpus, bq_queries
        gc.collect()

    # r12 incremental semantic-state ingest at two corpus sizes
    # (opt-in, PROBE_SEM_INGEST=1): the flat-delta claim, stated the
    # way a 100 TB pipeline holds it — the candidate probe reads the
    # delta's TOUCHED cluster partitions, so per-delivery cost is flat
    # when the quantizer scales with the corpus (fixed list SIZE, the
    # IVF discipline: 2x corpus -> 2x lists via one more sign bit).
    # The delta is cluster-localized (a delivery from one domain — the
    # shape that makes incremental semantic dedup worth running), the
    # replay registry probe prunes on the id hash (seam-independent).
    if os.environ.get("PROBE_SEM_INGEST") == "1":
        import shutil
        import tempfile

        from raft_spark.operators.dedup import semantic_state_ingest

        def _bucket_of(df, bits):
            b = None
            for j in range(bits):
                bit = (F.col("features")[j] > 0).cast("long") * (2 ** j)
                b = bit if b is None else b + bit
            return df.select("id", b.alias("cluster"))

        def _svecs(n_rows, id_off, localized):
            # localized deliveries keep sign bits 3+ positive: the delta
            # lands in 8 clusters (bits 0-2 free), not one — a single
            # hot cluster would serialize its within-delta pairs onto
            # one join task (measured: 100M interpreted zip_with evals
            # on one core), which is a skew bug in the PROBE's data
            # shape, not the operator (real deliveries spread over the
            # quantizer's lists; salting the seam is the caller's knob)
            v = F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    uniform(F.col("id") * 64 + i + id_off, seed=9)
                    + F.when(F.lit(localized) & (i >= 3), F.lit(0.05))
                    .otherwise(F.lit(-0.5))
                ),
            )
            return spark.range(n_rows).select(
                (F.col("id") + id_off).alias("id"), v.alias("features")
            ).localCheckpoint(eager=True)

        for scale, bits in ((1, 7), (2, 8)):
            n_rows = scale * 100_000
            corpus = _svecs(n_rows, 0, localized=False)
            delta = _svecs(10_000, 10_000_000, localized=True)  # 1 cluster
            tmpd = tempfile.mkdtemp(prefix="raft_spark_semprobe_")
            try:
                t = time.perf_counter()
                semantic_state_ingest(
                    corpus, _bucket_of(corpus, bits), tmpd + "/s",
                    return_full=False,
                )
                out[f"semingest_bootstrap_{scale}x100k_s"] = round(
                    time.perf_counter() - t, 2
                )
                t = time.perf_counter()
                nd = semantic_state_ingest(
                    delta, _bucket_of(delta, bits), tmpd + "/s",
                    return_full=False,
                ).count()
                out[f"semingest_delta_10k_into_{scale}x100k_s"] = round(
                    time.perf_counter() - t, 2
                )
                assert nd >= 10_000
            finally:
                shutil.rmtree(tmpd, ignore_errors=True)
            del corpus, delta
            gc.collect()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
