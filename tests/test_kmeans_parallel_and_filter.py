"""r10 additions: k-means|| initialization (Bahmani et al., VLDB'12 —
the scalable KMeansPlusPlus init of the reference's cluster::kmeans)
and filtered ANN search (cuVS filtering::bitset_filter semantics on
knn_brute / knn_ivf_pq)."""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from raft_spark.operators import similarity as SIM


K = 8


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 50.0, (K, 16))
    X = np.vstack([c + rng.normal(0, 0.5, (40, 16)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "id long, features array<double>",
    ).cache()
    df.count()
    yield df, centers
    df.unpersist()


def test_kmeans_parallel_init_covers_blobs(spark, blobs):
    """On K well-separated blobs the oversampled init must place one
    center in EVERY blob — the failure mode of the plain seeded draw
    (two seeds in one blob) that k-means++ exists to fix."""
    df, centers = blobs
    C = SIM.kmeans_parallel_init(df, K, seed=1)
    assert C.shape == (K, 16)
    owner = {int(((centers - c) ** 2).sum(1).argmin()) for c in C}
    assert owner == set(range(K))


def test_kmeans_parallel_init_deterministic(spark, blobs):
    df, _ = blobs
    a = SIM.kmeans_parallel_init(df, K, seed=5)
    b = SIM.kmeans_parallel_init(df, K, seed=5)
    assert np.array_equal(a, b)
    # and partitioning-independent (same rows, different layout)
    c = SIM.kmeans_parallel_init(df.repartition(7), K, seed=5)
    assert np.array_equal(a, c)


def test_kmeans_init_option(spark, blobs):
    """kmeans(init='kmeans||') must not lose to the hash init on blob
    data (it should find all blobs; hash may double-seed one)."""
    df, _ = blobs
    _, _, inertia_pp = SIM.kmeans(df, K, n_iters=3, init="kmeans||")
    _, _, inertia_hash = SIM.kmeans(df, K, n_iters=3, init="hash")
    assert inertia_pp <= inertia_hash * 1.02
    with pytest.raises(ValueError, match="unknown init"):
        SIM.kmeans(df, K, init="bogus")


def test_knn_brute_filtered_allow_deny(spark, blobs):
    """Filtered exact search == exact search over the pre-filtered
    corpus; deny is the complement mask."""
    df, _ = blobs
    qs = df.filter(F.col("id") < 3)
    allow = df.select("id").filter(F.col("id") % 2 == 0)

    def rank_map(out):
        return {(r["qid"], r["nid"]): r["rank"] for r in out.collect()}

    got = rank_map(SIM.knn_brute(df, qs, k=5, filter_ids=allow))
    want = rank_map(SIM.knn_brute(df.filter(F.col("id") % 2 == 0), qs, k=5))
    assert got == want and all(n % 2 == 0 for _, n in got)
    deny = rank_map(SIM.knn_brute(df, qs, k=5, filter_ids=allow,
                                  filter_mode="deny"))
    wantd = rank_map(SIM.knn_brute(df.filter(F.col("id") % 2 == 1), qs, k=5))
    assert deny == wantd and all(n % 2 == 1 for _, n in deny)
    with pytest.raises(ValueError, match="filter_mode"):
        SIM.knn_brute(df, qs, k=5, filter_ids=allow, filter_mode="nope")


def test_knn_ivf_pq_filtered(spark, blobs):
    """Filtered IVF-PQ over an already-built index: every neighbor
    satisfies the mask, and at full probe the refined neighbor set
    equals the exact filtered search (the filter loses nothing the
    probes didn't already lose)."""
    df, _ = blobs
    qs = df.filter(F.col("id") < 3)
    allow = df.select("id").filter(F.col("id") % 2 == 0)
    idx = SIM.build_ivf_pq_index(df, n_lists=4, kmeans_iters=2)
    got = SIM.knn_ivf_pq(df, qs, k=5, n_probe=4, refine_factor=8,
                         index=idx, filter_ids=allow)
    pairs = {(r["qid"], r["nid"]) for r in got.collect()}
    assert pairs and all(n % 2 == 0 for _, n in pairs)
    exact = {(r["qid"], r["nid"]) for r in
             SIM.knn_brute(df, qs, k=5, filter_ids=allow).collect()}
    assert pairs == exact


def test_knn_graph_roundtrip_search(spark, blobs, tmp_path):
    """r10: persisted kNN graph (the CAGRA serialize role) — the beam
    walk over the reloaded graph answers identically to the in-memory
    build."""
    df, _ = blobs
    qs = df.filter(F.col("id") < 4)
    g = SIM.nn_descent_graph(df, k=6).localCheckpoint(eager=True)
    path = str(tmp_path / "graph")
    SIM.write_knn_graph(g, path)
    back = SIM.read_knn_graph(spark, path)
    mem = {(r["qid"], r["nid"], r["rank"]) for r in
           SIM.knn_graph_search(df, qs, graph=g.select("id", "nid"),
                                k=5).collect()}
    disk = {(r["qid"], r["nid"], r["rank"]) for r in
            SIM.knn_graph_search(df, qs, graph=back.select("id", "nid"),
                                 k=5).collect()}
    assert mem == disk and mem


def test_knn_merge_parts_equals_global(spark, blobs):
    """r10: shard-local top-k merged == top-k over the whole corpus
    (the reference's knn_merge_parts contract), for a similarity and a
    distance ordering."""
    df, _ = blobs
    qs = df.filter(F.col("id") < 4)
    shards = [df.filter(F.col("id") % 3 == j) for j in range(3)]
    parts = [SIM.knn_brute(sh, qs, k=5) for sh in shards]
    merged = {(r["qid"], r["nid"], r["rank"]) for r in
              SIM.knn_merge_parts(parts, k=5).collect()}
    want = {(r["qid"], r["nid"], r["rank"]) for r in
            SIM.knn_brute(df, qs, k=5).collect()}
    assert merged == want
    # distance ordering (L1 via knn_metric), ascending merge
    partsd = [SIM.knn_metric(sh, qs, k=5, metric="l1") for sh in shards]
    mergedd = {(r["qid"], r["nid"], r["rank"]) for r in
               SIM.knn_merge_parts(partsd, k=5, ascending=True,
                                   order_col="dist").collect()}
    wantd = {(r["qid"], r["nid"], r["rank"]) for r in
             SIM.knn_metric(df, qs, k=5, metric="l1").collect()}
    assert mergedd == wantd
    import pytest

    with pytest.raises(ValueError, match="no parts"):
        SIM.knn_merge_parts([], k=5)


def test_binary_quantize_packs_sign_bits(spark, blobs):
    """Packed words reproduce the sign pattern bit-for-bit (numpy
    twin, incl. the long-wraparound top bit and last-word padding)."""
    df, _ = blobs
    rows = {r["id"]: r["bq"] for r in
            SIM.binary_quantize(df.filter(F.col("id") < 10)).collect()}
    X = {r["id"]: np.array(r["features"]) for r in
         df.filter(F.col("id") < 10).collect()}
    for i, words in rows.items():
        bits = (X[i] > 0).astype(np.uint64)
        d = len(bits)
        assert len(words) == (d + 63) // 64
        for w, word in enumerate(words):
            expect = 0
            for j in range(min(64, d - w * 64)):
                expect |= int(bits[w * 64 + j]) << j
            # compare as unsigned 64-bit (Spark longs wrap)
            assert word & 0xFFFFFFFFFFFFFFFF == expect or \
                (word + (1 << 64)) % (1 << 64) == expect


def test_knn_bq_hamming_and_recall(spark, blobs):
    """The packed-Hamming ranking equals the unpacked numpy Hamming
    ranking exactly, and the quantize-then-rescore pipeline recovers
    the exact neighbors on separated blobs (recall@5 = 1 with a wide
    refine)."""
    df, _ = blobs
    qs = df.filter(F.col("id") < 3)
    got = SIM.knn_bq(df, qs, k=5, refine_factor=16)
    exact = SIM.knn_brute(df, qs, k=5)
    g = {(r["qid"], r["nid"]) for r in got.collect()}
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    assert len(g & e) / len(e) == 1.0
    # hamming values: spot-check vs numpy popcount on raw sign bits
    X = {r["id"]: np.array(r["features"]) for r in df.collect()}
    cb = SIM.binary_quantize(df)
    qb = cb.filter(F.col("id") < 3)
    sc = (cb.select(F.col("id").alias("nid"), F.col("bq").alias("_c"))
          .join(qb.select(F.col("id").alias("qid"), F.col("bq").alias("_q")))
          .filter(F.col("qid") != F.col("nid"))
          .select("qid", "nid",
                  SIM.hamming_packed(F.col("_q"), F.col("_c")).alias("h")))
    for r in sc.orderBy("qid", "nid").limit(40).collect():
        hb = int(np.sum((X[r["qid"]] > 0) != (X[r["nid"]] > 0)))
        assert r["h"] == hb, (r["qid"], r["nid"])


def test_binary_quantize_rejects_ragged_and_dim_mismatch(spark, blobs):
    """r11 (ADVICE fix): ragged vector lengths or a corpus/query
    dimensionality mismatch must raise — not silently null-pad the
    packed zip_with into NULL Hamming distances."""
    ragged = spark.createDataFrame(
        [(0, [1.0, -1.0, 2.0]), (1, [1.0, -1.0])],
        "id long, features array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        SIM.binary_quantize(ragged)
    with pytest.raises(ValueError, match="empty"):
        SIM.binary_quantize(ragged.limit(0))
    corpus, _ = blobs
    queries2 = corpus.select(
        "id", F.slice("features", 1, 3).alias("features")
    ).limit(4)
    with pytest.raises(ValueError, match="dimensionality"):
        SIM.knn_bq(corpus, queries2, k=2)


def test_popcount64_matches_python():
    rng = np.random.default_rng(5)
    xs = rng.integers(0, 2 ** 63, size=1000, dtype=np.int64).astype(np.uint64)
    xs[0] = np.uint64(0)
    xs[1] = np.uint64(2 ** 64 - 1)
    xs[2] = np.uint64(0x8000000000000000)
    got = SIM._popcount64(xs)
    assert all(int(g) == int(x).bit_count() for g, x in zip(got, xs))


def test_knn_bq_numpy_equals_expr(spark, blobs):
    """r11: the vectorized partial-topk Hamming scan must be
    byte-identical to the JVM expression path (integer Hamming, shared
    (hamming asc, nid asc) cut, same exact-cosine refine)."""
    corpus, _ = blobs
    queries = corpus.filter(F.col("id") % 40 == 0)
    a = SIM.knn_bq(corpus, queries, k=3, refine_factor=4, strategy="numpy")
    b = SIM.knn_bq(corpus, queries, k=3, refine_factor=4, strategy="expr")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_scalar_quantize_codes_match_numpy(spark, blobs):
    """r11 scalar quantizer: codes equal the numpy twin bit-for-bit
    (floor(x*s+0.5) round-half-UP — not half-away-from-zero — with a
    symmetric clamp), and the trained amax is the exact max|element|."""
    df, _ = blobs
    sub = df.filter(F.col("id") < 10)
    got, amax = SIM.scalar_quantize(sub)
    X = {r["id"]: np.array(r["features"]) for r in sub.collect()}
    assert amax == max(float(np.abs(v).max()) for v in X.values())
    s = 127.0 / amax
    for r in got.collect():
        want = np.clip(np.floor(X[r["id"]] * s + 0.5), -127, 127)
        assert np.array_equal(np.array(r["sq"], dtype=float), want), r["id"]
    with pytest.raises(ValueError, match="amax"):
        SIM.scalar_quantize(
            spark.createDataFrame([(0, [0.0, 0.0])],
                                  "id long, features array<double>"))


def test_knn_sq_numpy_equals_expr_and_recall(spark, blobs):
    """The int-dot shortlist is integer-exact, so the numpy and expr
    paths must agree byte-for-byte; on separated blobs the rescored
    pipeline recovers the exact neighbors."""
    corpus, _ = blobs
    queries = corpus.filter(F.col("id") % 40 == 0)
    a = SIM.knn_sq(corpus, queries, k=3, refine_factor=4, strategy="numpy")
    b = SIM.knn_sq(corpus, queries, k=3, refine_factor=4, strategy="expr")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0
    qs = corpus.filter(F.col("id") < 3)
    got = {(r["qid"], r["nid"]) for r in
           SIM.knn_sq(corpus, qs, k=5, refine_factor=16).collect()}
    exact = {(r["qid"], r["nid"]) for r in
             SIM.knn_brute(corpus, qs, k=5).collect()}
    assert len(got & exact) / len(exact) == 1.0
    queries2 = corpus.select(
        "id", F.slice("features", 1, 3).alias("features")
    ).limit(4)
    with pytest.raises(ValueError, match="dimensionality"):
        SIM.knn_sq(corpus, queries2, k=2)


def test_sq_index_roundtrip_serving(spark, blobs, tmp_path):
    """r11: serving from a persisted SQ index (codes + frozen amax)
    answers byte-identically to the inline quantize path, and a
    dimensionality mismatch against the index raises."""
    corpus, _ = blobs
    queries = corpus.filter(F.col("id") % 40 == 0)
    path = str(tmp_path / "sqidx")
    n = SIM.write_sq_index(corpus, path)
    assert n == corpus.count()
    served = sorted(map(tuple, SIM.knn_sq(
        corpus, queries, k=3, refine_factor=4, index_path=path).collect()))
    inline = sorted(map(tuple, SIM.knn_sq(
        corpus, queries, k=3, refine_factor=4).collect()))
    assert served == inline and len(served) > 0
    # frozen-amax check: the meta sidecar round-trips the exact scale
    _, amax, d = SIM.read_sq_index(spark, path)
    _, amax2 = SIM.scalar_quantize(corpus)
    assert amax == amax2 and d == 16
    short = corpus.select("id", F.slice("features", 1, 8).alias("features"))
    with pytest.raises(ValueError, match="holds d="):
        SIM.knn_sq(short, short.limit(2), k=2, index_path=path)


def test_bq_index_roundtrip_serving(spark, blobs, tmp_path):
    """r12: serving from a persisted BQ index (packed codes + d
    sidecar — no trained state) answers byte-identically to the inline
    quantize path, and a dimensionality mismatch raises."""
    corpus, _ = blobs
    queries = corpus.filter(F.col("id") % 40 == 0)
    path = str(tmp_path / "bqidx")
    n = SIM.write_bq_index(corpus, path)
    assert n == corpus.count()
    served = sorted(map(tuple, SIM.knn_bq(
        corpus, queries, k=3, refine_factor=4, index_path=path).collect()))
    inline = sorted(map(tuple, SIM.knn_bq(
        corpus, queries, k=3, refine_factor=4).collect()))
    assert served == inline and len(served) > 0
    codes, d = SIM.read_bq_index(spark, path)
    assert d == 16 and codes.count() == n
    short = corpus.select("id", F.slice("features", 1, 8).alias("features"))
    with pytest.raises(ValueError, match="holds d="):
        SIM.knn_bq(short, short.limit(2), k=2, index_path=path)


def test_knn_route_table_and_auto_dispatch(spark, blobs):
    """r12 ANN tier router: the pure route table covers the four tiers
    (brute exact / SQ near-exact / BQ coarse / IVF-PQ probe-bounded),
    and knn_auto's output is identical to the chosen tier's own output
    — the asof_join_auto routing contract."""
    # route table
    assert SIM.knn_route(1_000, 0.5) == "brute"          # small corpus
    assert SIM.knn_route(10**7, 0.999) == "brute"        # exactness asked
    assert SIM.knn_route(10**7, 0.97) == "sq"
    assert SIM.knn_route(10**7, 0.90) == "bq"
    assert SIM.knn_route(10**7, 0.70) == "ivf_pq"
    # dispatch identity: small corpus routes to brute
    corpus, _ = blobs
    queries = corpus.filter(F.col("id") % 40 == 0)
    out = SIM.knn_auto(corpus, queries, k=3)
    assert out._knn_tier == "brute"
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, SIM.knn_brute(corpus, queries, k=3).collect()))
    assert got == want and len(got) > 0
    # forcing the corpus "large" routes the target-recall tiers; the
    # routed output must equal the tier's own output
    out_sq = SIM.knn_auto(corpus, queries, k=3, recall_target=0.95,
                          small_corpus=0, refine_factor=4)
    assert out_sq._knn_tier == "sq"
    want_sq = sorted(map(tuple, SIM.knn_sq(
        corpus, queries, k=3, refine_factor=4).collect()))
    assert sorted(map(tuple, out_sq.collect())) == want_sq
    out_bq = SIM.knn_auto(corpus, queries, k=3, recall_target=0.90,
                          small_corpus=0, refine_factor=4)
    assert out_bq._knn_tier == "bq"
    want_bq = sorted(map(tuple, SIM.knn_bq(
        corpus, queries, k=3, refine_factor=4).collect()))
    assert sorted(map(tuple, out_bq.collect())) == want_bq


def test_binary_quantize_arrow_equals_expr(spark, blobs):
    """r12: the Arrow numpy packbits path produces BIT-IDENTICAL codes
    to the JVM shiftleft/OR expression path (LSB-first within each
    64-bit word, zero-padded last word) — the corpus side of knn_bq
    and write_bq_index ride on this identity."""
    df, _ = blobs
    expr = {r["id"]: tuple(r["bq"]) for r in
            SIM.binary_quantize(df).collect()}
    arrow = {r["id"]: tuple(r["bq"]) for r in
             SIM.binary_quantize(df, strategy="arrow").collect()}
    assert arrow == expr and len(arrow) > 0
    # padded last word: 10 dims -> one word with 54 zero pad bits
    short = df.select("id", F.slice("features", 1, 10).alias("features"))
    e10 = {r["id"]: tuple(r["bq"]) for r in
           SIM.binary_quantize(short).collect()}
    a10 = {r["id"]: tuple(r["bq"]) for r in
           SIM.binary_quantize(short, strategy="arrow").collect()}
    assert a10 == e10


def test_sq_bq_index_add_extend_and_replay(spark, blobs, tmp_path):
    """r12: delta-extending the served quantized indexes
    (ivf_pq_index_add discipline). SQ: the extension encodes under the
    index's FROZEN amax — codes equal scalar_quantize(union,
    amax=trained-on-build-half) exactly, NOT a retrained scale. BQ: no
    trained state, so the extended index serves byte-identically to a
    full build. Replay of an already-added delta is a no-op for both."""
    corpus, _ = blobs
    h1 = corpus.filter(F.col("id") % 2 == 0)
    h2 = corpus.filter(F.col("id") % 2 == 1)
    queries = corpus.filter(F.col("id") % 40 == 0)

    # SQ: frozen-scale extension semantics
    ps = str(tmp_path / "sq")
    SIM.write_sq_index(h1, ps)
    _, amax1, _ = SIM.read_sq_index(spark, ps)
    n = SIM.sq_index_add(h2, ps)
    assert n == h2.count()
    got = {r["id"]: tuple(r["sq"]) for r in
           SIM.read_sq_index(spark, ps)[0].collect()}
    want_df, _ = SIM.scalar_quantize(corpus, amax=amax1)
    want = {r["id"]: tuple(r["sq"]) for r in want_df.collect()}
    assert got == want and len(got) == corpus.count()
    assert SIM.sq_index_add(h2, ps) == 0  # replay no-op
    with pytest.raises(ValueError, match="holds d="):
        SIM.sq_index_add(
            corpus.select("id", F.slice("features", 1, 8).alias("features")),
            ps,
        )

    # BQ: extended index == full build, served answers identical
    pb = str(tmp_path / "bq")
    pb2 = str(tmp_path / "bq_full")
    SIM.write_bq_index(h1, pb)
    assert SIM.bq_index_add(h2, pb) == h2.count()
    assert SIM.bq_index_add(h2, pb) == 0  # replay no-op
    SIM.write_bq_index(corpus, pb2)
    ext = sorted(map(tuple, SIM.knn_bq(
        corpus, queries, k=3, refine_factor=4, index_path=pb).collect()))
    full = sorted(map(tuple, SIM.knn_bq(
        corpus, queries, k=3, refine_factor=4, index_path=pb2).collect()))
    assert ext == full and len(ext) > 0


def test_knn_auto_ivf_pq_dispatch(spark, blobs):
    """r12: the router's lowest-recall tier dispatches to knn_ivf_pq
    and the routed output equals the tier's own (deterministic seeded
    quantizer + codebooks, so the identity is exact)."""
    corpus, _ = blobs
    queries = corpus.filter(F.col("id") % 40 == 0)
    out = SIM.knn_auto(corpus, queries, k=3, recall_target=0.5,
                       small_corpus=0, n_lists=4, kmeans_iters=2,
                       refine_factor=4)
    assert out._knn_tier == "ivf_pq"
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, SIM.knn_ivf_pq(
        corpus, queries, k=3, n_lists=4, kmeans_iters=2,
        refine_factor=4).collect()))
    assert got == want and len(got) > 0
