"""Product quantization (encode/ADC) and fuzzy-dedup clustering.

PQ contract: codes are m small ints; ADC scoring approximates the exact
inner product well enough that recall@k against brute force clears a
floor far above random, and a high-capacity codebook (many codes per
subspace on a small corpus) reconstructs near-exact rankings.
Cluster contract: components over candidate pairs equal a driver-side
union-find; singletons map to themselves.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import dedup as D
from raft_spark.operators import similarity as SIM
from raft_spark.sources.tables import embeddings_matrix, load


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    df = embeddings_matrix(spark, sf_dir).select("id", "features").cache()
    yield df
    df.unpersist()


def test_pq_encode_shape_and_determinism(spark, corpus):
    books = SIM.pq_train(corpus, m_subspaces=8, n_codes=8, vec_col="features")
    assert books.shape[0] == 8 and books.shape[1] == 8
    codes = SIM.pq_encode(corpus, books)
    rows = codes.collect()
    assert len(rows) == corpus.count()
    widths = {len(r["codes"]) for r in rows}
    assert widths == {8}
    assert all(0 <= c < 8 for r in rows for c in r["codes"])
    # deterministic: re-train + re-encode reproduces identical codes
    books2 = SIM.pq_train(corpus, m_subspaces=8, n_codes=8, vec_col="features")
    assert np.allclose(books, books2)


def test_pq_recall_vs_brute(spark, corpus):
    queries = corpus.filter(F.col("id") % 40 == 0)
    exact = SIM.knn_brute(corpus, queries, k=5)
    approx = SIM.knn_pq(corpus, queries, k=5, m_subspaces=16, n_codes=16,
                        refine_factor=8)
    n_q = queries.count()
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (n_q * 5)
    assert recall >= 0.6, f"recall {recall}"
    # every query answered with k rows, no self-matches
    per_q = approx.groupBy("qid").count().agg(F.min("count")).collect()[0][0]
    assert per_q == 5
    assert approx.filter(F.col("qid") == F.col("nid")).count() == 0


def test_pq_adc_matches_exact_ip_on_codewords(spark, corpus):
    """ADC is exact when each vector IS a codeword: encode the
    codebook's own centroids and the LUT-sum must equal the true inner
    product of the reconstruction."""
    books = SIM.pq_train(corpus, m_subspaces=4, n_codes=4, vec_col="features")
    m, k, dsub = books.shape
    # one synthetic vector per codeword index
    vecs = [books[:, i, :].reshape(-1).tolist() for i in range(k)]
    recon = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, features array<double>"
    )
    codes = {r["id"]: list(r["codes"]) for r in SIM.pq_encode(recon, books).collect()}
    for i, cs in codes.items():
        assert cs == [i] * m, f"codeword {i} did not encode to itself: {cs}"


def test_ivf_pq_recall_and_structure(spark, corpus):
    """IVF-PQ (coarse lists + residual PQ + ADC + refine) must stay in
    the exact neighborhood at moderate probe counts, answer every query
    with k rows, and never return self-matches."""
    queries = corpus.filter(F.col("id") % 40 == 0)
    exact = SIM.knn_brute(corpus, queries, k=5)
    approx = SIM.knn_ivf_pq(corpus, queries, k=5, n_lists=8, n_probe=4,
                            kmeans_iters=2)
    n_q = queries.count()
    hits = approx.join(exact, ["qid", "nid"], "left_semi").count()
    recall = hits / (n_q * 5)
    # 4/8 lists probed: must beat random list coverage (0.5) on quality,
    # empirically ~0.66 on this corpus — pin above the random baseline
    assert recall >= 0.5, f"recall {recall}"
    per_q = approx.groupBy("qid").count().agg(F.min("count")).collect()[0][0]
    assert per_q == 5
    assert approx.filter(F.col("qid") == F.col("nid")).count() == 0


def test_dedup_clusters_match_union_find(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (30, 31), (31, 32), (32, 33)], "a long, b long"
    )
    out = D.dedup_clusters(pairs, docs)
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
           for r in out.collect()}
    assert got[1] == (1, 3, 1) and got[2] == (1, 3, 0) and got[3] == (1, 3, 0)
    assert got[10] == (10, 2, 1) and got[11] == (10, 2, 0)
    assert got[30][0] == 30 and got[33] == (30, 4, 0)
    # untouched docs are singletons of themselves
    n_docs = docs.count()
    singles = [d for d, (c, sz, can) in got.items() if sz == 1]
    assert len(got) == n_docs
    assert all(got[d] == (d, 1, 1) for d in singles)
    assert len(singles) == n_docs - 9


def test_dedup_clusters_empty_pairs(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    pairs = spark.createDataFrame([], "a long, b long")
    out = D.dedup_clusters(pairs, docs)
    assert out.filter(F.col("is_canonical") == 0).count() == 0
    assert out.count() == docs.count()


def test_ivf_pq_index_persist_roundtrip(spark, corpus, tmp_path):
    """build → write → read → query must equal querying the in-memory
    index (the build-once / query-many contract), and the on-disk codes
    are partitioned by list_id."""
    import os

    queries = corpus.filter(F.col("id") % 100 == 0)
    idx = SIM.build_ivf_pq_index(corpus, n_lists=4, kmeans_iters=2)
    a = {(r["qid"], r["nid"], r["rank"])
         for r in SIM.knn_ivf_pq(corpus, queries, k=5, n_probe=2, index=idx).collect()}

    p = str(tmp_path / "ivf_pq")
    SIM.write_ivf_pq_index(idx, p)
    assert any(d.startswith("list_id=") for d in os.listdir(f"{p}/codes"))
    idx2 = SIM.read_ivf_pq_index(spark, p)
    assert np.allclose(idx2["centroids"], idx["centroids"])
    assert np.allclose(idx2["codebooks"], idx["codebooks"])
    b = {(r["qid"], r["nid"], r["rank"])
         for r in SIM.knn_ivf_pq(corpus, queries, k=5, n_probe=2, index=idx2).collect()}
    assert a == b and len(a) > 0


def test_dedup_report(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    rep = D.dedup_report(D.dedup_clusters(pairs, docs)).collect()[0]
    n = docs.count()
    assert rep["n_docs"] == n
    assert rep["n_duplicates"] == 3          # 2,3 and 11 fold away
    assert rep["n_clusters"] == n - 3
    assert rep["max_cluster_size"] == 3
    assert abs(rep["dup_rate"] - 3 / n) < 1e-9


def test_kmeans_offset_sparse_id_space(spark):
    """Seeding must work on ANY id space (the old hash-mod-n init
    assumed dense 0..n-1 ids and collected zero seeds)."""
    import numpy as np

    from raft_spark.operators.similarity import kmeans

    rs = np.random.RandomState(6)
    x = rs.rand(60, 8)
    df = spark.createDataFrame(
        [(100_000 + 7 * i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, features array<double>",
    )
    assigns, cents, inertia = kmeans(df, k=4, n_iters=3)
    assert cents.shape == (4, 8) and assigns.count() == 60
    assert inertia >= 0.0


def test_dbscan_rejects_similarity_metrics(spark):
    import pytest as _pt

    from raft_spark.operators.similarity import dbscan

    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])], "id long, features array<double>"
    )
    with _pt.raises(ValueError, match="not a symmetric distance"):
        dbscan(df, eps=0.9, metric="cosine")
    # asymmetric / degenerate distances are rejected too (r9): kl edges
    # would flip with id order, correlation blows up on near-constant rows
    with _pt.raises(ValueError, match="not a symmetric distance"):
        dbscan(df, eps=0.9, metric="kl_divergence")
    with _pt.raises(ValueError, match="not a symmetric distance"):
        dbscan(df, eps=0.9, metric="correlation")


def _planted_semdup(spark, rng, n_clusters=6, dup_groups=4):
    """Small corpus with planted near-identical vector groups."""
    rows = []
    vid = 0
    for g in range(dup_groups):
        base = rng.standard_normal(16)
        for _ in range(3):  # 3 near-copies per group (cos ≈ 1)
            v = base + rng.standard_normal(16) * 1e-4
            rows.append((vid, [float(x) for x in v])); vid += 1
    for _ in range(30):  # background singletons
        rows.append((vid, [float(x) for x in rng.standard_normal(16)])); vid += 1
    return spark.createDataFrame(rows, "id long, features array<double>")


def test_semantic_dedup_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    """semantic_dedup ≡ numpy brute force within the same clustering:
    groups are the connected components of the exact-integer cosine
    graph restricted to clusters, keep = group min."""
    df = _planted_semdup(spark, rng)
    # deterministic 4-bucket assignment so the reference can mirror it
    asg = df.select(
        "id", (F.col("id") % 4).alias("cluster")
    )
    out = {r["id"]: (r["cluster"], r["group"], r["keep"])
           for r in D.semantic_dedup(df, tau=0.92, assignments=asg).collect()}

    X = np.zeros((len(out), 16))
    for r in df.collect():
        X[r["id"]] = r["features"]
    q = np.floor(X * 1e6 + 0.5)
    n2 = (q * q).sum(1)
    parent = list(range(len(X)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(X)):
        for b in range(a + 1, len(X)):
            if a % 4 != b % 4:
                continue
            s = float(q[a] @ q[b])
            if s > 0 and 1e8 * s * s >= 9200**2 * n2[a] * n2[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    for i in range(len(X)):
        grp = find(i)
        assert out[i] == (i % 4, grp, int(i == grp)), f"id {i}"


def test_semantic_dedup_kmeans_default_drops_planted_dups(spark):
    rng = np.random.default_rng(7)
    """Default path (k-means trained in-operator): every planted
    near-copy group loses all but one member; keeps are group minima."""
    df = _planted_semdup(spark, rng)
    out = D.semantic_dedup(df, tau=0.92, k=4, n_iters=3)
    rows = out.collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group"], []).append(r)
    # planted triples: ids (0,1,2), (3,4,5), (6,7,8), (9,10,11) — each
    # trio is near-identical so ends up in one k-means cluster together
    for g0 in (0, 3, 6, 9):
        trio = [r for r in rows if r["id"] in (g0, g0 + 1, g0 + 2)]
        assert len({r["group"] for r in trio}) == 1, f"group split at {g0}"
        assert sum(r["keep"] for r in trio) == 1
    for g, members in by_group.items():
        assert sum(r["keep"] for r in members) == 1
        assert min(r["id"] for r in members) == g


def test_semantic_pairs_branches_all_equal(spark):
    # The three physical strategies — JVM per-candidate predicate
    # (jvm_threshold high), single Arrow tile per cluster
    # (jvm_threshold=0), forced block-pair tiles (block_threshold=0,
    # 3 blocks) — must emit the identical canonical pair set; only
    # the plan differs.
    rng = np.random.default_rng(11)
    df = _planted_semdup(spark, rng)
    asg = df.select("id", (F.col("id") % 2).alias("cluster"))
    jvm = sorted(
        (r["a"], r["b"])
        for r in D.semantic_pairs_exact(
            df, asg, tau=0.92, jvm_threshold=1_000_000
        ).collect()
    )
    one = sorted(
        (r["a"], r["b"])
        for r in D.semantic_pairs_exact(
            df, asg, tau=0.92, jvm_threshold=0
        ).collect()
    )
    blk = sorted(
        (r["a"], r["b"])
        for r in D.semantic_pairs_exact(
            df, asg, tau=0.92, n_blocks=3, block_threshold=0,
            jvm_threshold=0,
        ).collect()
    )
    assert jvm == one == blk and len(one) > 0
    assert all(a < b for a, b in one)


def test_semantic_pairs_exact_tie_accepted(spark):
    # cos(a, b) == tau EXACTLY: the float64 screen lands inside the
    # 1e-9 band and the arbitrary-precision recheck must accept the
    # pair (the >= contract), while a clearly-below pair stays out.
    # scale=1e4 quantizes these coordinates exactly: q0=(10000, 0),
    # q1=(8000, 6000) -> S=8e7, Na=Nb=1e8, and 1e8*S^2 == tau_q^2*Na*Nb
    # at tau=0.8 (tau_q=8000) -- an exact tie.
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.8, 0.6]), (2, [0.6, 0.8])],
        "id long, features array<double>",
    )
    asg = df.select("id", F.lit(0).alias("cluster"))
    for jt in (0, 100):  # tile branch (band recheck) AND jvm branch
        got = sorted(
            (r["a"], r["b"])
            for r in D.semantic_pairs_exact(
                df, asg, tau=0.8, scale=1e4, jvm_threshold=jt
            ).collect()
        )
        # cos(0,1)=0.8 (tie: in), cos(1,2)=0.96 (in), cos(0,2)=0.6 (out)
        assert got == [(0, 1), (1, 2)], jt


def test_ivf_pq_index_add_frozen_model_equality(spark, corpus, tmp_path):
    """extend() discipline (neighbors/ivf_pq.cuh): the index GROWN by
    delta-adds must hold exactly the codes a from-scratch encode of the
    full corpus produces under the SAME frozen model state — encoding
    is a pure per-row function of (centroids, codebooks). Also replay:
    re-adding an already-present batch appends nothing."""
    import numpy as np

    from raft_spark.operators.similarity import (
        _norm_table,
        _residual_pass,
        ivf_assign,
        ivf_pq_index_add,
        pq_encode,
    )

    b1 = corpus.filter(F.col("id") % 2 == 0)
    b2 = corpus.filter(F.col("id") % 2 == 1)
    idx = SIM.build_ivf_pq_index(b1, n_lists=4, kmeans_iters=2)
    idx["codes"] = idx["codes"].localCheckpoint(eager=True)
    p = str(tmp_path / "delta_index")
    SIM.write_ivf_pq_index(idx, p)
    n1 = ivf_pq_index_add(b2, p)
    assert n1 == b2.count() and n1 > 0
    # replay is a no-op
    assert ivf_pq_index_add(b2, p) == 0

    grown = SIM.read_ivf_pq_index(spark, p)
    got = {
        (r["id"], r["list_id"], tuple(r["codes"]))
        for r in grown["codes"].collect()
    }
    # from-scratch encode of the FULL corpus under the same frozen model
    C = np.asarray(idx["centroids"], dtype=float)
    cn = _norm_table(corpus, "id", "features").withColumnRenamed("_v", "features")
    res = ivf_assign(cn, C, "features").mapInPandas(
        _residual_pass(C, "features"),
        "_id long, list_id int, residual array<double>",
    )
    want_codes = pq_encode(res, idx["codebooks"], id_col="_id",
                           vec_col="residual").join(
        res.select(F.col("_id").alias("id"), "list_id"), "id"
    )
    want = {
        (r["id"], r["list_id"], tuple(r["codes"]))
        for r in want_codes.collect()
    }
    assert got == want and len(got) == corpus.count()
