"""Matrix-manipulation ops vs numpy oracles (reference test pattern:
cpp/tests/matrix/{gather,slice,reverse}.cu — naive reference compare)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from raft_spark.operators import matrixops as M


def _matrix_df(spark, a):
    return spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(a.shape[0])],
        "id long, features array<double>",
    )


def test_gather_scatter_roundtrip(spark):
    a = np.arange(24.0).reshape(6, 4)
    df = _matrix_df(spark, a)
    # permutation map: out/dst = (i*5) % 6 is a bijection on 0..5
    perm = [(i, (i * 5) % 6) for i in range(6)]
    gmap = spark.createDataFrame([(o, s) for o, s in perm], "out_id long, src_id long")
    got = {r["out_id"]: r["features"] for r in M.gather(df, gmap).collect()}
    for o, s in perm:
        assert got[o] == list(a[s])

    smap = spark.createDataFrame([(s, o) for o, s in perm], "src_id long, dst_id long")
    got = {r["out_id"]: r["features"] for r in M.scatter(df, smap).collect()}
    for o, s in perm:
        assert got[o] == list(a[s])


def test_shift_cols_both_directions(spark):
    a = np.array([[1.0, 2.0, 3.0, 4.0]])
    df = _matrix_df(spark, a)
    right = M.shift_cols(df, 2, fill=9.0).collect()[0]["features"]
    assert right == [9.0, 9.0, 1.0, 2.0]
    left = M.shift_cols(df, -1, fill=0.0).collect()[0]["features"]
    assert left == [2.0, 3.0, 4.0, 0.0]


def test_shift_rows_and_reverse_rows(spark):
    a = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    df = _matrix_df(spark, a)
    down = {r["id"]: r["features"] for r in M.shift_rows(df, 1, fill=7.0).collect()}
    assert down == {0: [7.0, 7.0], 1: [1.0, 2.0], 2: [3.0, 4.0]}
    up = {r["id"]: r["features"] for r in M.shift_rows(df, -2).collect()}
    assert up == {0: [5.0, 6.0], 1: [0.0, 0.0], 2: [0.0, 0.0]}
    rev = {r["id"]: r["features"] for r in M.reverse_rows(df, n_rows=3).collect()}
    assert rev == {0: [5.0, 6.0], 1: [3.0, 4.0], 2: [1.0, 2.0]}


def test_masked_matmul_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = rng.standard_normal((10, 6))
    b = rng.standard_normal((8, 6))
    mask = [(i, j) for i in range(10) for j in range(8) if (i + j) % 3 == 0]
    out = M.masked_matmul(
        _matrix_df(spark, a),
        _matrix_df(spark, b),
        spark.createDataFrame(mask, "i long, j long"),
    ).collect()
    got = {(r["i"], r["j"]): r["value"] for r in out}
    assert set(got) == set(mask)
    for i, j in mask:
        assert abs(got[(i, j)] - float(a[i] @ b[j])) < 1e-9


def test_mvn_sample_covariance(spark):
    # property test: sample covariance of the MVN query ≈ target Σ
    from raft_spark.queries.rng_queries import q_mvn, _MVN_COV

    pdf = q_mvn(spark, "").toPandas()
    sample_cov = np.cov(pdf[["x0", "x1", "x2"]].to_numpy(), rowvar=False)
    assert np.allclose(sample_cov, np.array(_MVN_COV), atol=0.25)


def test_bitmap_to_csr(spark):
    from raft_spark.operators.matrixops import bitmap_to_csr

    rows = [(0, [True, False, True]), (1, [False, False, False]), (2, [False, True, False])]
    df = spark.createDataFrame(rows, "id long, bits array<boolean>")
    out = sorted((r.row, r.col, r.value) for r in bitmap_to_csr(df, "bits").collect())
    assert out == [(0, 0, 1.0), (0, 2, 1.0), (2, 1, 1.0)]


def test_col_moments_rowids_subset(spark):
    import numpy as np

    from raft_spark.operators.reductions import col_moments

    a = np.arange(20, dtype=float).reshape(10, 2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(10)], "id long, features array<double>"
    )
    ids = spark.createDataFrame([(i,) for i in (1, 3, 5)], "id long")
    out = {r.pos: (r.min, r.max, r.mean) for r in col_moments(df, rowids=ids).collect()}
    sub = a[[1, 3, 5]]
    for pos in (0, 1):
        assert out[pos] == (sub[:, pos].min(), sub[:, pos].max(), sub[:, pos].mean())


def test_multimodal_extract_and_resize(spark):
    from raft_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(0, "hello world " * 40), (1, ""), (2, "zz")], "doc_id long, text string"
    )
    frame = MM.with_binary_payload(docs)
    feats = {r.doc_id: r.features for r in MM.extract_features(frame, n_bins=16).collect()}
    assert len(feats[0]) == 16 and abs(sum(feats[0]) - 1.0) < 1e-9
    assert feats[1] == [0.0] * 16  # empty payload
    # n_bins that does NOT divide 256: width must still be exactly n_bins
    # (the old 256//n_bins binning yielded ragged >n_bins vectors)
    f100 = {r.doc_id: r.features for r in MM.extract_features(frame, n_bins=100).collect()}
    assert all(len(v) == 100 for v in f100.values())
    assert abs(sum(f100[0]) - 1.0) < 1e-9
    rs = {r.doc_id: r for r in MM.resize_image(frame, 8, 8).collect()}
    for d in (0, 1, 2):
        assert len(rs[d].payload) == 64 and rs[d].width == 8


def test_lang_id_model_fallback(spark):
    from raft_spark.operators.textquality import lang_id_model

    from raft_spark.operators.textquality import lang_id

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = lang_id_model(docs).collect()
    # fasttext absent here → fallback must agree with the expression
    # heuristic exactly, with confidence pinned to 1.0
    expect = docs.select(lang_id("text").alias("l")).collect()[0].l
    assert out[0].pred_lang == expect and out[0].confidence == 1.0


def test_row_op_applies_per_group(spark):
    import pandas as pd

    from raft_spark.operators.matrixops import row_op

    df = spark.createDataFrame(
        [(0, 1.0), (0, 3.0), (1, 10.0)], "id long, v double"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = sorted((r.id, r.v) for r in row_op(df, center, "id long, v double").collect())
    assert out == [(0, -1.0), (0, 1.0), (1, 0.0)]


def test_standardize_matches_numpy(spark, sf_dir):
    import numpy as np

    from raft_spark.operators.reductions import standardize
    from raft_spark.sources.tables import embeddings_matrix

    m = embeddings_matrix(spark, sf_dir).select("id", "features")
    rows = {r["id"]: np.array(r["features"]) for r in m.collect()}
    X = np.stack([rows[i] for i in sorted(rows)])
    mu, sd = X.mean(0), X.std(0)
    want = (X - mu) / np.where(sd == 0, 1.0, sd)
    got = {r["id"]: np.array(r["features"]) for r in standardize(m).collect()}
    G = np.stack([got[i] for i in sorted(got)])
    assert np.allclose(G, want, atol=1e-9)
    # standardized columns: zero mean, unit variance
    assert np.allclose(G.mean(0), 0.0, atol=1e-9)
    assert np.allclose(G.std(0), 1.0, atol=1e-6)


def test_sort_cols_descending_stable_ties(spark):
    """Descending sort must keep the stable tie order (index ascending
    among equal values) — reverse(array_sort) flipped it."""
    from raft_spark.operators.matrixops import sort_cols_per_row

    df = spark.createDataFrame(
        [(0, [5.0, 5.0, 1.0, 7.0])], "id long, features array<double>"
    )
    r = sort_cols_per_row(df, asc=False).collect()[0]
    assert r["sorted_vals"] == [7.0, 5.0, 5.0, 1.0]
    assert r["perm"] == [3, 0, 1, 2]


def test_mean_center_inverts_with_explicit_means(spark):
    """add=True with the ORIGINAL means restores the input (the
    reference mean_add contract); add=True without means is documented
    as a no-op on a centered frame."""
    import numpy as np

    from raft_spark.operators.reductions import mean_center

    rs = np.random.RandomState(2)
    x = rs.rand(20, 4)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, features array<double>",
    )
    mu = x.mean(0)
    centered = mean_center(df)
    restored = mean_center(centered, add=True, means=[float(m) for m in mu])
    got = {r["id"]: r["features"] for r in restored.collect()}
    for i in range(len(x)):
        assert np.allclose(got[i], x[i], atol=1e-12)


def test_dense_gemm_blocked_matches_numpy(spark):
    # blocked-BLAS dense gemm (sparse.dense_gemm): rectangular operands
    # with block sizes that do NOT divide the dims (ragged edge tiles),
    # checked cell-for-cell against numpy. The long-form join-agg gemm
    # stays the sparse-operand plan; this is the dense-operand strategy
    # (linalg/gemm.cuh:51's cuBLAS role).
    from raft_spark.operators.sparse import dense_gemm, gemm

    rng = np.random.default_rng(7)
    m, k, n = 37, 53, 29
    A = rng.normal(size=(m, k))
    B = rng.normal(size=(k, n))

    def longf(M_):
        return spark.createDataFrame(
            [(int(i), int(j), float(M_[i, j]))
             for i in range(M_.shape[0]) for j in range(M_.shape[1])],
            "row long, col long, value double",
        )
    al, bl = longf(A), longf(B)
    got = dense_gemm(al, bl, row_block=16, col_block=8).collect()
    C = np.zeros((m, n))
    for r in got:
        C[r["row"], r["col"]] = r["value"]
    assert len(got) == m * n
    assert np.abs(C - A @ B).max() < 1e-9

    # and it agrees with the long-form plan on the same input
    got2 = {(r["row"], r["col"]): r["value"] for r in gemm(al, bl).collect()}
    assert all(abs(got2[(r["row"], r["col"])] - r["value"]) < 1e-9 for r in got)


def test_dense_gemm_duplicate_coo_entries_sum(spark):
    # COO-style duplicated (row, col) entries must SUM in BOTH gemm
    # plans — the tile scatter was last-write-wins pre-fix, silently
    # diverging from the join-agg plan on the same input
    from raft_spark.operators.sparse import dense_gemm, gemm

    a = spark.createDataFrame(
        [(0, 0, 1.0), (0, 0, 2.0), (0, 1, 4.0), (1, 1, 5.0)],
        "row long, col long, value double",
    )
    b = spark.createDataFrame(
        [(0, 0, 10.0), (1, 0, 100.0), (1, 0, 1.0), (1, 1, 7.0)],
        "row long, col long, value double",
    )
    want = {(r["row"], r["col"]): r["value"] for r in gemm(a, b).collect()}
    got = {
        (r["row"], r["col"]): r["value"]
        for r in dense_gemm(a, b, row_block=2, col_block=2).collect()
        if r["value"] != 0.0
    }
    # A = [[3,4],[0,5]], B = [[10,0],[101,7]] -> C = [[434,28],[505,35]]
    assert got == {(0, 0): 434.0, (0, 1): 28.0, (1, 0): 505.0, (1, 1): 35.0}
    assert want == got
