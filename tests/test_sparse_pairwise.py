"""sparse_pairwise vs a dense numpy twin: the inverted-index join must
reproduce dense metric values exactly on the shared-support pairs, and
only emit pairs that share at least one column."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import sparse as SP

N, D = 20, 12


@pytest.fixture(scope="module")
def sp(spark):
    rng = np.random.default_rng(3)
    M = rng.normal(size=(N, D))
    M[rng.random((N, D)) < 0.6] = 0.0  # ~60% sparse
    M[0, :] = 0.0
    M[0, 0] = 1.0  # a 1-nnz row exercises the norm joins
    rows = [
        (i, j, float(M[i, j]))
        for i in range(N) for j in range(D) if M[i, j] != 0.0
    ]
    df = spark.createDataFrame(rows, "row long, col long, value double").cache()
    yield df, M
    df.unpersist()


def _dense(m, x, y):
    if m == "inner":
        return float(np.dot(x, y))
    if m == "cosine":
        return float(np.dot(x, y) / np.sqrt(np.dot(x, x) * np.dot(y, y)))
    if m == "sqeuclidean":
        return float(np.sum((x - y) ** 2))
    sx, sy = set(np.flatnonzero(x)), set(np.flatnonzero(y))
    inter = len(sx & sy)
    if m == "jaccard":  # distance, matching the dense _METRICS convention
        return 1 - inter / len(sx | sy)
    if m == "dice":  # distance
        return 1 - 2 * inter / (len(sx) + len(sy))
    if m == "overlap":
        return inter / min(len(sx), len(sy))
    raise KeyError(m)


@pytest.mark.parametrize(
    "metric", ["inner", "cosine", "sqeuclidean", "jaccard", "dice", "overlap"]
)
def test_sparse_pairwise_matches_dense(spark, sp, metric):
    df, M = sp
    got = {(r["a"], r["b"]): r["dist"]
           for r in SP.sparse_pairwise(df, metric=metric).collect()}
    support = {
        (a, b)
        for a in range(N) for b in range(a + 1, N)
        if np.any((M[a] != 0) & (M[b] != 0))
    }
    assert set(got) == support  # exactly the shared-support pairs
    for (a, b), v in got.items():
        exp = round(_dense(metric, M[a], M[b]), 6)
        assert abs(v - exp) <= 2e-6, (metric, a, b, v, exp)


def test_sparse_pairwise_max_col_df(spark, sp):
    df, M = sp
    # cap at df=3: hot columns leave the join; surviving pairs keep
    # EXACT inner products over the remaining columns
    hot = {j for j in range(D) if int(np.sum(M[:, j] != 0)) > 3}
    Mc = M.copy(); Mc[:, list(hot)] = 0.0
    got = {(r["a"], r["b"]): r["dist"]
           for r in SP.sparse_pairwise(df, metric="inner", max_col_df=3).collect()}
    for (a, b), v in got.items():
        assert abs(v - round(float(np.dot(Mc[a], Mc[b])), 6)) <= 2e-6


def test_sparse_pairwise_unknown_metric(spark, sp):
    df, _ = sp
    with pytest.raises(ValueError, match="unknown sparse metric"):
        SP.sparse_pairwise(df, metric="nope")


def test_sparse_pairwise_threshold(spark, sp):
    df, M = sp
    full = {(r["a"], r["b"]): r["dist"]
            for r in SP.sparse_pairwise(df, metric="cosine").collect()}
    cut = {(r["a"], r["b"]): r["dist"]
           for r in SP.sparse_pairwise(df, metric="cosine",
                                       threshold=0.2).collect()}
    assert cut == {k: v for k, v in full.items() if v >= 0.2}
    # distance metrics keep dist <= threshold (jaccard — a true distance
    # whose zero-overlap pairs really are the never-stored 1.0)
    dfull = {(r["a"], r["b"]): r["dist"]
             for r in SP.sparse_pairwise(df, metric="jaccard").collect()}
    dcut = {(r["a"], r["b"]): r["dist"]
            for r in SP.sparse_pairwise(df, metric="jaccard",
                                        threshold=0.9).collect()}
    assert dcut == {k: v for k, v in dfull.items() if v <= 0.9}
    # sqeuclidean + threshold is REJECTED (r10): non-co-occurring pairs
    # have finite distance ||a||^2+||b||^2 that can satisfy the cut, so
    # the operator cannot deliver 'all pairs with dist <= t'
    with pytest.raises(ValueError, match="sqeuclidean"):
        SP.sparse_pairwise(df, metric="sqeuclidean", threshold=5.0)


# ---------------------------------------------------------------------------
# persisted postings index + delta lookup
# ---------------------------------------------------------------------------


def test_postings_roundtrip_lookup(spark, sp, tmp_path):
    """sparse_lookup(batch, postings(corpus)) == rectangular metric
    values recomputed densely, for cosine and jaccard."""
    df, M = sp
    corpus = df.filter(F.col("row") < 15)
    batch = df.filter(F.col("row") >= 15).withColumn(
        "row", F.col("row") + 100)  # disjoint id space
    path = str(tmp_path / "idx")
    SP.write_postings(corpus, path, n_shards=8)
    for metric in ("cosine", "jaccard"):
        got = {(r["a"], r["b"]): r["dist"]
               for r in SP.sparse_lookup(batch, spark, path,
                                         metric=metric).collect()}
        for (a, b), v in got.items():
            x, y = M[a - 100], M[b]
            if metric == "cosine":
                exp = float(np.dot(x, y) /
                            np.sqrt(np.dot(x, x) * np.dot(y, y)))
            else:
                sx, sy = set(np.flatnonzero(x)), set(np.flatnonzero(y))
                exp = 1 - len(sx & sy) / len(sx | sy)
            assert abs(v - round(exp, 6)) <= 2e-6, (metric, a, b)
        # support = exactly the sharing pairs
        support = {
            (a + 100, b) for a in range(15, 20) for b in range(15)
            if np.any((M[a] != 0) & (M[b] != 0))
        }
        assert set(got) == support


def test_postings_add_extends_lookup(spark, sp, tmp_path):
    """postings_add: the delta's rows join the corpus for subsequent
    lookups (append-only, no rewrite)."""
    df, M = sp
    corpus = df.filter(F.col("row") < 10)
    delta = df.filter((F.col("row") >= 10) & (F.col("row") < 15))
    batch = df.filter(F.col("row") >= 15).withColumn(
        "row", F.col("row") + 100)
    path = str(tmp_path / "idx2")
    SP.write_postings(corpus, path, n_shards=8)
    before = {(r["a"], r["b"]) for r in
              SP.sparse_lookup(batch, spark, path).collect()}
    SP.postings_add(delta, path)
    after = {(r["a"], r["b"]) for r in
             SP.sparse_lookup(batch, spark, path).collect()}
    assert before <= after
    assert any(b >= 10 for _, b in after)  # delta rows now reachable


def test_postings_lookup_prunes_shards(spark, sp, tmp_path):
    """The lookup plan must carry a _shard partition filter (IO bound
    to the touched slice of the index)."""
    from raft_spark.plans import audit_plan

    df, _ = sp
    path = str(tmp_path / "idx3")
    SP.write_postings(df, path, n_shards=8)
    batch = df.filter(F.col("row") == 0).withColumn("row", F.lit(999))
    rep = audit_plan(SP.sparse_lookup(batch, spark, path))
    assert "_shard" in rep.text


def test_postings_add_replay_noop(spark, sp, tmp_path):
    """r10: re-adding an already-ingested delta must change NOTHING —
    the anti-join replay guard against the norms sidecar (the
    ivf_pq_index_add discipline)."""
    df, M = sp
    corpus = df.filter(F.col("row") < 10)
    delta = df.filter((F.col("row") >= 10) & (F.col("row") < 15))
    batch = df.filter(F.col("row") >= 15).withColumn(
        "row", F.col("row") + 100)
    path = str(tmp_path / "idxr")
    SP.write_postings(corpus, path, n_shards=8)
    SP.postings_add(delta, path)
    first = {(r["a"], r["b"]): r["dist"] for r in
             SP.sparse_lookup(batch, spark, path).collect()}
    n_norms = spark.read.parquet(path + "/norms").count()
    n_postings = spark.read.parquet(path + "/postings").count()
    SP.postings_add(delta, path)  # full replay
    SP.postings_add(df.filter(F.col("row") < 13), path)  # partial overlap
    assert spark.read.parquet(path + "/norms").count() == n_norms
    assert spark.read.parquet(path + "/postings").count() == n_postings
    again = {(r["a"], r["b"]): r["dist"] for r in
             SP.sparse_lookup(batch, spark, path).collect()}
    assert again == first


def test_postings_lookup_full_metric_set(spark, sp, tmp_path):
    """r10: every sparse metric is lookup-servable from the persisted
    index with values equal to the dense recomputation (sqeuclidean
    unthresholded — the threshold combination is rejected)."""
    df, M = sp
    corpus = df.filter(F.col("row") < 15)
    batch = df.filter(F.col("row") >= 15).withColumn(
        "row", F.col("row") + 100)
    path = str(tmp_path / "idxm")
    SP.write_postings(corpus, path, n_shards=8)

    def dense(metric, x, y):
        ip = float(np.dot(x, y))
        nx, ny = float(np.dot(x, x)), float(np.dot(y, y))
        sx, sy = set(np.flatnonzero(x)), set(np.flatnonzero(y))
        sh = len(sx & sy)
        if metric == "inner":
            return ip
        if metric == "cosine":
            return ip / np.sqrt(nx * ny)
        if metric == "sqeuclidean":
            return nx + ny - 2 * ip
        if metric == "jaccard":
            return 1 - sh / (len(sx) + len(sy) - sh)
        if metric == "dice":
            return 1 - 2 * sh / (len(sx) + len(sy))
        return sh / min(len(sx), len(sy))  # overlap

    for metric in sorted(SP._SPARSE_METRICS):
        got = {(r["a"], r["b"]): r["dist"]
               for r in SP.sparse_lookup(batch, spark, path,
                                         metric=metric).collect()}
        assert got, metric
        for (a, b), v in got.items():
            exp = dense(metric, M[a - 100], M[b])
            assert abs(v - round(exp, 6)) <= 2e-6, (metric, a, b)
    with pytest.raises(ValueError, match="sqeuclidean"):
        SP.sparse_lookup(batch, spark, path, metric="sqeuclidean",
                         threshold=5.0)


def test_single_linkage_minkowski_p(spark):
    """r10 (ADVICE): single_linkage accepts metric='minkowski' with p —
    the same metric surface as dbscan over the shared pair generator."""
    from raft_spark.operators import similarity as SIM

    import numpy as np

    rng = np.random.default_rng(7)
    X = np.vstack([rng.normal(0, 0.05, (6, 4)),
                   rng.normal(5, 0.05, (6, 4))])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "id long, features array<double>",
    )
    out = SIM.single_linkage(df, n_clusters=2, metric="minkowski", p=1.5)
    labs = {r["id"]: r["cluster"] for r in out.collect()}
    assert len(set(labs.values())) == 2
    assert len({labs[i] for i in range(6)}) == 1
    assert len({labs[i] for i in range(6, 12)}) == 1
    with pytest.raises(ValueError, match="minkowski"):
        SIM.single_linkage(df, n_clusters=2, metric="minkowski")  # no p


def test_sparse_lookup_max_col_df(spark, sp, tmp_path):
    """r10: the stop-column cap at lookup time — df counted over the
    pruned postings slice + the batch's own contribution; surviving
    pairs keep exact values over the remaining columns."""
    df, M = sp
    corpus = df.filter(F.col("row") < 15)
    batch = df.filter(F.col("row") >= 15).withColumn(
        "row", F.col("row") + 100)
    path = str(tmp_path / "idxc")
    SP.write_postings(corpus, path, n_shards=8)
    cap = 6
    # union df per column (corpus rows < 15 plus batch rows)
    nz = [(j, int(np.sum(M[:15, j] != 0) + np.sum(M[15:, j] != 0)))
          for j in range(D)]
    hot = {j for j, c in nz if c > cap}
    Mc = M.copy(); Mc[:, list(hot)] = 0.0
    got = {(r["a"], r["b"]): r["dist"]
           for r in SP.sparse_lookup(batch, spark, path, metric="inner",
                                     max_col_df=cap).collect()}
    assert got  # cap leaves some pairs on this fixture
    for (a, b), v in got.items():
        exp = round(float(np.dot(Mc[a - 100], Mc[b])), 6)
        assert abs(v - exp) <= 2e-6, (a, b)
    # r11 (ADVICE fix): NORM-based metrics must use norms over the
    # SURVIVING columns — batch norms recomputed from the col-filtered
    # batch, corpus norms with the capped columns' contributions
    # subtracted — so values equal the dense twin over the capped matrix
    for metric in ("cosine", "sqeuclidean", "jaccard"):
        gm = {(r["a"], r["b"]): r["dist"]
              for r in SP.sparse_lookup(batch, spark, path, metric=metric,
                                        max_col_df=cap).collect()}
        assert gm, metric
        for (a, b), v in gm.items():
            exp = round(_dense(metric, Mc[a - 100], Mc[b]), 6)
            assert abs(v - exp) <= 2e-6, (metric, a, b)


def test_compact_postings_distributed_branch(spark, sp, tmp_path,
                                             monkeypatch):
    """r13: small stores compact via one Arrow collect + driver-side
    file writes; stores over SMALL_STORE_ROWS keep the distributed
    partitionBy write. Every unit test's index is small, so the
    distributed branch would otherwise be unexercised — force it
    through the threshold seam and assert the same content contract
    both branches must meet."""
    from raft_spark.operators import statestore as SS

    df, _M = sp
    path = str(tmp_path / "idxd")
    SP.write_postings(df.filter(F.col("row") < 10), path, n_shards=4)
    SP.postings_add(df.filter(F.col("row") >= 10), path)
    before = {
        (r["col"], r["row"], r["value"])
        for r in spark.read.parquet(path + "/postings").collect()
    }
    monkeypatch.setattr(SS, "SMALL_STORE_ROWS", 0)  # force distributed
    n = SP.compact_postings(spark, path)
    after = {
        (r["col"], r["row"], r["value"])
        for r in spark.read.parquet(path + "/postings").collect()
    }
    assert n == len(before) and after == before


def test_compact_postings_preserves_content(spark, sp, tmp_path):
    """Compaction is a pure file-layout rewrite: lookup results and row
    contents identical, shard file count reduced after several delta
    appends."""
    import glob

    df, M = sp
    path = str(tmp_path / "idxk")
    SP.write_postings(df.filter(F.col("row") < 8), path, n_shards=4)
    for lo, hi in ((8, 12), (12, 16)):
        SP.postings_add(
            df.filter((F.col("row") >= lo) & (F.col("row") < hi)), path)
    batch = df.filter(F.col("row") >= 16).withColumn("row", F.col("row") + 100)
    before = {(r["a"], r["b"]): r["dist"]
              for r in SP.sparse_lookup(batch, spark, path).collect()}
    files_before = len(glob.glob(path + "/postings/_dv=*/_shard=*/*.parquet"))
    n = SP.compact_postings(spark, path)
    files_after = len(glob.glob(path + "/postings/_dv=*/_shard=*/*.parquet"))
    after = {(r["a"], r["b"]): r["dist"]
             for r in SP.sparse_lookup(batch, spark, path).collect()}
    assert after == before and n == spark.read.parquet(
        path + "/postings").count()
    assert files_after < files_before
    # post-compaction delta append still works + replay still no-op
    SP.postings_add(df.filter(F.col("row") < 8), path)
    assert {(r["a"], r["b"]): r["dist"]
            for r in SP.sparse_lookup(batch, spark, path).collect()} == before


def test_postings_add_stream_matches_batch(spark, sp, tmp_path):
    """Two micro-batches through the foreachBatch twin == one batch
    build + add over the same rows."""
    from raft_spark.streaming.incremental import postings_add_stream

    df, M = sp
    corpus = df.filter(F.col("row") < 8)
    path = str(tmp_path / "idxs")
    SP.write_postings(corpus, path, n_shards=4)
    d = tmp_path / "in"
    df.filter((F.col("row") >= 8) & (F.col("row") < 12)).coalesce(1) \
        .write.parquet(str(d / "f1.parquet"))
    df.filter((F.col("row") >= 12) & (F.col("row") < 16)).coalesce(1) \
        .write.parquet(str(d / "f2.parquet"))
    stream = (
        spark.readStream.schema("row long, col long, value double")
        .option("maxFilesPerTrigger", 1).parquet(str(d) + "/*/")
    )
    q = postings_add_stream(stream, path, checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()

    p2 = str(tmp_path / "idxb")
    SP.write_postings(corpus, p2, n_shards=4)
    SP.postings_add(df.filter((F.col("row") >= 8) & (F.col("row") < 16)), p2)
    batch = df.filter(F.col("row") >= 16).withColumn("row", F.col("row") + 100)
    got = {(r["a"], r["b"]): r["dist"]
           for r in SP.sparse_lookup(batch, spark, path).collect()}
    want = {(r["a"], r["b"]): r["dist"]
            for r in SP.sparse_lookup(batch, spark, p2).collect()}
    assert got == want and got
