"""Solver/decomposition ops vs numpy/naive oracles (SURVEY.md §5.1:
the reference tests every op against a naive implementation with
tolerance compare — cpp/tests/linalg/{svd,eig,lstsq}.cu pattern)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from pyspark.sql import functions as F

from raft_spark.operators import solvers as SV


def _matrix_df(spark, a: np.ndarray):
    rows = [(i, [float(x) for x in a[i]]) for i in range(a.shape[0])]
    return spark.createDataFrame(rows, "id long, features array<double>")


def _coo_df(spark, a: np.ndarray):
    rows = [
        (i, j, float(a[i, j]))
        for i in range(a.shape[0])
        for j in range(a.shape[1])
        if a[i, j] != 0.0
    ]
    return spark.createDataFrame(rows, "row long, col long, value double")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_lstsq_normal_matches_numpy(spark, rng):
    x = rng.standard_normal((200, 3))
    w_true = np.array([3.0, -2.0, 0.5])
    y = 1.0 + x @ w_true + 0.01 * rng.standard_normal(200)
    df = spark.createDataFrame(
        [(float(r[0]), float(r[1]), float(r[2]), float(yy)) for r, yy in zip(x, y)],
        "x1 double, x2 double, x3 double, y double",
    )
    w = SV.lstsq_normal(df, ["x1", "x2", "x3"], "y")
    design = np.column_stack([np.ones(200), x])
    expect, *_ = np.linalg.lstsq(design, y, rcond=None)
    assert np.allclose(w, expect, atol=1e-8)


def test_covariance_and_pca_match_numpy(spark, rng):
    a = rng.standard_normal((60, 5)) @ np.diag([3.0, 2.0, 1.0, 0.5, 0.1])
    df = _matrix_df(spark, a)
    cov = SV.covariance_matrix(df)
    assert np.allclose(cov, np.cov(a, rowvar=False), atol=1e-9)

    comps, ev, ratio, _ = SV.pca_fit(df, n_components=3)
    w = np.linalg.eigvalsh(np.cov(a, rowvar=False))[::-1]
    assert np.allclose(ev, w[:3], atol=1e-9)
    assert np.allclose(ratio, w[:3] / w.sum(), atol=1e-9)
    # components orthonormal + sign-stabilized (max-|.| coord positive)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    for c in comps:
        assert c[np.abs(c).argmax()] > 0


def test_pca_transform_projects(spark, rng):
    a = rng.standard_normal((20, 4))
    df = _matrix_df(spark, a)
    comps = np.eye(2, 4)
    out = SV.pca_transform(df, comps).orderBy("id").collect()
    got = np.array([[r["pc0"], r["pc1"]] for r in out])
    assert np.allclose(got, a @ comps.T, atol=1e-12)


def test_tsvd_and_rsvd_match_numpy(spark, rng):
    a = rng.standard_normal((80, 8)) @ np.diag([10, 8, 6, 4, 2, 1, 0.5, 0.1])
    df = _matrix_df(spark, a)
    expect = np.linalg.svd(a, compute_uv=False)[:4]
    assert np.allclose(SV.tsvd_singular_values(df, k=4), expect, rtol=1e-8)
    # randomized: tight for well-separated spectrum with oversampling
    assert np.allclose(SV.rsvd_singular_values(df, k=4), expect, rtol=1e-4)


def test_cholesky_qr_r(spark, rng):
    a = rng.standard_normal((50, 4))
    r = SV.cholesky_qr_r(_matrix_df(spark, a))
    _, r_np = np.linalg.qr(a)
    # R unique up to row signs
    assert np.allclose(np.abs(r), np.abs(r_np), atol=1e-8)


def test_power_iteration_matches_numpy(spark, rng):
    a = rng.standard_normal((12, 12))
    a = a + a.T + 12 * np.eye(12)  # dominant positive eigenvalue
    lam, _ = SV.power_iteration(spark, _coo_df(spark, a), n=12, iters=60)
    assert abs(lam - np.linalg.eigvalsh(a)[-1]) < 1e-6


def _kruskal(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, n = 0.0, 0
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            total += w
            n += 1
    return n, total


def test_mst_matches_kruskal(spark, rng):
    nodes = 15
    edges = []
    for a in range(nodes):
        for b in range(a + 1, nodes):
            if rng.random() < 0.4:
                edges.append((a, b, float(rng.integers(1, 100))))
    df = spark.createDataFrame(edges, "row long, col long, value double")
    got = SV.mst(df)
    n_exp, w_exp = _kruskal(edges)
    assert len(got) == n_exp
    assert abs(sum(w for _, _, w in got) - w_exp) < 1e-9
    # fully distributed Borůvka (O(1) driver state) agrees with the
    # driver union-find variant and with Kruskal
    tree = SV.mst_edges(df).collect()
    assert len(tree) == n_exp
    assert abs(sum(r.value for r in tree) - w_exp) < 1e-9


def test_mst_long_merge_chain(spark):
    """Regression (ADVICE r2 high): a path graph with monotone weights
    merges ALL components in Boruvka round 1, so the merge graph is a
    chain of length V-1 — far past plain label propagation's old
    20-iteration cap. Pointer jumping must converge the labels, the
    tree must be exactly the path (no duplicate edges), and the loop
    must terminate in O(log V) rounds."""
    v = 60
    edges = [(i, i + 1, float(i + 1)) for i in range(v - 1)]
    df = spark.createDataFrame(edges, "row long, col long, value double")
    tree = SV.mst_edges(df).collect()
    assert len(tree) == v - 1  # duplicates would inflate this
    assert len({(r.row, r.col) for r in tree}) == v - 1
    assert abs(sum(r.value for r in tree) - sum(w for _, _, w in edges)) < 1e-9


def test_connected_components_long_path(spark):
    """A 150-node path converges to one label in ≤64 pointer-jumping
    rounds (old propagation needed diameter=149 and silently returned
    unconverged labels at its 20-round cap)."""
    edges = [(i, i + 1, 1.0) for i in range(149)]
    df = spark.createDataFrame(edges, "row long, col long, value double")
    labels = {r["node"]: r["label"] for r in SV.connected_components(df).collect()}
    assert set(labels.values()) == {0}


def test_connected_components(spark):
    # two components: {0,1,2}, {5,6}; isolated pairs via edges only
    edges = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0)]
    df = spark.createDataFrame(edges, "row long, col long, value double")
    labels = {r["node"]: r["label"] for r in SV.connected_components(df).collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[5] == labels[6] == 5


def test_lap_matches_bruteforce(spark, rng):
    n, batches = 4, 3
    rows = []
    costs = {}
    for b in range(batches):
        c = rng.random((n, n))
        costs[b] = c
        rows += [(b, i, j, float(c[i, j])) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "batch long, i long, j long, cost double")
    out = SV.lap_batched(df).collect()
    obj = {r["batch"]: r["objective"] for r in out}
    for b, c in costs.items():
        best = min(
            sum(c[i, p[i]] for i in range(n)) for p in itertools.permutations(range(n))
        )
        assert abs(obj[b] - best) < 1e-9


def test_lanczos_eigsh_matches_numpy(spark, rng):
    a = rng.standard_normal((16, 16))
    a = (a + a.T) / 2
    evals, _ = SV.lanczos_eigsh(spark, _coo_df(spark, a), n=16, k=3, m=16, which="LM")
    w = np.linalg.eigvalsh(a)
    expect = np.sort(w[np.argsort(-np.abs(w))[:3]])[::-1]
    assert np.allclose(evals, expect, atol=1e-6)


def test_lanczos_eigsh_smallest(spark, rng):
    a = rng.standard_normal((12, 12))
    a = a @ a.T + np.eye(12)  # SPD
    evals, _ = SV.lanczos_eigsh(spark, _coo_df(spark, a), n=12, k=2, m=12, which="SA")
    w = np.sort(np.linalg.eigvalsh(a))
    assert np.allclose(np.sort(evals), np.sort(w[:2]), atol=1e-6)


def _indefinite(rng, n: int) -> np.ndarray:
    """Symmetric with eigenvalues spread across both signs."""
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.linspace(-5.0, 5.0, n)
    return (q * w) @ q.T


def test_minres_solves_indefinite(spark, rng):
    n = 24
    a = _indefinite(rng, n)
    sigma = 0.37
    b = rng.standard_normal(n)
    bdf = spark.createDataFrame(
        [(i, float(b[i])) for i in range(n)], "idx long, val double"
    )
    x = np.zeros(n)
    for r in SV.minres_solve(spark, _coo_df(spark, a), bdf, n, sigma=sigma).collect():
        x[r["idx"]] = r["val"]
    res = np.linalg.norm((a - sigma * np.eye(n)) @ x - b)
    assert res <= 1e-6 * np.linalg.norm(b)


def test_lanczos_shift_invert_interior(spark, rng):
    """The round-3 verdict's SM gap: interior eigenpairs of an
    INDEFINITE operator converge at m ≈ 2k under sigma (shift-invert)
    where the plain |λ| ranking needs m ≈ n."""
    n, k = 100, 2
    a = _indefinite(rng, n)
    w = np.sort(np.linalg.eigvalsh(a))
    sigma = 0.5 * (w[n // 2 - 1] + w[n // 2])  # dead-interior shift
    evals, _ = SV.lanczos_eigsh(
        spark, _coo_df(spark, a), n=n, k=k, m=2 * k + 4,
        sigma=sigma, which="LM", inner="factorize",
    )
    expect = w[np.argsort(np.abs(w - sigma))[:k]]
    assert np.allclose(np.sort(evals), np.sort(expect), atol=1e-6)


@pytest.mark.slow  # multi-minute battery: default selection is driver-window sized (pytest.ini)
def test_lanczos_shift_invert_minres_inner(spark, rng):
    n = 16
    a = _indefinite(rng, n)
    w = np.sort(np.linalg.eigvalsh(a))
    sigma = 0.5 * (w[n // 2 - 1] + w[n // 2])
    evals, _ = SV.lanczos_eigsh(
        spark, _coo_df(spark, a), n=n, k=1, m=6,
        sigma=sigma, which="LM", inner="minres", inner_tol=1e-11,
    )
    expect = w[np.argsort(np.abs(w - sigma))[0]]
    assert np.allclose(evals, [expect], atol=1e-6)


def test_cholesky_r1_update(rng):
    a = rng.standard_normal((6, 6))
    a = a @ a.T + 6 * np.eye(6)
    x = rng.standard_normal(6)
    L = np.linalg.cholesky(a)
    up = SV.cholesky_r1_update(L, x, sign=1.0)
    assert np.allclose(up @ up.T, a + np.outer(x, x), atol=1e-9)
    dn = SV.cholesky_r1_update(up, x, sign=-1.0)
    assert np.allclose(dn @ dn.T, a, atol=1e-8)


def test_tsvd_factors_reconstruct(spark, rng):
    a = rng.standard_normal((80, 6)) @ np.diag([5.0, 3.0, 2.0, 1.0, 0.5, 0.2])
    df = _matrix_df(spark, a)
    k = 4
    u_df, s, v = SV.tsvd_factors(df, k=k)
    _, s_np, vt_np = np.linalg.svd(a, full_matrices=False)
    assert np.allclose(s, s_np[:k], atol=1e-8)
    u = np.zeros((80, k))
    for r in u_df.collect():
        u[r["id"]] = r["u"]
    # left factors orthonormal and reconstruction error = tail spectrum
    assert np.allclose(u.T @ u, np.eye(k), atol=1e-8)
    recon_df = SV.svd_reconstruction(u_df, s, v)
    recon = np.zeros_like(a)
    for r in recon_df.collect():
        recon[r["id"]] = r["features"]
    expect_err = np.sqrt((s_np[k:] ** 2).sum())
    assert abs(np.linalg.norm(a - recon) - expect_err) < 1e-6


def test_rsvd_factors_approximate(spark, rng):
    a = rng.standard_normal((100, 8)) @ np.diag([10.0, 6.0, 3.0, 1.0, 0.3, 0.1, 0.05, 0.01])
    df = _matrix_df(spark, a)
    k = 3
    u_df, s, v = SV.rsvd_factors(df, k=k)
    _, s_np, _ = np.linalg.svd(a, full_matrices=False)
    assert np.allclose(s, s_np[:k], rtol=1e-6)
    u = np.zeros((100, k))
    for r in u_df.collect():
        u[r["id"]] = r["u"]
    assert np.allclose(u.T @ u, np.eye(k), atol=1e-6)
    assert np.allclose(v.T @ v, np.eye(k), atol=1e-8)


def test_pca_transform_roundtrip(spark, rng):
    a = rng.standard_normal((50, 5)) @ np.diag([4.0, 2.0, 1.0, 0.1, 0.01]) + 7.0
    df = _matrix_df(spark, a)
    comps, ev, ratio, mean = SV.pca_fit(df, n_components=5)
    assert np.allclose(mean, a.mean(0), atol=1e-9)
    scores = SV.pca_transform(df, comps, mean)
    back = SV.pca_inverse_transform(scores, comps, mean)
    recon = np.zeros_like(a)
    for r in back.collect():
        recon[r["id"]] = r["features"]
    # full-rank round trip is exact
    assert np.allclose(recon, a, atol=1e-7)


@pytest.mark.slow  # multi-minute battery: default selection is driver-window sized (pytest.ini)
def test_lanczos_thick_restart_converges_where_single_cycle_fails(spark):
    """TRLan regression (sparse/solver/lanczos.cuh thick restart): the
    two smallest eigenpairs of a 48-node weighted-ring Laplacian at
    m=8 ≪ n. A single cycle at m=8 cannot resolve the tight low end of
    the spectrum; restarts must converge it WITHOUT growing the basis
    past 8 columns."""
    n = 48
    a = np.zeros((n, n))
    for i in range(n):
        w = 1.0 + (i % 4)
        a[i, (i + 1) % n] += w
        a[(i + 1) % n, i] += w
    lap = np.diag(a.sum(1)) - a
    coo = _coo_df(spark, lap)
    w_np = np.linalg.eigvalsh(lap)

    single, res_single = SV.lanczos_eigsh(
        spark, coo, n=n, k=2, m=8, which="SA", max_restarts=0
    )
    restarted, res_restart = SV.lanczos_eigsh(
        spark, coo, n=n, k=2, m=8, which="SA", max_restarts=12, tol=1e-9
    )
    err_single = np.abs(np.sort(single) - np.sort(w_np[:2])).max()
    err_restart = np.abs(np.sort(restarted) - np.sort(w_np[:2])).max()
    assert err_restart < 1e-6, (restarted, w_np[:2])
    # the single cycle at the same m is off by orders of magnitude
    assert err_single > 1e-2 * max(err_restart, 1e-12), (single, restarted)


@pytest.mark.slow  # multi-minute battery: default selection is driver-window sized (pytest.ini)
def test_lanczos_sm_and_vectors(spark, rng):
    # symmetric PSD matrix: graph Laplacian of a small ring + chords
    n = 24
    a = np.zeros((n, n))
    for i in range(n):
        for j in (i + 1, i + 5):
            w = 1.0 + ((i * 7 + j) % 3)
            a[i, j % n] += w
            a[j % n, i] += w
    lap = np.diag(a.sum(1)) - a
    coo = _coo_df(spark, lap)
    evals, vecs_df = SV.lanczos_eigsh(
        spark, coo, n=n, k=3, m=n, which="SM", return_vectors=True
    )
    w_np = np.linalg.eigvalsh(lap)
    # smallest-magnitude == smallest-algebraic on a PSD Laplacian
    assert np.allclose(np.sort(evals), np.sort(w_np[:3]), atol=1e-6)
    v = np.zeros((n, 3))
    for r in vecs_df.collect():
        v[r["idx"]] = r["evec"]
    # Ritz vectors: normalized and satisfying L v = lambda v
    for c in range(3):
        lam = evals[c]
        assert abs(np.linalg.norm(v[:, c]) - 1.0) < 1e-6
        assert np.linalg.norm(lap @ v[:, c] - lam * v[:, c]) < 1e-5


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from raft_spark.operators.solvers import pagerank

    rng = np.random.RandomState(3)
    n = 60
    edges = set()
    for _ in range(300):
        a, b = rng.randint(0, n, 2)
        if a != b:
            edges.add((int(a), int(b)))
    edges = sorted(edges)
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "row long, col long, value double"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, alpha=0.85, tol=1e-10).collect()}

    # numpy reference with identical dangling handling
    present = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(present)}
    m = len(present)
    A = np.zeros((m, m))
    for a, b in edges:
        A[idx[b], idx[a]] = 1.0
    outdeg = A.sum(0)
    r = np.full(m, 1.0 / m)
    for _ in range(200):
        dangling = r[outdeg == 0].sum()
        contrib = A @ np.divide(r, outdeg, out=np.zeros(m), where=outdeg > 0)
        r = (1 - 0.85) / m + 0.85 * (contrib + dangling / m)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for v in present:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-6)


def test_pagerank_exact_matches_python_recurrence(spark):
    """pagerank_exact must replay the integer recurrence bit-for-bit
    (any partitioning), and its quantized ranks must track the float
    pagerank to within the accumulated floor error."""
    rs = np.random.RandomState(3)
    edges = {(int(a), int(b)) for a, b in rs.randint(0, 40, (300, 2)) if a != b}
    # make a few nodes dangling: drop all out-edges of nodes >= 35
    edges = {(a, b) for a, b in edges if a < 35}
    coo = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "row long, col long, value double"
    ).repartition(7)
    got = {
        r["node"]: r["rank_int"]
        for r in SV.pagerank_exact(coo, iters=10).collect()
    }
    # driver-side integer replay
    S = 10**12
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    n = len(nodes)
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {u: S // n for u in nodes}
    basec = (3 * S // 20) // n
    for _ in range(10):
        dang = sum(r[u] for u in nodes if u not in deg)
        share = dang // n
        inb: dict[int, int] = {}
        for u, v in edges:
            inb[v] = inb.get(v, 0) + r[u] // deg[u]
        r = {u: basec + (17 * (inb.get(u, 0) + share)) // 20 for u in nodes}
    assert got == r
    # float twin proximity: 1/scale error per node per round is tiny
    f = {
        row["node"]: row["rank"]
        for row in SV.pagerank(coo, max_iters=10, tol=0.0).collect()
    }
    for u in nodes:
        assert abs(got[u] / S - f[u]) < 1e-6


def test_eps_pairs_exact_matches_float_pairs_off_boundary(spark):
    """Quantized ε-pairing equals the float pair set whenever no pair
    sits within quantization error of the threshold (and is exactly
    reproducible by an integer replay either way)."""
    from raft_spark.operators import similarity as SIM

    rs = np.random.RandomState(11)
    x = rs.uniform(-0.5, 0.5, (60, 8))
    df = _matrix_df(spark, x).repartition(5)
    eps = 0.9
    got = {
        (r["a"], r["b"]) for r in SIM.eps_pairs_exact(df, eps=eps).collect()
    }
    # integer replay of the quantized predicate
    q = np.floor(x * 1e6 + 0.5).astype(np.int64)
    eq = int(np.floor(eps * 1e6 + 0.5))
    want = {
        (i, j)
        for i in range(len(q))
        for j in range(i + 1, len(q))
        if int(((q[i] - q[j]) ** 2).sum()) <= eq * eq
    }
    assert got == want
    # float pair set agrees away from the quantization boundary
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    fpairs = {
        (i, j)
        for i in range(len(x))
        for j in range(i + 1, len(x))
        if d2[i, j] <= eps * eps and abs(d2[i, j] - eps * eps) > 1e-5
    }
    assert fpairs <= want


def test_connected_components_auto_paths_agree(spark):
    """Driver union-find (small-graph strategy) and distributed
    pointer-jumped propagation must produce identical component-min
    labels on the same graph."""
    rs = np.random.RandomState(5)
    edges = {(int(a), int(b)) for a, b in rs.randint(0, 200, (150, 2)) if a != b}
    coo = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "row long, col long, value double"
    ).repartition(6)
    drv = {
        (r["node"], r["label"])
        for r in SV.connected_components_auto(coo, driver_threshold=10**6).collect()
    }
    dist = {
        (r["node"], r["label"])
        for r in SV.connected_components_auto(coo, driver_threshold=0).collect()
    }
    assert drv == dist and len(drv) > 0


def test_operators_on_empty_inputs(spark):
    """Empty frames flow through (0 rows) or raise a CLEAR error —
    never an internal crash deep in a driver-side reduction."""
    import pytest as _pt

    from raft_spark.operators import dedup as D
    from raft_spark.operators import similarity as SIM
    from raft_spark.operators.selectk import select_k

    empty_vec = spark.createDataFrame([], "id long, features array<double>")
    empty_coo = spark.createDataFrame([], "row long, col long, value double")
    assert select_k(
        spark.createDataFrame([], "g long, v double, id long"),
        ["g"], "v", 3, payload_cols=["id"],
    ).count() == 0
    assert SIM.knn_brute(empty_vec, empty_vec).count() == 0
    assert SIM.eps_pairs_exact(empty_vec, 1.0).count() == 0
    assert SIM.dbscan(empty_vec, 1.0).count() == 0
    assert SV.connected_components_auto(empty_coo).count() == 0
    assert SV.pagerank_exact(empty_coo).count() == 0
    assert D.exact_dedup(
        spark.createDataFrame([], "doc_id long, text string")
    ).count() == 0
    with _pt.raises(ValueError, match="empty input"):
        SV.gram_matrix_exact(empty_vec)
    with _pt.raises(ValueError, match="empty input"):
        SV.gram_matrix(empty_vec)


def test_triangle_count_and_kcore_match_naive(spark):
    """triangle_count and k_core vs brute-force recounts on a random
    graph, across partitionings."""
    from itertools import combinations

    rs = np.random.RandomState(9)
    edges = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rs.randint(0, 60, (400, 2))
        if a != b
    }
    coo = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "row long, col long, value double"
    ).repartition(7)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want_tri = sum(
        1
        for a in adj
        for b, c in combinations(sorted(adj[a]), 2)
        if a < b and c in adj[b]
    )
    assert SV.triangle_count(coo) == want_tri
    # naive peel
    cur = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nxt = {(a, b) for a, b in cur if deg[a] >= 8 and deg[b] >= 8}
        if nxt == cur:
            break
        cur = nxt
    want_core = {u for e in cur for u in e}
    got = {r["node"] for r in SV.k_core(coo, k=8).collect()}
    assert got == want_core


def test_pagerank_exact_and_triangle_strategy_paths_agree(spark):
    """The size-probed driver variants (numpy integer recurrence /
    packed-bitset intersection) must equal the distributed paths
    bit-for-bit on the same graph — the connected_components_auto
    paths-agree pin extended to the two r13 strategy probes."""
    rs = np.random.RandomState(21)
    edges = {(int(a), int(b)) for a, b in rs.randint(0, 80, (500, 2)) if a != b}
    edges = {(a, b) for a, b in edges if a < 70}  # keep some dangling
    coo = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "row long, col long, value double"
    ).repartition(6)
    drv = {
        (r["node"], r["rank_int"])
        for r in SV.pagerank_exact(coo, iters=8).collect()
    }
    dist = {
        (r["node"], r["rank_int"])
        for r in SV.pagerank_exact(coo, iters=8, driver_threshold=0).collect()
    }
    assert drv == dist and len(drv) > 0
    assert SV.triangle_count(coo) == SV.triangle_count(
        coo, driver_threshold=0
    )


def test_sddmm_preserves_beta_term_on_empty_rows(spark):
    """beta*C must survive pattern entries whose row has no U entries
    (reference semantics C = alpha*(U V^T) o spy + beta*C) — the old
    inner joins dropped them."""
    from raft_spark.operators.sparse import sddmm

    pattern = spark.createDataFrame(
        [(0, 5, 3.0), (1, 5, 2.0)], "row long, col long, value double"
    )
    u = spark.createDataFrame([(1, 0, 2.0)], "row long, col long, value double")
    v = spark.createDataFrame([(5, 0, 4.0)], "row long, col long, value double")
    got = {
        (r["row"], r["col"]): r["value"]
        for r in sddmm(pattern, u, v, alpha=1.0, beta=1.0).collect()
    }
    assert got[(0, 5)] == 3.0      # no U row 0: pure beta*c0
    assert got[(1, 5)] == 2.0 * 4.0 + 2.0
