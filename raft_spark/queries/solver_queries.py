"""Solver / decomposition queries (SURVEY.md §2.8).

SQL-expressible ones carry DuckDB oracles (1-feature OLS via regr_*,
spectral partition metrics); the iterative/eigen solvers are genuinely
non-SQL-expressible → no oracle entry (driver records rows-only), with
numpy-oracle unit tests in tests/test_solvers.py standing in (the
reference's own test pattern: compare against a naive implementation,
SURVEY.md §5.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_spark.functions import rng
from raft_spark.operators import solvers as SV
from raft_spark.queries.registry import query
from raft_spark.queries.rng_queries import q_make_regression
from raft_spark.queries.sparse_queries import _graph
from raft_spark.sources.tables import embeddings_matrix


@query(
    "lstsq_simple",
    oracle="""
WITH d AS (SELECT o_totalprice AS y, o_custkey::DOUBLE AS x FROM orders)
SELECT round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM d
""",
)
def q_lstsq_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/lstsq.cuh single-feature closed form — slope/intercept/R²
    as one aggregate pass (the SQL-checkable corner of lstsq)."""
    from raft_spark.sources.tables import load

    d = load(spark, "orders", sf_dir).select(
        F.col("o_totalprice").alias("y"), F.col("o_custkey").cast("double").alias("x")
    )
    sxy = F.covar_pop("x", "y")
    sxx = F.var_pop("x")
    slope = sxy / sxx
    out = d.agg(
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(F.pow(F.corr("x", "y"), 2), 6).alias("r2"),
    )
    return out


@query("lstsq_normal")  # no SQL oracle: driver-side solve (rows-only + pytest)
def q_lstsq_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/lstsq.cuh:72 lstsqEig — normal equations over the
    make_regression problem; recovers (bias≈1, w≈[3,−2,0.5])."""
    reg = q_make_regression(spark, sf_dir)
    w = SV.lstsq_normal(reg, ["x1", "x2", "x3"], "y")
    names = ["intercept", "w_x1", "w_x2", "w_x3"]
    return spark.createDataFrame(
        [(n, round(float(c), 6)) for n, c in zip(names, w)], "coef string, value double"
    )


@query("pca_explained_variance")  # rows-only + pytest vs numpy
def q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/pca.cuh:41 fit — top-5 explained variance (ratio) from the
    distributed covariance pass + driver eigh + sign_flip."""
    m = embeddings_matrix(spark, sf_dir)
    _, ev, ratio, _ = SV.pca_fit(m, n_components=5)
    return spark.createDataFrame(
        [(i, round(float(ev[i]), 6), round(float(ratio[i]), 6)) for i in range(len(ev))],
        "component int, explained_variance double, explained_variance_ratio double",
    )


@query("tsvd_singular_values")  # rows-only + pytest vs numpy
def q_tsvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/tsvd.cuh:34 — top-5 singular values via the XᵀX
    eigenvalue path (exact), distributed Gram pass."""
    m = embeddings_matrix(spark, sf_dir)
    sv = SV.tsvd_singular_values(m, k=5)
    return spark.createDataFrame(
        [(i, round(float(s), 6)) for i, s in enumerate(sv)],
        "component int, sigma double",
    )


@query(
    "cholesky_qr_r",
    # R of a positive-diagonal Cholesky is the UNIQUE factor with
    # RᵀR = XᵀX, so checking RᵀR against the SQL-computable Gram is a
    # full-strength oracle for the Gram pass + factorization; the rank-1
    # update appends the column-mean row x, so Rᵤᵀ Rᵤ = XᵀX + x·xᵀ.
    # Rounded to 3 decimals: the factor-and-multiply roundtrip carries
    # ~1e-9 absolute error over thousands of entries, which at 6
    # decimals has even odds of straddling a rounding boundary.
    oracle="""
WITH long AS (
    SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
           generate_subscripts(embedding, 1) - 1 AS pos
    FROM embeddings
),
g AS (
    SELECT a.pos AS i, b.pos AS j, sum(a.x * b.x) AS v
    FROM long a JOIN long b USING (vec_id)
    WHERE b.pos >= a.pos GROUP BY 1, 2
),
mu AS (SELECT pos, avg(x) AS m FROM long GROUP BY 1)
SELECT 'rtr' AS which, i::BIGINT AS i, j::BIGINT AS j, round(v, 3) AS val FROM g
UNION ALL
SELECT 'rtr_updated', i::BIGINT, j::BIGINT, round(v + ma.m * mb.m, 3)
FROM g JOIN mu ma ON ma.pos = g.i JOIN mu mb ON mb.pos = g.j
""",
)
def q_cholesky_qr_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/qr.cuh:29 tall-skinny Cholesky-QR (one distributed Gram
    pass, driver chol) + linalg/cholesky_r1_update.cuh:19 rank-1 update
    (append the column-mean row). Emits the upper triangles of RᵀR and
    RᵤᵀRᵤ — which DuckDB can recompute as XᵀX and XᵀX + x·xᵀ, making
    the whole factor path oracle-checkable (R is unique given RᵀR)."""
    import numpy as np

    m = embeddings_matrix(spark, sf_dir)
    r = SV.cholesky_qr_r(m)
    d = r.shape[0]
    mean_row = m.select(
        *[F.avg(F.col("features")[i]).alias(f"m{i}") for i in range(d)]
    ).first()
    x = np.array([float(v) for v in mean_row])
    r_up = SV.cholesky_r1_update(r.T.copy(), x).T
    rows = [
        (which, i, j, round(float((mat.T @ mat)[i, j]), 3))
        for which, mat in (("rtr", r), ("rtr_updated", r_up))
        for i in range(d)
        for j in range(i, d)
    ]
    return spark.createDataFrame(rows, "which string, i bigint, j bigint, val double")


@query("rsvd_singular_values")  # rows-only + pytest vs numpy/tsvd
def q_rsvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linalg/rsvd.cuh:41 randomized SVD (oversampling 10, 2 power
    iterations, distributed passes + Cholesky-QR); approximates the
    exact tsvd singular values."""
    m = embeddings_matrix(spark, sf_dir)
    sv = SV.rsvd_singular_values(m, k=5)
    return spark.createDataFrame(
        [(i, round(float(s), 6)) for i, s in enumerate(sv)],
        "component int, sigma double",
    )


@query("eigsh_power")  # rows-only + pytest vs numpy
def q_eigsh_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/solver/lanczos.cuh:35 entry (LM mode) via power iteration:
    largest eigenvalue of the 50-node graph's normalized Laplacian.
    Each iteration = one distributed SpMV (join+agg)."""
    from raft_spark.operators.sparse import laplacian

    lap = laplacian(_graph(spark, sf_dir), normalized=True).cache()
    lam, _ = SV.power_iteration(spark, lap, n=50, iters=30)
    return spark.createDataFrame([(round(lam, 4),)], "eigenvalue double")


@query("mst_weight")  # rows-only + pytest vs python Kruskal
def q_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/solver/mst.cuh — fully distributed Borůvka MST of the
    50-node graph; returns edge count + total weight (the MST weight is
    unique even under ties, so this matches any correct MST)."""
    tree = SV.mst_edges(_graph(spark, sf_dir))
    return tree.agg(
        F.count("*").alias("n_edges"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias("total_weight"),
    )


@query("connected_components")  # rows-only + pytest vs union-find
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label/merge_labels.cuh:18 — smallest-label propagation over the
    graph restricted to heavy edges (weight ≥ 4 disconnects it)."""
    g = _graph(spark, sf_dir).filter(F.col("value") >= 4.0)
    labels = SV.connected_components(g)
    return labels.groupBy("label").agg(F.count("*").alias("size")).orderBy("label")


@query("lap_assignment")  # assignment rows: pytest vs brute force; the
# objective is ★-checked in graph_solver_suite against a DuckDB
# brute-force-over-all-permutations oracle.
def q_lap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """solver/linear_assignment.cuh:50 — 20 batched 8×8 LAPs with
    LCG-generated costs, solved exactly per batch via applyInPandas.

    Costs are INTEGER-quantized (floor(u·10⁶), exact in every engine)
    so the optimal objective is an exact integer — cross-engine
    comparable with no float-summation-order noise (the covariance
    lesson applied to LAP)."""
    n, batches = 8, 20
    probs = spark.range(batches * n * n).select(
        (F.col("id") / (n * n)).cast("long").alias("batch"),
        ((F.col("id") % (n * n)) / n).cast("long").alias("i"),
        (F.col("id") % n).alias("j"),
        F.floor(rng.uniform("id", seed=515) * 1_000_000).cast("double").alias("cost"),
    )
    out = SV.lap_batched(probs)
    return out.select(
        "batch", "i", "assigned_j", F.round("objective", 6).alias("objective")
    )


@query(
    "spectral_partition",
    oracle="""
WITH edges AS (
    SELECT (l_partkey % 50) AS row, (l_suppkey % 50) AS col,
           count(*)::DOUBLE AS value
    FROM lineitem
    WHERE (l_partkey % 50) <> (l_suppkey % 50)
    GROUP BY 1, 2
),
adj AS (
    SELECT row, col, sum(value) AS value FROM (
        SELECT row, col, value FROM edges
        UNION ALL
        SELECT col AS row, row AS col, value FROM edges
    ) GROUP BY 1, 2
),
lbl AS (SELECT row, col, value, row % 4 AS la, col % 4 AS lb FROM adj),
m AS (SELECT sum(value) / 2.0 AS m2 FROM adj),
deg AS (SELECT row, sum(value) AS d FROM adj GROUP BY 1),
cut AS (SELECT sum(CASE WHEN la <> lb THEN value ELSE 0 END) / 2.0 AS edge_cut FROM lbl),
intra AS (
    SELECT la AS c, sum(CASE WHEN la = lb THEN value ELSE 0 END) AS w_in
    FROM lbl GROUP BY 1
),
dsum AS (SELECT row % 4 AS c, sum(d) AS dtot FROM deg GROUP BY 1)
SELECT round(edge_cut, 6) AS edge_cut,
       round(sum(w_in / (2 * m2) - (dtot / (2 * m2)) * (dtot / (2 * m2))), 6) AS modularity
FROM intra JOIN dsum USING (c) CROSS JOIN cut CROSS JOIN m
GROUP BY edge_cut
""",
)
def q_spectral_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spectral/partition.cuh:38 analyzePartition (edge cut) +
    modularity_maximization.hpp:47 analyzeModularity for the
    partition label = node mod 4 — contingency-style aggregates."""
    adj = _graph(spark, sf_dir)
    lbl = adj.select(
        "row", "col", "value",
        (F.col("row") % 4).alias("la"), (F.col("col") % 4).alias("lb"),
    ).cache()
    m2 = lbl.agg((F.sum("value") / 2.0).alias("m2")).collect()[0]["m2"]
    edge_cut = lbl.agg(
        (F.sum(F.when(F.col("la") != F.col("lb"), F.col("value")).otherwise(0.0)) / 2.0).alias("c")
    ).collect()[0]["c"]
    deg = adj.groupBy("row").agg(F.sum("value").alias("d"))
    dsum = deg.groupBy((F.col("row") % 4).alias("c")).agg(F.sum("d").alias("dtot"))
    intra = (
        lbl.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("c"))
        .agg(F.sum("value").alias("w_in"))
    )
    mod = (
        intra.join(dsum, "c")
        .agg(
            F.sum(
                F.col("w_in") / (2 * m2) - F.pow(F.col("dtot") / (2 * m2), 2)
            ).alias("modularity")
        )
        .collect()[0]["modularity"]
    )
    return spark.createDataFrame(
        [(round(edge_cut, 6), round(mod, 6))], "edge_cut double, modularity double"
    )


@query("eigsh_lanczos")  # rows-only + pytest vs numpy
def q_eigsh_lanczos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparse/solver/lanczos.cuh:35 eigsh (which=LM): top-3 eigenvalues
    of the 50-node graph's normalized Laplacian via distributed-SpMV
    Lanczos with full reorthogonalization (driver holds only the
    tridiagonal T)."""
    from raft_spark.operators.sparse import laplacian

    lap = laplacian(_graph(spark, sf_dir), normalized=True).localCheckpoint(eager=True)
    evals, _ = SV.lanczos_eigsh(spark, lap, n=50, k=3, which="LM")
    return spark.createDataFrame(
        [(i, round(float(v), 4)) for i, v in enumerate(evals)],
        "rank int, eigenvalue double",
    )


@query("pagerank")  # gate coverage rides on graph_solver_suite
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (solvers.pagerank_exact) over a directed
    graph derived from orders: edges (o_custkey % 211) → (o_orderkey %
    211), sources restricted to < 180 so ~30 nodes are genuinely
    dangling and the dangling-mass path is exercised. 12 fixed
    iterations at scale 1e12 — bit-identical to any engine mirroring
    the integer recurrence (suite oracle: recursive CTE)."""
    from raft_spark.sources.tables import load

    o = load(spark, "orders", sf_dir)
    coo = o.select(
        (F.col("o_custkey") % 211).cast("long").alias("row"),
        (F.col("o_orderkey") % 211).cast("long").alias("col"),
    ).filter((F.col("row") != F.col("col")) & (F.col("row") < 180))
    return SV.pagerank_exact(coo, iters=12)


@query("dbscan")  # gate coverage rides on graph_solver_suite
def q_dbscan(spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None) -> DataFrame:
    """DBSCAN over the embeddings table with EXACT int64-quantized
    ε-pairing (similarity.eps_pairs_exact: Σ(qa−qb)² ≤ round(ε·1e6)²,
    no float boundary pairs), eps=1.2, min_pts=4 → (id, cluster,
    kind_code) with core=2 / border=1 / noise=0. The quantized pair
    predicate is what makes the full clustering adjudicable by a SQL
    twin — cluster ids are component minima, border attachment is the
    smallest adjacent core cluster, all deterministic."""
    from raft_spark.operators import similarity as SIM

    m = embeddings_matrix(spark, sf_dir).select("id", "features")
    if pairs is None:
        pairs = SIM.eps_pairs_exact(m, eps=1.2)
    out = SIM.dbscan(m, eps=1.2, min_pts=4, pairs=pairs)
    return out.select(
        "id", "cluster",
        F.when(F.col("kind") == "core", 2)
        .when(F.col("kind") == "border", 1)
        .otherwise(0).cast("long").alias("kind_code"),
    )


def _orders_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse 997-node undirected graph from orders (degrees ~16-48 at
    sf0.01) — sparse enough that k-core peeling cascades for several
    rounds and triangles are nontrivial (the mod-50 lineitem graph is
    complete, which trivializes both)."""
    from raft_spark.sources.tables import load

    o = load(spark, "orders", sf_dir)
    return o.select(
        (F.col("o_custkey") % 997).cast("long").alias("row"),
        (F.col("o_orderkey") % 997).cast("long").alias("col"),
    ).filter(F.col("row") != F.col("col"))


@query("triangles")  # gate coverage rides on graph_solver_suite
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the sparse orders graph (solvers.
    triangle_count wedge join) — one row (n_triangles)."""
    t = SV.triangle_count(_orders_graph(spark, sf_dir))
    return spark.createDataFrame([(int(t),)], "n_triangles long")


@query("kcore")  # gate coverage rides on graph_solver_suite
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """21-core of the sparse orders graph (solvers.k_core iterative
    peel, fixpoint-verified) → (node,) survivors."""
    return SV.k_core(_orders_graph(spark, sf_dir), k=21)


@query("single_linkage")  # gate coverage rides on graph_solver_suite
def q_single_linkage(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Single-linkage flat clusters at distance_threshold=1.2 over the
    embeddings table (similarity.single_linkage, threshold mode):
    clusters = connected components of the SAME int64-quantized ε≤1.2
    pair set the dbscan member uses (the suite computes that pair
    table ONCE and feeds both members), so the SQL twin reuses the
    pair CTE and only adds a reachability closure → (id, cluster)."""
    from raft_spark.operators import similarity as SIM

    m = embeddings_matrix(spark, sf_dir).select("id", "features")
    if pairs is None:
        pairs = SIM.eps_pairs_exact(m, eps=1.2)
    return SIM.single_linkage(m, distance_threshold=1.2, pairs=pairs)


@query("single_linkage_k")  # gate coverage rides on graph_solver_suite
def q_single_linkage_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k single-linkage (the MST-cut path: Borůvka tree,
    global_rank cut of the k−1 largest tree edges under the total
    order, components of the rest) over the 50-node lineitem graph via
    the precomputed-``pairs`` seam → one row (n_clusters_realized,
    n_points). The exact flat labeling is pytest-adjudicated against a
    naive O(n³) agglomerative loop (tests/test_single_linkage.py); the
    gate pins that the cut realizes EXACTLY k components in the driver
    env — the invariant a SQL twin can state without recomputing an
    MST (boundary-value ties make a threshold-CC rederivation of the
    labels unsound, so the count is the honest oracle here)."""
    from raft_spark.operators import similarity as SIM

    g = _graph(spark, sf_dir)
    nodes = g.select(F.col("row").alias("id")).distinct()
    pairs = g.select(
        F.col("row").alias("a"), F.col("col").alias("b"),
        F.col("value").alias("dist"),
    )
    out = SIM.single_linkage(nodes, n_clusters=6, pairs=pairs)
    return out.agg(
        F.countDistinct("cluster").cast("long").alias("n_clusters_realized"),
        F.count("*").cast("long").alias("n_points"),
    )
