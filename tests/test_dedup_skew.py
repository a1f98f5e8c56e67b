"""Skew caps as OPERATOR CONTRACT (VERDICT r2 #7): degenerate inputs —
one boilerplate shingle in every doc, one degenerate LSH band — must
keep candidate volumes sub-quadratic. Assertions are on candidate ROW
COUNTS, not timing, so a silently removed cap fails loudly."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_spark.operators import dedup as D


def _identical_sigs(spark, n_docs: int, num_perms: int = 16):
    sig = [float(i) for i in range(num_perms)]
    return spark.createDataFrame(
        [(d, sig) for d in range(n_docs)], "doc_id long, sig array<double>"
    )


def test_minhash_degenerate_band_is_capped(spark):
    # every doc has the SAME signature → every band bucket holds all
    # docs; the hot-bucket cap must drop them instead of emitting the
    # quadratic n(n-1)/2 pair set
    n = 300
    sigs = _identical_sigs(spark, n)
    capped = D.minhash_lsh_candidates(
        sigs, band_rows=4, num_perms=16, max_bucket_docs=50
    )
    assert capped.count() == 0
    # control: with the cap above the bucket size the join IS quadratic
    # (this is what the cap is protecting against)
    uncapped = D.minhash_lsh_candidates(
        sigs, band_rows=4, num_perms=16, max_bucket_docs=None
    )
    assert uncapped.count() == n * (n - 1) // 2


def test_ngram_boilerplate_shingle_is_capped(spark):
    # one shingle shared by ALL docs (license header / boilerplate);
    # every other shingle is unique per doc
    n = 300
    rows = []
    for d in range(n):
        rows.append((d, "__boilerplate__"))
        rows.append((d, f"unique_{d}"))
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    capped = D.ngram_jaccard_pairs(sh, max_shingle_df=10)
    assert capped.count() == 0  # no pair shares a non-stop shingle
    uncapped = D.ngram_jaccard_pairs(sh, max_shingle_df=None)
    assert uncapped.count() == n * (n - 1) // 2


def test_ngram_cap_keeps_jaccard_consistent(spark):
    # sizes must be computed over the FILTERED sets: docs {a,b} share
    # shingle s1; boilerplate s0 in all three docs is dropped, so
    # J(a,b) = 1/1, not 2/3
    sh = spark.createDataFrame(
        [(0, "s0"), (1, "s0"), (2, "s0"), (0, "s1"), (1, "s1"), (2, "s2")],
        "doc_id long, shingle string",
    )
    out = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(sh, max_shingle_df=2).collect()
    }
    assert out == {(0, 1): 1.0}


def test_knn_auto_probe_degrades_to_expr(spark):
    from raft_spark.operators.similarity import knn_brute

    import numpy as np

    rng = np.random.default_rng(3)
    a = rng.standard_normal((40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in a[i]]) for i in range(len(a))],
        "id long, features array<double>",
    )
    big_q = knn_brute(df, df, k=3, max_collect_queries=10)
    assert big_q._knn_strategy == "expr"  # probe refused the collect
    small_q = knn_brute(df, df.filter(F.col("id") < 5), k=3, max_collect_queries=10)
    assert small_q._knn_strategy == "numpy"
    # both paths agree exactly (same rounding, same total order)
    e = sorted(map(tuple, big_q.collect()))
    m = sorted(map(tuple, knn_brute(df, df, k=3, strategy="numpy").collect()))
    assert e == m
