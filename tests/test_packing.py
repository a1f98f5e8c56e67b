"""Sequence packing invariants: budget respected, every doc packed
exactly once, packs reasonably full (FFD bound), determinism across
partitionings, truncated docs isolated."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_spark.operators.packing import pack_sequences
from raft_spark.sources.tables import load


def test_packing_invariants(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    budget = 64
    out = pack_sequences(docs, budget=budget, n_groups=8).cache()
    rows = out.collect()
    n_docs = docs.count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs  # exactly once

    by_pack = (
        out.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max("truncated").alias("trunc"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for r in by_pack:
        if r["trunc"] == 1:
            assert r["n"] == 1  # oversized docs sit alone
        else:
            assert r["tot"] <= budget, (r["pack_id"], r["tot"])

    # FFD within groups: average non-truncated pack fill beats 50%
    fills = [r["tot"] / budget for r in by_pack if r["trunc"] == 0]
    assert sum(fills) / len(fills) > 0.5

    # slots are 0..n-1 within each pack
    slot_ok = (
        out.groupBy("pack_id")
        .agg(F.max("pack_slot").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert slot_ok == 0
    out.unpersist()


def test_packing_deterministic_across_partitioning(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    a = {(r["doc_id"], r["pack_id"], r["pack_slot"])
         for r in pack_sequences(docs, budget=64, n_groups=8).collect()}
    b = {(r["doc_id"], r["pack_id"], r["pack_slot"])
         for r in pack_sequences(docs.repartition(3), budget=64, n_groups=8).collect()}
    assert a == b
