"""Crash-injection pins for the manifest-commit delivery protocol
(raft_spark.operators.statestore): a delivery killed between two store
appends must leave the state readable AND unchanged, and redelivering
the same batch must converge to the from-scratch answer — the
at-least-once replay contract the foreachBatch twins advertise, now
held under mid-delivery crashes instead of assumed away (the r11
"honest contract" docstrings).

Mechanism: every state append goes through statestore.append_store —
monkeypatching it with a wrapper that raises after N calls simulates a
driver loss between any two specific store appends. Because the
delivery id is only PUBLISHED after the last append, the orphaned rows
are invisible to every reader and the retry re-ingests in full."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from raft_spark.operators import dedup as D
from raft_spark.operators import sparse as SP
from raft_spark.operators import statestore as SS
from raft_spark.sources.tables import load


def _crash_after(monkeypatch, n_appends: int):
    """Make the (n_appends+1)-th statestore.append_store call raise —
    the delivery dies between its n-th and (n+1)-th store append."""
    real = SS.append_store
    calls = {"n": 0}

    def bomb(df, path, partition_cols=(), **kw):
        if calls["n"] >= n_appends:
            raise RuntimeError("injected crash between store appends")
        calls["n"] += 1
        real(df, path, partition_cols, **kw)

    monkeypatch.setattr(SS, "append_store", bomb)
    return calls


def _cluster_map(df):
    return {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in df.collect()
    }


def _span_map(df):
    return {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac_ppm"])
        for r in df.collect()
    }


def _group_map(df):
    return {
        r["id"]: (r["cluster"], r["group"], r["keep"]) for r in df.collect()
    }


def _axis_bucket(df):
    b = None
    for j in range(8):
        bit = (F.col("features")[j] > 0).cast("long") * (2 ** j)
        b = bit if b is None else b + bit
    return df.select("id", b.alias("cluster"))


@pytest.mark.parametrize("crash_at", [1, 3])
def test_dedup_ingest_crash_then_redeliver(spark, sf_dir, tmp_path,
                                           monkeypatch, crash_at):
    """Kill delivery 2 after its sigs append (crash_at=1 — the exact
    window the r11 docstring called permanently lossy: the replay
    registry landed but bands/occ/clusters did not) and after the occ
    append (crash_at=3); the state must still resolve to delivery 1's
    answer, and redelivery must equal from-scratch dedup of b1 ∪ b2."""
    docs = load(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    p = str(tmp_path / "state")
    r1 = _cluster_map(D.dedup_state_ingest(b1, p))

    calls = _crash_after(monkeypatch, crash_at)
    with pytest.raises(RuntimeError, match="injected crash"):
        D.dedup_state_ingest(b2, p)
    assert calls["n"] == crash_at  # it really died mid-delivery
    monkeypatch.undo()

    # the half-written delivery is INVISIBLE: resolve == delivery 1
    assert _cluster_map(D.read_dedup_state(spark, p)[1]) == r1
    # redelivery converges to from-scratch over the union
    got = _cluster_map(D.dedup_state_ingest(b2, p))
    want = _cluster_map(
        D.dedup_state_ingest(docs, str(tmp_path / "scratch"))
    )
    assert got == want
    # and compaction garbage-collects the orphaned delivery directories
    import glob

    assert glob.glob(p + "/sigs/_dv=*") and True
    D.compact_dedup_state(spark, p)
    orphans = [d for d in glob.glob(p + "/*/_dv=*")
               if not d.endswith("_dv=0")]
    assert orphans == []
    assert _cluster_map(D.read_dedup_state(spark, p)[1]) == want


def test_span_ingest_crash_then_redeliver(spark, sf_dir, tmp_path,
                                          monkeypatch):
    """Kill span delivery 2 after the tokens (replay registry) append —
    the r11-lossy window — then redeliver: equality with from-scratch
    duplicated_spans must hold."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "text") \
        .localCheckpoint(eager=True)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    p = str(tmp_path / "span")
    r1 = _span_map(D.span_state_ingest(b1, p))

    _crash_after(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="injected crash"):
        D.span_state_ingest(b2, p)
    monkeypatch.undo()

    assert _span_map(D.read_span_state(spark, p)) == r1
    got = _span_map(D.span_state_ingest(b2, p))
    want = _span_map(D.duplicated_spans(docs))
    assert got == want


def test_semantic_ingest_crash_then_redeliver(spark, sf_dir, tmp_path,
                                              monkeypatch):
    """Kill semantic delivery 2 after the index append but before the
    ids-registry and groups appends; redelivery must re-ingest the
    batch in full (the registry never saw it) and equal from-scratch
    semantic_dedup."""
    from raft_spark.sources.tables import embeddings_matrix

    m = embeddings_matrix(spark, sf_dir).select("id", "features") \
        .localCheckpoint(eager=True)
    b1 = m.filter(F.col("id") % 2 == 0)
    b2 = m.filter(F.col("id") % 2 == 1)
    p = str(tmp_path / "sem")
    r1 = _group_map(D.semantic_state_ingest(b1, _axis_bucket(b1), p))

    _crash_after(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="injected crash"):
        D.semantic_state_ingest(b2, _axis_bucket(b2), p)
    monkeypatch.undo()

    assert _group_map(D.read_semantic_state(spark, p)[1]) == r1
    got = _group_map(D.semantic_state_ingest(b2, _axis_bucket(b2), p))
    want = _group_map(D.semantic_dedup(m, assignments=_axis_bucket(m)))
    assert got == want


def test_postings_add_crash_then_redeliver(spark, sf_dir, tmp_path,
                                           monkeypatch):
    """Kill a postings delivery after the postings append but before
    the norms (replay registry) append — the r11 double-count window:
    the retry used to re-append the postings rows because the registry
    never saw them. Under the manifest the orphaned rows are invisible,
    so the retry yields exactly one committed copy (lookup equality
    with a from-scratch index)."""
    from raft_spark.sources.tables import doc_terms

    coo = doc_terms(spark, sf_dir).select(
        F.col("doc_id").alias("row"),
        F.xxhash64("term").alias("col"),
        F.col("tf").cast("double").alias("value"),
    ).filter(F.col("row") <= 200).localCheckpoint(eager=True)
    base = coo.filter(F.col("row") <= 100)
    delta = coo.filter((F.col("row") > 100) & (F.col("row") <= 150))
    probe = coo.filter(F.col("row") > 150).localCheckpoint(eager=True)

    p = str(tmp_path / "idx")
    SP.write_postings(base, p, n_shards=16)

    _crash_after(monkeypatch, 1)  # postings landed, norms did not
    with pytest.raises(RuntimeError, match="injected crash"):
        SP.postings_add(delta, p)
    monkeypatch.undo()

    SP.postings_add(delta, p)  # the retry
    got = SP.sparse_lookup(probe, spark, p, metric="cosine") \
        .localCheckpoint(eager=True)

    p2 = str(tmp_path / "scratch")
    SP.write_postings(coo.filter(F.col("row") <= 150), p2, n_shards=16)
    want = SP.sparse_lookup(probe, spark, p2, metric="cosine") \
        .localCheckpoint(eager=True)
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0
    assert got.count() > 0
    # compaction drops the orphaned delivery and preserves the lookup
    SP.compact_postings(spark, p)
    got2 = SP.sparse_lookup(probe, spark, p, metric="cosine")
    assert got.exceptAll(got2).count() + got2.exceptAll(got).count() == 0


def test_crash_on_bootstrap_delivery(spark, sf_dir, tmp_path, monkeypatch):
    """A FIRST delivery that dies mid-append leaves a meta-only /
    unpublished state; the retry must bootstrap cleanly (the
    meta-written-first design: meta-only ≡ empty state with the format
    pinned)."""
    docs = load(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    p = str(tmp_path / "state")

    _crash_after(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="injected crash"):
        D.dedup_state_ingest(b1, p)
    monkeypatch.undo()

    # unpublished bootstrap rows are invisible
    assert D.read_dedup_state(spark, p) is None
    got = _cluster_map(D.dedup_state_ingest(b1, p))
    want = _cluster_map(
        D.dedup_state_ingest(b1, str(tmp_path / "scratch"))
    )
    assert got == want
    # and the format guard still bites after the crash-bootstrap
    with pytest.raises(ValueError, match="was built with"):
        D.dedup_state_ingest(b1, p, num_perms=8)
