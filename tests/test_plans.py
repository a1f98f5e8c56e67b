"""Physical-plan property pins (README "Design for 100 TB"): the plan
shapes the scale story depends on must not regress."""

from __future__ import annotations

import pyspark.sql.functions as F

from raft_spark.plans import audit_plan
from raft_spark.queries.registry import QUERIES


def test_row_norms_scan_prunes_columns(spark, sf_dir):
    rep = audit_plan(QUERIES["row_norms"](spark, sf_dir))
    # only vec_id + embedding should be read, never label/the rest
    schemas = " ".join(rep.read_schemas())
    assert "embedding" in schemas and "label" not in schemas
    # per-row reduction: no shuffle at all beyond the source repartition
    assert rep.n_sortmerge_joins == 0


def test_matrix_slice_pushes_row_filter(spark, sf_dir):
    rep = audit_plan(QUERIES["matrix_slice"](spark, sf_dir))
    pushed = " ".join(rep.pushed_filters())
    assert "vec_id" in pushed  # row-range reached the parquet scan


def test_matrix_gather_broadcasts_map(spark, sf_dir):
    rep = audit_plan(QUERIES["matrix_gather"](spark, sf_dir))
    assert rep.n_broadcast_joins >= 1
    assert rep.n_sortmerge_joins == 0


def test_histogram_partial_aggregates(spark, sf_dir):
    rep = audit_plan(QUERIES["histogram_events"](spark, sf_dir))
    # partial_count BEFORE the exchange → map-side combine: the shuffle
    # carries O(bins), not O(events). (AQE's formatted plan hides
    # WholeStageCodegen spans pre-execution, so codegen isn't pinned.)
    assert "partial_count" in rep.text


def test_bm25_no_cartesian(spark, sf_dir):
    rep = audit_plan(QUERIES["bm25_topk"](spark, sf_dir))
    # the only nested-loop join allowed is the 1-row avgdl scalar
    # broadcast; a CartesianProduct would mean a real pair blowup
    assert "CartesianProduct" not in rep.text
