"""Sketch accuracy pins against the exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_spark.operators import sketches as SK
from raft_spark.operators.reductions import quantiles
from raft_spark.sources.tables import load


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load(spark, "events", sf_dir)
    got = {r["col"]: r["approx_distinct"]
           for r in SK.approx_distinct(ev, ["user_id", "event_type"], rsd=0.02).collect()}
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_type").alias("t"),
    ).collect()[0]
    assert abs(got["user_id"] - exact["u"]) <= max(3, 0.1 * exact["u"])
    assert got["event_type"] == exact["t"]  # tiny cardinality: exact


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    ev = load(spark, "events", sf_dir).select("value", "event_id")
    ps = [0.5, 0.9, 0.99]
    approx = {r["p"]: r["value"]
              for r in SK.approx_quantiles(ev, "value", ps).collect()}
    exact = {r["p"]: r["value"]
             for r in quantiles(ev, "value", ps, tie_cols=["event_id"]).collect()}
    lo = ev.agg(F.min("value")).collect()[0][0]
    hi = ev.agg(F.max("value")).collect()[0][0]
    span = hi - lo
    for p in ps:
        assert abs(approx[p] - exact[p]) <= 0.05 * span, (p, approx[p], exact[p])
