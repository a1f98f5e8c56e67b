"""Sink round-trips + the bucketed co-located join plan pin."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from raft_spark.plans import audit_plan
from raft_spark.sources import sinks


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="raft_spark_sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_parquet_prunes_directories(spark, tmpdir_path):
    df = spark.range(1000).select(
        "id", (F.col("id") % 4).alias("part"), (F.col("id") * 2.0).alias("v")
    )
    sinks.write_parquet(df, f"{tmpdir_path}/t", partition_by=["part"])
    back = spark.read.parquet(f"{tmpdir_path}/t").filter(F.col("part") == 2)
    assert back.count() == 250
    # partition pruning: the scan must list one directory, not four
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "part=2" in plan or "PartitionFilters" in audit_plan(back).text


def test_csv_roundtrip(spark, tmpdir_path):
    df = spark.range(50).select("id", (F.col("id") * 1.5).alias("v"))
    sinks.write_csv(df, f"{tmpdir_path}/c")
    back = sinks.read_csv(spark, f"{tmpdir_path}/c", schema="id long, v double")
    assert sorted((r.id, r.v) for r in back.collect()) == sorted(
        (r.id, r.v) for r in df.collect()
    )


def test_bucketed_join_skips_shuffle(spark, tmpdir_path):
    # tables land in the session's default warehouse dir (static conf);
    # dropped in the finally below
    a = spark.range(2000).select("id", (F.col("id") * 3.0).alias("a_v"))
    b = spark.range(2000).select("id", (F.col("id") * 7.0).alias("b_v"))
    sinks.write_bucketed(a, "bk_a", ["id"], n_buckets=8, sort_cols=["id"])
    sinks.write_bucketed(b, "bk_b", ["id"], n_buckets=8, sort_cols=["id"])
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_a").join(spark.table("bk_b"), "id")
        rep = audit_plan(joined)
        # co-located bucketed join: NO exchange on either side
        assert rep.n_exchanges == 0, rep.text
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
