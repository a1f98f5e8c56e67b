"""SparkSession factory.

The RAFT equivalent is ``device_resources`` (reference:
``cpp/include/raft/core/handle.hpp``) — the carrier of streams, BLAS
handles and comms. In Spark all of that is the session + cluster
runtime, so this module is deliberately tiny: one tuned builder.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic broadcast-join conversion replace all of RAFT's
  hand-rolled kernel-policy heuristics (SURVEY.md §4).
- ``spark.sql.shuffle.partitions`` here is a local-mode default; on a
  real cluster AQE's coalescing makes the initial number mostly
  irrelevant as long as it is high enough.
- Arrow enabled for the few pandas_udf paths (batched, never per-row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "raft_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned local SparkSession."""
    cpus = str(cpus or DEFAULT_CPUS)
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the size-probe discipline (connected_components_auto, mst,
        # knn query collects) runs limit(T+1).collect() probes; the
        # default CollectLimit escalation (1 partition, then 4x per
        # retry) turns each probe into ~4 scheduled jobs of partial
        # re-executions. Scanning defaultParallelism partitions on the
        # first pass collapses the probe to ONE job; parameterised on
        # core count, so it scales with the session rather than pinning
        # a local constant (measured 4 -> 1 jobs per probe).
        .config("spark.sql.limit.initialNumPartitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # ANSI ON — the Spark 4 default and the conf the correctness
        # driver runs under. Pinning it OFF here (as before r8) made
        # local green a weaker predicate than driver green: expressions
        # that throw under ANSI (invalid array index, overflow, bad
        # cast) silently returned NULL locally and only surfaced as red
        # driver rows. Every operator must be ANSI-safe by construction;
        # tests/test_ansi_parity.py pins that for the whole gate.
        .config("spark.sql.ansi.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as long (ns since epoch) and convert explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # streaming queries in the gate/bench run with implicit temp
        # checkpoints; delete them on stop so repeated runs don't
        # accumulate /tmp state (also silences the per-query
        # ResolveWriteToStream warning in driver artifacts)
        .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
