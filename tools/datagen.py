"""Shared synthetic event-table builder for the probe/sweep tools.

One parameterized generator replaces the five near-identical copies
that had accumulated across scale_probe.py and sweep.py (_ev, _hot,
_keyed, _vev, gen_events) — a corpus tweak (epoch base, hash salt)
now lands in exactly one place, so probe cells can never silently
diverge from one another. The formula is bit-identical to the
originals: event_id = id + seed·1e8, user_id = pmod(xxhash64(id +
seed), keys) (keys=1 ⇒ the single hot key 0), ts uniform over
``span_days`` from the fixed epoch base, optional value = id % 97.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_BASE_US = 1_700_000_000_000_000


def events_table(
    spark: SparkSession,
    n: int,
    keys: int,
    seed: int,
    span_days: int = 30,
    span_us: int | None = None,
    with_value: bool = False,
    payload_bytes: int = 0,
    checkpoint: bool = True,
) -> DataFrame:
    span = int(span_us) if span_us is not None else span_days * 86400 * 1_000_000
    cols = [
        (F.col("id") + seed * 100_000_000).alias("event_id"),
        F.pmod(F.xxhash64(F.col("id") + seed), F.lit(keys)).alias("user_id"),
        F.timestamp_micros(
            F.lit(EPOCH_BASE_US)
            + F.pmod(F.xxhash64(F.col("id") + seed + 7), F.lit(span))
        ).cast("timestamp_ntz").alias("ts"),
    ]
    if with_value:
        cols.append((F.col("id") % 97).cast("double").alias("value"))
    if payload_bytes:
        # deterministic per-row fixed-width string — the wide-row shape
        # for sweeps where shuffle payload width is the moving axis
        cols.append(
            F.rpad(F.md5((F.col("id") + seed + 11).cast("string")),
                   int(payload_bytes), "x").alias("payload")
        )
    df = spark.range(n).select(*cols)
    return df.localCheckpoint(eager=True) if checkpoint else df
