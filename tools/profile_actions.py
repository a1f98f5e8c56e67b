"""Per-callsite action profiler: wraps every eager DataFrame action
(collect/count/first/localCheckpoint/toPandas) with a timer that
records wall time + the repo-side callsite, runs one headline query,
and prints a sorted per-callsite cost table plus total job count.

Usage:  python tools/profile_actions.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

import raft_spark.queries  # noqa: E402, F401
from raft_spark.queries.registry import QUERIES  # noqa: E402
from raft_spark.session import get_spark  # noqa: E402

RECORDS: list[tuple[str, str, float]] = []


def _callsite() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/raft_spark/" in fn or fn.endswith("pipeline_queries.py"):
            return f"{fn.rsplit('/raft_spark/', 1)[-1].rsplit('/', 1)[-1]}:{fr.lineno}"
    return "?"


def _wrap(name: str):
    orig = getattr(DataFrame, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        RECORDS.append((name, _callsite(), time.perf_counter() - t0))
        return out

    setattr(DataFrame, name, timed)


def main() -> None:
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="raft_spark_profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for n in ("collect", "count", "first", "localCheckpoint", "toPandas",
              "head", "toArrow"):
        _wrap(n)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for run in range(2):
        RECORDS.clear()
        before_jobs = len(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(f"profile{run}", qname)
        t0 = time.perf_counter()
        df = QUERIES[qname](spark, sf_dir)
        n = df.count()
        total = time.perf_counter() - t0
        jobs = len(tracker.getJobIdsForGroup(f"profile{run}") or [])
        print(f"\n=== run {run}: {qname} rows={n} wall={total:.2f}s jobs={jobs} ===")
        agg: dict[tuple[str, str], list[float]] = {}
        for op, site, t in RECORDS:
            agg.setdefault((op, site), []).append(t)
        rows = sorted(agg.items(), key=lambda kv: -sum(kv[1]))
        acct = 0.0
        for (op, site), ts in rows:
            acct += sum(ts)
            print(f"{sum(ts):7.3f}s  n={len(ts):<3d} {op:<16s} {site}")
        print(f"accounted {acct:.2f}s of {total:.2f}s")


if __name__ == "__main__":
    main()
