"""Parameter-sweep microbench, mirroring the reference's select_k
googlebench sweep (cpp/bench/prims/matrix/select_k.cu:141-166: batch×len
grids with k ∈ {1..256}) on the two operators whose physical strategy
actually changes with the parameters:

- grouped select_k over a long-form table: groups × rows/group × k
  (partial two-phase vs window strategies)
- brute-force kNN: corpus × queries × k (numpy partial-top-k path)

Inputs are generated from the deterministic counter-based RNG (the
reference's benches generate from rng too), so the sweep is reproducible
anywhere. Prints one JSON line per cell plus a total; run:

    python tools/sweep.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from raft_spark.functions.rng import uniform  # noqa: E402
from raft_spark.operators.selectk import select_k  # noqa: E402
from raft_spark.operators.similarity import knn_brute  # noqa: E402
from raft_spark.session import get_spark  # noqa: E402
from tools.datagen import events_table  # noqa: E402


def gen_long(spark, n_rows: int, n_groups: int):
    """(group, payload, score) long-form table from the counter RNG."""
    return (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_groups).alias("g"),
            F.col("id").alias("payload"),
            uniform(F.col("id"), seed=7).alias("score"),
        )
    )


def gen_vectors(spark, n: int, d: int, tag: int):
    cols = F.array(*[uniform(F.col("id") * d + j, seed=100 + tag) for j in range(d)])
    return spark.range(n).select("id", cols.alias("features"))


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark(app_name="raft_spark_sweep")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    cells = []

    sk_grid = [
        (100_000, 100, 8),
        (100_000, 100, 64),
        (100_000, 10, 256),
        (600_000, 1000, 8),
        (600_000, 1, 64),       # one giant group — the skew case
    ]
    if quick:
        sk_grid = sk_grid[:2]
    for n_rows, n_groups, k in sk_grid:
        df = gen_long(spark, n_rows, n_groups).localCheckpoint(eager=True)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            select_k(df, ["g"], "score", k, payload_cols=["payload"]).count()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        cells.append({"op": "select_k", "rows": n_rows, "groups": n_groups,
                      "k": k, "sec": round(best, 3)})
        print(json.dumps(cells[-1]), flush=True)

    knn_grid = [(50_000, 100, 64, 10), (50_000, 500, 64, 10), (200_000, 100, 64, 10)]
    if quick:
        knn_grid = knn_grid[:1]
    for n_corpus, n_q, d, k in knn_grid:
        corpus = gen_vectors(spark, n_corpus, d, 1).localCheckpoint(eager=True)
        queries = gen_vectors(spark, n_q, d, 2).localCheckpoint(eager=True)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            knn_brute(corpus, queries, k=k).count()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        cells.append({"op": "knn_brute", "corpus": n_corpus, "queries": n_q,
                      "d": d, "k": k, "sec": round(best, 3)})
        print(json.dumps(cells[-1]), flush=True)

    # temporal grids (r6 verdict task 4, the select_k grid discipline
    # applied to the r6 operators): as-of across key cardinality — the
    # parameter that sets window parallelism — and the banded range
    # join across band width — the replication-vs-output tradeoff.
    # Frames are released per cell: accumulated checkpoint blocks
    # inflate later cells ~7x (BASELINE.md v6 note).
    import gc

    from raft_spark.operators.temporal import asof_join, range_join

    def gen_events(n, keys, seed):
        return events_table(spark, n, keys=keys, seed=seed)

    asof_grid = [(r, k) for r in (1_000_000, 10_000_000)
                 for k in (10, 1_000, 100_000)]
    if quick:
        asof_grid = asof_grid[:2]
    for n_rows, keys in asof_grid:
        evl = gen_events(n_rows, keys, 1)
        evr = gen_events(n_rows, keys, 2)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            asof_join(evl, evr, right_cols=("event_id",),
                      tiebreak_col="event_id") \
                .agg(F.count("event_id_r")).collect()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        cells.append({"op": "asof_join", "rows": n_rows, "keys": keys,
                      "sec": round(best, 3)})
        print(json.dumps(cells[-1]), flush=True)
        del evl, evr
        gc.collect()

    range_grid = [100_000, 1_000_000, 10_000_000]  # 0.1s / 1s / 10s in µs
    if quick:
        range_grid = range_grid[:1]
    for width_us in range_grid:
        evl = gen_events(10_000_000, 1_000, 3)
        evr = gen_events(10_000_000, 1_000, 4)
        best, pairs = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = range_join(evl, evr, width_us=width_us).count()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        cells.append({"op": "range_join", "rows": 10_000_000,
                      "width_us": width_us, "pairs": pairs,
                      "sec": round(best, 3)})
        print(json.dumps(cells[-1]), flush=True)
        del evl, evr
        gc.collect()

    # token-budget mixing across stratum skew (two-phase path): hot=0.5
    # routes half the corpus into ONE stratum — the case the two-phase
    # prefix sum exists for
    from raft_spark.operators.mixing import token_budget_mixture

    mix_grid = [(1_000_000, 0.0), (10_000_000, 0.0), (10_000_000, 0.5)]
    if quick:
        mix_grid = mix_grid[:1]
    for n_rows, hot in mix_grid:
        n_strata = 20
        hot_sel = F.rand(5) < hot if hot else F.lit(False)
        d = spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            F.when(hot_sel, F.lit("s0")).otherwise(
                F.concat(F.lit("s"), (F.col("id") % n_strata).cast("string"))
            ).alias("source"),
            (F.col("id") % 37 + 3).alias("ntok"),
        ).localCheckpoint(eager=True)
        budgets = spark.createDataFrame(
            [(f"s{i}", 1_000_000) for i in range(n_strata)],
            "source string, token_budget long",
        )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            token_budget_mixture(d, budgets).agg(F.sum("keep_budget")).collect()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        cells.append({"op": "token_budget_mixture", "rows": n_rows,
                      "hot_frac": hot, "sec": round(best, 3)})
        print(json.dumps(cells[-1]), flush=True)
        del d
        gc.collect()

    # rolling-window strategy crossover (r8): frame population is the
    # axis — Spark's sliding RANGE frame costs O(rows · frame) (it
    # re-aggregates the whole frame whenever the lower bound moves),
    # the prefix form O(rows) with one extra shuffle. The grid fixes
    # 1M rows / 1000 keys / 1-hour window and varies the time span so
    # the mean frame hits ~{4, 64, 1024} rows — bracketing the former
    # router density threshold (64 rows; knob removed in r10 after the
    # r9 grid showed prefix at-or-below sliding in every cell).
    from raft_spark.operators.temporal import (
        rolling_aggregates,
        rolling_aggregates_prefix,
    )

    # r9 adds a WIDE-row leg (256-byte payload column carried through
    # both strategies): the prefix form's second shuffle re-ships every
    # source column inside its _o struct, so payload width moves its
    # cost while the sliding window's single shuffle pays it once — the
    # axis that could silently shift the crossover the v8 narrow-row
    # grid measured. Retiring the sliding route (and its density knob)
    # required the crossover to stay away on wide rows too — this grid
    # is the evidence.
    roll_grid = [(4, 0), (64, 0), (1024, 0), (4, 256), (64, 256), (1024, 256)]
    if quick:
        roll_grid = roll_grid[:1]
    for frame, payload in roll_grid:
        n_rows, keys, w_us = 1_000_000, 1_000, 3_600_000_000
        span_us = max((n_rows // keys) * w_us // frame, w_us)
        d = events_table(spark, n_rows, keys=keys, seed=0,
                         span_us=span_us, with_value=True,
                         payload_bytes=payload)
        for name, fn in (("rolling_window", rolling_aggregates),
                         ("rolling_prefix", rolling_aggregates_prefix)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(d, window_us=w_us).agg(F.sum("roll_n")).collect()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            cells.append({"op": name, "rows": n_rows, "keys": keys,
                          "mean_frame": frame, "payload_b": payload,
                          "sec": round(best, 3)})
            print(json.dumps(cells[-1]), flush=True)
        del d
        gc.collect()

    print(json.dumps({"metric": "sweep_cells", "value": len(cells),
                      "total_sec": round(sum(c["sec"] for c in cells), 3)}))


if __name__ == "__main__":
    main()
