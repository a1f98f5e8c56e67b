import json, sys, time, gc
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from raft_spark.session import get_spark
from tools.datagen import events_table
from raft_spark.operators.temporal import rolling_aggregates, rolling_aggregates_prefix

spark = get_spark(app_name="roll_sweep_r9")
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
cells = []
for frame, payload in [(4,0),(64,0),(1024,0),(4,256),(64,256),(1024,256)]:
    n_rows, keys, w_us = 1_000_000, 1_000, 3_600_000_000
    span_us = max((n_rows // keys) * w_us // frame, w_us)
    d = events_table(spark, n_rows, keys=keys, seed=0, span_us=span_us,
                     with_value=True, payload_bytes=payload)
    for name, fn in (("rolling_window", rolling_aggregates),
                     ("rolling_prefix", rolling_aggregates_prefix)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(d, window_us=w_us).agg(F.sum("roll_n")).collect()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        cells.append({"op": name, "mean_frame": frame, "payload_b": payload, "sec": round(best,3)})
        print(json.dumps(cells[-1]), flush=True)
    del d; gc.collect()
print(json.dumps({"done": len(cells)}))
