import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from raft_spark.session import get_spark
from tools.datagen import events_table
from raft_spark.operators.temporal import rolling_aggregates_prefix, rolling_route

spark = get_spark(app_name="roll100m_r9")
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

# 10M reference cell first (same session, comparable host conditions)
d10 = events_table(spark, 10_000_000, keys=1000, seed=9, span_days=1, with_value=True)
assert rolling_route(d10) == "prefix"
t = time.perf_counter()
r = rolling_aggregates_prefix(d10).agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
print(json.dumps({"cell": "rolling_prefix_10m_dense_s", "sec": round(time.perf_counter()-t,2), "n": r["n"]}), flush=True)
del d10
import gc; gc.collect()

big = events_table(spark, 100_000_000, keys=1000, seed=11, span_days=10, with_value=True)
assert rolling_route(big) == "prefix"
t = time.perf_counter()
r = rolling_aggregates_prefix(big).agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
print(json.dumps({"cell": "rolling_prefix_100m_dense_s", "sec": round(time.perf_counter()-t,2), "n": r["n"], "s_pos": r["s"] > 0}), flush=True)
