import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from raft_spark.session import get_spark
from tools.datagen import events_table
from raft_spark.operators.temporal import rolling_aggregates_prefix, rolling_route

spark = get_spark(app_name="roll100m_r9b", shuffle_partitions=256)
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

for n, seed, days, name in [
    (10_000_000, 9, 1, "rolling_prefix_10m_dense_s"),
    (100_000_000, 11, 10, "rolling_prefix_100m_dense_s"),
]:
    d = events_table(spark, n, keys=1000, seed=seed, span_days=days, with_value=True)
    assert rolling_route(d) == "prefix"
    t = time.perf_counter()
    r = rolling_aggregates_prefix(d).agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
    print(json.dumps({"cell": name, "shuffle_partitions": 256, "sec": round(time.perf_counter()-t,2), "n": r["n"]}), flush=True)
    del d
    import gc; gc.collect()
