import json, sys, time, gc
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from raft_spark.session import get_spark
from tools.datagen import events_table

spark = get_spark(app_name="roll100m_diag2")
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

def pass1(n, keys, seed, days, narrow=False):
    d = events_table(spark, n, keys=keys, seed=seed, span_days=days, with_value=True)
    lcols = d.columns
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    qv = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    cols = [F.col("user_id").alias("_by"), ts_us.alias("_ts_us"), qv.alias("_qv")]
    if not narrow:
        cols.append(F.struct(*lcols).alias("_o"))
    base = d.select(*cols)
    w_ex = Window.partitionBy("_by").orderBy("_ts_us").rangeBetween(Window.unboundedPreceding, -1)
    t = time.perf_counter()
    base.select(F.count(F.lit(1)).over(w_ex).alias("_cn")).agg(F.sum("_cn")).collect()
    dt = time.perf_counter() - t
    print(json.dumps({"n": n, "keys": keys, "narrow": narrow, "pass1_s": round(dt,2)}), flush=True)
    del d; gc.collect()

pass1(100_000_000, 10_000, 11, 10)   # 10k rows/key, same group size as 10M cell
pass1(100_000_000, 1_000, 11, 10, narrow=True)  # 100k rows/key but no _o struct
