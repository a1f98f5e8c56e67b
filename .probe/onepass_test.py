import json, sys, time, gc
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from raft_spark.session import get_spark
from tools.datagen import events_table
from raft_spark.operators.temporal import rolling_aggregates, rolling_aggregates_prefix

spark = get_spark(app_name="onepass")
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

def onepass(df, by="user_id", ts_col="ts", value_col="value", window_us=3_600_000_000, quantize=1e6):
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    qv = F.floor(F.col(value_col) * F.lit(quantize) + F.lit(0.5)).cast("long")
    base = df.withColumn("_ts_us", ts_us).withColumn("_qv", qv)
    w_ex = Window.partitionBy(by).orderBy("_ts_us").rangeBetween(Window.unboundedPreceding, -1)
    w_bd = Window.partitionBy(by).orderBy("_ts_us").rangeBetween(Window.unboundedPreceding, -(int(window_us) + 1))
    return (base
        .withColumn("roll_n", (F.count(F.lit(1)).over(w_ex) - F.count(F.lit(1)).over(w_bd)).cast("long"))
        .withColumn("roll_sum_q", (F.coalesce(F.sum("_qv").over(w_ex), F.lit(0)) - F.coalesce(F.sum("_qv").over(w_bd), F.lit(0))).cast("long"))
        .drop("_ts_us", "_qv"))

# correctness: vs sliding-form on a tie-heavy small corpus
d = events_table(spark, 200_000, keys=50, seed=3, span_days=2, with_value=True)
a = {tuple(r) for r in onepass(d).select("event_id","roll_n","roll_sum_q").collect()}
b = {tuple(r) for r in rolling_aggregates(d).select("event_id","roll_n","roll_sum_q").collect()}
print("equal_200k:", a == b, flush=True)
del d; gc.collect()

# plan check: frame types
d = events_table(spark, 1000, keys=5, seed=3, span_days=2, with_value=True, checkpoint=False)
plan = onepass(d)._jdf.queryExecution().executedPlan().toString()
print("n_window_execs:", plan.count("Window "), flush=True)

for n, seed, days, name in [(10_000_000, 9, 1, "10m"), (100_000_000, 11, 10, "100m")]:
    d = events_table(spark, n, keys=1000, seed=seed, span_days=days, with_value=True)
    t = time.perf_counter()
    r = onepass(d).agg(F.sum("roll_n").alias("s"), F.count("*").alias("n")).first()
    print(json.dumps({"cell": f"onepass_{name}", "sec": round(time.perf_counter()-t,2), "n": r["n"]}), flush=True)
    del d; gc.collect()
