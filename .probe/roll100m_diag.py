import json, sys, time, gc
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from raft_spark.session import get_spark
from tools.datagen import events_table

spark = get_spark(app_name="roll100m_diag")
spark.sparkContext.setLogLevel("ERROR")
spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

def bench(n, seed, days):
    d = events_table(spark, n, keys=1000, seed=seed, span_days=days, with_value=True)
    lcols = d.columns
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    qv = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    base = d.select(F.col("user_id").alias("_by"), ts_us.alias("_ts_us"), qv.alias("_qv"),
                    F.struct(*lcols).alias("_o"), F.lit(1).alias("_tgt"))
    w_in = Window.partitionBy("_by").orderBy("_ts_us").rangeBetween(Window.unboundedPreceding, 0)
    w_ex = Window.partitionBy("_by").orderBy("_ts_us").rangeBetween(Window.unboundedPreceding, -1)
    cums = base.select("*",
        F.count(F.lit(1)).over(w_in).cast("long").alias("_cin_n"),
        F.coalesce(F.sum("_qv").over(w_in), F.lit(0)).cast("long").alias("_cin_s"),
        F.count(F.lit(1)).over(w_ex).cast("long").alias("_cn_ex"),
        F.coalesce(F.sum("_qv").over(w_ex), F.lit(0)).cast("long").alias("_cs_ex"))
    t = time.perf_counter()
    cums.agg(F.sum("_cn_ex")).collect()
    t1 = time.perf_counter() - t
    # pass 2 shape: explode to 2 rows, window carry
    w_us = 3_600_000_000
    both = cums.select("_by", F.explode(F.array(
        F.struct(F.col("_ts_us").alias("_t"), F.lit(0).alias("_tag"), F.col("_cin_n").alias("_n"), F.lit(None).cast(base.schema["_o"].dataType).alias("_o")),
        F.struct((F.col("_ts_us") - w_us - 1).alias("_t"), F.lit(1).alias("_tag"), F.col("_cn_ex").alias("_n"), F.col("_o").alias("_o")),
    )).alias("_e")).select("_by", "_e.*")
    wc = Window.partitionBy("_by").orderBy("_t", "_tag").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    res = both.withColumn("_cc", F.last("_n", ignorenulls=True).over(wc)).filter(F.col("_tag") == 1)
    t = time.perf_counter()
    res.agg(F.sum("_cc")).collect()
    t2 = time.perf_counter() - t
    print(json.dumps({"n": n, "pass1_s": round(t1,2), "pass1plus2_s": round(t2,2)}), flush=True)
    del d; gc.collect()

bench(10_000_000, 9, 1)
bench(100_000_000, 11, 10)
