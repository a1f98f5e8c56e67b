"""RNG lockstep property tests: the three renderings of the seeded
counter RNG (Spark Column expr, DuckDB SQL, numpy) must agree
bit-for-bit for ANY int64 id — including ids past 3.47e9 where the
round-1 formula silently overflowed in Spark and raised in DuckDB,
and NEGATIVE ids where sign-keeping `%` (Spark/DuckDB) diverged from
numpy's positive residue until the pmod/double-mod fix."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from raft_spark.functions.rng import uniform_np
from raft_spark.queries._sqlutil import sql_uniform


@settings(max_examples=200, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=20
    ),
    seed=st.integers(min_value=0, max_value=10_000),
    stream=st.integers(min_value=0, max_value=64),
)
def test_duckdb_matches_numpy_for_any_id(ids, seed, stream):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    sql = f"SELECT {sql_uniform('i', seed, stream)} AS u FROM t ORDER BY rowid"
    got = np.array([r[0] for r in con.execute(sql).fetchall()])
    expect = uniform_np(np.array(ids, dtype=np.int64), seed, stream)
    assert np.array_equal(got, expect)
    assert (got > 0).all() and (got < 1).all()  # never exactly 0/1 (log-safe)


def test_spark_matches_numpy_for_negative_ids(spark):
    from pyspark.sql import functions as F

    from raft_spark.functions import rng

    ids = [-1, -(2**40), -3_470_000_001, -2, 0, 5, 2**45]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rows = df.select("id", rng.uniform("id", 7, 3).alias("u")).orderBy("id").collect()
    got = np.array([r["u"] for r in rows])
    expect = uniform_np(np.array(sorted(ids), dtype=np.int64), 7, 3)
    assert np.array_equal(got, expect)
    assert np.isfinite(got).all() and (got > 0).all() and (got < 1).all()
