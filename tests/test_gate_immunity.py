"""Cross-engine / cross-partitioning immunity of the correctness gate.

The round-3 verdict's residual failure mode was a gate row whose value
hash depended on partial-aggregate merge order (float sums) or on the
engine's round(double, n) implementation — green under one session,
red under the driver's. This property test attacks both axes at
sf0.001 for EVERY registered query that has a DuckDB oracle:

  1. run the Spark query under the normal test session (8 shuffle
     partitions), canonical-hash the result;
  2. re-run under a perturbed session config (7 shuffle partitions +
     64 KiB scan splits → different scan partitioning and different
     partial-merge orders), hash again;
  3. run the DuckDB oracle, hash it;

and asserts all three hashes are identical. Any member whose output is
not an order-independent function of the data fails HERE before the
driver sees it (SURVEY §5.5 determinism contract, applied to the gate
itself).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from raft_spark.queries.gatehash import canon_duckdb, canon_spark
from raft_spark.sources.tables import TABLES

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()
ORACLED = sorted(n for n in QUERIES if n in ORACLES)

_PERTURB = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# the big suite rows re-execute the whole suite THREE times (base +
# perturbed + oracle) and together cost ~8 min — slow-marked so the
# default (driver-window) selection keeps the property coverage on
# every other oracled query; the full suite still runs these
_SLOW_MEMBERS = {
    "solver_spectra", "curation_suite", "ann_recall_suite",
    "stream_lookup_suite", "graph_solver_suite", "dedup_clusters",
}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_MEMBERS else n
    for n in ORACLED
])
def test_gate_hash_partition_and_engine_invariant(spark, sf_dir, duck, name):
    base = canon_spark(QUERIES[name](spark, sf_dir))

    saved = {k: spark.conf.get(k, None) for k in _PERTURB}
    try:
        for k, v in _PERTURB.items():
            spark.conf.set(k, v)
        perturbed = canon_spark(QUERIES[name](spark, sf_dir))
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)

    assert perturbed == base, (
        f"{name}: Spark hash changed under partition perturbation — "
        "an output member is order-sensitive"
    )

    oracle = canon_duckdb(duck, ORACLES[name])
    if len(base) == len(oracle):
        diffs = [(a, b) for a, b in zip(base, oracle) if a != b]
        assert not diffs, f"{name}: first cell diff spark={diffs[0][0]!r} oracle={diffs[0][1]!r}"
    assert base == oracle, f"{name}: row count {len(base)} vs oracle {len(oracle)}"
