"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries()[name] at the given sf_dir, runs the
matching oracle_sql()[name] in DuckDB over the same parquet files, and
compares row count, column names, and an order-insensitive value hash
(values rounded to 6 decimals first, like we emit them).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from raft_spark.queries.gatehash import canon  # noqa: E402
from raft_spark.session import get_spark  # noqa: E402
from raft_spark.sources.tables import TABLES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:35s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} ORACLE ERROR: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        s_can = canon([r.asDict() and [r[c] for c in scols] for r in srows], scols)
        o_can = canon(orows, ocols)
        ok_hash = s_can == o_can
        status = "OK" if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:35s} {status}  rows {len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" hash={'ok' if ok_hash else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_cols:
                for a, b in zip(s_can, o_can):
                    if a != b:
                        print(f"   spark : {a}\n   oracle: {b}")
                        break
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checked queries OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
