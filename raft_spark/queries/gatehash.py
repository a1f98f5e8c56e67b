"""Canonical value hashing for the correctness gate.

Mirrors the driver's comparison: columns sorted by name, every cell
normalized (floats rounded to 6 decimals, integral floats printed as
ints, lists element-normalized), rows sorted lexicographically. Used
by tools/check_oracle.py (the local gate replica) and by
tests/test_gate_immunity.py (the partition-perturbation property test
that proves the hash is an order-independent function of the data).
"""

from __future__ import annotations

import math


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return repr(r)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("|".join(norm_cell(row[i]) for i in order))
    out.sort()
    return out


def canon_spark(df) -> list[str]:
    cols = df.columns
    return canon([[r[c] for c in cols] for r in df.collect()], cols)


def canon_duckdb(con, sql: str) -> list[str]:
    res = con.execute(sql)
    return canon(res.fetchall(), [d[0] for d in res.description])
