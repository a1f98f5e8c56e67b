"""Shared SQL fragments for DuckDB oracles.

The seeded RNG used in oracles must be bit-identical across engines, so
both sides evaluate the same integer LCG formula (see
raft_spark.functions.rng for the Spark/Column rendering).
"""

from __future__ import annotations

M = 2_147_483_647
A = 48_271


def sql_uniform(id_expr: str, seed: int = 42, stream: int = 0) -> str:
    """DuckDB expression for rng.uniform(id, seed, stream) — U(0,1).
    Mirrors the multiply-mod + xor-shift rounds of rng.uniform exactly
    (see its docstring for why the xor-shift folds are required)."""
    # id reduced to its POSITIVE residue mod (M-1) before the multiply
    # — same value mod (M-1), no bigint overflow at any id, and defined
    # for negative ids too (DuckDB's % keeps sign, so the double-mod
    # mirrors Spark's pmod; lockstep with rng.uniform / uniform_np).
    idr = f"(((({id_expr}) % {M - 1}) + {M - 1}) % {M - 1})"
    s0 = f"({idr}*2654435761 + {seed}*97531 + {stream}*7919) % {M - 1} + 1"
    s1 = f"(({A}*({s0})) % {M})"
    s1x = f"(xor({s1}, {s1} >> 17) % {M - 1} + 1)"
    s2 = f"(({A}*{s1x}) % {M})"
    s2x = f"(xor({s2}, {s2} >> 13) % {M - 1} + 1)"
    s3 = f"({A}*{s2x}) % {M}"
    return f"(({s3}) / {M}.0)"


def sql_uniform_int(id_expr: str, lo: int, hi: int, seed: int = 42, stream: int = 0) -> str:
    return f"({lo} + floor({sql_uniform(id_expr, seed, stream)} * {hi - lo}))::BIGINT"


def sql_uniform_range(id_expr: str, lo: float, hi: float, seed: int = 42, stream: int = 0) -> str:
    return f"({lo} + {sql_uniform(id_expr, seed, stream)} * {hi - lo})"


def sql_normal(id_expr: str, mu: float = 0.0, sigma: float = 1.0, seed: int = 42) -> str:
    """Box–Muller on streams 1 and 2, mirroring rng.normal."""
    u1 = sql_uniform(id_expr, seed, stream=1)
    u2 = sql_uniform(id_expr, seed, stream=2)
    return f"({mu} + {sigma} * sqrt(-2.0 * ln({u1})) * cos(2.0 * 3.141592653589793 * {u2}))"
