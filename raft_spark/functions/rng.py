"""Seeded deterministic random generation as Column expressions.

RAFT's RNG (reference: ``cpp/include/raft/random/rng.cuh:31-735``,
state ``random/rng_state.hpp``) is a counter-based generator: every
element's value is a pure function of (seed, index). We keep exactly
that contract — each value is a pure arithmetic function of the row's
``id`` and the seed — so results are independent of partitioning and
reproducible in ANSI SQL (the DuckDB oracle can recompute them).

Generator: two rounds of a Lehmer / Park-Miller LCG over the prime
modulus 2^31-1, seeded per (id, seed, stream). All intermediates stay
< 2^62 so bigint arithmetic never overflows even at 10^12 rows.
Distribution transforms are the same inverse-CDF formulas RAFT applies
on top of its Philox/PCG uniforms (``rng.cuh``: normal via Box-Muller,
exponential −ln(u)/λ, gumbel, laplace, logistic, rayleigh, lognormal,
bernoulli, scaled_bernoulli, discrete via CDF inversion).

Scale: pure per-row projections — zero shuffle, infinitely parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M = 2_147_483_647          # 2^31 - 1 (Mersenne prime)
_A = 48_271                 # Park–Miller multiplier


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def uniform(id_col, seed: int = 42, stream: int = 0) -> Column:
    """U(0,1), pure function of (id, seed, stream) — rng.cuh uniform.

    Multiply-mod rounds interleaved with xor-shift folds: an LCG alone
    is linear, so streams whose seeds differ by a constant stay
    linearly correlated forever (measurably biased Box–Muller); the
    xor-shift breaks the linearity (same reason PCG adds a permutation
    on top of its LCG). The `% (M-1) + 1` re-clamps keep every state
    in [1, M-1] so no stream can hit the absorbing 0 and u is never
    exactly 0 or 1 (safe for log()).

    Overflow-safety: ``id`` is reduced to its POSITIVE residue mod
    (M-1) BEFORE the 2654435761 multiply — pmod(id, M-1)·c ≡ id·c
    (mod M-1), so values are unchanged for nonnegative ids while the
    product stays < 2^62 for ANY int64 id (the unreduced form
    overflows silently in Spark / raises in DuckDB past id ≈ 3.47e9).
    NEGATIVE ids are well-defined too: Spark's `%` keeps sign, so the
    old plain-mod form produced s0 ≤ 0 → log(0)/NaN draws diverging
    from the numpy twin (numpy's `%` is already positive); pmod here
    and ((x % k) + k) % k on the SQL side keep all three renderings in
    lockstep over the full int64 domain.

    SQL-equivalent (DuckDB oracle)::

        s0  = ((((id % 2147483646) + 2147483646) % 2147483646)
               *2654435761 + seed*97531 + stream*7919) % 2147483646 + 1
        s1  = (48271*s0) % 2147483647
        s1x = xor(s1, s1 >> 17) % 2147483646 + 1
        s2  = (48271*s1x) % 2147483647
        s2x = xor(s2, s2 >> 13) % 2147483646 + 1
        s3  = (48271*s2x) % 2147483647
        u   = s3 / 2147483647.0
    """
    idc = F.pmod(_c(id_col).cast("long"), F.lit(_M - 1))
    s0 = (idc * F.lit(2_654_435_761) + F.lit(seed) * 97_531 + F.lit(stream) * 7_919) % F.lit(_M - 1) + 1
    s1 = (F.lit(_A) * s0) % F.lit(_M)
    s1x = s1.bitwiseXOR(F.shiftright(s1, 17)) % F.lit(_M - 1) + 1
    s2 = (F.lit(_A) * s1x) % F.lit(_M)
    s2x = s2.bitwiseXOR(F.shiftright(s2, 13)) % F.lit(_M - 1) + 1
    s3 = (F.lit(_A) * s2x) % F.lit(_M)
    return s3.cast("double") / F.lit(float(_M))


def uniform_range(id_col, lo: float, hi: float, seed: int = 42, stream: int = 0) -> Column:
    return F.lit(lo) + uniform(id_col, seed, stream) * F.lit(hi - lo)


def uniform_int(id_col, lo: int, hi: int, seed: int = 42, stream: int = 0) -> Column:
    """uniformInt over [lo, hi) (rng.cuh uniformInt)."""
    return (F.lit(lo) + F.floor(uniform(id_col, seed, stream) * F.lit(hi - lo))).cast("long")


def stratified_sample(
    df,
    strata_col: str,
    fracs: dict,
    id_col: str = "id",
    seed: int = 42,
    default_frac: float = 0.0,
):
    """Deterministic per-stratum Bernoulli sampling: keep a row iff
    uniform(id, seed) < frac(stratum) — the language/domain-mix
    rebalancing step of a corpus pipeline. Counter-based draw ⇒ a
    narrow filter (pushes to the scan), reproducible across retries /
    partitionings / engines, and a row's fate never changes when other
    rows appear (stable under incremental corpus growth). Returns the
    input rows + the draw as ``_draw``. Dict-spec twin of
    operators/mixing.stratified_sample (table-spec, integer-ppm exact);
    operators/mixing.token_budget_mixture covers the fixed-token-budget
    flavor of the same rebalancing step."""
    u = uniform(F.col(id_col), seed)
    frac = F.lit(float(default_frac))
    for k, v in sorted(fracs.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.withColumn("_draw", u).filter(F.col("_draw") < frac)


def normal(id_col, mu: float = 0.0, sigma: float = 1.0, seed: int = 42) -> Column:
    """N(mu, sigma) via Box–Muller on two independent streams
    (rng.cuh normal)."""
    u1 = uniform(id_col, seed, stream=1)
    u2 = uniform(id_col, seed, stream=2)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2.0 * 3.141592653589793) * u2)
    return F.lit(mu) + F.lit(sigma) * z


def normal_int(id_col, mu: float, sigma: float, seed: int = 42) -> Column:
    """Integer-rounded normal (rng.cuh:195 normalInt — normal samples
    cast to the integral output type; we round-half-up like the device
    float→int conversion of a .5-free continuous draw)."""
    return F.round(normal(id_col, mu, sigma, seed)).cast("long")


def normal_table(id_col, mus: list[float], sigmas, seed: int = 42) -> Column:
    """Per-column (mu, sigma) normal row → array<double> of
    len(mus) (rng.cuh:257 normalTable; sigma may be a scalar or a
    per-column vector). Column j's Box–Muller pair draws with seed
    offset ``seed + 7919·(j+1)`` on streams 1/2 (mirrored verbatim by
    the SQL oracle), so entries are independent across the row."""
    if not isinstance(sigmas, (list, tuple)):
        sigmas = [float(sigmas)] * len(mus)
    cols = []
    for j, (m, s) in enumerate(zip(mus, sigmas)):
        u1 = uniform(id_col, seed + 7919 * (j + 1), stream=1)
        u2 = uniform(id_col, seed + 7919 * (j + 1), stream=2)
        z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2.0 * 3.141592653589793) * u2)
        cols.append(F.lit(m) + F.lit(s) * z)
    return F.array(*cols)


def fill(value: float) -> Column:
    """Constant fill (rng.cuh:347) — lit as a Column for API parity."""
    return F.lit(value)


def lognormal(id_col, mu: float = 0.0, sigma: float = 1.0, seed: int = 42) -> Column:
    return F.exp(normal(id_col, mu, sigma, seed))


def exponential(id_col, lam: float = 1.0, seed: int = 42, stream: int = 0) -> Column:
    """Exp(λ) via inverse CDF (rng.cuh exponential)."""
    return -F.log(F.lit(1.0) - uniform(id_col, seed, stream)) / F.lit(lam)


def rayleigh(id_col, sigma: float = 1.0, seed: int = 42, stream: int = 0) -> Column:
    return F.lit(sigma) * F.sqrt(-2.0 * F.log(F.lit(1.0) - uniform(id_col, seed, stream)))


def laplace(id_col, mu: float = 0.0, scale: float = 1.0, seed: int = 42, stream: int = 0) -> Column:
    u = uniform(id_col, seed, stream) - 0.5
    return F.lit(mu) - F.lit(scale) * F.signum(u) * F.log(F.lit(1.0) - 2.0 * F.abs(u))


def logistic(id_col, mu: float = 0.0, scale: float = 1.0, seed: int = 42, stream: int = 0) -> Column:
    u = uniform(id_col, seed, stream)
    return F.lit(mu) + F.lit(scale) * F.log(u / (F.lit(1.0) - u))


def gumbel(id_col, mu: float = 0.0, beta: float = 1.0, seed: int = 42, stream: int = 0) -> Column:
    u = uniform(id_col, seed, stream)
    return F.lit(mu) - F.lit(beta) * F.log(-F.log(u))


def bernoulli(id_col, p: float = 0.5, seed: int = 42, stream: int = 0) -> Column:
    return (uniform(id_col, seed, stream) < F.lit(p)).cast("int")


def scaled_bernoulli(id_col, p: float, scale: float, seed: int = 42, stream: int = 0) -> Column:
    """±scale with prob p of negative sign (rng.cuh scaled_bernoulli)."""
    return F.when(uniform(id_col, seed, stream) < F.lit(p), F.lit(-scale)).otherwise(F.lit(scale))


def discrete(id_col, weights: list[float], seed: int = 42, stream: int = 0) -> Column:
    """Weighted integer sampling via CDF inversion (rng.cuh discrete)."""
    total = float(sum(weights))
    u = uniform(id_col, seed, stream)
    cum = 0.0
    expr = F.lit(len(weights) - 1)
    # build reversed when-chain: first bucket whose cumulative weight exceeds u
    conds = []
    for i, w in enumerate(weights):
        cum += w / total
        conds.append((i, cum))
    for i, c in reversed(conds[:-1]):
        expr = F.when(u < F.lit(c), F.lit(i)).otherwise(expr)
    return expr.cast("int")


def uniform_np(ids, seed: int = 42, stream: int = 0):
    """Numpy twin of ``uniform`` — bit-identical values for the same
    (id, seed, stream), evaluated vectorized on int64 arrays. Used by
    operators that pre-compute generated structures (LSH plane banks,
    IVF inits) driver-side or inside Arrow batches without shipping
    O(k·d) literal expressions into the plan."""
    import numpy as np

    idc = np.asarray(ids, dtype=np.int64) % (_M - 1)
    s0 = (idc * 2_654_435_761 + seed * 97_531 + stream * 7_919) % (_M - 1) + 1
    s1 = (_A * s0) % _M
    s1x = (s1 ^ (s1 >> 17)) % (_M - 1) + 1
    s2 = (_A * s1x) % _M
    s2x = (s2 ^ (s2 >> 13)) % (_M - 1) + 1
    s3 = (_A * s2x) % _M
    return s3.astype(np.float64) / float(_M)


def exp_sort_key(id_col, weight_col, seed: int = 42, stream: int = 0) -> Column:
    """Gumbel-trick key for weighted sampling WITHOUT replacement
    (rng.cuh:775 sample_without_replacement): take the k smallest
    ``-ln(u)/w`` keys. Used with grouped/global top-k."""
    return -F.log(uniform(id_col, seed, stream)) / _c(weight_col)
