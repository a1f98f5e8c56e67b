"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, zero shuffle) — these run as a
single narrow projection over the corpus, the shape a 100 TB
pre-filtering pass needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

FP_MOD = 1_000_000_007


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_token_count(text) -> Column:
    """Whitespace token count."""
    return F.size(F.split(_c(text), r"\s+")).cast("long")


def re_token_count(text) -> Column:
    """BPE-ish token count: alpha runs + digit runs as separate tokens."""
    return F.regexp_count(_c(text), F.lit("[a-zA-Z]+|[0-9]+")).cast("long")


def vowel_ratio(text) -> Column:
    letters = F.regexp_count(_c(text), F.lit("[a-zA-Z]"))
    vowels = F.regexp_count(_c(text), F.lit("[aeiouAEIOU]"))
    return F.when(letters == 0, F.lit(0.0)).otherwise(vowels / letters)


def lang_id(text) -> Column:
    """N-gram-free heuristic language ID over vowel density.

    A real deployment plugs a fastText-style model in as a pandas_udf;
    the thresholds here keep the operator deterministic and
    SQL-checkable end to end.
    """
    r = vowel_ratio(text)
    return (
        F.when(r >= 0.40, F.lit("en"))
        .when(r >= 0.34, F.lit("es"))
        .when(r >= 0.28, F.lit("fr"))
        .when(r >= 0.22, F.lit("de"))
        .otherwise(F.lit("zh"))
    )


def punct_ratio(text) -> Column:
    t = _c(text)
    n = F.length(t)
    p = F.regexp_count(t, F.lit("[^a-zA-Z0-9 ]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(text) -> Column:
    toks = F.split(_c(text), r"\s+")
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(stops / F.size(toks))


def quality_score(text) -> Column:
    """Composite quality heuristic in [0,1]: rewarded for stopword
    density (fluent prose) and length, penalized for punctuation noise
    — the standard cheap pre-filter shape (C4/Gopher-style rules)."""
    q = (
        F.lit(0.2)
        + 1.5 * stopword_ratio(text)
        - 2.0 * punct_ratio(text)
        + F.least(ws_token_count(text), F.lit(200)) / 500.0
    )
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), q))


def fingerprint(text, prefix_len: int = 64) -> Column:
    """Rolling polynomial hash (base 31, mod 1e9+7) of the first
    ``prefix_len`` chars — cheap near-prefix duplicate key."""
    chars = F.split(F.substring(_c(text), 1, prefix_len), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FP_MOD,
    )
