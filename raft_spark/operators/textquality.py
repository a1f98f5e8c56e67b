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

    The thresholds keep the operator deterministic and SQL-checkable
    end to end; ``lang_id_model`` below is the model-backed seam.
    """
    r = vowel_ratio(text)
    return (
        F.when(r >= 0.40, F.lit("en"))
        .when(r >= 0.34, F.lit("es"))
        .when(r >= 0.28, F.lit("fr"))
        .when(r >= 0.22, F.lit("de"))
        .otherwise(F.lit("zh"))
    )


def lang_id_model(df, text_col: str = "text", id_col: str = "doc_id",
                  model_path: str | None = None):
    """Model-backed language ID (import-try seam, mirrors the
    multimodal decode): with fasttext installed and a model path, runs
    an Arrow-batched mapInPandas predict; otherwise falls back to the
    expression heuristic so pipelines keep working in model-less
    environments → (id, pred_lang, confidence)."""
    try:  # pragma: no cover - fasttext absent in this container
        import fasttext  # type: ignore

        if model_path is None:
            raise ImportError("no model path")
        model = fasttext.load_model(model_path)

        def op(batches):
            import pandas as pd

            for pdf in batches:
                labels, probs = model.predict(
                    [t.replace("\n", " ") for t in pdf[text_col]]
                )
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "pred_lang": [l[0].replace("__label__", "") for l in labels],
                        "confidence": [float(p[0]) for p in probs],
                    }
                )

        return df.select(id_col, text_col).mapInPandas(
            op, schema=f"{id_col} long, pred_lang string, confidence double"
        )
    except ImportError:
        return df.select(
            F.col(id_col),
            lang_id(text_col).alias("pred_lang"),
            F.lit(1.0).alias("confidence"),
        )


def token_count_model(df, text_col: str = "text", id_col: str = "doc_id",
                      tokenizer_path: str | None = None):
    """Model-backed token counting (import-try seam, mirrors
    lang_id_model / the multimodal decode): with HuggingFace
    ``tokenizers`` installed and a tokenizer.json path, runs an
    Arrow-batched mapInPandas encode (batch tokenization on the
    executors — the real cost model of a 100 TB token-count pass);
    otherwise falls back to the BPE-ish regex expression so pipelines
    keep working in model-less environments → (id, n_tokens, method).
    """
    try:  # pragma: no cover - tokenizers absent in this container
        import tokenizers  # type: ignore

        if tokenizer_path is None:
            raise ImportError("no tokenizer path")
        tok = tokenizers.Tokenizer.from_file(tokenizer_path)

        def op(batches):
            import pandas as pd

            for pdf in batches:
                encs = tok.encode_batch(list(pdf[text_col]))
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_tokens": [len(e.ids) for e in encs],
                        "method": "bpe_model",
                    }
                )

        return df.select(id_col, text_col).mapInPandas(
            op, schema=f"{id_col} long, n_tokens long, method string"
        )
    except ImportError:
        return df.select(
            F.col(id_col),
            re_token_count(text_col).alias("n_tokens"),
            F.lit("regex_fallback").alias("method"),
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


def _toks(text) -> Column:
    return F.split(_c(text), r"\s+")


def dup_word_frac(text) -> Column:
    """Fraction of words that are repeats of an earlier word
    (Gopher/MassiveText-style repetition rule). Pure expression —
    zero shuffle, runs inside the same narrow pre-filter projection.
    The token array is let-bound so the split runs once per row."""
    from raft_spark.functions.arrays import let_bind

    return let_bind(
        _toks(text),
        lambda toks: F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
            (F.size(toks) - F.size(F.array_distinct(toks))) / F.size(toks)
        ),
    )


def top_word_frac(text) -> Column:
    """Fraction of the document taken by its single most frequent word.
    O(distinct·n) comparisons per row as a pure expression — documents
    are short by pre-filter contract (longer docs should pass through
    the exploded groupBy form instead). The token array is let-bound:
    without it Catalyst re-evaluates the SPLIT inside every filter
    lambda element — O(distinct·n) splits, not comparisons."""
    from raft_spark.functions.arrays import let_bind

    return let_bind(
        _toks(text),
        lambda toks: F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
            F.array_max(
                F.transform(
                    F.array_distinct(toks),
                    lambda w: F.size(F.filter(toks, lambda t: t == w)),
                )
            )
            / F.size(toks)
        ),
    )


def top_bigram_frac(text) -> Column:
    """Fraction of word-bigram slots taken by the most frequent bigram
    (the Gopher duplicated-2-gram rule), as a pure expression. Both
    the token array and the bigram array are let-bound (the bigram
    construction itself re-splits per element otherwise)."""
    from raft_spark.functions.arrays import let_bind

    def _grams(toks):
        n = F.size(toks)
        return F.when(n < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        )

    return let_bind(
        _toks(text),
        lambda toks: let_bind(
            _grams(toks),
            lambda grams: F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
                F.array_max(
                    F.transform(
                        F.array_distinct(grams),
                        lambda g: F.size(F.filter(grams, lambda x: x == g)),
                    )
                )
                / F.size(grams)
            ),
        ),
    )


def contamination(docs, bench, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Benchmark decontamination: per-doc count of word n-gram shingles
    shared with a benchmark set → (doc_id, bench_hits, contaminated).

    The standard eval-leakage check an LLM training pipeline runs
    before training: any document sharing ≥1 long n-gram with an eval
    benchmark is flagged. Shape: distinct benchmark shingles (small —
    broadcast side) inner-joined against corpus shingles, one groupBy,
    left-joined back so clean docs report 0. At 100 TB the benchmark
    side stays KBs–MBs, so the join is a broadcast hash join with no
    corpus shuffle beyond the per-doc count aggregation.
    """
    from raft_spark.operators.dedup import shingles

    corpus_sh = shingles(docs, text_col=text_col, id_col=id_col, n=n)
    bench_sh = (
        shingles(bench, text_col=text_col, id_col=id_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("bench_hits"))
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("bench_hits", F.lit(0)).cast("long").alias("bench_hits"),
            (F.coalesce("bench_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def fingerprint(text, prefix_len: int = 64) -> Column:
    """Rolling polynomial hash (base 31, mod 1e9+7) of the first
    ``prefix_len`` chars — cheap near-prefix duplicate key."""
    chars = F.split(F.substring(_c(text), 1, prefix_len), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FP_MOD,
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (standard curation step — ROOTS/BigScience-style
# regex pass; public method). Pure JVM expressions, zero shuffle.
# ---------------------------------------------------------------------------

# Patterns restricted to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB/Go tooling): no lookaround, no backrefs — so the same pattern
# set runs anywhere in the pipeline.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{1,3}[ -]?\d{2,4}[ -]?\d{3,4}[ -]?\d{3,4}\b",
}


def pii_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII match counts → (doc_id, n_email, n_ipv4, n_phone,
    has_pii). One narrow projection (regexp_extract_all per pattern) —
    zero shuffle, scales as a pure map."""
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(0)))
        .cast("long").alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    out = docs.select(F.col(id_col).cast("long").alias("doc_id"), *cols)
    total = sum(F.col(f"n_{n}") for n in PII_PATTERNS)
    return out.withColumn("has_pii", (total > 0).cast("int"))


def redact_pii(
    docs: DataFrame,
    replacement: str = "[PII]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Replace every PII match with ``replacement`` → original columns
    with ``text_col`` rewritten. Email first (its local part may
    contain digit runs a later pattern would split), then phone, then
    ipv4 — a chained regexp_replace, still one narrow projection."""
    txt = F.col(text_col)
    for name in ("email", "phone", "ipv4"):
        txt = F.regexp_replace(txt, PII_PATTERNS[name], replacement)
    return docs.withColumn(text_col, txt)
