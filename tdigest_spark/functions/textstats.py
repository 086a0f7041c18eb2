"""Text-analysis expressions for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Everything here is a JVM-side built-in expression (codegen; no Python
in the hot path) so a 100 TB corpus pass costs one scan, and every
output is reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "token_count",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
    "with_text_stats",
]

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("a", "the", "and", "of", "to", "in", "is"),
    "fr": ("le", "la", "et", "de", "un", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "y", "de", "un", "es"),
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish subword proxy = vowel groups is
    in ``with_text_stats``)."""
    return F.size(_tokens(text))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    toks = _tokens(text)
    arr = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return hits / F.size(toks)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length band + stopword
    presence + mean-token-length band (the C4/Gopher-style rule shape,
    simplified to stay SQL-expressible)."""
    n_tok = token_count(text)
    mean_len = (F.length(F.regexp_replace(text, " ", "")) / n_tok).cast("double")
    sw = stopword_ratio(text, "en")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 0.4).otherwise(0.0)
    tok_ok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 0.3).otherwise(0.0)
    sw_ok = F.when(sw > 0.0, 0.3).otherwise(0.0)
    return (len_ok + tok_ok + sw_ok).cast("double")


def lang_id(text: Column) -> Column:
    """Stopword-profile language guess (argmax of per-lang hit counts;
    deterministic tie-break by profile order, 'en' first)."""
    toks = _tokens(text)
    scores = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    # fold left keeping strictly-greater -> earlier profile wins ties
    best = scores[0]
    for s in scores[1:]:
        best = F.when(s["n"] > best["n"], s).otherwise(best)
    return best["lang"]


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash of the text (mod 2^31) — the
    cross-engine-reproducible document fingerprint. (At production
    scale you would use ``xxhash64(text)``; this arithmetic variant
    exists so the oracle can recompute it.)"""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(text)),
            lambda i: F.ascii(F.substring(text, i, 1)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % 2147483648,
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_chars", F.length(t))
        .withColumn(
            "n_subwords",
            F.size(F.split(t, "[aeiou]+")) - 1,  # vowel-group BPE-ish proxy
        )
        .withColumn("stopword_ratio_en", stopword_ratio(t, "en"))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )
