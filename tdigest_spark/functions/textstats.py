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
    "repetition_stats",
    "pattern_counts",
    "with_curation_signals",
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


def repetition_stats(text: Column) -> Column:
    """Gopher/C4-style repetition signals as ONE struct (codegen):

    - ``dup_token_frac`` — fraction of tokens that are repeats of an
      earlier token (1 - distinct/total); boilerplate and keyword-stuffed
      pages score high,
    - ``top_token_frac`` — the most frequent token's share of all
      tokens; a single token dominating is the classic
      degenerate-generation / template signature.

    Both are pure higher-order array expressions over the whitespace
    tokens, reproducible in SQL for the oracle. Empty texts score 0.
    """
    toks = F.filter(_tokens(text), lambda t: t != "")
    n = F.size(toks)
    distinct_n = F.size(F.array_distinct(toks))
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda t: t == u)),
        )
    )
    zero = n <= 0
    return F.struct(
        F.when(zero, F.lit(0.0))
        .otherwise(1.0 - distinct_n.cast("double") / n)
        .alias("dup_token_frac"),
        F.when(zero, F.lit(0.0))
        .otherwise(top.cast("double") / n)
        .alias("top_token_frac"),
    )


def pattern_counts(text: Column) -> Column:
    """Counts of curation-relevant surface patterns as ONE struct —
    dialect-portable regexes (no lookarounds / shorthand classes that
    differ between Java regex and RE2, so the DuckDB oracle matches):

    - ``n_emails``  — ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+``
    - ``n_urls``    — ``https?://[^ ]+``
    - ``n_numbers`` — standalone digit runs ``[0-9]+``

    High email/url density marks link farms and scraped directories;
    the counts feed the same quantile-trim machinery as every other
    per-doc feature."""
    return F.struct(
        F.size(
            F.regexp_extract_all(
                text, F.lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+"), 0
            )
        ).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit("https?://[^ ]+"), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(text, F.lit("[0-9]+"), 0)).alias("n_numbers"),
    )


def with_curation_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition + pattern signals appended as flat columns — one
    scan, all codegen."""
    t = F.col(text_col)
    return (
        df.withColumn("__rep", repetition_stats(t))
        .withColumn("__pat", pattern_counts(t))
        .select("*", "__rep.*", "__pat.*")
        .drop("__rep", "__pat")
    )
