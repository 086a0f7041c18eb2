"""Document chunking: split long texts into fixed-size overlapping
windows — the preprocessing step between raw documents and
:func:`~tdigest_spark.operators.packing.pack_sequences` in an LLM
training pipeline (chunk to a context-friendly size, then pack chunks
to the token budget).

Pure whole-stage-codegen: chunk count and offsets are arithmetic on
``length(text)``, the fan-out is one ``explode(sequence(...))``, and
each chunk is a ``substr`` — no Python stage, no shuffle (a narrow
1->n_chunks map), and deterministic at any parallelism. Character
windows, not token windows, by design: byte/char offsets are exact and
engine-reproducible, while token-aligned splitting needs the
downstream tokenizer (run it over these chunks' overlap margins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents", "chunk_documents_tokens"]


def chunk_documents(
    df: DataFrame,
    text_col: str,
    chunk_chars: int,
    overlap_chars: int = 0,
    chunk_col: str = "chunk",
    idx_col: str = "chunk_idx",
) -> DataFrame:
    """One row per (document, chunk): all input columns plus the
    0-based ``chunk_idx``, ``n_chunks``, the chunk's 1-based
    ``chunk_start`` offset, and the ``chunk`` text itself.

    Windows start every ``chunk_chars - overlap_chars`` characters;
    the final window is whatever remains (>= 1 char, <= chunk_chars).
    A document of length L yields ``1 + ceil(max(0, L - chunk) /
    stride)`` chunks — every character belongs to at least one chunk
    and consecutive chunks share exactly ``overlap_chars`` characters
    (except a possibly-shorter tail). NULL or empty texts yield one
    row with a NULL/empty chunk (nothing is silently dropped)."""
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be > 0, got {chunk_chars}")
    if not (0 <= overlap_chars < chunk_chars):
        raise ValueError(
            f"need 0 <= overlap_chars < chunk_chars, got {overlap_chars}"
        )
    stride = chunk_chars - overlap_chars
    t = F.col(text_col)
    n = F.greatest(
        F.lit(1),
        (
            F.lit(1)
            + F.ceil(
                F.greatest(F.lit(0), F.length(t) - F.lit(chunk_chars))
                / F.lit(stride)
            )
        ).cast("int"),
    )
    out = df.withColumn("n_chunks", F.coalesce(n, F.lit(1)))
    out = out.withColumn(
        idx_col, F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
    )
    start = (F.col(idx_col) * stride + 1).cast("int")
    return out.withColumn("chunk_start", start).withColumn(
        chunk_col, t.substr(start, F.lit(int(chunk_chars)))
    )


def chunk_documents_tokens(
    df: DataFrame,
    text_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    chunk_col: str = "chunk",
    idx_col: str = "chunk_idx",
) -> DataFrame:
    """Token-window chunking: windows of ``chunk_tokens`` WHITESPACE
    tokens starting every ``chunk_tokens - overlap_tokens`` tokens — so
    every chunk's ``token_count(mode="whitespace")`` is <= the budget
    by construction (the budget wiring for
    :func:`~tdigest_spark.operators.packing.pack_sequences`; for
    subword/BPE budgets, count the emitted chunks with the matching
    ``token_count`` mode — a whitespace window is the splittable unit
    either way, since subword tokenizers never merge across
    whitespace).

    Still pure codegen and shuffle-free: ``split`` -> ``explode`` of
    window indices -> ``slice`` + ``array_join``. Consecutive-space
    runs round-trip exactly (split/join of the empty tokens restores
    them), so concatenating chunks at stride offsets reproduces the
    document. NULL texts yield one row with a NULL chunk."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be > 0, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            f"need 0 <= overlap_tokens < chunk_tokens, got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    n = F.greatest(
        F.lit(1),
        (
            F.lit(1)
            + F.ceil(
                F.greatest(F.lit(0), n_tok - F.lit(chunk_tokens)) / F.lit(stride)
            )
        ).cast("int"),
    )
    out = df.withColumn("n_tokens_doc", F.greatest(n_tok, F.lit(0))).withColumn(
        "n_chunks", F.coalesce(n, F.lit(1))
    )
    out = out.withColumn(
        idx_col, F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
    )
    start = (F.col(idx_col) * stride + 1).cast("int")
    sliced = F.slice(toks, start, F.lit(int(chunk_tokens)))
    return out.withColumn("chunk_token_start", start).withColumn(
        chunk_col,
        F.when(F.col(text_col).isNotNull(), F.array_join(sliced, " ")),
    ).withColumn("chunk_n_tokens", F.when(F.col(text_col).isNotNull(), F.size(sliced)))
