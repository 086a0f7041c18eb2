"""Text extraction + feature expressions — JVM-side built-ins only
(whole-stage codegen; no Python in the hot path).

``extract_text`` enforces the per-row invariant from BASELINE.json's
``input_hint``: the text recovered from ``html`` must be byte-identical
to the stored ``text`` column for every url (tested in
tests/test_webpages.py and oracle-checked by wp_invariant_extract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_text", "with_text_features"]


def extract_text(html_col: str | Column) -> Column:
    """Extracted body text of an html BINARY column: the <p> payload.

    One regexp over a decoded string — stays inside codegen, no UDF.
    """
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.regexp_extract(F.decode(col, "UTF-8"), "<p>(.*)</p>", 1)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sketchable per-document features (north_star: 'text length and
    token counts') as built-in expressions."""
    t = F.col(text_col)
    return (
        df.withColumn("n_chars", F.length(t).cast("double"))
        .withColumn("n_tokens", F.size(F.split(t, " ")).cast("double"))
        .withColumn(
            "avg_token_len",
            (F.length(F.regexp_replace(t, " ", "")) / F.size(F.split(t, " "))).cast("double"),
        )
    )
