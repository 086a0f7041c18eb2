"""token_count fidelity modes: whitespace (codegen), subword
vowel-group proxy (codegen, DuckDB-twinned), and real greedy BPE over
the fixed merge table (Arrow UDF) — goldens, oracle parity, and the
packing-budget wiring the subword modes exist for."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tdigest_spark.functions.textstats import (
    SUBWORD_COUNT_DUCKDB,
    _bpe_split_word,
    token_count,
)

DOCS = [
    "the quick brown fox",
    "internationalization",
    "uncharacteristically rare tokenization patterns",
    "a b c",
    "xyzzy qwrt",  # vowel-free tokens still count >= 1 each
    "to be or not to be that is the question",
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "id long, text string")


def _counts(df, mode):
    rows = df.select("id", token_count(F.col("text"), mode=mode).alias("n")).collect()
    return {r["id"]: r["n"] for r in rows}


def test_whitespace_mode_counts(docs_df):
    got = _counts(docs_df, "whitespace")
    assert got == {i: len(t.split(" ")) for i, t in enumerate(DOCS)}


def test_subword_mode_goldens_and_monotonicity(docs_df):
    got = _counts(docs_df, "subword")

    def vg(word):
        import re

        return max(1, len([g for g in re.split("[aeiou]+", word) if True]) - 1)

    expect = {i: sum(vg(w) for w in t.split(" ")) for i, t in enumerate(DOCS)}
    assert got == expect
    # pinned goldens: long words split into many subwords, short don't
    assert got[1] == 8  # internationalization: 8 vowel groups
    assert got[3] == 3  # "a b c" -> one each
    assert got[4] == 2  # vowel-free tokens still >= 1
    ws = _counts(docs_df, "whitespace")
    assert all(got[i] >= ws[i] for i in ws)  # subwords refine words


def test_subword_mode_matches_duckdb_twin(docs_df):
    got = _counts(docs_df, "subword")
    con = duckdb.connect()
    expr = SUBWORD_COUNT_DUCKDB.format(col="text")
    for i, t in enumerate(DOCS):
        (want,) = con.execute(f"SELECT {expr} FROM (SELECT ? AS text)", [t]).fetchone()
        assert got[i] == want, (i, t)


def test_bpe_word_goldens():
    # 'the': t,h,e -> (t,h) -> (th,e) -> 1 token
    assert _bpe_split_word("the") == 1
    # 'and': a,n,d -> (a,n) -> (an,d) -> 1
    assert _bpe_split_word("and") == 1
    # 'ing' -> (i,n) -> in,g -> (in,g) -> 1
    assert _bpe_split_word("ing") == 1
    # 'tion' -> t,i,o,n: (t,i) -> ti,o,n; (o,n) -> ti,on; (ti,on) -> 1
    assert _bpe_split_word("tion") == 1
    # no applicable merges: one token per char, min 1
    assert _bpe_split_word("x") == 1
    assert _bpe_split_word("xq") == 2
    # deterministic: same input, same output, every time
    assert _bpe_split_word("internationalization") == _bpe_split_word(
        "internationalization"
    )
    # BPE compresses: far fewer tokens than characters
    assert _bpe_split_word("internationalization") < 20


def test_bpe_mode_spark_matches_local(docs_df):
    got = _counts(docs_df, "bpe")
    expect = {
        i: sum(_bpe_split_word(w) for w in t.lower().split(" "))
        for i, t in enumerate(DOCS)
    }
    assert got == expect
    # common English function words merge to ~1 token; whitespace count
    # is a lower bound on any subword scheme
    ws = _counts(docs_df, "whitespace")
    assert all(got[i] >= ws[i] for i in ws)


def test_bad_mode_raises():
    with pytest.raises(ValueError, match="mode"):
        token_count(F.lit("x"), mode="words")


def test_packing_budget_at_subword_mode(spark):
    """pack_sequences budgets hold when the token column is the
    subword-mode count — the wiring the fidelity modes exist for."""
    from tdigest_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, ("lorem ipsum dolor sit amet " * ((i % 7) + 1)).strip()) for i in range(120)],
        "doc_id long, text string",
    ).withColumn("n_tokens", token_count(F.col("text"), mode="subword"))
    budget = 120
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget, n_groups=4)
    pdf = packed.toPandas()
    assert sorted(pdf["doc_id"]) == list(range(120))  # exactly once
    seq = pdf.groupby("seq_id").agg(total=("n_tokens", "sum"), n=("doc_id", "size"))
    assert (seq[seq["n"] > 1]["total"] <= budget).all()


def test_all_modes_agree_on_null_text(spark):
    """NULL text yields NULL (not 0) in EVERY fidelity mode — the
    modes must be drop-in substitutes, so aggregates over a corpus
    with NULL rows cannot change value by switching modes."""
    df = spark.createDataFrame([(1, "one two"), (2, None)], "id long, text string")
    row = {
        m: {
            r["id"]: r["n"]
            for r in df.select(
                "id", token_count(F.col("text"), mode=m).alias("n")
            ).collect()
        }
        for m in ("whitespace", "subword", "bpe")
    }
    for m, got in row.items():
        assert got[2] is None, m
        assert got[1] is not None and got[1] > 0, m
