"""Sequence packing: exactly-once, budget respect, fill guarantee,
layout-independent determinism."""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.packing import pack_sequences
from tdigest_spark.sources.tables import load

BUDGET = 128


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .cache()
    )


def test_pack_sequences_properties(spark, docs):
    packed = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    pdf = packed.toPandas()

    # every doc exactly once, token counts untouched
    src = docs.toPandas()
    assert sorted(pdf["doc_id"]) == sorted(src["doc_id"])
    merged = pdf.merge(src, on="doc_id", suffixes=("", "_src"))
    assert (merged["n_tokens"] == merged["n_tokens_src"]).all()

    # budget respected; any over-budget sequence is a single oversized doc
    seq = pdf.groupby("seq_id").agg(total=("n_tokens", "sum"), n=("doc_id", "size"))
    over = seq[seq["total"] > BUDGET]
    assert (over["n"] == 1).all()
    assert (pdf.merge(over, on="seq_id")["n_tokens"] > BUDGET).all()

    # any-fit guarantee: at most one sequence under half budget per
    # pack group (two such bins would have been merged)
    seq = seq.reset_index()
    seq["pg"] = seq["seq_id"] // (1 << 32)
    light = seq[seq["total"] < BUDGET / 2]
    assert (light.groupby("pg").size() <= 1).all()

    # seq ids carry the pack group of their docs
    pdf2 = pdf.copy()
    pdf2["pg"] = pdf2["seq_id"] // (1 << 32)
    assert (pdf2.groupby("seq_id")["pg"].nunique() == 1).all()


def test_pack_sequences_layout_independent(spark, docs):
    a = pack_sequences(docs.repartition(2), "doc_id", "n_tokens", BUDGET, n_groups=8)
    b = pack_sequences(
        docs.repartition(7, "lang"), "doc_id", "n_tokens", BUDGET, n_groups=8
    )
    ma = {r["doc_id"]: r["seq_id"] for r in a.collect()}
    mb = {r["doc_id"]: r["seq_id"] for r in b.collect()}
    assert ma == mb


def test_pack_sequences_respects_by_boundaries(spark, docs):
    packed = pack_sequences(
        docs, "doc_id", "n_tokens", BUDGET, by=["lang"], n_groups=4
    )
    pdf = packed.toPandas()
    # a (lang, seq_id) group never mixes languages and stays in budget
    # unless it is a single oversized doc
    grp = pdf.groupby(["lang", "seq_id"]).agg(
        total=("n_tokens", "sum"), n=("doc_id", "size")
    )
    assert ((grp["total"] <= BUDGET) | (grp["n"] == 1)).all()
    assert sorted(pdf["doc_id"]) == sorted(docs.toPandas()["doc_id"])


def test_pack_sequences_rejects_bad_tokens(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "doc_id long, n_tokens int"
    )
    with pytest.raises(ValueError, match="non-positive"):
        pack_sequences(df, "doc_id", "n_tokens", 64)
    df2 = spark.createDataFrame([(1, 10), (2, 0)], "doc_id long, n_tokens int")
    with pytest.raises(ValueError, match="non-positive"):
        pack_sequences(df2, "doc_id", "n_tokens", 64)
