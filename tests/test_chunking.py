"""Chunking: coverage/overlap invariants, DuckDB oracle parity,
edge cases (short, empty, NULL), reassembly round-trip."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.chunking import chunk_documents
from tdigest_spark.sources.tables import load


def test_golden_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "text", chunk_chars=4, overlap_chars=1)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1 (len 10, stride 3): n = 1 + ceil((10-4)/3) = 3 chunks at
    # offsets 1,4,7 — the last chunk ends exactly at char 10
    got1 = [rows[(1, i)].chunk for i in range(rows[(1, 0)].n_chunks)]
    assert got1 == ["abcd", "defg", "ghij"]
    # consecutive chunks share exactly overlap chars
    for a, b in zip(got1, got1[1:]):
        assert a[-1] == b[0]
    assert rows[(2, 0)].chunk == "abc" and rows[(2, 0)].n_chunks == 1
    assert rows[(3, 0)].chunk == "" and rows[(3, 0)].n_chunks == 1
    assert rows[(4, 0)].chunk is None


def test_duckdb_oracle_parity(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    chunk, overlap = 200, 50
    stride = chunk - overlap
    got = {
        (r.doc_id, r.chunk_idx): (r.n_chunks, r.chunk_start, r.chunk)
        for r in chunk_documents(docs, "text", chunk, overlap).collect()
    }
    con = duckdb.connect()
    exp_rows = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id, text,
                 greatest(1, 1 + ceil(greatest(0, length(text) - {chunk})
                                      / {stride}))::INT AS n_chunks
          FROM '{sf_dir}/documents.parquet'
        )
        SELECT doc_id, i AS chunk_idx, n_chunks,
               (i * {stride} + 1)::INT AS chunk_start,
               substring(text, i * {stride} + 1, {chunk}) AS chunk
        FROM d, unnest(generate_series(0, n_chunks - 1)) AS t(i)
        """
    ).fetchall()
    exp = {(r[0], r[1]): (r[2], r[3], r[4]) for r in exp_rows}
    assert got == exp and len(got) > len(set(k[0] for k in got))


def test_reassembly_roundtrip(spark, sf_dir):
    # dropping each chunk's overlap prefix and concatenating in order
    # reconstructs the document exactly
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    chunk, overlap = 128, 32
    out = chunk_documents(docs, "text", chunk, overlap)
    rebuilt = (
        out.withColumn(
            "part",
            F.when(F.col("chunk_idx") == 0, F.col("chunk")).otherwise(
                F.col("chunk").substr(F.lit(overlap + 1), F.lit(chunk))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "part"))).part
            ).alias("rebuilt")
        )
    )
    j = docs.join(rebuilt, "doc_id")
    assert j.filter(F.col("text") != F.col("rebuilt")).count() == 0


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_chars"):
        chunk_documents(df, "text", 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", 4, 4)


def test_chunk_then_pack_pipeline(spark, sf_dir):
    # the LLM-prep chain: chunk docs -> count chunk tokens -> pack
    # chunks into budgeted sequences; every chunk lands in exactly one
    # sequence and no sequence exceeds the budget
    from tdigest_spark.operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, "text", 200, 50).filter(
        F.length("chunk") > 0
    )
    chunks = chunks.select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("chunk_id"),
        F.size(F.split(F.col("chunk"), " ")).alias("n_tokens"),
    )
    budget = 128
    packed = pack_sequences(chunks, "chunk_id", "n_tokens", budget)
    totals = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    )
    over = totals.filter((F.col("tot") > budget) & (F.col("n") > 1)).count()
    assert over == 0  # only oversized singleton chunks may exceed
    assert packed.count() == chunks.count()  # exactly-once
    assert packed.select("chunk_id").distinct().count() == chunks.count()


def test_chunk_documents_tokens_budget_and_reassembly(spark):
    """Token-window chunking: every chunk respects the whitespace token
    budget by construction, non-overlapped slices reassemble the
    document exactly (including multi-space runs), and counts match a
    DuckDB twin."""
    import duckdb

    from tdigest_spark.functions.textstats import token_count
    from tdigest_spark.operators.chunking import chunk_documents_tokens

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "one"),
            (2, "a  b   c d e f g h"),  # multi-space runs must round-trip
            (3, None),
            (4, " ".join(f"t{i}" for i in range(57))),
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents_tokens(docs, "text", chunk_tokens=8, overlap_tokens=2)
    pdf = (
        chunks.withColumn("wc", token_count(F.col("chunk")))
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    # budget: every chunk within the token budget
    ok = pdf[pdf["chunk"].notna()]
    assert (ok["wc"] <= 8).all()
    assert (ok["wc"] == ok["chunk_n_tokens"]).all()
    # NULL text -> one row, NULL chunk
    nrow = pdf[pdf["doc_id"] == 3]
    assert len(nrow) == 1 and nrow["chunk"].isna().all()
    # exact reassembly from stride-aligned prefixes (drop the overlap
    # from every chunk after the first)
    for did, g in pdf[pdf["chunk"].notna()].groupby("doc_id"):
        toks = []
        for i, (_, r) in enumerate(g.iterrows()):
            ts = r["chunk"].split(" ")
            toks.extend(ts if i == 0 else ts[2:])
        orig = docs.where(F.col("doc_id") == did).collect()[0]["text"]
        assert " ".join(toks) == orig, did
    # chunk-count twin in DuckDB
    con = duckdb.connect()
    for did, text in [(0, 12), (1, 1), (4, 57)]:
        n = int(pdf[pdf["doc_id"] == did]["n_chunks"].iloc[0])
        (want,) = con.execute(
            "SELECT greatest(1, 1 + ceil(greatest(0, ? - 8) / 6.0)::INT)", [text]
        ).fetchone()
        assert n == want, did
