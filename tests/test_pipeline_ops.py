"""Operator-level tests for the training-data pipeline families
(dedup / similarity / text stats / multimodal) beyond the oracle
parity gate."""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    shingles,
    simhash_pairs,
    simhash_signatures,
)
from tdigest_spark.operators.multimodal import decode_features, resize_media, synth_media
from tdigest_spark.operators.similarity import cosine_topk, lsh_neardup_pairs
from tdigest_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text", "lang").cache()


@pytest.fixture(scope="module")
def corpus(spark, docs):
    near = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" tail token add")).alias("text"),
        "lang",
    )
    exact = docs.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text", "lang"
    )
    return docs.unionAll(near).unionAll(exact).cache()


def test_exact_dedup_removes_only_copies(spark, docs, corpus):
    n_orig = docs.count()
    n_copies = corpus.where(F.col("doc_id") >= 20_000).count()
    deduped = exact_dedup(corpus, ["text"], "doc_id")
    assert deduped.count() == corpus.count() - n_copies
    # survivors are the min ids: no surviving id >= 20000
    assert deduped.where(F.col("doc_id") >= 20_000).count() == 0
    assert n_orig > 0


def test_minhash_finds_all_planted_pairs(spark, corpus):
    pairs = minhash_dedup_pairs(corpus, "doc_id", "text", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    planted_near = {
        (r["doc_id"], r["doc_id"] + 10_000)
        for r in corpus.where(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 10_000)
        ).collect()
    }
    planted_exact = {
        (r["doc_id"], r["doc_id"] + 20_000)
        for r in corpus.where(
            (F.col("doc_id") % 4 == 0) & (F.col("doc_id") < 10_000)
        ).collect()
    }
    assert planted_near <= got
    assert planted_exact <= got
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_simhash_identical_text_zero_hamming(spark, corpus):
    sigs = simhash_signatures(corpus, "doc_id", "text")
    pairs = simhash_pairs(sigs, "doc_id", max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    exact_pairs = [
        (r["doc_id"], r["doc_id"] + 20_000)
        for r in corpus.where(
            (F.col("doc_id") % 4 == 0) & (F.col("doc_id") < 10_000)
        ).collect()
    ]
    for p in exact_pairs:
        assert got.get(p) == 0  # identical text -> identical simhash


def test_shingles_count(spark, docs):
    row = docs.select("doc_id", "text").first()
    n_tok = len(row["text"].split(" "))
    n_sh = shingles(docs.where(F.col("doc_id") == row["doc_id"]), "doc_id", "text", 3).count()
    assert n_sh <= max(n_tok - 2, 1)  # distinct <= positions


def test_cosine_topk_self_similarity(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # plant an exact duplicate of vec 0 and check it ranks first
    dup = emb.where(F.col("vec_id") == 0).select(
        F.lit(999_999).alias("vec_id"), "embedding"
    )
    corpus = emb.unionAll(dup)
    queries = emb.where(F.col("vec_id") == 0)
    top = cosine_topk(corpus, queries, "vec_id", "embedding", k=3).collect()
    assert top[0]["vec_id"] == 999_999
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_lsh_neardup_finds_scaled_copies(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = emb.where(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 5_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 3.0).alias("embedding"),
    )
    pairs = lsh_neardup_pairs(emb.unionAll(copies), "vec_id", "embedding", 0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {
        (r["vec_id"], r["vec_id"] + 5_000)
        for r in emb.where(F.col("vec_id") % 11 == 0).collect()
    }
    assert planted <= got  # same direction -> same bucket, recall 1


def test_multimodal_roundtrip(spark):
    """Payloads are REAL PNG/WAV files; decode_features measures the
    decoded domain (pixel 0..255 / sample -2048..2047 from the
    generator formulas), and resize re-encodes a valid container."""
    media = synth_media(spark, 200)
    assert media.schema["payload"].dataType.simpleString() == "binary"
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, payload in raw.items():
        if mid % 2 == 0:
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        else:
            assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    feats = decode_features(media).collect()
    seen_ch = set()
    for r in feats:
        ch = r["meta"]["channels"]
        seen_ch.add((r["kind"], ch))
        assert r["n_channels"] == ch
        if r["kind"] == "image":
            assert r["n_units"] == r["meta"]["width"] * r["meta"]["height"] * ch
            assert 0 <= r["min_val"] <= r["max_val"] <= 255
        else:
            assert r["n_units"] == r["meta"]["n_samples"] * ch
            assert -2048 <= r["min_val"] <= r["max_val"] <= 2047
        # chK_mean present exactly for K < channels
        assert r["ch0_mean"] is not None
        assert (r["ch1_mean"] is not None) == (ch >= 2)
        assert (r["ch2_mean"] is not None) == (ch >= 3)
    # the media_id % 4 mix actually produced all four shapes
    assert seen_ch == {("image", 1), ("image", 3), ("audio", 1), ("audio", 2)}
    small = resize_media(media, scale=2).collect()
    from tdigest_spark.functions.media_codecs import png_decode, wav_decode

    for r in small:
        ch = r["meta"]["channels"]
        if r["kind"] == "image":
            img = png_decode(bytes(r["payload"]))
            expect = (r["meta"]["height"], r["meta"]["width"])
            assert img.shape == (expect + (3,) if ch == 3 else expect)
        else:
            s, rate = wav_decode(bytes(r["payload"]))
            assert len(s) == r["meta"]["n_samples"] and rate == 4000
            assert s.ndim == (2 if ch == 2 else 1)


def test_ivf_pruned_recall(spark, sf_dir):
    """IVF with nprobe < nlist must keep high top-k recall vs exact
    brute force, while scoring a fraction of the candidate pairs."""
    from tdigest_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    approx = ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, nlist=8, nprobe=4
    ).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, recall


def test_ivf_exhaustive_equals_exact(spark, sf_dir):
    from tdigest_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=5, nlist=8, nprobe=8)
    a = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    b = {(r["query_id"], r["rank"]): r["vec_id"] for r in approx.collect()}
    assert a == b


def test_ivf_centroids_deterministic(spark, sf_dir):
    from tdigest_spark.operators.similarity import train_ivf_centroids

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    import numpy as np

    c1 = train_ivf_centroids(emb, "embedding", nlist=8, seed=7)
    c2 = train_ivf_centroids(emb, "embedding", nlist=8, seed=7)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_bloom_semijoin_exact_and_pruning(spark, sf_dir):
    """Bloom semijoin must (a) return exactly the plain join's rows and
    (b) actually prune the fact side before the join."""
    from tdigest_spark.operators.sketch_join import bloom_filter_column, bloom_semijoin

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    picked = customer.where(F.col("c_nationkey") < 2).select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = orders.join(picked, "o_custkey").count()
    fast = bloom_semijoin(orders, picked, "o_custkey").count()
    assert fast == plain

    flt = bloom_filter_column(orders, "o_custkey", picked, "o_custkey")
    n_total = orders.count()
    n_pass = flt.where(F.col("__bloom_hit")).count()
    # keys of ~2/25 nations: the filter must prune most of the fact side
    assert n_pass < n_total * 0.5
    assert n_pass >= plain  # no false negatives


def test_bloom_probe_nullable_int_keys(spark):
    """Regression: probe keys must stringify Spark-side — a NULL in the
    batch used to coerce pandas ints to float ('123.0' vs '123') and
    false-negatively drop every row of the batch."""
    from tdigest_spark.operators.sketch_join import bloom_semijoin

    large = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (3, "d")], "k long, v string"
    )
    small = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted(r["v"] for r in bloom_semijoin(large, small, "k").collect())
    assert got == ["a", "d"]


def test_cosine_zero_norm_vector_ranks_last(spark):
    """Regression: an all-zero embedding must get cosine 0, not NaN
    (Spark sorts NaN first, which made it everyone's top neighbor)."""
    from tdigest_spark.operators.similarity import cosine_topk

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(df, df.where(F.col("vec_id") == 0), "vec_id", "embedding", k=3)
    ranked = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert ranked[0] == 1  # closest direction
    assert ranked[-1] == 2  # zero vector last, not first


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation must close transitive chains (path graph
    needs multiple rounds) and cliques into single components."""
    from tdigest_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5, clique {10,11,12}, isolated pair {20,21}
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


# ------------------------------------------------ degenerate-bucket caps

def test_simhash_pairs_degenerate_bucket_capped(spark):
    """A templated corpus (300 identical docs) collapses every
    pigeonhole block onto one value; the max_bucket guard must drop
    those buckets (bounded candidate count) while distinct near-dup
    content elsewhere is still found."""
    from pyspark.sql import functions as F

    boiler = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.lit("lorem ipsum dolor sit amet consectetur adipiscing elit").alias("text"),
    )
    pair = spark.createDataFrame(
        [
            (1000, "the quick brown fox jumps over the lazy dog tonight again"),
            (1001, "the quick brown fox jumps over the lazy dog tonight again"),
        ],
        "doc_id long, text string",
    )
    sigs = simhash_signatures(boiler.unionAll(pair), "doc_id", "text")
    got = simhash_pairs(sigs, "doc_id", max_hamming=3, max_bucket=200).collect()
    ids = {(r["id_a"], r["id_b"]) for r in got}
    # the 300-doc degenerate group (44850 potential pairs) is dropped...
    assert not any(a < 300 and b < 300 for a, b in ids)
    # ...but the small near-dup pair survives
    assert (1000, 1001) in ids
    # and with an uncapped bucket the degenerate pairs WOULD be emitted
    all_pairs = simhash_pairs(sigs, "doc_id", max_hamming=3, max_bucket=10**9)
    assert all_pairs.where("id_a < 300 and id_b < 300").count() == 300 * 299 // 2


def test_lsh_neardup_degenerate_bucket_capped(spark):
    """300 identical embeddings land in one sign bucket — the cap must
    drop that bucket while a distinct-direction duplicate pair in
    another bucket is still found."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8).tolist()
    other = (-np.asarray(base)).tolist()  # antipodal: different bucket
    rows = [(i, base) for i in range(300)]
    rows += [(1000, other), (1001, [x * 2.0 for x in other])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = lsh_neardup_pairs(df, "vec_id", "embedding", threshold=0.999, max_bucket=200)
    ids = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert not any(a < 300 and b < 300 for a, b in ids)
    assert (1000, 1001) in ids


def test_connected_components_long_chain_converges(spark):
    """Pointer-shortcutting makes rounds O(log diameter): a 1000-node
    path (plain propagation would need ~1000 rounds) must converge in
    <= 12, the checkpointed loop must not blow up the plan, and an
    insufficient max_iters must RAISE (split components are never
    returned silently)."""
    from tdigest_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(chain, max_iters=12).collect()
    }
    assert got == {i: 0 for i in range(1000)}

    short = spark.createDataFrame(
        [(i, i + 1) for i in range(24)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(short, max_iters=2)


def test_ivf_index_persist_prune_and_exhaustive(spark, sf_dir, tmp_path):
    """Persisted IVF index: exhaustive probe equals brute force; a
    pruned probe pushes a cell partition filter to the scan so only the
    probed shards are read."""
    from tdigest_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk_indexed,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    index_dir = str(tmp_path / "ivf_idx")
    fmt = build_ivf_index(emb, "vec_id", "embedding", index_dir, nlist=8, seed=7)
    queries = emb.where(F.col("vec_id") % 150 == 0)

    got = ivf_topk_indexed(
        spark, index_dir, queries, "vec_id", "embedding", k=3, nprobe=8, fmt=fmt
    )
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    g = {(r["query_id"], r["rank"]): (r["vec_id"], round(r["cosine"], 6))
         for r in got.collect()}
    e = {(r["query_id"], r["rank"]): (r["vec_id"], round(r["cosine"], 6))
         for r in exact.collect()}
    assert g == e

    pruned = ivf_topk_indexed(
        spark, index_dir, queries, "vec_id", "embedding", k=3, nprobe=2, fmt=fmt
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the probe-cell filter must reach the scan as a PARTITION filter
    # (unprobed shards never read), with fewer than all 8 cells listed
    import re

    m = re.search(r"PartitionFilters: \[[^]]*cell[^]]*IN \(([^)]*)\)", plan)
    assert m, plan
    assert 0 < len(m.group(1).split(",")) < 8, m.group(1)
    # pruned search still returns k results per query
    n_q = queries.count()
    assert pruned.count() == 3 * n_q


def test_candidate_generation_plans_no_cartesian(spark, corpus, sf_dir):
    """The near-dup candidate joins must be hash/sort-merge equi-joins
    on bucket keys — a CartesianProduct or BroadcastNestedLoopJoin in
    any of these plans means the bucketing degenerated to all-pairs."""
    from tdigest_spark.operators.dedup import minhash_dedup_pairs as mdp

    plans = {}
    plans["minhash"] = mdp(corpus, "doc_id", "text", threshold=0.5)
    sigs = simhash_signatures(corpus, "doc_id", "text")
    plans["simhash"] = simhash_pairs(sigs, "doc_id", max_hamming=3)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    plans["lsh"] = lsh_neardup_pairs(emb, "vec_id", "embedding", 0.999)
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


def test_ivf_index_append_refresh_and_drift(spark, sf_dir, tmp_path):
    """Index maintenance: rows appended WITHOUT retraining are assigned
    to existing cells and found by search through the same
    partition-pruned scan; skewed growth trips the retrain trigger; a
    refresh rebuilds into a fresh directory that searches correctly."""
    import re

    from tdigest_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        cosine_topk,
        ivf_retrain_needed,
        ivf_topk_indexed,
        refresh_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") % 2 == 0)
    extra = emb.where(F.col("vec_id") % 2 == 1)
    index_dir = str(tmp_path / "ivf_idx")
    fmt = build_ivf_index(base, "vec_id", "embedding", index_dir, nlist=8, seed=7)
    assert not ivf_retrain_needed(spark, index_dir, fmt=fmt)

    append_ivf_index(extra, "vec_id", "embedding", index_dir)
    queries = emb.where(F.col("vec_id") % 150 == 0)
    got = ivf_topk_indexed(
        spark, index_dir, queries, "vec_id", "embedding", k=3, nprobe=8, fmt=fmt
    )
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    g = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert g == e  # appended odd ids are reachable (they appear in exact top-3)
    assert any(v % 2 == 1 for v in g.values())

    pruned = ivf_topk_indexed(
        spark, index_dir, queries, "vec_id", "embedding", k=3, nprobe=2, fmt=fmt
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^]]*cell[^]]*IN \(", plan), plan

    # skewed growth: pile one direction into the index -> hot cell
    one = emb.where(F.col("vec_id") == 2).select("embedding").first()["embedding"]
    skew = spark.range(4000).select(
        (F.col("id") + 500_000).alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in one]).alias("embedding"),
    )
    append_ivf_index(skew, "vec_id", "embedding", index_dir)
    assert ivf_retrain_needed(spark, index_dir, fmt=fmt)

    # refresh into a NEW dir (pointer-swap discipline), search still exact
    out_dir = str(tmp_path / "ivf_idx_v2")
    fmt2 = refresh_ivf_index(spark, index_dir, out_dir, "vec_id", "embedding", fmt=fmt)
    got2 = ivf_topk_indexed(
        spark, out_dir, queries, "vec_id", "embedding", k=3, nprobe=8, fmt=fmt2
    )
    full = emb.unionByName(skew)
    exact2 = cosine_topk(full, queries, "vec_id", "embedding", k=3)
    g2 = {(r["query_id"], r["rank"]): r["vec_id"] for r in got2.collect()}
    e2 = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact2.collect()}
    assert g2 == e2


def test_oversized_buckets_enumerates_dropped_mass(spark):
    """The no-silent-caps contract: for any capped pair call, the
    dropped bucket keys are enumerable with oversized_buckets over the
    same banded table, and an uncapped call still finds the pairs."""
    from tdigest_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        oversized_buckets,
        shingles,
    )

    # 30 identical docs (one degenerate bucket per band) + 2 normal docs
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated again and again") for i in range(30)]
        + [(100, "a genuinely unique document about owls"),
           (101, "another unique document about trains")],
        "doc_id long, text string",
    )
    sh = shingles(docs, "doc_id", "text", 3)
    sigs = minhash_signatures(sh, "doc_id")
    capped = lsh_candidate_pairs(sigs, "doc_id", max_bucket=10)
    assert capped.count() == 0  # the clique is silently gone when capped...

    # ...so the operator contract demands the dropped keys be visible
    # through the PUBLIC banded-table builder:
    from tdigest_spark.operators.dedup import lsh_bands

    dropped = oversized_buckets(
        lsh_bands(sigs, "doc_id"), ["band", "bh"], 10
    ).collect()
    assert len(dropped) == 16  # the boilerplate clique, once per band
    assert all(row["n"] == 30 for row in dropped)

    # default (no cap) finds the full clique
    uncapped = lsh_candidate_pairs(sigs, "doc_id")
    assert uncapped.count() == 30 * 29 // 2


def test_exact_dedup_nested_negative_zero_and_map_rejection(spark):
    """-0.0 nested inside array/struct dedup columns must compare equal
    to 0.0 (matching SQL grouping semantics at any depth), and
    map-typed columns are rejected (to_json key order is not
    canonical)."""
    from pyspark.sql import functions as F

    from tdigest_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 2.0])],
        "id long, xs array<double>",
    ).withColumn(
        # plant a genuine -0.0 in row 2's array (literal -0.0 would be
        # normalized by the parser; -1.0 * 0.0 evaluates to -0.0)
        "xs",
        F.when(
            F.col("id") == 2,
            F.array(F.lit(1.0), F.lit(-1.0) * F.lit(0.0)),
        ).otherwise(F.col("xs")),
    )
    survivors = sorted(
        r["id"] for r in exact_dedup(df, ["xs"], "id", keep="min").collect()
    )
    assert survivors == [1, 3]  # row 2's [1.0, -0.0] == row 1's [1.0, 0.0]

    # struct nesting too
    df2 = spark.createDataFrame([(1, 0.0), (2, 0.0), (3, 5.0)], "id long, v double")
    df2 = df2.withColumn(
        "s",
        F.struct(
            F.when(F.col("id") == 2, F.lit(-1.0) * F.lit(0.0))
            .otherwise(F.col("v"))
            .alias("v")
        ),
    )
    survivors2 = sorted(
        r["id"] for r in exact_dedup(df2, ["s"], "id", keep="min").collect()
    )
    assert survivors2 == [1, 3]

    df3 = df2.withColumn("m", F.create_map(F.lit("k"), F.col("v")))
    with pytest.raises(ValueError, match="map-typed"):
        exact_dedup(df3, ["m"], "id")


# ------------------------------------------------------- decontamination

def test_decontaminate_report_and_clean(spark, docs):
    from tdigest_spark.operators.dedup import apply_decontamination, decontaminate

    heldout = (
        docs.where(F.col("doc_id") % 4 == 0)
        .select((F.col("doc_id") + 50_000).alias("doc_id"), "text")
        .unionAll(
            docs.where(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 60_000).alias("doc_id"),
                F.concat("text", F.lit(" tail token add")).alias("text"),
            )
        )
        .unionAll(
            docs.where(F.col("doc_id") % 6 == 0).select(
                (F.col("doc_id") + 70_000).alias("doc_id"),
                F.concat(
                    F.lit("unseen benchmark prompt number "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    report = decontaminate(docs, heldout, threshold=0.5).cache()
    rows = report.collect()

    exact = {(r["corpus_id"], r["heldout_id"]) for r in rows if r["kind"] == "exact"}
    expected_exact = {
        (r["doc_id"], r["doc_id"] + 50_000)
        for r in docs.where(F.col("doc_id") % 4 == 0).collect()
    }
    assert exact == expected_exact

    near = {(r["corpus_id"], r["heldout_id"]) for r in rows if r["kind"] == "near"}
    expected_near = {
        (r["doc_id"], r["doc_id"] + 60_000)
        for r in docs.where(F.col("doc_id") % 5 == 0).collect()
    }
    # every planted near leak is found; extras are legitimate — the
    # documents table ships natural near-dup pairs (a doc similar to a
    # leaked doc is itself contaminated), all >= threshold by the
    # operator's exact verification (range-checked below) and
    # exhaustively cross-checked in the dd_decontaminate oracle row
    assert expected_near <= near
    # exact pairs carry jaccard 1.0; near pairs a genuine (0, 1) value
    for r in rows:
        if r["kind"] == "exact":
            assert r["jaccard"] == 1.0
        else:
            assert 0.5 <= r["jaccard"] < 1.0
    # fresh eval items (no corpus counterpart) are never flagged
    assert not [r for r in rows if r["heldout_id"] >= 70_000]

    clean = apply_decontamination(docs, report)
    flagged_ids = {cid for cid, _ in exact | near}
    assert clean.count() == docs.count() - len(flagged_ids)
    assert clean.where(F.col("doc_id").isin(list(flagged_ids))).count() == 0

    # the heldout side must broadcast: corpus never sits on the build
    # side of the candidate or verify joins
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    report.unpersist()


def test_jaccard_verify_sizes_are_candidate_restricted(spark, corpus):
    """The |A|/|B| size aggregate must run over candidate ids only —
    verifying a handful of pairs against a big corpus must not shuffle
    every document's shingles into the groupBy. The restriction shows
    up as a LeftSemi join below the size aggregate; correctness of the
    restricted sizes is pinned by an exact pandas recomputation."""
    from tdigest_spark.operators.dedup import jaccard_verify, shingles

    sh = shingles(corpus, "doc_id", "text", 3)
    pairs = spark.createDataFrame(
        [(0, 20_000), (5, 10_005)],  # planted exact copy + near-dup
        "id_a long, id_b long",
    ).where(F.col("id_a") != F.col("id_b"))
    out = jaccard_verify(pairs, sh, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    # recompute exactly from the full shingle table
    pdf = sh.toPandas()
    sets = {k: set(g["s"]) for k, g in pdf.groupby("doc_id")}
    for (a, b), j in got.items():
        expect = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert j == pytest.approx(expect, abs=1e-12)
    assert got[(0, 20_000)] == 1.0  # the planted exact copy
