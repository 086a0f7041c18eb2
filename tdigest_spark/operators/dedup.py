"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, exact n-gram Jaccard verification.

Not in the reference (a sketch library) — but the same design DNA:
fixed-size per-doc signatures built by associative/partial aggregation,
candidate generation by bucketing, exact verification only on the tiny
candidate set.

Scale shape (the part that must survive 100 TB):
* shingling + MinHash run entirely JVM-side (explode + 64 codegen'd
  ``min(xxhash64(...))`` partial aggs — map-side combined, one shuffle
  of doc_id -> 64x8 bytes, raw text never shuffles);
* LSH banding shuffles (band_idx, band_hash) keys — bucket sizes are
  the only quadratic risk, so an opt-in ``max_bucket`` cap drops
  degenerate buckets the way production near-dup pipelines do, with
  :func:`oversized_buckets` enumerating the dropped keys so the cap is
  never silent (route that mass through :func:`exact_dedup`);
* exact Jaccard verification joins shingles ONLY for candidate pairs
  (|candidates| << |pairs|).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_verify",
    "minhash_dedup_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "lsh_bands",
    "simhash_blocks",
    "oversized_buckets",
    "decontaminate",
    "apply_decontamination",
    "connected_components",
]


def _cap_buckets(banded: DataFrame, keys: Sequence[str], max_bucket: int | None) -> DataFrame:
    """Drop rows in buckets larger than ``max_bucket`` before a bucket
    self-join (the guard against quadratic blowup on degenerate
    content). ``None`` = no cap. The cap is OPT-IN: a capped call drops
    every pair inside an oversized bucket, so callers must pair it with
    :func:`oversized_buckets` to route that mass elsewhere (typically
    :func:`exact_dedup` — oversized buckets are boilerplate)."""
    if max_bucket is None:
        return banded
    w = Window.partitionBy(*keys)
    return (
        banded.withColumn("__bsz", F.count("*").over(w))
        .where(F.col("__bsz") <= max_bucket)
        .drop("__bsz")
    )


def oversized_buckets(
    banded: DataFrame, keys: Sequence[str], max_bucket: int
) -> DataFrame:
    """The buckets a ``max_bucket`` cap WOULD drop: one row per
    oversized bucket key with its member count (no member lists — a
    degenerate bucket can hold millions of rows; join ``banded`` back
    on the keys to enumerate members). Pair with any capped
    candidate-pair call so the dropped mass is routed through exact
    dedup instead of vanishing silently; ``banded`` is the bucketed
    table the pair functions build (see each docstring)."""
    keys = list(keys)
    return (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
    )


def exact_dedup(
    df: DataFrame, cols: Sequence[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup: one survivor per identical ``cols`` tuple
    (deterministic: lowest/highest id).

    The groupBy key is a 256-bit content digest
    (``sha2(to_json(struct(cols)))`` — JVM codegen, null-safe: to_json
    distinguishes NULL from empty string), NOT the raw columns: at
    100 TB the dedup shuffle then carries 32 bytes + id per row instead
    of the full document text — the shuffle volume drops by the mean
    doc size. sha-256 collisions are negligible at any realistic corpus
    (~1e-40 expected collisions at 1e12 docs), so the result equals the
    raw-column groupBy exactly; map-side combine still bounds
    pre-shuffle rows per partition by distinct count. Float/double
    values are normalized (-0.0 -> 0.0) before serialization,
    RECURSIVELY through array/struct nesting — SQL grouping
    (NormalizeFloatingNumbers) treats -0.0 == 0.0 at any depth but
    to_json renders them as distinct strings. Map-typed columns are
    rejected: to_json key order is not canonicalized, so equal maps
    can serialize differently."""
    from pyspark.sql import types as T

    agg = F.min(id_col) if keep == "min" else F.max(id_col)

    def _norm(col, dt):
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            # -0.0 == 0.0 is true in SQL, so this folds both to +0.0;
            # NULL compares null -> otherwise(col) keeps it NULL
            return F.when(col == 0.0, F.lit(0.0).cast(dt.simpleString())).otherwise(col)
        if isinstance(dt, T.ArrayType):
            return F.transform(col, lambda x: _norm(x, dt.elementType))
        if isinstance(dt, T.StructType):
            return F.struct(
                *[_norm(col[f.name], f.dataType).alias(f.name) for f in dt.fields]
            )
        if isinstance(dt, T.MapType):
            raise ValueError(
                "exact_dedup: map-typed dedup columns are not supported "
                "(to_json map key order is not canonical); explode the "
                "map into sorted entries first"
            )
        return col

    key = F.sha2(
        F.to_json(
            F.struct(*[_norm(F.col(c), df.schema[c].dataType).alias(c) for c in cols])
        ),
        256,
    )
    keep_ids = (
        df.select(F.col(id_col), key.alias("__ck"))
        .groupBy("__ck")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return df.join(keep_ids, id_col, "left_semi")


def shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct word-k-gram shingles per doc: (id, s). Pure codegen
    (split/sequence/transform/slice), no Python."""
    expr = (
        f"array_distinct(transform(sequence(1, greatest(size(split({text_col}, ' '))-{k - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k}))))"
    )
    return df.select(F.col(id_col), F.explode(F.expr(expr)).alias("s"))


def minhash_signatures(
    sh: DataFrame, id_col: str, n_hashes: int = 64, hash_col: str | None = None
) -> DataFrame:
    """MinHash signature per doc from a shingle table, as ``n_hashes``
    JVM-side ``min(...)`` aggregates — whole-stage codegen, map-side
    partial min, shuffle is one row of 64 longs per doc.

    Each shingle STRING is hashed once (``xxhash64(s)``); the
    ``n_hashes`` families are derived by remixing that 8-byte value
    (``xxhash64(i, h)``) — the one-strong-hash + independent-mixes
    construction (Kirsch-Mitzenmacher; same scheme as
    ``sketch/hashing.py``), which avoids re-hashing every multi-byte
    shingle 64 times (~1.4x faster signature stage). Pass ``hash_col``
    when the input already carries the shingle hash (the pipeline
    persists hashed shingles — 8 bytes/row instead of the k-gram)."""
    if hash_col is None:
        sh = sh.select(id_col, F.xxhash64("s").alias("__h"))
        hash_col = "__h"
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col(hash_col))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sigs: DataFrame, id_col: str, n_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """The banded signature table behind :func:`lsh_candidate_pairs`:
    (id, band, bh) with bh = hash of the band's r = n_hashes/bands
    signature rows. Public so callers running a capped pair generation
    can enumerate what the cap drops (:func:`oversized_buckets` over
    keys ``["band", "bh"]``)."""
    r = n_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"mh{b * r + j}") for j in range(r)]).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col), F.explode(band_structs).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signatures (r = n_hashes/bands rows per band), bucket by
    band hash, emit candidate id pairs (a < b).

    ``max_bucket`` (opt-in — default NO cap) drops buckets larger than
    the cap before the self-join, the standard guard against quadratic
    bucket blowup on degenerate/templated content at web scale. The
    cap silently removes EVERY pair inside an oversized bucket (large
    true-duplicate clusters included!), so production callers that set
    it should route the dropped buckets — enumerable with
    ``oversized_buckets(lsh_bands(sigs, id_col, n_hashes, bands),
    ["band", "bh"], max_bucket)`` — through :func:`exact_dedup`
    instead."""
    banded = lsh_bands(sigs, id_col, n_hashes, bands)
    banded = _cap_buckets(banded, ["band", "bh"], max_bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    sh: DataFrame,
    id_col: str,
    hash_col: str | None = None,
    pin_pairs: bool = True,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only:
    |A ∩ B| via a shingle join restricted to candidates,
    |A ∪ B| = |A| + |B| − |∩|.

    The intersection join keys on the 64-bit shingle hash, not the
    shingle text — the verify shuffle then carries 8 bytes per shingle
    instead of the k-gram string (set sizes and intersections are
    preserved up to 64-bit collisions, ~n²/2⁶⁵ expected — negligible
    against the candidate volumes this stage sees). ``hash_col``: the
    input already carries the shingle hash.

    The stage is O(candidate docs), not O(corpus): the shingle table is
    semi-joined down to ids that appear in some candidate pair BEFORE
    the size aggregate — without that, verifying a handful of pairs
    against a 100 TB corpus would shuffle every document's shingles
    into the ``|A|``/``|B|`` groupBy (AQE turns the semi-join into a
    broadcast when the candidate id set is small, which it is by
    construction after banding)."""
    from pyspark import StorageLevel

    if hash_col is None:
        shh = sh.select(id_col, F.xxhash64("s").alias("__sh"))
    else:
        shh = sh.select(id_col, F.col(hash_col).alias("__sh"))
    # pairs feeds the id-restriction AND the intersection join — pin it
    # so the (possibly expensive) candidate pipeline upstream runs once.
    # DataFrame cache entries are held by the CacheManager until
    # explicitly unpersisted, so repeated callers (one call per
    # micro-batch in the streaming sink) must pass pin_pairs=False and
    # persist/unpersist the candidate input themselves — otherwise each
    # call leaks one pinned plan for the life of the session.
    if pin_pairs:
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    # no distinct: left_semi ignores probe-side duplicates, and
    # skipping it saves a shuffle of the candidate id list
    cand_ids = pairs.select(F.col("id_a").alias(id_col)).unionByName(
        pairs.select(F.col("id_b").alias(id_col))
    )
    shh = shh.join(cand_ids, id_col, "left_semi")
    sizes = shh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = shh.select(F.col(id_col).alias("id_a"), "__sh")
    b = shh.select(F.col(id_col).alias("id_b"), "__sh")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "__sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH bands ->
    exact-Jaccard verify -> pairs with jaccard >= threshold.

    Precision is exact (every emitted pair is verified >= threshold);
    recall follows the banding s-curve 1-(1-j^r)^b with r = n_hashes /
    bands: the default (r=4, b=16) puts the s-curve midpoint at
    (1/16)^(1/4) = 0.5 — pairs AT a 0.5 threshold are found with
    ~64% probability, rising steeply above it (>=0.998 at j=0.7,
    ~1-1e-5 at j=0.85). Raise ``bands`` (smaller r) to push recall up
    at the boundary at the cost of more candidates to verify.

    The shingle table feeds two consumers (signatures and the verify
    join), so it is persisted — HASHED (8 bytes per shingle, both
    consumers key on the hash; the k-gram text never leaves the
    shingling stage): at warehouse scale this is the
    materialize-the-shingle-table step every production near-dup
    pipeline has, at a fraction of the string footprint
    (spill-to-disk storage level, safe at any size)."""
    from pyspark import StorageLevel

    sh = (
        shingles(df, id_col, text_col, shingle_k)
        .select(id_col, F.xxhash64("s").alias("__sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sigs = minhash_signatures(sh, id_col, n_hashes, hash_col="__sh")
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes, bands, max_bucket=max_bucket)
    return jaccard_verify(cands, sh, id_col, hash_col="__sh").where(
        F.col("jaccard") >= threshold
    )


# --------------------------------------------------------------- SimHash

def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc, fully JVM-side: explode tokens, hash,
    per-bit ±1 majority via ``bits`` codegen'd sums (map-side combined).
    One shuffle of doc_id -> 64 small ints; reassembled into one long.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select(F.col(id_col), sig.alias("simhash"))


def connected_components(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Duplicate CLUSTERS from a near-dup pair list (id_a, id_b):
    assigns every node the MINIMUM id reachable from it (transitive
    closure), i.e. connected components by iterated min-label
    propagation — each round joins every node's current label with its
    neighbors' and keeps the min.

    Returns (id, component) with component = min id of the cluster;
    singletons (ids not in any pair) are absent — union them in from
    the corpus if needed. The keep-one-per-cluster policy is then
    ``where(id != component)`` = drop list.

    Convergence: each round combines neighbor min-propagation with a
    POINTER-SHORTCUT step (label <- label of own label, the
    Shiloach-Vishkin move; cf. Kiveris et al., "Connected Components
    in MapReduce and Beyond", for the same round-bounding idea), so
    the distance from any node to its component min roughly HALVES per
    round: rounds are O(log diameter), not O(diameter) — a 1000-link
    crawl-dup chain (url -> url' -> url'' ...) converges in ~10 rounds
    where plain propagation needs 1000. A component needing more than
    ``max_iters`` rounds raises instead of returning silently split
    clusters (default 20 rounds covers diameters beyond 2^20 — any
    real graph).

    Iteration hygiene (what makes repeated rounds survive at scale):
    each round's labels are eagerly localCheckpoint'ed — lineage is
    truncated every round, so the plan never grows, and the superseded
    round's blocks are released immediately (executor storage stays
    O(|labels|), not O(rounds x |labels|)).
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionAll(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .persist()
    )
    # label(u) = min(u, min neighbor), iterate to fixpoint
    labels = edges.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least(F.col("u"), F.col("mv")).alias("c")
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iters):
        prop = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("c").alias("nc"))
        )
        # shortcut: c(u) <- c(c(u)). Every label IS a node id (min of
        # self/neighbors), so the self-join hits; left join only for
        # safety at the fixpoint where c(u)=u rows always match anyway.
        shortcut = labels.select(
            F.col("u").alias("__lu"), F.col("c").alias("__lc")
        )
        new_labels = (
            labels.join(prop, "u", "left")
            .join(shortcut, F.col("c") == F.col("__lu"), "left")
            .select(
                "u",
                F.least(
                    "c", F.coalesce("nc", "c"), F.coalesce("__lc", "c")
                ).alias("c"),
            )
        )
        # eager checkpoint: truncates lineage (constant-size plan per
        # round) and materializes, so the superseded RDD can be freed
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.c") != F.col("o.c"))
            .limit(1)
            .count()
        )
        # superseded round: dropping the only reference makes its
        # checkpoint blocks ContextCleaner-collectable (unlike
        # .persist(), whose CacheManager entry lives until the session
        # ends — the round-1 leak)
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(a component's diameter exceeds max_iters); raise max_iters "
            "or pre-contract the graph"
        )
    return labels.select(F.col("u").alias("id"), F.col("c").alias("component"))


def simhash_blocks(
    sigs: DataFrame, id_col: str, chunks: int = 4
) -> DataFrame:
    """The pigeonhole block table behind :func:`simhash_pairs`:
    (id, simhash, blk, bv) with bv = the blk-th 64/chunks-bit slice.
    Public for the same reason as :func:`lsh_bands`: a capped pair
    generation pairs with :func:`oversized_buckets` over keys
    ``["blk", "bv"]`` so the cap is never silent."""
    width = 64 // chunks
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(c).alias("blk"),
                F.shiftright("simhash", c * width)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for c in range(chunks)
        ]
    )
    return sigs.select(
        F.col(id_col), F.col("simhash"), F.explode(blocks).alias("bb")
    ).select(
        id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bv").alias("bv")
    )


def simhash_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via the
    pigeonhole trick: split 64 bits into ``chunks`` 16-bit blocks; any
    pair within distance <= chunks-1 shares at least one exact block ->
    bucket-join on (block_idx, block_value), verify with bit_count(xor).

    ``max_bucket`` (opt-in — default NO cap) drops blocks whose bucket
    exceeds the cap before the self-join — the same degenerate-content
    guard as :func:`lsh_candidate_pairs`: a templated/near-empty corpus
    collapses many docs onto a few block values (e.g. simhash 0) and an
    unguarded self-join goes quadratic. Recall caveat when capped: a
    true near-dup pair is missed only if EVERY shared block is
    oversized (with ``max_hamming < chunks`` a pair shares >= chunks -
    max_hamming blocks); enumerate the dropped mass with
    ``oversized_buckets(simhash_blocks(sigs, id_col, chunks),
    ["blk", "bv"], max_bucket)`` and route it through
    :func:`exact_dedup`.
    """
    assert max_hamming < chunks, "pigeonhole needs max_hamming < chunks"
    banded = simhash_blocks(sigs, id_col, chunks)
    banded = _cap_buckets(banded, ["blk", "bv"], max_bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------- Decontamination

def decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    heldout_id_col: str | None = None,
    heldout_text_col: str | None = None,
    threshold: float = 0.5,
    shingle_k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Train/test contamination report: which corpus documents leak a
    held-out evaluation set, exactly or as near-duplicates.

    Returns (corpus_id, heldout_id, kind, jaccard) with kind ``exact``
    (byte-identical text, jaccard pinned to 1.0) or ``near`` (shingle
    Jaccard >= ``threshold`` but text not byte-equal). Every emitted
    near pair is EXACT-Jaccard verified; recall follows the LSH banding
    s-curve of :func:`minhash_dedup_pairs` (midpoint (1/bands)^(bands/
    n_hashes)). Feed the report to :func:`apply_decontamination` to get
    the clean corpus.

    Scale shape (corpus ~100 TB, heldout = eval benchmarks, i.e. SMALL
    — this asymmetry is the whole design):
    * exact leg: heldout text hashes (sha2-256, 32 bytes/row) are
      broadcast and hash-joined — the corpus never shuffles and its
      text never leaves the scan;
    * near leg: the corpus pays ONE shuffle (doc_id -> 64x8-byte
      MinHash signature, map-side combined); heldout bands are
      broadcast, so candidate generation is a broadcast join over the
      signature table, not a self-join;
    * verification: corpus shingles are semi-joined down to candidate
      docs first (|candidates| << |corpus|), then exact Jaccard runs
      against broadcast heldout shingle hashes.

    Both sides shingle identically; IDs may overlap across the two
    tables (they are never compared to each other).
    """
    hid = heldout_id_col or id_col
    htext = heldout_text_col or text_col
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(text_col).alias("__t"))
    h = heldout.select(F.col(hid).alias("heldout_id"), F.col(htext).alias("__t"))

    # exact: 256-bit content hash equality == byte equality (collision
    # odds ~1e-40 at 1e12 docs, same argument as exact_dedup)
    hk = F.sha2(F.col("__t"), 256)
    exact = (
        c.select("corpus_id", hk.alias("__k"))
        .join(F.broadcast(h.select("heldout_id", hk.alias("__k"))), "__k")
        .select(
            "corpus_id",
            "heldout_id",
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    # near: corpus signatures (the one corpus shuffle) x broadcast
    # heldout bands -> candidates; exact-verify candidates only
    csh = shingles(c, "corpus_id", "__t", shingle_k).select(
        "corpus_id", F.xxhash64("s").alias("__sh")
    )
    hsh = shingles(h, "heldout_id", "__t", shingle_k).select(
        "heldout_id", F.xxhash64("s").alias("__sh")
    )
    csig = minhash_signatures(csh, "corpus_id", n_hashes, hash_col="__sh")
    hsig = minhash_signatures(hsh, "heldout_id", n_hashes, hash_col="__sh")
    cband = lsh_bands(csig, "corpus_id", n_hashes, bands)
    hband = lsh_bands(hsig, "heldout_id", n_hashes, bands)
    cands = (
        cband.join(F.broadcast(hband), ["band", "bh"])
        .select("corpus_id", "heldout_id")
        .distinct()
    )

    # verify: corpus shingles only for candidate docs; heldout shingle
    # hashes broadcast (8 bytes x heldout shingles)
    ccand = csh.join(
        cands.select("corpus_id").distinct(), "corpus_id", "left_semi"
    )
    inter = (
        cands.join(ccand, "corpus_id")
        .join(F.broadcast(hsh), ["heldout_id", "__sh"])
        .groupBy("corpus_id", "heldout_id")
        .agg(F.count("*").alias("__i"))
    )
    nc = ccand.groupBy("corpus_id").agg(F.count("*").alias("__nc"))
    nh = hsh.groupBy("heldout_id").agg(F.count("*").alias("__nh"))
    near = (
        inter.join(nc, "corpus_id")
        .join(F.broadcast(nh), "heldout_id")
        .select(
            "corpus_id",
            "heldout_id",
            (F.col("__i") / (F.col("__nc") + F.col("__nh") - F.col("__i"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .join(exact.select("corpus_id", "heldout_id"), ["corpus_id", "heldout_id"], "left_anti")
        .select(
            "corpus_id", "heldout_id", F.lit("near").alias("kind"), "jaccard"
        )
    )
    return exact.unionAll(near)


def apply_decontamination(
    corpus: DataFrame, report: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every corpus document the :func:`decontaminate` report
    flags (any kind). The flagged-id set is tiny relative to the
    corpus, so the anti-join broadcasts."""
    flagged = report.select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
