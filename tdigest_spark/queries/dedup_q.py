"""Deduplication query family for the driver contract.

The driver's ``documents`` table has no duplicates, so every query
first augments the corpus deterministically (pure arithmetic on
doc_id, reproduced identically in the DuckDB oracle): exact copies of
docs with ``doc_id % 13 = 0`` and near-duplicates (3 appended tokens)
of docs with ``doc_id % 7 = 0``.

MinHash/LSH candidate generation is hash-dependent (xxhash64), but the
emitted pairs are *exact-Jaccard verified*, so the oracle can check
them against an exhaustive all-pairs Jaccard in SQL — a miss by LSH
would surface as a row-set mismatch. (At the declared thresholds the
analytic miss probability is ~1e-5 and the pipeline is deterministic,
so the check is stable.) SimHash has no cross-engine hash, so its
oracle query pins the hamming=0 retrieval to the SQL identical-text
pair set; the banded hamming<=3 behavior is property-tested in pytest.

dd_decontaminate exercises the cross-corpus contamination operator
(exact + near leaks of a held-out eval set) against a text-equality
join plus the same exhaustive-Jaccard construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.dedup import (
    connected_components,
    decontaminate,
    exact_dedup,
    jaccard_verify,
    minhash_dedup_pairs,
    shingles,
    simhash_pairs,
    simhash_signatures,
)
from tdigest_spark.sources.tables import load


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    exact_copies = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    near_dups = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token tail")).alias("text"),
        "lang",
    )
    return docs.unionAll(exact_copies).unionAll(near_dups)


_AUG_SQL = """
    SELECT doc_id, text, lang FROM documents
    UNION ALL
    SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 13 = 0
    UNION ALL
    SELECT doc_id + 200000, text || ' extra token tail', lang
    FROM documents WHERE doc_id % 7 = 0
"""


def dd_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup end-to-end (consolidates round-2's dd_exact_stats +
    dd_exact_survivors under the 50-row budget): per-lang corpus size
    before/after, plus an order-free BIGINT checksum of the surviving
    doc_ids — the id sum pins the keep='min' survivor CHOICE exactly
    (any wrong survivor shifts the sum), at aggregate row count."""
    corpus = _augmented(spark, sf_dir)
    deduped = exact_dedup(corpus, ["text"], "doc_id", keep="min")
    total = corpus.groupBy("lang").agg(F.count("*").alias("n_total"))
    kept = deduped.groupBy("lang").agg(
        F.count("*").alias("n_unique"),
        F.sum("doc_id").cast("long").alias("survivor_id_sum"),
    )
    return total.join(kept, "lang")


def dd_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates, exact-Jaccard verified at >= 0.5. Not a
    registry entry since the dd_jaccard_pairs consolidation — kept as
    THE bench.py near-dup workload (unchanged since round 1, so the
    per-round BENCH numbers stay comparable)."""
    corpus = _augmented(spark, sf_dir)
    pairs = minhash_dedup_pairs(
        corpus, "doc_id", "text", threshold=0.5, shingle_k=3, n_hashes=64, bands=16
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def dd_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Jaccard surfaces in one driver row (consolidates round-3's
    dd_minhash_pairs + dd_ngram_jaccard_known_pairs under the 50-row
    budget — same corpus, same pair schema, tagged by ``src``):
    ``lsh`` = MinHash+LSH candidates exact-Jaccard verified at >= 0.5;
    ``known`` = exact n-gram Jaccard on the known (original, near-dup)
    pairs, verifying the verification operator itself against SQL."""
    corpus = _augmented(spark, sf_dir)
    lsh = minhash_dedup_pairs(
        corpus, "doc_id", "text", threshold=0.5, shingle_k=3, n_hashes=64, bands=16
    ).select(
        F.lit("lsh").alias("src"), "id_a", "id_b",
        F.round("jaccard", 4).alias("jaccard"),
    )
    sh = shingles(corpus, "doc_id", "text", 3)
    known = corpus.where(F.col("doc_id") % 7 == 0).where(
        F.col("doc_id") < 100000
    ).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 200000).alias("id_b")
    )
    kv = jaccard_verify(known, sh, "doc_id").select(
        F.lit("known").alias("src"), "id_a", "id_b",
        F.round("jaccard", 4).alias("jaccard"),
    )
    return lsh.unionAll(kv)


def dd_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination report: the corpus is the raw
    documents table; the held-out eval set plants three slices —
    exact leaks (copies of ``doc_id % 17``), near leaks (``doc_id %
    11`` with a 3-token suffix), and genuinely unseen items
    (``doc_id % 19``, synthetic text) that must NOT be flagged.
    Oracle: text-equality join for the exact kind, exhaustive shingle
    Jaccard for the near kind.

    Determinism vs the exhaustive oracle: this query runs the near leg
    at r=1 banding (bands == n_hashes == 64), so candidate recall for
    any true pair at jaccard >= 0.5 is 1-(1-j)^64 >= 1-6e-20 — every
    pair the exhaustive SQL oracle emits is found regardless of seed or
    scale factor (the default 16x4 banding has ~11% miss at j=0.5,
    which would make borderline pairs a driver-hash coin flip). r=1 is
    the correct knob HERE because the heldout side is small/broadcast;
    production corpus-vs-corpus dedup keeps the banded s-curve."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    heldout = (
        docs.where(F.col("doc_id") % 17 == 0)
        .select((F.col("doc_id") + 500000).alias("doc_id"), "text")
        .unionAll(
            docs.where(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 600000).alias("doc_id"),
                F.concat("text", F.lit(" eval suffix tokens")).alias("text"),
            )
        )
        .unionAll(
            docs.where(F.col("doc_id") % 19 == 0).select(
                (F.col("doc_id") + 700000).alias("doc_id"),
                F.concat(
                    F.lit("unseen benchmark prompt number "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    report = decontaminate(docs, heldout, threshold=0.5, n_hashes=64, bands=64)
    return report.select(
        "corpus_id", "heldout_id", "kind", F.round("jaccard", 4).alias("jaccard")
    )


def dd_simhash_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash retrieval of the planted EXACT duplicates, oracle-checked:
    identical text implies identical signature (hamming 0, found by
    every pigeonhole band), and a text-equality post-filter removes any
    hash collision — so the result set provably equals the SQL
    identical-text pair set, oracle-checking the simhash plumbing
    without cross-engine hash parity. (The hamming<=3 banded variant —
    round-2's rows-only dd_simhash_pairs — has no cross-engine hash,
    so it lives in pytest: capped/uncapped degenerate-bucket and
    pigeonhole-recall tests in test_pipeline_ops.py.)"""
    corpus = _augmented(spark, sf_dir)
    sigs = simhash_signatures(corpus, "doc_id", "text")
    cand = simhash_pairs(sigs, "doc_id", max_hamming=0)
    ta = corpus.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    tb = corpus.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .where(F.col("__ta") == F.col("__tb"))
        .select("id_a", "id_b")
    )


def dd_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: transitive closure of the verified MinHash
    near-dup pairs via distributed min-label propagation — every member
    labeled with its cluster's min doc_id (the keep-one survivor).
    Oracle: recursive CTE over the exhaustive SQL pair graph."""
    corpus = _augmented(spark, sf_dir)
    pairs = minhash_dedup_pairs(
        corpus, "doc_id", "text", threshold=0.5, shingle_k=3, n_hashes=64, bands=16
    )
    return connected_components(pairs.select("id_a", "id_b")).select(
        F.col("id").alias("doc_id"), "component"
    )


QUERIES = {
    "dd_exact_dedup": dd_exact_dedup,
    "dd_jaccard_pairs": dd_jaccard_pairs,
    "dd_decontaminate": dd_decontaminate,
    "dd_simhash_exact_pairs": dd_simhash_exact_pairs,
    "dd_dup_clusters": dd_dup_clusters,
}

_SHINGLE_SQL = """
    SELECT DISTINCT doc_id,
           unnest([array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, greatest(len(toks)-2,1)+1)]) AS s
    FROM (SELECT doc_id, string_split(text,' ') AS toks FROM corpus)
"""

ORACLES = {
    "dd_exact_dedup": f"""
        WITH corpus AS ({_AUG_SQL}),
        kept AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text)
        SELECT c.lang, count(*) AS n_total,
               count(*) FILTER (WHERE c.doc_id IN (SELECT doc_id FROM kept))
                   AS n_unique,
               sum(c.doc_id) FILTER (
                   WHERE c.doc_id IN (SELECT doc_id FROM kept)
               )::BIGINT AS survivor_id_sum
        FROM corpus c GROUP BY c.lang
    """,
    "dd_jaccard_pairs": f"""
        WITH corpus AS ({_AUG_SQL}),
        sh AS ({_SHINGLE_SQL}),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        known AS (
          SELECT doc_id AS id_a, doc_id + 200000 AS id_b FROM documents
          WHERE doc_id % 7 = 0
        ),
        kinter AS (
          SELECT k.id_a, k.id_b, count(*) AS c
          FROM known k
          JOIN sh a ON a.doc_id = k.id_a
          JOIN sh b ON b.doc_id = k.id_b AND b.s = a.s
          GROUP BY 1, 2
        )
        SELECT 'lsh' AS src, id_a, id_b,
               round(c / (na.n + nb.n - c), 4) AS jaccard
        FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE c / (na.n + nb.n - c) >= 0.5
        UNION ALL
        SELECT 'known' AS src, id_a, id_b,
               round(c / (na.n + nb.n - c), 4) AS jaccard
        FROM kinter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
    """,
    "dd_decontaminate": """
        WITH corpus AS (SELECT doc_id, text FROM documents),
        heldout AS (
          SELECT doc_id + 500000 AS heldout_id, text FROM documents
          WHERE doc_id % 17 = 0
          UNION ALL
          SELECT doc_id + 600000, text || ' eval suffix tokens' FROM documents
          WHERE doc_id % 11 = 0
          UNION ALL
          SELECT doc_id + 700000, 'unseen benchmark prompt number ' || doc_id
          FROM documents WHERE doc_id % 19 = 0
        ),
        exact AS (
          SELECT c.doc_id AS corpus_id, h.heldout_id
          FROM corpus c JOIN heldout h ON c.text = h.text
        ),
        csh AS (
          SELECT DISTINCT doc_id,
                 unnest([array_to_string(toks[i:i+2], ' ')
                         FOR i IN range(1, greatest(len(toks)-2,1)+1)]) AS s
          FROM (SELECT doc_id, string_split(text,' ') AS toks FROM corpus)
        ),
        hsh AS (
          SELECT DISTINCT heldout_id,
                 unnest([array_to_string(toks[i:i+2], ' ')
                         FOR i IN range(1, greatest(len(toks)-2,1)+1)]) AS s
          FROM (SELECT heldout_id, string_split(text,' ') AS toks FROM heldout)
        ),
        nc AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id),
        nh AS (SELECT heldout_id, count(*) AS n FROM hsh GROUP BY heldout_id),
        inter AS (
          SELECT c.doc_id AS corpus_id, h.heldout_id, count(*) AS i
          FROM csh c JOIN hsh h ON c.s = h.s GROUP BY 1, 2
        ),
        near AS (
          SELECT corpus_id, inter.heldout_id,
                 i / (nc.n + nh.n - i) AS j
          FROM inter
          JOIN nc ON nc.doc_id = corpus_id
          JOIN nh ON nh.heldout_id = inter.heldout_id
          WHERE i / (nc.n + nh.n - i) >= 0.5
            AND NOT EXISTS (
              SELECT 1 FROM exact e
              WHERE e.corpus_id = inter.corpus_id
                AND e.heldout_id = inter.heldout_id
            )
        )
        SELECT corpus_id, heldout_id, 'exact' AS kind, 1.0 AS jaccard FROM exact
        UNION ALL
        SELECT corpus_id, heldout_id, 'near' AS kind, round(j, 4) AS jaccard
        FROM near
    """,
    "dd_dup_clusters": f"""
        WITH RECURSIVE
        corpus AS ({_AUG_SQL}),
        sh AS ({_SHINGLE_SQL}),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b
          WHERE c / (na.n + nb.n - c) >= 0.5
        ),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        )
        SELECT u AS doc_id, least(u, min(v)) AS component
        FROM reach GROUP BY u
    """,
    "dd_simhash_exact_pairs": f"""
        WITH corpus AS ({_AUG_SQL})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM corpus a JOIN corpus b
          ON a.text = b.text AND a.doc_id < b.doc_id
    """,
}
