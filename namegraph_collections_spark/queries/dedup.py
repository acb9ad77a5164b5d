"""Deduplication operators (driver brief): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup — each as a
declarative DataFrame plan with a DuckDB oracle.

Scale shape: exact dedup is one hash-groupBy; shingle-based methods
explode to (doc, shingle) rows and meet in a shuffle on the shingle —
the classic build for corpora where doc×doc comparison is impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, spread, tbl

NUM_MINHASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows


@register(
    "exact_dedup_groups",
    oracle="""
    SELECT md5(lower(trim(text))) AS fingerprint,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) >= 1
    """,
)
def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text (driver brief).

    One shuffle on the 128-bit fingerprint; min(doc_id) elects the
    canonical representative deterministically. At 100 TB the group-by
    key is the hash (fixed width), never the document body.
    """
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    The token array is materialized as a named column BEFORE the
    higher-order transform: subexpression elimination does not reach
    inside lambda bodies, so referencing ``F.split(...)`` directly
    there re-splits the text once per array element — O(tokens²) per
    document. With the named column the split runs once per row.
    """
    toked = spread(docs, "doc_id").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    toks = F.col("toks")
    # zip tokens with 1- and 2-shifted copies → word trigrams, JVM-side.
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda t, i: F.concat_ws(
            " ", t, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    return toked.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))


_SHINGLES_SQL = """
    SELECT doc_id, unnest(list_distinct(
             list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           )) AS shingle
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
"""


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) >= 0.1
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs (driver brief).

    Candidate generation meets in a shuffle on the shingle (an
    inverted-index join), never doc×doc: |pairs| is bounded by shingle
    co-occurrence. Jaccard from |A∩B| and precomputed set sizes.
    """
    # No persist(): this function returns a LAZY plan, so there is no
    # safe point to unpersist — a persist here pins executor storage
    # for the rest of the session. The shingle subplan is recomputed
    # per use (cheap projection + explode); identical shuffle subtrees
    # are deduplicated by ReusedExchange where they appear.
    docs = tbl(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


SIMHASH_BITS = 16
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


@register(
    "simhash_fingerprints",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, token, COUNT(*) AS w, md5(token) AS h
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    contrib AS (
      SELECT doc_id, p.pos,
             SUM(CASE WHEN substr(h, CAST(p.pos AS INT) + 1, 1)
                        IN ({", ".join(f"'{d}'" for d in _ODD_HEX)})
                      THEN w ELSE -w END) AS s
      FROM tok CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS pos) p
      GROUP BY doc_id, p.pos
    ),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s >= 0 THEN 1 << CAST(pos AS INT) ELSE 0 END) AS BIGINT)
               AS simhash
      FROM contrib GROUP BY doc_id
    )
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
    FROM fp GROUP BY simhash
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprints (driver brief).

    Charikar's scheme on weighted token hashes: bit i of the
    fingerprint is the sign of Σ_tokens tf·(±1), where ±1 is the
    parity of hex digit i of md5(token) — a bit source both engines
    compute identically. Documents sharing a fingerprint are near-dup
    candidates.

    Plan shape: Σ_tokens tf·(±1) ≡ Σ_occurrences ±1, so no tf
    pre-aggregation and no position explode are needed — each token
    occurrence contributes ±1 to all {SIMHASH_BITS} bit-sums inline,
    and ONE groupBy(doc_id) with {SIMHASH_BITS} conditional sums
    carries the whole signature. Map-side partial aggregation means
    the only shuffle moves {SIMHASH_BITS} longs per (partition, doc),
    regardless of document size — at 100 TB this is the difference
    between shuffling token streams and shuffling fingerprints.
    """
    docs = tbl(spark, sf_dir, "documents")
    tok = (
        spread(docs, "doc_id")
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .select("doc_id", F.md5("token").alias("h"))
    )
    bit_sums = [
        F.sum(
            F.when(F.substring("h", i + 1, 1).isin(*_ODD_HEX), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    fp_bits = tok.groupBy("doc_id").agg(*bit_sums)
    simhash = F.lit(0)
    for i in range(SIMHASH_BITS):
        simhash = simhash + F.when(F.col(f"s{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    fp = fp_bits.select("doc_id", simhash.cast("long").alias("simhash"))
    return fp.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc_id")
    )


NEARDUP_COSINE = 0.2  # synthetic embeddings are near-orthogonal; low bar keeps rows flowing
_EMB_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@register(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding, label,
        (CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
         + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
         + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
      ROUND({_EMB_DOT.format(a="a.embedding", b="b.embedding")}
            / (sqrt({_EMB_DOT.format(a="a.embedding", b="a.embedding")})
               * sqrt({_EMB_DOT.format(a="b.embedding", b="b.embedding")})), 6) AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_EMB_DOT.format(a="a.embedding", b="b.embedding")}
          / (sqrt({_EMB_DOT.format(a="a.embedding", b="a.embedding")})
             * sqrt({_EMB_DOT.format(a="b.embedding", b="b.embedding")})) >= {NEARDUP_COSINE}
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (driver
    brief).

    Candidates are restricted to sign-bit LSH buckets (the IVF/LSH
    pruning shape — same signature as `lsh_bucket_neighbors`), so the
    pairwise cosine runs on bucket-local pairs, not the full n². Dot
    products are ordered left-to-right double sums (unrolled codegen
    chain, see similarity._dot) for oracle-exact arithmetic.
    """
    from namegraph_collections_spark.queries.similarity import _dot as dot

    emb = tbl(spark, sf_dir, "embeddings")
    bit = lambda i, v: F.when(F.element_at("embedding", i) >= 0, F.lit(v)).otherwise(F.lit(0))  # noqa: E731

    # Per-vector norm precomputed ONCE (n rows), not per pair (n²/buckets
    # rows) — the identical left-to-right fold, so values match the
    # oracle's inline form bit-for-bit.
    sig = spread(emb, "vec_id").select(
        "vec_id",
        "embedding",
        (bit(1, 4) + bit(2, 2) + bit(3, 1)).alias("bucket"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )

    a = sig.alias("a")
    b = sig.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") >= NEARDUP_COSINE)
        .select("vec_a", "vec_b", "bucket", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "minhash_lsh_candidates",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    hashes AS (
      SELECT s.doc_id, seeds.seed, MIN(md5(seeds.seed || ':' || s.shingle)) AS mh
      FROM shingles s CROSS JOIN (SELECT unnest(range({NUM_MINHASHES})) AS seed) seeds
      GROUP BY s.doc_id, seeds.seed
    ),
    bands AS (
      SELECT doc_id, seed // {BAND_SIZE} AS band,
             md5(string_agg(mh, ',' ORDER BY seed)) AS band_sig
      FROM hashes GROUP BY doc_id, seed // {BAND_SIZE}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    """,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding candidate pairs (driver brief).

    shingle → {NUM_MINHASHES} seeded min-hashes → {NUM_MINHASHES // BAND_SIZE}
    band signatures → bucket join. Deterministic md5 min-hashing keeps
    the DuckDB oracle bit-identical. At scale the only doc×doc work is
    within LSH buckets — the standard sub-quadratic near-dup build.
    """
    docs = tbl(spark, sf_dir, "documents")
    sh = _shingles(docs)
    # All NUM_MINHASHES mins as one groupBy(doc_id) with inline min
    # aggs — no seed explode, no (doc, seed) shuffle: the map side
    # computes the md5s and partial-aggregates, so the shuffle carries
    # one fixed-width row per (partition, doc).
    min_cols = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(s)), F.col("shingle")))).alias(f"mh{s}")
        for s in range(NUM_MINHASHES)
    ]
    hashes = sh.groupBy("doc_id").agg(*min_cols)
    band_sigs = [
        F.md5(
            F.concat_ws(",", *[F.col(f"mh{s}") for s in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)])
        ).alias(f"b{b}")
        for b in range(NUM_MINHASHES // BAND_SIZE)
    ]
    n_bands = NUM_MINHASHES // BAND_SIZE
    stack_args = ", ".join(f"{b}, b{b}" for b in range(n_bands))
    bands = hashes.select("doc_id", *band_sigs).selectExpr(
        "doc_id", f"stack({n_bands}, {stack_args}) AS (band, band_sig)"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
