"""Training-data pipeline operators beyond the reference (driver brief):
decontamination, sequence packing, and deterministic corpus mixing.

These are the corpus-construction steps an LLM data pipeline runs after
dedup: drop train docs that leak into eval sets, pack variable-length
documents into fixed context windows, and re-weight domains. All three
are pure column/window math — zero Python in the hot path — with exact
integer arithmetic wherever a sampling decision is made so the DuckDB
oracle reproduces every row bit-for-bit.

Shared split rule: ``bucket16(doc_id)`` = the first 4 hex chars of
``md5(doc_id)`` as an integer in [0, 65536). Both engines compute md5
of the same decimal string, so membership decisions (test split,
sampling keep/drop) are exact integer comparisons — no float RNG, no
engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.det_round import micro_spark, micro_sql, round6_det
from namegraph_collections_spark.queries.dedup import (
    HOT_SHINGLE_DF_CAP,
    _MINHASH_BANDS_SQL,
    _minhash_bands,
    _shingles,
    _SHINGLES_SQL,
)
from namegraph_collections_spark.queries.registry import (
    REGISTRY,
    ranked_topk,
    register,
    spread,
    tbl,
)

#: bucket16 values below this are the held-out "eval" split (~10%).
TEST_BUCKET_CUTOFF = 6554

#: Context-window budget (tokens) for concat-and-chop packing.
PACK_BUDGET = 512

#: Mixing: keep ~40% of the corpus, re-weighted by sqrt(domain size).
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 2, 5
MIX_ALPHA_SQL = "0.5"


def _bucket16(col):
    """Integer in [0, 65536) from md5 of the value's decimal string."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")


_BUCKET16_SQL = "CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 4) AS BIGINT)"


@register(
    "decontamination_overlap",
    oracle=f"""
    WITH shingles_all AS ({_SHINGLES_SQL}),
    shingles AS (
      SELECT * FROM shingles_all
      WHERE shingle NOT IN (SELECT shingle FROM shingles_all
                            GROUP BY shingle HAVING COUNT(*) > {HOT_SHINGLE_DF_CAP})
    ),
    tagged AS (
      SELECT doc_id, shingle,
             {_BUCKET16_SQL.format(c='doc_id')} < {TEST_BUCKET_CUTOFF} AS is_test
      FROM shingles
    )
    SELECT t.doc_id AS test_doc_id,
           COUNT(DISTINCT tr.doc_id) AS n_train_docs,
           COUNT(DISTINCT t.shingle) AS n_shared_shingles
    FROM tagged t JOIN tagged tr ON t.shingle = tr.shingle
    WHERE t.is_test AND NOT tr.is_test
    GROUP BY t.doc_id
    """,
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination: for each eval doc, which train docs
    share a word trigram and how many distinct trigrams leak.

    The standard decontamination build (n-gram overlap against held-out
    sets): explode both splits to (doc, shingle), meet in ONE shuffle on
    the shingle — never doc×doc. The same hot-shingle df cap as the
    Jaccard path bounds per-shingle fan-out (a stop phrase shared by
    10⁶ docs would otherwise dominate the join); dropping
    universally-shared shingles is also what you want semantically —
    they carry no contamination signal. At 100 TB the eval side is tiny,
    so the planner broadcasts it; here both sides flow through the
    shingle shuffle.
    """
    docs = tbl(spark, sf_dir, "documents")
    # No checkpoint on the shingle stream: measured equal to eager/
    # lazy localCheckpoint at sf0.1, and at 100 TB recomputing three
    # cheap column-pruned scans beats pinning the ~3×-text-bytes
    # exploded stream in non-replicated executor storage (full
    # rationale at dedup._jaccard_pairs).
    sh_all = _shingles(docs)
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > HOT_SHINGLE_DF_CAP)
        .select("shingle")
    )
    sh = sh_all.join(F.broadcast(hot), "shingle", "left_anti").withColumn(
        "is_test", _bucket16(F.col("doc_id")) < TEST_BUCKET_CUTOFF
    )
    test = sh.filter(F.col("is_test")).select(F.col("doc_id").alias("test_doc_id"), "shingle")
    train = sh.filter(~F.col("is_test")).select(F.col("doc_id").alias("train_doc_id"), "shingle")
    return (
        test.join(train, "shingle")
        .groupBy("test_doc_id")
        .agg(
            F.countDistinct("train_doc_id").alias("n_train_docs"),
            F.countDistinct("shingle").alias("n_shared_shingles"),
        )
    )


@register(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {PACK_BUDGET} AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM binned
    GROUP BY source, bin_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing: assign each doc to the context
    window its first token lands in when the corpus is concatenated in
    doc_id order, per source shard.

    bin = exclusive-prefix-sum(tokens) div budget — the GPT-style
    pack-then-chunk rule, as a single window + groupBy. Partitioning the
    window BY SOURCE is the scale decision: a global packing order is a
    one-partition sort at 100 TB, while per-shard packing runs one
    independent window per source (training shards are independent
    anyway). Two shuffles total: one on source for the window, one for
    the (source, bin) rollup — and the second reuses the first's
    partitioning since source is a prefix of the grouping key.
    """
    docs = tbl(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = toks.withColumn(
        "bin_id",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(PACK_BUDGET))
        .cast("long"),
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


_MIX_PLAN_SQL = f"""
    counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    weights AS (
      SELECT source, n_docs,
             CAST(floor(pow(n_docs, {MIX_ALPHA_SQL}) * 1000000 + 0.5) / 1000000.0
                  AS DECIMAL(18, 6)) AS weight
      FROM counts
    ),
    totals AS (
      SELECT SUM(weight) AS total_weight,
             (SUM(n_docs) * {MIX_BUDGET_NUM}) // {MIX_BUDGET_DEN} AS budget
      FROM weights
    ),
    plan AS (
      SELECT w.source, w.n_docs,
             CAST(floor((CAST(w.weight AS DOUBLE) / CAST(t.total_weight AS DOUBLE))
                        * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18, 6)) AS share,
             CAST(FLOOR(CAST(floor((CAST(w.weight AS DOUBLE) / CAST(t.total_weight AS DOUBLE))
                                   * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18, 6))
                        * t.budget) AS BIGINT) AS expected_docs
      FROM weights w CROSS JOIN totals t
    )
"""


@register(
    "domain_mix_plan",
    oracle=f"""
    WITH {_MIX_PLAN_SQL}
    SELECT source, n_docs, CAST(share AS DOUBLE) AS share, expected_docs FROM plan
    """,
)
def domain_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain re-weighting (alpha = 0.5): each
    domain's share of the output corpus is sqrt(n) / sum(sqrt(n)), the
    standard multiplier that upsamples small domains relative to raw
    proportion.

    Determinism across engines: per-domain weights are rounded to 6
    places and summed as DECIMAL(18,6) — an exact, order-independent
    sum — so share and the integer expected_docs match bit-for-bit.
    The totals side is a 1-row aggregate crossJoined back (broadcast;
    no driver-side collect in plan construction).
    """
    docs = tbl(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    weights = counts.withColumn(
        "weight", round6_det(F.pow(F.col("n_docs"), F.lit(0.5))).cast("decimal(18,6)")
    )
    totals = weights.agg(
        F.sum("weight").alias("total_weight"),
        ((F.sum("n_docs") * MIX_BUDGET_NUM) / MIX_BUDGET_DEN).cast("long").alias("budget"),
    )
    share = round6_det(
        F.col("weight").cast("double") / F.col("total_weight").cast("double")
    ).cast("decimal(18,6)")
    return (
        weights.crossJoin(F.broadcast(totals))
        .withColumn("share", share)
        .select(
            "source",
            "n_docs",
            F.col("share").cast("double").alias("share"),
            F.floor(F.col("share") * F.col("budget")).cast("long").alias("expected_docs"),
        )
    )


@register(
    "deterministic_mix_sample",
    oracle=f"""
    WITH {_MIX_PLAN_SQL}
    SELECT d.doc_id, d.source
    FROM documents d JOIN plan p ON d.source = p.source
    WHERE {_BUCKET16_SQL.format(c='d.doc_id')} * p.n_docs < p.expected_docs * 65536
    """,
)
def deterministic_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the mixed corpus: keep a doc iff its md5 bucket
    falls under its domain's target rate.

    keep ⇔ bucket16(doc_id) · n_docs < expected_docs · 65536 — pure
    integer cross-multiplication, so the same docs are kept on every
    engine and every run (content-addressed sampling, the property that
    makes the mix reproducible and incrementally maintainable: a new
    snapshot re-derives the identical sample for unchanged docs). The
    20-row plan broadcasts onto the scan; the filter runs map-side with
    no shuffle at all.
    """
    docs = tbl(spark, sf_dir, "documents")
    plan = domain_mix_plan(spark, sf_dir).select("source", "n_docs", "expected_docs")
    return (
        docs.join(F.broadcast(plan), "source")
        .filter(_bucket16(F.col("doc_id")) * F.col("n_docs") < F.col("expected_docs") * 65536)
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis & Spirakis,
# "Weighted random sampling with a reservoir", IPL 2006 — the A-Res
# key u^(1/w), here in its ln(u)/w monotone form): the standard way a
# corpus pipeline draws a quality- or length-weighted subsample. The
# uniform u is md5-derived (content-addressed like _bucket16), so the
# "random" draw is reproducible on any engine and any cluster layout.
# ---------------------------------------------------------------------------
WSAMPLE_K = 100

#: 2^60 as a double — maps the 60-bit hash into (0, 1].
_WS_RANGE = float(1 << 60)


@register(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             CAST(greatest(length(text), 1) AS BIGINT) AS w,
             floor((ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1)
                       / {_WS_RANGE!r})
                    / greatest(length(text), 1)) * 1000000000 + 0.5) / 1000000000.0 AS skey
      FROM documents
    )
    SELECT doc_id, w, skey, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id ASC) AS rnk
      FROM keyed
    ) WHERE rnk <= {WSAMPLE_K}
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Draw {WSAMPLE_K} documents weighted by text length, without
    replacement, deterministically: per-doc key = ln(u)/w with
    u = (h60(doc_id)+1)/2^60 ∈ (0,1], take the k largest keys
    (equivalent to A-Res's u^(1/w) ranking; ln keeps the arithmetic in
    one double division, rounded to 9 for cross-engine rank parity
    with doc_id tiebreak).

    Scale shape: the key is a pure column expression on the scan, and
    the global top-k is ranked_topk — ``orderBy().limit`` compiles to
    TakeOrderedAndProject, so each partition keeps a partial
    top-{WSAMPLE_K} reservoir and only k rows per partition reach the
    merge; the full corpus never concentrates anywhere. This is the
    distributed reservoir. (A bare global window here would NOT get
    the WindowGroupLimit rewrite — no partition spec — and would sort
    every document on one task.) Changing the weight column (quality
    score, dedup cluster size, inverse source frequency) changes the
    policy without touching the mechanism.
    """
    docs = tbl(spark, sf_dir, "documents")
    w_col = F.greatest(F.length("text"), F.lit(1)).cast("long")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long") + 1) / F.lit(_WS_RANGE)
    keyed = docs.select(
        "doc_id",
        w_col.alias("w"),
        # 9-digit floor-form rounding (det_round convention at 1e9 scale):
        # same IEEE op sequence on both engines, no engine ROUND half rule.
        (
            F.floor((F.log(u) / w_col) * F.lit(1000000000.0) + F.lit(0.5))
            / F.lit(1000000000.0)
        ).alias("skey"),
    )
    return ranked_topk(
        keyed, WSAMPLE_K, F.col("skey").desc(), F.col("doc_id").asc()
    ).select("doc_id", "w", "skey", "rnk")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: the assignment every training
# pipeline makes exactly once and must never change afterwards.
# Content-addressed (md5 of doc_id, the same _bucket16 convention as
# the mix sampler), NOT random: re-running on any engine, any cluster
# layout, or any day yields the identical split, and adding new
# documents never reassigns old ones — the property a persisted
# random seed cannot give you across engines.
# ---------------------------------------------------------------------------
#: bucket16 cutoffs for ~80/10/10: [0, 52429) train, [52429, 58982)
#: val, [58982, 65536) test.
SPLIT_VAL_LO = 52429
SPLIT_TEST_LO = 58982


@register(
    "deterministic_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, {_BUCKET16_SQL.format(c="doc_id")} AS bucket
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, source,
             CASE WHEN bucket < {SPLIT_VAL_LO} THEN 'train'
                  WHEN bucket < {SPLIT_TEST_LO} THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT source, split, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
           CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
    FROM assigned GROUP BY source, split
    """,
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed 80/10/10 train/val/test split, summarized per
    (source, split): row counts plus min/max/sum of the member ids —
    the sum acts as a membership fingerprint, so the value hash pins
    WHICH documents landed in each split, not just how many.

    Scale shape: the split column is one md5 expression on the scan
    (no shuffle to assign), and the summary is a single partial-
    aggregated groupBy. At 100 TB the assignment is free at read time
    wherever the corpus is already flowing — the split never needs to
    be materialized as a copy.
    """
    docs = tbl(spark, sf_dir, "documents")
    b = _bucket16(F.col("doc_id"))
    assigned = docs.select(
        "doc_id",
        "source",
        F.when(b < SPLIT_VAL_LO, F.lit("train"))
        .when(b < SPLIT_TEST_LO, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("doc_id").cast("long").alias("doc_id_sum"),
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (round 8): the fixed-seed training-order
# step every large-scale run needs — each epoch is a content-addressed
# pseudorandom permutation of the corpus into fixed shards, fully
# reproducible from (epoch, doc_id) alone (the Megatron/GPT-3-style
# seeded shuffle, expressed content-addressed instead of via an RNG
# state so any subset of shards can be rebuilt independently).
# ---------------------------------------------------------------------------

#: Epochs materialized by the plan (two, so the hash witnesses that
#: the permutation actually CHANGES across epochs).
N_SHUFFLE_EPOCHS = 2
#: Shards per epoch. At 100 TB this is the write parallelism knob
#: (shard count scales with corpus size; the ORDER inside a shard
#: comes from sort-within-partition on skey at write time — no global
#: sort, no window; the skey VALUES are what this query value-hashes).
N_SHUFFLE_SHARDS = 8

def _epoch_key_sql(str_t: str) -> str:
    """The shuffle key expression; ``str_t`` is the engine's string
    type name (VARCHAR on DuckDB, STRING on Spark)."""
    return (
        f"concat('e', CAST(epoch AS {str_t}), ':', CAST(doc_id AS {str_t}))"
    )


@register(
    "epoch_shuffle_plan",
    oracle=f"""
    WITH e AS (
      SELECT d.doc_id, ep.epoch,
             md5({_epoch_key_sql("VARCHAR")}) AS h
      FROM documents d
      CROSS JOIN (SELECT UNNEST(range({N_SHUFFLE_EPOCHS})) AS epoch) ep
    ),
    a AS (
      SELECT CAST(epoch AS INT) AS epoch, doc_id,
             CAST(CAST('0x' || substr(h, 1, 4) AS BIGINT)
                  % {N_SHUFFLE_SHARDS} AS INT) AS shard,
             substr(h, 1, 8) AS skey8
      FROM e
    )
    SELECT 'assign' AS op, epoch, doc_id, shard, skey8,
           CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS doc_id_sum
    FROM a
    UNION ALL
    SELECT 'shard' AS op, epoch, CAST(NULL AS BIGINT), shard,
           CAST(NULL AS VARCHAR), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM a
    GROUP BY epoch, shard
    """,
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(epoch, doc) shard assignment + ordering key, plus the
    per-shard manifest (count + doc_id_sum membership fingerprint).

    The permutation is the pair (shard, skey8): writing a shard is
    ``filter(shard = s).repartition(1).sortWithinPartitions(skey8)``
    — shard-local sorts, no global ordering structure. Emitting skey8
    as a COLUMN pins the full permutation in the value hash without
    materializing a rank (a per-shard row_number would tie shard size
    to window memory; the sort-at-write formulation never does).

    Scale shape: scan × {N_SHUFFLE_EPOCHS} epochs (a row-multiplying
    projection, no shuffle), one partial-aggregated groupBy for the
    manifest. All arithmetic is md5-hex — identical on both engines.
    """
    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id").select("doc_id")
    epochs = ", ".join(str(i) for i in range(N_SHUFFLE_EPOCHS))
    e = docs.selectExpr("doc_id", f"explode(array({epochs})) AS epoch").selectExpr(
        "doc_id",
        "CAST(epoch AS INT) AS epoch",
        f"md5({_epoch_key_sql('STRING')}) AS h",
    )
    a = e.selectExpr(
        "epoch",
        "doc_id",
        f"CAST(conv(substr(h, 1, 4), 16, 10) % {N_SHUFFLE_SHARDS} AS INT) AS shard",
        "substr(h, 1, 8) AS skey8",
    )
    assign = a.select(
        F.lit("assign").alias("op"),
        "epoch",
        "doc_id",
        "shard",
        "skey8",
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("doc_id_sum"),
    )
    manifest = (
        a.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .select(
            F.lit("shard").alias("op"),
            "epoch",
            F.lit(None).cast("long").alias("doc_id"),
            "shard",
            F.lit(None).cast("string").alias("skey8"),
            "n_docs",
            "doc_id_sum",
        )
    )
    return assign.unionByName(manifest)


# ---------------------------------------------------------------------------
# Fuzzy decontamination — the MinHash sibling of decontamination_overlap.
# Exact n-gram overlap (above) catches verbatim leaks; the published
# large-model recipes also remove NEAR-duplicate contamination (PaLM
# §App. C "fuzzy decontamination"; GPT-4 system card: 50-gram + fuzzy
# variants), because a paraphrased or boilerplate-shifted copy of an
# eval document leaks just as much signal. The engine's instance
# reuses the corpus's MinHash-LSH banding verbatim: a TRAIN document
# is contaminated if ANY of its band signatures collides with an eval
# document's — the same >= 1-band OR-rule as the near-dup candidate
# stage, applied across the split boundary instead of within the
# corpus.
# ---------------------------------------------------------------------------


@register(
    "fuzzy_decontamination",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    {_MINHASH_BANDS_SQL},
    tagged AS (
      SELECT doc_id, band, band_sig,
             {_BUCKET16_SQL.format(c='doc_id')} < {TEST_BUCKET_CUTOFF} AS is_test
      FROM bands
    ),
    pairs AS (
      SELECT DISTINCT tr.doc_id AS train_doc_id, te.doc_id AS test_doc_id
      FROM tagged tr JOIN tagged te
        ON tr.band = te.band AND tr.band_sig = te.band_sig
      WHERE NOT tr.is_test AND te.is_test
    )
    SELECT train_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_test_matches,
           MIN(test_doc_id) AS first_test_doc
    FROM pairs GROUP BY train_doc_id
    """,
)
def fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train-vs-eval decontamination (PaLM App. C / GPT-4 card
    style): TRAIN documents whose MinHash-LSH band signatures collide
    with any held-out (content-addressed ``is_test``) document —
    near-duplicate leakage the exact-trigram ``decontamination_overlap``
    cannot see. Per flagged train doc: how many distinct eval docs it
    collides with and the smallest such eval doc id (the audit handle).

    Scale shape: ONE banding build over the corpus (the same
    ``_minhash_bands`` program every dedup consumer shares — in the
    battery it IS the same build), split by the per-row bucket16 rule
    (no join to tag), then train⋈test on (band, band_sig) where the
    eval side is the tiny one — broadcast, so the corpus side never
    shuffles for the meet; here both sides ride the band-key shuffle.
    The output is per-TRAIN-doc because that is the side you drop.
    """
    return fuzzy_decontamination_from(
        _minhash_bands(tbl(spark, sf_dir, "documents"))
    )


def fuzzy_decontamination_from(bands: DataFrame) -> DataFrame:
    """The cross-split band meet over an ALREADY-BUILT bands table —
    the sharing seam for battery use (lexical_dedup_battery feeds the
    one banding build it already checkpoints).

    Join shape — the _minhash_pairs_from self-join pattern rather
    than a hand-placed F.broadcast: both sides are the SAME bands
    frame with the split predicates in the ON clause. A manual
    broadcast would force the eval-side subtree through its own
    BroadcastExchange, re-deriving the banding lineage when the frame
    is not already materialized; the self-join keeps one lineage and
    lets AQE convert the post-shuffle join to broadcast-hash from
    runtime stats when the eval side proves tiny. Measured over the
    battery's materialized bands frame the whole leg costs ~0.5s at
    sf0.1 — additive, as the seam intends."""
    tagged = bands.withColumn(
        "is_test", _bucket16(F.col("doc_id")) < TEST_BUCKET_CUTOFF
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & ~F.col("a.is_test")
            & F.col("b.is_test"),
        )
        .select(
            F.col("a.doc_id").alias("train_doc_id"),
            F.col("b.doc_id").alias("test_doc_id"),
        )
        .distinct()
    )
    return pairs.groupBy("train_doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_matches"),
        F.min("test_doc_id").alias("first_test_doc"),
    )


# ---------------------------------------------------------------------------
# Round 10: packing efficiency eval.
# ---------------------------------------------------------------------------


@register(
    "packing_efficiency_eval",
    # Embeds the packing oracle verbatim (battery construction rule):
    # the eval can never drift from the packer it measures.
    oracle=f"""
    WITH packed AS MATERIALIZED ({{packing}}),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_bins,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(total_tokens) AS BIGINT) AS total_tokens,
             CAST(MAX(total_tokens) AS BIGINT) AS max_bin_tokens
      FROM packed GROUP BY source
    )
    SELECT source, n_bins, n_docs, total_tokens, max_bin_tokens,
           CAST(n_bins * {PACK_BUDGET} AS BIGINT) AS capacity_tokens,
           CAST({{fill}} AS BIGINT) AS fill_micro,
           CAST((total_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET} AS BIGINT)
             AS min_bins
    FROM per_source
    """.format(
        packing="__PACKING_ORACLE__",
        fill=micro_sql("total_tokens", f"n_bins * {PACK_BUDGET}"),
    ).replace("__PACKING_ORACLE__", REGISTRY["sequence_packing"].oracle),
)
def packing_efficiency_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-level efficiency of the concat-and-chop packer: per
    source, the realized bin count vs the ideal split-anywhere count
    (min_bins = ceil(tokens/budget) — a comparison point, not a
    bound: the chop rule spills a document past the budget of the bin
    its first token lands in, so realized bins can be fatter AND
    fewer than the ideal, or thinner and more numerous), the fill
    ratio in micro-units (can exceed 1e6 for the same reason), and
    the fattest bin. This is the report that says whether the packing
    order is wasting context windows — the go/no-go before burning
    compute on a shard.

    Scale shape: one aggregate over the packing plan's (source, bin)
    rows — source grain, broadcast class; the packing plan itself is
    the already-audited window+rollup. Rides sequence_packing's
    lineage as a battery leg at ~zero marginal cost.
    """
    return packing_efficiency_from(sequence_packing(spark, sf_dir))


def packing_efficiency_from(packed: DataFrame) -> DataFrame:
    """The eval over an ALREADY-BUILT packing plan — the sharing seam
    for battery use (one packing window feeds both legs)."""
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.max("total_tokens").cast("long").alias("max_bin_tokens"),
    ).selectExpr(
        "source",
        "n_bins",
        "n_docs",
        "total_tokens",
        "max_bin_tokens",
        f"CAST(n_bins * {PACK_BUDGET} AS BIGINT) AS capacity_tokens",
        f"CAST({micro_spark('total_tokens', f'n_bins * {PACK_BUDGET}')} AS BIGINT)"
        " AS fill_micro",
        f"CAST((total_tokens + {PACK_BUDGET} - 1) div {PACK_BUDGET} AS BIGINT)"
        " AS min_bins",
    )
