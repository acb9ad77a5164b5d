"""Driver-hashed read paths for the keyed-state MAINTAINERS — the
round-12 closure of the registry-invisible class (round-11 verdict
ask #2): the incremental maintainers (operators/ivf_maintain.py,
vocab_maintain.py, diversity_maintain.py, nbq_maintain.py,
cms_maintain.py, hist_maintain.py) were verified only by pytest
batch-split parity; their read paths (refreshed centroids, list-
imbalance monitor, vocabulary table, NB model/prior, sketch probes,
quantiles) sat outside the driver's hash fence.

``maintainer_state_battery`` puts every read path inside it: each leg
derives a maintainer's read-path output from a DETERMINISTICALLY
FOLDED state fixture — the source table split into three batches by a
fixed key rule (``key % 3``), each batch's contribution computed by
the maintainer's OWN ``*_state_for`` program, the contributions merged
by the maintainer's OWN monoid (sum-by-key; min for the vocabulary's
``first_doc``). Because every maintained state is an exact monoid
fold, the folded state equals the one-shot state over the union — so
the DuckDB oracles express the one-shot derivation, and the driver
row itself witnesses fold-of-3 == one-shot for every maintainer, on
top of hashing the read-path outputs.

Hash surface: BIGINT/VARCHAR only (the registry convention) — the
centroid leg emits the exact rational (s, n_vecs) rather than the
read path's derived double, and the histogram leg emits the bucket
index (est_lo/est_hi are bucket * bin-step by construction).

Scale shape: each leg's state build is the maintainer's own bounded-
state program (dictionary-/grid-/bucket-grain shuffles, never corpus-
grain joins); reads operate on broadcast-class state frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import micro_sql

# The operators/*_maintain modules import back into queries/ (they
# share the feature programs), so importing them at module level from
# INSIDE the queries package would make any direct
# ``import operators.x_maintain`` re-enter a partially-initialized
# module. They are imported lazily in the battery body instead.
from namegraph_collections_spark.queries.corpus_stats import _QVEC_SQL
from namegraph_collections_spark.queries.percentiles import HIST_MAX_B
from namegraph_collections_spark.queries.quality_classifier import (
    _NBQ_FIT_CTES,
)
from namegraph_collections_spark.queries.registry import (
    REGISTRY,
    build_parallel,
    ranked_topk,
    register,
    spread,
    tbl,
)
from namegraph_collections_spark.queries.rollups import (
    CMS_TOP,
    cms_bigrams_of,
    cms_estimates_from,
)
from namegraph_collections_spark.queries.similarity import DIM, KMEANS_K

#: Number of deterministic batches the state fixture folds. Three is
#: the smallest count that exercises merge-onto-merged (not just
#: initial-merge), matching the pytest parity suites.
FOLD_BATCHES = 3

#: Head size of the vocabulary read (vocab_head_from_state's default).
VOCAB_HEAD_K = 25


def folded_state(
    src: DataFrame,
    batch_key: str,
    contrib,
    key_cols: list[str],
    merge_cols: dict[str, str],
) -> DataFrame:
    """The deterministic state fixture: split ``src`` into
    ``FOLD_BATCHES`` batches by ``batch_key % FOLD_BATCHES``, compute
    each batch's contribution with the maintainer's own ``*_state_for``
    program, and merge the contributions with the maintainer's own
    monoid (``sum`` / ``min`` per column — exactly what
    ``maintain_additive_state`` / ``maintain_keyed_state`` apply
    snapshot-to-snapshot, minus the filesystem). Pure plan — no
    side effects, so it is registry-safe.

    Single-pass shape (optimization round 12, guide §2.3/§2.4): the
    original fixture built each batch as ``contrib(src.filter(key %
    {FOLD_BATCHES} == i))`` — {FOLD_BATCHES} scans of the source and
    {FOLD_BATCHES} feature-extraction pipelines per maintainer, i.e.
    {FOLD_BATCHES} corpus passes at cluster scale. Because the
    batches partition the rows, tagging every row with its batch id
    and grouping each ``*_state_for`` aggregation by (state keys,
    tag) yields EXACTLY the same per-batch contribution rows in ONE
    scan — the ``extra`` parameter every maintainer's state program
    now takes. The merge is the unchanged monoid groupBy, so the
    driver row still witnesses fold-of-{FOLD_BATCHES} == one-shot
    (equality with the legacy 3-filter shape is pinned by
    tests/test_maintainer_reads.py)."""
    tagged = src.withColumn(
        "_fold_b", (F.col(batch_key) % FOLD_BATCHES).cast("int")
    )
    per_batch = contrib(tagged, extra="_fold_b")
    aggs = [
        (F.sum(c) if how == "sum" else F.min(c)).cast("long").alias(c)
        for c, how in merge_cols.items()
    ]
    return per_batch.groupBy(*[F.col(c) for c in key_cols]).agg(*aggs)


def _NULL_L():
    return F.lit(None).cast("long")


def _NULL_S():
    return F.lit(None).cast("string")


def _oracle(name: str) -> str:
    return REGISTRY[name].oracle  # type: ignore[return-value]


#: CTE names are prefixed (ivf_/v) to never collide with the CTE
#: names inside the embedded component oracles — DuckDB resolves a
#: nested subquery's CTE references against the OUTER WITH when the
#: names clash, which mis-binds the embedded diversity oracle's ``q``.
_IVF_ORACLE_CTES = f"""ivf_q AS MATERIALIZED (
      SELECT CAST(vec_id % {KMEANS_K} AS BIGINT) AS cluster,
             {_QVEC_SQL} AS qv
      FROM embeddings
    ),
    ivf_i AS (SELECT unnest(range(1, {DIM} + 1)) AS i),
    ivf_dims AS MATERIALIZED (
      SELECT cluster, CAST(i - 1 AS BIGINT) AS dim,
             CAST(SUM(qv[i]) AS BIGINT) AS s
      FROM ivf_q CROSS JOIN ivf_i GROUP BY cluster, i
    ),
    ivf_sizes AS MATERIALIZED (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM ivf_q GROUP BY cluster
    )"""

_VOCAB_ORACLE_CTES = """vtoks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    vst AS MATERIALIZED (
      SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc,
             CAST(COUNT(*) AS BIGINT) AS occ
      FROM vtoks GROUP BY tok
    )"""


@register(
    "maintainer_state_battery",
    oracle=f"""
    WITH {_IVF_ORACLE_CTES},
    {_VOCAB_ORACLE_CTES},
    {_NBQ_FIT_CTES}
    SELECT 'ivf_centroid' AS op, d.cluster AS k1, d.dim AS k2,
           CAST(NULL AS VARCHAR) AS ks, d.s AS v1, z.n_vecs AS v2,
           CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4,
           CAST(NULL AS BIGINT) AS v5
    FROM ivf_dims d JOIN ivf_sizes z USING (cluster)
    UNION ALL
    SELECT 'ivf_balance', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), n_lists, n_vecs, max_list, min_list,
           CAST({micro_sql("max_list * n_lists", "n_vecs")} AS BIGINT)
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_lists,
             CAST(SUM(n_vecs) AS BIGINT) AS n_vecs,
             CAST(MAX(n_vecs) AS BIGINT) AS max_list,
             CAST(MIN(n_vecs) AS BIGINT) AS min_list
      FROM ivf_sizes
    )
    UNION ALL
    SELECT 'vocab_stats', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), n_types, n_tokens, hapax_types,
           CAST({micro_sql("n_types", "n_tokens")} AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(occ) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax_types
      FROM vst
    )
    UNION ALL
    SELECT 'vocab_head', CAST(rnk AS BIGINT), CAST(NULL AS BIGINT), tok,
           occ, first_doc, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM (
      SELECT tok, first_doc, occ,
             ROW_NUMBER() OVER (ORDER BY occ DESC, tok ASC) AS rnk
      FROM vst
    ) WHERE rnk <= {VOCAB_HEAD_K}
    UNION ALL
    SELECT 'diversity', label, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), n_vecs, self_sq, pair_num, pair_den,
           CAST(NULL AS BIGINT)
    FROM ({_oracle("embedding_diversity")})
    UNION ALL
    SELECT 'nbq_w', bucket, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           w_micro, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM w
    UNION ALL
    SELECT 'nbq_prior', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), prior_micro, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM prior
    UNION ALL
    SELECT 'hist', CAST(bucket AS BIGINT), CAST(NULL AS BIGINT), quantile,
           n_rows, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM ({_oracle("histogram_quantiles")})
    UNION ALL
    SELECT 'cms_probe', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), token,
           cms_estimate, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM ({_oracle("cms_heavy_hitters")})
    """,
)
def maintainer_state_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every maintainer's read path, derived from a 3-batch folded
    state fixture, in one tagged result (see module docstring). The
    oracles are the ONE-SHOT derivations (diversity and histogram
    embed the registered component oracles VERBATIM; the NB legs embed
    the scores oracle's fit CTEs verbatim), so the driver row hashes
    both the read-path outputs and the fold == one-shot identity."""
    from namegraph_collections_spark.operators.cms_maintain import (
        cms_state_for,
    )
    from namegraph_collections_spark.operators.diversity_maintain import (
        diversity_from_state,
        diversity_state_for,
    )
    from namegraph_collections_spark.operators.hist_maintain import (
        hist_quantiles_from_state,
        hist_state_for,
    )
    from namegraph_collections_spark.operators.ivf_maintain import (
        centroids_from_state,
        ivf_state_for,
        list_balance_from_state,
    )
    from namegraph_collections_spark.operators.nbq_maintain import (
        nbq_model_from_state,
        nbq_state_for,
    )
    from namegraph_collections_spark.operators.vocab_maintain import (
        vocab_head_from_state,
        vocab_state_for,
        vocab_stats_from_state,
    )

    # persist the spread sources: emb feeds two maintainers' fixtures
    # and docs four (vocab/nbq/cms states + the cms probe's exact
    # candidate scan) — one scan+exchange each instead of one per
    # consumer. Round 13: both are UNPERSISTED at function exit (see
    # below) — every consumer is eagerly materialized inside the
    # build, so nothing stays in the CacheManager after the query
    # (the r12 verdict's unpersist-hygiene item).
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id").persist()
    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id").persist()
    li = tbl(spark, sf_dir, "lineitem")

    # Round 13 (guide §2.6): the six folded-state fixtures and the CMS
    # probe's exact candidate list are INDEPENDENT given emb/docs/li —
    # materialize all seven concurrently from the §2.6 thread pool as
    # eager localCheckpoints instead of lazily persisting each one.
    # Each is grain-bounded state (k×DIM dims, vocab types, NB
    # buckets, CMS grid, histogram buckets, CMS_TOP candidates), so
    # the checkpoints are O(state) at ANY corpus size; the read paths
    # below consume materialized RDDs, which is what lets the
    # corpus-sized emb/docs caches be RELEASED at exit instead of
    # outliving the query. (The r12 persist-not-lazy-checkpoint note
    # concerned SERIAL lazy checkpoints paying ~1s of driver planning
    # each; threading the seven eager builds overlaps that planning
    # with executor work — paired A/B in OPTIMIZATION_r13.md.)
    (
        ivf_state,
        vocab_state,
        div_state,
        nbq_state,
        hist_state_ck,
        cms_state,
        cand,
    ) = build_parallel(
        spark,
        lambda: folded_state(
            emb, "vec_id", ivf_state_for, ["cluster", "dim"], {"s": "sum", "n": "sum"}
        ).localCheckpoint(eager=True),
        lambda: folded_state(
            docs, "doc_id", vocab_state_for, ["tok"], {"first_doc": "min", "occ": "sum"}
        ).localCheckpoint(eager=True),
        lambda: folded_state(
            emb, "vec_id", diversity_state_for, ["label", "dim"],
            {"s": "sum", "self2": "sum", "n": "sum"},
        ).localCheckpoint(eager=True),
        lambda: folded_state(
            docs, "doc_id", nbq_state_for, ["bucket"], {"cp": "sum", "cn": "sum"}
        ).localCheckpoint(eager=True),
        lambda: folded_state(
            li, "l_orderkey", hist_state_for, ["bucket"], {"c": "sum"}
        ).localCheckpoint(eager=True),
        lambda: folded_state(
            docs, "doc_id", cms_state_for, ["d", "bucket"], {"c": "sum"}
        ).localCheckpoint(eager=True),
        lambda: ranked_topk(
            cms_bigrams_of(docs).groupBy("token").agg(F.count(F.lit(1)).alias("n_exact")),
            CMS_TOP,
            F.col("n_exact").desc(),
            F.col("token").asc(),
        ).localCheckpoint(eager=True),
    )
    # Every read below consumes materialized state; the corpus-sized
    # spread caches have no remaining consumer in the returned plan.
    emb.unpersist()
    docs.unpersist()

    cent = centroids_from_state(ivf_state).select(
        F.lit("ivf_centroid").alias("op"),
        F.col("cluster").alias("k1"),
        F.col("dim").alias("k2"),
        _NULL_S().alias("ks"),
        # exact rational (s, n_vecs) — the read path's c_milli double
        # is s/n_vecs and stays off the hash surface by convention
        F.col("s").alias("v1"),
        F.col("n_vecs").alias("v2"),
        _NULL_L().alias("v3"),
        _NULL_L().alias("v4"),
        _NULL_L().alias("v5"),
    )
    bal = list_balance_from_state(ivf_state).select(
        F.lit("ivf_balance").alias("op"),
        _NULL_L().alias("k1"),
        _NULL_L().alias("k2"),
        _NULL_S().alias("ks"),
        F.col("n_lists").alias("v1"),
        F.col("n_vecs").alias("v2"),
        F.col("max_list").alias("v3"),
        F.col("min_list").alias("v4"),
        F.col("imbalance_micro").alias("v5"),
    )

    vstats = vocab_stats_from_state(vocab_state).select(
        F.lit("vocab_stats").alias("op"),
        _NULL_L().alias("k1"),
        _NULL_L().alias("k2"),
        _NULL_S().alias("ks"),
        F.col("n_types").alias("v1"),
        F.col("n_tokens").alias("v2"),
        F.col("hapax_types").alias("v3"),
        F.col("ttr_micro").alias("v4"),
        _NULL_L().alias("v5"),
    )
    vhead = vocab_head_from_state(vocab_state, VOCAB_HEAD_K).select(
        F.lit("vocab_head").alias("op"),
        F.col("rnk").cast("long").alias("k1"),
        _NULL_L().alias("k2"),
        F.col("tok").alias("ks"),
        F.col("occ").alias("v1"),
        F.col("first_doc").alias("v2"),
        _NULL_L().alias("v3"),
        _NULL_L().alias("v4"),
        _NULL_L().alias("v5"),
    )

    div = diversity_from_state(div_state).select(
        F.lit("diversity").alias("op"),
        F.col("label").alias("k1"),
        _NULL_L().alias("k2"),
        _NULL_S().alias("ks"),
        F.col("n_vecs").alias("v1"),
        F.col("self_sq").alias("v2"),
        F.col("pair_num").alias("v3"),
        F.col("pair_den").alias("v4"),
        _NULL_L().alias("v5"),
    )

    w, prior = nbq_model_from_state(nbq_state)
    nbq_w = w.select(
        F.lit("nbq_w").alias("op"),
        F.col("bucket").alias("k1"),
        _NULL_L().alias("k2"),
        _NULL_S().alias("ks"),
        F.col("w_micro").alias("v1"),
        _NULL_L().alias("v2"),
        _NULL_L().alias("v3"),
        _NULL_L().alias("v4"),
        _NULL_L().alias("v5"),
    )
    nbq_p = prior.select(
        F.lit("nbq_prior").alias("op"),
        _NULL_L().alias("k1"),
        _NULL_L().alias("k2"),
        _NULL_S().alias("ks"),
        F.col("prior_micro").alias("v1"),
        _NULL_L().alias("v2"),
        _NULL_L().alias("v3"),
        _NULL_L().alias("v4"),
        _NULL_L().alias("v5"),
    )

    hist_state = hist_state_ck.limit(HIST_MAX_B)
    # ^ no-op by construction; states the bound for the cumsum window
    # below (the hist_buckets_of idiom)
    hq = hist_quantiles_from_state(hist_state).select(
        F.lit("hist").alias("op"),
        F.col("bucket").alias("k1"),
        _NULL_L().alias("k2"),
        F.col("quantile").alias("ks"),
        F.col("n_rows").alias("v1"),
        _NULL_L().alias("v2"),
        _NULL_L().alias("v3"),
        _NULL_L().alias("v4"),
        _NULL_L().alias("v5"),
    )

    # the probe set (``cand``, checkpointed above): the exact
    # top-CMS_TOP bigrams, built the same way cms_heavy_hitters builds
    # its candidate list (one occurrence scan)
    cms = cms_estimates_from(cms_state, cand.select("token")).select(
        F.lit("cms_probe").alias("op"),
        _NULL_L().alias("k1"),
        _NULL_L().alias("k2"),
        F.col("token").alias("ks"),
        F.col("cms_estimate").alias("v1"),
        _NULL_L().alias("v2"),
        _NULL_L().alias("v3"),
        _NULL_L().alias("v4"),
        _NULL_L().alias("v5"),
    )

    return (
        cent.unionByName(bal)
        .unionByName(vstats)
        .unionByName(vhead)
        .unionByName(div)
        .unionByName(nbq_w)
        .unionByName(nbq_p)
        .unionByName(hq)
        .unionByName(cms)
    )
