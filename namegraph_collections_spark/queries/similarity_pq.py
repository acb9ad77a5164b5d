"""Product-quantization ANN (registry entry 56+, behind the driver
window — locally parity-checked like every post-50 entry).

Lives in its own module, NOT similarity.py, because registration order
is load-bearing: similarity.py registers inside the driver's first-50
correctness window, and adding an entry there would rotate a
driver-checked row out of it (tests/test_registry_window.py pins the
window exactly for this reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.det_round import round6_det, round6_det_sql
from namegraph_collections_spark.queries.registry import register, spread, tbl
from namegraph_collections_spark.queries.similarity import (
    DIM,
    N_QUERY_VECS,
    QUANT,
    TOP_K,
    _DOT_SQL,
)

PQ_M = 8          # subspaces (64 dims -> 8 sub-vectors of 8)
PQ_SUBDIM = DIM // PQ_M
PQ_K = 16         # codewords per subspace -> 1 code = 4 bits of id space
PQ_ROUNDS = 2     # fixed Lloyd refinements, same regime as ivf_topk


def _sub_l2_int(a, b):
    """FLOOR(QUANT * Σ (aᵢ-bᵢ)²) as BIGINT — squared L2 in exact
    integer micro-units. Integer distances make every downstream
    comparison AND the M-way ADC sum order-independent, sidestepping
    float-sum non-associativity across engines (the same reasoning as
    ivf_topk's QUANT trick, applied to distances instead of means)."""
    diff2 = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
    )
    return F.floor(
        F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v) * F.lit(float(QUANT))
    ).cast("long")


_SUB_L2_INT_SQL = (
    "CAST(FLOOR(list_sum(list_transform(range(1, {sd} + 1), "
    "j -> (CAST({a}[j] AS DOUBLE) - CAST({b}[j] AS DOUBLE)) "
    "* (CAST({a}[j] AS DOUBLE) - CAST({b}[j] AS DOUBLE)))) * {q}) AS BIGINT)"
)


def _pq_centroid_sql(assign_cte: str, name: str) -> str:
    """SQL: per-(subspace, code) per-dimension quantized means."""
    return f"""{name} AS (
      SELECT m, code,
             list(CAST(s AS DOUBLE) / (n * {QUANT}) ORDER BY pos) AS centroid
      FROM (
        SELECT a.m, a.code, CAST(u.j AS INT) AS pos,
               SUM(CAST(FLOOR(CAST(a.subvec[u.j] AS DOUBLE) * {QUANT}) AS BIGINT)) AS s,
               COUNT(*) AS n
        FROM {assign_cte} a, (SELECT unnest(range(1, {PQ_SUBDIM} + 1)) AS j) u
        GROUP BY a.m, a.code, CAST(u.j AS INT)
      ) GROUP BY m, code
    )"""


def _pq_assign_sql(cent_cte: str, name: str) -> str:
    """SQL: re-code every sub-vector to its nearest codeword (min
    integer L2, code-id tiebreak)."""
    d = _SUB_L2_INT_SQL.format(sd=PQ_SUBDIM, a="s.subvec", b="c.centroid", q=QUANT)
    return f"""{name} AS (
      SELECT vec_id, m, subvec, code FROM (
        SELECT s.vec_id, s.m, s.subvec, c.code,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {d} ASC, c.code ASC) AS rn
        FROM sub s JOIN {cent_cte} c ON c.m = s.m
      ) WHERE rn = 1
    )"""


#: ADC shortlist size for the re-rank composition: 100 of 2000
#: candidates (5%) — measured to contain 90% of the exact cosine
#: top-5 on this corpus (tests/test_pq.py holds the floor).
PQ_SHORTLIST = 100

#: Shared CTE prefix: normalize → subspace split → 2 Lloyd rounds →
#: codes (a2) + codebooks (c2) → per-query integer distance tables →
#: ADC-scored candidates. Both PQ oracles append their own tail.
_PQ_CTES = f"""
    WITH normed AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS nemb
      FROM (
        SELECT vec_id, embedding,
               sqrt({_DOT_SQL.format(dim=DIM, a="embedding", b="embedding")}) AS nrm
        FROM embeddings
      )
    ),
    sub AS (
      SELECT vec_id, CAST(u.m AS INT) AS m,
             list_transform(range(1, {PQ_SUBDIM} + 1),
                            j -> nemb[CAST(u.m AS INT) * {PQ_SUBDIM} + j]) AS subvec
      FROM normed, (SELECT unnest(range(0, {PQ_M})) AS m) u
    ),
    a0 AS (SELECT vec_id, m, subvec, CAST(vec_id % {PQ_K} AS INT) AS code FROM sub),
    {_pq_centroid_sql("a0", "c1")},
    {_pq_assign_sql("c1", "a1")},
    {_pq_centroid_sql("a1", "c2")},
    {_pq_assign_sql("c2", "a2")},
    qsub AS (SELECT vec_id AS q_id, m, subvec FROM sub WHERE vec_id < {N_QUERY_VECS}),
    dtab AS (
      SELECT s.q_id, s.m, c.code,
             {_SUB_L2_INT_SQL.format(sd=PQ_SUBDIM, a="s.subvec", b="c.centroid", q=QUANT)} AS d_int
      FROM qsub s JOIN c2 c ON c.m = s.m
    ),
    scored AS (
      SELECT d.q_id, a.vec_id AS c_id,
             CAST(SUM(d.d_int) AS BIGINT) AS dist_int
      FROM a2 a JOIN dtab d ON d.m = a.m AND d.code = a.code
      WHERE a.vec_id <> d.q_id
      GROUP BY d.q_id, a.vec_id
    )
"""


@register(
    "pq_adc_topk",
    oracle=f"""{_PQ_CTES}
    SELECT q_id, c_id,
           CAST(dist_int AS DOUBLE) / {QUANT} AS approx_l2,
           rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY dist_int ASC, c_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the compressed-domain scale path (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011).

    Vectors are L2-NORMALIZED first, so squared L2 is 2 - 2·cosine and
    the ADC ranking approximates the cosine ranking the exact baseline
    (cosine_topk_bruteforce) produces — tests/test_pq.py measures that
    recall directly.

    Training: the {DIM}-dim unit sphere splits into {PQ_M} subspaces of
    {PQ_SUBDIM}; ONE joint k-means over the (subspace, code) relation
    learns all {PQ_M}x{PQ_K} codewords together ({PQ_ROUNDS} fixed
    Lloyd rounds, vec_id % {PQ_K} seeding, integer-L2 assignment with
    code-id tiebreaks — the ivf_topk determinism regime, so the oracle
    pins the whole training loop, not just the final ranking).
    Encoding: each vector becomes {PQ_M} 4-bit codes — 16x smaller
    than the float32 vector, and the ONLY per-vector state the search
    stage ever reads.

    Search: each query builds a {PQ_M}x{PQ_K} integer distance table
    against the codewords (tiny, broadcast); candidate distances are
    the M-way SUM of table lookups joined on (subspace, code) — raw
    vectors never move, and because the lookups are exact BIGINTs the
    sum is order-independent (float ADC sums would hash-diverge under
    shuffle reordering). At 100 TB this is the canonical memory-bound
    ANN layout: codes live with the data, codebooks and query tables
    broadcast, and an exact re-rank runs only on the tiny ADC
    shortlist — pq_rerank_topk below registers exactly that
    composition.
    """
    return pq_adc_topk_from(_adc_scored(spark, sf_dir))


def pq_adc_topk_from(scored: DataFrame) -> DataFrame:
    """The ADC top-k tail over an ALREADY-BUILT scored frame — the
    sharing seam that lets pq_battery feed both its legs from ONE
    codebook training (the `ivf_topk_from` precedent; the single
    builds its own)."""
    w = Window.partitionBy("q_id").orderBy(F.col("dist_int").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "q_id", "c_id",
            (F.col("dist_int").cast("double") / F.lit(float(QUANT))).alias("approx_l2"),
            "rnk",
        )
    )


def _adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared PQ pipeline: returns (q_id, c_id, dist_int) — every
    candidate ADC-scored against every query, self-pairs excluded."""
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    # Norm as a NAMED column before the transform (lambda bodies are
    # outside subexpression elimination — an inline norm would
    # recompute the 64-term dot once per element).
    from namegraph_collections_spark.queries.similarity import _dot

    normed = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    ).select(
        "vec_id",
        F.transform(F.col("e"), lambda x: x.cast("double") / F.col("nrm")).alias("nemb"),
    )
    sub = normed.select(
        "vec_id", "nemb",
        F.explode(F.array(*[F.lit(m) for m in range(PQ_M)])).alias("m"),
    ).select(
        "vec_id",
        F.col("m").cast("int").alias("m"),
        F.expr(f"slice(nemb, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("subvec"),
    )

    def centroids_of(assigned: DataFrame) -> DataFrame:
        # Single-aggregation shape (round 13, the
        # similarity.kmeans_centroids_of rationale): the PQ_SUBDIM
        # quantized per-dimension sums are independent column
        # aggregates of the same rows — one groupBy(m, code) computes
        # them all, replacing posexplode + two chained aggregations
        # (two exchanges) with one; SUM(FLOOR(v*QUANT)) is an exact
        # integer and the double division is token-identical, so the
        # codewords are bit-identical to the two-step form.
        sums = [
            F.sum(
                F.floor(
                    F.element_at("subvec", j + 1).cast("double") * F.lit(float(QUANT))
                )
            ).alias(f"_s{j}")
            for j in range(PQ_SUBDIM)
        ]
        per = assigned.groupBy("m", "code").agg(*sums, F.count(F.lit(1)).alias("_n"))
        return per.select(
            "m",
            "code",
            F.array(
                *[
                    F.col(f"_s{j}").cast("double") / (F.col("_n") * F.lit(QUANT))
                    for j in range(PQ_SUBDIM)
                ]
            ).alias("centroid"),
        )

    def assign_to(cents: DataFrame) -> DataFrame:
        # Map-only re-code (round 13, the similarity.kmeans_assign_to
        # rationale): the previous shape joined every sub-vector with
        # its subspace's PQ_K codewords (PQ_K× row blowup) and took
        # rn=1 with a (vec_id, m) window — a full shuffle+sort of the
        # corpus×PQ_M relation per Lloyd round. Broadcasting each
        # subspace's codewords as ONE packed array row turns the
        # argmin into a projection: array_min over (d_int, code)
        # structs == the window's (d_int ASC, code ASC) rn=1 row —
        # integer comparisons, identical tie-breaks, zero exchanges.
        packed = cents.groupBy("m").agg(
            F.collect_list(
                F.struct(F.col("code").cast("int").alias("code"), F.col("centroid"))
            ).alias("_cs")
        )
        scored = F.transform(
            F.col("_cs"),
            lambda c: F.struct(
                _sub_l2_int(F.col("subvec"), c["centroid"]).alias("d_int"),
                c["code"].alias("code"),
            ),
        )
        # explode(array(x)) = evaluate-once Generate barrier (the
        # similarity.kmeans_assign_to rationale): ``code`` feeds the
        # (m, code) ADC join downstream, and without the barrier the
        # PQ_K-way argmin would be inlined into the join's isnotnull
        # filter, key and output.
        return sub.join(F.broadcast(packed), "m").select(
            "vec_id",
            "m",
            "subvec",
            F.explode(F.array(F.array_min(scored)["code"])).alias("code"),
        )

    assigned = sub.withColumn("code", (F.col("vec_id") % PQ_K).cast("int"))
    cents = None
    for _ in range(PQ_ROUNDS):
        # Eager checkpoint of the PQ_M×PQ_K-row codebook per round —
        # the similarity.kmeans_lists rationale: with the map-only
        # re-code there is no exchange left to truncate the serialized
        # stage plans, so cut the lineage at the O(M·K·SUBDIM)-sized
        # table instead. Also retires the former final-codebook
        # persist() (consumers read the checkpointed RDD; nothing
        # stays in the CacheManager after the query).
        cents = centroids_of(assigned).localCheckpoint(eager=True)
        assigned = assign_to(cents)
    final_cents = cents
    codes = assigned.select("vec_id", "m", "code")

    qsub = sub.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), "m", "subvec"
    )
    dtab = qsub.join(F.broadcast(final_cents), "m").select(
        "q_id", "m", "code",
        _sub_l2_int(F.col("subvec"), F.col("centroid")).alias("d_int"),
    )
    return (
        codes.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("c_id"))
        .agg(F.sum("d_int").cast("long").alias("dist_int"))
    )


@register(
    "pq_rerank_topk",
    oracle=f"""{_PQ_CTES},
    shortlist AS (
      SELECT q_id, c_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY dist_int ASC, c_id ASC) AS srnk
        FROM scored
      ) WHERE srnk <= {PQ_SHORTLIST}
    ),
    exact AS (
      SELECT s.q_id, s.c_id,
             {round6_det_sql(
                 f"{_DOT_SQL.format(dim=DIM, a='qe.embedding', b='ce.embedding')}"
                 f" / (sqrt({_DOT_SQL.format(dim=DIM, a='qe.embedding', b='qe.embedding')})"
                 f" * sqrt({_DOT_SQL.format(dim=DIM, a='ce.embedding', b='ce.embedding')}))"
             )} AS cosine
      FROM shortlist s
      JOIN embeddings qe ON qe.vec_id = s.q_id
      JOIN embeddings ce ON ce.vec_id = s.c_id
    )
    SELECT q_id, c_id, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id ASC) AS rnk
      FROM exact
    ) WHERE rnk <= {TOP_K}
    """,
)
def pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production ANN composition: PQ/ADC shortlist, exact
    re-rank. ADC prunes 2000 candidates to {PQ_SHORTLIST} (5%) per
    query in the compressed domain; exact cosine then runs ONLY on the
    shortlist — measured on this corpus the result keeps 90% of the
    true top-{TOP_K} while touching 1/20th of the raw vectors
    (tests/test_pq.py pins the floor). At 100 TB the shortlist id-join
    is the only point raw vectors are read, and it is id-keyed —
    partition-prunable and broadcastable per query batch.
    """
    return pq_rerank_topk_from(spark, sf_dir, _adc_scored(spark, sf_dir))


def pq_rerank_topk_from(
    spark: SparkSession, sf_dir: str, scored: DataFrame
) -> DataFrame:
    """The shortlist + exact-rerank tail over an ALREADY-BUILT scored
    frame — the sharing seam for pq_battery (one codebook training
    feeds both legs; the single builds its own)."""
    ws = Window.partitionBy("q_id").orderBy(F.col("dist_int").asc(), F.col("c_id").asc())
    shortlist = (
        scored.withColumn("srnk", F.row_number().over(ws))
        .filter(F.col("srnk") <= PQ_SHORTLIST)
        .select("q_id", "c_id")
    )
    from namegraph_collections_spark.queries.similarity import _dot

    emb = tbl(spark, sf_dir, "embeddings")
    qe = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("q_nrm"),
    )
    ce = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("c_nrm"),
    )
    exact = (
        shortlist.join(F.broadcast(qe), "q_id")
        .join(ce, "c_id")
        .select(
            "q_id", "c_id",
            round6_det(
                _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "c_id", "cosine", "rnk")
    )
