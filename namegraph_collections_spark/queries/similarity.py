"""Similarity search over the `embeddings` table (driver brief):
brute-force cosine top-k as the correctness baseline, plus an
LSH-bucketed variant as the scale path.

Determinism: dot products are left-to-right double folds on both
engines (Spark ``aggregate`` over ``zip_with``; DuckDB ``list_sum``
over ``list_transform``) so the oracle hashes identically; scores are
rounded to 6 decimals and ranking ties broken on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.det_round import round6_det, round6_det_sql
from namegraph_collections_spark.queries.registry import register, spread, tbl

N_QUERY_VECS = 8
TOP_K = 5
DIM = 64


def _dot(a, b):
    """Σ aᵢ·bᵢ as an ordered left-to-right double sum (JVM-side, no UDF).

    Expressed as a ``zip_with`` product + ``aggregate`` fold, NOT an
    unrolled chain of ``element_at`` products: measured head-to-head
    (245k pairs, 64 dims, local[32]) the fold runs ~2.3× faster — the
    unrolled form is a 128-leaf expression tree that blows past
    codegen's method-size limits and degrades to interpreted
    per-term evaluation with null checks, while the fold is one tight
    loop over the array pair. The fold's addition order (0.0, then
    each term ascending) matches the oracle's ``list_sum`` of an
    index-ordered ``list_transform``, so float results — and the
    driver's value hash — are unchanged.

    INVARIANT: both arrays must be exactly ``DIM`` elements wide — the
    fold sums the whole array while the SQL oracles sum exactly
    ``range(1, DIM+1)`` terms, so a longer array would silently
    diverge. A per-row ``slice`` guard measured ~30% overhead on the
    pair stage, so the invariant is pinned by a fixture test
    (tests/test_properties.py::test_embedding_arrays_are_dim_wide)
    instead of paid for on every row.
    """
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_DOT_SQL = (
    "list_sum(list_transform(range(1, {dim} + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


@register(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < {N_QUERY_VECS}),
    c AS (SELECT vec_id AS c_id, embedding AS c_emb, label AS c_label FROM embeddings),
    scored AS (
      SELECT q_id, c_id, c_label,
        {round6_det_sql(
            f"{_DOT_SQL.format(dim=DIM, a='q_emb', b='c_emb')}"
            f" / (sqrt({_DOT_SQL.format(dim=DIM, a='q_emb', b='q_emb')})"
            f" * sqrt({_DOT_SQL.format(dim=DIM, a='c_emb', b='c_emb')}))"
        )} AS cosine
      FROM q CROSS JOIN c
      WHERE q_id <> c_id
    )
    SELECT q_id, c_id, c_label, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline (driver brief).

    Query set broadcast against the candidate corpus; score is a pure
    column expression (zip_with + aggregate — whole-stage codegen, no
    Python). At 100 TB the corpus side stays partitioned and only the
    per-partition top-k survives the final shuffle (window over
    rounded score with id tiebreak).
    """
    emb = tbl(spark, sf_dir, "embeddings")
    # norms precomputed per side (n + k values), not per pair (n·k)
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    c = spread(emb, "vec_id").select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("label").alias("c_label"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            "c_label",
            round6_det(
                _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)


N_PROBE = 2
KMEANS_K = 8  # inverted lists
#: Mean quantization step: component sums are FLOOR(v * 2^20) integers,
#: summed exactly as BIGINT, divided once in double. Power of two → the
#: scale is exact for every float32; floor-to-integer is deterministic
#: on both engines, where float→DECIMAL casts and double ROUND both
#: turned out to disagree at the last digit (engine-specific decimal
#: expansion / shortest-repr rounding) and a single flipped digit
#: cascades through Lloyd iterations into different clusterings.
QUANT = 1 << 20
KMEANS_ROUNDS = 2  # fixed Lloyd refinements (deterministic, oracle-mirrored)


def _centroid_sql(assign_cte: str, name: str) -> str:
    """SQL: per-cluster per-dimension decimal means -> centroid arrays."""
    return f"""{name} AS (
      SELECT cluster,
             list(CAST(s AS DOUBLE) / (n * {QUANT}) ORDER BY pos) AS centroid
      FROM (
        SELECT cluster, CAST(u.i AS INT) AS pos,
               SUM(CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * {QUANT}) AS BIGINT)) AS s,
               COUNT(*) AS n
        FROM {assign_cte}, (SELECT unnest(range(1, {DIM} + 1)) AS i) u
        GROUP BY cluster, CAST(u.i AS INT)
      ) GROUP BY cluster
    )"""


def _assign_sql(cent_cte: str, name: str) -> str:
    """SQL: re-assign every vector to its best-dot centroid."""
    return f"""{name} AS (
      SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 {round6_det_sql(_DOT_SQL.format(dim=DIM, a="e.embedding", b="c.centroid"))} DESC,
                 c.cluster ASC) AS rn
        FROM embeddings e CROSS JOIN {cent_cte} c
      ) WHERE rn = 1
    )"""


#: The deterministic k-means CTE prefix (init assignment a0 → two
#: Lloyd rounds → final assignment ``a2`` + final centroids ``c2``),
#: shared by the ivf_topk oracle and semantic_dedup's oracle so both
#: engines — and both QUERIES — agree on one clustering.
KMEANS_CTES_SQL = f"""a0 AS (SELECT vec_id, embedding, CAST(vec_id % {KMEANS_K} AS INT) AS cluster
                FROM embeddings),
    {_centroid_sql("a0", "c1")},
    {_assign_sql("c1", "a1")},
    {_centroid_sql("a1", "c2")},
    {_assign_sql("c2", "a2")}"""


def kmeans_centroids_of(assigned: DataFrame) -> DataFrame:
    """Per-cluster per-dimension decimal-exact means → centroid arrays.

    ONE explode+groupBy whose shuffle carries k × DIM partial sums
    (map-side combined — never vectors); see ivf_topk's docstring for
    the quantization determinism argument.

    Measured and kept (optimization round 13): a fused single
    aggregation — groupBy(cluster) with DIM=64 independent
    SUM(FLOOR(element_at(...)×QUANT)) columns, no explode, one
    exchange instead of two — is bit-identical and looks strictly
    better on paper, but 65 aggregate buffers push the generated
    HashAggregate past whole-stage codegen's method-size limit and the
    WHOLE stage (including the Lloyd-round argmax feeding it) falls
    back to interpreted expression evaluation: full-query ablation
    read 2.02s → 3.97s on ivf_topk and 2.56s → 4.39s on
    semdedup_keep_list (3 reps, same session). The PQ twin keeps the
    fused shape — its 8+1 buffers codegen fine (similarity_pq). The
    two-step explode shape's extra exchange carries only k×DIM partial
    rows, which is grain-bounded at any corpus size.
    """
    dims = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "cluster", "pos0",
        F.floor(F.col("v").cast("double") * F.lit(float(QUANT))).alias("val"),
    )
    return (
        dims.groupBy("cluster", "pos0")
        .agg(
            (F.sum("val").cast("double") / (F.count(F.lit(1)) * F.lit(QUANT))).alias("m")
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos0", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def packed_centroids(cents: DataFrame) -> DataFrame:
    """The k-row centroid table as ONE row carrying an
    array<struct<cluster:int, centroid>> — the broadcast shape the
    map-only assignment below consumes. collect_list order is
    plan-dependent, which is safe everywhere this is used: consumers
    reduce over the array with order-independent array_max/array_min
    (total order on (score, id)) or re-sort it explicitly."""
    return cents.groupBy().agg(
        F.collect_list(
            F.struct(F.col("cluster").cast("int").alias("cluster"), F.col("centroid"))
        ).alias("_cs")
    )


def kmeans_assign_to(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Re-assign every vector to its best-dot centroid — MAP-ONLY
    (optimization round 13, guide §2.4 remove shuffles outright).

    The previous shape crossJoined every vector with the broadcast
    k-row centroid table (k× corpus rows) and picked rn=1 with a
    row_number window partitioned by vec_id — i.e. every Lloyd round
    shuffled and sorted the ENTIRE corpus by vec_id just to take a
    per-vector argmax over k candidate rows. The argmax needs no
    shuffle at all: broadcast the centroids as ONE packed array row,
    score all k in a projection, and take ``array_max`` over
    (d, -cluster) structs. Struct comparison is lexicographic, so
    max(d, -cluster) == the window's (d DESC, cluster ASC) rn=1 row —
    identical tie-breaks, identical doubles (same round6_det(_dot)
    per (vector, centroid) pair), zero exchanges, zero sorts. At 100 TB
    this removes KMEANS_ROUNDS full-corpus shuffles from every k-means
    build."""
    packed = packed_centroids(cents)
    scored = F.transform(
        F.col("_cs"),
        lambda c: F.struct(
            round6_det(_dot(F.col("embedding"), c["centroid"])).alias("d"),
            (-c["cluster"]).alias("negc"),
        ),
    )
    best = (-F.array_max(scored)["negc"]).cast("int")
    # explode(array(x)) = a one-element Generate: a deliberate
    # evaluate-ONCE barrier. Without it, CollapseProject/pushdown
    # inline the k-dot argmax into every downstream reference of
    # ``cluster`` — measured on ivf_topk: the expression landed in the
    # probe join's condition (isnotnull), its key AND its output
    # projection, tripling the per-row dot work (plan dump showed 3
    # array_max sites; 2.0s → 4.8s). Project collapse and predicate
    # pushdown cannot cross a generator's output attribute, so every
    # consumer reads the materialized column.
    return (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(packed))
        .select("vec_id", "embedding", F.explode(F.array(best)).alias("cluster"))
    )


def kmeans_lists(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic k-means (init ``vec_id % k``, KMEANS_ROUNDS Lloyd
    rounds) → (final assignment, final centroids). The SQL twin is
    :data:`KMEANS_CTES_SQL` (assignment CTE ``a2``). Callers decide
    caching: the centroid table is tiny (k rows) and is re-derived per
    reference unless persisted."""
    assigned = emb.select(
        "vec_id", "embedding", (F.col("vec_id") % KMEANS_K).cast("int").alias("cluster")
    )
    cents = None
    for _ in range(KMEANS_ROUNDS):
        # Eager checkpoint of the k-row centroid table per round
        # (optimization round 13). With the map-only assignment there
        # is no exchange in the corpus path any more, and an exchange
        # is what used to TRUNCATE each stage's serialized plan — the
        # un-cut round-over-round lineage (nested argmax lambdas × 64
        # per-dimension aggregates) pushed task binaries past 1 MiB
        # and the per-task deserialize+GC cost above the removed
        # shuffles' cost. Materializing k × (DIM+1) values per round
        # is O(k·DIM) at ANY corpus size — the cheapest possible
        # lineage cut, in the exact place the plan would otherwise
        # double per round. This also retires the downstream persist()
        # of the final centroids (consumers now read a tiny
        # materialized RDD, nothing is left cached behind in a
        # long-lived session).
        cents = kmeans_centroids_of(assigned).localCheckpoint(eager=True)
        assigned = kmeans_assign_to(emb, cents)
    return assigned, cents


@register(
    "ivf_topk",
    oracle=f"""
    WITH {KMEANS_CTES_SQL},
    q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {N_QUERY_VECS}),
    probes AS (
      SELECT q_id, q_emb, cluster FROM (
        SELECT q.q_id, q.q_emb, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
                 {round6_det_sql(_DOT_SQL.format(dim=DIM, a="q.q_emb", b="c.centroid"))} DESC,
                 c.cluster ASC) AS prnk
        FROM q CROSS JOIN c2 c
      ) WHERE prnk <= {N_PROBE}
    ),
    scored AS (
      SELECT p.q_id, e.vec_id AS c_id, e.cluster AS c_cluster,
        {round6_det_sql(
            f"{_DOT_SQL.format(dim=DIM, a='p.q_emb', b='e.embedding')}"
            f" / (sqrt({_DOT_SQL.format(dim=DIM, a='p.q_emb', b='p.q_emb')})"
            f" * sqrt({_DOT_SQL.format(dim=DIM, a='e.embedding', b='e.embedding')}))"
        )} AS cosine
      FROM probes p JOIN a2 e ON e.cluster = p.cluster
      WHERE e.vec_id <> p.q_id
    )
    SELECT q_id, c_id, c_cluster, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with LEARNED inverted lists: deterministic k-means
    ({KMEANS_ROUNDS} fixed Lloyd rounds, k={KMEANS_K}) builds the
    centroids, queries probe the {N_PROBE} nearest lists, exact cosine
    runs only within probed lists (driver brief's "IVF variant as the
    scale path").

    k-means as iterative DataFrame ops: init assignment is
    vec_id % k (deterministic seeding); each round is (a) per-cluster
    per-dimension means (exact decimal sums, then one IEEE double
    division — identical bit-for-bit on both engines, where a
    round-to-6 would diverge on half-way cases) via ONE
    explode+groupBy whose shuffle
    carries k x {DIM} partial sums (map-side combined — never vectors),
    then (b) re-assignment via a broadcast cross join of the k x {DIM}
    centroid table with a max-dot window over k rows per vector. Dots
    are rounded to 6 before comparison with cluster-id tiebreaks, so
    both engines converge to the SAME clustering and the value hash
    pins the whole training loop, not just the final search. At scale
    the corpus is partitioned BY list, each query touches
    {N_PROBE}/{KMEANS_K} of the data, and every centroid table
    broadcasts.
    """
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    assigned, cents = kmeans_lists(emb)
    return ivf_topk_from(emb, assigned, cents)


def ivf_topk_from(emb: DataFrame, assigned: DataFrame, cents: DataFrame) -> DataFrame:
    """IVF search over an ALREADY-BUILT codebook — the sharing seam
    for composites that reuse one k-means build across several
    consumers (similarity_battery feeds ivf search AND the SemDeDup
    leg from one `kmeans_lists` call, the `recall_eval_from`
    precedent)."""
    # probes search the LAST ROUND's centroids — the ones the final
    # assignment was built against (tiny table, broadcast below). No
    # persist() any more (round 13): every caller hands in the k-row
    # table kmeans_lists already eager-checkpointed, so both
    # references below read materialized RDD blocks — the sharing the
    # persist used to provide, without leaving a CacheManager entry
    # behind in a long-lived session (r12 verdict's unpersist-hygiene
    # item: SQL cache entries are NOT ContextCleaner-collected;
    # checkpoint RDDs are, once the plan is GC'd).
    final_cents = cents
    lists = assigned

    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # top-N_PROBE lists per query, map-only (round 13, the
    # kmeans_assign_to rationale): score the packed centroid array in
    # a projection, array_sort asc on (d, negc) structs + reverse ==
    # the old window's (d DESC, cluster ASC) order — prnk<=N_PROBE
    # becomes slice(...N_PROBE), identical probe sets and tie-breaks,
    # no q-grain exchange/sort.
    probe_scored = F.transform(
        F.col("_cs"),
        lambda c: F.struct(
            round6_det(_dot(F.col("q_emb"), c["centroid"])).alias("d"),
            (-c["cluster"]).alias("negc"),
        ),
    )
    probes = (
        q.crossJoin(F.broadcast(packed_centroids(final_cents)))
        .select(
            "q_id",
            "q_emb",
            F.explode(
                F.slice(F.reverse(F.array_sort(probe_scored)), 1, N_PROBE)
            ).alias("_p"),
        )
        .select("q_id", "q_emb", (-F.col("_p.negc")).cast("int").alias("cluster"))
    )
    cand = lists.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "cluster"
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.sqrt(_dot(F.col("q_emb"), F.col("q_emb"))) * F.sqrt(_dot(F.col("c_emb"), F.col("c_emb")))
    )
    scored = (
        cand.join(F.broadcast(probes), "cluster")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            F.col("cluster").alias("c_cluster"),
            round6_det(cos).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "c_id", "c_cluster", "cosine", "rnk")
    )


@register(
    "lsh_bucket_neighbors",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, label,
        (CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
         + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
         + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    )
    SELECT bucket, COUNT(*) AS n_vecs,
           array_to_string(list_sort(list(DISTINCT label)), ',') AS labels
    FROM sig GROUP BY bucket
    """,
)
def lsh_bucket_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-style LSH bucketing (the ANN scale path).

    Sign bits of fixed coordinates form the bucket key (a deterministic
    stand-in for sampled hyperplanes, keeping the oracle exact); at
    scale, candidate search joins query signatures to bucket-local
    candidates instead of the full corpus — the IVF/LSH pruning shape.
    """
    emb = tbl(spark, sf_dir, "embeddings")
    bit = lambda i, v: F.when(F.element_at("embedding", i) >= 0, F.lit(v)).otherwise(F.lit(0))  # noqa: E731
    sig = emb.select(
        "vec_id",
        "label",
        (bit(1, 4) + bit(2, 2) + bit(3, 1)).alias("bucket"),
    )
    return sig.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.array_join(F.array_sort(F.collect_set("label")), ",").alias("labels"),
    )

