"""Iterative graph centrality (PageRank) with an EXACT cross-engine
oracle (registry 58+, behind the driver window — locally
parity-checked).

PageRank is the canonical "iterative relational algebra" workload —
the shape Spark's whole lineage model was designed around (joins +
aggregations in a loop). The engine's other iterative operators
(closure, connected components) converge on SET semantics where
equality is exact by construction; PageRank converges on NUMERIC
state, where naive float math is NOT reproducible across engines (sum
order differs) or even across runs (partitioning differs). The fix is
the same one the training-data samplers use: do every
rank-and-divide step in scaled INTEGER arithmetic — ``rank div
out_degree`` and ``(85 * Σcontrib) div 100`` on BIGINTs — so each
iteration is a pure function of the previous one, bit-identical on
any engine, any partitioning, any run. The oracle unrolls the
iterations as chained CTEs.

Fixed-point bound: 85 × max_in_degree × SCALE must stay below 2^63;
with SCALE=10^9 that allows in-degrees to ~10^8 (a 100 TB graph's
hubs) — raise precision only with the headroom to back it.

Graph: the customer–supplier bipartite graph from orders⋈lineitem
(who trades with whom), with both arc directions materialized so
every node has out-degree ≥ 1 — no dangling-mass correction needed,
and the damping constant is applied unnormalized (rank mass is
relative, which is how rankers consume it; cf. the reference's
precomputed NameRank scores, SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, tbl

#: Rank fixed-point scale (1.0 == 10^9).
PR_SCALE = 1_000_000_000

#: Unnormalized teleport term: (1 - d) in fixed point, d = 0.85.
PR_BASE = 15 * PR_SCALE // 100

#: Number of unrolled iterations (oracle mirrors exactly).
PR_ITERS = 3


def _iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT e.dst AS node,
             {PR_BASE} + (85 * SUM(r.pr // d.deg)) // 100 AS pr
      FROM edges e
      JOIN {prev} r ON r.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst
    )"""


@register(
    "bipartite_pagerank",
    oracle=f"""
    WITH cs_keys AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    cs AS (
      SELECT 'c#' || CAST(ck AS VARCHAR) AS c,
             's#' || CAST(sk AS VARCHAR) AS s
      FROM cs_keys
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM cs
      UNION ALL
      SELECT s AS src, c AS dst FROM cs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS pr FROM deg),
    {",".join(_iter_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS))}
    SELECT node, CAST(pr AS BIGINT) AS pr FROM r{PR_ITERS}
    """,
)
def bipartite_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{iters}-iteration fixed-point PageRank over the customer–
    supplier trade graph, exact to the last bit (see module
    docstring for the integer-arithmetic contract).

    Per iteration: one join of ranks onto edges on the node key and
    one aggregation on dst. Edge set and degree table are computed
    once and lineage-truncated with lazy ``localCheckpoint``s so
    iteration k's plan replays neither the orders⋈lineitem distinct
    nor the degree shuffle k times (the closure/components operators
    document the same pitfall; the in-code comment has the measured
    variants).
    """
    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # distinct on the INTEGER key pair first (16 bytes/row through the
    # dedup shuffle), string node ids minted after — the prefixes make
    # the concat injective, so the result set is identical.
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .select(
            F.concat(F.lit("c#"), F.col("ck").cast("string")).alias("c"),
            F.concat(F.lit("s#"), F.col("sk").cast("string")).alias("s"),
        )
    )
    edges = (
        cs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(cs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint(eager=False)
    )
    # deg is read FOUR times (r0 + one contrib join per iteration); the
    # lazy checkpoint computes the edges→groupBy shuffle once instead
    # of inlining it into every iteration's plan. Measured at sf0.1:
    # checkpointing edges+deg 5.6s → 4.0s; the alternative
    # (repartition("src") + AQE ReusedExchange, no checkpoints) was
    # 5.4s — the reused exchange still re-sorts per iteration and the
    # orders⋈lineitem distinct stays inline in every iteration's DAG.
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    r = deg.select("node", F.lit(PR_SCALE).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        contrib = r.join(deg, "node").select(
            F.col("node").alias("src"), F.expr("pr div deg").alias("contrib")
        )
        r = (
            edges.join(contrib, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(PR_BASE).cast("long")
                    + F.expr("(85 * sum(contrib)) div 100").cast("long")
                ).alias("pr")
            )
        )
    return r
