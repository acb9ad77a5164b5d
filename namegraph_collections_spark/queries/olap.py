"""OLAP grouping-set operators: ROLLUP hierarchies and PIVOT
(registry 58+, behind the driver window — locally parity-checked).

The reference's reporting layer recomputes each aggregation level
with a separate pass (per-type counts, then global counts — e.g. its
collection stats summaries); Spark's native ``rollup``/``cube``
compute every level in ONE pass with partial aggregation — the map
side emits each input row once per grouping set into a single
shuffle, and ``grouping_id`` disambiguates levels in the output. At
100 TB that's L× fewer scans for an L-level hierarchy.

Pivot is expressed with Spark's native ``groupBy().pivot(col,
values)`` — with the value list given EXPLICITLY, so the plan is a
single-pass conditional aggregation (no extra distinct-values job,
and a stable output schema, which an oracle needs anyway).

Money sums follow the repo convention: DECIMAL(18,2) in, exact sum,
CAST to DOUBLE out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, tbl

#: Explicit pivot domain (stable schema; no distinct-values pre-job).
PIVOT_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "rollup_regional_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS lvl,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue at three aggregation levels — (region, nation), region
    subtotal, grand total — in one shuffle via native ROLLUP.

    ``lvl`` is the grouping-set bitmask (0 = leaf, 1 = region
    subtotal, 3 = grand total; both engines define GROUPING_ID as the
    same most-significant-first bitvector). The dimension joins are
    broadcasts (nation/region are dimension-sized; customer carries
    only its key + nationkey through projection pruning).
    """
    orders = tbl(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = tbl(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "status_priority_pivot",
    oracle=f"""
    SELECT o_orderstatus,
    {",".join(
        f'''COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS "n_{p.split("-")[0]}",
        CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             FILTER (WHERE o_orderpriority = '{p}'), 0) AS DOUBLE) AS "rev_{p.split("-")[0]}"'''
        for p in PIVOT_PRIORITIES
    )}
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders cross-tabulated: one row per order status, one column
    pair (count, revenue) per priority — Spark's native
    ``pivot(col, values)`` with the value domain pinned.

    Pinning ``values`` matters twice at scale: it removes the eager
    distinct-values collect Spark otherwise runs before planning, and
    it fixes the output schema (a late-arriving junk priority can't
    silently widen the table). The plan is a single partial-agg
    shuffle, exactly like a plain groupBy — pivot adds columns, not
    passes. The oracle is the equivalent FILTERed aggregation (what
    pivot compiles to anyway).
    """
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", PIVOT_PRIORITIES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("rev"),
        )
    )
    # Spark names pivot columns "<value>_<aggAlias>"; normalize to the
    # oracle's "n_<digit>" / "rev_<digit>". A (status, priority) cell
    # with NO rows comes out of pivot as NULL (the inner per-cell
    # coalesce never runs for an empty cell), while the oracle's
    # FILTERed COUNT/COALESCE(SUM) yields 0 / 0.0 — so the empty-cell
    # normalization must happen out here, after the pivot.
    renames = [F.col("o_orderstatus")]
    for p in PIVOT_PRIORITIES:
        digit = p.split("-")[0]
        renames.append(F.coalesce(F.col(f"`{p}_n`"), F.lit(0).cast("long")).alias(f"n_{digit}"))
        renames.append(F.coalesce(F.col(f"`{p}_rev`"), F.lit(0.0)).alias(f"rev_{digit}"))
    return pivoted.select(*renames)


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping sets of (status, priority) — leaf, each
    one-dimension margin, grand total — in ONE pass via native CUBE
    (completing the grouping-sets family next to ROLLUP and PIVOT).

    ``lvl`` is the grouping bitmask (0 leaf, 1 priority-margin,
    2 status-margin, 3 grand total) with the same MSB-first definition
    on both engines. One partial-aggregated shuffle computes every
    set; the reference's reporting layer would run 4 passes.
    """
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )
