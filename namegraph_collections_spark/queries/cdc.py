"""CDC snapshot-diff queries (SURVEY §2.8 ★, §2.3 J12/J13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.cdc import (
    MAX_MEMBERS_COUNT,
    cdc_maintain_aggregate,
    minimal_field_diff,
    partial_state,
    snapshot_diff,
    snapshot_diff_three_way,
)
from namegraph_collections_spark.queries.registry import register, tbl

# Two synthetic snapshots derived deterministically from `orders`:
#  previous = orders before 2000-01-01
#  current  = orders after 1996-01-01, with URGENT orders re-priced
# Overlap gives noop/update; the disjoint edges give delete/create.
# Prices are carried as integer cents so hashing/stringification is
# engine-independent (double→string formats differ between JVM/DuckDB).
_PREV_FILTER = "o_orderdate < TIMESTAMP '2000-01-01 00:00:00'"
_CURR_FILTER = "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = tbl(spark, sf_dir, "orders")
    prev = orders.filter(_PREV_FILTER).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_cents"),
    )
    curr = orders.filter(_CURR_FILTER).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") * 2).otherwise(
                F.col("o_totalprice")
            )
            * 100,
            0,
        )
        .cast("bigint")
        .alias("price_cents"),
    )
    return prev, curr


_ORACLE_SNAPSHOTS = f"""
    WITH prev AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
      FROM orders WHERE {_PREV_FILTER}
    ), curr AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND((CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2
                         ELSE o_totalprice END) * 100, 0) AS BIGINT) AS price_cents
      FROM orders WHERE {_CURR_FILTER}
    )
"""


@register(
    "cdc_snapshot_ops",
    oracle=_ORACLE_SNAPSHOTS
    + """
    , prev_h AS (
      SELECT o_orderkey,
             md5(concat_ws(chr(1), COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || '<null>'),
                                    COALESCE(CAST(price_cents AS VARCHAR), chr(0) || '<null>'))) AS ph
      FROM prev
    ), curr_h AS (
      SELECT o_orderkey,
             md5(concat_ws(chr(1), COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || '<null>'),
                                    COALESCE(CAST(price_cents AS VARCHAR), chr(0) || '<null>'))) AS ch
      FROM curr
    )
    SELECT COALESCE(p.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN p.ph IS NULL THEN 'create'
                WHEN c.ch IS NULL THEN 'delete'
                WHEN p.ph <> c.ch THEN 'update'
                ELSE 'noop' END AS op
    FROM prev_h p FULL OUTER JOIN curr_h c ON p.o_orderkey = c.o_orderkey
    """,
)
def cdc_snapshot_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer snapshot diff → op classification (D2 ★ / J12).

    Reference analogue: produce_update_operations
    (update_es.py:249-313): create / update / no-op / archive decided
    per id. One full-outer join + hash compare; at 100 TB this is a
    single co-partitioned shuffle on the business key.
    """
    prev, curr = _snapshots(spark, sf_dir)
    return snapshot_diff(prev, curr, key="o_orderkey", compare_cols=["o_orderstatus", "price_cents"])


@register(
    "cdc_minimal_field_diff",
    oracle=_ORACLE_SNAPSHOTS
    + """
    , changed_rows AS (
      SELECT p.o_orderkey,
             p.o_orderstatus AS p_status, c.o_orderstatus AS c_status,
             CAST(p.price_cents AS VARCHAR) AS p_price, CAST(c.price_cents AS VARCHAR) AS c_price
      FROM prev p JOIN curr c ON p.o_orderkey = c.o_orderkey
    )
    SELECT o_orderkey, 'o_orderstatus' AS field, p_status AS old_value, c_status AS new_value
    FROM changed_rows WHERE p_status IS DISTINCT FROM c_status
    UNION ALL
    SELECT o_orderkey, 'price_cents' AS field, p_price AS old_value, c_price AS new_value
    FROM changed_rows WHERE p_price IS DISTINCT FROM c_price
    """,
)
def cdc_minimal_field_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field minimal patch rows for changed keys (D3 ★).

    Reference analogue: prepare_update emits only changed/new keys per
    UPDATING_FIELD (update_es.py:156-209). Relational form: one row
    per (key, changed-field).
    """
    prev, curr = _snapshots(spark, sf_dir)
    return minimal_field_diff(prev, curr, key="o_orderkey", compare_cols=["o_orderstatus", "price_cents"])


# ---------------------------------------------------------------------------
# Three-way CDC (D2 ★ full form + F12): previous snapshot × current
# snapshot × live-index id map. Windows chosen so every op class is
# populated at every scale factor:
#   prev  = orderdate < 1999-01-01
#   curr  = orderdate ≥ 1996-01-01 (URGENT re-priced → update)
#   index = all orders with o_orderkey % 10 ≠ 0 ("in ES")
# so: curr ∖ index → create; curr ∩ index ∖ prev → full_update;
# overlap urgent → update, non-urgent → noop; index ∖ curr → archive;
# prev-only keys (date < 1996, %10 = 0) → nothing, like the reference.
# members_count is a synthetic deterministic value with a tail above
# the F12 gate so the >10000 skip is exercised.
# ---------------------------------------------------------------------------
_3W_PREV_FILTER = "o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"
_3W_CURR_FILTER = "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
_MEMBERS_SYNTH = "(CAST(o_orderkey AS BIGINT) * 7717) % 15000"


def _three_way_inputs(spark: SparkSession, sf_dir: str):
    orders = tbl(spark, sf_dir, "orders")
    members_count = (F.col("o_orderkey").cast("bigint") * 7717) % 15000
    prev = orders.filter(_3W_PREV_FILTER).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_cents"),
    )
    curr = orders.filter(_3W_CURR_FILTER).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") * 2).otherwise(
                F.col("o_totalprice")
            )
            * 100,
            0,
        )
        .cast("bigint")
        .alias("price_cents"),
        members_count.alias("members_count"),
    )
    index_state = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", F.concat(F.lit("es-"), F.col("o_orderkey").cast("string")).alias("es_id")
    )
    return prev, curr, index_state


@register(
    "cdc_three_way_ops",
    oracle=f"""
    WITH prev AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
      FROM orders WHERE {_3W_PREV_FILTER}
    ), curr AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND((CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2
                         ELSE o_totalprice END) * 100, 0) AS BIGINT) AS price_cents,
             {_MEMBERS_SYNTH} AS members_count
      FROM orders WHERE {_3W_CURR_FILTER}
    ), idx AS (
      SELECT o_orderkey, 'es-' || CAST(o_orderkey AS VARCHAR) AS es_id
      FROM orders WHERE o_orderkey % 10 <> 0
    ), prev_h AS (
      SELECT o_orderkey,
             md5(concat_ws(chr(1), COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || '<null>'),
                                    COALESCE(CAST(price_cents AS VARCHAR), chr(0) || '<null>'))) AS ph
      FROM prev
    ), curr_h AS (
      SELECT o_orderkey, members_count,
             md5(concat_ws(chr(1), COALESCE(CAST(o_orderstatus AS VARCHAR), chr(0) || '<null>'),
                                    COALESCE(CAST(price_cents AS VARCHAR), chr(0) || '<null>'))) AS ch
      FROM curr
    ), classified AS (
      SELECT COALESCE(c.o_orderkey, i.o_orderkey) AS o_orderkey, i.es_id, c.members_count,
             CASE WHEN c.ch IS NULL THEN 'archive'
                  WHEN i.es_id IS NULL THEN 'create'
                  WHEN p.ph IS NULL THEN 'full_update'
                  WHEN p.ph <> c.ch THEN 'update'
                  ELSE 'noop' END AS op
      FROM curr_h c
      FULL OUTER JOIN idx i ON c.o_orderkey = i.o_orderkey
      LEFT JOIN prev_h p ON COALESCE(c.o_orderkey, i.o_orderkey) = p.o_orderkey
    )
    SELECT o_orderkey, op,
           COALESCE(es_id, CAST(o_orderkey AS VARCHAR)) AS doc_id,
           CASE WHEN op = 'archive' THEN NULL
                ELSE members_count + 1 END AS members_out
    FROM classified
    WHERE op <> 'noop'
      AND (op = 'archive' OR members_count <= {MAX_MEMBERS_COUNT})
    """,
)
def cdc_three_way_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way snapshot × index CDC with the F12 gate (D2 ★ full
    form; produce_update_operations, update_es.py:249-313).

    Emitted ops only (noop suppressed), with: the big-collection gate
    (members_count > 10000 → dropped unless archive, update_es.py:
    139-141), deterministic doc id (live es_id, else the business
    key), and the reference's +1 count adjustment on emitted documents
    (populate.py's extra member; update_es.py:145-146, 228-245 — our
    updates are full-doc prepare_full_update-shaped, so the adjustment
    applies uniformly to non-archive ops).
    """
    prev, curr, idx = _three_way_inputs(spark, sf_dir)
    diff = snapshot_diff_three_way(
        prev, curr, idx, key="o_orderkey", compare_cols=["o_orderstatus", "price_cents"]
    )
    gated = (
        diff.filter(F.col("op") != "noop")
        .join(curr.select("o_orderkey", "members_count"), "o_orderkey", "left")
        .filter((F.col("op") == "archive") | (F.col("members_count") <= MAX_MEMBERS_COUNT))
    )
    return gated.select(
        "o_orderkey",
        "op",
        F.coalesce("es_id", F.col("o_orderkey").cast("string")).alias("doc_id"),
        F.when(F.col("op") == "archive", F.lit(None).cast("bigint"))
        .otherwise(F.col("members_count") + 1)
        .alias("members_out"),
    )


@register(
    "cdc_driven_rollup",
    oracle=_ORACLE_SNAPSHOTS
    + """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents
    FROM curr
    GROUP BY o_orderstatus
    """,
)
def cdc_driven_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with a COMPUTED delta (VERDICT r4
    ask #7): the per-status rollup of the current snapshot is produced
    by advancing the PREVIOUS snapshot's stored aggregate through the
    CDC diff — retract changed/deleted keys' old contributions, insert
    created/updated keys' new ones, merge decomposable (n, sum) state —
    never re-aggregating unchanged history. The oracle is the full
    recompute over the current snapshot, proving the loop lossless
    end-to-end (creates, re-priced updates, and deletes all present in
    the synthetic snapshot pair).

    ``operators/cdc.py::cdc_maintain_aggregate`` has the scale notes;
    tests/test_cdc_ops.py runs the same loop through rotate_snapshot /
    latest_snapshot across two rotations (the D4 storage path).
    """
    prev, curr = _snapshots(spark, sf_dir)
    stored = partial_state(prev, ["o_orderstatus"], ["price_cents"])
    maintained = cdc_maintain_aggregate(
        stored,
        prev,
        curr,
        key="o_orderkey",
        compare_cols=["o_orderstatus", "price_cents"],
        group_cols=["o_orderstatus"],
        sum_cols=["price_cents"],
    )
    return maintained.select(
        "o_orderstatus",
        F.col("n").alias("n_orders"),
        F.col("sum_price_cents").cast("bigint").alias("total_cents"),
    )
