"""CDC snapshot-diff queries (SURVEY §2.8 ★, §2.3 J12/J13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.cdc import minimal_field_diff, snapshot_diff
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
