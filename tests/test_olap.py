"""OLAP operator edge cases beyond the registry parity sweep: the
pivot's empty-cell normalization (a (status, priority) cell with no
rows must come out 0 / 0.0, matching the oracle's FILTERed COUNT +
COALESCE(SUM) — Spark's pivot natively yields NULL there, and no
stock-testdata cell is empty, so the sweep alone can't catch it)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from namegraph_collections_spark.queries import REGISTRY
from tests.oracle_harness import canon_rows

SF = "/root/testdata/sf0.001"


def test_pivot_empty_cell_is_zero_not_null(spark, tmp_path):
    spec = REGISTRY["status_priority_pivot"]
    # Build an orders table where one whole cell is empty: drop every
    # 5-LOW order with status 'F'.
    hole = (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "5-LOW")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(~hole)
    assert orders.filter(hole).count() == 0
    orders.write.parquet(str(tmp_path / "orders.parquet"))

    sdf = spec.fn(spark, str(tmp_path))
    s_cols, s_rows = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW orders AS SELECT * "
            f"FROM '{tmp_path}/orders.parquet/*.parquet'"
        )
        rel = con.sql(spec.oracle)
        d_cols, d_rows = canon_rows(list(rel.columns), rel.fetchall())
    finally:
        con.close()

    assert s_cols == d_cols
    assert s_rows == d_rows
    # and the empty cell really is exercised: status F / priority 5 → 0
    f_row = {c: v for c, v in zip(sdf.columns, sdf.filter(F.col("o_orderstatus") == "F").collect()[0])}
    assert f_row["n_5"] == 0 and f_row["rev_5"] == 0.0
