"""SQLite table source (SURVEY §2.1 S8): the wikimapper mapping db.

The reference streams the wikimapper SQLite ``mapping`` table row by
row into RocksDB stores (create_kv.py:165-180 —
``SELECT wikipedia_title, wikipedia_id, wikidata_id FROM mapping WHERE
primary_mapping = 1 AND redirect = 0``). Here the same file becomes a
DataFrame directly.

Plan shape: one tiny driver-side metadata query reads MIN/MAX(rowid);
the table is then split into rowid ranges and each partition opens the
file READ-ONLY (URI mode) and scans only its range — an indexed-range
B-tree scan per task, the SQLite analogue of JDBC's
partitionColumn/lowerBound/upperBound parallel read. No JDBC driver
jar is needed (stdlib ``sqlite3`` runs inside the Arrow workers), and
on a cluster the file only needs to be visible to executors (shared
storage / broadcast copy), exactly like any other file-based source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_sqlite_table(
    spark: SparkSession,
    path: str,
    table: str,
    schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read ``table`` from the SQLite file at ``path`` as a DataFrame.

    ``schema`` is a DDL string whose column names must exist in the
    table (also the projection — only those columns are SELECTed).
    Rows are range-partitioned on SQLite's implicit ``rowid``.
    """
    import sqlite3

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo_hi = con.execute(f"SELECT MIN(rowid), MAX(rowid) FROM {table}").fetchone()
    finally:
        con.close()
    if lo_hi is None or lo_hi[0] is None:
        return spark.createDataFrame([], schema)
    lo, hi = lo_hi
    n = max(1, min(num_partitions, hi - lo + 1))
    # n contiguous [start, end] rowid ranges covering [lo, hi].
    step = (hi - lo + 1 + n - 1) // n
    ranges = spark.range(n).select(
        (F.lit(lo) + F.col("id") * step).alias("start"),
        F.least(F.lit(lo) + (F.col("id") + 1) * step - 1, F.lit(hi)).alias("end"),
    ).repartition(n, "start")

    from pyspark.sql.types import StructType

    out_schema = StructType.fromDDL(schema)
    cols = ", ".join(f.name for f in out_schema.fields)

    def scan(batches):
        import sqlite3  # noqa: PLC0415 — worker-side import
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            for start, end in zip(pdf["start"], pdf["end"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    cur = c.execute(
                        f"SELECT {cols} FROM {table} "
                        f"WHERE rowid BETWEEN ? AND ? ORDER BY rowid",
                        (int(start), int(end)),
                    )
                    while True:
                        rows = cur.fetchmany(50_000)
                        if not rows:
                            break
                        yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])
                finally:
                    c.close()

    return ranges.mapInPandas(scan, out_schema)


#: The wikimapper mapping table's column contract (wikimapper's own
#: schema, consumed at create_kv.py:171-180).
WIKIMAPPER_SCHEMA = (
    "wikipedia_title string, wikipedia_id long, wikidata_id string, "
    "redirect long, primary_mapping long"
)


def read_wikimapper(spark: SparkSession, path: str) -> DataFrame:
    """The wikimapper SQLite file → the engine's wikimapper DataFrame
    contract: (wikipedia_title, wikipedia_id, wikidata_id,
    redirect: bool, primary_mapping: bool).

    Matches the reference's consumption of the table (create_kv.py:
    165-180): SQLite stores the two flags as 0/1 integers, which the
    reference filters with ``primary_mapping = 1 AND redirect = 0``;
    downstream plans here filter the boolean columns the same way
    (plans/collections_core.py::id_to_title).
    """
    raw = read_sqlite_table(spark, path, "mapping", WIKIMAPPER_SCHEMA)
    return raw.select(
        "wikipedia_title",
        "wikipedia_id",
        "wikidata_id",
        (F.col("redirect") == 1).alias("redirect"),
        (F.col("primary_mapping") == 1).alias("primary_mapping"),
    )
