"""Registry mapping query names to (Spark callable, DuckDB oracle SQL).

Contract (driver): each Spark callable takes ``(spark, sf_dir)`` and
returns a DataFrame; the oracle SQL runs on DuckDB views named after
the parquet tables. Column names must match exactly — every computed
column is aliased identically on both sides.

Determinism rules used throughout (so the order-insensitive value hash
matches):
- money/double sums go through DECIMAL(18,2)/(18,6) so both engines
  compute exact arithmetic, then cast to DOUBLE at the end;
- ratios/means are derived from exact sums with a final ROUND(x, 6);
- arrays are always ``array_sort``-ed / ``list_sort``-ed;
- timestamps are emitted as epoch microseconds (BIGINT);
- every window/top-k has a total order (explicit tiebreakers).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-distribute rows on ``key`` before CPU-heavy per-row work
    (explode/md5/feature extraction).

    A small parquet table arrives as ONE input split, so without this
    the whole map side runs single-threaded; at cluster scale the same
    repartition is the co-location you want anyway (per-doc work stays
    with the doc, partial aggs meet in one shuffle). The partition
    count is pinned explicitly: AQE would coalesce the pre-explode
    exchange (it sees only the compact rows, not the fan-out after
    them) back to one partition.
    """
    from pyspark.sql import functions as F

    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


def events_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table ships TIMESTAMP(NANOS) parquet, which Spark only
    reads via the nanosAsLong legacy conf — ``ts`` arrives as BIGINT
    epoch-nanoseconds. All event queries emit microseconds (``ts div
    1000``) to match DuckDB, which truncates TIMESTAMP_NS to micros.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")
