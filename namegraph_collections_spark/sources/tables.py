"""Parquet table loaders for the synthetic star schema (TESTDATA.md).

These are the engine's canonical batch sources: columnar Parquet with
filter/projection pushdown handled by Catalyst. At 100 TB these reads
parallelize by file split; nothing here is local-mode specific.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every synthetic table from ``sf_dir`` as a DataFrame."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for the SQL API)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
