"""Output sinks (SURVEY §2.1 S7 writer family, scale side).

The reference writes JSONL/TSV files and bulk-feeds Elasticsearch
(update_es.py); the engine's ES-facing path is operators/cdc.py
(op factory + JSONL writer). This module adds the lake-side sinks a
100 TB deployment actually lands data in:

- partitioned parquet with in-file ordering and bounded file sizes —
  the layout that makes DOWNSTREAM reads cheap: partition pruning on
  the partition keys, min/max row-group skipping on the sorted
  columns, and no small-files problem;
- bucketed+sorted tables — pre-shuffled storage so repeated joins on
  the bucket key plan with NO exchange (exercised by
  tests/test_plans.py::test_bucketed_join_is_shuffle_free).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Hive-partitioned columnar output with deterministic in-file
    order. ``file_format`` is any Spark batch format — parquet
    (default) and ORC both keep the column statistics that make the
    sorted layout prunable; JSON/CSV work for interchange but lose
    the stats.

    ``repartition(partition_by)`` routes each output partition's rows
    to one task (otherwise every task writes a file into every
    partition directory — the small-files explosion);
    ``sortWithinPartitions`` orders rows inside each file so row-group
    statistics prune on the sorted columns; ``maxRecordsPerFile``
    bounds file size without a global count.
    """
    out = df.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .format(file_format)
        .save(path)
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet (the original sink surface; see
    :func:`write_partitioned` for the format-generic form)."""
    write_partitioned(
        df, path, partition_by, sort_by=sort_by,
        max_records_per_file=max_records_per_file, mode=mode,
        file_format="parquet",
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table at ``path``.

    Both sides of a repeated large-large join written this way
    sort-merge-join with no Exchange — the pre-shuffled co-located
    layout for 100 TB fact-to-fact joins.
    """
    writer = df.write.mode(mode).option("path", path).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
