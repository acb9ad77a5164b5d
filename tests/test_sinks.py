"""S7 scale-side sinks: partition layout, in-file ordering, file-size
bounds, and partition pruning on read-back."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from namegraph_collections_spark.sinks import write_partitioned_parquet

SF = "/root/testdata/sf0.001"


def test_partitioned_parquet_layout_and_pruning(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = str(tmp_path / "orders_part")
    write_partitioned_parquet(
        orders,
        out,
        partition_by=["o_orderpriority"],
        sort_by=["o_custkey"],
        max_records_per_file=500,
    )
    # hive-style partition directories
    dirs = sorted(glob.glob(f"{out}/o_orderpriority=*"))
    assert len(dirs) == 5
    # maxRecordsPerFile bounds every file
    for f in glob.glob(f"{out}/*/*.parquet"):
        assert pq.read_metadata(f).num_rows <= 500
    # in-file ordering on the sort column (row-group stats prune on it)
    f = glob.glob(f"{dirs[0]}/*.parquet")[0]
    vals = pq.read_table(f, columns=["o_custkey"])["o_custkey"].to_pylist()
    assert vals == sorted(vals)
    # read-back: partition filter prunes to one directory's rows, and
    # nothing was lost in the round trip
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == want
    # the pruned scan reads only the matching partition
    assert "1-URGENT" in plan or one.rdd.getNumPartitions() <= back.rdd.getNumPartitions()


def test_orc_round_trip_matches_parquet_source(spark, tmp_path):
    """The format-generic sink must round-trip documents through ORC
    with identical content and a partition-pruned read-back — ORC
    keeps the same stats-bearing columnar layout as parquet, so the
    sorted-write contract carries over."""
    from namegraph_collections_spark.sinks import write_partitioned

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "docs_orc")
    write_partitioned(
        docs, out, partition_by=["source"], sort_by=["doc_id"], file_format="orc"
    )
    assert glob.glob(f"{out}/source=*/*.orc")
    back = spark.read.orc(out)
    want = sorted(map(tuple, docs.collect()))
    # partition column moves to the end on hive read-back; realign
    got = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert got == want
    # partition pruning reaches the ORC scan
    one = back.filter(F.col("source") == "src0")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "src0" in plan
