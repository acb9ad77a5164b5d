"""Invariants for incremental_hourly_rollup beyond its parity row:
the split must actually straddle a bucket (so the merge path merges,
not merely concatenates), and the merged result must equal a direct
single-pass rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries.registry import events_tbl
from namegraph_collections_spark.queries.rollups import HOUR_US, INC_SPLIT_US


def test_split_straddles_a_bucket(spark):
    """At least one (bucket, event_type) key must have events on BOTH
    sides of the split instant — otherwise the merge aggregation never
    combines partial states and the test proves nothing. Pinned to
    sf0.01 (the driver's correctness scale): sf0.001 is sparse enough
    (~1.4 events/hour across 5 types) that the straddled hour can
    miss a per-type collision."""
    ev = events_tbl(spark, "/root/testdata/sf0.01").select(
        (F.expr(f"ts_us div {HOUR_US}") * HOUR_US).alias("bucket_us"),
        "event_type",
        (F.col("ts_us") < INC_SPLIT_US).alias("is_base"),
    )
    sides = ev.groupBy("bucket_us", "event_type").agg(
        F.countDistinct("is_base").alias("n_sides")
    )
    assert sides.filter(F.col("n_sides") == 2).count() >= 1


def test_merge_equals_single_pass(spark, sf_dir):
    """The incrementally-maintained rollup is row-identical to a
    direct one-pass aggregation of the same events."""
    got = REGISTRY["incremental_hourly_rollup"].fn(spark, sf_dir)
    ev = events_tbl(spark, sf_dir)
    want = (
        ev.withColumn("bucket_us", (F.expr(f"ts_us div {HOUR_US}") * HOUR_US).cast("long"))
        .groupBy("bucket_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("tv"),
        )
        .select(
            "bucket_us",
            "event_type",
            "n_events",
            F.col("tv").cast("double").alias("total_value"),
            F.round(F.col("tv").cast("double") / F.col("n_events"), 6).alias("mean_value"),
        )
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
