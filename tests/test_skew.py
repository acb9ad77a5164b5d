"""Skew-mitigation tests: salted forms must produce results identical
to their plain forms on skewed data (one key holding ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    top_keys,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 9000 rows on key 'hot', ~1000 spread over 100 cold keys
    df = spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return df.cache()


def test_salted_aggregate_matches_plain(skewed):
    plain = {
        (r["k"]): (r["n"], r["total"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["total"], r["mx"])
        for r in salted_aggregate(
            skewed, ["k"], {"n": ("v", "count"), "total": ("v", "sum"), "mx": ("v", "max")}
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"m": ("v", "median")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"cold{i}", float(i)) for i in range(100)], "k string, w double"
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"]) for r in salted_join(skewed, dim, "k").collect()
    )
    assert salted == plain


def test_top_keys_diagnosis(skewed):
    rows = top_keys(skewed, "k", n=3).collect()
    assert rows[0]["k"] == "hot"
    assert rows[0]["count"] == 9000
    assert rows[0]["share"] == 0.9


def test_salted_join_rejects_outer_modes(spark, skewed):
    dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    for how in ("right", "full_outer", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(skewed, dim, "k", how=how)


# ---------------------------------------------------------------------------
# Chunked as-of join under a pathological hot key (the design note in
# operators/temporal.py:asof_join_chunked promises: identical output
# to the plain form, with every sort bounded by the (key, chunk)
# slice instead of the whole key).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def hot_key_asof(spark):
    """~All events on ONE key: 20k quotes every 10 ticks + 2k probes
    every 100 ticks on 'hot', plus a sliver of cold keys so the join
    isn't degenerate single-group."""
    quotes = spark.range(20_000).select(
        F.when(F.col("id") < 19_800, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 20).cast("string")))
        .alias("k"),
        (F.col("id") * 10).alias("ts"),
        F.col("id").alias("qid"),
        (F.col("id") % 97).cast("double").alias("px"),
    )
    probes = spark.range(2_000).select(
        F.when(F.col("id") < 1_980, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 20).cast("string")))
        .alias("k"),
        (F.col("id") * 100 + 5).alias("ts"),
        F.col("id").alias("pid"),
    )
    return quotes.cache(), probes.cache()


CHUNK_W = 1_000  # 100 quotes + 10 probes per (key, chunk) slice


def test_chunked_asof_identical_to_plain_on_hot_key(spark, hot_key_asof):
    from namegraph_collections_spark.operators.temporal import (
        asof_join,
        asof_join_chunked,
    )

    quotes, probes = hot_key_asof
    plain = asof_join(probes, quotes, "k", "ts", ["qid", "px"], "qid")
    chunked = asof_join_chunked(
        probes, quotes, "k", "ts", ["qid", "px"], "qid", chunk_width=CHUNK_W
    )
    p = sorted(tuple(r) for r in plain.collect())
    c = sorted(tuple(r) for r in chunked.collect())
    assert len(p) == probes.count()
    assert p == c


def test_chunked_asof_sort_groups_stay_bounded_on_hot_key(spark, hot_key_asof):
    """The skew-proof claim, pinned twice: (a) the fixture IS
    pathological — the hot key holds ~20k union rows while no
    (key, chunk) slice holds more than ~chunk_width/step + probes;
    (b) the executed plan's in-chunk sweep window really partitions by
    (k, _chunk), so task sort size follows the (a) bound, not the
    per-key total."""
    from namegraph_collections_spark.operators.temporal import asof_join_chunked
    from tests.test_plans import formatted_plan

    quotes, probes = hot_key_asof
    union = quotes.select("k", "ts").unionByName(probes.select("k", "ts"))
    per_key = union.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    per_slice = (
        union.withColumn("c", F.expr(f"ts div {CHUNK_W}"))
        .groupBy("k", "c")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_key >= 19_800  # the hot key really concentrates the data
    assert per_slice <= 150  # ~100 quotes + ~10 probes per slice
    chunked = asof_join_chunked(
        probes, quotes, "k", "ts", ["qid", "px"], "qid", chunk_width=CHUNK_W
    )
    plan = formatted_plan(chunked)
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs, "no window in the chunked as-of plan"
    # the sweep window's partition spec carries the chunk column:
    # spec text = "k#.., _chunk#..L, <ts> ASC ..." — _chunk must sit
    # before the first close-paren (i.e. inside the spec itself)
    assert any(
        frag.startswith("k#") and "_chunk" in frag.split(")")[0] for frag in specs
    ), "in-chunk sweep window does not partition by (k, _chunk)"
