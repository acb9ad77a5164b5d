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
