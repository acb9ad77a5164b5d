"""Schema-evolution reads: files from different producer generations
must union into one frame with NULL backfill, and the expectation
check must fail fast with every problem listed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.sources.tables import read_evolving_parquet


@pytest.fixture(scope="module")
def evolved_dir(spark, tmp_path_factory):
    from conftest import write_single_parquet

    out = tmp_path_factory.mktemp("evolving_flat")
    # generation 1: (id, name); generation 2 adds score; gen 3 adds tag
    gens = [
        ([(1, "a"), (2, "b")], "id long, name string"),
        ([(3, "c", 0.5)], "id long, name string, score double"),
        ([(4, "d", 1.5, "x")], "id long, name string, score double, tag string"),
    ]
    for i, (rows, schema) in enumerate(gens):
        write_single_parquet(spark.createDataFrame(rows, schema), out / f"{i}.parquet")
    return str(out)


def test_merge_schema_unions_generations(spark, evolved_dir):
    df = read_evolving_parquet(spark, evolved_dir)
    assert set(df.columns) == {"id", "name", "score", "tag"}
    rows = {r["id"]: (r["score"], r["tag"]) for r in df.collect()}
    assert rows[1] == (None, None)       # gen-1 rows backfill NULLs
    assert rows[3] == (0.5, None)
    assert rows[4] == (1.5, "x")
    assert df.filter(F.col("score").isNotNull()).count() == 2


def test_expectations_pass_and_fail_fast(spark, evolved_dir):
    read_evolving_parquet(spark, evolved_dir, expect={"id": "bigint", "score": "double"})
    # alias spellings compare by TYPE, not string: 'long' == bigint
    read_evolving_parquet(spark, evolved_dir, expect={"id": "long", "name": "string"})
    with pytest.raises(TypeError) as e:
        read_evolving_parquet(
            spark, evolved_dir,
            expect={"id": "int", "missing_col": "string"},
        )
    msg = str(e.value)
    assert "missing_col" in msg and "'id' is bigint" in msg
