"""S8: the wikimapper SQLite source — a tiny mapping db is built with
stdlib sqlite3 and read back through the distributed rowid-range scan,
then fed into the same downstream projection the pipeline uses."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.plans.collections_core import id_to_title
from namegraph_collections_spark.sources.sqlite_db import (
    read_sqlite_table,
    read_wikimapper,
)

ROWS = [
    # (wikipedia_title, wikipedia_id, wikidata_id, redirect, primary_mapping)
    ("Coffee", 1001, "Q8486", 0, 1),
    ("Kaffee", 1002, "Q8486", 1, 0),  # redirect → excluded by id_to_title
    ("Tea", 1003, "Q6097", 0, 1),
    ("Category:Drinks", 1004, "Q575650", 0, 1),
    ("Orphan_page", 1005, None, 0, 1),  # no QID → excluded by id_to_title
]


@pytest.fixture(scope="module")
def mapping_db(tmp_path_factory):
    path = tmp_path_factory.mktemp("wikimapper") / "index_enwiki.db"
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE mapping (wikipedia_title TEXT, wikipedia_id INTEGER, "
        "wikidata_id TEXT, redirect INTEGER, primary_mapping INTEGER)"
    )
    con.executemany("INSERT INTO mapping VALUES (?, ?, ?, ?, ?)", ROWS)
    con.commit()
    con.close()
    return str(path)


def test_read_wikimapper_contract(spark, mapping_db):
    wm = read_wikimapper(spark, mapping_db)
    assert wm.columns == [
        "wikipedia_title",
        "wikipedia_id",
        "wikidata_id",
        "redirect",
        "primary_mapping",
    ]
    got = {r["wikipedia_title"]: r for r in wm.collect()}
    assert len(got) == len(ROWS)
    assert got["Kaffee"]["redirect"] is True
    assert got["Kaffee"]["primary_mapping"] is False
    assert got["Coffee"]["redirect"] is False
    assert got["Orphan_page"]["wikidata_id"] is None


def test_wikimapper_feeds_id_to_title(spark, mapping_db):
    """The SQLite-sourced frame satisfies the downstream contract: the
    qid→title projection applies the reference's primary/non-redirect
    filter (create_kv.py:173)."""
    pairs = {
        (r["item"], r["article"])
        for r in id_to_title(read_wikimapper(spark, mapping_db)).collect()
    }
    assert pairs == {
        ("Q8486", "Coffee"),
        ("Q6097", "Tea"),
        ("Q575650", "Category:Drinks"),
    }


def test_rowid_range_scan_is_partitioned_and_complete(spark, tmp_path):
    """A larger table split across many rowid ranges comes back exactly
    once per row, with the scan distributed over multiple partitions."""
    path = str(tmp_path / "big.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE mapping (wikipedia_title TEXT, wikipedia_id INTEGER, "
                "wikidata_id TEXT, redirect INTEGER, primary_mapping INTEGER)")
    con.executemany(
        "INSERT INTO mapping VALUES (?, ?, ?, ?, ?)",
        [(f"T{i}", i, f"Q{i}", 0, 1) for i in range(5000)],
    )
    con.commit()
    con.close()
    df = read_sqlite_table(
        spark, path, "mapping",
        "wikipedia_title string, wikipedia_id long, wikidata_id string, "
        "redirect long, primary_mapping long",
        num_partitions=8,
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 5000
    assert df.select("wikipedia_id").distinct().count() == 5000
    assert df.agg(F.sum("wikipedia_id")).first()[0] == 5000 * 4999 // 2


def test_empty_table(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE mapping (wikipedia_title TEXT, wikipedia_id INTEGER, "
                "wikidata_id TEXT, redirect INTEGER, primary_mapping INTEGER)")
    con.commit()
    con.close()
    assert read_wikimapper(spark, path).count() == 0
