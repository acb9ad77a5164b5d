"""Custom-collections ingest tests (load_custom_collections.py
semantics: default ranks, command sorts, invalid-member drops,
empty-collection drops, create-vs-full-update ops)."""

from __future__ import annotations

import pytest

from namegraph_collections_spark.plans.custom_collections import (
    DEFAULT_COLLECTION_RANK,
    DEFAULT_MEMBER_RANK,
    custom_update_operations,
    process_custom_collections,
)

RAW_SCHEMA = (
    "collection_id string, collection_name string, members array<string>,"
    " sort_labels string, member_rank bigint, description string,"
    " keywords array<string>, avatar_emoji string"
)


@pytest.fixture(scope="module")
def docs(spark):
    raw = spark.createDataFrame(
        [
            ("c1", "Marvel Heroes", ["Captain America", "Iron Man", "ιοσρβυνγ"],
             "a-z", None, None, ["heroes"], "🦸"),
            ("c2", "Scores", ["Bravo", "Alpha", "Charlie"], "z-a", 42, "desc", None, None),
            ("c3", "Empty", ["ιοσρβυνγ"], None, None, None, None, None),  # all invalid
        ],
        RAW_SCHEMA,
    )
    scores = spark.createDataFrame(
        [("captainamerica", 0.9), ("ironman", 0.5)], "label string, interesting_score double"
    )
    domains = spark.createDataFrame([("ironman", "taken")], "name string, status string")
    return process_custom_collections(raw, domains, scores, current_time_ms=99.0).cache()


def test_custom_docs(docs):
    rows = {r["metadata"]["id"]: r.asDict(recursive=True) for r in docs.collect()}
    assert set(rows) == {"c1", "c2"}  # c3 dropped: no valid members
    c1 = rows["c1"]
    names = [t["normalized_name"] for t in c1["template"]["names"]]
    assert names == ["captainamerica", "ironman"]  # a-z, Greek member dropped
    t0 = c1["template"]["names"][0]
    assert t0["tokenized_name"] == ["captain", "america"]
    assert t0["rank"] == DEFAULT_MEMBER_RANK
    assert t0["system_interesting_score"] == 0.9
    assert t0["namehash"].startswith("0x") and len(t0["namehash"]) == 66
    assert c1["template"]["collection_rank"] == DEFAULT_COLLECTION_RANK
    assert c1["template"]["taken_count"] == 1  # ironman
    assert c1["template"]["never_registered_count"] == 1
    assert c1["curation"] == {"curated": True, "datasource": "custom"}
    assert c1["data"]["avatar_emoji"] == "🦸"
    c2 = rows["c2"]
    assert [t["normalized_name"] for t in c2["template"]["names"]] == [
        "charlie", "bravo", "alpha",  # z-a
    ]
    assert c2["template"]["names"][0]["rank"] == 42  # member_rank command


def test_custom_update_ops(spark, docs):
    state = spark.createDataFrame([("c1",)], "id string")
    ops = {r["doc_id"]: r["op"] for r in custom_update_operations(docs, state).collect()}
    assert ops == {"c1": "update", "c2": "create"}
