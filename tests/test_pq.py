"""Quality floors for the PQ/ADC similarity path.

Oracle parity (test_oracle_parity.py) proves Spark and DuckDB compute
the SAME ranking — these tests pin that the ranking is USEFUL: the
compressed-domain shortlist must keep most of the exact top-k. The
whole pipeline is deterministic, so the floors are tight checks on
real measured values (ADC@5 = 22%, shortlist@100 → re-rank@5 = 90% on
sf0.01), set slightly below them to allow intentional parameter
retuning without silently accepting a broken codebook.
"""

from __future__ import annotations

import pytest

from namegraph_collections_spark.queries import REGISTRY

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_pairs(spark):
    rows = REGISTRY["cosine_topk_bruteforce"].fn(spark, SF01).collect()
    return {(r["q_id"], r["c_id"]) for r in rows}


def test_rerank_recall_floor(spark, exact_pairs):
    got = {(r["q_id"], r["c_id"]) for r in REGISTRY["pq_rerank_topk"].fn(spark, SF01).collect()}
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"re-rank recall collapsed: {recall:.0%}"


def test_adc_beats_random_baseline(spark, exact_pairs):
    # 5 of 2000 candidates at random would hit ~0.25%; the raw ADC
    # top-5 (no re-rank) must be far above chance even on this
    # near-random-geometry corpus.
    got = {(r["q_id"], r["c_id"]) for r in REGISTRY["pq_adc_topk"].fn(spark, SF01).collect()}
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.15, f"ADC recall at chance level: {recall:.0%}"


def test_pq_is_deterministic(spark):
    a = sorted(map(tuple, REGISTRY["pq_adc_topk"].fn(spark, SF01).collect()))
    b = sorted(map(tuple, REGISTRY["pq_adc_topk"].fn(spark, SF01).collect()))
    assert a == b
