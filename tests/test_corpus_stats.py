"""Invariant tests for the round-10 corpus planning/profiling
operators (queries/corpus_stats.py). Value-exactness is the oracle
sweep's job; these pin the MATH the oracles can't see — the smoothing
direction of temperature sampling, the sum-identity bounds of the
diversity metric, the monotonicity of the Heaps curve."""

from __future__ import annotations

from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries.corpus_stats import (
    HEAPS_K,
    TEMP_SAMPLE_BUDGET,
)
from tests.conftest import SF_DIR


def test_temperature_sampling_flattens_toward_the_tail(spark):
    rows = REGISTRY["temperature_sampling_plan"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 2
    # shares and smoothed shares both form (near-)partitions of unity
    assert abs(sum(r.share_micro for r in rows) - 1_000_000) <= len(rows)
    assert abs(sum(r.q_micro for r in rows) - 1_000_000) <= len(rows)
    # allocations exhaust the budget up to per-language rounding
    assert abs(sum(r.alloc_docs for r in rows) - TEMP_SAMPLE_BUDGET) <= len(rows)
    # sqrt smoothing: the SMALLER a language, the larger its boost
    # q/share — strictly ordered opposite to size
    by_size = sorted(rows, key=lambda r: r.n_docs)
    boosts = [r.q_micro / r.share_micro for r in by_size]
    assert all(a >= b for a, b in zip(boosts, boosts[1:])), boosts
    # head language damped (<1), tail boosted (>1)
    assert boosts[0] > 1.0 > boosts[-1]


def test_embedding_diversity_sum_identity_bounds(spark):
    rows = {r.label: r for r in REGISTRY["embedding_diversity"].fn(spark, SF_DIR).collect()}
    assert -1 in rows
    labels = [k for k in rows if k != -1]
    total = rows[-1]
    assert total.n_vecs == sum(rows[k].n_vecs for k in labels)
    assert total.self_sq == sum(rows[k].self_sq for k in labels)
    for r in rows.values():
        assert r.pair_den == r.n_vecs * (r.n_vecs - 1)
        # quantized unit self-dot is ~1e6 per vector (rounding adds at
        # most DIM*(q + 1/4) ≈ 32k either way at q=1000, dim=64)
        assert abs(r.self_sq - r.n_vecs * 1_000_000) < r.n_vecs * 40_000
        # mean pairwise cosine (pair_num/pair_den, micro units) of
        # unit-ish vectors is within [-1, 1] up to quantization slack
        assert abs(r.pair_num) <= r.pair_den * 1_050_000


def test_heaps_curve_is_monotone_and_exhaustive(spark):
    rows = sorted(
        REGISTRY["heaps_law_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == list(range(1, HEAPS_K + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.cp_docs <= b.cp_docs
        assert a.cum_tokens <= b.cum_tokens
        assert a.vocab_size <= b.vocab_size
    last = rows[-1]
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    assert last.cp_docs == n_docs
    for r in rows:
        assert 0 < r.vocab_size <= r.cum_tokens
        assert 0 < r.ttr_micro <= 1_000_000


def test_novelty_audit_bounds_and_split(spark):
    from namegraph_collections_spark.queries.training_data import (
        TEST_BUCKET_CUTOFF,
        _bucket16,
    )
    from pyspark.sql import functions as F

    rows = REGISTRY["ngram_novelty_audit"].fn(spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    test_ids = {
        r.doc_id
        for r in docs.filter(
            _bucket16(F.col("doc_id")) < TEST_BUCKET_CUTOFF
        ).collect()
    }
    for r in rows:
        # only held-out docs are audited
        assert r.doc_id in test_ids
        assert 0 <= r.n_seen <= r.n_shingles
        # novelty_micro is the exact ratio of unseen shingles
        novel = r.n_shingles - r.n_seen
        assert r.novelty_micro == (novel * 1_000_000 + r.n_shingles // 2) // r.n_shingles


def test_source_overlap_is_directional_and_bounded(spark):
    rows = REGISTRY["source_overlap_matrix"].fn(spark, SF_DIR).collect()
    assert rows
    by_pair = {(r.src_a, r.src_b): r for r in rows}
    for r in rows:
        assert r.src_a != r.src_b
        assert 0 < r.n_shared <= r.n_a
        assert 0 < r.containment_micro <= 1_000_000
        # the intersection is symmetric even though containment is not
        mirror = by_pair.get((r.src_b, r.src_a))
        if mirror is not None:
            assert mirror.n_shared == r.n_shared


def test_packing_efficiency_consistency(spark):
    from namegraph_collections_spark.queries.training_data import PACK_BUDGET

    packed = {r.source: r for r in
              REGISTRY["packing_efficiency_eval"].fn(spark, SF_DIR).collect()}
    plan = REGISTRY["sequence_packing"].fn(spark, SF_DIR).collect()
    import collections
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for r in plan:
        a = agg[r.source]
        a[0] += 1
        a[1] += r.total_tokens
        a[2] += r.n_docs
    for src, r in packed.items():
        n_bins, total, n_docs = agg[src]
        assert (r.n_bins, r.total_tokens, r.n_docs) == (n_bins, total, n_docs)
        assert r.capacity_tokens == r.n_bins * PACK_BUDGET
        # min_bins is the ideal split-anywhere count — a comparison
        # point, NOT a bound: the chop rule spills docs past the
        # budget, so realized bins can land under it (fat bins) or
        # over it (trailing underfull bins)
        assert r.min_bins == (r.total_tokens + PACK_BUDGET - 1) // PACK_BUDGET
        assert r.max_bin_tokens * r.n_bins >= r.total_tokens


def test_exactness_guards_pass_through_empty_corpus(spark, tmp_path):
    """Round-11 ADVICE: the signed-64 exactness guards
    (assert_diversity_bound, the drift token bound) must be null-safe —
    a global agg over ZERO rows yields NULL counts, and assert_true on
    a bare NULL predicate raises. The guard must pass NULL through so
    the empty corpus produces exactly what the DuckDB oracle produces
    (for diversity that is one all-NULL label=-1 total row — both
    engines' scalar-subquery semantics — not zero rows)."""
    from tests.conftest import write_single_parquet
    from tests.oracle_harness import TABLES, compare

    for name in TABLES:
        write_single_parquet(
            spark.read.parquet(f"{SF_DIR}/{name}.parquet").limit(0),
            str(tmp_path / f"{name}.parquet"),
        )
    empty_sf = str(tmp_path)
    for qname in ("embedding_diversity", "source_unigram_drift"):
        spec = REGISTRY[qname]
        res = compare(spark, empty_sf, qname, spec.fn, spec.oracle)
        assert res["ok"], res
