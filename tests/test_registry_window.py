"""Guard the driver's correctness window.

The external driver value-checks the FIRST 50 registry entries in
insertion order; every §2 operator's driver-green evidence lives in
those rows. The window is an explicit list
(queries/__init__.py:DRIVER_WINDOW) applied by reordering the
registry — this test pins that list against the round-4 driver-checked
set plus the DELIBERATE round-5 and round-6 deltas, so an accidental
edit to either the list or a module's registrations can't silently
swap rows out of the window and downgrade their evidence to
local-only.

Round-5 delta (VERDICT r4 "Next round" #1):
- curate_names + name_regex_filters + strip_suffix_and_extract →
  composited into string_ops_battery; status_histogram → post-window
  (A6 already executes inside the wiki_documents composite);
- freed slots promoted asof_join_chunked_events, bipartite_pagerank,
  kmv_distinct_sketch.

Round-6 delta (VERDICT r5 "Next round" #5, queries/batteries.py):
- token_frequencies + unigram_logprob → unigram_text_battery;
- cosine_topk_bruteforce + ivf_topk + lsh_bucket_neighbors →
  similarity_battery;
- asof_join_chunked_events (lone temporal row) → temporal_join_battery
  (which adds asof_join_events + interval_range_join coverage);
- event_analytics_battery added (funnel + cohort + transition, all
  previously driver-unchecked);
- the two freed slots promote pq_rerank_topk and cms_heavy_hitters.
Every composited single stays registered after the window for the
local parity sweep.
"""

from __future__ import annotations

import json
import os

from namegraph_collections_spark.queries import DRIVER_WINDOW, REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW_SIZE = 50

# round-5 delta over the r4 driver set
R5_PROMOTED = ["asof_join_chunked_events", "bipartite_pagerank", "kmv_distinct_sketch"]
R5_COMPOSITED = ["curate_names", "name_regex_filters", "strip_suffix_and_extract"]
R5_DEMOTED = ["status_histogram"]

# round-6 delta over the r5 window: name -> replacement battery (first
# member of each group keeps the slot position; later members vanish
# from the window but stay registered).
R6_REPLACED = {
    "token_frequencies": "unigram_text_battery",
    "unigram_logprob": None,
    "cosine_topk_bruteforce": "similarity_battery",
    "ivf_topk": None,
    "lsh_bucket_neighbors": None,
    "asof_join_chunked_events": "temporal_join_battery",
    # second wave: widen three existing rows into batteries at zero
    # slot cost (+7 operators driver-checked)
    "exact_dedup_groups": "lexical_dedup_battery",
    "deterministic_mix_sample": "sampling_battery",
    "hourly_event_rollup": "rollup_battery",
    # third wave: seven more rows widened into batteries; after this
    # every registry operator's output is hashed by some driver row
    "cms_heavy_hitters": "sketch_stats_battery",
    "suffix_mining": "text_mining_battery",
    "transitive_closure_reachability": "graph_battery",
    "regional_revenue": "revenue_olap_battery",
    "cdc_three_way_ops": "cdc_battery",
    "customer_key_set_algebra": "set_prune_battery",
    "pq_rerank_topk": "pq_battery",
}
R6_APPENDED = [
    "event_analytics_battery",  # takes the slot freed by the similarity merge
    "pq_rerank_topk",
    "cms_heavy_hitters",
]
# singles that must keep a local-sweep registration after round 6
R6_COMPOSITED = [
    "token_frequencies",
    "unigram_logprob",
    "cosine_topk_bruteforce",
    "ivf_topk",
    "lsh_bucket_neighbors",
    "asof_join_events",
    "asof_join_chunked_events",
    "interval_range_join",
    "funnel_conversion",
    "cohort_retention",
    "event_transition_matrix",
    "exact_dedup_groups",
    "passage_dedup",
    "tfidf_cosine_pairs",
    "deterministic_mix_sample",
    "grouped_deterministic_sample",
    "weighted_sample_topk",
    "deterministic_split",
    "hourly_event_rollup",
    "cascading_time_rollup",
    "incremental_hourly_rollup",
    # third wave
    "cms_heavy_hitters",
    "histogram_quantiles",
    "table_stats_profile",
    "skew_key_diagnostics",
    "salted_skew_agg",
    "length_percentile_trim",
    "suffix_mining",
    "bigram_pmi",
    "bpe_merge_table",
    "transitive_closure_reachability",
    "neardup_triangles",
    "regional_revenue",
    "rollup_regional_revenue",
    "cube_status_priority",
    "cdc_three_way_ops",
    "cdc_driven_rollup",
    "customer_key_set_algebra",
    "bloom_pruned_semi_join",
    "pq_rerank_topk",
    "pq_adc_topk",
    "incremental_minhash_dedup",
    "bigram_lm_perplexity",
    "ann_recall_eval",
]
# round 7: singles composited into a widened battery at creation time
R7_COMPOSITED = [
    "doc_quality_signals",  # rides unigram_text_battery
    "winnowing_fingerprints",  # rides lexical_dedup_battery
    "bpe_encode_tokens",  # rides text_mining_battery
    "semdedup_keep_list",  # rides similarity_battery
    "neardup_representatives",  # rides lexical_dedup_battery
    "pii_scan_redact",  # rides string_ops_battery
]
# round 9: the sketch bisect (VERDICT r8 #1). sketch_stats_battery —
# red for three consecutive driver rounds across three encodings while
# locally bitwise-equal — splits into two 3-leg rows so the driver
# localizes its disagreement; the freed slot comes from compositing
# pricing_summary into revenue_olap_battery. In-place replacement so
# positional provenance of the other 48 rows is untouched.
R9_REPLACED = {
    "pricing_summary": "sketch_probe_battery",
    "sketch_stats_battery": "skew_salt_trim_battery",
}
# singles/batteries that must keep a local-sweep registration after
# round 9 (the six sketch singles are already in R6_COMPOSITED)
R9_COMPOSITED = [
    "pricing_summary",  # rides revenue_olap_battery
    "sketch_stats_battery",  # the original six-leg row, post-window
    "c4_line_filter",  # rides string_ops_battery (r8 gap closed)
    # round-9 new operators, driver-hashed via battery legs
    "dsir_importance_weights",  # rides sampling_battery
    "ccnet_ppl_buckets",  # rides unigram_text_battery (shared LM frame)
    "dup_span_extract",  # rides lexical_dedup_battery
]

# round 11: the lexical-dedup bisect (VERDICT r10 #2). The 13-leg
# lexical_dedup_battery — slowest, fastest-growing driver row — splits
# in two: the independent-scan fingerprint/audit legs keep the name
# and slot, the MinHash-band family (one shared bands/quality/closure
# build) takes the NEW slot directly after it. The freed slot comes
# from compositing the simhash + embedding-LSH singles into
# neardup_candidates_battery in place (the r9 pricing_summary
# precedent).
R11_REPLACED = {
    "simhash_neardup_candidates": "neardup_candidates_battery",
    "embedding_neardup_pairs": None,
}
R11_COMPOSITED = [
    "simhash_neardup_candidates",
    "embedding_neardup_pairs",
]

# round 12: the text-mining bisect (VERDICT r11 #3) + the maintainer
# read-path battery (VERDICT r11 #2). text_mining_battery — 12.7s and
# 11 legs, the slowest driver row — keeps its name/slot with the
# tokenizer half (one BPE merge loop + one language-id scan); the NB/
# mining half (one classifier fit + suffix/pmi/repetition) takes a NEW
# slot directly after it. maintainer_state_battery gives every
# keyed-state maintainer's read path a driver-hashed home. The two
# slots come from compositing the three training-data planning singles
# into training_mix_battery in place (first member keeps the slot).
R12_REPLACED = {
    "decontamination_overlap": "training_mix_battery",
    "sequence_packing": "maintainer_state_battery",
    "domain_mix_plan": None,
}
R12_COMPOSITED = [
    "decontamination_overlap",
    "sequence_packing",
    "domain_mix_plan",
]

# round 8: singles composited into an existing window battery
# (window membership unchanged — only battery legs grew)
R8_COMPOSITED = [
    "training_pipeline_e2e",  # rides lexical_dedup_battery
    "multimodal_decode_battery",  # rides the widened multimodal_byte_histogram
    "language_id",  # rides text_mining_battery
    "epoch_shuffle_plan",  # rides sampling_battery
    "repetition_signals",  # rides text_mining_battery (melted long-form)
    "url_canonical_dedup",  # rides string_ops_battery
    "host_quality_rollup",  # rides string_ops_battery
    "language_id_eval",  # rides text_mining_battery (shared classifier scan)
    "dedup_cluster_stats",  # rides lexical_dedup_battery (shared closure)
    "domain_gated_corpus",  # rides string_ops_battery (shared per-doc frame)
]


def _r5_window() -> list[str]:
    with open(os.path.join(_REPO, "CORRECTNESS_r04.json")) as f:
        r4 = list(json.load(f))
    assert len(r4) == WINDOW_SIZE
    out: list[str] = []
    for name in r4:
        if name in R5_DEMOTED or name in R5_COMPOSITED[1:]:
            continue
        out.append("string_ops_battery" if name == R5_COMPOSITED[0] else name)
    out.extend(R5_PROMOTED)
    return out


def _expected_window() -> list[str]:
    # The r5 window mapped in place through the replacement table,
    # with the round-6 appends at their actual pinned positions:
    # event_analytics_battery takes the slot freed by the similarity
    # merge — it sits directly after temporal_join_battery — and the
    # two wave-1 appends (pq_rerank_topk, cms_heavy_hitters, both
    # themselves widened into batteries by wave 3) go at the end.
    out: list[str] = []
    for name in _r5_window():
        if name in R6_REPLACED:
            repl = R6_REPLACED[name]
            if repl is not None:
                out.append(repl)
            continue
        out.append(name)
    out.insert(out.index("temporal_join_battery") + 1, R6_APPENDED[0])
    for name in R6_APPENDED[1:]:
        out.append(R6_REPLACED.get(name) or name)
    # round-9 in-place replacements (the sketch bisect)
    out = [R9_REPLACED.get(name, name) for name in out]
    # round-11 in-place replacements (the lexical bisect): composite
    # two singles into one battery, spend the freed slot on the new
    # banded half directly after the fingerprint half
    out = [
        R11_REPLACED.get(name, name)
        for name in out
        if R11_REPLACED.get(name, name) is not None
    ]
    out.insert(out.index("lexical_dedup_battery") + 1, "banded_dedup_battery")
    # round-12 in-place replacements (the text-mining bisect + the
    # maintainer battery): composite the three training-data singles,
    # spend one freed slot on the NB/mining bisect half directly after
    # the tokenizer half and the other on the maintainer battery
    out = [
        R12_REPLACED.get(name, name)
        for name in out
        if R12_REPLACED.get(name, name) is not None
    ]
    out.insert(out.index("text_mining_battery") + 1, "nbq_mining_battery")
    return out


def test_window_is_the_r5_set_plus_the_deliberate_r6_delta():
    expected = _expected_window()
    # exact ORDERED pin: the external driver value-checks rows in
    # order, so positional provenance matters — a reordering of the
    # 50 hashed rows must fail here, not just a membership change.
    assert len(expected) == WINDOW_SIZE
    assert DRIVER_WINDOW == expected
    assert list(REGISTRY)[:WINDOW_SIZE] == DRIVER_WINDOW


def test_composited_singles_stay_registered_after_the_window():
    tail = list(REGISTRY)[WINDOW_SIZE:]
    for name in (
        R5_COMPOSITED + R5_DEMOTED + R6_COMPOSITED + R7_COMPOSITED
        + R8_COMPOSITED + R9_COMPOSITED + R11_COMPOSITED + R12_COMPOSITED
    ):
        assert name in tail, f"{name} lost its local-sweep parity check"


def test_every_entry_has_an_oracle():
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert missing == []


def test_every_operator_is_hashed_by_some_driver_row():
    """Round-10 structural guard (VERDICT r9 #4): derive the operator
    -> driver-row provenance map from the registry (battery rule:
    composites embed component oracles VERBATIM, so coverage is a
    substring relation, not a hand-kept list) and assert NO query is
    local-only — the r8 c4_line_filter / r9 lsh_tuning_eval gap class
    can no longer land silently."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dump_coverage import derive_coverage

    cov = derive_coverage()
    assert cov["local_only"] == []
    assert cov["window_size"] == WINDOW_SIZE
    # every query is reachable from a driver row one way or another
    for name, c in cov["operators"].items():
        assert c["kind"] in ("window_row", "battery_leg", "superseded_composite"), name
        assert c["hosts"], name


def test_committed_coverage_artifact_matches_head():
    """COVERAGE.json is regenerated whenever the registry changes —
    the committed artifact must equal a fresh derivation at HEAD (the
    round-9 closing-artifact discipline, made structural)."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from dump_coverage import derive_coverage

    with open(os.path.join(_REPO, "COVERAGE.json")) as f:
        committed = json.load(f)
    assert committed == json.loads(json.dumps(derive_coverage()))
