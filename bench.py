#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints two
JSON lines: a long audit line {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec}, "samples": {...}, "sf": ...}
followed by a short FINAL summary line {"metric": ..., "value":
total_sec, "unit": "sec", "sf": ..., "n_queries": N, "n_failed": N}.
The driver parses the tail of stdout, so the last line must always be
complete JSON regardless of how many queries the long line carries.

Each query is fully materialized with the noop sink (no driver-side
collect, no result-size bias) — the measured cost is the distributed
plan itself.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "regional_revenue",
    "topk_orders_per_customer",
    "ordered_dedup_lineitems",
    "entity_assembly_users",
    "hourly_event_rollup",
    "cdc_snapshot_ops",
    "transitive_closure_reachability",
    "bm25_search",
    "exact_dedup_groups",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "text_features",
    "simhash_neardup_candidates",
    "embedding_neardup_pairs",
    "search_ltr_rescore",
    "session_window_rollup",
    "letter_range_normalize",
    "multimodal_byte_histogram",
    "wiki_all_info",
    "decontamination_overlap",
    "neardup_clusters",
    "sequence_packing",
    # Round 4 additions (appended so prior rounds' per-query numbers
    # stay comparable on the shared prefix).
    "asof_join_events",
    "interval_range_join",
    "asof_join_chunked_events",
    "cascading_time_rollup",
    "kmv_distinct_sketch",
    "pq_rerank_topk",
    "bloom_pruned_semi_join",
    "grouped_deterministic_sample",
    "fuzzy_blocked_pairs",
    "bipartite_pagerank",
    "rollup_regional_revenue",
    "status_priority_pivot",
    "length_percentile_trim",
    "incremental_hourly_rollup",
    "funnel_conversion",
    "cohort_retention",
    "event_transition_matrix",
    # Round 5 additions (append-only, same reason as above): the two
    # operator families that previously had no bench row, plus the
    # composited driver-window battery.
    "pq_adc_topk",
    "neardup_triangles",
    "string_ops_battery",
    "cms_heavy_hitters",
    "bigram_pmi",
    "ann_recall_eval",
    "cdc_driven_rollup",
    "weighted_sample_topk",
    # Round 6 additions (append-only): the driver-window composites —
    # each unions already-benched singles, so its row prices the whole
    # driver-checked unit rather than new operator work.
    "temporal_join_battery",
    "event_analytics_battery",
    "similarity_battery",
    "unigram_text_battery",
    # Round 6 new operators.
    "deterministic_split",
    "passage_dedup",
    "skew_key_diagnostics",
    "salted_skew_agg",
    "histogram_quantiles",
    "bpe_merge_table",
    "tfidf_cosine_pairs",
    "rollup_battery",
    "sampling_battery",
    "lexical_dedup_battery",
    "incremental_minhash_dedup",
    "cube_status_priority",
    "table_stats_profile",
    "bigram_lm_perplexity",
    "pq_battery",
    "sketch_stats_battery",
    "text_mining_battery",
    "graph_battery",
    "revenue_olap_battery",
    "cdc_battery",
    "set_prune_battery",
    # Round 7 additions (append-only).
    "doc_quality_signals",
    "winnowing_fingerprints",
    "bpe_encode_tokens",
    "semdedup_keep_list",
    "neardup_representatives",
    "pii_scan_redact",
    "training_pipeline_e2e",
    "multimodal_decode_battery",
    # Round 8 additions (append-only).
    "language_id",
    "epoch_shuffle_plan",
    "repetition_signals",
    "url_canonical_dedup",
    "c4_line_filter",
    "host_quality_rollup",
    "language_id_eval",
    "dedup_cluster_stats",
    "domain_gated_corpus",
    # Round 9 additions (append-only): the sketch bisect rows + the
    # data-selection / span-dedup operators.
    "sketch_probe_battery",
    "skew_salt_trim_battery",
    "dsir_importance_weights",
    "ccnet_ppl_buckets",
    "dup_span_extract",
    # Round 9b additions (append-only): the supervised NB quality
    # filter family + MinHash fuzzy decontamination.
    "nb_quality_scores",
    "nb_quality_eval",
    "fuzzy_decontamination",
    "tokenizer_fertility",
    "lsh_tuning_eval",
    # Round 10 additions (append-only): the NB calibration curve +
    # the corpus planning/profiling trio + the overlap/packing audits.
    "nb_quality_calibration",
    "temperature_sampling_plan",
    "embedding_diversity",
    "heaps_law_curve",
    "ngram_novelty_audit",
    "source_overlap_matrix",
    "packing_efficiency_eval",
    # round 11: the lexical bisect halves + the composited candidates
    # row + the four new operators
    "banded_dedup_battery",
    "neardup_candidates_battery",
    "image_header_decode",
    "passage_chunking",
    "padding_waste_eval",
    "source_unigram_drift",
    # round 12: the text-mining bisect half + the two new composites
    # (text_mining_battery keeps its row above — now the tokenizer
    # half; training_mix_battery unions already-benched singles;
    # maintainer_state_battery prices the folded-state read paths)
    "nbq_mining_battery",
    "training_mix_battery",
    "maintainer_state_battery",
    "av_header_decode",
]

RUNS_PER_QUERY = 3  # report the median — n=1 noise swamps round deltas


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Dev-loop helper: SPARK_GRAFT_ONLY=q1,q2 restricts the run; the
    # driver never sets it, so the contract output is unchanged.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        wanted = {t.strip() for t in only.split(",") if t.strip()}
        unknown = wanted - set(HEADLINE)
        if unknown:
            print(f"bench: SPARK_GRAFT_ONLY names not in HEADLINE: {sorted(unknown)}", file=sys.stderr)
        headline = [q for q in HEADLINE if q in wanted]
        if not headline:
            print("bench: SPARK_GRAFT_ONLY filtered out every query", file=sys.stderr)
            sys.exit(2)
    else:
        headline = HEADLINE
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("ngcs-bench")
    # Warm the JVM/codegen/Arrow paths so per-query numbers measure the
    # plans: touch every table and spin up the Python UDF workers once.
    for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        except Exception:  # events needs nanosAsLong — set by its queries
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm(F.col("id"))).count()

    # Per-query fault isolation: one broken query must never erase the
    # whole round's bench evidence — it records null and the JSON line
    # still prints (with any failure reported on stderr, never stdout,
    # which must stay a single parseable line).
    #
    # Repetitions are INTERLEAVED (3 passes over the whole set, median
    # per query) rather than consecutive: this host shows heavy
    # hypervisor CPU steal in bursts, and three back-to-back runs of
    # one query land entirely inside a burst — interleaving spreads
    # each query's samples across the run so the median sees at least
    # one quiet window.
    samples: dict[str, list[float]] = {name: [] for name in headline}
    failed: dict[str, str] = {}
    for _ in range(RUNS_PER_QUERY):
        for name in headline:
            if name in failed:
                continue
            try:
                # Measurement-honesty fix (optimization round 12): a
                # query whose build persist()s a shared intermediate
                # registers it in Spark's CacheManager, and a LATER run
                # of the same query builds a semantically identical
                # subtree that the analyzer silently substitutes with
                # the still-cached data — so runs 2..n of a persist-
                # using query were measuring cache reads, not the
                # computation from parquet (verified: 5.8s cached vs
                # ~9s honest on maintainer_state_battery). Clearing
                # the cache BEFORE each timed run makes every sample
                # compute from the parquet inputs.
                spark.catalog.clearCache()
                t0 = time.time()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[name].append(time.time() - t0)
            except Exception as e:  # noqa: BLE001 — isolation is the point
                failed[name] = f"{type(e).__name__}: {e}"
                print(f"bench: {name} FAILED: {failed[name]}", file=sys.stderr)
    timings: dict[str, float | None] = {
        name: (round(sorted(ts)[len(ts) // 2], 3) if ts and name not in failed else None)
        for name, ts in samples.items()
    }

    total = round(sum(t for t in timings.values() if t is not None), 3)
    # Raw samples ship next to the medians so a steal-storm run is
    # self-evident in the artifact (a 3x spread across a query's three
    # interleaved passes = host contention, not a plan regression) —
    # round 5's bench recorded medians that later failed to reproduce
    # and cost a round of misattribution.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": {
                    name: [round(t, 3) for t in ts] for name, ts in samples.items()
                },
                "sf": sf,
            }
        )
    )
    # Driver-visible per-query medians (optimization round 13, VERDICT
    # r12 item 2): the long audit line above (medians + raw samples for
    # 118 queries, ~50 KB) outgrows the driver's bounded stdout tail
    # (~2000 bytes, measured from the captured tails of BENCH_r10..r12),
    # so PERF_rNN.per_query recorded empty for two rounds. Emit the
    # medians AGAIN as short, self-contained JSON lines of ~20 queries
    # each — every line is complete JSON, so however much of the tail
    # the driver keeps, each line that fits parses. Queries are sorted
    # cheapest-first so the EXPENSIVE rows (the ones optimization
    # evidence lives on) land nearest the end of stdout and survive any
    # tail cut. Additions-only: the long audit line above and the final
    # summary line below are byte-identical to prior rounds.
    med_items = sorted(
        ((k, v) for k, v in timings.items() if v is not None), key=lambda kv: kv[1]
    )
    chunk_size = 20
    n_chunks = (len(med_items) + chunk_size - 1) // chunk_size
    for i in range(n_chunks):
        part = dict(med_items[i * chunk_size : (i + 1) * chunk_size])
        print(
            json.dumps(
                {
                    "metric": "headline_query_medians",
                    "part": i + 1,
                    "of": n_chunks,
                    "queries": part,
                    "sf": sf,
                },
                separators=(",", ":"),
            )
        )
    # The driver captures a bounded tail of stdout; round 6's single
    # line (medians + samples for 74 queries) outgrew that buffer and
    # the round's headline recorded as parsed:null. The LAST line is
    # therefore a short, self-contained summary that always fits — the
    # long line above stays for humans/audits, this one is the
    # machine contract.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len([t for t in timings.values() if t is not None]),
                "n_failed": len(failed),
            }
        )
    )


if __name__ == "__main__":
    main()
