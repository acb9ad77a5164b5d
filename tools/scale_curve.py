#!/usr/bin/env python3
"""Scaling-curve measurement: the most expensive bench queries timed at
sf0.01 / sf0.1 / sf1 (sf1 synthesized by tools/gen_scale.py — run that
first). This is the hard evidence behind the "would still hold at
100 TB" plan claims: a query whose cost is linear-ish in input should
show ~10x wall between adjacent scales on local[32]; anything well
beyond that is flagged SUPER_LINEAR and must be fixed or explained.

Methodology matches bench.py: noop sink (no collect bias), warm JVM,
3 INTERLEAVED passes per scale. The MIN of the samples is reported —
for a scaling curve the minimum is the estimator least polluted by
hypervisor steal bursts (we are measuring plan cost growth, not
steady-state throughput).

Usage:  python3 tools/scale_curve.py
Writes: tools/scale_curve_result.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402

#: The ~10 most expensive bench queries (round-6/7 medians) — the ones
#: whose scale behavior actually decides whether the engine survives a
#: 100x scale-up — covering dedup, similarity/ANN, graph, text mining,
#: the wiki pipeline, and the rollup/CDC relational families.
QUERIES = [
    "graph_battery",
    "lexical_dedup_battery",
    "banded_dedup_battery",
    "similarity_battery",
    "text_mining_battery",
    "neardup_triangles",
    "neardup_clusters",
    "wiki_all_info",
    "rollup_battery",
    "cdc_battery",
    "embedding_neardup_pairs",
    # round-7 pipeline additions (each owns a join/closure shape not
    # already covered by the batteries above)
    "semdedup_keep_list",
    "neardup_representatives",
    "training_pipeline_e2e",
]

SCALES = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.environ.get(
        "SPARK_GRAFT_SCALE_OUT", os.path.join(REPO, ".scaledata", "sf1")
    ),
}

RUNS = 3
#: sf0.1 -> sf1 is a 10x data growth; ratios beyond this are flagged.
#: (>10 is expected for shuffle-bound stages — n log n plus fixed
#: overheads — but well beyond it means a super-linear plan.)
SUPER_LINEAR_RATIO = 12.0

OUT_PATH = os.path.join(REPO, "tools", "scale_curve_result.json")


def main() -> int:
    if not os.path.exists(os.path.join(SCALES["sf1"], "lineitem.parquet")):
        print("sf1 dataset missing — run tools/gen_scale.py first", file=sys.stderr)
        return 2
    spark = get_spark("ngcs-scale-curve")
    samples: dict[str, dict[str, list[float]]] = {
        q: {s: [] for s in SCALES} for q in QUERIES
    }
    for label, sf_dir in SCALES.items():
        # warm the scans once per scale so sample 1 isn't an IO outlier
        for t in ["lineitem", "orders", "documents", "embeddings"]:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        for _ in range(RUNS):
            for q in QUERIES:
                t0 = time.time()
                REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[q][label].append(round(time.time() - t0, 3))
                print(f"{label} {q}: {samples[q][label][-1]}s", flush=True)
    result: dict = {
        "generated_by": "tools/scale_curve.py",
        "method": "noop sink, warm, 3 interleaved passes, min reported",
        "scales": {k: v for k, v in SCALES.items()},
        "queries": {},
        "super_linear": [],
    }
    for q in QUERIES:
        mins = {s: min(ts) for s, ts in samples[q].items()}
        r_mid = round(mins["sf0.1"] / max(mins["sf0.01"], 1e-9), 2)
        r_top = round(mins["sf1"] / max(mins["sf0.1"], 1e-9), 2)
        result["queries"][q] = {
            "min_sec": mins,
            "samples": samples[q],
            "ratio_sf0.01_to_sf0.1": r_mid,
            "ratio_sf0.1_to_sf1": r_top,
        }
        if r_top > SUPER_LINEAR_RATIO:
            result["super_linear"].append(q)
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT_PATH}; super_linear={result['super_linear']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
