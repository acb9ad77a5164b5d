#!/usr/bin/env python3
"""Round-13 scale evidence (VERDICT r12 #3): the sf3 spot-sweep
(tools/sf3_spot.py) covered the worst-10 sf1/sf0.1 ratio rows; this
run covers the TOP-COST bench rows — the batteries and similarity
family that dominate the sf0.1 wall — at sf0.1 / sf1 / sf3, plus an
8-core pass at sf3 in a separate process so the 32c/8c ratio is
measured where parallelism is actually visible (at sf0.1 the r12
verdict showed 8 cores beating 32 on every row: fixed overhead).

Methodology = scale_curve.py / sf3_spot.py: noop sink, interleaved
passes, min estimator (host has a documented 1.5-3x CPU swing; min
over interleaved passes is the noise-robust estimator the round-12
notes standardized on).

Usage:
  python3 tools/scale_evidence_r13.py --cpus 32 \
      --scales sf0.1,sf1,sf3 --out tools/scale_evidence_r13_c32.json
  python3 tools/scale_evidence_r13.py --cpus 8 \
      --scales sf3 --out tools/scale_evidence_r13_c8.json
  python3 tools/scale_evidence_r13.py --combine   # writes the report

The combined report (tools/scale_evidence_r13.json) carries, per
query: min seconds per scale, per-decade growth exponents
alpha = log(t_hi/t_lo)/log(sf_hi/sf_lo), and the sf3 32c/8c speedup.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Top-cost bench rows at sf0.1 (round-13 start bench, medians): the
#: similarity/ANN family, the dedup/text batteries, wiki, and the
#: maintainer battery. Together ~90s of the 280s round-start wall.
QUERIES = [
    "similarity_battery",
    "ann_recall_eval",
    "wiki_all_info",
    "maintainer_state_battery",
    "banded_dedup_battery",
    "lexical_dedup_battery",
    "unigram_text_battery",
    "neardup_candidates_battery",
    "sampling_battery",
    "nbq_mining_battery",
    "lsh_tuning_eval",
    "multimodal_decode_battery",
]

SCALE_DIRS = {
    "sf0.1": (0.1, "/root/testdata/sf0.1"),
    "sf1": (1.0, os.path.join(REPO, ".scaledata", "sf1")),
    "sf3": (3.0, os.path.join(REPO, ".scaledata", "sf3")),
}

PASSES = 2


def run(cpus: int, scales: list[str], out_path: str) -> None:
    from namegraph_collections_spark.queries import REGISTRY
    from namegraph_collections_spark.session import get_spark

    spark = get_spark("scale-evidence-r13", cpus=cpus)
    out = {
        "generated_by": "tools/scale_evidence_r13.py",
        "estimator": "min over interleaved passes",
        "passes": PASSES,
        "cpus": cpus,
        "queries": QUERIES,
        "min_sec": {},
    }
    for label in scales:
        _, sf_dir = SCALE_DIRS[label]
        for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        samples: dict[str, list[float]] = {q: [] for q in QUERIES}
        for p in range(PASSES):
            for q in QUERIES:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{q}@{label} c{cpus} p{p}")
                t0 = time.time()
                REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[q].append(time.time() - t0)
                print(f"  {label} c{cpus} p{p} {q}: {samples[q][-1]:.2f}s", flush=True)
        out["min_sec"][label] = {q: round(min(ts), 3) for q, ts in samples.items()}
        print(label, out["min_sec"][label], flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", out_path)


def combine() -> None:
    c32 = json.load(open(os.path.join(REPO, "tools", "scale_evidence_r13_c32.json")))
    c8 = json.load(open(os.path.join(REPO, "tools", "scale_evidence_r13_c8.json")))
    report: dict = {
        "generated_by": "tools/scale_evidence_r13.py",
        "estimator": c32["estimator"],
        "passes": c32["passes"],
        "queries": QUERIES,
        "min_sec_c32": c32["min_sec"],
        "min_sec_c8_sf3": c8["min_sec"].get("sf3", {}),
        "exponents": {},
        "sf3_speedup_32c_over_8c": {},
        "super_linear": [],
    }
    order = [s for s in ["sf0.1", "sf1", "sf3"] if s in c32["min_sec"]]
    for q in QUERIES:
        e = {}
        for la, lb in zip(order, order[1:]):
            fa, fb = SCALE_DIRS[la][0], SCALE_DIRS[lb][0]
            ta, tb = c32["min_sec"][la][q], c32["min_sec"][lb][q]
            e[f"{la}->{lb}"] = round(math.log(tb / ta) / math.log(fb / fa), 3)
        report["exponents"][q] = e
        vals = list(e.values())
        if len(vals) == 2 and vals[1] > 1.3 and vals[1] > vals[0]:
            report["super_linear"].append(q)
        t8 = report["min_sec_c8_sf3"].get(q)
        t32 = c32["min_sec"].get("sf3", {}).get(q)
        if t8 and t32:
            report["sf3_speedup_32c_over_8c"][q] = round(t8 / t32, 2)
    path = os.path.join(REPO, "tools", "scale_evidence_r13.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["exponents"], indent=1))
    print("sf3 32c/8c:", report["sf3_speedup_32c_over_8c"])
    print("super_linear:", report["super_linear"])
    print("wrote", path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--scales", default="sf0.1,sf1,sf3")
    ap.add_argument("--out", default=None)
    ap.add_argument("--combine", action="store_true")
    a = ap.parse_args()
    if a.combine:
        combine()
    else:
        run(a.cpus, a.scales.split(","), a.out or f"tools/scale_evidence_r13_c{a.cpus}.json")
