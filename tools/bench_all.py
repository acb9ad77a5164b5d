#!/usr/bin/env python3
"""Full-registry sf1 scaling bench — extends the 13-query scaling
curve (tools/scale_curve.py) to EVERY registered query: the long-tail
queries had never been timed above sf0.1, so a hidden sf1 cliff in a
rarely-benched query (e.g. a battery whose added leg changed its join
order) would be invisible to both the curve and the driver bench.

Methodology matches bench.py / scale_curve.py: noop sink (no collect
bias), warm JVM, interleaved passes, MIN per query per scale (the
estimator least polluted by hypervisor steal bursts — this measures
plan cost growth, not steady-state throughput). Queries whose
sf0.1→sf1 min-ratio exceeds RATIO_FLAG (12× for 10× data) are listed
in ``super_linear`` and must be fixed or explained in
MEASUREMENTS.md.

Usage:  python3 tools/bench_all.py [sf_dir ...]
        (default: /root/testdata/sf0.1 /root/repo/.scaledata/sf1 —
         generate sf1 first with tools/gen_scale.py)
Writes: tools/bench_sf1_result.json
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

DEFAULT_SCALES = [
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".scaledata", "sf1"),
]
PASSES = 2
RATIO_FLAG = 12.0
OUT_PATH = os.path.join(REPO, "tools", "bench_sf1_result.json")


def main() -> int:
    scales = sys.argv[1:] or DEFAULT_SCALES
    spark = get_spark("ngcs-bench-all")
    result: dict = {
        "generated_by": "tools/bench_all.py",
        "registry_size": len(REGISTRY),
        "passes": PASSES,
        "estimator": "min",
        "scales": {},
    }
    labels = []
    for sf_dir in scales:
        label = os.path.basename(sf_dir.rstrip("/"))
        labels.append(label)
        # warm the scan paths once per scale so pass 1 isn't charged
        # for first-touch page cache / footer reads
        for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
            try:
                spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            except Exception:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        samples: dict[str, list[float]] = {n: [] for n in REGISTRY}
        failed: dict[str, str] = {}
        for _ in range(PASSES):
            for name, spec in REGISTRY.items():
                if name in failed:
                    continue
                try:
                    t0 = time.time()
                    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    samples[name].append(time.time() - t0)
                except Exception as e:  # noqa: BLE001 — fault isolation
                    failed[name] = f"{type(e).__name__}: {e}"
                    print(f"bench_all: {label} {name} FAILED: {failed[name]}", file=sys.stderr)
        result["scales"][label] = {
            "sf_dir": sf_dir,
            "min_sec": {
                n: (round(min(ts), 3) if ts else None) for n, ts in samples.items()
            },
            "samples": {n: [round(t, 3) for t in ts] for n, ts in samples.items()},
            "failed": failed,
        }
        done = sum(1 for ts in samples.values() if ts)
        print(f"bench_all: {label}: {done}/{len(REGISTRY)} timed, {len(failed)} failed")

    if len(labels) == 2:
        lo, hi = labels
        lo_t = result["scales"][lo]["min_sec"]
        hi_t = result["scales"][hi]["min_sec"]
        ratios = {
            n: round(hi_t[n] / lo_t[n], 2)
            for n in REGISTRY
            if lo_t.get(n) and hi_t.get(n) and lo_t[n] > 0
        }
        result["ratio"] = {"from": lo, "to": hi, "per_query": ratios}
        result["super_linear"] = sorted(
            [n for n, r in ratios.items() if r > RATIO_FLAG],
            key=lambda n: -ratios[n],
        )
        print(f"bench_all: super_linear (> {RATIO_FLAG}x): {result['super_linear']}")

    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"bench_all: wrote {OUT_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
