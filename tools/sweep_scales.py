#!/usr/bin/env python3
"""Three-scale oracle-parity sweep — regenerates the README's
"zero mismatches at sf0.001 / sf0.01 / sf0.1" claim as a committed
artifact instead of a one-shot assertion.

Runs EVERY registry query against its DuckDB oracle at each scale
factor (the same canonicalized compare the CI parity sweep and the
external driver use) and writes one JSON file:

    tools/sweep_scales_result.json
      {"generated_by": ..., "scales": {"sf0.001": {"queries": {name:
        {"ok": bool, "spark_rows": n, ...}}, "mismatches": [...]}}}

Usage:  python3 tools/sweep_scales.py [sf_dir ...]
        (default: /root/testdata/sf0.001 sf0.01 sf0.1)

Wall-clock note: sf0.1 dominates (~10-15 min on local[32]) — the
whole point is checking caps/tie-breaks/float conventions at 10× the
driver's scale, where a wrong cap or an unstable tie-break actually
changes rows.
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
from tests.oracle_harness import compare  # noqa: E402

DEFAULT_SCALES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

OUT_PATH = os.path.join(REPO, "tools", "sweep_scales_result.json")


def main() -> int:
    scales = sys.argv[1:] or DEFAULT_SCALES
    spark = get_spark("ngcs-sweep")
    result: dict = {
        "generated_by": "tools/sweep_scales.py",
        "registry_size": len(REGISTRY),
        "scales": {},
    }
    exit_code = 0
    for sf_dir in scales:
        label = os.path.basename(sf_dir.rstrip("/"))
        t0 = time.time()
        rows: dict[str, dict] = {}
        mismatches: list[str] = []
        for name, spec in REGISTRY.items():
            try:
                r = compare(spark, sf_dir, name, spec.fn, spec.oracle)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                r = {"name": name, "ok": False, "error": f"{type(e).__name__}: {e}"}
            rows[name] = {k: v for k, v in r.items() if k != "name"}
            if not r.get("ok"):
                mismatches.append(name)
                print(f"MISMATCH {label} {name}: {r}", file=sys.stderr)
                exit_code = 1
        result["scales"][label] = {
            "wall_sec": round(time.time() - t0, 1),
            "mismatches": mismatches,
            "queries": rows,
        }
        print(f"{label}: {len(rows) - len(mismatches)}/{len(rows)} ok "
              f"in {result['scales'][label]['wall_sec']}s", flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT_PATH}")
    return exit_code


if __name__ == "__main__":
    raise SystemExit(main())
