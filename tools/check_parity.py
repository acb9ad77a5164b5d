#!/usr/bin/env python3
"""Spot parity check: run named registry queries against their DuckDB
oracles (the driver's compare, via tests/oracle_harness.py).

Usage: python3 tools/check_parity.py [--sf DIR] name1 name2 ...
       python3 tools/check_parity.py --all   # every registry query
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle_harness import compare  # noqa: E402

from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = list(REGISTRY) if args == ["--all"] else args
    spark = get_spark("ngcs-parity")
    bad = []
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            r = compare(spark, sf_dir, name, REGISTRY[name].fn, REGISTRY[name].oracle)
            ok = r.get("ok")
        except Exception as e:  # noqa: BLE001
            r, ok = {"error": f"{type(e).__name__}: {e}"}, False
        dt = round(time.time() - t0, 1)
        print(f"{'OK ' if ok else 'BAD'} {name} rows={r.get('spark_rows')} {dt}s"
              + ("" if ok else f" detail={str(r)[:500]}"))
        if not ok:
            bad.append(name)
    print("BAD:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
