#!/usr/bin/env python3
"""Decompose driver-side BUILD time of registry queries: total build
wall vs time spent inside DataFrame.localCheckpoint (which plans its
subtree eagerly even with eager=False) and DataFrame.rdd probes
(keyed_spread's getNumPartitions). Indicative, not a bench — run on a
quiet host for publishable numbers.

Usage: python tools/profile_build.py q1 q2 ... [--repeat N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the abstract base; instances are
# pyspark.sql.classic.dataframe.DataFrame which OVERRIDES these
# methods — patch the concrete class or the timers never fire.
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 2
    for a in sys.argv[1:]:
        if a.startswith("--repeat"):
            repeat = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ngcs-profile-build")

    acc = {"lc": 0.0, "lc_n": 0, "rdd": 0.0, "rdd_n": 0}
    orig_lc = DataFrame.localCheckpoint
    orig_rdd = DataFrame.rdd.func  # cached_property in Spark 4

    def timed_lc(self, eager=True):
        t0 = time.time()
        out = orig_lc(self, eager)
        acc["lc"] += time.time() - t0
        acc["lc_n"] += 1
        return out

    def timed_rdd(self):
        t0 = time.time()
        out = orig_rdd(self)
        acc["rdd"] += time.time() - t0
        acc["rdd_n"] += 1
        return out

    DataFrame.localCheckpoint = timed_lc
    DataFrame.rdd = property(timed_rdd)

    rows = []
    for name in args:
        per = []
        for _ in range(repeat):
            spark.catalog.clearCache()
            for k in acc:
                acc[k] = 0
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir)
            build = time.time() - t0
            per.append(
                {
                    "build": round(build, 3),
                    "lc": round(acc["lc"], 3),
                    "lc_n": acc["lc_n"],
                    "rdd": round(acc["rdd"], 3),
                    "rdd_n": acc["rdd_n"],
                }
            )
        rows.append({"name": name, "runs": per})
        print(json.dumps(rows[-1]))

    print(json.dumps({"sf_dir": sf_dir, "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
