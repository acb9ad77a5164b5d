#!/usr/bin/env python3
"""Decompose each headline query's bench cost into DRIVER BUILD time
(the ``fn(spark, sf_dir)`` call: py4j expression construction plus any
eager planning probes) and EXECUTE time (the noop write: analysis,
optimization, codegen, run).

bench.py times build+execute as one number; this tool tells us which
queries are driver-bound (fix: fewer py4j round trips / cheaper plan
construction) vs executor-bound (fix: plan shape). Same session conf,
same warmup as bench.py.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python3 tools/build_profile.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/build_profile_result.json"
    only = os.environ.get("SPARK_GRAFT_ONLY")
    names = [q for q in HEADLINE if not only or q in only.split(",")]
    spark = get_spark("ngcs-build-profile")
    for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        except Exception:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm(F.col("id"))).count()

    runs = int(os.environ.get("NGCS_PROFILE_RUNS", "2"))
    build: dict[str, list[float]] = {n: [] for n in names}
    execute: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            spark.catalog.clearCache()  # same honesty rule as bench.py
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build[name].append(round(t1 - t0, 3))
            execute[name].append(round(t2 - t1, 3))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    rows = [
        {
            "name": n,
            "build": med(build[n]),
            "execute": med(execute[n]),
            "total": round(med(build[n]) + med(execute[n]), 3),
            "build_samples": build[n],
            "execute_samples": execute[n],
        }
        for n in names
    ]
    rows.sort(key=lambda r: -r["total"])
    tot_b = round(sum(r["build"] for r in rows), 1)
    tot_e = round(sum(r["execute"] for r in rows), 1)
    result = {"sf_dir": sf_dir, "total_build": tot_b, "total_execute": tot_e, "rows": rows}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"total build={tot_b}s execute={tot_e}s over {len(rows)} queries -> {out_path}")
    for r in rows[:40]:
        print(f"{r['total']:8.2f}  build={r['build']:6.2f}  exec={r['execute']:6.2f}  {r['name']}")


if __name__ == "__main__":
    main()
