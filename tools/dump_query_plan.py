#!/usr/bin/env python3
"""Dump one query's .explain("formatted") (plus every pre-checkpoint
frame) to a file — the per-query before/after evidence for the
optimization rounds (plans/r12/<query>_{before,after}.txt).

Usage: python3 tools/dump_query_plan.py <query> <outfile> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dump_plans import _ascii_safe, _capture_checkpoints  # noqa: E402

from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402


def main() -> None:
    name, outfile = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    spark = get_spark("plan-dump-one", cpus=8)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    captured = _capture_checkpoints()
    df = REGISTRY[name].fn(spark, sf_dir)
    parts = [f"# {name} @ {sf_dir}\n\n"]
    parts.append(_ascii_safe(df._jdf.queryExecution().explainString(mode)))
    for i, pre in enumerate(captured, 1):
        parts.append(f"\n\n# pre-checkpoint frame {i}\n\n")
        parts.append(_ascii_safe(pre._jdf.queryExecution().explainString(mode)))
    os.makedirs(os.path.dirname(outfile), exist_ok=True)
    with open(outfile, "w") as f:
        f.write("".join(parts))
    print(f"wrote {outfile} ({len(captured)} pre-checkpoint frames)")


if __name__ == "__main__":
    main()


