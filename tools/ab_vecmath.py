#!/usr/bin/env python3
"""Paired interleaved A/B: interpreted zip_with+aggregate folds vs the
Arrow-vectorized vec_math UDFs, on the real registry queries.

Mode A = the committed JVM fold (similarity._dot / similarity_pq
._sub_l2_int). Mode B = monkeypatched Arrow twins (functions/vec_math).
Each rep times A then B (order alternating per rep) with
clearCache() before every run, in ONE process — the r12 host-noise
protocol. Also verifies BIT-IDENTICAL results (repr-equality of sorted
collected rows) between modes for every query before timing.

Usage: python tools/ab_vecmath.py [query ...] [--reps N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# ---- the Arrow-vectorized twins (measured and REJECTED for engine use:
# see OPTIMIZATION_r13.md — the JVM fold beats them at every row count
# in this environment; kept here as the reproducible experiment) ----
import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _matrix(s):
    vals = s.to_numpy()
    n = len(vals)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if vals[0] is None:
        return None
    d = len(vals[0])
    for v in vals:
        if v is None or len(v) != d:
            return None
    out = np.empty((n, d), dtype=np.float64)
    for i in range(n):
        out[i] = vals[i]  # exact float32 -> float64 widening
    return out


def _seq_sum(p):
    # left-to-right fold over columns: bit-identical to the JVM
    # aggregate(..., 0.0, (acc, v) -> acc + v) per row
    acc = np.zeros(p.shape[0], dtype=np.float64)
    for j in range(p.shape[1]):
        acc += p[:, j]
    return acc


def _fold_dot(x, y):
    if x is None or y is None:
        return None
    acc = 0.0
    for i in range(len(x)):
        acc += float(x[i]) * float(y[i])
    return acc


def _fold_diff2(x, y):
    if x is None or y is None:
        return None
    acc = 0.0
    for i in range(len(x)):
        d = float(x[i]) - float(y[i])
        acc += d * d
    return acc


@pandas_udf(DoubleType())
def vdot(a: pd.Series, b: pd.Series) -> pd.Series:
    ma, mb = _matrix(a), _matrix(b)
    if ma is None or mb is None or ma.shape != mb.shape:
        return pd.Series([_fold_dot(x, y) for x, y in zip(a, b)], dtype="float64")
    return pd.Series(_seq_sum(ma * mb))


@pandas_udf(DoubleType())
def vdiff2(a: pd.Series, b: pd.Series) -> pd.Series:
    ma, mb = _matrix(a), _matrix(b)
    if ma is None or mb is None or ma.shape != mb.shape:
        return pd.Series([_fold_diff2(x, y) for x, y in zip(a, b)], dtype="float64")
    d = ma - mb
    return pd.Series(_seq_sum(d * d))


class _VM:  # the interface the script body expects
    vdot = vdot
    vdiff2 = vdiff2

DEFAULT_QUERIES = [
    "cosine_topk_bruteforce",
    "ivf_topk",
    "pq_adc_topk",
    "pq_rerank_topk",
    "ann_recall_eval",
    "similarity_battery",
    "embedding_neardup_pairs",
    "semdedup_keep_list",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()
    queries = args.queries or DEFAULT_QUERIES

    from namegraph_collections_spark.queries import REGISTRY
    from namegraph_collections_spark.queries import similarity, similarity_pq
    from namegraph_collections_spark.session import get_spark
    vm = _VM

    spark = get_spark("ab-vecmath")
    spark.range(10).select(vm.vdot(F.array(F.lit(1.0)), F.array(F.lit(2.0)))).count()

    orig_dot = similarity._dot
    orig_l2 = similarity_pq._sub_l2_int
    QUANT = similarity.QUANT

    def vec_dot(a, b):
        if isinstance(a, str):
            a = F.col(a)
        if isinstance(b, str):
            b = F.col(b)
        return vm.vdot(a, b)

    def vec_l2(a, b):
        return F.floor(vm.vdiff2(a, b) * F.lit(float(QUANT))).cast("long")

    def set_mode(mode: str) -> None:
        if mode == "B":
            similarity._dot = vec_dot
            similarity_pq._sub_l2_int = vec_l2
        else:
            similarity._dot = orig_dot
            similarity_pq._sub_l2_int = orig_l2

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        REGISTRY[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # ---- exactness gate ----
    if not args.skip_verify:
        for name in queries:
            rows = {}
            for mode in ("A", "B"):
                set_mode(mode)
                spark.catalog.clearCache()
                df = REGISTRY[name].fn(spark, args.sf)
                rows[mode] = sorted(tuple(map(repr, r)) for r in df.collect())
            ok = rows["A"] == rows["B"]
            print(f"verify {name}: {'BIT-IDENTICAL' if ok else 'MISMATCH'} "
                  f"({len(rows['A'])} rows)", flush=True)
            if not ok:
                for a, b in zip(rows["A"], rows["B"]):
                    if a != b:
                        print("  A:", a)
                        print("  B:", b)
                        break
                set_mode("A")
                sys.exit(1)

    # ---- paired interleaved timing ----
    t: dict[str, dict[str, list[float]]] = {q: {"A": [], "B": []} for q in queries}
    for rep in range(args.reps):
        order = ("A", "B") if rep % 2 == 0 else ("B", "A")
        for name in queries:
            for mode in order:
                set_mode(mode)
                spark.sparkContext.setJobDescription(f"{name}[{mode}] rep{rep}")
                t[name][mode].append(run(name))
    set_mode("A")

    print(f"\n== paired A/B over {args.reps} reps (sf={args.sf}) ==")
    for name in queries:
        a, b = sorted(t[name]["A"]), sorted(t[name]["B"])
        med_a, med_b = a[len(a) // 2], b[len(b) // 2]
        wins = sum(1 for x, y in zip(t[name]["A"], t[name]["B"]) if y < x)
        print(
            f"{name:32s} A={med_a:6.2f}s B={med_b:6.2f}s "
            f"speedup={med_a / med_b:4.2f}x wins={wins}/{args.reps} "
            f"rawA={[round(x, 2) for x in t[name]['A']]} "
            f"rawB={[round(x, 2) for x in t[name]['B']]}"
        )


if __name__ == "__main__":
    main()
