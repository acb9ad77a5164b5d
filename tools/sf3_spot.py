#!/usr/bin/env python3
"""sf3 spot-sweep (round 12, VERDICT r11 #5): the scaling story rested
on one decade (sf0.1 → sf1); this adds a third point at sf3 for the
queries where super-linearity would actually show — the worst-10 by
sf1/sf0.1 wall ratio plus the slowest battery rows — so the "survives
100x" claim stands on a two-decade curve with a bend detector.

For each query the tool times 2 interleaved passes per scale (noop
sink, min estimator — the scale_curve.py methodology) and computes the
per-decade growth exponent alpha = log(t_hi/t_lo) / log(sf_hi/sf_lo)
between adjacent scales. alpha <= ~1 is linear-or-better; a query is
flagged SUPER_LINEAR when its sf1→sf3 exponent exceeds 1.3 AND grew
versus its sf0.1→sf1 exponent (a bending curve — fixed overhead makes
small-scale exponents unreliable on their own).

It also records the token-linearity evidence for the per-token scan
class (VERDICT r11 #4): corpus token counts at every scale, so
MEASUREMENTS.md can show language_id's wall tracks tokens, not some
super-linear stage.

Usage:  python3 tools/gen_scale.py   (sf1, default)
        SPARK_GRAFT_SCALE_OUT=.scaledata/sf3 SPARK_GRAFT_SCALE_COPIES=30 \
            python3 tools/gen_scale.py
        python3 tools/sf3_spot.py
Writes: tools/sf3_spot_result.json
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from namegraph_collections_spark.queries import REGISTRY  # noqa: E402
from namegraph_collections_spark.session import get_spark  # noqa: E402

#: The worst-10 by sf1/sf0.1 wall ratio (tools/bench_sf1_result.json,
#: round 11) + the slowest battery rows at sf1. wiki_documents and
#: custom_collections_docs are both in the worst-10 AND the slowest
#: set — they appear once.
QUERIES = [
    # worst-10 by ratio
    "language_id",
    "doc_quality_signals",
    "related_collections_precompute",
    "language_id_eval",
    "c4_line_filter",
    "repetition_signals",
    "wiki_documents",
    "custom_collections_docs",
    "host_quality_rollup",
    "pii_scan_redact",
    # slowest battery rows at sf1 not already above
    "banded_dedup_battery",
    "stemmed_bm25",
    "text_mining_battery",
    "graph_battery",
    "unigram_text_battery",
]

SCALES = [
    ("sf0.1", 0.1, "/root/testdata/sf0.1"),
    ("sf1", 1.0, os.path.join(REPO, ".scaledata", "sf1")),
    ("sf3", 3.0, os.path.join(REPO, ".scaledata", "sf3")),
]

PASSES = 2


def corpus_tokens(spark, sf_dir: str) -> int:
    """Whitespace token count of the documents corpus INCLUDING the
    language-id tail phrases (the exact token stream language_id
    scans) — the denominator of the tokens-per-second evidence."""
    from namegraph_collections_spark.queries.text_analysis import (
        _lang_tail_sql,
    )

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr(
            f"size(filter(split(replace(text || ({_lang_tail_sql('div')}),"
            " chr(10), ' '), ' '), w -> w != '')) AS n"
        )
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )


def main() -> None:
    spark = get_spark("sf3-spot")
    out: dict = {
        "generated_by": "tools/sf3_spot.py",
        "estimator": "min over interleaved passes",
        "passes": PASSES,
        "queries": QUERIES,
        "tokens": {},
        "min_sec": {},
    }
    for label, _, sf_dir in SCALES:
        # warm the scans
        for t in ["lineitem", "orders", "customer", "documents", "embeddings"]:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        out["tokens"][label] = corpus_tokens(spark, sf_dir)
        samples: dict[str, list[float]] = {q: [] for q in QUERIES}
        for _ in range(PASSES):
            for q in QUERIES:
                t0 = time.time()
                REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[q].append(time.time() - t0)
        out["min_sec"][label] = {
            q: round(min(ts), 3) for q, ts in samples.items()
        }
        print(label, out["min_sec"][label], flush=True)
    # per-decade growth exponents + the bend detector
    exps: dict[str, dict[str, float]] = {}
    flagged = []
    for q in QUERIES:
        e = {}
        for (la, fa, _), (lb, fb, _) in zip(SCALES, SCALES[1:]):
            ta, tb = out["min_sec"][la][q], out["min_sec"][lb][q]
            e[f"{la}->{lb}"] = round(math.log(tb / ta) / math.log(fb / fa), 3)
        exps[q] = e
        lo, hi = list(e.values())
        if hi > 1.3 and hi > lo:
            flagged.append(q)
    out["exponents"] = exps
    out["super_linear"] = flagged
    path = os.path.join(REPO, "tools", "sf3_spot_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("super_linear:", flagged)
    print("wrote", path)


if __name__ == "__main__":
    main()
