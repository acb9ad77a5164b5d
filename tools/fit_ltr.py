#!/usr/bin/env python3
"""Fit the LTR rescore ensemble deterministically and emit
``namegraph_collections_spark/queries/ltr_model.py``.

The reference rescores with a trained RankLib LambdaMART (an sltr
stored model, research/learning-to-rank/search.py:78-94; training flow
research/learning-to-rank/configure-ltr.py:92-121). This script plays
the configure-ltr role for the Spark engine: it extracts the SAME 22
features the rescore query computes (by running the query's own
``feats`` CTE in DuckDB over the committed fixture scale), labels the
rescore window with a deterministic graded qrel, and fits an additive
ensemble of depth-2 regression trees by least-squares gradient
boosting — the output form LambdaMART produces. Everything is exact
float arithmetic over a fixed fixture with lexicographic tie-breaks,
so re-running the script always regenerates the identical model file
(pytest asserts this).

Qrels: rel = min(3, 1[full term coverage] + min(2, title hits) +
1[total matches ≥ 17]) — graded relevance from query-term coverage,
title matches, and term density, the standard synthetic-judgment
recipe when no click log exists. (The window's docs all match ≥3 of
the 4 terms, so plain coverage alone would be a constant label; the
three-signal grade spreads the window across all four grades.)

Fitting: 8 rounds of L2 boosting, learning rate 0.5. Each round fits
one depth-2 tree to the current residuals: exhaustive split search
over (feature × midpoint thresholds) minimizing SSE, children split
once more, leaf = learning-rate × mean residual ROUNDED to 3 decimals
(the ≤3-decimal leaf constants keep the ensemble sum exact in
DECIMAL(18,6) across Spark and DuckDB — see search.py). Residuals are
updated with the rounded leaves, so the committed constants are
exactly what the boosting saw.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_TREES = 8
LEARNING_RATE = 0.5
#: Sentinel threshold for an unsplittable child: every value compares
#: <=, so both leaves are reachable-as-one constant.
CONST_THR = 1e9

FIT_SF_DIR = os.environ.get("NGCS_LTR_FIT_SF_DIR", "/root/testdata/sf0.01")

MODEL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "namegraph_collections_spark",
    "queries",
    "ltr_model.py",
)


def load_features(sf_dir: str = FIT_SF_DIR):
    """(doc_ids, X rows as dict, rels) for the rescore window, via the
    query's own feats CTE."""
    import duckdb

    from namegraph_collections_spark.queries.search import (
        LTR_FEATURE_NAMES,
        _ltr_feats_cte,
    )

    con = duckdb.connect()
    for t in ["documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cols = ", ".join(LTR_FEATURE_NAMES)
    rows = con.sql(
        f"WITH {_ltr_feats_cte()} SELECT doc_id, {cols} FROM feats ORDER BY doc_id"
    ).fetchall()
    doc_ids = [r[0] for r in rows]
    X = [dict(zip(LTR_FEATURE_NAMES, r[1:])) for r in rows]
    rels = [
        min(
            3.0,
            (1.0 if x["f_match_distinct"] >= 4.0 else 0.0)
            + min(2.0, x["f_match_title"])
            + (1.0 if x["f_match_text"] >= 17.0 else 0.0),
        )
        for x in X
    ]
    return doc_ids, X, rels


def _best_split(rows, resid, feature_names):
    """(feature, threshold, sse) minimizing split SSE; None if no
    threshold separates the rows. Deterministic: features in declared
    order, thresholds ascending, strict improvement required."""
    n = len(rows)
    if n < 2:
        return None
    best = None
    base_sse = _sse(resid)
    for f in feature_names:
        vals = sorted({rows[i][f] for i in range(n)})
        for lo, hi in zip(vals, vals[1:]):
            thr = round((lo + hi) / 2.0, 6)
            left = [resid[i] for i in range(n) if rows[i][f] <= thr]
            right = [resid[i] for i in range(n) if rows[i][f] > thr]
            if not left or not right:
                continue
            sse = _sse(left) + _sse(right)
            if sse < base_sse - 1e-12 and (best is None or sse < best[2] - 1e-12):
                best = (f, thr, sse)
    return best


def _sse(vals):
    if not vals:
        return 0.0
    m = sum(vals) / len(vals)
    return sum((v - m) ** 2 for v in vals)


def _leaf(vals):
    if not vals:
        return 0.0
    return round(LEARNING_RATE * (sum(vals) / len(vals)), 3)


def _fit_child(rows, resid, feature_names):
    """One more split (or a constant) for a child node → the
    (feat, thr, leafL, leafR) tuple of the tree spec."""
    split = _best_split(rows, resid, feature_names)
    if split is None:
        v = _leaf(resid)
        return (feature_names[0], CONST_THR, v, v)
    f, thr, _ = split
    left = [resid[i] for i in range(len(rows)) if rows[i][f] <= thr]
    right = [resid[i] for i in range(len(rows)) if rows[i][f] > thr]
    return (f, thr, _leaf(left), _leaf(right))


def tree_predict(tree, x):
    rf, rt, (lf, lt, ll, lr), (gf, gt, gl, gr) = tree
    if x[rf] <= rt:
        return ll if x[lf] <= lt else lr
    return gl if x[gf] <= gt else gr


def fit_trees(X, rels, feature_names):
    resid = list(rels)
    trees = []
    for _ in range(N_TREES):
        split = _best_split(X, resid, feature_names)
        if split is None:
            v = _leaf(resid)
            tree = (
                feature_names[0],
                CONST_THR,
                (feature_names[0], CONST_THR, v, v),
                (feature_names[0], CONST_THR, v, v),
            )
        else:
            f, thr, _ = split
            li = [i for i in range(len(X)) if X[i][f] <= thr]
            ri = [i for i in range(len(X)) if X[i][f] > thr]
            tree = (
                f,
                thr,
                _fit_child([X[i] for i in li], [resid[i] for i in li], feature_names),
                _fit_child([X[i] for i in ri], [resid[i] for i in ri], feature_names),
            )
        for i in range(len(X)):
            resid[i] -= tree_predict(tree, X[i])
        trees.append(tree)
    return trees


def ndcg_at_k(doc_ids, scores, rels, k=10):
    order = sorted(range(len(doc_ids)), key=lambda i: (-scores[i], doc_ids[i]))
    ideal = sorted(range(len(doc_ids)), key=lambda i: (-rels[i], doc_ids[i]))
    import math

    def dcg(idx):
        return sum(
            (2 ** rels[i] - 1) / math.log2(p + 2) for p, i in enumerate(idx[:k])
        )

    d, ideal_d = dcg(order), dcg(ideal)
    return d / ideal_d if ideal_d else 0.0


def ensemble_scores(trees, X):
    return [sum(tree_predict(t, x) for t in trees) for x in X]


def render_model(trees) -> str:
    lines = [
        '"""GENERATED by tools/fit_ltr.py — do not edit by hand.',
        "",
        "Additive ensemble of depth-2 regression trees fit by",
        f"deterministic L2 gradient boosting ({N_TREES} rounds, learning rate",
        f"{LEARNING_RATE}) over the rescore window's 22 features at the committed",
        f"fixture scale ({FIT_SF_DIR}), against graded term-coverage qrels.",
        "Re-run the script to refit; pytest pins file == refit output.",
        '"""',
        "",
        "LTR_TREES = [",
    ]
    for t in trees:
        lines.append(f"    {t!r},")
    lines.append("]")
    return "\n".join(lines) + "\n"


def main():
    from namegraph_collections_spark.queries.search import LTR_FEATURE_NAMES

    doc_ids, X, rels = load_features()
    trees = fit_trees(X, rels, LTR_FEATURE_NAMES)
    fitted = ndcg_at_k(doc_ids, ensemble_scores(trees, X), rels)
    # the pre-fit hand-set ensemble, kept for the before/after print
    try:
        from namegraph_collections_spark.queries.ltr_model import (
            LTR_TREES as current,
        )

        cur = ndcg_at_k(doc_ids, ensemble_scores(current, X), rels)
        print(f"NDCG@10 current={cur:.6f} fitted={fitted:.6f}")
    except ImportError:
        print(f"NDCG@10 fitted={fitted:.6f}")
    out = render_model(trees)
    with open(MODEL_PATH, "w") as f:
        f.write(out)
    print(f"wrote {os.path.normpath(MODEL_PATH)} ({len(trees)} trees)")


if __name__ == "__main__":
    main()
