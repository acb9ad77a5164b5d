#!/usr/bin/env python3
"""Diff two bench result files query-by-query.

Usage: python3 tools/compare_bench.py OLD.json NEW.json [--flag 1.5]

Accepts either the raw one-line bench.py output or the driver's
BENCH_r{N}.json wrapper (with the payload under "parsed"). Prints one
row per query present in either file, the ratio new/old, and flags
ratios beyond the threshold — the honest way to read round-over-round
numbers on this host is WITH the caveat that single-query swings under
~2x are routinely hypervisor noise (re-measure interleaved in one
session before believing them; see the bench loop's comment).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' payload found")
    return d


def main() -> None:
    argv = sys.argv[1:]
    flag = 1.5
    if "--flag" in argv:
        i = argv.index("--flag")
        if i + 1 >= len(argv):
            raise SystemExit(__doc__)
        flag = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if len(argv) != 2:
        raise SystemExit(__doc__)
    args = argv
    old, new = _load(args[0]), _load(args[1])
    oq, nq = old["queries"], new["queries"]
    names = sorted(set(oq) | set(nq), key=lambda n: -(nq.get(n) or 0))
    print(f"{'query':36s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    shared_old = shared_new = 0.0
    for n in names:
        o, v = oq.get(n), nq.get(n)
        if o is not None and v is not None:
            shared_old += o
            shared_new += v
            r = v / o if o else float("inf")
            mark = "  <<<" if r > flag or r < 1 / flag else ""
            print(f"{n:36s} {o:8.3f} {v:8.3f} {r:7.2f}{mark}")
            continue
        # A null timing means the query RAN AND FAILED in that round
        # (bench.py's fault-isolation path); absence from the dict
        # means it wasn't in that round's headline. Say which.
        def _cell(side, present):
            if not present:
                return "absent"
            return "FAILED" if side is None else f"{side:.3f}"
        print(
            f"{n:36s} {_cell(o, n in oq):>8} {_cell(v, n in nq):>8}"
            + ("   regressed to failing" if n in oq and o is not None and v is None and n in nq else "")
        )
    if shared_old:
        print(
            f"\nshared-query totals: old={shared_old:.2f}s new={shared_new:.2f}s "
            f"ratio={shared_new / shared_old:.2f}"
        )


if __name__ == "__main__":
    main()
