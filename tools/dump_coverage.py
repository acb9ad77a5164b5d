"""Emit COVERAGE.json — the operator -> driver-row provenance map.

Round-10 artifact (VERDICT r9 #4): batteries carry ~40 riders across
their composite rows, and the only machine-readable record of "which
driver row value-hashes operator X" used to be greps over
queries/batteries.py. This tool derives the map from the registry
itself, using the battery construction rule the test suite pins: a
composite EMBEDS each component's oracle VERBATIM, so "operator X's
output is value-hashed by window row W" is exactly "X's oracle text
appears inside W's oracle text". No hand-maintained list to drift.

Output shape:
  registry_size / window_size — artifact-vs-HEAD consistency checks
  operators[name] = {kind, hosts, has_oracle}
    kind: window_row  — the driver hashes this query directly
          battery_leg — hashed inside the listed window-row hosts
          local_only  — NO driver row hashes it (the r8 c4_line_filter
                        / r9 lsh_tuning_eval gap class; the registry
                        test asserts this list stays EMPTY)
  local_only — the flattened gap list, for the eyeball diff

Run: python tools/dump_coverage.py [out.json]  (defaults to
repo-root COVERAGE.json). tests/test_registry_window.py asserts the
committed artifact matches a fresh derivation at HEAD.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def derive_coverage() -> dict:
    from namegraph_collections_spark.queries import DRIVER_WINDOW, REGISTRY

    window = list(DRIVER_WINDOW)
    operators: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        if name in window:
            operators[name] = {
                "kind": "window_row",
                "hosts": [name],
                "has_oracle": spec.oracle is not None,
            }
            continue
        hosts = sorted(
            w
            for w in window
            if spec.oracle is not None
            and REGISTRY[w].oracle is not None
            and spec.oracle in REGISTRY[w].oracle
        )
        operators[name] = {
            "kind": "battery_leg" if hosts else "local_only",
            "hosts": hosts,
            "has_oracle": spec.oracle is not None,
        }
    # Second pass: a still-uncovered COMPOSITE whose every embedded
    # component oracle is itself covered is "superseded" — its output
    # is the tagged union of legs the driver already value-hashes
    # elsewhere (the one instance: sketch_stats_battery, kept
    # registered after the round-9 bisect split its six legs across
    # sketch_probe_battery + skew_salt_trim_battery).
    for name, spec in REGISTRY.items():
        if operators[name]["kind"] != "local_only" or spec.oracle is None:
            continue
        components = [
            c
            for c, cspec in REGISTRY.items()
            if c != name
            and cspec.oracle is not None
            and cspec.oracle in spec.oracle
        ]
        if components and all(
            operators[c]["kind"] in ("window_row", "battery_leg")
            for c in components
        ):
            operators[name] = {
                "kind": "superseded_composite",
                "hosts": sorted(
                    {h for c in components for h in operators[c]["hosts"]}
                ),
                "has_oracle": True,
                "components": sorted(components),
            }
    return {
        "registry_size": len(REGISTRY),
        "window_size": len(window),
        "operators": operators,
        "local_only": sorted(
            n for n, c in operators.items() if c["kind"] == "local_only"
        ),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "COVERAGE.json"
    )
    cov = derive_coverage()
    with open(out_path, "w") as f:
        json.dump(cov, f, indent=1, sort_keys=True)
        f.write("\n")
    legs = sum(1 for c in cov["operators"].values() if c["kind"] == "battery_leg")
    print(
        f"registry={cov['registry_size']} window={cov['window_size']} "
        f"battery_legs={legs} local_only={cov['local_only']}"
    )


if __name__ == "__main__":
    main()
