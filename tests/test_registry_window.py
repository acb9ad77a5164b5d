"""Guard the driver's correctness window.

The external driver value-checks the FIRST 50 registry entries in
insertion order; every §2 operator's driver-green evidence lives in
those rows. The window is now an explicit list
(queries/__init__.py:DRIVER_WINDOW) applied by reordering the
registry — this test pins that list against the round-4 driver-checked
set plus the ROUND-5 DELIBERATE DELTA, so an accidental edit to either
the list or a module's registrations can't silently swap rows out of
the window and downgrade their evidence to local-only.

Round-5 delta (VERDICT r4 "Next round" #1):
- curate_names + name_regex_filters + strip_suffix_and_extract →
  composited into string_ops_battery (all three operators' value
  hashes ride one row; singles remain registered post-window);
- status_histogram → post-window (A6 already executes inside the
  wiki_documents composite, window position 2);
- freed slots promote asof_join_chunked_events, bipartite_pagerank,
  kmv_distinct_sketch into positions 48–50.
"""

from __future__ import annotations

import json
import os

from namegraph_collections_spark.queries import DRIVER_WINDOW, REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW_SIZE = 50

PROMOTED = ["asof_join_chunked_events", "bipartite_pagerank", "kmv_distinct_sketch"]
COMPOSITED = ["curate_names", "name_regex_filters", "strip_suffix_and_extract"]
DEMOTED = ["status_histogram"]


def _expected_window() -> list[str]:
    with open(os.path.join(_REPO, "CORRECTNESS_r04.json")) as f:
        r4 = list(json.load(f))
    assert len(r4) == WINDOW_SIZE
    out: list[str] = []
    for name in r4:
        if name in DEMOTED or name in COMPOSITED[1:]:
            continue
        out.append("string_ops_battery" if name == COMPOSITED[0] else name)
    out.extend(PROMOTED)
    return out


def test_window_is_the_r4_set_plus_the_deliberate_r5_delta():
    expected = _expected_window()
    assert len(expected) == WINDOW_SIZE
    assert DRIVER_WINDOW == expected
    assert list(REGISTRY)[:WINDOW_SIZE] == expected


def test_composited_singles_stay_registered_after_the_window():
    tail = list(REGISTRY)[WINDOW_SIZE:]
    for name in COMPOSITED + DEMOTED:
        assert name in tail, f"{name} lost its local-sweep parity check"


def test_every_entry_has_an_oracle():
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert missing == []
