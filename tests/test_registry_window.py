"""Guard the driver's correctness window.

The external driver value-checks the FIRST 50 registry entries in
insertion order; every §2 operator's driver-green evidence lives in
those rows. A refactor that reorders imports in queries/__init__.py
(or registers a new query in the middle) would silently swap rows out
of the window and downgrade their evidence to local-only — this pins
the window to the round-3 driver-checked set, byte for byte. New
queries belong AFTER position 50 (see queries/__init__.py).
"""

from __future__ import annotations

import json
import os

from namegraph_collections_spark.queries import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_WINDOW = 50


def test_first_fifty_entries_match_the_driver_checked_set():
    with open(os.path.join(_REPO, "CORRECTNESS_r03.json")) as f:
        driver_rows = list(json.load(f))
    assert list(REGISTRY)[:DRIVER_WINDOW] == driver_rows


def test_every_entry_has_an_oracle():
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert missing == []
