"""Every registered query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from namegraph_collections_spark.queries import REGISTRY
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    result = compare(spark, sf_dir, name, spec.fn, spec.oracle)
    assert result["ok"], result
