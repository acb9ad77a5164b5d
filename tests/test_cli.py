"""The `python -m namegraph_collections_spark` CLI surface."""

from __future__ import annotations

import io
from contextlib import redirect_stderr, redirect_stdout

from namegraph_collections_spark.__main__ import main


def test_list_prints_whole_registry():
    from namegraph_collections_spark.queries import REGISTRY

    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["list"]) == 0
    assert out.getvalue().split() == list(REGISTRY)


def test_oracle_prints_sql():
    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["oracle", "pricing_summary"]) == 0
    assert "l_returnflag" in out.getvalue()


def test_unknown_query_is_an_error():
    err = io.StringIO()
    with redirect_stderr(err):
        assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in err.getvalue()


def test_run_writes_parquet(spark, tmp_path):
    # reuses the session fixture's JVM; get_spark returns the active one
    out = io.StringIO()
    with redirect_stdout(out):
        rc = main(
            [
                "--sf-dir",
                "/root/testdata/sf0.001",
                "run",
                "status_histogram",
                "--out",
                str(tmp_path / "out"),
            ]
        )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "out")).count() > 0
