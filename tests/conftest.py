from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from namegraph_collections_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("ngcs-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def write_single_parquet(df, dest):
    """Write ``df`` as exactly one parquet FILE at ``dest`` (not a
    directory) — the landing-zone fixture shape the streaming and
    schema-evolution tests feed one file at a time."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="one_parquet_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], dest)
    shutil.rmtree(tmp)
