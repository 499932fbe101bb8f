"""Shared fixtures: one SparkSession + one DuckDB connection per run.

SF defaults to sf0.001 for speed; set BDT_TEST_SF_DIR to run the same
suite at sf0.01 (the driver's correctness scale).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("BDT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bdt_enwikisearch_hadoop_spark.session import get_spark

    s = get_spark(shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    from bdt_enwikisearch_hadoop_spark.testing import duckdb_connect

    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
