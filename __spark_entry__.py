"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

These three functions are thin views over
:mod:`bdt_enwikisearch_hadoop_spark.registry`: every operator module
registers itself with the ``@query`` decorator on import, so the dicts
returned here are always the full implemented inventory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the driver's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bdt_enwikisearch_hadoop_spark as engine  # noqa: E402  (populates registry)
from bdt_enwikisearch_hadoop_spark.registry import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: flagship = the reference's raison d'être: conjunctive TF-IDF search
#: (SURVEY §2.I i6, §7 M1).  Falls back to the full scan if the search
#: module is not yet registered, so smoke never regresses mid-build.
_FLAGSHIP_KEYS = ("i6_search_and", "a1_scan_full")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    engine.prepare(spark)
    for key in _FLAGSHIP_KEYS:
        if key in QUERIES:
            return QUERIES[key](spark, SMOKE_SF_DIR)
    raise RuntimeError("registry is empty — no flagship query available")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per key (omitted ⇒ rows-only)."""
    return dict(ORACLES)
