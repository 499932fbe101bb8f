"""The guard the driver's CORRECTNESS check mirrors (SURVEY §5.3):
every registered query must match its DuckDB oracle on row count,
column names, and order-insensitive values."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from bdt_enwikisearch_hadoop_spark.registry import ORACLES, QUERIES
from bdt_enwikisearch_hadoop_spark.testing import check_query, lint_rows_only_schema


def test_contract_wired():
    """queries()/oracle_sql() must expose the registry (round-1 postmortem)."""
    assert entrymod.queries() == QUERIES
    assert len(entrymod.queries()) >= 6
    for key in entrymod.oracle_sql():
        assert key in QUERIES


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, sf_dir, key):
    problems = check_query(spark, oracle, key, sf_dir)
    assert not problems, problems


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_schema_is_flat(spark, sf_dir, key):
    """Every rows-only (no-oracle) result must be scalar-typed: the
    driver canonicalizes by sorting all columns and crashes on
    array/map/struct cells (the round-2 d13 failure)."""
    problems = lint_rows_only_schema(QUERIES[key](spark, sf_dir))
    assert not problems, problems
