"""Query registry — the single source of truth for the driver contract.

Every declared operator from SURVEY.md §2 registers itself here as

* a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first impl), and
* optionally an ANSI-SQL oracle string runnable by DuckDB 1.0 over the
  same parquet tables (pre-registered views ``region nation customer
  supplier part orders lineitem events documents embeddings``).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
these dicts, so adding a query is one decorated function.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is the equivalent DuckDB SQL; omit it for genuinely
    non-SQL-expressible ops (driver then records a rows-only check).
    """

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")

        def prepared(spark, sf_dir):
            # the driver calls queries() callables on ITS OWN session,
            # which entry() may or may not have prepared first — any
            # tz-/conf-dependent expression (date_trunc, unix_timestamp,
            # JSON timestamp formats) silently drifts from the UTC-naive
            # DuckDB oracle on a non-UTC session.  prepare() is
            # idempotent and cheap, so apply it at every call site.
            from .session import prepare

            prepare(spark)
            return fn(spark, sf_dir)

        prepared.__name__ = fn.__name__
        prepared.__doc__ = fn.__doc__
        prepared.__wrapped__ = fn
        QUERIES[name] = prepared
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        fn.query_name = name
        prepared.query_name = name
        return fn

    return deco
