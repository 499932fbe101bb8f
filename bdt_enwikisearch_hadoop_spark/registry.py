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

#: Key numbers that were SKIPPED during authoring and never registered
#: in ANY round (verified: ``git log --all -S"<prefix>_"`` over the full
#: history finds zero commits for each).  They are RESERVED, not free:
#: every external artifact of this engine — BASELINE.md's per-key
#: records, the BENCH_r{N}.json history, the judges' coverage tables —
#: is keyed by name, and a gap number reappearing with brand-new
#: semantics would read as a historical key resurfacing with different
#: results.  ``query()`` refuses them at registration time; the ledger
#: lives in SURVEY.md §8f.  New keys take the next number ABOVE a
#: family's current maximum.
RESERVED_KEY_NUMBERS: frozenset[str] = frozenset(
    {"c28", "e12", "e13", "i24", "i41", "j41", "j75"}
)

#: the number prefix with or without a trailing description — a key
#: registered as the BARE reserved number (``c28``) must trip the
#: refusal exactly like ``c28_anything``
_KEY_NUM_RE = __import__("re").compile(r"([a-z]\d+)(?:_|$)")


def query(name: str, oracle: str | None = None):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is the equivalent DuckDB SQL; omit it for genuinely
    non-SQL-expressible ops (driver then records a rows-only check).
    """

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        m = _KEY_NUM_RE.match(name)
        if m and m.group(1) in RESERVED_KEY_NUMBERS:
            raise ValueError(
                f"query key {name!r} reuses reserved number {m.group(1)} "
                "— that number was never registered in any round and is "
                "held back so historical artifacts keyed by name can "
                "never be confused with new semantics (SURVEY.md §8f); "
                "use the next free number above the family maximum"
            )

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
