"""§2.F — sorts, limits, top-k (SURVEY.md §2.F; reference parity:
sorted MR output and the query-time top-k list).

Scale notes (100 TB): a global ORDER BY is a range-partitioned shuffle
(sampled boundaries) — fine once, at the very end of a pipeline.
ORDER BY + LIMIT never does that: Catalyst plans
``TakeOrderedAndProject`` — each task keeps a k-row heap, the driver
merges per-task heaps; no global sort, no full shuffle.  That is the
only acceptable global-top-k shape at scale.  Every ordering carries a
unique tiebreaker (§2.0 rule 4) so LIMIT results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from ..sources import load


@query(
    "f1_orderby_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    """,
)
def f1_orderby_multi(spark, sf_dir) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange).  The compare
    is order-insensitive, but this ordering feeds f2/f3."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "f2_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def f2_global_topk(spark, sf_dir) -> DataFrame:
    """Global top-20 → TakeOrderedAndProject (per-task heaps, no global
    sort — verify via .explain)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "f3_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def f3_limit_offset(spark, sf_dir) -> DataFrame:
    """Pagination: rows 11-20 of the same total order."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "f4_nulls_ordering",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri
    FROM orders
    ORDER BY pri NULLS FIRST, o_orderkey
    LIMIT 20
    """,
)
def f4_nulls_ordering(spark, sf_dir) -> DataFrame:
    """Explicit NULLS FIRST ordering under a LIMIT (engines default
    differently: Spark ASC = nulls first, DuckDB ASC = nulls last —
    so the direction must be SPELLED OUT, §2.0 rule 4 applies for the
    unique o_orderkey tiebreaker).  Still TakeOrderedAndProject —
    per-task heaps, no global sort."""
    o = load(spark, sf_dir, "orders")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    return (
        o.select("o_orderkey", pri.alias("pri"))
        .orderBy(F.col("pri").asc_nulls_first(), F.col("o_orderkey"))
        .limit(20)
    )
