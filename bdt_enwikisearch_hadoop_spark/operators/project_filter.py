"""§2.B — projection, computed expressions, predicates, NULL semantics.

All expressions stay inside WholeStageCodegen (no Python); per-row double
arithmetic is bitwise-identical across engines so only aggregated floats
need the §2.0 rounding discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from ..sources import load


@query(
    "b1_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS gross,
           CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def b1_project_expr(spark, sf_dir) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4).alias("gross"),
        F.when(F.col("l_quantity") >= 25, F.lit("bulk")).otherwise(F.lit("small")).alias("qty_class"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_or_none"),
    )


@query(
    "b2_filter_compound",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND NOT (o_orderpriority LIKE '%LOW%')
    """,
)
def b2_filter_compound(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(10000, 200000)
        & ~F.col("o_orderpriority").like("%LOW%")
    ).select("o_orderkey", "o_totalprice")


@query(
    "b3_filter_null_semantics",
    oracle="""
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_discount, 0.0) AS disc_n,
               NULLIF(l_tax, 0.0) AS tax_n
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           (disc_n IS NULL) AS disc_is_null,
           (disc_n IS NOT DISTINCT FROM tax_n) AS eq_null_safe,
           COALESCE(disc_n, -1.0) AS disc_or_default
    FROM t
    """,
)
def b3_filter_null_semantics(spark, sf_dir) -> DataFrame:
    """Fixtures have no NULLs — synthesize them, then exercise 3VL."""
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_n"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_n"),
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        F.col("disc_n").isNull().alias("disc_is_null"),
        F.col("disc_n").eqNullSafe(F.col("tax_n")).alias("eq_null_safe"),
        F.coalesce(F.col("disc_n"), F.lit(-1.0)).alias("disc_or_default"),
    )
