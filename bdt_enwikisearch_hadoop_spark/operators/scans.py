"""§2.A — scans, sources, sinks.

Scale notes (100 TB): these queries are pure scan-shape — no shuffle at
all.  Catalyst pushes the a3 predicate into the Parquet reader
(``PushedFilters``) and prunes columns (``ReadSchema``), so a
1000-executor cluster reads only the needed row groups/columns.  The
partitioned sink below is the layout that enables partition pruning for
downstream readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from ..sources import load


@query(
    "a1_scan_full",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def a1_scan_full(spark, sf_dir) -> DataFrame:
    """Full table scan with a fixed column order."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query(
    "a2_scan_project",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def a2_scan_project(spark, sf_dir) -> DataFrame:
    """Column pruning: the Parquet ReadSchema must contain only these two."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "a3_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def a3_scan_filter_pushdown(spark, sf_dir) -> DataFrame:
    """Predicate pushed into the Parquet scan (verify via .explain)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


def write_partitioned_parquet(df: DataFrame, path: str, partition_col: str = "lang") -> None:
    """Partitioned Parquet sink (smoke-checked in tests, no oracle — side effect).

    At scale the partition column choice drives partition pruning for
    every downstream query filtering on it.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
