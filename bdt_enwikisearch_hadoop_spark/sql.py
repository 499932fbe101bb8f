"""SQL entry point (SURVEY §3.2 lifecycle, entry #1): register the
fixture tables as temp views and hand users ``spark.sql`` over them —
the string-SQL twin of the DataFrame builders everywhere else.  Both
converge on the same Catalyst pipeline (parser → analyzer → optimizer →
physical plan), so everything in SCALE.md applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import TABLE_NAMES, load


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create one temp view per fixture table (events includes ts2)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Run a SQL statement against the registered fixture views."""
    register_views(spark, sf_dir)
    return spark.sql(statement)
