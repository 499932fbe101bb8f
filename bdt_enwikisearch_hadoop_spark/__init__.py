"""PySpark-native analytics/search engine.

A clean-room, Spark-first engine with the query surface of the reference
project ``sangecz/bdt-enwikisearch-hadoop`` (a Hadoop-MapReduce Wikipedia
search / batch-indexing workload), extended with the relational, streaming
and LLM-data-pipeline operators mandated by SURVEY.md §2.

Design (SURVEY.md §7): this package is a library of DataFrame-building
functions — Catalyst is the planner. Python touches row data only in the
UDF-surface module. Every declared query is registered via
:mod:`.registry` together with an ANSI-SQL oracle runnable by DuckDB over
the same parquet fixtures.
"""

from . import registry  # noqa: F401
from .session import get_spark, prepare  # noqa: F401

# Importing these modules populates the query registry.  Only modules
# that actually exist may appear here (a phantom import here breaks the
# entire package — round-1 postmortem).
from .operators import (  # noqa: F401
    scans,
    project_filter,
    joins,
    aggregates,
    windows,
    sorts,
    setops,
)
from .functions import (  # noqa: F401
    scalar,
    text_search,
    llm_pipeline,
    llm_scale,
    ann,
    dataset_ops,
    link_graph,
    index_store,
    multimodal,
    udf_surface,
)
from .streaming import events  # noqa: F401

__all__ = ["registry", "get_spark", "prepare"]
