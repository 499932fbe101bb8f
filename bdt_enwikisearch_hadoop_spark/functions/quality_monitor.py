"""Pipeline observability: data-quality metrics that ride the pass.

At 100 TB a second "count the nulls" scan costs as much as the job
itself.  ``Observation`` attaches aggregate metrics to a plan node; they
are computed BY the action that executes the plan (accumulator-style,
per-task, merged on the driver), so row counts / null rates / value
bounds for every pipeline stage come out of the one pass the pipeline
already makes.  This is the Spark-native form of the row-count /
bad-record counters a production ingest job exports to its monitoring
system.

Scope note: an Observation reflects the rows that actually FLOW through
its node in that action — exactly what a quality monitor wants (post-
filter, post-join reality, not table-level statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observe_quality(
    df: DataFrame, name: str, cols: list[str]
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count/min/max metrics.

    Returns the instrumented DataFrame and the Observation; read
    ``observation.get`` after any action on the returned frame.  Metrics
    are plain Catalyst aggregates — JVM-side, no extra pass, no Python.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        metrics.append(F.min(c).alias(f"{c}__min"))
        metrics.append(F.max(c).alias(f"{c}__max"))
    return df.observe(obs, *metrics), obs
