"""SparkSession construction and per-session normalization.

Two concerns live here:

1. ``get_spark`` — build a local session with scale-aware defaults
   (AQE on, UTC, modest shuffle parallelism for local mode).
2. ``prepare`` — normalize *any* session (including one handed to us by
   an external driver) so the fixture tables are readable and
   comparisons against the DuckDB oracle are deterministic.  All of the
   confs set here are runtime-settable SQL confs, verified on Spark
   4.1.2, so this is safe to call on an already-running session.

Fixture-encoding note (SURVEY.md §2.0 rule 2): ``events.parquet`` has
shipped ``ts`` two ways across fixture refreshes — Parquet
``TIMESTAMP(NANOS)`` (needs ``spark.sql.legacy.parquet.nanosAsLong=true``
or Spark 4.x refuses the read with ``PARQUET_TYPE_ILLEGAL``) and native
``timestamp[us]`` (the current fixtures, no conf needed).  We still set
the legacy conf best-effort so a NANOS fixture remains readable, but it
is no longer mandatory: ``sources.io.load`` branches on the dtype it
actually observes and normalizes either encoding to the same
(bigint-ns ``ts``, µs-timestamp ``ts2``) contract.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: runtime-settable confs applied to every session we touch.
_RUNTIME_CONFS = {
    # best-effort back-compat: lets a TIMESTAMP(NANOS)-encoded events
    # fixture load as BIGINT ns; inert on the current µs fixtures
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # determinism: all time derivations must agree with DuckDB's naive
    # timestamps, which behave like UTC instants under epoch()/time_bucket()
    "spark.sql.session.timeZone": "UTC",
    # scale: runtime re-planning (coalesce small shuffle partitions,
    # skew-join splitting) — on by default in 4.x but pin it anyway
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # serving: keep bucketed scans ON even when no join/agg needs the
    # distribution — DisableUnnecessaryBucketedScan would otherwise
    # turn off bucket PRUNING too (measured: the dedup/postings probe's
    # `bk IN (...)` read shows "SelectedBucketsCount: 4 out of 16" with
    # this off vs "Bucketed: false (disabled by query planner)" and a
    # 16-file scan with it on).  Trade-off: a full scan of a bucketed
    # table reads one task per bucket instead of splitting by
    # maxPartitionBytes — acceptable here because every bucketed table
    # this engine writes is an index store whose bucket count is sized
    # to the consumer parallelism (index_store module docstring).
    "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
    # NOTE: spark.sql.cteRecursionRowLimit is deliberately NOT raised
    # here.  Spark 4's 1M cumulative-row valve is a toy ceiling for a
    # legitimate hierarchy walk (c24 crossed it at the sf1 rehearsal),
    # but raising it engine-wide lets ANY accidental runaway recursion
    # materialize 100× more rows before refusing — so the only query
    # that needs it (c24_recursive_hierarchy, the sole Spark-side
    # recursive CTE in the engine) sets it in its own builder
    # (operators/joins.py), keeping the engine default conservative.
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session. Idempotent and cheap."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # all confs here are best-effort: the loader handles both
            # events fixture encodings, so nothing is session-fatal
            pass
    return spark


def _default_driver_memory() -> str:
    """Size the local-mode driver heap from what the host can spare.

    local[N] puts all executor threads in the driver JVM, so this is
    the engine's whole execution+storage pool — but a flat "24g"
    (round 14) assumed this 128 GiB box and would fail JVM startup or
    OOM-thrash a 16 GiB dev host.  Take ~40% of MemAvailable (leaving
    the rest for the OS page cache, Python workers, and the DuckDB
    oracle that parity runs host alongside), clamped to [2g, 24g]:
    128 GiB box → 24g (the sf1-rehearsal floor that lets j17's 32
    concurrent hash-agg tasks acquire pages), 16 GiB host → ~5g.
    SPARK_DRIVER_MEMORY overrides; on a real cluster spark-submit owns
    the setting and the builder conf is inert.
    """
    try:
        with open("/proc/meminfo") as fh:
            mem_kb = {
                line.split(":")[0]: int(line.split()[1])
                for line in fh
                if line[:1].isalpha() and line.split()[1:2]
            }
        avail_g = mem_kb.get("MemAvailable", mem_kb.get("MemTotal", 0)) / (
            1024 * 1024
        )
    except Exception:
        return "8g"  # unknown host: the pre-round-14 conservative default
    return f"{max(2, min(24, int(avail_g * 2 // 5)))}g"


def get_spark(app_name: str = "bdt-enwikisearch-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Local-mode parallelism follows ``SPARK_GRAFT_CPUS`` (driver contract)
    when set.  On a real cluster, ``master``/parallelism come from
    spark-submit and these builder confs are harmless.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        # heap sized from host MemAvailable, clamped [2g, 24g] — see
        # _default_driver_memory (8g was a toy default: the sf1
        # rehearsal's j17 quadratic anchor died acquiring its FIRST
        # page at 32 concurrent hash-agg tasks × ~150 MB; 24g on this
        # 128 GiB box gives ~450 MB/task and j17 completes in 373 s)
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY",
                               _default_driver_memory()))
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return prepare(builder.getOrCreate())
