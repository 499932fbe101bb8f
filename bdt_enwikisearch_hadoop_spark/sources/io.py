"""Parquet table loaders (SURVEY.md §2.A sources).

All fixture tables are columnar Parquet; loading is a metadata-only
operation (lazy scan).  Catalyst handles column pruning and predicate
pushdown into the vectorized Parquet reader automatically, so loaders
stay dumb on purpose — *never* ``.cache()`` or materialize here.

The one schema repair lives here, and it is dtype-aware because the
fixtures have shipped ``events.ts`` in two encodings across rounds:

* Parquet ``TIMESTAMP(NANOS)`` read as BIGINT epoch-ns (under
  ``spark.sql.legacy.parquet.nanosAsLong=true``, see :mod:`..session`);
* native ``timestamp[us]`` (TIMESTAMP_NTZ, the current fixtures).

Either way ``load`` normalizes to the same two-column contract every
downstream operator relies on: raw ``ts`` as BIGINT epoch-ns (exact
integer ordering/arithmetic — gap logic, watermark cutoffs, funnel
windows all do exact ns math on it) and ``ts2`` as a µs TIMESTAMP for
ordinary time functions.  The µs fixtures convert exactly:
``unix_micros(ts) * 1000`` loses nothing because the source has µs
precision.

At 100 TB these loaders are unchanged: ``sf_dir`` becomes an object-store
prefix and the same ``spark.read.parquet`` scales out; partition pruning
applies when sinks write ``partitionBy`` layouts (see operators.scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prepare

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


#: per-session plan cache: DataFrames are immutable logical plans, so
#: re-serving one skips the file-listing/footer-read Spark repeats on
#: every spark.read.parquet (measurable when a driver runs ~90 queries
#: back to back).  Keyed by applicationId — a stable identity that a
#: new session can never inherit from a stopped one (id(spark) can be
#: reused by CPython after GC, which would serve a DataFrame bound to
#: a dead session).
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; events gets the ts2 repair."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    prepare(spark)
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            # NANOS-encoded fixtures fail at plan/read time unless the
            # legacy conf took; force schema resolution here so the
            # diagnostic below fires inside load(), not deep in a query.
            df.schema
    except Exception as exc:  # noqa: BLE001 — re-raise with diagnosis
        if name == "events" and "PARQUET_TYPE_ILLEGAL" in str(exc):
            raise RuntimeError(
                "events.parquet is TIMESTAMP(NANOS)-encoded and the "
                "session could not apply "
                "spark.sql.legacy.parquet.nanosAsLong=true (prepare() "
                "sets it best-effort; it may be startup-only in this "
                "deployment). Start the session with that conf, or "
                "re-encode the fixture as timestamp[us]."
            ) from exc
        raise
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type.startswith("timestamp"):
            # µs-precision TIMESTAMP fixture (arrives as TIMESTAMP_NTZ):
            # cast to TIMESTAMP first — session tz is pinned UTC so the
            # instant is unchanged, and ts2 keeps the same LTZ type the
            # NANOS path produces via timestamp_micros.  Rebuild exact
            # BIGINT epoch-ns (µs*1000 is lossless at µs precision).
            ts_ltz = F.col("ts").cast("timestamp")
            df = (
                df.withColumn("ts2", ts_ltz)
                .withColumn("ts", F.unix_micros(ts_ltz) * F.lit(1000))
            )
        else:
            # BIGINT epoch-ns fixture: ns→µs with FLOOR-division semantics
            # in exact integer arithmetic (pmod is always >= 0, so this
            # floors for negative epochs too, matching DuckDB's native
            # TIMESTAMP_NS truncation; plain ts/1000 would go through
            # double and lose precision at 1e18 ns)
            df = df.withColumn(
                "ts2",
                F.timestamp_micros(
                    F.expr("CAST((ts - pmod(ts, 1000)) DIV 1000 AS LONG)")
                ),
            )
    _PLAN_CACHE[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


#: build-once / serve-many MATERIALIZED intermediates, keyed like
#: _PLAN_CACHE by (applicationId, sf_dir, tag).  Holds eagerly
#: localCheckpoint-ed DataFrames — the local stand-in for the persisted
#: table boundary a production pipeline writes between stages.
_MATERIALIZED: dict[tuple[str, str, str], DataFrame] = {}

#: wall-clock seconds spent BUILDING each materialized intermediate,
#: keyed like _MATERIALIZED by (applicationId, sf_dir, tag) — the SAME
#: key, so a tag rebuilt in a new session adds a new entry instead of
#: overwriting the old one (an overwrite would make the sum-delta
#: nested accounting below subtract only the new-minus-old difference
#: and over-bill the parent tag).  bench.py bills these into its
#: headline total: min-of-N per-key timing would otherwise discard the
#: one-time build cost entirely (run 1 builds, run 2 serves, min keeps
#: run 2) — per-key numbers stay steady-state (what a pipeline reading
#: persisted tables pays) while the total still owns the build.
MATERIALIZE_SECONDS: dict[tuple[str, str, str], float] = {}


#: the zero-arg build callable last registered per (sf_dir, tag) —
#: recorded on EVERY materialized() call (cache hit or miss) so the
#: builder-plan lint (tests/test_plans.py) can re-plan each tag's RAW
#: build DataFrame and hold it to the same physical invariants as the
#: serving plans, which otherwise only ever see the checkpoint scan.
RAW_BUILDERS: dict[tuple[str, str], object] = {}


def _advisory_partition_bytes(spark: SparkSession) -> int:
    """AQE's advisory post-shuffle partition size (default 64MB) —
    reused as the sizing rule for materialized sidecars so the engine
    has ONE notion of 'a reasonably sized partition'."""
    raw = str(
        spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        )
    ).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
    for suffix, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30)):
        if raw.endswith(suffix):
            return int(raw[: -2]) * mult
    if raw and raw[-1] in units:
        return int(raw[:-1]) * units[raw[-1]]
    return int(raw)


def _compacted(spark: SparkSession, got: DataFrame, before_ids) -> DataFrame:
    """Size-adapt a freshly checkpointed sidecar: a production stage
    writes its persisted table in advisory-sized chunks (guide: output
    files 128MB-1GB, post-shuffle partitions ~advisory size), but a
    local build inherits its BUILD parallelism — e.g. a 1 MB band
    table arriving as 32 shards of ~600 rows because the expensive
    signature pass upstream ran rebalanced across every core.  Each
    downstream aggregate/join task over such a shard pays a fixed
    per-task setup cost (hash-agg page acquisition + codegen instance
    + scheduling: measured ~40-80 ms executor CPU per task on this
    box) that dwarfs its sub-ms of real work — j83's two one-row
    audits over two tiny checkpoints floored at 2.2-5.2 s executor
    CPU for ~36k input rows before this, 0.1-0.3 s after.

    Sizing uses the ACTUAL cached block bytes from the block manager
    (deserialized in-memory size — errs toward MORE partitions than
    the serialized advisory would, the safe side), found by diffing
    RDDStorageInfo around the build; falls back to plan-stats, then to
    no compaction.  Coalesce only (never widen): consumers that do
    CPU-heavy per-row work over a compacted sidecar re-spread it with
    ``rebalance()`` — the documented idiom for exactly that case."""
    try:
        parts = got.rdd.getNumPartitions()
        if parts <= 1:
            return got
        jsc = spark.sparkContext._jsc.sc()
        new_infos = [
            i
            for i in jsc.getRDDStorageInfo()
            if i.id() not in before_ids and i.numCachedPartitions() > 0
        ]
        if new_infos:
            # the build's own checkpoint is the newest cached RDD in
            # the window (nested materialized() tags checkpoint first)
            mine = max(new_infos, key=lambda i: i.id())
            nbytes = int(mine.memSize()) + int(mine.diskSize())
        else:
            nbytes = int(
                got._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        advisory = _advisory_partition_bytes(spark)
        target = max(1, -(-nbytes // advisory))
        if target >= parts:
            return got
        compact = got.coalesce(int(target)).localCheckpoint(eager=True)
        try:  # free the wide copy's blocks (best-effort: the compact
            # checkpoint holds its own data, so the original is dead)
            if new_infos:
                jsc.persistentRdds().get(mine.id()).get().unpersist(False)
        except Exception:
            pass
        return compact
    except Exception:
        return got


def materialized(spark: SparkSession, sf_dir: str, tag: str, build) -> DataFrame:
    """Serve a shared heavy intermediate (LSH pair table, dedup keeper
    set, classifier z-scores, kNN edge list …) built ONCE per
    (session, scale-factor) and truncated to a materialized RDD via
    eager ``localCheckpoint``.

    This is the i35 discipline promoted to a first-class boundary: at
    100 TB a curation pipeline runs its dedup/scoring stages once and
    every downstream report READS THE PERSISTED TABLE — it never
    re-executes the producing pipeline per report.  Locally the
    checkpoint plays the persisted table's role, so composed keys
    (j54/j60/j67/j68 over the j8/j32 pair and keeper tables) cost
    report-sized work instead of one full pipeline re-run each.

    Keyed by ``applicationId`` for the same reason as ``_PLAN_CACHE``:
    a new session can never inherit a checkpoint pinned to a stopped
    session's executors.  ``build`` must be a zero-arg callable
    returning the DataFrame to materialize."""
    RAW_BUILDERS[(sf_dir, tag)] = build
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    got = _MATERIALIZED.get(key)
    if got is None:
        import time

        # Bill only this tag's OWN build time: a build() that itself
        # calls materialized() (e.g. lsh_pair_table building on
        # doc_shingle_sets) must not double-count the nested build —
        # the nested call records its own entry, so subtract whatever
        # landed in MATERIALIZE_SECONDS while build() ran.
        nested_before = sum(MATERIALIZE_SECONDS.values())
        t0 = time.perf_counter()
        before_ids = set()
        try:
            before_ids = {
                i.id()
                for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            }
        except Exception:
            pass
        got = build().localCheckpoint(eager=True)
        got = _compacted(spark, got, before_ids)
        elapsed = time.perf_counter() - t0
        nested = sum(MATERIALIZE_SECONDS.values()) - nested_before
        MATERIALIZE_SECONDS[key] = round(max(elapsed - nested, 0.0), 3)
        _MATERIALIZED[key] = got
    return got


def rebalance(df: DataFrame) -> DataFrame:
    """Round-robin the rows across the cluster before a CPU-heavy
    narrow stage (per-row hashing, Arrow-batch matmul).  A compacted
    corpus can arrive as one fat row group, which pins everything up to
    the first shuffle onto one task; one input-sized exchange here buys
    full parallelism for the expensive stage.  Use ONLY in front of
    stages whose per-row cost dwarfs a row's shuffle cost — scans that
    feed a cheap filter/aggregate should stay exchange-free."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (§2.A source-format capability; header on, overwrite)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def load_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV source with an EXPLICIT schema — never inferSchema at scale
    (inference is a full extra pass over the data)."""
    prepare(spark)
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (§2.A source-format capability)."""
    df.write.mode("overwrite").json(path)


def load_json(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an explicit schema (same rule as CSV)."""
    prepare(spark)
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (§2.A source-format capability).  ORC is the other
    columnar container Spark ships a vectorized, predicate-pushdown
    reader for — same pruning/pushdown behavior as parquet, preserves
    nested types exactly (unlike CSV), and interoperates with
    Hive-era warehouses."""
    df.write.mode("overwrite").orc(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source.  Schema comes from the ORC footer (columnar formats
    are self-describing — the explicit-schema rule is for text formats
    whose inference costs a full data pass)."""
    prepare(spark)
    return spark.read.orc(path)
