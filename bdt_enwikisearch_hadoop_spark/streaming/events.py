"""§2.K — streaming-shaped operators over the events log.

The four declared queries use the batch-expressible form (the driver's
oracle harness is batch); :func:`run_streaming_smoke` and
:func:`run_streaming_dedup_smoke` run the REAL Structured Streaming
surface (file source → watermark → windowed agg / stateful dedup →
sink) and are exercised by the pytest suite.

Scale notes (100 TB / unbounded streams):

* ``k1``/``k2`` batch windows are groupBy on a derived window value —
  one shuffle; in streaming they become incremental stateful aggs whose
  state is bounded by the watermark (10 min here → state holds only
  open windows).
* ``k3`` sessionization is gaps-and-islands: one shuffle on user_id,
  one in-partition sort, cumulative sum — the classic formulation that
  scales linearly with events-per-user.  (The streaming-native
  equivalent is ``session_window``/``transformWithStateInPandas``; the
  portable batch form is declared so the oracle can verify it.)
* ``k4`` keyed dedup = row_number()=1 per key — in streaming this is
  ``dropDuplicates`` with state, demonstrated in the dedup smoke.
* All timestamp arithmetic is exact BIGINT nanoseconds (ts) on the
  Spark side and epoch_ns in DuckDB — no float time math anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import query
from ..sources import load

_NS_PER_S = 1_000_000_000
_GAP_NS = 30 * 60 * _NS_PER_S  # 30-minute session inactivity gap


@query(
    "k1_tumbling",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS bucket_s,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def k1_tumbling(spark, sf_dir) -> DataFrame:
    """1-hour tumbling window per event type; window start emitted as
    epoch seconds (never raw ns, §2.0 rule 2)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts2", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "k2_sliding",
    oracle="""
    WITH ws AS (
        SELECT unnest(generate_series(TIMESTAMP '2023-12-31 23:30:00',
                                      TIMESTAMP '2024-02-01 00:00:00',
                                      INTERVAL 30 MINUTE)) AS w
    )
    SELECT CAST(epoch(w) AS BIGINT) AS win_start_s, COUNT(*) AS n
    FROM ws JOIN events e ON e.ts >= w AND e.ts < w + INTERVAL 1 HOUR
    GROUP BY w
    """,
)
def k2_sliding(spark, sf_dir) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in 2
    windows).  Spark emits only non-empty windows; the oracle mirrors
    that via an inner containment join against generated window starts
    (fixture ts range is 2024-01-01..01-30, covered by the series)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts2", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("win_start_s"), "n")
    )


@query(
    "k3_session",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts, epoch_ns(ts) AS tns,
               CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                      OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > {_GAP_NS}
                    THEN 1 ELSE 0 END AS newf
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sid
        FROM o
    )
    SELECT user_id,
           CAST(sid AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(tns) // {_NS_PER_S} AS start_s,
           (MAX(tns) - MIN(tns)) // {_NS_PER_S} AS dur_s
    FROM s
    GROUP BY user_id, sid
    """,
)
def k3_session(spark, sf_dir) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via
    gaps-and-islands (portable formulation, identical in the oracle —
    deliberately NOT session_window(), SURVEY §2.K)."""
    return sessionize(load(spark, sf_dir, "events"))


def session_ids(e: DataFrame) -> DataFrame:
    """Per-EVENT session assignment (gaps-and-islands): the input frame
    plus a ``sid`` column, 1-based per user.  Extra columns pass
    through — k18 keeps event_type to funnel within each session."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.withColumn(
        "newf",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > _GAP_NS),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("newf").over(wcum))


def sessionize(e: DataFrame) -> DataFrame:
    """k3's core over any (user_id, event_id, ts) frame — separated so
    property tests can drive it with generated logs."""
    flagged = session_ids(e)
    return flagged.groupBy("user_id", F.col("sid").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(f"MIN(ts) DIV {_NS_PER_S}").alias("start_s"),
        F.expr(f"(MAX(ts) - MIN(ts)) DIV {_NS_PER_S}").alias("dur_s"),
    )


@query(
    "k4_dedup_keyed",
    oracle=f"""
    SELECT user_id, event_type, event_id,
           epoch_ns(ts) // {_NS_PER_S} AS first_s
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    """,
)
def k4_dedup_keyed(spark, sf_dir) -> DataFrame:
    """First event per (user, type) — the batch analogue of streaming
    keyed dedup (dropDuplicates with state; see dedup smoke)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.expr(f"ts DIV {_NS_PER_S}").alias("first_s"),
        )
    )


@query(
    "k5_funnel",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
    v AS (SELECT user_id, MIN(tns) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT ev.user_id, MIN(tns) AS t_click
          FROM ev JOIN v USING (user_id)
          WHERE event_type = 'click' AND tns > t_view GROUP BY ev.user_id),
    p AS (SELECT ev.user_id, MIN(tns) AS t_purchase
          FROM ev JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND tns > t_click GROUP BY ev.user_id)
    SELECT v.user_id,
           t_view // {_NS_PER_S} AS view_s,
           t_click // {_NS_PER_S} AS click_s,
           t_purchase // {_NS_PER_S} AS purchase_s
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def k5_funnel(spark, sf_dir) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user, the
    earliest view, the earliest click strictly AFTER that view, and the
    earliest purchase strictly after that click (stage times as epoch
    seconds, NULL where the user never converted).

    Three filtered min-aggregates, each shuffled on user_id — the
    per-stage tables shrink monotonically (only survivors of the prior
    stage are joined), so the dominant cost is the first pass over the
    raw log; everything later touches per-user rows.  All comparisons
    are exact BIGINT nanoseconds; positive-epoch DIV == floor-div."""
    return funnel(load(spark, sf_dir, "events"))


def funnel(e: DataFrame) -> DataFrame:
    """k5's core over any (user_id, event_type, ts) frame — separated
    so property tests can drive it with generated logs."""
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.expr(f"t_view DIV {_NS_PER_S}").alias("view_s"),
            F.expr(f"t_click DIV {_NS_PER_S}").alias("click_s"),
            F.expr(f"t_purchase DIV {_NS_PER_S}").alias("purchase_s"),
        )
    )


@query(
    "k6_retention",
    oracle="""
    WITH acts AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    act AS (SELECT d, COUNT(*) AS n_active FROM acts GROUP BY d),
    ret AS (
        SELECT a.d, COUNT(*) AS n_retained
        FROM acts a JOIN acts b ON b.user_id = a.user_id AND b.d = a.d - 1
        GROUP BY a.d
    )
    SELECT CAST(epoch(CAST(act.d AS TIMESTAMP)) AS BIGINT) AS day_s,
           n_active,
           COALESCE(n_retained, 0) AS n_retained,
           FLOOR(COALESCE(n_retained, 0) * 1.0 / n_active * 10000) / 10000
             AS retention
    FROM act LEFT JOIN ret ON ret.d = act.d
    """,
)
def k6_retention(spark, sf_dir) -> DataFrame:
    """Day-over-day retention: of the users active on day d, the
    fraction also active on d-1 — the classic cohort/engagement metric
    over an event log.

    One distinct-(user, day) pass collapses the raw log (the only
    log-sized shuffle); the self-join then runs on the tiny per-day
    activity table.  Ratio FLOOR-truncated (integer/integer, §2.0
    rule 1)."""
    return retention(load(spark, sf_dir, "events"))


def retention(e: DataFrame) -> DataFrame:
    """k6's core over any (user_id, ts2) frame — separated so property
    tests can drive it with generated logs."""
    acts = e.select("user_id", F.to_date("ts2").alias("d")).distinct()
    act = acts.groupBy("d").agg(F.count(F.lit(1)).alias("n_active"))
    prev = acts.select("user_id", F.date_add("d", 1).alias("d"))
    ret = (
        acts.join(prev, ["user_id", "d"])
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    return (
        act.join(ret, "d", "left")
        .select(
            F.unix_timestamp(F.col("d").cast("timestamp")).alias("day_s"),
            "n_active",
            F.coalesce(F.col("n_retained"), F.lit(0)).alias("n_retained"),
            (
                F.floor(
                    F.coalesce(F.col("n_retained"), F.lit(0))
                    * F.lit(1.0)
                    / F.col("n_active")
                    * 10000
                )
                / 10000
            ).alias("retention"),
        )
    )


@query(
    "k7_error_burst",
    oracle=f"""
    SELECT user_id, event_id,
           (tns - prev_tns) // {_NS_PER_S} AS gap_s
    FROM (
        SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
               lag(event_type) OVER w AS prev_type,
               lag(epoch_ns(ts)) OVER w AS prev_tns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE event_type = 'error' AND prev_type = 'error'
      AND tns - prev_tns <= CAST(300 AS BIGINT) * {_NS_PER_S}
    """,
)
def k7_error_burst(spark, sf_dir) -> DataFrame:
    """Sequence-pattern detection (CEP shape): two CONSECUTIVE error
    events from the same user within 5 minutes — the lag-over-ordered-
    stream formulation of MATCH_RECOGNIZE's simplest pattern.  One
    shuffle on user_id + in-partition sort; in true streaming this is
    per-key state holding only the previous event (see the
    transformWithState smoke)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return flagged.filter(
        (F.col("event_type") == "error")
        & (F.col("prev_type") == "error")
        & (F.col("ts") - F.col("prev_ts") <= 300 * _NS_PER_S)
    ).select(
        "user_id",
        "event_id",
        F.expr(f"(ts - prev_ts) DIV {_NS_PER_S}").alias("gap_s"),
    )


@query(
    "k8_session_window_native",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus,
               CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
                      OR epoch_ns(ts) // 1000
                         - lag(epoch_ns(ts) // 1000) OVER w > {_GAP_NS // 1000}
                    THEN 1 ELSE 0 END AS newf
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        -- event_id tiebreak (SURVEY §2.0 rule 4): same-µs events would
        -- otherwise make the cumsum order — and hence session ids —
        -- nondeterministic; latent under tie-free fixtures, wrong on ties
        SELECT *, SUM(newf) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sid
        FROM o
    )
    SELECT user_id,
           MIN(tus) // 1000000 AS start_s,
           (MAX(tus) + {_GAP_NS // 1000}) // 1000000 AS end_s,
           COUNT(*) AS n_events
    FROM s
    GROUP BY user_id, sid
    """,
)
def k8_session_window_native(spark, sf_dir) -> DataFrame:
    """Spark's NATIVE session_window() sessionization (30-minute gap),
    cross-checked against the same gaps-and-islands closure k3 uses —
    empirically verified this session that session_window merges an
    event exactly gap-later (inclusive), i.e. a new session starts only
    when the gap is STRICTLY exceeded, matching k3's `>` flag.  Window
    end = last event + gap, emitted as truncated epoch seconds.  In
    Structured Streaming the identical expression runs stateful with a
    watermark; in batch (here) it is one shuffle on user_id."""
    e = load(spark, sf_dir, "events")
    sw = e.groupBy(
        F.session_window(F.col("ts2"), "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sw.select(
        "user_id",
        F.unix_timestamp("session_window.start").alias("start_s"),
        F.unix_timestamp("session_window.end").alias("end_s"),
        "n_events",
    )


@query(
    "k9_resample_ffill",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    lastobs AS (SELECT user_id, bucket, value FROM obs WHERE rn = 1),
    span AS (
        SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM span
    ),
    filled AS (
        SELECT g.user_id, g.bucket,
               last_value(l.value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_ffill
        FROM grid g LEFT JOIN lastobs l USING (user_id, bucket)
    )
    SELECT user_id, CAST(epoch(bucket) AS BIGINT) AS bucket_s, value_ffill
    FROM filled
    """,
)
def k9_resample_ffill(spark, sf_dir) -> DataFrame:
    """Per-user resample to a dense 1-hour grid with forward-fill: the
    standard time-series → feature-matrix op (sensor/metric pipelines
    train on regular grids, not raw irregular events).  Per bucket the
    LAST observation wins (ts, event_id tiebreak — unique, §2.0); gaps
    carry the previous value via last(ignorenulls) over an ordered
    per-user window.

    100 TB shape: every stage partitions on user_id — span agg, grid
    explode (sequence() generates in-row, bounded by each user's OWN
    active span, never the global calendar), bucket join, and the
    ffill window all reuse the same key, so AQE coalesces this into a
    user_id-partitioned pipeline with no cross-key traffic; grid rows
    ≈ Σ user-active-hours, linear in the log."""
    return resample_ffill(load(spark, sf_dir, "events"))


def resample_ffill(ev: DataFrame) -> DataFrame:
    """k9's core over any (user_id, ts, ts2, value, event_id) frame —
    separated so property tests can drive it with generated logs."""
    obs = ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts2")).alias("bucket"),
        "value", "ts", "event_id",
    )
    w_last = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    lastobs = (
        obs.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket", "value")
    )
    span = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts2")).alias("lo"),
        F.date_trunc("hour", F.max("ts2")).alias("hi"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(lastobs, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.unix_timestamp("bucket").alias("bucket_s"),
            F.last("value", ignorenulls=True).over(w_fill).alias("value_ffill"),
        )
    )


# ---------------------------------------------------------------------------
# true Structured Streaming (smoke-only capabilities, no oracle)
# ---------------------------------------------------------------------------


def _stream_events(spark, sf_dir: str, workdir: str) -> DataFrame:
    """events as a file-source stream with the ts2 repair.

    The streaming file source requires a DIRECTORY (new files appear →
    new micro-batches); the fixture is a single parquet file, so stage
    it into ``workdir`` first — which doubles as a sink smoke."""
    batch = load(spark, sf_dir, "events").drop("ts2")
    src = f"{workdir}/events_stream_src"
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    return stream.withColumn(
        "ts2", F.timestamp_micros(F.expr("CAST((ts - pmod(ts, 1000)) DIV 1000 AS LONG)"))
    )


def run_streaming_smoke(spark, sf_dir: str) -> int:
    """readStream → watermark → 1h windowed count → memory sink.

    Returns the number of result rows (>0 expected).  Uses complete
    output so a single availableNow batch surfaces every window (append
    would hold windows open until a LATER batch advances the watermark).
    """
    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        return _run_windowed(spark, sf_dir, workdir)


def _run_windowed(spark, sf_dir: str, workdir: str) -> int:
    agg = (
        _stream_events(spark, sf_dir, workdir)
        .withWatermark("ts2", "10 minutes")
        .groupBy(F.window("ts2", "1 hour"), "event_type")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("smoke_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("smoke_windows").count()
    q.stop()
    return n


def run_streaming_dedup_smoke(spark, sf_dir: str) -> int:
    """Stateful streaming dedup: first event per (user_id, event_type),
    append mode (state-backed dropDuplicates) — rows emit in batch 0."""
    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        return _run_dedup(spark, sf_dir, workdir)


def _run_dedup(spark, sf_dir: str, workdir: str) -> int:
    dedup = _stream_events(spark, sf_dir, workdir).dropDuplicates(
        ["user_id", "event_type"]
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("smoke_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("smoke_dedup").count()
    q.stop()
    return n


def run_dedup_within_watermark_smoke(spark, sf_dir: str) -> tuple[int, int]:
    """``dropDuplicatesWithinWatermark``: dedup whose state is EVICTED
    once a key ages past the watermark — the unbounded-stream answer to
    plain ``dropDuplicates``, whose state grows forever (at 100 TB/day
    a keep-all-keys dedup map is itself a scale-killer).  Duplicates
    arriving later than the watermark delay may re-emit, so the result
    is a superset of the exact keyed dedup: returns
    ``(n_within_watermark, n_exact)`` with ``n_within >= n_exact``."""
    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        dedup = (
            _stream_events(spark, sf_dir, workdir)
            .withWatermark("ts2", "10 minutes")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        )
        q = (
            dedup.writeStream.format("memory")
            .queryName("smoke_dedup_wm")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_within = spark.table("smoke_dedup_wm").count()
        q.stop()
        n_exact = (
            load(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .distinct()
            .count()
        )
        return n_within, n_exact


def run_update_mode_smoke(spark, sf_dir: str) -> tuple[int, int]:
    """Update output mode: each micro-batch emits only the windows that
    CHANGED — the incremental-sink mode between append (final-only) and
    complete (everything, unboundedly re-written).  With a single
    availableNow batch every window is new, so the update-mode emission
    must equal the batch-computed window count; returns
    ``(n_update_rows, n_batch_windows)``."""
    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        agg = (
            _stream_events(spark, sf_dir, workdir)
            .withWatermark("ts2", "10 minutes")
            .groupBy(F.window("ts2", "1 hour"), "event_type")
            .count()
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("smoke_update_mode")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_update = spark.table("smoke_update_mode").count()
        q.stop()
        n_batch = (
            load(spark, sf_dir, "events")
            .groupBy(F.window("ts2", "1 hour"), "event_type")
            .count()
            .count()
        )
        return n_update, n_batch


def run_stateful_count_smoke(spark, sf_dir: str,
                             rocksdb: bool = False) -> int:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count (the 'stateful map' capability row of
    SURVEY §2.K).  State = one counter per user key, update mode.

    ``rocksdb=True`` runs the identical query on
    ``RocksDBStateStoreProvider`` — the store the Spark-4-native
    transformWithState API mandates.  applyInPandasWithState does NOT
    need protobuf, so this exercises the RocksDB-backed state path in
    this container even while the native-API smoke stays skipped
    (VERDICT r14 #6): the remaining skip covers only the API's
    protobuf wire protocol, not the store or the stateful semantics.
    """
    import tempfile

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_count(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        with tempfile.TemporaryDirectory() as workdir:
            counted = (
                _stream_events(spark, sf_dir, workdir)
                .groupBy("user_id")
                .applyInPandasWithState(
                    update_count,
                    outputStructType="user_id long, n long",
                    stateStructType="n long",
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                )
            )
            q = (
                counted.writeStream.format("memory")
                .queryName("smoke_stateful")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            n = spark.table("smoke_stateful").count()
            q.stop()
            return n
    finally:
        if rocksdb:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def run_stateful_carry_smoke(spark, sf_dir: str) -> tuple[dict, dict]:
    """Custom state CARRIED ACROSS micro-batches: per-user last purchase
    value via applyInPandasWithState, run as TWO checkpoint-resumed
    availableNow executions (first half of the stream, then the rest).
    A user whose second-half events contain no purchase must still emit
    the purchase value remembered from the first half — the streaming
    form of e8's last-known-value, and the proof that custom state
    survives micro-batch (and restart) boundaries.

    Returns (emitted_final, expected): per-user last purchase from the
    second run's emissions vs the batch-computed answer over the FULL
    stream, for exactly the users active in the second half."""
    import tempfile

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    cutoff = 1_705_363_200_000_000_000  # 2024-01-16 00:00 UTC in ns
    batch = load(spark, sf_dir, "events").drop("ts2")

    def carry(key, pdfs, state):
        ts, ev, val = state.get if state.exists else (-1, -1, None)
        for pdf in pdfs:
            pur = pdf[pdf["event_type"] == "purchase"]
            for _, row in pur.sort_values(["ts", "event_id"]).iterrows():
                if (int(row["ts"]), int(row["event_id"])) > (ts, ev):
                    ts, ev, val = int(row["ts"]), int(row["event_id"]), float(row["value"])
        state.update((ts, ev, val))
        yield pd.DataFrame({"user_id": [key[0]], "last_purchase": [val]})

    with tempfile.TemporaryDirectory() as workdir:
        src, ckpt, out = f"{workdir}/src", f"{workdir}/ckpt", f"{workdir}/out"
        batch.filter(F.col("ts") < cutoff).write.parquet(f"{src}/b1")

        def run_once():
            stream = spark.readStream.schema(batch.schema).parquet(f"{src}/*")
            carried = stream.groupBy("user_id").applyInPandasWithState(
                carry,
                outputStructType="user_id long, last_purchase double",
                stateStructType="ts long, ev long, v double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )

            def land(bdf, bid):
                bdf.withColumn("batch_id", F.lit(bid)).write.mode(
                    "append"
                ).parquet(out)

            q = (
                carried.writeStream.foreachBatch(land)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        run_once()
        first_max = (
            spark.read.parquet(out).agg(F.max("batch_id")).first()[0]
        )
        batch.filter(F.col("ts") >= cutoff).write.parquet(f"{src}/b2")
        run_once()
        emitted_df = spark.read.parquet(out).filter(
            F.col("batch_id") > first_max
        )
        emitted = {
            r["user_id"]: r["last_purchase"] for r in emitted_df.collect()
        }

    active_b2 = batch.filter(F.col("ts") >= cutoff).select("user_id").distinct()
    expected = {
        r["user_id"]: r["lp"]
        for r in (
            batch.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(
                F.max_by("value", F.struct("ts", "event_id")).alias("lp")
            )
            .join(active_b2, "user_id", "right")
        ).collect()
    }
    return emitted, expected


def run_two_stage_stateful_smoke(spark, sf_dir: str) -> tuple[set, set, set]:
    """TWO stateful operators chained under ONE watermark — the
    multi-stage stateful shape production pipelines hit next: streaming
    dedup (``dropDuplicates`` on event_id — state store #1) feeding a
    tumbling-window count per event type (state store #2), append mode,
    run as two checkpoint-resumed ``availableNow`` executions with
    DUPLICATED source rows planted in each half.

    Spark requirement this exercises: chaining stateful operators is
    only legal in append mode with the watermark declared ONCE upstream
    — both stores evict off the same event-time frontier (dedup keys
    older than the watermark age out of store #1 exactly when windows
    seal in store #2).

    Returns (emitted, expected_dedup, expected_with_dups): the windows
    emitted across both runs, the batch answer over DISTINCT events,
    and the batch answer over the dup-inflated source.  Callers assert
    emitted ⊆ expected_dedup (exact counts → dedup state worked across
    batch AND run boundaries) and emitted ⊄ expected_with_dups (the
    duplicates would have inflated some window, so stage 1 provably
    ran)."""
    import tempfile

    batch = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts", "ts2"
    )
    cutoff = 1_705_363_200_000_000_000  # 2024-01-16 00:00 UTC in ns

    def with_dups(df):
        return df.unionByName(df.filter(F.col("event_id") % 10 == 0))

    with tempfile.TemporaryDirectory() as workdir:
        src, ckpt, out = f"{workdir}/src", f"{workdir}/ckpt", f"{workdir}/out"
        with_dups(batch.filter(F.col("ts") < cutoff)).write.parquet(
            f"{src}/b1"
        )

        def run_once():
            stream = spark.readStream.schema(batch.schema).parquet(f"{src}/*")
            deduped = stream.withWatermark("ts2", "1 hour").dropDuplicates(
                ["event_id"]
            )
            windowed = deduped.groupBy(
                F.window("ts2", "6 hours").alias("w"), "event_type"
            ).count()
            q = (
                windowed.select(
                    F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
                    "event_type",
                    "count",
                )
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            q.stop()

        run_once()
        with_dups(batch.filter(F.col("ts") >= cutoff)).write.parquet(
            f"{src}/b2"
        )
        run_once()
        emitted = {
            (r["bucket_s"], r["event_type"], r["count"])
            for r in spark.read.parquet(out).collect()
        }

    def batch_answer(df):
        return {
            (r["bucket_s"], r["event_type"], r["count"])
            for r in (
                df.groupBy(
                    F.window("ts2", "6 hours").alias("w"), "event_type"
                )
                .count()
                .select(
                    F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
                    "event_type",
                    "count",
                )
            ).collect()
        }

    expected_dedup = batch_answer(batch.dropDuplicates(["event_id"]))
    expected_with_dups = batch_answer(with_dups(batch))
    return emitted, expected_dedup, expected_with_dups


def run_watermark_late_data_smoke(spark, sf_dir: str) -> tuple[int, int]:
    """Watermark + append-mode late-data semantics, observed end to end.

    Two micro-batches against one checkpoint: batch 1 = all events of
    2024-01-02+, batch 2 = only events before 2024-01-01 06:00 (late by
    weeks relative to batch 1's max ts).  After batch 1 the watermark
    sits at max(ts)-10min, so batch 2's windows are all below it and
    append emits NOTHING for them — the late data is dropped, which is
    exactly the bounded-state guarantee that makes windowed aggregation
    feasible on an unbounded 100 TB/day stream.

    Returns (rows_after_batch1, rows_added_by_late_batch2).
    """
    import tempfile

    cutoff_lo = 1_704_088_800_000_000_000  # 2024-01-01 06:00 UTC in ns
    cutoff_hi = 1_704_153_600_000_000_000  # 2024-01-02 00:00 UTC in ns
    batch = load(spark, sf_dir, "events").drop("ts2")

    with tempfile.TemporaryDirectory() as workdir:
        src = f"{workdir}/src"
        ckpt = f"{workdir}/ckpt"
        out = f"{workdir}/out"
        # batch 1: the "on-time" majority
        batch.filter(F.col("ts") >= cutoff_hi).write.parquet(f"{src}/b1")

        def start():
            # file sink, not memory: only fault-tolerant sinks can resume
            # from a checkpoint, and resuming is the whole point here
            stream = (
                spark.readStream.schema(batch.schema)
                .option("maxFilesPerTrigger", "1000")
                .parquet(f"{src}/*")
            )
            agg = (
                stream.withColumn(
                    "ts2",
                    F.timestamp_micros(
                        F.expr("CAST((ts - pmod(ts, 1000)) DIV 1000 AS LONG)")
                    ),
                )
                .withWatermark("ts2", "10 minutes")
                .groupBy(F.window("ts2", "1 hour"))
                .count()
                .select(
                    F.unix_timestamp(F.col("window.start")).alias("ws"),
                    F.col("count").alias("n"),
                )
            )
            q = (
                agg.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        def emitted() -> int:
            return spark.read.schema("ws long, n long").parquet(out).count()

        start()
        n1 = emitted()
        # batch 2: weeks-late events only — below the watermark
        batch.filter(F.col("ts") < cutoff_lo).write.parquet(f"{src}/b2")
        start()
        return n1, emitted() - n1


def run_session_window_stream_smoke(spark, sf_dir: str) -> tuple[int, set, set]:
    """k8's EXACT session_window expression run as a stream: with
    availableNow + a 10-minute watermark, append mode emits only the
    sessions that CLOSED below the final watermark — a strict subset
    of the batch k8 result (the still-open tail sessions are withheld,
    which is the bounded-state contract).  Returns (n_emitted,
    emitted_keys, batch_keys) for the subset assertion."""
    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        sess = (
            _stream_events(spark, sf_dir, workdir)
            .withWatermark("ts2", "10 minutes")
            .groupBy(F.session_window(F.col("ts2"), "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_timestamp("session_window.start").alias("start_s"),
                F.unix_timestamp("session_window.end").alias("end_s"),
                "n_events",
            )
        )
        q = (
            sess.writeStream.format("memory")
            .queryName("smoke_session_window")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = {
            (r["user_id"], r["start_s"], r["end_s"], r["n_events"])
            for r in spark.table("smoke_session_window").collect()
        }
        q.stop()
    batch = {
        (r["user_id"], r["start_s"], r["end_s"], r["n_events"])
        for r in k8_session_window_native(spark, sf_dir).collect()
    }
    return len(emitted), emitted, batch


def run_stream_stream_join_smoke(spark, sf_dir: str) -> tuple[int, int]:
    """Stream-stream INTERVAL self-join: each click joined to the same
    user's purchases within the following hour, watermarks on BOTH
    sides (the condition Spark requires to bound join state — without
    the time interval + watermarks, both sides' state would grow
    forever on an unbounded stream).

    Returns (streaming_rows, batch_rows): the identical join run over
    the static frame.  Inner stream-stream joins emit exactly the
    matched pairs, so with one availableNow batch the two counts must
    be EQUAL — the streaming plan is the batch plan plus state
    bookkeeping, which is the whole Structured Streaming contract."""
    import tempfile

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts2").alias("c_ts")
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts2").alias("p_ts")
        )
        return clicks, purchases

    def cond():
        return (
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
        )

    with tempfile.TemporaryDirectory() as workdir:
        ev = _stream_events(spark, sf_dir, workdir)
        s_clicks, s_purch = sides(ev)
        joined = s_clicks.withWatermark("c_ts", "30 minutes").join(
            s_purch.withWatermark("p_ts", "30 minutes"), cond(), "inner"
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("smoke_ssjoin")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_stream = spark.table("smoke_ssjoin").count()
        q.stop()
    b_clicks, b_purch = sides(load(spark, sf_dir, "events"))
    n_batch = b_clicks.join(b_purch, cond(), "inner").count()
    return n_stream, n_batch


def run_stream_static_foreach_batch_smoke(spark, sf_dir: str) -> tuple[int, int]:
    """Stream-static enrichment + foreachBatch sink: the stream joins a
    static per-user dimension (broadcast — static sides never hold
    streaming state), and foreachBatch lands each micro-batch with the
    full BATCH writer API (upserts/merges at 100 TB happen here; plain
    writeStream sinks only append).

    Returns (rows_landed, rows_expected): every event has a user row in
    the dim by construction, so the inner join must land them all."""
    import tempfile

    static_dim = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    with tempfile.TemporaryDirectory() as workdir:
        out = f"{workdir}/landed"
        enriched = (
            _stream_events(spark, sf_dir, workdir)
            .join(F.broadcast(static_dim), "user_id")
            .select("user_id", "event_type", "user_total")
        )

        def land(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            enriched.writeStream.foreachBatch(land)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        n_landed = spark.read.parquet(out).count()
    n_expected = load(spark, sf_dir, "events").count()
    return n_landed, n_expected


def run_streaming_index_merge_smoke(spark, sf_dir: str) -> tuple[list, list]:
    """Streaming index maintenance end-to-end: delta documents arrive
    as a file-source stream and foreachBatch merges each micro-batch
    into the persisted TF postings index (functions.index_store
    semantics) — the reference archetype's nightly index rebuild
    re-expressed as continuous ingestion.  Returns (merged, rebuilt)
    canonical index contents, which must be equal.

    100 TB shape: each micro-batch's TF aggregate is delta-sized; the
    full-outer merge join reads the bucketed base in place (the
    comparative-Exchange property pinned in test_plans), and the new
    index lands as an immutable swap directory per batch."""
    import tempfile

    from ..functions.index_store import build_tf_index, merge_tf_delta

    docs = load(spark, sf_dir, "documents")
    base_docs = docs.filter(F.col("doc_id") % 10 != 0)
    delta_docs = docs.filter(F.col("doc_id") % 10 == 0)
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def canon(df):
        return sorted(
            (r["term"], r["df_count"], [tuple(p) for p in r["postings"]])
            for r in df.collect()
        )

    with tempfile.TemporaryDirectory() as workdir:
        try:
            build_tf_index(
                spark, base_docs, "t_stream_idx", f"{workdir}/base", buckets=nb
            )
            src = f"{workdir}/delta_src"
            delta_docs.write.mode("overwrite").parquet(src)
            stream = spark.readStream.schema(docs.schema).parquet(src)
            out = f"{workdir}/merged"

            def merge_batch(batch_df, batch_id):
                merge_tf_delta(spark, "t_stream_idx", batch_df).write.mode(
                    "overwrite"
                ).parquet(f"{out}/b{batch_id}")

            q = (
                stream.writeStream.foreachBatch(merge_batch)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
            merged = canon(spark.read.parquet(f"{out}/b0"))
            build_tf_index(
                spark, docs, "t_stream_idx_full", f"{workdir}/full", buckets=nb
            )
            rebuilt = canon(spark.table("t_stream_idx_full"))
        finally:
            for t in ("t_stream_idx", "t_stream_idx_full",
                      "t_stream_idx_docs", "t_stream_idx_full_docs"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
    return merged, rebuilt


def run_streaming_tf_append_smoke(spark, sf_dir: str) -> tuple[list, list]:
    """The SEGMENT lane of index maintenance driven from a stream:
    document shards arrive as a file-source stream (one file per
    micro-batch via maxFilesPerTrigger, so the index accumulates
    across several appends) and foreachBatch ingests each as a segment
    (``append_tf_index`` — delta-sized writes, nothing rewrites the
    base), after which ``search_tf_index``'s query-time-weighted
    ranking must equal the same search over a one-shot batch build of
    the full corpus.  This is the ingestion-service twin of
    ``run_streaming_index_merge_smoke``'s nightly-merge shape: that
    one rewrites the whole index per batch (delta-sized compute,
    full-sized write); this one writes only the shard.  Returns
    (streamed, batch) ranking row lists, which must be equal."""
    import tempfile

    from ..functions.index_store import (
        append_tf_index,
        build_tf_index,
        refresh_store,
        search_tf_index,
    )
    from ..functions.text_search import QUERY_TERMS

    docs = load(spark, sf_dir, "documents")
    base_docs = docs.filter(F.col("doc_id") % 10 != 0)
    delta_docs = docs.filter(F.col("doc_id") % 10 == 0)

    def rows(table):
        return [
            (r["doc_id"], r["score"])
            for r in search_tf_index(spark, table, QUERY_TERMS).collect()
        ]

    with tempfile.TemporaryDirectory() as workdir:
        try:
            build_tf_index(
                spark, base_docs, "t_stf_idx", f"{workdir}/base", buckets=8
            )
            src = f"{workdir}/shards"
            delta_docs.repartition(3).write.mode("overwrite").parquet(src)
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

            def append_batch(batch_df, batch_id):
                append_tf_index(
                    spark, "t_stf_idx", batch_df.select("doc_id", "text")
                )

            q = (
                stream.writeStream.foreachBatch(append_batch)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
            # the appends ran in foreachBatch's cloned sessions, whose
            # writes this session's cached file listing cannot see —
            # the serving session "reopens the reader" before querying
            # (refresh_store's cross-session freshness contract)
            refresh_store(spark, "t_stf_idx", ("", "_docs"))
            streamed = rows("t_stf_idx")
            build_tf_index(
                spark, docs, "t_stf_idx_full", f"{workdir}/full", buckets=8
            )
            batch = rows("t_stf_idx_full")
        finally:
            for t in ("t_stf_idx", "t_stf_idx_docs",
                      "t_stf_idx_full", "t_stf_idx_full_docs"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
    return streamed, batch


def run_streaming_takedown_smoke(spark, sf_dir: str) -> tuple[list, list]:
    """The DELETE lane of index maintenance driven from a stream — the
    takedown-service twin of ``run_streaming_tf_append_smoke``:
    takedown requests (id lists) arrive as a file-source stream (one
    shard per micro-batch) and foreachBatch tombstones each against
    the persisted raw-TF store (``delete_from_tf_index`` — request-
    sized writes under the single-writer lease; the corpus is never
    rescanned), after which ``search_tf_index``'s ranking must equal
    the same search over a one-shot batch build of the SURVIVING
    corpus — exact scores, because the segmented store derives df from
    the looked-up postings and N from ingested − tombstoned at query
    time (index_store.py's tombstone section).  Returns (streamed,
    batch) ranking row lists, which must be equal."""
    import tempfile

    from ..functions.index_store import (
        build_tf_index,
        delete_from_tf_index,
        refresh_store,
        search_tf_index,
    )
    from ..functions.text_search import QUERY_TERMS

    docs = load(spark, sf_dir, "documents")
    doomed = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    survivors = docs.filter(F.col("doc_id") % 7 != 0)

    def rows(table):
        return [
            (r["doc_id"], r["score"])
            for r in search_tf_index(spark, table, QUERY_TERMS).collect()
        ]

    with tempfile.TemporaryDirectory() as workdir:
        try:
            build_tf_index(
                spark, docs, "t_take_idx", f"{workdir}/base", buckets=8
            )
            src = f"{workdir}/takedowns"
            doomed.repartition(3).write.mode("overwrite").parquet(src)
            stream = (
                spark.readStream.schema(doomed.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

            def delete_batch(batch_df, batch_id):
                delete_from_tf_index(spark, "t_take_idx", batch_df)

            q = (
                stream.writeStream.foreachBatch(delete_batch)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
            # the tombstone writes ran via foreachBatch's cloned
            # sessions — the serving session reopens the reader before
            # querying (refresh_store's cross-session contract)
            refresh_store(spark, "t_take_idx", ("", "_docs"))
            streamed = rows("t_take_idx")
            build_tf_index(
                spark, survivors, "t_take_idx_full", f"{workdir}/full",
                buckets=8,
            )
            batch = rows("t_take_idx_full")
        finally:
            for t in ("t_take_idx", "t_take_idx_docs", "t_take_idx_tombs",
                      "t_take_idx_full", "t_take_idx_full_docs"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
    return streamed, batch


def run_streaming_delta_dedup_smoke(spark, sf_dir: str) -> tuple[list, list]:
    """j84's delta-dedup decision fold run AS A STREAM — the docstring
    claim 'embarrassingly parallel and streamable' executed rather than
    asserted: the new batch's documents arrive as a file-source stream,
    and foreachBatch probes the PERSISTED dedup index (dedup_store's
    band table + shingle sidecar, built over the corpus side only —
    the corpus is never rescanned) to emit the same per-document
    keep/drop decisions j84 computes in batch.  Returns (streamed,
    batch) canonical decision lists, which must be equal.

    Per micro-batch: band ONLY the batch (one signature pass), join the
    batch's band rows against the persisted index on (b, bk) for
    corpus candidates plus a batch-side self-join for within-batch
    candidates, exact-verify both against the shingle sets (persisted
    sidecar for corpus docs, the batch's own for new docs), then the
    SHARED ``delta_dedup_decisions`` fold.  Equivalence domain: the
    batch pipeline's candidates pass the _BUCKET_CAP guard, the probe
    join reads whole buckets — identical while no bucket exceeds the
    cap (fixture max 4; j83 observes the guard state)."""
    import tempfile

    from ..functions.ann import delta_dedup_decisions
    from ..functions.dedup_store import build_dedup_index
    from ..functions.llm_pipeline import shingle_sets
    from ..functions.llm_scale import _NB_SEED, _nb_pred_col, _text_band_table
    from ..registry import QUERIES

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(~_nb_pred_col(F.col("doc_id")))
    batch_docs = docs.filter(_nb_pred_col(F.col("doc_id")))

    def canon(rows):
        return sorted((r["doc_id"], r["decision"], r["dup_of"]) for r in rows)

    with tempfile.TemporaryDirectory() as workdir:
        try:
            build_dedup_index(
                spark, sf_dir, "t_stream_didx", f"{workdir}/didx",
                docs=corpus,
            )
            src = f"{workdir}/batch_src"
            batch_docs.write.mode("overwrite").parquet(src)
            stream = spark.readStream.schema(docs.schema).parquet(src)
            out = f"{workdir}/decisions"

            def decide_batch(bdf, batch_id):
                sets_b = shingle_sets(bdf)
                band_b = _text_band_table(sets_b)
                idx = spark.table("t_stream_didx")
                cand = (
                    band_b.alias("n")
                    .join(idx.alias("c"), ["b", "bk"])
                    .select(
                        F.col("n.doc_id").alias("a"),
                        F.col("c.doc_id").alias("b"),
                    )
                    .unionAll(
                        band_b.alias("x")
                        .join(band_b.alias("y"), ["b", "bk"])
                        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
                        .select(
                            F.col("x.doc_id").alias("a"),
                            F.col("y.doc_id").alias("b"),
                        )
                    )
                    .distinct()
                )
                all_sets = spark.table("t_stream_didx_sets").unionByName(
                    sets_b
                )
                sa = all_sets.select(
                    F.col("doc_id").alias("a"), F.col("s").alias("s_a")
                )
                sb = all_sets.select(
                    F.col("doc_id").alias("b"), F.col("s").alias("s_b")
                )
                inter = F.size(F.array_intersect("s_a", "s_b"))
                jac = inter / (F.size("s_a") + F.size("s_b") - inter)
                dup = (
                    cand.join(sa, "a").join(sb, "b")
                    .filter(jac >= 0.8)
                    .select("a", "b")
                )
                delta_dedup_decisions(
                    bdf, "doc_id", dup, "a", "b", _NB_SEED
                ).write.mode("overwrite").parquet(f"{out}/b{batch_id}")

            q = (
                stream.writeStream.foreachBatch(decide_batch)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
            streamed = canon(spark.read.parquet(f"{out}/b0").collect())
            batch = canon(
                QUERIES["j84_incremental_dedup"](spark, sf_dir).collect()
            )
        finally:
            spark.sql("DROP TABLE IF EXISTS t_stream_didx")
            spark.sql("DROP TABLE IF EXISTS t_stream_didx_sets")
    return streamed, batch


def _running_count_processor():
    """The transformWithStateInPandas StatefulProcessor (per-user
    running count) as a lazily-built class: pyspark's
    ``stateful_processor`` module imports WITHOUT protobuf (verified on
    4.1.2 — only the state-server wire needs it), but building the
    class inside a factory keeps the engine import-safe on any build
    where that changes, and lets the no-protobuf logic check
    (:func:`run_stateful_processor_logic_check`) drive the EXACT class
    the native API would run."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    return RunningCount


def run_stateful_processor_logic_check(spark, sf_dir: str):
    """Drive the exact :func:`_running_count_processor` class against a
    fake state handle — per-key state, two batches per key to prove the
    carry — and return (emitted, expected) per-user count dicts.

    This is the VERDICT-r14 #6 re-expression: the container cannot run
    the native transformWithStateInPandas WIRE (protobuf absent), but
    the StatefulProcessor LOGIC — init's typed-state acquisition,
    exists/get/update around the batch fold, the per-key emission — is
    fully checkable without it.  The fake handle mirrors the runtime
    contract the processor actually uses: ``getValueState(name,
    schema)`` returning an object with ``exists()/get()/update(tuple)``
    scoped to the current grouping key (emulated here as one handle per
    key, which is observationally identical for a single-key fold).
    Together with :func:`run_stateful_count_smoke` (same semantics via
    applyInPandasWithState, ``rocksdb=True`` for the provider the
    native API mandates), only the protobuf wire itself stays
    unexercised — and that remains the single pinned pytest skip."""

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, value):
            self._v = tuple(value)

    class _FakeHandle:
        def __init__(self):
            self._states = {}

        def getValueState(self, name, schema):
            return self._states.setdefault(name, _FakeValueState())

    from ..sources import load

    events = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id")
        .toPandas()
    )
    cls = _running_count_processor()
    emitted: dict[int, int] = {}
    for user_id, pdf in events.groupby("user_id"):
        proc = cls()
        proc.init(_FakeHandle())
        half = len(pdf) // 2
        # two handleInputRows calls = two micro-batches: the second
        # must see the first's count through the state handle
        for batch in (pdf.iloc[:half], pdf.iloc[half:]):
            if len(batch) == 0:
                continue
            for out in proc.handleInputRows((user_id,), [batch], None):
                emitted[int(out["user_id"].iloc[0])] = int(out["n"].iloc[0])
        proc.close()
    expected = {
        int(u): int(n) for u, n in events.groupby("user_id").size().items()
    }
    return emitted, expected


def run_transform_with_state_smoke(spark, sf_dir: str) -> int:
    """Spark 4's transformWithStateInPandas — the successor API to
    applyInPandasWithState: a StatefulProcessor class with typed state
    handles (ValueState here), timers, and RocksDB-backed state (the
    provider the API requires; set per-session below).  Same semantics
    as :func:`run_stateful_count_smoke` so the two APIs cross-check.

    Requires ``protobuf`` (the API's state-server wire protocol); this
    container does not ship it, so callers must gate on
    :func:`transform_with_state_available` — the pytest smoke skips
    cleanly there and the code path is exercised where protobuf exists.
    The processor class itself plus the RocksDB provider ARE exercised
    without protobuf — see :func:`run_stateful_processor_logic_check`
    and ``run_stateful_count_smoke(rocksdb=True)``.
    """
    import tempfile

    RunningCount = _running_count_processor()

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        with tempfile.TemporaryDirectory() as workdir:
            counted = (
                _stream_events(spark, sf_dir, workdir)
                .groupBy("user_id")
                .transformWithStateInPandas(
                    statefulProcessor=RunningCount(),
                    outputStructType="user_id long, n long",
                    outputMode="Update",
                    timeMode="None",
                )
            )
            q = (
                counted.writeStream.format("memory")
                .queryName("smoke_tws")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            n = spark.table("smoke_tws").count()
            q.stop()
            return n
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def transform_with_state_available() -> bool:
    """True when the transformWithStateInPandas runtime deps exist
    (protobuf backs its driver-worker state-server protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@query(
    "k12_window_topk",
    oracle="""
    WITH c AS (
        SELECT CAST(epoch(time_bucket(INTERVAL 6 HOUR, ts)) AS BIGINT)
                   AS bucket_s,
               event_type, COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    )
    SELECT bucket_s, event_type, n
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket_s
                                       ORDER BY n DESC, event_type) AS rn
          FROM c)
    WHERE rn <= 2
    """,
)
def k12_window_topk(spark, sf_dir) -> DataFrame:
    """Per-window top-k: the two busiest event types in every 6-hour
    window (k1's windowed count composed with e7's per-group rank) —
    the "trending items per time slice" query every event-analytics
    surface serves.

    100 TB shape: the windowed count collapses map-side to
    (n_windows × n_types) rows — TINY — so the rank window runs over
    an aggregate, never over raw events; both steps share one
    exchange keyed by the window bucket.  Streaming form: k1's
    windowed aggregate in append mode feeding the same rank in a
    foreachBatch sink."""
    e = load(spark, sf_dir, "events")
    c = (
        e.groupBy(F.window("ts2", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "event_type",
            "n",
        )
    )
    rank_w = Window.partitionBy("bucket_s").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        c.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= 2)
        .select("bucket_s", "event_type", "n")
    )


@query(
    "k10_time_rollup",
    oracle="""
    SELECT event_type,
           CAST(epoch(date_trunc('day',  ts)) AS BIGINT) AS day_s,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY event_type, ROLLUP (
        CAST(epoch(date_trunc('day',  ts)) AS BIGINT),
        CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
    )
    """,
)
def k10_time_rollup(spark, sf_dir) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: per event type,
    ONE pass over the log produces hour, day, and all-time aggregate
    rows via GROUP BY ROLLUP on the (day, hour) bucket hierarchy —
    supergroup rows carry NULL buckets, exactly the continuous-aggregate
    ladder a time-series store materializes.

    100 TB shape: ROLLUP expands each input row to its grouping-set
    combinations BEFORE the exchange, and partial aggregation collapses
    them map-side, so the shuffle carries (n_hours + n_days + 1) rows
    per (type, task) — bucket-count-bounded, not data-bounded.  Compare
    d16's HLL-sketch ladder for when the measure itself (distincts)
    can't be re-aggregated from finer buckets; COUNT/SUM can, and at
    petabyte retention you'd persist the hour level and derive day+ by
    re-aggregating hour rows rather than rescanning the raw log."""
    e = load(spark, sf_dir, "events")
    e.select(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", "ts2")).alias("day_s"),
        F.unix_timestamp(F.date_trunc("hour", "ts2")).alias("hour_s"),
        "value",
    ).createOrReplaceTempView("k10_buckets")
    return spark.sql(
        """
        SELECT event_type, day_s, hour_s,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM k10_buckets
        GROUP BY event_type, ROLLUP (day_s, hour_s)
        """
    )


@query(
    "k11_last_state",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           epoch_ns(ts) // {_NS_PER_S} AS last_s,
           COUNT(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def k11_last_state(spark, sf_dir) -> DataFrame:
    """Latest-state-per-key snapshot (the CDC/materialized-state view):
    each user's most recent event with their lifetime event count —
    k4's mirror (first → last) and the batch form of a streaming
    state store keyed by user.

    100 TB shape: ONE shuffle on user_id serves both window specs
    (row_number and the count share the exchange; the count ignores
    ordering so it adds no second sort pass... Spark reuses the sorted
    partition).  In streaming this is transformWithState holding one
    row per key; in batch over a changelog it is the standard
    snapshot-compaction query — run it per partition-day and union
    with the previous snapshot for incremental compaction."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        e.withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
        .withColumn("n_events", F.count(F.lit(1)).over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.expr(f"ts DIV {_NS_PER_S}").alias("last_s"),
            "n_events",
        )
    )


@query(
    "k13_pattern_sequence",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               epoch_ns(ts) AS tns,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(epoch_ns(ts), 2) OVER w AS end_tns,
               lead(event_id, 2) OVER w AS end_event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           event_id AS start_event_id,
           end_event_id,
           tns // {_NS_PER_S} AS start_s,
           end_tns // {_NS_PER_S} AS end_s
    FROM ev
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    """,
)
def k13_pattern_sequence(spark, sf_dir) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection: emit every place a
    user's event stream contains the STRICTLY CONSECUTIVE pattern
    view → click → purchase (no other event of that user in between —
    the contiguous-match semantics of SQL row-pattern matching, unlike
    k5's funnel which allows gaps).

    Spark has no MATCH_RECOGNIZE; the portable formulation is lead()
    over the per-user order: a row matches iff its type is 'view' and
    the next two types are 'click','purchase'.  ONE shuffle on user_id
    and ONE in-partition sort serve all four lead() columns (same
    window spec → same exchange + sort pass), then the match predicate
    is a narrow filter — linear in the log, state bounded by the
    pattern length, exactly how a streaming CEP engine would evaluate
    it.  Timestamps compared/emitted as exact bigint ns → epoch s."""
    return detect_sequence(load(spark, sf_dir, "events"))


def detect_sequence(e: DataFrame) -> DataFrame:
    """k13's core over any (user_id, event_type, ts, event_id) frame —
    separated so property tests can drive it with generated logs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
            F.lead("ts", 2).over(w).alias("end_tns"),
            F.lead("event_id", 2).over(w).alias("end_event_id"),
        )
        .filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            "end_event_id",
            F.expr(f"ts DIV {_NS_PER_S}").alias("start_s"),
            F.expr(f"end_tns DIV {_NS_PER_S}").alias("end_s"),
        )
    )


@query(
    "k14_scd2_build",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, event_id, epoch_ns(ts) AS tns,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS grp
        FROM events
    ),
    island AS (
        SELECT user_id, event_type AS state, MIN(rn) AS seq,
               MIN(tns) AS from_tns, COUNT(*) AS n_events
        FROM ev GROUP BY user_id, event_type, grp
    )
    SELECT user_id, state,
           from_tns // {_NS_PER_S} AS valid_from_s,
           lead(from_tns) OVER (PARTITION BY user_id ORDER BY seq)
               // {_NS_PER_S} AS valid_to_s,
           n_events,
           CAST(lead(from_tns) OVER (PARTITION BY user_id
                                     ORDER BY seq) IS NULL
                AS INT) AS is_current
    FROM island
    """,
)
def k14_scd2_build(spark, sf_dir) -> DataFrame:
    """SCD Type-2 dimension build from a change log: collapse each
    user's CONSECUTIVE runs of the same event_type into versioned
    rows with [valid_from, valid_to) validity and an is_current flag —
    the standard warehouse history table, derived with gaps-and-islands
    (difference of two row_numbers) exactly like k3's sessionization.

    Plan: one shuffle on user_id whose sorted partitions serve both
    row_number specs (the second adds event_type to the partition key —
    a narrow regrouping of already-sorted rows), one (user, type, grp)
    aggregate, then lead() per user for the validity chain on the
    island table, which is run-count-sized, far smaller than the log.
    At 100 TB this is the per-partition-day compaction job: union the
    previous snapshot's open rows with today's log and rebuild only
    touched users (the user_id shuffle prunes to changed keys)."""
    return scd2_build(load(spark, sf_dir, "events"))


def scd2_islands(e: DataFrame) -> DataFrame:
    """k14's core over any (user_id, event_type, ts, event_id) frame —
    ns-precision [from_tns, to_tns) version chain (to_tns NULL = open),
    separated so property tests and the point-in-time join (c23) can
    drive it directly.

    The validity chain orders islands by the SEQUENTIAL position of
    each island's first event (min row_number), never by from_tns
    alone: two runs can start within the same emitted second, and a
    tied ORDER BY would make the lead() chain engine-dependent —
    hypothesis-found hazard, pinned in tests."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_all = Window.partitionBy("user_id").orderBy(*order)
    w_type = Window.partitionBy("user_id", "event_type").orderBy(*order)
    islands = (
        e.withColumn("rn", F.row_number().over(w_all))
        .withColumn(
            "grp", F.col("rn") - F.row_number().over(w_type)
        )
        .groupBy("user_id", F.col("event_type").alias("state"), "grp")
        .agg(
            F.min("rn").alias("seq"),
            F.min("ts").alias("from_tns"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w_chain = Window.partitionBy("user_id").orderBy("seq")
    return islands.withColumn("to_tns", F.lead("from_tns").over(w_chain))


def scd2_build(e: DataFrame) -> DataFrame:
    """k14's declared surface: the ns-precision island chain floored to
    second-precision validity columns (exact bigint floor-div — ns
    epochs overflow double's 2^53)."""
    return scd2_islands(e).select(
        "user_id",
        "state",
        F.expr(f"from_tns DIV {_NS_PER_S}").alias("valid_from_s"),
        F.expr(f"to_tns DIV {_NS_PER_S}").alias("valid_to_s"),
        "n_events",
        F.col("to_tns").isNull().cast("int").alias("is_current"),
    )


@query(
    "k15_interarrival",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               epoch_ns(ts) - lag(epoch_ns(ts)) OVER w AS gap
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           COUNT(gap) AS n_gaps,
           FLOOR(SUM(gap) * 10000.0 / COUNT(gap) / {_NS_PER_S}) / 10000
               AS mean_gap_s,
           FLOOR(quantile_cont(gap, 0.5) / {_NS_PER_S} * 10000) / 10000
               AS p50_gap_s,
           FLOOR(quantile_cont(gap, 0.9) / {_NS_PER_S} * 10000) / 10000
               AS p90_gap_s
    FROM g
    WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
)
def k15_interarrival(spark, sf_dir) -> DataFrame:
    """Inter-arrival-time distribution per event type — mean / median /
    p90 gap between consecutive events of each type, the arrival-rate
    profile that sizes streaming state, watermarks and alert
    thresholds (a p90 gap ≫ median flags bursty traffic).

    One shuffle on event_type, one in-partition sort serving the lag;
    the mean is an EXACT bigint-ns sum divided once at the end (never
    a float AVG, whose accumulation order differs across engines), and
    the percentiles are interpolating quantiles over ns-scale values
    that sit far inside double's exact-integer range (d12's recipe).
    At 100 TB event_type is low-cardinality → AQE skew handling, or
    re-key by (type, day) and merge the per-day sketches (d13)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type", (F.col("ts") - F.lag("ts").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        (
            F.floor(F.sum("gap") * 10000.0 / F.count("gap") / _NS_PER_S)
            / 10000
        ).alias("mean_gap_s"),
        (
            F.floor(F.expr("percentile(gap, 0.5)") / _NS_PER_S * 10000)
            / 10000
        ).alias("p50_gap_s"),
        (
            F.floor(F.expr("percentile(gap, 0.9)") / _NS_PER_S * 10000)
            / 10000
        ).alias("p90_gap_s"),
    )


_K16_WINDOW_NS = 24 * 3600 * _NS_PER_S  # stage deadline: 24 h (converts at every fixture SF)


@query(
    "k16_bounded_funnel",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
    v AS (SELECT user_id, MIN(tns) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT ev.user_id, MIN(tns) AS t_click
          FROM ev JOIN v USING (user_id)
          WHERE event_type = 'click' AND tns > t_view
            AND tns <= t_view + {_K16_WINDOW_NS}
          GROUP BY ev.user_id),
    p AS (SELECT ev.user_id, MIN(tns) AS t_purchase
          FROM ev JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND tns > t_click
            AND tns <= t_click + {_K16_WINDOW_NS}
          GROUP BY ev.user_id)
    SELECT v.user_id,
           t_view // {_NS_PER_S} AS view_s,
           t_click // {_NS_PER_S} AS click_s,
           t_purchase // {_NS_PER_S} AS purchase_s,
           CAST(t_purchase IS NOT NULL AS INT) AS converted
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def k16_bounded_funnel(spark, sf_dir) -> DataFrame:
    """Time-bounded conversion funnel: view → click WITHIN 24 HOURS →
    purchase within 24 hours of the click — k5's unbounded chain plus
    the per-stage deadline real attribution models impose (a purchase
    a week later is not the same conversion).  Same monotone-shrinking
    staged min-aggregate shape as k5 — the deadline is one extra exact
    integer-ns predicate per stage, free at any scale; in streaming
    this is the state-TTL that lets the store evict stalled funnels
    (state bounded by the deadline, not the stream length)."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + _K16_WINDOW_NS)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + _K16_WINDOW_NS)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.expr(f"t_view DIV {_NS_PER_S}").alias("view_s"),
            F.expr(f"t_click DIV {_NS_PER_S}").alias("click_s"),
            F.expr(f"t_purchase DIV {_NS_PER_S}").alias("purchase_s"),
            F.col("t_purchase").isNotNull().cast("int").alias("converted"),
        )
    )


@query(
    "k17_anomaly_zscore",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT)
                   AS bucket_s,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               AVG(n) AS mu,
               stddev_samp(n) AS sigma
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.bucket_s, h.n,
           FLOOR((h.n - mu) / sigma * 10000) / 10000 AS z
    FROM hourly h JOIN stats USING (event_type)
    WHERE ABS((h.n - mu) / sigma) > 2
    """,
)
def k17_anomaly_zscore(spark, sf_dir) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type whose
    z-score against that type's own hourly distribution exceeds 2 —
    the standard ops-monitoring shape (traffic spikes, error bursts;
    k7's error-burst twin generalized to every type and both tails).

    The ladder: ONE corpus-sized aggregate to hourly counts, then
    mean/stddev run over the tiny per-type hourly table, broadcast
    back onto it — the fact table is read once, everything after is
    |types|·|hours| rows.  AVG/STDDEV here aggregate small exact
    integers (hourly counts), the d8-proven parity surface; the final
    z is floored 4dp AFTER the filter so threshold and output use the
    same engine-identical arithmetic."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.window("ts2", "1 hour").alias("w")
    ).agg(F.count(F.lit(1)).alias("n")).select(
        "event_type",
        F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
        "n",
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2)
        .select(
            "event_type",
            "bucket_s",
            "n",
            (F.floor(z * 10000) / 10000).alias("z"),
        )
    )


@query(
    "k18_session_conversion",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
               CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                      OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > {_GAP_NS}
                    THEN 1 ELSE 0 END AS newf
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, CAST(SUM(newf) OVER (PARTITION BY user_id
                                       ORDER BY tns, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS sid
        FROM o
    ),
    v AS (SELECT user_id, sid, MIN(tns) AS t_view FROM s
          WHERE event_type = 'view' GROUP BY user_id, sid),
    c AS (SELECT s.user_id, s.sid, MIN(tns) AS t_click
          FROM s JOIN v USING (user_id, sid)
          WHERE event_type = 'click' AND tns > t_view
          GROUP BY s.user_id, s.sid),
    p AS (SELECT s.user_id, s.sid, MIN(tns) AS t_purchase
          FROM s JOIN c USING (user_id, sid)
          WHERE event_type = 'purchase' AND tns > t_click
          GROUP BY s.user_id, s.sid),
    sess AS (SELECT user_id, sid, COUNT(*) AS n_events FROM s
             GROUP BY user_id, sid)
    SELECT sess.user_id, sid AS session_id, n_events,
           CAST(t_view IS NOT NULL AS INT) AS saw_view,
           CAST(t_purchase IS NOT NULL AS INT) AS converted
    FROM sess
    LEFT JOIN v USING (user_id, sid)
    LEFT JOIN c USING (user_id, sid)
    LEFT JOIN p USING (user_id, sid)
    """,
)
def k18_session_conversion(spark, sf_dir) -> DataFrame:
    """IN-SESSION conversion — the product-analytics composition of k3
    and k5: within each 30-minute-gap session, did the user complete
    view → click-after-view → purchase-after-click before the session
    ended?  Per-session rows with the lifecycle flags (a user can
    convert in one session and just browse in the next — the
    per-session rate is the metric product teams actually track;
    k5's per-user funnel can't distinguish those visits).

    Plan: session assignment is ONE user_id shuffle (the lag + running
    sum share the sorted partition); the staged funnel minima then
    attach as THREE chained session-window columns over the SAME
    partitioning — (user_id, sid) is a refinement of the user
    partitioning, so t_view / t_click-after-view / t_purchase-after-
    click all compute in the sessionized partition with no further
    exchange, and one (user_id, sid) aggregate emits the session rows.
    Semantically identical to chaining per-stage filtered aggregates
    joined back on (user_id, sid) — the per-session stage minimum is
    the same value whether computed by window or by join, and a
    missing stage is NULL either way (min over an empty WHEN set ≡
    the inner join dropping the session) — but the round-15
    measurement of THAT form showed each of its four branches
    re-running the full session-assignment window (1.06 s executor
    CPU / 1.07 s wall floor at sf0.1; plans/r15/: four
    sort+lag+running-sum towers → one, 10 exchanges → 2).  In
    streaming this is session_window state with the funnel evaluated
    at window close."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    s = session_ids(e).select(
        "user_id", F.col("sid").cast("long").alias("sid"), "event_type",
        "ts", "event_id",
    )
    w2 = Window.partitionBy("user_id", "sid")
    staged = (
        s.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(
                w2
            ),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w2),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w2),
        )
    )
    return staged.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("t_view").alias("_tv"),
        F.max("t_purchase").alias("_tp"),
    ).select(
        "user_id",
        F.col("sid").alias("session_id"),
        "n_events",
        F.col("_tv").isNotNull().cast("int").alias("saw_view"),
        F.col("_tp").isNotNull().cast("int").alias("converted"),
    )


@query(
    "k19_incremental_agg_merge",
    oracle="""
    SELECT event_type,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY event_type, CAST(epoch(date_trunc('day', ts)) AS BIGINT)
    """,
)
def k19_incremental_agg_merge(spark, sf_dir) -> DataFrame:
    """Incremental view maintenance: a BASE aggregate (events before
    Jan 16) merged with a late-arriving DELTA batch (Jan 16 onward) by
    re-aggregating their mergeable partial states — count adds, sum
    adds — and the merged result must equal the full recompute (the
    oracle aggregates the whole log directly).  The measure runs in
    scaled-integer cents (f20's discipline) so partial-then-merge is
    bit-exact associative arithmetic, not float-order-dependent.

    100 TB shape: THE pattern that amortizes a petabyte fact table —
    the base states are computed once and persisted (group-bounded,
    not data-bounded); each new ingest batch aggregates alone and
    merges in a shuffle that only carries (groups × 2) partial rows.
    Only re-aggregable states qualify (count/sum/min/max, HLL sketches
    — d16's ladder); AVG must be carried as (sum, count), never as a
    merged average of averages."""
    e = load(spark, sf_dir, "events")
    return merge_partial_aggregates(e, "2024-01-16")


def merge_partial_aggregates(e: DataFrame, split_ts: str) -> DataFrame:
    """k19's reusable core: partial (count, sum-of-cents) states from
    the base (< split_ts) and delta (>= split_ts) slices, re-aggregated
    — equal to the direct aggregate for EVERY split point because both
    states are associative integer arithmetic (property-tested against
    random splits in tests/test_properties.py)."""
    split = F.lit(split_ts).cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    day_s = F.unix_timestamp(F.date_trunc("day", "ts2")).alias("day_s")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", day_s).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
        )

    base = partial(e.filter(F.col("ts2") < split))
    delta = partial(e.filter(F.col("ts2") >= split))
    return (
        base.unionAll(delta)
        .groupBy("event_type", "day_s")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )


def run_incremental_merge_stream_smoke(spark, sf_dir: str) -> tuple[list, list]:
    """k19's merge pattern run as a STREAM: events arrive one file per
    micro-batch, foreachBatch aggregates the batch into its partial
    (count, sum-of-cents) states and merges them into a persisted state
    table by re-aggregation (state ∪ delta → groupBy — the MERGE an
    actual lakehouse sink would do in place).  Returns (merged, direct)
    canonical contents; incremental maintenance must equal the batch
    recompute because the states are associative integers.

    State version directories are immutable (write-new, swap-pointer):
    overwriting a parquet dir that the next batch reads is the classic
    self-read corruption, and the versioned layout is also what gives
    exactly-once semantics on retry."""
    import tempfile

    cents = F.round(F.col("value") * 100).cast("long")
    day_s = F.unix_timestamp(F.date_trunc("day", "ts2")).alias("day_s")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", day_s).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
        )

    with tempfile.TemporaryDirectory() as workdir:
        batch = load(spark, sf_dir, "events").drop("ts2")
        src = f"{workdir}/src"
        batch.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn(
                "ts2",
                F.timestamp_micros(
                    F.expr("CAST((ts - pmod(ts, 1000)) DIV 1000 AS LONG)")
                ),
            )
        )
        state_path: list[str] = []  # latest committed state version

        def merge(batch_df, batch_id):
            delta = partial(batch_df)
            if state_path:
                merged = (
                    spark.read.parquet(state_path[-1])
                    .unionAll(delta)
                    .groupBy("event_type", "day_s")
                    .agg(
                        F.sum("n").alias("n"),
                        F.sum("sum_cents").alias("sum_cents"),
                    )
                )
            else:
                merged = delta
            new_version = f"{workdir}/state_v{batch_id}"
            merged.write.mode("overwrite").parquet(new_version)
            state_path.append(new_version)

        q = stream.writeStream.foreachBatch(merge).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(180)
        q.stop()
        merged_rows = sorted(
            (r.event_type, r.day_s, r.n, r.sum_cents)
            for r in spark.read.parquet(state_path[-1]).collect()
        )
    e = load(spark, sf_dir, "events")
    direct_rows = sorted(
        (r.event_type, r.day_s, r.n, r.sum_cents)
        for r in partial(e).collect()
    )
    return merged_rows, direct_rows


@query(
    "k20_gap_detect",
    oracle="""
    WITH obs AS (
        SELECT DISTINCT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s
        FROM events
    ),
    span AS (
        SELECT event_type, MIN(hour_s) AS h0, MAX(hour_s) AS h1
        FROM obs GROUP BY event_type
    ),
    expected AS (
        SELECT event_type, h0 + 3600 * CAST(i AS BIGINT) AS hour_s
        FROM span,
        LATERAL (SELECT unnest(range(0,
                     CAST((h1 - h0) / 3600 + 1 AS BIGINT))) AS i)
    )
    SELECT e.event_type, e.hour_s
    FROM expected e LEFT JOIN obs o USING (event_type, hour_s)
    WHERE o.hour_s IS NULL
    """,
)
def k20_gap_detect(spark, sf_dir) -> DataFrame:
    """Ingestion-completeness monitoring: the hourly buckets where a
    type emitted NOTHING — each type's expected calendar is its own
    [first, last] hour span densified, anti-joined against the hours
    actually observed (the fixture genuinely has ~40-50 silent hours
    per type).  k17 flags volume anomalies in hours that exist; this
    finds the hours that don't — the pipeline-is-down signal a
    completeness SLA alerts on.

    100 TB shape: the observed-hours table is bucket-bounded (types ×
    hours), built by ONE distinct pass the aggregate collapses
    map-side; the calendar explode and the anti-join run on that tiny
    table, so detection cost is calendar-sized regardless of event
    volume.  Same grid-densify machinery as k9, minus the per-user
    dimension."""
    e = load(spark, sf_dir, "events")
    obs = (
        e.select(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", "ts2")).alias("hour_s"),
        )
        .distinct()
    )
    span = obs.groupBy("event_type").agg(
        F.min("hour_s").alias("h0"), F.max("hour_s").alias("h1")
    )
    expected = span.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("hour_s"),
    )
    return expected.join(obs, ["event_type", "hour_s"], "left_anti")


# ---------------------------------------------------------------------------
# k21 — event-time disorder profile (watermark sizing)
# ---------------------------------------------------------------------------

#: md5-derived per-event ingestion delay: 0-4 h, a pure function of
#: event_id — models batched/offline log shipping (mobile uploaders,
#: hourly collectors).  The fixture's log is perfectly time-ordered,
#: so arrival = event time would make every lateness 0 (verified
#: degenerate), and per-type arrival gaps run tens of minutes to
#: hours, so a seconds-scale jitter stays degenerate per type too —
#: 4 h produces genuine disorder in every type at every fixture SF.
_ARRIVAL_JITTER_S = 14400

_ARR_NS_SQL = f"""epoch_ns(ts)
               + ((strpos('0123456789abcdef',
                          substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1)
                    * 4096
                  + (strpos('0123456789abcdef',
                            substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1)
                    * 256
                  + (strpos('0123456789abcdef',
                            substr(md5(CAST(event_id AS VARCHAR)), 3, 1)) - 1)
                    * 16
                  + (strpos('0123456789abcdef',
                            substr(md5(CAST(event_id AS VARCHAR)), 4, 1)) - 1))
                 % {_ARRIVAL_JITTER_S} * {_NS_PER_S}"""


def _with_arrival(e):
    """events + deterministic arrival time: arr = ts + md5-jittered
    ingestion delay (0-{_ARRIVAL_JITTER_S} s).  Shared by k21 and the
    watermark-coherence streaming smoke so the profile and the replay
    agree on what "arrival order" means."""
    delay = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % _ARRIVAL_JITTER_S
    ) * _NS_PER_S
    return e.withColumn("arr", F.col("ts") + delay)


@query(
    "k21_watermark_lag",
    oracle=f"""
    WITH arrv AS (
        SELECT event_type, event_id, epoch_ns(ts) AS tns,
               {_ARR_NS_SQL} AS arr
        FROM events
    ),
    lagged AS (
        SELECT event_type,
               MAX(tns) OVER (PARTITION BY event_type
                              ORDER BY arr, event_id) - tns AS late
        FROM arrv
    )
    SELECT event_type,
           COUNT(*) AS n,
           FLOOR(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) * 10000.0
                 / COUNT(*)) / 10000 AS frac_late,
           FLOOR(quantile_cont(late, 0.5) / {_NS_PER_S} * 10000) / 10000
               AS p50_late_s,
           FLOOR(quantile_cont(late, 0.95) / {_NS_PER_S} * 10000) / 10000
               AS p95_late_s,
           FLOOR(MAX(late) * 10000.0 / {_NS_PER_S}) / 10000 AS max_late_s
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def k21_watermark_lag(spark, sf_dir) -> DataFrame:
    """Event-time DISORDER profile: per event type, how late events
    arrive relative to the stream's event-time high-water mark at
    their ARRIVAL position — lateness = running max(event time) − own
    event time, in arrival order.  The p95/max lateness IS the
    watermark decision: `withWatermark("ts2", X)` drops exactly the
    events this profile counts beyond X, and the streaming smoke
    (`run_watermark_profile_coherence_smoke`) replays the same arrival
    order through a real checkpointed stream to prove the bound.

    The fixture's log is PERFECTLY time-ordered (event_id order ≡ ts
    order — measured: every lateness is 0), which no real ingest is;
    arrival is therefore modeled as ts + an md5-derived 0-4 h
    ingestion delay (a pure function of event_id — deterministic in
    both engines, j15's rule-7 discipline), giving the profile real
    disorder to measure.

    Plan: one shuffle on event_type, one in-partition sort by arrival
    serving the running max (pure streaming-state analog: one scalar
    per key), then the per-type aggregate reuses the window's
    partitioning — no second corpus exchange.  The mean is avoided
    (d12 discipline): quantiles interpolate over ns-scale integers
    well inside double's exact range, and frac_late is an integer
    ratio, 4dp-floored."""
    e = _with_arrival(load(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = (F.max("ts").over(w) - F.col("ts")).alias("late")
    return (
        e.select("event_type", late)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.floor(
                    F.sum((F.col("late") > 0).cast("long")) * 10000.0
                    / F.count(F.lit(1))
                )
                / 10000
            ).alias("frac_late"),
            (
                F.floor(F.expr("percentile(late, 0.5)") / _NS_PER_S * 10000)
                / 10000
            ).alias("p50_late_s"),
            (
                F.floor(F.expr("percentile(late, 0.95)") / _NS_PER_S * 10000)
                / 10000
            ).alias("p95_late_s"),
            (F.floor(F.max("late") * 10000.0 / _NS_PER_S) / 10000).alias(
                "max_late_s"
            ),
        )
        .orderBy("event_type")
    )


def run_watermark_profile_coherence_smoke(
    spark, sf_dir: str, n_chunks: int = 4
) -> tuple[int, int, int, int]:
    """k21's lateness profile, validated against REAL streaming drops.

    The profile's promise: `withWatermark("ts2", X)` can only drop
    events whose k21-lateness (running event-time max at arrival minus
    own event time) exceeds X — the streaming watermark advances per
    micro-batch, i.e. LAGS the per-row running max, so per-row lateness
    is an upper bound on what any batch boundary can drop.  This smoke
    replays the events fixture in k21's arrival order (``_with_arrival``:
    ts + md5 ingestion jitter — the SAME order the profile measures) as
    ``n_chunks`` checkpoint-resumed micro-batches through
    ``dropDuplicatesWithinWatermark`` (unique keys, so emitted =
    admitted) twice:

    * delay = the profile's MAX lateness → nothing may be dropped;
    * delay = the profile's p50 lateness → drops must be a SUBSET of
      the rows the profile counts beyond p50.

    Honesty note on the lower bound: at this fixture's arrival rate
    (mean per-type gap of the same order as the ≤4 h disorder window) a p50 watermark
    correctly drops ~nothing at micro-batch granularity — the per-row
    profile is an upper bound that the lazier per-batch watermark
    rarely reaches.  The profile's own non-degeneracy (frac_late > 0)
    is asserted separately in the k21 property test; THIS smoke's
    claim is the bound, both sides of it.

    Returns (n_events, n_late_gt_p50, admitted_at_max, admitted_at_p50).
    """
    import tempfile

    e = _with_arrival(
        load(spark, sf_dir, "events").select("event_id", "ts", "ts2")
    )
    n = e.count()
    w = Window.orderBy("arr", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lat = e.select((F.max("ts").over(w) - F.col("ts")).alias("late"))
    mx, p50 = lat.agg(
        F.max("late"), F.expr("percentile(late, 0.5)")
    ).collect()[0]
    n_gt_p50 = lat.filter(F.col("late") > p50).count()
    max_s = int(mx // _NS_PER_S) + 1
    p50_s = max(int(p50 // _NS_PER_S), 0) + 1

    chunked = e.withColumn(
        "chunk", F.ntile(n_chunks).over(Window.orderBy("arr", "event_id"))
    ).drop("arr")

    def admitted(delay_s: int) -> int:
        with tempfile.TemporaryDirectory() as workdir:
            src, ckpt, out = (
                f"{workdir}/src",
                f"{workdir}/ckpt",
                f"{workdir}/out",
            )
            for i in range(1, n_chunks + 1):
                chunked.filter(F.col("chunk") == i).drop("chunk").coalesce(
                    1
                ).write.parquet(f"{src}/b{i}")
                stream = (
                    spark.readStream.schema(chunked.drop("chunk").schema)
                    .parquet(f"{src}/*")
                    .withWatermark("ts2", f"{delay_s} seconds")
                    .dropDuplicatesWithinWatermark(["event_id"])
                )
                q = (
                    stream.writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(120)
                q.stop()
            return spark.read.parquet(out).count()

    return n, n_gt_p50, admitted(max_s), admitted(p50_s)


# ---------------------------------------------------------------------------
# k22 — truncated exponential moving average over the hourly volume grid
# ---------------------------------------------------------------------------

_EMA_ALPHA = 0.25  # dyadic: 1/4 and 3/4 are exact doubles
_EMA_WINDOW = 24   # truncation depth (hours)


@query(
    "k22_ema_smoothing",
    oracle=f"""
    WITH b AS (
        SELECT event_type, epoch(date_trunc('hour', ts)) AS h,
               COUNT(*) AS v
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    ),
    span AS (SELECT event_type,
                    CAST(MIN(h) AS BIGINT) AS lo,
                    CAST(MAX(h) AS BIGINT) AS hi
             FROM b GROUP BY event_type),
    grid AS (
        SELECT event_type, lo + 3600 * i AS h
        FROM span,
             LATERAL (SELECT unnest(range(0, (hi - lo) // 3600 + 1)) AS i)
    ),
    dense AS (
        SELECT g.event_type, g.h, COALESCE(b.v, 0) AS v
        FROM grid g LEFT JOIN b USING (event_type, h)
    ),
    lists AS (
        SELECT event_type, h, v,
               list(v) OVER (PARTITION BY event_type ORDER BY h
                             ROWS BETWEEN {_EMA_WINDOW - 1} PRECEDING
                                      AND CURRENT ROW) AS l
        FROM dense
    )
    SELECT event_type, h, v,
           FLOOR(list_sum(list_transform(
                     list_zip(l, range(len(l))),
                     z -> z[1] * {_EMA_ALPHA}
                          * pow({1 - _EMA_ALPHA},
                                len(l) - 1 - CAST(z[2] AS INT))))
                 * 10000) / 10000 AS ema
    FROM lists
    ORDER BY event_type, h
    """,
)
def k22_ema_smoothing(spark, sf_dir) -> DataFrame:
    """Truncated exponential moving average of hourly event volume per
    type: ema_t = Σ_{{k=0..{_EMA_WINDOW - 1}}} α(1−α)^k · v_{{t−k}},
    α = {_EMA_ALPHA} — the trend-smoothing signal behind k17's anomaly
    z-scores and every ops dashboard.  The textbook EMA is an infinite
    recursion (unwindowable in one SQL pass); the {_EMA_WINDOW}-term
    truncation drops < 0.1% of the mass ((1−α)^{_EMA_WINDOW} ≈ 1e-3)
    and turns it into a bounded ROWS frame — the standard production
    compromise, and the k9 densify step first fills silent hours with
    0 so the decay clock ticks in WALL hours, not observed rows.

    Determinism: α is dyadic (1/4, 3/4 exact doubles), weights come
    from pow on exact args (≤1 ulp apart across libms — orders below
    the 4dp floor), and the ≤{_EMA_WINDOW}-term fold runs in frame
    order in both engines (in-row list fold, j40's discipline).

    Plan: one bucket aggregate (map-side partial), the dense grid is
    bucket-count-bounded (k9's sequence-explode), and the windowed
    list + in-row fold ride the type-keyed partitioning — no second
    corpus exchange, state = {_EMA_WINDOW} doubles per row."""
    e = load(spark, sf_dir, "events")
    b = (
        e.select(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", "ts2")).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    span = b.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("h"),
    )
    dense = grid.join(b, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("v", F.lit(0)).alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-(_EMA_WINDOW - 1), Window.currentRow)
    )
    lists = dense.withColumn("l", F.collect_list("v").over(w))
    ema = F.expr(
        f"aggregate(zip_with(l, sequence(0, size(l) - 1),"
        f" (v, i) -> v * {_EMA_ALPHA}"
        f" * pow({1 - _EMA_ALPHA}, size(l) - 1 - i)),"
        f" 0D, (acc, x) -> acc + x)"
    )
    return (
        lists.select(
            "event_type",
            "h",
            "v",
            (F.floor(ema * 10000) / 10000).alias("ema"),
        )
        .orderBy("event_type", "h")
    )


def run_streaming_ema_smoke(
    spark, sf_dir: str, n_chunks: int = 3
) -> tuple[dict, dict]:
    """k22's EMA as a STATEFUL STREAM: the finalized hourly volume
    frame arrives in hour-ordered micro-batches (checkpoint-resumed
    ``availableNow`` runs), and ``applyInPandasWithState`` keyed by
    event type carries the last ≤{_EMA_WINDOW} bucket values as state —
    the production shape, where the EMA operator sits DOWNSTREAM of a
    sealed windowed aggregate and must survive batch and restart
    boundaries without re-reading history.

    Returns (emitted, batch_expected): every (type, hour) → ema emitted
    across the runs vs k22's batch answer.  They must be EQUAL — the
    streaming fold and the batch windowed-list fold compute the same
    truncated recursion, so any divergence means state was lost,
    duplicated, or mis-ordered across a boundary."""
    import math
    import tempfile

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    want = {
        (r["event_type"], r["h"]): r["ema"]
        for r in k22_ema_smoothing(spark, sf_dir).collect()
    }

    e = load(spark, sf_dir, "events")
    b = (
        e.select(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", "ts2")).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    span = b.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    dense = (
        span.select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("h"),
        )
        .join(b, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("v", F.lit(0)).alias("v"))
    )
    chunked = dense.withColumn(
        "chunk", F.ntile(n_chunks).over(Window.orderBy("h", "event_type"))
    )

    def ema_fn(key, pdfs, state):
        vals = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs)).sort_values("h")
        hs, emas = [], []
        for _, row in rows.iterrows():
            vals.append(float(row["v"]))
            if len(vals) > _EMA_WINDOW:
                vals.pop(0)
            ema = sum(
                v * _EMA_ALPHA * (1 - _EMA_ALPHA) ** (len(vals) - 1 - i)
                for i, v in enumerate(vals)
            )
            hs.append(int(row["h"]))
            emas.append(math.floor(ema * 10000) / 10000)
        state.update((vals,))
        yield pd.DataFrame(
            {"event_type": key[0], "h": hs, "ema": emas}
        )

    with tempfile.TemporaryDirectory() as workdir:
        src, ckpt, out = f"{workdir}/src", f"{workdir}/ckpt", f"{workdir}/out"
        schema = chunked.drop("chunk").schema
        for i in range(1, n_chunks + 1):
            chunked.filter(F.col("chunk") == i).drop("chunk").coalesce(
                1
            ).write.parquet(f"{src}/b{i}")
            stream = spark.readStream.schema(schema).parquet(f"{src}/*")
            folded = stream.groupBy("event_type").applyInPandasWithState(
                ema_fn,
                outputStructType="event_type string, h long, ema double",
                stateStructType="vals array<double>",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            def land(bdf, _bid):
                # parquet sinks reject update mode; foreachBatch lands
                # each batch's emissions append-only (carry-smoke recipe)
                bdf.write.mode("append").parquet(out)

            q = (
                folded.writeStream.foreachBatch(land)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
        emitted = {
            (r["event_type"], r["h"]): r["ema"]
            for r in spark.read.parquet(out).collect()
        }
    return emitted, want


# ---------------------------------------------------------------------------
# k23 — time-decayed trending score (integer-exact decay weights)
# ---------------------------------------------------------------------------

#: decay weight scale: w = _DECAY_SCALE // (1 + age_hours).
_DECAY_SCALE = 1_000_000


@query(
    "k23_decayed_trending",
    oracle=f"""
    WITH ev AS (
        SELECT event_type,
               epoch_ns(ts) // {_NS_PER_S} AS s
        FROM events
    ),
    horizon AS (SELECT MAX(s) AS t_now FROM ev)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_DECAY_SCALE} // (1 + (t_now - s) // 3600)) AS BIGINT)
               AS trend_score
    FROM ev CROSS JOIN horizon
    GROUP BY event_type
    ORDER BY trend_score DESC, event_type
    """,
)
def k23_decayed_trending(spark, sf_dir) -> DataFrame:
    """Time-decayed trending score per event type — the "what's hot
    NOW" ranking every activity feed runs: recent events count (almost)
    fully, old ones fade, so a type with a fresh burst outranks one
    with a larger but stale total (n_events is emitted alongside to
    show exactly when the two orderings disagree).

    INTEGER-EXACT decay: the weight is hyperbolic —
    w = {_DECAY_SCALE} // (1 + age_hours), pure BIGINT floor division —
    rather than exp(-age/τ).  Exponential decay would put libm's exp()
    in the hash path, where a one-ulp difference between the JVM and
    the oracle engine flips a FLOOR; the hyperbolic kernel has the
    same qualitative shape (monotone fade, heavy recency bias) with
    arithmetic both engines compute bit-identically, and the summed
    weights stay order-free BIGINTs.  Production swap-in of exp is one
    expression change; the plan is identical.

    Plan: one scan → map-side weight arithmetic → single hash
    aggregate on event_type; the stream horizon MAX(s) is a scalar
    broadcast (metadata-sized, the j40/c27 pattern).  Streaming form:
    the same aggregate maintained incrementally, with the horizon =
    processing-time now — weights then need periodic re-decay, the
    classic trade documented on k22's EMA."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts DIV {_NS_PER_S}").alias("s")
    )
    horizon = F.broadcast(e.agg(F.max("s").alias("t_now")))
    return (
        e.crossJoin(horizon)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.expr(f"{_DECAY_SCALE} DIV (1 + (t_now - s) DIV 3600)")
            ).alias("trend_score"),
        )
        .orderBy(F.col("trend_score").desc(), "event_type")
    )


# ---------------------------------------------------------------------------
# k24 — CUSUM change-point detection (integer-exact via prefix-sum identity)
# ---------------------------------------------------------------------------

@query(
    "k24_cusum_changepoint",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, event_id,
               epoch_ns(ts) // {_NS_PER_S} AS s,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS tot
        FROM ev GROUP BY event_type
    ),
    pre AS (
        SELECT e.event_type, e.event_id, e.s, st.n,
               CAST(SUM(e.cents * st.n - st.tot) OVER w AS BIGINT) AS cum
        FROM ev e JOIN stats st USING (event_type)
        WINDOW w AS (PARTITION BY e.event_type ORDER BY e.s, e.event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    dev AS (
        SELECT event_type, event_id, s, n,
               cum - LEAST(MIN(cum) OVER (PARTITION BY event_type
                                          ORDER BY s, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW), 0) AS cusum
        FROM pre
    )
    SELECT event_type, n,
           CAST(cusum AS BIGINT) AS max_cusum_scaled,
           s AS cp_s, event_id AS cp_event
    FROM dev
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY cusum DESC, s, event_id) = 1
    ORDER BY event_type
    """,
)
def k24_cusum_changepoint(spark, sf_dir) -> DataFrame:
    """One-sided CUSUM change-point detection per event type: find the
    moment the value stream's level shifted up hardest — the classic
    SPC/monitoring primitive (Page 1954) for "when did this metric
    start running hot".

    The textbook recurrence S_i = max(0, S_{{i-1}} + (x_i − μ)) is
    sequential — useless as stated in a set-based engine.  The shipped
    form uses the exact identity S_i = C_i − min(0, min_{{j≤i}} C_j)
    (the empty prefix's C_0 = 0 must participate — the recurrence
    resets AT zero) where C is the prefix sum of deviations: two stacked window functions (running
    sum, then running min of it), no recursion, no UDF.  All arithmetic
    is integer-exact: values quantize to cents (k19's contract), and
    deviations are scaled by the group count — cents·n − tot — instead
    of subtracting the fractional mean, so every intermediate is a
    BIGINT and the argmax (ties → earliest (s, event_id)) is
    engine-identical.  max_cusum_scaled is therefore n·100× the
    natural-units CUSUM peak.

    Plan: one shuffle keyed on event_type serves the stats aggregate
    AND both window passes (the window partitioning reuses the
    aggregate's exchange); the final per-group argmax is a rank-1
    filter on the same partitioning.  At 100 TB the per-key state is
    the window sort — linear per group, the e4/k9 running-window
    shape; the streaming form maintains (running sum, running min)
    as two scalars of keyed state."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr(f"ts DIV {_NS_PER_S}").alias("s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tot")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = e.join(stats, "event_type").withColumn(
        "cum", F.sum(F.col("cents") * F.col("n") - F.col("tot")).over(w)
    )
    # the running min must include the EMPTY prefix (C_0 = 0): the
    # recurrence resets at zero, so S_i = C_i - min(0, min_{j<=i} C_j);
    # without the 0 an all-positive prefix understates the peak (caught
    # by the sequential-recurrence property test, not by oracle parity
    # -- both engines shared the identical omission)
    dev = pre.withColumn(
        "cusum", F.col("cum") - F.least(F.min("cum").over(w), F.lit(0))
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("cusum").desc(), "s", "event_id"
    )
    return (
        dev.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n",
            F.col("cusum").alias("max_cusum_scaled"),
            F.col("s").alias("cp_s"),
            F.col("event_id").alias("cp_event"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# k25 — sliding-window rate quota (trailing-24h per-user event budget)
# ---------------------------------------------------------------------------

#: events allowed per user in any trailing 24-hour window.
_QUOTA = 8


@query(
    "k25_sliding_quota",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_ns(ts) // {_NS_PER_S} AS s
        FROM events
    ),
    w AS (
        SELECT user_id, event_id, s,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY s
                              RANGE BETWEEN 86399 PRECEDING
                              AND CURRENT ROW) AS cnt
        FROM ev
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (cnt > {_QUOTA}) AS BIGINT) AS n_breaches,
           CAST(MAX(cnt) AS BIGINT) AS max_window_count,
           MIN(CASE WHEN cnt > {_QUOTA} THEN s END) AS first_breach_s
    FROM w
    GROUP BY user_id
    HAVING COUNT(*) FILTER (cnt > {_QUOTA}) > 0
    ORDER BY user_id
    """,
)
def k25_sliding_quota(spark, sf_dir) -> DataFrame:
    """Sliding-window rate quota: for every event, the count of that
    user's events in the trailing 24 h (event-time RANGE frame, so the
    window follows the data, not wall-clock buckets — a user firing
    {_QUOTA}+1 events straddling a midnight boundary IS a breach that
    k10-style tumbling day buckets would miss); report users who ever
    exceed {_QUOTA}, with breach count, worst window and first breach
    time — the API-rate-limit / abuse-detection primitive, and the
    exact event-time semantics of k2's sliding windows applied to
    per-entity quotas.

    Plan / 100 TB shape: ONE shuffle keyed on user_id serves the RANGE
    window (running count over an in-partition sort — e5's frame
    machinery, per-key state = the 24 h deque) AND the per-user
    aggregate that follows (same partitioning, AQE-coalesced, no
    second exchange).  Streaming form: per-key timestamp-list state
    with watermark eviction — ``transformWithState``'s canonical
    example; the batch form here is its replay-verifiable equivalent.
    All arithmetic is integer seconds."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr(f"ts DIV {_NS_PER_S}").alias("s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(-86399, Window.currentRow)
    )
    cnt = e.withColumn("cnt", F.count(F.lit(1)).over(w))
    breach = F.col("cnt") > _QUOTA
    return (
        cnt.groupBy("user_id")
        .agg(
            F.sum(breach.cast("long")).alias("n_breaches"),
            F.max("cnt").alias("max_window_count"),
            F.min(F.when(breach, F.col("s"))).alias("first_breach_s"),
        )
        .filter(F.col("n_breaches") > 0)
        .orderBy("user_id")
    )


def run_sliding_quota_stream_smoke(spark, sf_dir: str) -> tuple[dict, dict]:
    """k25's trailing-24 h quota as a LIVE stateful stream: per-user
    timestamp-buffer state via applyInPandasWithState, run as two
    checkpoint-resumed availableNow executions split mid-stream — a
    trailing window that SPANS the restart boundary must still count
    first-half events, which is exactly what the carried buffer
    proves.  Eviction keeps t in [s−86399, s]; same-second events are
    RANGE-frame peers (each gets the full peer count), matching the
    batch window's semantics.

    Returns (emitted_final, expected): per-user (n_breaches,
    max_window_count, first_breach_s) from the stream's final
    emissions vs the declared batch k25 for every breaching user."""
    import tempfile

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    cutoff = 1_705_363_200_000_000_000  # 2024-01-16 00:00 UTC in ns
    batch = load(spark, sf_dir, "events").drop("ts2")

    def quota(key, pdfs, state):
        if state.exists:
            buf, nb, mx, fb = state.get
            buf = list(buf)
        else:
            buf, nb, mx, fb = [], 0, 0, None
        rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame()
        if len(rows):
            rows = rows.assign(s=rows["ts"] // 1_000_000_000).sort_values(
                ["s", "event_id"]
            )
            for s, grp in rows.groupby("s", sort=True):
                s = int(s)
                buf = [t for t in buf if t > s - 86400]
                buf.extend([s] * len(grp))
                c = len(buf)  # peer count: every same-second event sees all peers
                mx = max(mx, c)
                if c > _QUOTA:
                    nb += len(grp)
                    if fb is None:
                        fb = s
        state.update((buf, nb, mx, fb))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_breaches": [nb],
                "max_window_count": [mx],
                "first_breach_s": [fb],
            }
        )

    with tempfile.TemporaryDirectory() as workdir:
        src, ckpt, out = f"{workdir}/src", f"{workdir}/ckpt", f"{workdir}/out"
        batch.filter(F.col("ts") < cutoff).write.parquet(f"{src}/b1")

        def run_once():
            stream = spark.readStream.schema(batch.schema).parquet(f"{src}/*")
            q = (
                stream.groupBy("user_id")
                .applyInPandasWithState(
                    quota,
                    outputStructType=(
                        "user_id long, n_breaches long, "
                        "max_window_count long, first_breach_s long"
                    ),
                    stateStructType=(
                        "buf array<long>, nb long, mx long, fb long"
                    ),
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                )
                .writeStream.foreachBatch(
                    lambda bdf, bid: bdf.withColumn(
                        "batch_id", F.lit(bid)
                    ).write.mode("append").parquet(out)
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        run_once()
        batch.filter(F.col("ts") >= cutoff).write.parquet(f"{src}/b2")
        run_once()
        final = (
            spark.read.parquet(out)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.col("batch_id").desc()
                    )
                ),
            )
            .filter(F.col("rn") == 1)
        )
        emitted = {
            r["user_id"]: (
                r["n_breaches"],
                r["max_window_count"],
                r["first_breach_s"],
            )
            for r in final.collect()
            if r["n_breaches"] > 0
        }

    from ..registry import QUERIES

    expected = {
        r["user_id"]: (
            r["n_breaches"],
            r["max_window_count"],
            r["first_breach_s"],
        )
        for r in QUERIES["k25_sliding_quota"](spark, sf_dir).collect()
    }
    return emitted, expected


# ---------------------------------------------------------------------------
# e13 (events) — linear-interpolation imputation on the hourly grid
# ---------------------------------------------------------------------------

@query(
    "k26_resample_interpolate",
    oracle="""
    WITH obs AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                                  date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    lastobs AS (
        SELECT event_type, bucket,
               CAST(epoch(bucket) AS BIGINT) AS obs_s, cents
        FROM obs WHERE rn = 1
    ),
    span AS (
        SELECT event_type, date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events GROUP BY event_type
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM span
    ),
    ctx AS (
        SELECT g.event_type,
               CAST(epoch(g.bucket) AS BIGINT) AS h_s,
               l.cents AS here,
               last_value(l.cents IGNORE NULLS) OVER wp AS pc,
               last_value(l.obs_s IGNORE NULLS) OVER wp AS ps,
               first_value(l.cents IGNORE NULLS) OVER wn AS nc,
               first_value(l.obs_s IGNORE NULLS) OVER wn AS ns
        FROM grid g LEFT JOIN lastobs l USING (event_type, bucket)
        WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY g.event_type ORDER BY g.bucket
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h_s,
           CAST(CASE
               WHEN here IS NOT NULL THEN here
               WHEN pc IS NOT NULL AND nc IS NOT NULL THEN
                   (pc * (ns - h_s) + nc * (h_s - ps)) // (ns - ps)
               WHEN pc IS NOT NULL THEN pc
               ELSE nc
           END AS BIGINT) AS cents_interp
    FROM ctx
    """,
)
def k26_resample_interpolate(spark, sf_dir) -> DataFrame:
    """Hourly resampling with LINEAR interpolation — the imputation
    sibling of k9's forward fill: grid points between two observations
    take the time-weighted average of their neighbors instead of
    repeating the stale left value (ffill is right for state-like
    series, interpolation for continuous measures; both ship because
    choosing wrong is a modeling bug).  All arithmetic is exact:
    observations quantize to cents (k19's contract), times are integer
    epoch seconds, and the interpolated value is the integer floor of
    (pc·(ns−h) + nc·(h−ps)) / (ns−ps), spelled as an explicit
    pmod-floored division so a negative measure can never expose the
    truncate-vs-floor split between the engines' integer division.
    Edges extrapolate flat (first/last known value).

    Plan / 100 TB shape: one bucket-collapse aggregate, then BOTH
    directional context windows (previous and next observation value
    AND time, carried by last/first IGNORE NULLS) plus the grid join
    ride a single event_type partitioning; the grid is span-bounded,
    never event-bounded.  The streaming form is k9's state story plus
    a one-bucket emission delay (the next observation must arrive
    before a gap can interpolate — inherently one-step-lookahead)."""
    e = load(spark, sf_dir, "events")
    obs_w = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    lastobs = (
        e.select(
            "event_type",
            F.date_trunc("hour", "ts2").alias("bucket"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(obs_w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "bucket",
            F.unix_timestamp("bucket").alias("obs_s"),
            "cents",
        )
    )
    span = e.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts2")).alias("lo"),
        F.date_trunc("hour", F.max("ts2")).alias("hi"),
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = (
        grid.join(lastobs, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            F.unix_timestamp("bucket").alias("h_s"),
            F.col("cents").alias("here"),
            F.last("cents", ignorenulls=True).over(wp).alias("pc"),
            F.last("obs_s", ignorenulls=True).over(wp).alias("ps"),
            F.first("cents", ignorenulls=True).over(wn).alias("nc"),
            F.first("obs_s", ignorenulls=True).over(wn).alias("ns"),
        )
    )
    interp = (
        F.when(F.col("here").isNotNull(), F.col("here"))
        .when(
            F.col("pc").isNotNull() & F.col("nc").isNotNull(),
            # explicit FLOOR division via pmod: Spark's DIV truncates
            # toward zero, DuckDB's // floors — they agree only for
            # non-negative dividends, and a negative measure would make
            # the weighted dividend negative.  Subtracting the (always
            # non-negative) pmod makes the numerator exactly divisible,
            # so DIV is exact division and floor semantics hold for any
            # sign of cents.
            F.expr(
                "(pc * (ns - h_s) + nc * (h_s - ps)"
                " - pmod(pc * (ns - h_s) + nc * (h_s - ps), ns - ps))"
                " DIV (ns - ps)"
            ),
        )
        .when(F.col("pc").isNotNull(), F.col("pc"))
        .otherwise(F.col("nc"))
    )
    return ctx.select(
        "event_type", "h_s", interp.cast("long").alias("cents_interp")
    )


# ---------------------------------------------------------------------------
# k27 — local-peak detection on the hourly series
# ---------------------------------------------------------------------------

@query(
    "k27_peak_detection",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h_s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    ),
    ctx AS (
        SELECT event_type, h_s, n,
               LAG(n) OVER w AS prev_n,
               LEAD(n) OVER w AS next_n
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h_s)
    )
    SELECT event_type, h_s, n
    FROM ctx
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n > prev_n AND n >= next_n
    ORDER BY n DESC, event_type, h_s
    LIMIT 20
    """,
)
def k27_peak_detection(spark, sf_dir) -> DataFrame:
    """Local-PEAK detection on the hourly event-count series: an
    interior hour whose count strictly exceeds its predecessor and is
    at least its successor (the strict/non-strict asymmetry resolves
    plateaus deterministically: a flat top's FIRST hour is the peak) —
    top-20 peaks.  k17 flags statistically extreme levels, k24 the
    single hardest sustained shift; k27 finds every local burst crest,
    which is what alert routing and capacity post-mortems actually
    page on.  Only interior points qualify — series edges are not
    peaks by definition.

    All comparisons are exact BIGINT counts on the collapsed hourly
    series; top-20 ties break on (type, hour).

    Plan / 100 TB shape: events collapse ~10³:1 into hourly partials
    map-side; lag and lead share ONE window spec over one event_type
    exchange; the result is a TakeOrderedAndProject heap.  The
    streaming form needs one-hour emission lag (a peak is confirmable
    only when its successor closes) — the k26 lookahead note applies
    verbatim."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts2").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    ctx = hourly.select(
        "event_type",
        F.unix_timestamp("bucket").alias("h_s"),
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return (
        ctx.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") >= F.col("next_n"))
        )
        .select("event_type", "h_s", "n")
        .orderBy(F.col("n").desc(), "event_type", "h_s")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# streaming twin: incremental sequence packing (j23 without a re-pack)
# ---------------------------------------------------------------------------


def _packing_fold(
    state: dict, out: list, shard_rows: list, budget: int
) -> None:
    """The per-shard packing fold: given a shard's rows carrying their
    SHARD-LOCAL per-lang running sums (``cum``), close them against the
    per-lang corpus totals accumulated so far and emit (doc_id, lang,
    bin_id, bin_offset) — exactly j23's arithmetic continued across
    shards.  ``state`` maps lang → [tokens_so_far, max_doc_id_seen].

    Packing is ORDER-SENSITIVE (bin ids are positions in the per-lang
    doc_id order), so the append contract is append-only in doc_id: a
    shard overlapping an already-packed doc_id range REFUSES by name
    instead of silently emitting bins that no batch re-pack would ever
    produce — the same refuse-don't-heal posture as the store lanes."""
    per_lang: dict = {}
    for r in shard_rows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in sorted(per_lang.items()):
        rows.sort(key=lambda r: r["doc_id"])
        tokens_so_far, max_seen = state.get(lang, (0, -1))
        if rows[0]["doc_id"] <= max_seen:
            raise ValueError(
                f"incremental packing: out-of-order shard for lang "
                f"{lang!r} (doc_id {rows[0]['doc_id']} <= already-packed "
                f"max {max_seen}) — packing is append-only in doc_id; "
                f"re-pack from a batch j23 run instead"
            )
        for r in rows:
            start = tokens_so_far + r["cum"] - r["n_tok"]
            out.append(
                (r["doc_id"], lang, start // budget, start % budget)
            )
        state[lang] = (
            tokens_so_far + rows[-1]["cum"],
            rows[-1]["doc_id"],
        )


def run_streaming_packing_smoke(spark, sf_dir: str) -> tuple[list, list]:
    """j23's sequence packing as an INCREMENTAL service: document
    shards arrive as a file-source stream in doc_id order (the shape an
    epoch manifest delivers) and each micro-batch is packed by
    CONTINUING the per-lang running token totals — the corpus is never
    re-packed, each shard's cost is shard-sized.  The emitted
    (doc_id, lang, bin_id, bin_offset) rows must equal batch
    j23_sequence_pack over the full corpus exactly: the prefix sum is
    associative, so per-shard local scans (the same grouped two-phase
    prefix_agg the batch key uses) + a per-lang carry close it with no
    approximation.  Returns (streamed, batch) row lists."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from ..functions.llm_scale import _PACK_BUDGET, j23_sequence_pack
    from ..operators.prefix_scan import prefix_agg

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    batch = sorted(
        (r["doc_id"], r["lang"], r["bin_id"], r["bin_offset"])
        for r in j23_sequence_pack(spark, sf_dir).collect()
    )

    state: dict = {}
    out: list = []

    def pack_batch(bdf, batch_id):
        local = prefix_agg(
            bdf, ["doc_id"], "n_tok", "cum", agg="sum",
            partition_cols=["lang"],
        )
        # shard-sized collect: the fold's carry is per-lang scalars and
        # this is the smoke's assertion surface (store-lane discipline:
        # the production fold would keep the carry in an operator state
        # store and write the packed rows straight back out)
        _packing_fold(state, out, local.collect(), _PACK_BUDGET)

    hi = t.agg(F.max("doc_id").alias("m")).first()["m"] or 0
    span = hi // 3 + 1
    with tempfile.TemporaryDirectory() as workdir:
        src = f"{workdir}/shards"
        os.makedirs(src)
        # one file per doc_id range, written in order with distinct
        # mtimes so the file source replays them append-only
        for k in range(3):
            shard = t.filter(
                (F.col("doc_id") >= k * span)
                & (F.col("doc_id") < (k + 1) * span)
            )
            shard.coalesce(1).write.mode("overwrite").parquet(
                f"{workdir}/stage_{k}"
            )
            part = glob.glob(f"{workdir}/stage_{k}/part-*.parquet")[0]
            shutil.copy(part, f"{src}/shard_{k}.parquet")
            time.sleep(1.1)  # distinct mtime seconds → stable order
        stream = (
            spark.readStream.schema(t.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(pack_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
    return sorted(out), batch


def run_streaming_recovery_smoke(spark, sf_dir: str) -> tuple[tuple, tuple]:
    """CHECKPOINT-RECOVERY exactly-once (the streaming failure mode a
    production ingest hits first): a foreachBatch shard-ingest stream
    with a DURABLE ``checkpointLocation`` is killed mid-run by an
    injected crash that fires AFTER the store append completed but
    BEFORE Spark commits the micro-batch — the worst-case interleaving
    (the work is done, the offset log doesn't know) — and the dying
    writer also leaves a crashed-holder write-lease marker behind.

    The stream is then RESTARTED from the same checkpoint.  Three
    things must compose for exactly-once:

    * Spark replays the uncommitted batch from the checkpoint's offset
      log (at-least-once delivery);
    * ``append_dedup_index``'s sidecar anti-join absorbs the replayed
      doc_ids — no double-indexing — and ``stamp_manifest`` records an
      honest ``n_rows: 0`` delta for the replay, so at-least-once
      delivery × idempotent apply = exactly-once store state;
    * the restarted clone TAKES OVER the crashed holder's stale lease
      (age > stale_sec) instead of refusing its own restart — the
      manifest/lease interaction VERDICT r13 item 3 names.

    Returns (recovered, twin) canonical store states — sorted band
    rows, sorted sidecar ids, manifest running total — which must be
    EQUAL to an uninterrupted build+append twin over the same shards.
    """
    import glob
    import json
    import os
    import shutil
    import tempfile
    import time as _time

    from ..functions.dedup_store import (
        append_dedup_index,
        build_dedup_index,
    )
    from ..functions.index_store import (
        read_manifest,
        refresh_store,
        table_location,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 < 7)
    shards = [
        docs.filter(F.col("doc_id") % 10 == 7 + i) for i in range(3)
    ]

    def canon(table):
        band = sorted(
            (r["b"], r["bk"], r["doc_id"])
            for r in spark.table(table).collect()
        )
        ids = sorted(
            r["doc_id"] for r in spark.table(f"{table}_sets").collect()
        )
        man = sum(e["n_rows"] for e in (read_manifest(spark, table) or []))
        return (band, ids, man)

    with tempfile.TemporaryDirectory() as workdir:
        try:
            # ---- uninterrupted twin: build + 3 plain appends --------
            build_dedup_index(
                spark, sf_dir, "t_rec_twin", f"{workdir}/twin",
                docs=corpus,
            )
            for i, sh in enumerate(shards):
                append_dedup_index(spark, "t_rec_twin", sh,
                                   shard_id=f"s{i}")

            # ---- the store under test ------------------------------
            build_dedup_index(
                spark, sf_dir, "t_rec", f"{workdir}/rec", docs=corpus,
            )
            src = f"{workdir}/shards"
            os.makedirs(src)
            for i, sh in enumerate(shards):
                stage = f"{workdir}/stage_{i}"
                sh.coalesce(1).write.mode("overwrite").parquet(stage)
                part = glob.glob(f"{stage}/part-*.parquet")[0]
                shutil.copy(part, f"{src}/shard_{i}.parquet")
                _time.sleep(1.1)  # distinct mtime seconds → stable order

            ckpt = f"{workdir}/ckpt"
            crash_marker = f"{workdir}/crashed"
            lock_dir = (
                table_location(spark, "t_rec").rstrip("/") + "_lock"
            )

            def ingest(bdf, batch_id):
                append_dedup_index(
                    spark, "t_rec", bdf.select("doc_id", "text"),
                    shard_id=f"b{int(batch_id)}",
                )
                if int(batch_id) == 1 and not os.path.exists(crash_marker):
                    with open(crash_marker, "w") as fh:
                        fh.write("crashed after append, before commit")
                    # the crashed holder's leftover lease: a marker
                    # whose lease.json is PAST the stale threshold —
                    # the restart must take it over, not refuse
                    os.makedirs(lock_dir, exist_ok=True)
                    with open(f"{lock_dir}/lease.json", "w") as fh:
                        json.dump(
                            {"owner": "crashed-ingester",
                             "token": "dead",
                             "ts": _time.time() - 7200.0},
                            fh,
                        )
                    raise RuntimeError(
                        "injected crash: batch appended but uncommitted"
                    )

            def start():
                return (
                    spark.readStream.schema(docs.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                    .writeStream.option("checkpointLocation", ckpt)
                    .foreachBatch(ingest)
                    .trigger(availableNow=True)
                    .start()
                )

            q = start()
            crashed = False
            try:
                q.awaitTermination(180)
            except Exception:
                crashed = True
            finally:
                try:
                    q.stop()
                except Exception:
                    pass
            assert crashed, "injected crash did not surface"
            assert os.path.isdir(lock_dir), (
                "crashed-holder lease marker missing — the takeover "
                "path would not be exercised"
            )

            # ---- restart from the SAME checkpoint ------------------
            q2 = start()
            q2.awaitTermination(180)
            q2.stop()

            refresh_store(spark, "t_rec", ("", "_sets"))
            refresh_store(spark, "t_rec_twin", ("", "_sets"))
            recovered = canon("t_rec")
            twin = canon("t_rec_twin")
            # the replay must be VISIBLE in the manifest: batch 1 was
            # appended, crashed uncommitted, and appended again on
            # restart — two b1 stamps, the second an honest 0-delta
            # (proves Spark actually replayed and the anti-join
            # actually absorbed it, not that the crash never happened)
            b1 = [e["n_rows"] for e in read_manifest(spark, "t_rec")
                  if e["shard_id"] == "b1"]
            assert len(b1) == 2 and b1[1] == 0, (
                f"expected a replayed b1 stamp with 0 delta, got {b1}"
            )
        finally:
            for t in ("t_rec", "t_rec_sets",
                      "t_rec_twin", "t_rec_twin_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
    return recovered, twin
