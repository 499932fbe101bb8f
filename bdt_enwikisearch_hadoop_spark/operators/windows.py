"""§2.E — window functions (SURVEY.md §2.E; e7 is the reference's
top-k-per-group query pattern).

Scale notes (100 TB): a window spec = one shuffle on partitionBy keys +
an in-partition sort.  Partition keys here are mostly high-cardinality
(custkey, user_id), so partitions stay small and spill never triggers;
a window WITHOUT partitionBy would serialize the whole dataset through
one task and is deliberately absent (global top-k uses orderBy+limit →
TakeOrderedAndProject, see sorts.py; exact global scans use
operators/prefix_scan.py).  The handful of LOW-cardinality partition
keys in this family (orderstatus, brand, returnflag) are kept on the
NATIVE operator on purpose — §2.E's contract is the window-function
surface itself — and each such stratum riding one task is the declared
cost; the production swap when a stratum outgrows a task is the
grouped two-phase scan (prefix_scan's ``partition_cols``), which the
semantic-stratum keys (j23/j24/j42/j45/j48/m6) already use.  Every
orderBy carries a unique tiebreaker (§2.0 rule 4) so rank/lag results
are deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import query
from ..sources import load


@query(
    "e1_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def e1_ranking(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "e2_distribution",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def e2_distribution(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@query(
    "e3_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(value, 1) OVER w AS prev_val,
           LEAD(value, 1) OVER w AS next_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e3_lag_lead(spark, sf_dir) -> DataFrame:
    """lag/lead over exact ns event order (ts is BIGINT ns on the Spark
    side, TIMESTAMP_NS in the oracle — identical total order)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value", 1).over(w).alias("prev_val"),
        F.lead("value", 1).over(w).alias("next_val"),
    )


@query(
    "e4_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
           FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w * 10000) / 10000 AS running_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def e4_running(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        # exact decimal accumulation: windowed double SUM/AVG adds in an
        # engine-specific order (segment tree vs incremental) and ties at
        # the 4th decimal; decimal sums are order-independent
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        # FLOOR-truncation instead of ROUND: sum/count lands on exact
        # .xxxx5 ties (decimal / power-of-two counts) where Spark's
        # BigDecimal ROUND and DuckDB's multiply-then-round disagree;
        # floor of the same IEEE product is identical everywhere
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .over(w)
                .cast("double")
                / F.count(F.lit(1)).over(w)
                * 10000
            )
            / 10000
        ).alias("running_avg"),
    )


@query(
    "e5_range_frame",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS hour_sum
    FROM (SELECT event_id, user_id, value,
                 epoch_ns(ts) // 1000000000 AS es
          FROM events)
    """,
)
def e5_range_frame(spark, sf_dir) -> DataFrame:
    """Sliding 1-hour sum via a RANGE frame over epoch seconds — the
    batch analogue of a sliding stream window, computed per row."""
    e = load(spark, sf_dir, "events")
    # ts >= 0 in fixtures; integer DIV is exact (floor for positives)
    es = e.withColumn("es", F.expr("ts DIV 1000000000"))
    w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-3600, 0)
    return es.select(
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("hour_sum"),
    )


@query(
    "e6_first_last",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           LAST_VALUE(l_partkey) OVER w AS last_part
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def e6_first_last(spark, sf_dir) -> DataFrame:
    """last_value needs the explicit full-partition frame — the default
    frame ends at CURRENT ROW in both engines and would silently equal
    the current value."""
    li = load(spark, sf_dir, "lineitem")
    # l_linenumber is NOT unique per order in the fixtures — l_partkey
    # tiebreak makes first/last deterministic (§2.0 rule 4)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
    )


@query(
    "e7_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM part
    QUALIFY ROW_NUMBER() OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice DESC, p_partkey) <= 3
    """,
)
def e7_topk_per_group(spark, sf_dir) -> DataFrame:
    """Top-3 parts per brand — the reference's ranked-retrieval pattern.
    At scale: shuffle on brand only; each partition keeps a 3-row heap
    (rank filter pushes into the window sort via AQE)."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@query(
    "e8_ignore_nulls_carry",
    oracle="""
    SELECT event_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_purchase,
           first_value(CASE WHEN event_type = 'purchase' THEN value END
                       IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase
    FROM events
    """,
)
def e8_ignore_nulls_carry(spark, sf_dir) -> DataFrame:
    """IGNORE NULLS window navigation: per event, the most recent
    PRIOR purchase value and the nearest FOLLOWING one — the
    last-known-value / next-known-value pattern (sensor carry-forward,
    attribution lookback) that plain lag/lead can't express when the
    interesting rows are sparse.  Exact ns ordering with the unique
    event_id tiebreak (§2.0); values pass through undoctored, so the
    hash match needs no rounding.

    100 TB shape: same single user_id shuffle + in-partition sort as
    every §2.E window; IGNORE NULLS costs nothing extra (running
    last-non-null state per partition)."""
    e = load(spark, sf_dir, "events")
    purchase = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.last(purchase, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_purchase"),
        F.first(purchase, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_purchase"),
    )


@query(
    "e9_windowed_quantile",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           FLOOR(quantile_cont(l_quantity, 0.5)
                 OVER (PARTITION BY l_returnflag) * 10000) / 10000
               AS group_median,
           l_quantity > FLOOR(quantile_cont(l_quantity, 0.5)
                              OVER (PARTITION BY l_returnflag) * 10000) / 10000
               AS above_median
    FROM lineitem
    """,
)
def e9_windowed_quantile(spark, sf_dir) -> DataFrame:
    """Exact quantile as a WINDOW function: every row carries its
    return-flag group's median and an above/below flag — the per-row
    enrichment form of d12's grouped percentiles (feature engineering:
    'how does this row sit within its cohort'), without a join back.

    100 TB shape: one shuffle on the partition key; the exact quantile
    needs the whole partition resident (sort-based), so high-cardinality
    partition keys keep partitions small — for global or very hot keys
    use approx_percentile over the window instead (mergeable sketch,
    same plan shape)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    med = F.expr("percentile(l_quantity, 0.5)").over(w)
    # compare against the SAME 1e-4-truncated median both engines emit:
    # Spark's percentile and DuckDB's quantile_cont interpolate in
    # different fp orders, so a non-integral measure can put the raw
    # medians an epsilon apart and flip the flag for rows sitting on it
    med_t = F.floor(med * 10000) / 10000
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        med_t.alias("group_median"),
        (F.col("l_quantity") > med_t).alias("above_median"),
    )


@query(
    "e10_cumulative_distinct",
    oracle="""
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
           COUNT(DISTINCT user_id)
               OVER (PARTITION BY event_type
                     ORDER BY date_trunc('hour', ts)) AS cum_users
    FROM events
    GROUP BY event_type, date_trunc('hour', ts), user_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type,
                               date_trunc('hour', ts)
                               ORDER BY user_id) = 1
    """,
)
def e10_cumulative_distinct(spark, sf_dir) -> DataFrame:
    """Cumulative DISTINCT count over an expanding window: per event
    type, how many DISTINCT users have been seen up to (and including)
    each hour — the audience-growth curve.  Spark has no
    count-distinct window function (the state is a set, not a
    mergeable scalar), and at scale you would not want one: the
    correct distributed form is the FIRST-SEEN decomposition shipped
    here — a user contributes to the cumulative count exactly at their
    first hour, so cum_distinct(h) = running SUM of first-seen counts.

    Plan: one aggregate keyed (type, user) computes each user's first
    hour (map-side partial collapse eats the per-user event fan-in);
    its bucket counts left-join the observed (type, hour) frame (an
    hour with traffic but no NEW users still emits a row — flat curve
    segment), and a running sum over that tiny bucket frame finishes
    it.  Both aggregates and the join are bucket/user-bounded, never
    event-bounded past the first collapse.  No set-valued window
    state, no re-scan per hour.  The oracle is DuckDB's native
    COUNT(DISTINCT) OVER — an independent formulation, so the
    decomposition itself is what gets verified."""
    e = load(spark, sf_dir, "events")
    bucketed = e.select(
        "event_type",
        "user_id",
        F.unix_timestamp(F.date_trunc("hour", "ts2")).alias("hour_s"),
    )
    hours = bucketed.select("event_type", "hour_s").distinct()
    per_hour = (
        bucketed.groupBy("event_type", "user_id")
        .agg(F.min("hour_s").alias("hour_s"))
        .groupBy("event_type", "hour_s")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hours.join(per_hour, ["event_type", "hour_s"], "left")
        .select(
            "event_type",
            "hour_s",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .select(
            "event_type",
            "hour_s",
            F.sum("new_users").over(w).alias("cum_users"),
        )
    )


@query(
    "e11_streaks",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT user_id,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d
        FROM events
    ),
    grouped AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM daily
    ),
    streaks AS (
        SELECT user_id, MIN(d) AS start_d, COUNT(*) AS len
        FROM grouped
        GROUP BY user_id, grp
    )
    SELECT user_id, start_d, len
    FROM streaks
    ORDER BY len DESC, user_id, start_d
    LIMIT 20
    """,
)
def e11_streaks(spark, sf_dir) -> DataFrame:
    """Gaps-and-islands: each user's CONSECUTIVE-day activity streaks,
    top-20 longest — the engagement/streak metric (and the canonical
    islands construction: day_number − row_number is constant exactly
    within a consecutive run, so one window + one aggregate find every
    island with no self-join and no iteration).  Days are exact
    integer epoch-day numbers in both engines (UTC truncation, the
    k10 discipline), so group keys can never drift.

    k6 measures day-over-day RETENTION (pairs of adjacent days), k20
    finds the silent holes; this is the run-length view of the same
    activity surface — all three derive from the one distinct
    (user, day) projection, which at 100 TB is materialized once
    (events collapse ~100:1 into it) and serves the whole battery.

    Plan: a distinct shuffle on (user, day) — map-side partial first,
    so the exchange carries the ~100:1-collapsed projection — then one
    re-exchange to the user-only key for the window; the island
    aggregate is a REFINEMENT of the window partitioning (no third
    exchange, plan-guarded) and top-20 is a heap.  At scale the
    distinct (user, day) table is the materialized artifact and the
    first exchange disappears."""
    e = load(spark, sf_dir, "events")
    # integer floor division (DIV), not double-divide-then-cast: the
    # cast truncates toward zero, which diverges from the oracle's
    # floor semantics for pre-1970 timestamps (ADVICE r6)
    daily = e.select(
        "user_id",
        F.expr("unix_timestamp(date_trunc('day', ts2)) DIV 86400").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = daily.withColumn(
        "grp", F.col("d") - F.row_number().over(w)
    )
    return (
        grouped.groupBy("user_id", "grp")
        .agg(F.min("d").alias("start_d"), F.count(F.lit(1)).alias("len"))
        .select("user_id", "start_d", "len")
        .orderBy(F.col("len").desc(), "user_id", "start_d")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# e14 — rolling regression slope (windowed trend over the hourly series)
# ---------------------------------------------------------------------------

@query(
    "e14_rolling_slope",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    ),
    win AS (
        SELECT event_type, h, cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(h) OVER w AS BIGINT) AS sx,
               CAST(SUM(cents) OVER w AS BIGINT) AS sy,
               CAST(SUM(h * cents) OVER w AS BIGINT) AS sxy,
               CAST(SUM(h * h) OVER w AS BIGINT) AS sxx
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, h, cents,
           CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0 THEN
               FLOOR((n * sxy - sx * sy) * 1.0
                     / (n * sxx - sx * sx) * 10000) / 10000
           END AS slope_cents_per_h
    FROM win
    ORDER BY event_type, h
    """,
)
def e14_rolling_slope(spark, sf_dir) -> DataFrame:
    """Rolling least-squares TREND: per event type, the regression
    slope of hourly revenue-cents over the trailing 24 observed hours
    — the windowed version of d23's whole-series regression, and the
    trend detector monitoring dashboards draw ("is this metric
    accelerating?"; k17 flags level anomalies, k24 finds the single
    hardest level SHIFT, e14 tracks the local derivative).

    Exact by decomposition: slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) where
    x is the integer hour number and y integer cents — all five
    window sums are BIGINTs over the SAME frame, so the only float is
    the final division, floored at 4dp with identical IEEE semantics.
    Degenerate frames (n<2) emit NULL rather than a zero-division.

    Plan / 100 TB shape: one hour-collapse aggregate (events →
    per-hour rows, ~10³:1), then ALL five rolling sums share one
    window frame over one event_type exchange — Spark evaluates them
    in a single WindowExec pass; the frame is ROWS-bounded so state
    is O(24) per key.  The streaming form maintains the five sums
    incrementally (add newest, subtract oldest) — the classic
    O(1)-per-event sliding regression."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts2").alias("bucket")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            )
        )
        .select(
            "event_type",
            F.expr("unix_timestamp(bucket) DIV 3600").alias("h"),
            "cents",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-23, Window.currentRow)
    )
    win = hourly.select(
        "event_type",
        "h",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("h").over(w).alias("sx"),
        F.sum("cents").over(w).alias("sy"),
        F.sum(F.col("h") * F.col("cents")).over(w).alias("sxy"),
        F.sum(F.col("h") * F.col("h")).over(w).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        (F.col("n") >= 2) & (denom != 0),
        F.floor(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / denom
            * 10000
        )
        / 10000,
    )
    return win.select(
        "event_type", "h", "cents", slope.alias("slope_cents_per_h")
    ).orderBy("event_type", "h")
