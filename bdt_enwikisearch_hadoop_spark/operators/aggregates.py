"""§2.D — aggregations (SURVEY.md §2.D, reference parity: the MR
combiner/reducer phase of the reconstructed Hadoop job chain).

Scale notes (100 TB): every query here is a single hash-aggregate
shuffle on its grouping key.  Spark plans these as partial (map-side)
aggregation → exchange → final aggregation automatically — the exact
combiner pattern the reference hand-wired — so data crossing the wire
is one row per (partition, group), not per input row.  Grouping keys
are low-cardinality (flags, statuses, buckets), so AQE coalesces the
post-shuffle partitions; no skew mitigation needed.  d10 demonstrates
the partial/final decomposition explicitly.

Determinism (SURVEY §2.0 rule 1): money sums go through exact
DECIMAL(18,2) arithmetic in BOTH engines and surface as DOUBLE
(decimal→double conversion is correctly-rounded IEEE, identical on
both sides); small-magnitude float aggregates are ROUND(x, 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import query
from ..sources import load
from .prefix_scan import global_ntile


def _money_sum(col, alias: str):
    """Exact money sum: per-row cast to DECIMAL(18,2), exact decimal sum,
    surfaced as DOUBLE (see module docstring)."""
    return F.sum(col.cast("decimal(18,2)")).cast("double").alias(alias)


@query(
    "d1_groupby_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(9,6)))) * 100)
                AS DOUBLE) / 100 AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d1_groupby_basic(spark, sf_dir) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial→final hash aggregation."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        _money_sum(F.col("l_extendedprice"), "sum_base_price"),
        # cast each FACTOR to decimal, not the double product: the
        # double->decimal cast of a product rounds differently across
        # engines at half-cent ties; decimal x decimal is exact in both.
        # Then truncate the exact sum to whole cents via FLOOR(x*100)
        # BEFORE the double cast: a scale-8 sum ~5e9 is an 18-digit
        # scaled integer > 2^53 where DuckDB's two-step decimal->double
        # conversion double-rounds, and decimal RESCALING can't be used
        # either (DuckDB truncates, Spark rounds HALF_UP).  The floored
        # cent count fits 2^53 exactly in both engines.
        (
            F.floor(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(9,6)")
                        - F.col("l_discount").cast("decimal(9,6)")
                    )
                )
                * 100
            ).cast("double")
            / 100
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "d2_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def d2_count_distinct(spark, sf_dir) -> DataFrame:
    """Exact distinct: Spark expands to a two-phase agg (distinct then count).

    At 100 TB the expand doubles shuffle volume — d3 is the sketch-based
    alternative when exactness is negotiable.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("d3_approx_count_distinct")  # no oracle: HLL sketch values are engine-specific
def d3_approx_count_distinct(spark, sf_dir) -> DataFrame:
    """HLL±5%: single-pass, fixed-size sketch per group — the 100 TB
    default for distinct-counting (constant memory, one shuffle of
    sketches, no expand)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("approx_cust")
    )


@query(
    "d4_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def d4_grouping_sets(spark, sf_dir) -> DataFrame:
    """Multi-grain aggregation in one pass (Expand operator: each input
    row is replicated once per grouping set before a single shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("d4_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n
        FROM d4_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "d5_rollup",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
)
def d5_rollup(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "d6_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def d6_cube(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@query(
    "d7_having",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
)
def d7_having(spark, sf_dir) -> DataFrame:
    """Post-aggregation filter (HAVING) — Catalyst keeps it above the agg."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            _money_sum(F.col("o_totalprice"), "total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@query(
    "d8_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_SAMP(l_discount), 4) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 4) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d8_agg_stats(spark, sf_dir) -> DataFrame:
    """Statistical aggregates — single-pass (Welford-style) in both engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 4).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("cov_qty_disc"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "d9_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events
    GROUP BY user_id % 10
    """,
)
def d9_pivot(spark, sf_dir) -> DataFrame:
    """Pivot with an EXPLICIT value list — never let Spark launch the
    extra distinct-values job (a full scan) at 100 TB."""
    e = load(spark, sf_dir, "events")
    piv = (
        e.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot yields NULL for empty combinations; the portable oracle yields 0
    return piv.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@query(
    "d10_partial_final",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(partial_qty), 4) AS total_qty,
           COUNT(*) AS n_orders
    FROM (
        SELECT l_returnflag, l_linestatus, l_orderkey,
               SUM(l_quantity) AS partial_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus, l_orderkey
    ) partial
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d10_partial_final(spark, sf_dir) -> DataFrame:
    """Explicit two-phase aggregation (the reference's combiner made
    first-class): re-aggregating partial sums equals the direct total.
    At scale the first level also breaks up skewed groups."""
    li = load(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus", "l_orderkey").agg(
        F.sum("l_quantity").alias("partial_qty")
    )
    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("partial_qty"), 4).alias("total_qty"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "d11_salted_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total
    FROM events
    GROUP BY user_id
    """,
)
def d11_salted_agg(spark, sf_dir) -> DataFrame:
    """Skew-mitigation pattern made explicit: salt the hot key, partial
    agg on (key, salt), then merge partials on the key.

    Semantically identical to a direct groupBy (the oracle IS the
    direct form); physically it splits any pathological hot key across
    16 reducers before the (tiny) merge shuffle.  Spark's own partial
    aggregation covers moderate skew — manual salting is for keys so
    hot that even one reducer's final-agg slice overflows; at 100 TB
    this is the standard fix for power-law user/term distributions.

    SUM order caveat: the two-level double sum must match the oracle's
    one-level sum at ROUND(4) — safe here because per-user values are
    few thousand doubles of magnitude ~1e2 (error << 5e-5); money-scale
    sums would use the exact DECIMAL path of d1 instead.
    """
    e = load(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").cast("long").alias("n"),
        F.round(F.sum("pv").cast("double"), 4).alias("total"),
    )


@query(
    "d12_percentiles",
    oracle="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_quantity, 0.5) * 10000) / 10000 AS p50_qty,
           FLOOR(quantile_cont(l_quantity, 0.9) * 10000) / 10000 AS p90_qty,
           FLOOR(quantile_cont(l_extendedprice, 0.99) * 10000) / 10000 AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d12_percentiles(spark, sf_dir) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont; FLOOR-truncated because the two interpolation
    formulas can differ by an ulp).  At 100 TB exact percentiles
    require a full sort per group — approx_percentile (t-digest,
    rows-only d13) is the scale path."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("d12_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               FLOOR(percentile(l_quantity, 0.5) * 10000) / 10000 AS p50_qty,
               FLOOR(percentile(l_quantity, 0.9) * 10000) / 10000 AS p90_qty,
               FLOOR(percentile(l_extendedprice, 0.99) * 10000) / 10000 AS p99_price
        FROM d12_lineitem
        GROUP BY l_returnflag
        """
    )


@query("d13_approx_percentile")  # no oracle: sketch-based, engine-specific
def d13_approx_percentile(spark, sf_dir) -> DataFrame:
    """Approximate percentiles via Spark's incremental sketch — single
    pass, fixed memory, mergeable across partitions: the 100 TB
    replacement for d12's per-group sort.

    Output is one SCALAR row per (group, percentile) — the sketch's
    array result is exploded so rows-only harnesses (which canonicalize
    by sorting every column) never see an unhashable list cell."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.5, 0.9], 10000).alias("approx"),
    )
    return agg.select(
        "l_returnflag",
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0.5), F.lit(0.9)).alias("pct"),
                F.col("approx").alias("approx_qty"),
            )
        ).alias("z"),
    ).select(
        "l_returnflag",
        F.col("z.pct").alias("pct"),
        F.col("z.approx_qty").alias("approx_qty"),
    )


@query(
    "d14_histogram_q13",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
    GROUP BY n_orders
    """,
)
def d14_histogram_q13(spark, sf_dir) -> DataFrame:
    """TPC-H Q13 shape: customer-order-count distribution (outer join →
    per-key count → histogram of counts).  Two shuffles, the second over
    a tiny domain; the left join keeps zero-order customers in bucket 0."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "d15_filtered_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d15_filtered_agg(spark, sf_dir) -> DataFrame:
    """Filtered aggregates (SQL FILTER clause): several differently-
    conditioned aggregates in ONE pass over the fact table — the
    idiomatic replacement for N self-joins or N separate scans.  Spark
    expresses the filter as when(cond, x); both forms fold into the
    same partial/final hash aggregate.  Money sum in DECIMAL (§2.0
    rule 1)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk"),
        F.sum(
            F.when(
                F.col("l_discount") > 0.05,
                F.col("l_extendedprice").cast("decimal(18,2)"),
            )
        )
        .cast("double")
        .alias("disc_revenue"),
    )


@query("d16_hll_sketch_merge")
def d16_hll_sketch_merge(spark, sf_dir) -> DataFrame:
    """Mergeable-sketch rollup (rows-only, like d3/d13: datasketches
    estimates are engine-specific): per-NATION HyperLogLog sketches of
    distinct ordering customers, hll_union_agg'd up to per-REGION
    estimates — without ever re-touching the fact table.

    This is THE re-aggregation architecture at 100 TB: partial sketches
    are small, mergeable and associative, so a daily/nation-level
    pre-aggregation can serve any coarser rollup (region, global,
    rolling windows) by sketch union alone, where exact countDistinct
    would need a full re-shuffle of raw keys per rollup level.  Output
    is scalar-only (estimate bigint) — the sketch binary never leaves
    the plan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    )
    return (
        per_nation.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            per_nation.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_regionkey")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            "n_regionkey",
            F.hll_sketch_estimate("sk").alias("est_customers"),
        )
    )


@query("d17_approx_top_k")
def d17_approx_top_k(spark, sf_dir) -> DataFrame:
    """Sketch-based heavy hitters (rows-only, sketch family of
    d3/d13/d16): the top-10 most frequent corpus tokens via Spark 4's
    approx_top_k — a bounded-memory frequent-items sketch where exact
    per-term counting would shuffle the full vocabulary.  Output is
    posexploded to scalar rows (rank, term, cnt) so the rows-only
    canonicalizer never sees a nested type (the d13 lesson).

    100 TB: the sketch is mergeable and fixed-size (maxItemsTracked),
    so heavy-hitter tracking costs one narrow pass + a tiny final merge
    regardless of vocabulary size — the d16 rollup argument applied to
    frequency instead of cardinality."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"))
    sk = tok.agg(F.expr("approx_top_k(term, 10)").alias("top"))
    return sk.select(
        F.posexplode("top").alias("rank", "entry")
    ).select(
        F.col("rank").cast("long").alias("rank"),
        F.col("entry.item").alias("term"),
        F.col("entry.count").cast("long").alias("cnt"),
    )


@query(
    "d18_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def d18_bitmap_distinct(spark, sf_dir) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps: keys map to
    (bucket, bit-position), per-(group, bucket) bitmaps are built with
    bitmap_construct_agg, and the group total is the SUM of per-bucket
    popcounts (buckets cover disjoint key ranges, so counts add).
    Oracle-identical to COUNT(DISTINCT) — the difference is the
    re-aggregation algebra.

    100 TB role: the EXACT counterpart of d16's HLL ladder.
    COUNT(DISTINCT) plans an expensive key-expand; a bitmap partial is
    a fixed ≤512 KiB value PER BUCKET that ors/merges associatively —
    persist the (group, bucket, bitmap) partials once and ANY coarser
    rollup (status → all-statuses, day → month) is bitmap_or_agg +
    popcount over partials, never a rescan of raw keys.  Dense integer
    key spaces suit bitmaps; sparse/string keys go to d16's sketches."""
    o = load(spark, sf_dir, "orders")
    part = (
        o.select(
            "o_orderstatus",
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
            F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
        )
        .groupBy("o_orderstatus", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    return part.groupBy("o_orderstatus").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_customers")
    )


@query(
    "d19_multi_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def d19_multi_distinct(spark, sf_dir) -> DataFrame:
    """Several COUNT(DISTINCT ...) over DIFFERENT columns in one
    aggregate — Catalyst plans it with Expand (one replicated stream
    per distinct column, tagged by grouping id) feeding a single
    shuffle, then per-tag dedup + final merge: one pass over the fact
    no matter how many distinct measures ride it.

    100 TB note: Expand multiplies shuffle rows by the number of
    distinct columns — fine for 2-3 measures; beyond that (or on hot
    groups) switch each measure to its d3/d16 sketch or d18 bitmap
    form, which partial-aggregates map-side instead of replicating."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "d20_conditional_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity >= 25) AS BIGINT) AS n_bulk,
           bool_and(l_extendedprice > 0) AS all_positive,
           bool_or(l_discount > 0.08) AS any_deep_discount,
           CAST(MAX(CASE WHEN l_tax = 0 THEN l_orderkey END) AS BIGINT)
               AS max_untaxed_order
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d20_conditional_aggs(spark, sf_dir) -> DataFrame:
    """Conditional/boolean aggregate battery (§2.D breadth): count_if,
    bool_and/bool_or (SQL EVERY/SOME), and the MAX-of-CASE idiom for
    "latest key where predicate held" — monitoring-dashboard
    aggregates ("how many bulk lines, is every price sane, did any
    deep discount occur").  Every aggregate here is deterministic
    (any_value is deliberately absent: its result is
    partition-order-dependent, the §2.0 rule 4 violation).

    All four ride ONE partial aggregate — conditions evaluate
    map-side, the exchange carries six counters per group."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
            F.bool_and(F.col("l_extendedprice") > 0).alias("all_positive"),
            F.bool_or(F.col("l_discount") > 0.08).alias("any_deep_discount"),
            F.max(
                F.when(F.col("l_tax") == 0, F.col("l_orderkey"))
            ).alias("max_untaxed_order"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d21_mode_deterministic",
    oracle="""
    WITH counted AS (
        SELECT l_returnflag, l_linenumber, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linenumber
    )
    SELECT l_returnflag,
           l_linenumber AS modal_line,
           cnt AS modal_count
    FROM counted
    QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
                               ORDER BY cnt DESC, l_linenumber) = 1
    """,
)
def d21_mode_deterministic(spark, sf_dir) -> DataFrame:
    """Deterministic MODE: the most frequent l_linenumber per return
    flag, ties broken by the SMALLEST value — the §2.0-safe spelling
    of an aggregate both engines ship with unspecified tie behavior
    (Spark ``mode()`` and DuckDB ``mode()`` may disagree on ties, so
    neither is oracle-usable; the count+rank formulation pins it).

    Two-phase shape: the (flag, value) count aggregate collapses the
    fact table map-side first, then the rank window runs over the
    value-cardinality-sized counted table — at 100 TB the window input
    is |groups|·|distinct values| rows, not the corpus."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_linenumber").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_linenumber")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linenumber").alias("modal_line"),
            F.col("cnt").alias("modal_count"),
        )
    )


@query(
    "d22_equi_depth_histogram",
    oracle="""
    SELECT bucket, COUNT(*) AS n,
           MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
    FROM (
        SELECT l_extendedprice,
               ntile(8) OVER (ORDER BY l_extendedprice,
                              l_orderkey, l_linenumber) AS bucket
        FROM lineitem
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def d22_equi_depth_histogram(spark, sf_dir) -> DataFrame:
    """Equi-DEPTH histogram: 8 buckets with (near-)equal row counts and
    the observed [lo, hi] price range of each — the optimizer/BI
    histogram that adapts bucket width to data density where d14's
    equi-width bucketing cannot (one dense region swallows a fixed
    grid).  NTILE's remainder rule (first buckets get the extra row)
    is identical in Spark and DuckDB, and the ORDER BY carries the
    (orderkey, linenumber) pk so equal prices split deterministically.

    100 TB shape: NTILE needs a TOTAL order, but not a single
    partition — the built-in ``ntile`` window plans Exchange
    SinglePartition (one task holds the fact table), so this computes
    the identical SQL remainder rule from the two-phase distributed
    rank (operators/prefix_scan.py): an order-aligned bucket from an
    approx_percentile boundary sketch, a PARTITIONED local rank (one
    parallel exchange of the 3 narrow columns), the bucket-count-sized
    offset closure broadcast back, then ``(rank, total) → tile`` as a
    map expression.  Exact — the sketch only places bucket boundaries,
    never tile boundaries — so the oracle check is unchanged; at
    petabyte row counts the sketch-only variant (approx boundaries AS
    the answer) remains the documented cheaper fallback."""
    li = load(spark, sf_dir, "lineitem")
    return (
        global_ntile(
            li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            8,
            "bucket",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "d23_regression_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           FLOOR(regr_slope(l_extendedprice, l_quantity) * 10000) / 10000
               AS slope,
           FLOOR(regr_intercept(l_extendedprice, l_quantity) * 10000) / 10000
               AS intercept,
           FLOOR(regr_r2(l_extendedprice, l_quantity) * 10000) / 10000
               AS r2,
           FLOOR(corr(l_extendedprice, l_discount) * 10000) / 10000
               AS corr_price_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d23_regression_stats(spark, sf_dir) -> DataFrame:
    """In-database linear regression as an AGGREGATE: per return flag,
    the OLS slope/intercept of extended price on quantity, the fit's
    R², and a cross-measure correlation — the SQL-standard REGR_*
    family (feature screening, drift monitors, quick trend fits
    without exporting to a stats stack).  Both engines implement the
    same closed-form moment accumulators, and every output is
    4dp-floored: the moments are sums of ~1e9-scale products whose
    accumulation-order error sits ~1000× below the rounding step, so
    the floor is safe (measured, not assumed).

    100 TB shape: REGR_* aggregates are single-pass MERGEABLE moment
    sketches (n, Σx, Σy, Σxx, Σxy, Σyy) — they partial-aggregate
    map-side like any SUM, so the exchange carries 6 doubles per
    group, and the same moments serve slope, intercept, R² and corr
    without a second scan.  This is d8's stats battery upgraded from
    description (avg/stddev) to RELATIONSHIP (fit between measures)."""
    li = load(spark, sf_dir, "lineitem")
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            f4(F.expr("regr_slope(l_extendedprice, l_quantity)")).alias(
                "slope"
            ),
            f4(F.expr("regr_intercept(l_extendedprice, l_quantity)")).alias(
                "intercept"
            ),
            f4(F.expr("regr_r2(l_extendedprice, l_quantity)")).alias("r2"),
            f4(F.corr("l_extendedprice", "l_discount")).alias(
                "corr_price_discount"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d24_benford_test",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                                AS VARCHAR),
                           1, 1) AS INT) AS d1
        FROM lineitem
        WHERE l_extendedprice >= 1
    ),
    obs AS (SELECT d1, COUNT(*) AS n FROM digits GROUP BY d1),
    w AS (SELECT d1, n, SUM(n) OVER () AS nt FROM obs)
    SELECT d1,
           n,
           FLOOR(n * 10000.0 / nt) / 10000 AS observed_p,
           FLOOR(LN(1.0 + 1.0 / d1) / LN(10.0) * 10000) / 10000
               AS benford_p,
           FLOOR(POW(n * 1.0 / nt - LN(1.0 + 1.0 / d1) / LN(10.0), 2)
                 / (LN(1.0 + 1.0 / d1) / LN(10.0)) * nt * 10000) / 10000
               AS chi2_term
    FROM w
    ORDER BY d1
    """,
)
def d24_benford_test(spark, sf_dir) -> DataFrame:
    """Benford first-digit conformance test: the observed leading-digit
    distribution of a monetary measure against Benford's law
    (P(d) = log10(1 + 1/d)) with the per-digit χ² contribution — the
    classic fraud / synthetic-data / unit-mixup detector (organically
    grown magnitudes follow Benford; fabricated or truncated ones
    don't), run entirely in-engine as one aggregate.  The fixture's
    uniform-ish synthetic prices genuinely FAIL Benford — large χ²
    terms are the correct answer here, and exactly what this check
    exists to flag.

    First digit via explicit FLOOR → bigint → string — exact and
    identical in both engines (a bare double→BIGINT cast TRUNCATES in
    Spark but ROUNDS in DuckDB — one row per ~10⁴ flips digit, caught
    by the oracle; and never log10-of-value, whose 2.9999… artifacts
    misbin powers of ten).  Expected probabilities and χ² terms are
    deterministic scalar math on exact integer counts, 4dp-floored.

    100 TB shape: a 9-row output from ONE map-side-collapsing
    aggregate; the digit extraction rides the scan.  This plus j43
    (constraints), j45 (winsorize) and d23 (drift fits) is the
    data-quality battery a lakehouse runs on every load."""
    li = load(spark, sf_dir, "lineitem")
    digits = li.filter(F.col("l_extendedprice") >= 1).select(
        F.substring(
            F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d1")
    )
    obs = digits.groupBy("d1").agg(F.count(F.lit(1)).alias("n"))
    # total via a global window over the 9-row digit table — the fact
    # is scanned ONCE (a separate agg-and-join branch rescans it)
    w = obs.withColumn(
        "nt", F.sum("n").over(Window.partitionBy(F.lit(1)))
    )
    benford = F.log(1.0 + 1.0 / F.col("d1")) / F.log(F.lit(10.0))
    p_obs = F.col("n") / F.col("nt")
    return (
        w
        .select(
            "d1",
            "n",
            (F.floor(F.col("n") * 10000.0 / F.col("nt")) / 10000).alias(
                "observed_p"
            ),
            (F.floor(benford * 10000) / 10000).alias("benford_p"),
            (
                F.floor(
                    F.pow(p_obs - benford, 2) / benford * F.col("nt") * 10000
                )
                / 10000
            ).alias("chi2_term"),
        )
        .orderBy("d1")
    )


@query(
    "d25_entropy_gini",
    oracle="""
    WITH seg AS (
        SELECT user_id % 10 AS segment, event_type, COUNT(*) AS n
        FROM events
        GROUP BY user_id % 10, event_type
    ),
    w AS (SELECT segment, n, SUM(n) OVER (PARTITION BY segment) AS nt
          FROM seg)
    SELECT segment,
           CAST(nt AS BIGINT) AS n_events,
           FLOOR(SUM(-(n * 1.0 / nt) * LN(n * 1.0 / nt)) * 10000) / 10000
               AS entropy_nats,
           FLOOR((1.0 - SUM(POW(n * 1.0 / nt, 2))) * 10000) / 10000
               AS gini_impurity
    FROM w
    GROUP BY segment, nt
    ORDER BY segment
    """,
)
def d25_entropy_gini(spark, sf_dir) -> DataFrame:
    """Information-theoretic segment profiling: Shannon entropy (nats)
    and Gini impurity of each user segment's event-type mix — the
    diversity/purity measures behind decision-tree splits, behavioral
    segmentation and mixture monitoring (a segment whose entropy
    collapses changed behavior; one near ln(5) is uniform across the
    5 event types).

    Both statistics are sums over the (segment × type) probability
    table — NOT over raw events: the inner aggregate collapses
    map-side to segment×type counts, the totals ride a segment-keyed
    join of two tiny frames, and the outer aggregate is
    segment-bounded.  p·ln(p) terms are identical IEEE doubles in both
    engines (exact integer ratios through ln), 4dp-floored.

    100 TB shape: one corpus aggregate + bucket-sized everything
    after; the same two-level shape computes entropy over ANY
    categorical column (vocabulary entropy for i12's pruning
    decisions, label entropy for j5's centroids)."""
    e = load(spark, sf_dir, "events")
    seg = (
        e.select(
            (F.col("user_id") % 10).alias("segment"), "event_type"
        )
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = seg.withColumn(
        "nt", F.sum("n").over(Window.partitionBy("segment"))
    )
    p = F.col("n") / F.col("nt")
    return (
        w
        .groupBy("segment", "nt")
        .agg(
            (F.floor(F.sum(-p * F.log(p)) * 10000) / 10000).alias(
                "entropy_nats"
            ),
            (F.floor((1.0 - F.sum(F.pow(p, 2))) * 10000) / 10000).alias(
                "gini_impurity"
            ),
        )
        .select(
            "segment",
            F.col("nt").alias("n_events"),
            "entropy_nats",
            "gini_impurity",
        )
        .orderBy("segment")
    )


@query(
    "d26_weighted_percentile",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice, l_quantity,
               SUM(l_quantity) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS cumw,
               SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
        FROM lineitem
    )
    SELECT l_returnflag,
           MIN(CASE WHEN cumw >= 0.5 * totw THEN l_extendedprice END)
               AS w_median,
           MIN(CASE WHEN cumw >= 0.9 * totw THEN l_extendedprice END)
               AS w_p90
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d26_weighted_percentile(spark, sf_dir) -> DataFrame:
    """WEIGHTED percentiles: the price at which half (p50) and 90%
    (p90) of the QUANTITY mass has been accumulated, per return flag —
    "the median unit shipped cost X", which is a different (and for
    volume questions, the right) statistic from d12's row-median ("the
    median line item cost X") whenever weights vary.  The estimator is
    the standard lower weighted percentile: the first value whose
    cumulative weight reaches p·W, over the (value, pk) total order.

    Cross-engine exactness: quantities and the running sums are exact
    (integral doubles well inside 2^53; the window order is pk-total),
    and the 0.5·W / 0.9·W thresholds are the same IEEE products —
    the comparison is then exact, so the selected price needs no
    rounding at all.

    100 TB shape: one sort-shuffle per group (the same cost envelope
    as d12's exact interpolated percentiles — both need the group
    ordered); the per-group pick is a conditional MIN that collapses
    map-side.  The mergeable-sketch substitute is a weighted t-digest;
    below that scale, exact is strictly better and this is its
    one-pass spelling.  (Round 16 measured the grouped two-phase-scan
    alternative — prefix_agg over (flag, bucket) with total_col — at
    CPU 3.31 → 3.44 s / wall 1.89 → 1.93 s min-of-3 A/B: the second
    corpus pass and closure join cost exactly what the spread
    parallelism buys back at this group count, so the single-pass
    shape stays, as test_exact_quantile_keys_single_sort_no_rescans
    pins.)"""
    li = load(spark, sf_dir, "lineitem")
    wo = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wt = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(wo).alias("cumw"),
        F.sum("l_quantity").over(wt).alias("totw"),
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(
                    F.col("cumw") >= 0.5 * F.col("totw"),
                    F.col("l_extendedprice"),
                )
            ).alias("w_median"),
            F.min(
                F.when(
                    F.col("cumw") >= 0.9 * F.col("totw"),
                    F.col("l_extendedprice"),
                )
            ).alias("w_p90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d27_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               FLOOR(quantile_cont(value, 0.5) * 10000) / 10000 AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.value,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               FLOOR(quantile_cont(adev, 0.5) * 10000) / 10000 AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           ANY_VALUE(m2.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * m2.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m2 USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def d27_mad_outliers(spark, sf_dir) -> DataFrame:
    """Robust outlier detection via MEDIAN ABSOLUTE DEVIATION: per
    event type, MAD = median(|x − median|) and the count of values
    beyond 3·MAD — the robust sibling of k17's z-score: a single
    extreme value drags a mean/stddev fence toward itself (masking),
    while medians are 50%-breakdown estimators, so the fence holds
    even when the contamination is large.  Both medians are
    4dp-FLOORED before reuse (the deviation median feeds a comparison,
    so an interpolation ulp would flip boundary rows — d12/e9's
    discipline applied twice).

    100 TB shape: two grouped exact medians (each one sort-shuffle per
    key, d12's envelope) with the tiny per-type median/MAD tables
    BROADCAST back between them; the verdict pass is map-side.  At
    key cardinalities where two sorts hurt, both medians take the
    approx_percentile sketch (mergeable, same plan shape) — the fence
    is a threshold, where sketch error is usually acceptable long
    before it is in a reported quantile."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        (F.floor(F.expr("percentile(value, 0.5)") * 10000) / 10000).alias(
            "med"
        )
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        (F.floor(F.expr("percentile(adev, 0.5)") * 10000) / 10000).alias(
            "mad"
        )
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("mad").alias("mad"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# d28 — revenue concentration: top-decile customer share per nation
# ---------------------------------------------------------------------------

@query(
    "d28_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey, c.c_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    ranked AS (
        SELECT c_nationkey, cents,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY cents DESC, c_custkey) AS rn,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM spend
    )
    SELECT c_nationkey,
           CAST(n_cust AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS tot_cents,
           CAST(SUM(CASE WHEN rn <= CAST(CEIL(n_cust * 0.1) AS BIGINT)
                         THEN cents ELSE 0 END) AS BIGINT) AS top_cents,
           (SUM(CASE WHEN rn <= CAST(CEIL(n_cust * 0.1) AS BIGINT)
                     THEN cents ELSE 0 END) * 10000 // SUM(cents))
               / 10000.0 AS top_decile_share
    FROM ranked
    GROUP BY c_nationkey, n_cust
    ORDER BY c_nationkey
    """,
)
def d28_concentration(spark, sf_dir) -> DataFrame:
    """Revenue concentration per nation: the share of total customer
    spend held by the TOP DECILE of customers — the Pareto/whale
    metric (d25's entropy/Gini sibling, but rank-based: "do 10% of
    customers carry 60% of revenue?").  Decile membership is exact
    integer rank ≤ ceil(n/10) with (spend, custkey) ties, sums are
    exact cents, and the share is integer floor division at 4dp — no
    float percentile machinery anywhere (contrast d12's interpolated
    percentiles, which this deliberately avoids for the cross-engine
    hash).

    Plan / 100 TB shape: one (nation, customer)-keyed aggregate
    collapses orders ~10:1, then the rank and count windows share ONE
    nation-keyed exchange (a refinement of the first — AQE coalesces),
    and the final aggregate rides the same partitioning.  Per-nation
    state is the sort, linear in customers; nation count bounds the
    output.  The same shape serves any "top-p% share" audit (token
    share of top domains, dup-cluster mass, j48's budget telemetry)."""
    c = load(spark, sf_dir, "customer").select("c_nationkey", "c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    wr = Window.partitionBy("c_nationkey").orderBy(
        F.col("cents").desc(), "c_custkey"
    )
    wn = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_cust"),
    )
    top = F.col("rn") <= F.ceil(F.col("n_cust") * 0.1).cast("long")
    return (
        ranked.groupBy("c_nationkey", "n_cust")
        .agg(
            F.sum("cents").alias("tot_cents"),
            F.sum(F.when(top, F.col("cents")).otherwise(F.lit(0))).alias(
                "top_cents"
            ),
        )
        .select(
            "c_nationkey",
            "n_cust",
            "tot_cents",
            "top_cents",
            (
                F.expr("top_cents * 10000 DIV tot_cents") / 10000.0
            ).alias("top_decile_share"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# d29 — chi-square independence test (lang × source contingency)
# ---------------------------------------------------------------------------

@query(
    "d29_chi_square",
    oracle="""
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS o
        FROM documents
        GROUP BY lang, source
    ),
    margins AS (
        SELECT lang, source, o,
               CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS row_n,
               CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS col_n,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM cells
    )
    SELECT lang, source, o,
           FLOOR(row_n * 1.0 * col_n / n * 10000) / 10000 AS expected,
           FLOOR(POW(o - row_n * 1.0 * col_n / n, 2)
                 / (row_n * 1.0 * col_n / n) * 10000) / 10000 AS chi2_term
    FROM margins
    ORDER BY lang, source
    """,
)
def d29_chi_square(spark, sf_dir) -> DataFrame:
    """Chi-square test of independence for the lang × source
    contingency table: observed counts, expected counts under
    independence (row·col/N), and each cell's χ² term — the
    categorical-association test a data-quality suite runs to catch
    e.g. one crawl source silently skewing toward one language
    (d24's Benford sibling for two-way tables; summing chi2_term and
    comparing to the χ² quantile at (R−1)(C−1) df is the verdict
    step, left to the reader of the table as d24 does).

    Determinism: observed counts and both margins are exact BIGINTs
    (margins as windows over the CELL table — one scan, d25's
    discipline); expected values are integer-ratio doubles floored at
    4dp.

    Plan / 100 TB shape: one hash aggregate on (lang, source) —
    cell-count-bounded output — then three window totals over that
    tiny table; the corpus is touched exactly once.  The same shape
    serves any two-way association audit (source × dup-flag,
    lang × quality-keep)."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    m = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_n"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_n"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_n") * F.col("col_n") / F.col("n")
    return m.select(
        "lang",
        "source",
        "o",
        (F.floor(e * 10000) / 10000).alias("expected"),
        (F.floor(F.pow(F.col("o") - e, 2) / e * 10000) / 10000).alias(
            "chi2_term"
        ),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# d30 — 2-D equi-width histogram (profiling heatmap binning)
# ---------------------------------------------------------------------------

@query(
    "d30_histogram_2d",
    oracle="""
    SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bin,
           CAST(FLOOR(l_discount / 0.02) AS BIGINT) AS disc_bin,
           COUNT(*) AS n,
           ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY qty_bin, disc_bin
    """,
)
def d30_histogram_2d(spark, sf_dir) -> DataFrame:
    """2-D equi-width histogram over (quantity, discount) with a
    per-cell price average — the joint-distribution heatmap a data
    profiler draws to see how two measures interact (the 2-D
    companion of d22's 1-D equi-depth histogram; d29 tests
    association for CATEGORICAL pairs, this bins CONTINUOUS ones).
    Bin ids are floor division by fixed widths — exact integers in
    both engines (discount/0.02 divides a two-decimal value by an
    exactly-representable step... which 0.02 is NOT in binary; both
    engines compute the identical IEEE division and floor it, which
    is the §2.0 rule-1 contract, and bin EDGES are not hash-compared).

    Plan / 100 TB shape: single hash aggregate keyed on the two bin
    ids — the key space is (qty_range/10)×(1/0.02) ≈ bounded cells,
    so map-side partials collapse the fact stream to cells per task;
    the heatmap is cell-bounded output regardless of corpus size.
    Equi-WIDTH needs no quantile pass (d22's sort) — the trade is
    fixed interpretable edges vs balanced occupancy."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_bin"),
            F.floor(F.col("l_discount") / 0.02).cast("long").alias(
                "disc_bin"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .orderBy("qty_bin", "disc_bin")
    )


# ---------------------------------------------------------------------------
# d31 — UNPIVOT (melt): wide measures to long form, then re-aggregate
# ---------------------------------------------------------------------------

@query(
    "d31_unpivot",
    oracle="""
    WITH long_form AS (
        SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           COUNT(*) AS n,
           ROUND(SUM(val), 2) AS total,
           ROUND(AVG(val), 4) AS mean
    FROM long_form
    GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """,
)
def d31_unpivot(spark, sf_dir) -> DataFrame:
    """UNPIVOT (melt) — the inverse of d9's pivot: three wide measure
    columns rotated into (measure, value) long form with Spark's
    native ``unpivot``, then one aggregate over the long table — the
    reshaping every metrics store and every "one chart per measure"
    dashboard feed needs, and the long form is what makes a SINGLE
    aggregate serve N measures (the wide alternative is N aggregate
    expressions per statistic — d19's shape — which stops scaling in
    code, not in compute, past a handful).

    Plan / 100 TB shape: unpivot is Spark's Expand node — each input
    row fans out to one row per measure BEFORE the shuffle, so the
    exchange carries (groups × measures) partial aggregates, not the
    3× row stream (map-side partials absorb the fan-out exactly as
    d4's grouping-sets Expand does).  The oracle states the portable
    UNION ALL form; Expand is the engine's fused version of it."""
    li = load(spark, sf_dir, "lineitem")
    long_form = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn(
        "measure",
        F.expr(
            "CASE measure WHEN 'l_quantity' THEN 'quantity'"
            " WHEN 'l_extendedprice' THEN 'extendedprice'"
            " ELSE 'discount' END"
        ),
    )
    return (
        long_form.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val"), 2).alias("total"),
            F.round(F.avg("val"), 4).alias("mean"),
        )
        .orderBy("l_returnflag", "measure")
    )


# ---------------------------------------------------------------------------
# d32 — two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------

@query(
    "d32_ab_test",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               user_id % 2 AS arm,
               CAST(MAX(CASE WHEN event_type = 'purchase' AND value >= 300
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events
        GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n_a,
               CAST(SUM(converted) FILTER (arm = 0) AS BIGINT) AS c_a,
               CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n_b,
               CAST(SUM(converted) FILTER (arm = 1) AS BIGINT) AS c_b
        FROM assign
    )
    SELECT n_a, c_a, n_b, c_b,
           FLOOR(c_a * 1.0 / n_a * 10000) / 10000 AS p_a,
           FLOOR(c_b * 1.0 / n_b * 10000) / 10000 AS p_b,
           CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
               FLOOR((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                     / SQRT(((c_a + c_b) * 1.0 / (n_a + n_b))
                            * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)) * 10000) / 10000
           END AS z_score
    FROM arms
    """,
)
def d32_ab_test(spark, sf_dir) -> DataFrame:
    """Two-proportion z-test — the A/B experiment readout: users split
    into deterministic arms (user_id parity standing in for the
    experiment assignment hash), per-user conversion = any BIG
    purchase (value ≥ 300 — rare enough that neither arm saturates),
    and the pooled-proportion z statistic for the difference —
    the number an experimentation platform turns into ship/no-ship
    (|z| > 1.96 ≈ p < .05 two-sided; the d29 chi-square on the 2×2
    table is this statistic squared).  Per-USER conversion first
    (MAX per user), never per-event — event-level counting inflates n
    with within-user correlation, the classic A/B false-positive bug.

    Determinism: the four cells are exact BIGINTs; p̂ and z are
    integer-ratio doubles with one SQRT, floored at 4dp (libm-sqrt is
    correctly rounded on both engines — the j44/d8 precedent).

    Plan / 100 TB shape: one (user)-keyed aggregate collapses events
    ~100:1, then a single 4-cell conditional aggregate — the entire
    readout is two map-side-partial shuffles and a scalar row.  Many
    simultaneous experiments = the same pass with arm-assignment
    columns unpivoted (d31) to (experiment, arm) keys."""
    e = load(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 300),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("arm"), "converted"
    )
    arms = assign.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted"))).cast("long").alias("c_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted"))).cast("long").alias("c_b"),
    )
    pa = F.col("c_a") / F.col("n_a")
    pb = F.col("c_b") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    # degenerate pools (0% or 100% conversion overall) have no defined
    # z — emit NULL instead of a divide-by-zero (the sf0.001 smoke
    # fixture genuinely has zero big-purchase conversions)
    z = F.when(
        (F.col("c_a") + F.col("c_b") > 0)
        & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b")),
        (pa - pb)
        / F.sqrt(
            pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
        ),
    )
    return arms.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        (F.floor(pa * 10000) / 10000).alias("p_a"),
        (F.floor(pb * 10000) / 10000).alias("p_b"),
        (F.floor(z * 10000) / 10000).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# d33 — day-of-week seasonality index
# ---------------------------------------------------------------------------

@query(
    "d33_dow_seasonality",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
               ISODOW(MIN(ts)) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type, date_trunc('day', ts)
    ),
    by_dow AS (
        SELECT event_type, dow,
               CAST(SUM(n) AS BIGINT) AS ev,
               CAST(COUNT(*) AS BIGINT) AS days
        FROM daily
        GROUP BY event_type, dow
    )
    SELECT event_type, dow, ev, days,
           FLOOR((ev * 1.0 / days)
                 / (SUM(ev) OVER (PARTITION BY event_type) * 1.0
                    / SUM(days) OVER (PARTITION BY event_type))
                 * 10000) / 10000 AS seasonal_index
    FROM by_dow
    ORDER BY event_type, dow
    """,
)
def d33_dow_seasonality(spark, sf_dir) -> DataFrame:
    """Day-of-week SEASONALITY INDEX: each weekday's mean daily event
    count relative to the type's overall daily mean (index 1.0 = flat,
    >1 = that weekday runs hot) — the first decomposition every
    forecasting/capacity model applies, and the denominator k17's
    anomaly z-scores should be normalized BY before flagging (a
    Saturday dip isn't an anomaly if Saturdays always dip).  ISO
    weekday numbering on both engines (h2's convention).

    Determinism: per-day counts, per-dow event and day totals are all
    exact BIGINTs; the index is a ratio of two integer-ratio doubles,
    floored at 4dp — identical IEEE operation order spelled the same
    way in both engines.

    Plan / 100 TB shape: events collapse ~10³:1 into (type, day)
    partials map-side, re-aggregate to (type, dow) — 7 rows per type —
    and the type totals are windows over that tiny table (d25's
    one-scan discipline, no join-back).  The same ladder yields
    hour-of-day or month-of-year indices by swapping the bucket."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts2").alias("day")
    ).agg(
        (F.weekday(F.min("ts2")) + 1).alias("dow"),
        F.count(F.lit(1)).alias("n"),
    )
    by_dow = daily.groupBy("event_type", "dow").agg(
        F.sum("n").alias("ev"), F.count(F.lit(1)).alias("days")
    )
    wt = Window.partitionBy("event_type")
    idx = F.floor(
        (F.col("ev") / F.col("days"))
        / (F.sum("ev").over(wt) / F.sum("days").over(wt))
        * 10000
    ) / 10000
    return by_dow.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        "ev",
        "days",
        idx.alias("seasonal_index"),
    ).orderBy("event_type", "dow")


# ---------------------------------------------------------------------------
# d34 — trimmed mean (drop the tail deciles, average the middle)
# ---------------------------------------------------------------------------

@query(
    "d34_trimmed_mean",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS q100,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity, l_orderkey,
                                           l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (rn > n // 10 AND rn <= n - n // 10)
                AS BIGINT) AS n_kept,
           (SUM(q100) FILTER (rn > n // 10 AND rn <= n - n // 10) * 100
            // COUNT(*) FILTER (rn > n // 10 AND rn <= n - n // 10))
               / 10000.0 AS trimmed_mean
    FROM q
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d34_trimmed_mean(spark, sf_dir) -> DataFrame:
    """10% TRIMMED MEAN per group: rank the measure, drop the bottom
    and top deciles, average the middle 80% — the robust location
    estimate between the mean (outlier-hostage) and the median
    (throws away 50% of the data); d27 flags outliers by MAD, j45
    clips them, d34 reports a statistic that never saw them.

    Exact arithmetic end-to-end: the measure quantizes to q100
    BIGINTs, trim boundaries are integer rank comparisons against
    n // 10 (deterministic (value, orderkey, linenumber) tie order),
    and the mean is one integer floor division scaled to 4dp — no
    float accumulation, no interpolation.

    Plan / 100 TB shape: HISTOGRAM form — the measure is discrete
    (~50 distinct quantities), so the corpus-sized work is ONE
    map-side-combining hash aggregate to (group, value, count) and the
    rank arithmetic runs on the tiny histogram: value v occupies the
    contiguous rank range (cum−c, cum] in the (quantity, pk) total
    order (rounding is monotone, so equal-q100 rows are rank-adjacent),
    and its kept count is that range's overlap with the trim window
    (n/10, n−n/10].  Identical output to the row-rank form — which
    rows of a tied value the trim drops never changes the kept SUM —
    without per-group sorting 100 TB of rows: the window sort that was
    the whole cost (and, with few groups, the whole skew) now touches
    |groups|×|distinct values| rows.  For a continuous measure the
    row-rank form (this key's first cut) or approx_percentile bounds
    (d13) remain the fallbacks."""
    li = load(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("q100"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("q100")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag")
    ranged = hist.select(
        "l_returnflag",
        "q100",
        "c",
        F.sum("c").over(wo).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("n") - F.expr("n DIV 10"))
        - F.greatest(F.col("cum") - F.col("c"), F.expr("n DIV 10")),
    )
    return (
        ranged.select("l_returnflag", "q100", "n", kept.alias("kept"))
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.sum("kept").alias("n_kept"),
            (
                F.expr("sum(q100 * kept) * 100 DIV sum(kept)") / 10000.0
            ).alias("trimmed_mean"),
        )
        .orderBy("l_returnflag")
    )
