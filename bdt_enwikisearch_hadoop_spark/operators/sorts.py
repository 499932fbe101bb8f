"""§2.F — sorts, limits, top-k (SURVEY.md §2.F; reference parity:
sorted MR output and the query-time top-k list).

Scale notes (100 TB): a global ORDER BY is a range-partitioned shuffle
(sampled boundaries) — fine once, at the very end of a pipeline.
ORDER BY + LIMIT never does that: Catalyst plans
``TakeOrderedAndProject`` — each task keeps a k-row heap, the driver
merges per-task heaps; no global sort, no full shuffle.  That is the
only acceptable global-top-k shape at scale.  Every ordering carries a
unique tiebreaker (§2.0 rule 4) so LIMIT results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import query
from ..sources import load
from .prefix_scan import prefix_agg


@query(
    "f1_orderby_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    """,
)
def f1_orderby_multi(spark, sf_dir) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange).  The compare
    is order-insensitive, but this ordering feeds f2/f3."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "f2_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def f2_global_topk(spark, sf_dir) -> DataFrame:
    """Global top-20 → TakeOrderedAndProject (per-task heaps, no global
    sort — verify via .explain)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "f3_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def f3_limit_offset(spark, sf_dir) -> DataFrame:
    """Pagination: rows 11-20 of the same total order."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "f4_nulls_ordering",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri
    FROM orders
    ORDER BY pri NULLS FIRST, o_orderkey
    LIMIT 20
    """,
)
def f4_nulls_ordering(spark, sf_dir) -> DataFrame:
    """Explicit NULLS FIRST ordering under a LIMIT (engines default
    differently: Spark ASC = nulls first, DuckDB ASC = nulls last —
    so the direction must be SPELLED OUT, §2.0 rule 4 applies for the
    unique o_orderkey tiebreaker).  Still TakeOrderedAndProject —
    per-task heaps, no global sort."""
    o = load(spark, sf_dir, "orders")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    return (
        o.select("o_orderkey", pri.alias("pri"))
        .orderBy(F.col("pri").asc_nulls_first(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "f5_tpch_q3_topk",
    oracle="""
    SELECT l.l_orderkey,
           CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(9,6)))) * 100)
                AS DOUBLE) / 100 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def f5_tpch_q3_topk(spark, sf_dir) -> DataFrame:
    """TPC-H Q3 (shipping priority) — the composed flagship shape:
    selective dim filter → two fact joins → exact-decimal money
    aggregate (d1's FLOOR-cents rule) → top-10 heap.

    100 TB shape: the mktsegment filter prunes customers BEFORE the
    join (pushdown), orders/lineitem equi-join shuffles on the order
    key with both date predicates pushed into the scans, partial
    aggregation collapses lineitems map-side, and the final ordering is
    a TakeOrderedAndProject heap — never a global sort of the
    aggregate."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    revenue = (
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
    ).alias("revenue")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("orderdate"), F.col("l_orderkey")
    ).limit(10)


@query(
    "f6_tpch_q5",
    oracle="""
    SELECT n_name,
           FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(9,6)) - CAST(l_discount AS DECIMAL(9,6))))
                 * 100) / 100 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def f6_tpch_q5(spark, sf_dir) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the classic six-table snowflake
    chain — region→nation→supplier dims onto the customer⋈orders⋈lineitem
    fact spine, with the c_nationkey = s_nationkey "local supplier"
    constraint folded into the supplier join.  Revenue uses the exact
    DECIMAL FLOOR-cents recipe (§2.0 rule 1).

    100 TB shape: region/nation/supplier/customer are all dimension-sized
    → Catalyst broadcasts every one of them (AQE confirms from runtime
    stats), so the ONLY shuffle in the whole plan is the final 5-group
    aggregate exchange; the o_orderdate year slice is pushed into the
    orders scan (PushedFilters) and prunes the fact spine before any
    join.  Join ORDER is dictated by selectivity — r_name picks 1-of-5
    regions, which prunes nations, which prunes suppliers — exactly the
    reordering Catalyst's cost model performs on the declarative plan;
    nothing here is hand-scheduled."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = (
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
    ).alias("revenue")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "f7_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(9,6)) - CAST(l_discount AS DECIMAL(9,6))))
                 * 100) / 100 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def f7_tpch_q10(spark, sf_dir) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter — fact spine filtered on BOTH sides
    (order date on orders, returnflag on lineitem) before the join,
    then a broadcast nation lookup and a TakeOrdered top-k heap
    (c_custkey tiebreak, §2.0 rule 4).

    100 TB shape: both fact predicates push into their scans, so the
    join spine only shuffles the returned-lineitem slice of one
    quarter; nation broadcasts; the per-customer aggregate is the one
    big exchange and the top-20 never global-sorts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = (
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
    ).alias("revenue")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "f8_tpch_q14",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(9,6)) - CAST(l_discount AS DECIMAL(9,6)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(9,6)) - CAST(l_discount AS DECIMAL(9,6)))) AS DOUBLE),
             4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def f8_tpch_q14(spark, sf_dir) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one month's
    revenue — a conditional-aggregate ratio over the lineitem⋈part
    join.  Both sums are EXACT decimals (identical across engines);
    only the final ratio goes through double, rounded 4dp.

    100 TB shape: the ship-month predicate prunes the fact scan to
    ~1/84th of the data; part is a broadcast dim; CASE-conditioned
    partial aggregation means ONE pass and one scalar crosses the
    final exchange — the d15 FILTER-clause pattern fused into a
    join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-02-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(9,6)") - F.col("l_discount").cast("decimal(9,6)")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    total = F.sum(rev)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * promo.cast("double")
                / total.cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "f9_tpch_q6",
    oracle="""
    SELECT FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(9,6))) * 100) / 100
               AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def f9_tpch_q6(spark, sf_dir) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-filter-aggregate — no join, no group — whose entire cost is
    how little data leaves the scan.

    100 TB shape: all three predicates push into the parquet reader
    (PushedFilters: date range, discount range, quantity bound —
    row-group statistics skip most of the file before decode), the
    scan reads exactly 4 columns, and a single decimal scalar crosses
    one exchange.  This is the query that proves pushdown works; the
    plan guard asserts the PushedFilters line."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.floor(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,2)")
                        * F.col("l_discount").cast("decimal(9,6)")
                    )
                    * 100
                ).cast("double")
                / 100
            ).alias("forecast_revenue")
        )
    )


@query(
    "f10_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 180
    )
    SELECT c_name, c_custkey, o.o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM customer
    JOIN orders o  ON c_custkey = o_custkey
    JOIN lineitem  ON o.o_orderkey = l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o.o_orderkey, orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def f10_tpch_q18(spark, sf_dir) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, joined back for customer detail — the
    aggregate-then-semi-join-then-reaggregate shape.

    100 TB shape: the HAVING subquery is ONE partial-agg pass over
    lineitem producing a key set far smaller than the fact; Catalyst
    plans the IN as a LEFT SEMI join that prunes orders AND the
    second lineitem pass before the detail aggregate; top-100 is a
    TakeOrdered heap.  The quantity sums stay exact (integral doubles
    well under 2^53 — cast to BIGINT at the edge)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 180)
        .select("l_orderkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# f11–f15 — TPC-H subquery breadth: the remaining classic decorrelation
# shapes (Q4 EXISTS, Q15 view+scalar-max, Q2 min-cost correlated, Q11
# scalar-threshold HAVING, Q20 nested semi).  The fixture has no
# partsupp table and no l_commitdate/l_receiptdate, so Q2/Q4/Q11/Q20
# keep their SHAPE (the thing Catalyst must decorrelate) with the
# cost/availability/lateness predicate re-grounded on columns the
# fixture ships; Q15 is literal minus the missing address columns.
# ---------------------------------------------------------------------------


@query(
    "f11_tpch_q4_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def f11_tpch_q4_exists(spark, sf_dir) -> DataFrame:
    """TPC-H Q4 (order priority checking) — the EXISTS-against-fact
    decorrelation shape: a quarter of orders, counted by priority, kept
    only if SOME lineitem of the order matches a predicate (fixture has
    no commit/receipt dates, so "late line" becomes "returned line",
    same shape).  Catalyst rewrites the EXISTS into a LEFT SEMI join
    (RewritePredicateSubquery) — at 100 TB that is one hash semi-join
    on the order key with both scans pre-filtered by pushed predicates,
    never a per-order probe of lineitem."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o.createOrReplaceTempView("f11_orders")
    li.createOrReplaceTempView("f11_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM f11_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM f11_lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "f12_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(9,6))
                            - CAST(l_discount AS DECIMAL(9,6)))) * 100) / 100
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def f12_tpch_q15(spark, sf_dir) -> DataFrame:
    """TPC-H Q15 (top supplier) — the view/CTE + scalar-threshold shape:
    a revenue view over one quarter of lineitem, reused twice (once
    joined to supplier, once under MAX), keeping the supplier(s) whose
    revenue equals the global max.  Revenue uses the exact DECIMAL
    FLOOR-cents recipe (§2.0 rule 1) so the equality against MAX is
    exact in both engines — never compare raw float sums for equality.

    100 TB shape: the view aggregates to supplier-cardinality (tiny) in
    ONE shuffle, then the global MAX rides a single-partition WINDOW
    over that aggregate — deliberately, because the scalar-subquery
    formulation plans the view twice (exchange reuse does not engage
    across the AQE broadcast boundary; observed: two full lineitem
    scans), while the window form provably scans lineitem ONCE
    (plan-guarded in tests/test_plans.py).  A one-partition window is
    the §2.0-forbidden global-window shape ONLY when applied to raw
    data; over a supplier-sized aggregate it is a metadata-cost
    reduction, the same bounded exception as the IVF shortlist."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    total_revenue = (
        F.floor(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(9,6)")
                    - F.col("l_discount").cast("decimal(9,6)")
                )
            )
            * 100
        )
        / 100
    ).alias("total_revenue")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        total_revenue
    )
    from pyspark.sql import Window

    ranked = revenue.withColumn(
        "mx",
        F.max("total_revenue").over(Window.partitionBy()),
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(ranked, s.s_suppkey == ranked.supplier_no)
        .filter(F.col("total_revenue") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "f13_tpch_q2_mincost",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name,
           FLOOR(unit_cost * 100) / 100 AS best_cost
    FROM part
    JOIN cost     ON p_partkey = cost.l_partkey
    JOIN supplier ON s_suppkey = cost.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      AND unit_cost = (
          SELECT MIN(c2.unit_cost)
          FROM cost c2
          JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE r2.r_name = 'EUROPE' AND c2.l_partkey = p_partkey
      )
    ORDER BY p_partkey, s_name
    """,
)
def f13_tpch_q2_mincost(spark, sf_dir) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) — the min-cost CORRELATED scalar
    subquery shape: for each qualifying part, the European supplier(s)
    whose unit cost equals the minimum European unit cost FOR THAT PART
    (fixture has no partsupp, so unit cost is derived from lineitem as
    min(extendedprice/quantity) per part-supplier — same correlation
    structure).  The equality compares MIN aggregates of identical IEEE
    doubles, which are order-insensitive and therefore engine-exact;
    only the displayed cost is floored.

    The correlated MIN is executed as its WINDOW-MIN equivalent: the
    European cost table is computed ONCE and each row compares against
    ``min(unit_cost) over (partition by l_partkey)`` — row-for-row the
    decorrelated subquery's semantics (a part with no European cost
    rows has no row to survive the equality, exactly as a NULL scalar
    subquery fails it; the equality compares the same IEEE doubles).
    Catalyst's own RewriteCorrelatedScalarSubquery (kept as the
    oracle's stated form) instead built the cost aggregate TWICE —
    once for the main join, once under the decorrelated MIN — and
    sort-merge-joined the two part-keyed sides (round-15 measurement:
    2.25 s executor CPU against a 1.09 s wall floor; plans/r15/ shows
    the two lineitem aggregate towers and the SMJ collapse into one
    aggregate + one window).  At 100 TB: one fact aggregate and one
    part-keyed window shuffle, never a per-part re-scan; region/
    nation/supplier broadcast everywhere they appear."""
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load(spark, sf_dir, "region").filter(
                F.col("r_name") == "EUROPE"
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    eu_cost = cost.join(
        F.broadcast(eu_supp), cost.l_suppkey == F.col("s_suppkey")
    )
    wmin = Window.partitionBy("l_partkey")
    best = eu_cost.withColumn(
        "min_cost", F.min("unit_cost").over(wmin)
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    part = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    return (
        best.join(
            F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            (F.floor(F.col("unit_cost") * 100) / 100).alias("best_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "f14_tpch_q11_having",
    oracle="""
    SELECT l_partkey,
           FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100) / 100
               AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > (
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.002
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    )
    ORDER BY part_value DESC, l_partkey
    """,
)
def f14_tpch_q11_having(spark, sf_dir) -> DataFrame:
    """TPC-H Q11 (important stock) — the scalar-threshold HAVING shape:
    per-part value held by one nation's suppliers, kept only when it
    exceeds a FRACTION of the nation's total (fixture has no partsupp,
    so value is the extendedprice mass in lineitem — same two-level
    aggregate structure).  Both sides are exact DECIMAL sums, so the
    threshold comparison is engine-exact.

    100 TB shape: the uncorrelated scalar subquery runs ONCE (it is the
    same aggregate one level up — Catalyst reuses the joined scan's
    exchange), broadcasts as a literal into the HAVING filter, and the
    per-part aggregate is one shuffle on l_partkey; supplier/nation
    broadcast onto the fact scan."""
    for name, tbl in (
        ("f14_lineitem", "lineitem"),
        ("f14_supplier", "supplier"),
        ("f14_nation", "nation"),
    ):
        load(spark, sf_dir, tbl).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT l_partkey,
               CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100)
                    / 100 AS DOUBLE) AS part_value
        FROM f14_lineitem
        JOIN f14_supplier ON l_suppkey = s_suppkey
        JOIN f14_nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > (
            SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.002
            FROM f14_lineitem
            JOIN f14_supplier ON l_suppkey = s_suppkey
            JOIN f14_nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
        )
        ORDER BY part_value DESC, l_partkey
        """
    )


@query(
    "f15_tpch_q20_nested",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
          SELECT li.l_suppkey
          FROM lineitem li
          WHERE li.l_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE 'large%')
            AND li.l_shipdate >= TIMESTAMP '1996-01-01'
            AND li.l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY li.l_suppkey, li.l_partkey
          HAVING SUM(li.l_quantity) > (
              SELECT 0.3 * SUM(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = li.l_partkey
                AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l2.l_shipdate <  TIMESTAMP '1997-01-01'
          )
      )
    ORDER BY s_suppkey
    """,
)
def f15_tpch_q20_nested(spark, sf_dir) -> DataFrame:
    """TPC-H Q20 (potential part promotion) — the NESTED-semi shape:
    suppliers in one nation who, for some 'large%' part, shipped more
    than 30% of that part's annual volume (fixture has no partsupp
    availqty, so the threshold re-grounds on shipped quantity — the
    nesting depth is the point: an IN containing a GROUP BY containing
    a CORRELATED scalar subquery containing another IN).

    Catalyst must decorrelate ALL levels to joins: the part IN becomes
    a semi join onto lineitem, the correlated per-part total becomes an
    aggregate joined on l_partkey, the HAVING survivor set semi-joins
    onto supplier — plan-guarded in tests/test_plans.py (two LeftSemi
    joins, no per-row subquery execution, no cartesian).  Quantities
    are integer-valued doubles, so the 0.3× threshold is engine-exact.

    100 TB shape: everything shuffles on l_partkey / l_suppkey once
    each; part ('large%' names) and the nation's suppliers broadcast."""
    for name, tbl in (
        ("f15_lineitem", "lineitem"),
        ("f15_part", "part"),
        ("f15_supplier", "supplier"),
        ("f15_nation", "nation"),
    ):
        load(spark, sf_dir, tbl).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM f15_supplier JOIN f15_nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
          AND s_suppkey IN (
              SELECT li.l_suppkey
              FROM f15_lineitem li
              WHERE li.l_partkey IN (SELECT p_partkey FROM f15_part
                                     WHERE p_name LIKE 'large%')
                AND li.l_shipdate >= TIMESTAMP '1996-01-01'
                AND li.l_shipdate <  TIMESTAMP '1997-01-01'
              GROUP BY li.l_suppkey, li.l_partkey
              HAVING SUM(li.l_quantity) > (
                  SELECT 0.3 * SUM(l2.l_quantity)
                  FROM f15_lineitem l2
                  WHERE l2.l_partkey = li.l_partkey
                    AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l2.l_shipdate <  TIMESTAMP '1997-01-01'
              )
          )
        ORDER BY s_suppkey
        """
    )


@query(
    "f16_tpch_q17_smallqty",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                     AS BIGINT) // 7 AS DOUBLE) / 100 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'ECONOMY'
      AND l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def f16_tpch_q17_smallqty(spark, sf_dir) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) — the correlated-AVG
    decorrelation shape: lineitems of selected parts whose quantity is
    below 20% of THAT PART's average quantity, summed into the lost-
    revenue estimate.  Quantities are integer-valued doubles, so each
    part's AVG is sum/count of exact integers — the same double in
    both engines — and the 0.2× threshold comparison is engine-exact.
    The final money statistic is floor(S·100/7)/100 computed as
    INTEGER division over the exact cent sum (S·100 is an
    integral DECIMAL → BIGINT): the earlier DECIMAL-by-7.0 spelling
    left the quotient's scale/rounding to each engine's decimal rules,
    which disagreed by one cent exactly at a floor boundary at sf0.1
    (spark 67149477.1 vs duckdb 67149477.09) — integer DIV has one
    answer everywhere.

    Catalyst decorrelates the per-part AVG into an aggregate keyed by
    l_partkey joined back to the fact (one extra partkey-sized
    shuffle); the part dim broadcasts.  A per-row re-execution would
    re-scan lineitem once per fact row — the quadratic trap the
    rewrite exists to avoid."""
    for name, tbl in (
        ("f16_lineitem", "lineitem"),
        ("f16_part", "part"),
    ):
        load(spark, sf_dir, tbl).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                         AS BIGINT) DIV 7 AS DOUBLE) / 100 AS avg_yearly
        FROM f16_lineitem
        JOIN f16_part ON p_partkey = l_partkey
        WHERE p_type = 'ECONOMY'
          AND l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity)
              FROM f16_lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


@query(
    "f17_tpch_q22_antijoin",
    oracle="""
    WITH pos AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100)
                AS DOUBLE) / 100 AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def f17_tpch_q22_antijoin(spark, sf_dir) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) — the anti-join + scalar-
    average shape: above-average-balance customers with NO urgent
    order, counted per nation (fixture has no c_phone, so cntrycode →
    c_nationkey; every fixture customer has orders, so the NOT EXISTS
    predicate narrows to urgent orders to stay selective).  The
    above-average test is multiplied through (bal × n > Σbal) so both
    sides are exact DECIMAL/integer arithmetic — comparing against a
    float AVG would be engine-dependent at the ulp and could flip
    boundary rows.

    Catalyst turns NOT EXISTS into a LEFT ANTI hash join on c_custkey
    with the priority filter pushed into the orders scan, and the
    uncorrelated scalar aggregate runs once and broadcasts — the
    classic "who hasn't done X" shape at any scale."""
    for name, tbl in (
        ("f17_customer", "customer"),
        ("f17_orders", "orders"),
    ):
        load(spark, sf_dir, tbl).createOrReplaceTempView(name)
    return spark.sql(
        """
        WITH pos AS (
            SELECT COUNT(*) AS n,
                   SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s
            FROM f17_customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100)
                    AS DOUBLE) / 100 AS totacctbal
        FROM f17_customer, pos
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s
          AND NOT EXISTS (
              SELECT 1 FROM f17_orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


@query(
    "f18_tpch_q7_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(FLOOR(SUM(volume) * 100) AS DOUBLE) / 100 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(9,6))
                      - CAST(l_discount AS DECIMAL(9,6))) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def f18_tpch_q7_volume(spark, sf_dir) -> DataFrame:
    """TPC-H Q7 (volume shipping) — bidirectional nation-pair trade by
    ship year: the double-dimension-role shape (nation joins TWICE,
    once for the supplier side, once for the customer side) with a
    disjunctive cross-pair predicate that must NOT collapse into a
    cross product.

    100 TB shape: both nation dims and their filters broadcast; the
    fact spine shuffles once per equi-join key (orderkey, custkey);
    the two-year slice pushes into the lineitem scan.  The OR predicate
    stays a join FILTER on broadcast-joined dims — cheap — while the
    equi-keys carry the join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(9,6)") - F.col("l_discount").cast("decimal(9,6)")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.floor(F.sum("volume") * 100).cast("double") / 100).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "f19_tpch_q19_disjunct",
    oracle="""
    SELECT CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(9,6))
                             - CAST(l_discount AS DECIMAL(9,6)))) * 100)
                AS DOUBLE) / 100 AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def f19_tpch_q19_disjunct(spark, sf_dir) -> DataFrame:
    """TPC-H Q19 (discounted revenue) — the disjunctive-predicate join:
    three OR'd conjunction arms mixing dim attributes (brand, size)
    with fact attributes (quantity) over one equi-join (fixture has no
    container/shipmode/shipinstruct, so the arms use brand/size/
    quantity — the OR-of-ANDs structure is the point).

    What the optimizer must do (and the plan shows): the join stays an
    EQUI-join on p_partkey — the disjunction is a post-join filter,
    never a fallback to a nested-loop theta join — and the common
    IsNotNull/partkey conditions are factored out and pushed into both
    scans.  The part dim broadcasts; revenue uses the DECIMAL FLOOR
    recipe."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    revenue = (
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
    ).alias("revenue")
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(
            arm("Brand#1", 10, 1, 15)
            | arm("Brand#2", 20, 10, 25)
            | arm("Brand#3", 30, 20, 35)
        )
        .agg(revenue)
    )


# ---------------------------------------------------------------------------
# f20–f25 — completing the TPC-H shape set (Q1, Q8, Q9, Q12, Q16, Q21):
# with these, all 22 TPC-H query shapes are represented — literal where
# the fixture has the columns (Q1), re-grounded where it lacks
# partsupp / commitdate / shipmode / phone (the optimizer shape — what
# Catalyst must decorrelate, broadcast, or conditionally aggregate —
# is preserved in every case).
# ---------------------------------------------------------------------------


@query(
    "f20_tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100)
                AS DOUBLE) / 100 AS sum_base_price,
           CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(9,6))
                             - CAST(l_discount AS DECIMAL(9,6)))) * 100)
                AS DOUBLE) / 100 AS sum_disc_price,
           CAST(FLOOR(CAST(SUM(
                    CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS HUGEINT)
                    * (1000000 - CAST(ROUND(l_discount * 1000000) AS BIGINT))
                    * (1000000 + CAST(ROUND(l_tax * 1000000) AS BIGINT))
                ) AS DOUBLE) / 1e12) AS DOUBLE) / 100 AS sum_charge,
           CAST(FLOOR(SUM(l_quantity) / COUNT(*) * 10000) AS DOUBLE)
               / 10000 AS avg_qty,
           CAST(FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) / COUNT(*) * 100) AS DOUBLE)
               / 100 AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def f20_tpch_q1_pricing(spark, sf_dir) -> DataFrame:
    """TPC-H Q1 (pricing summary) — LITERAL: the canonical wide
    aggregate over one fact scan, six measures per (returnflag,
    linestatus) group.  Averages are derived from exact sums — integer
    quantity sums and DECIMAL money sums — divided by the group count,
    never a float AVG whose accumulation order differs per engine (the
    decimal→double conversion of an exact sum is deterministic; the
    division of two identical doubles is too).  The triple product
    sum_charge (price × (1-disc) × (1+tax)) overflows both engines'
    practical decimal widths, so it runs in SCALED-INTEGER arithmetic:
    cents × micro-units × micro-units as DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — exact per row and in the sum, converted to
    double once at the end.

    100 TB shape: the single most scan-bound query in the suite — one
    pushdown-filtered pass, map-side partial aggregation into SIX
    groups, one tiny exchange.  This is the query that measures raw
    columnar scan + codegen throughput, which is why TPC-H puts it
    first."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2000-01-01"
    )
    dec_price = F.col("l_extendedprice").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(9,6)")
    disc = F.col("l_discount").cast("decimal(9,6)")
    tax = F.col("l_tax").cast("decimal(9,6)")
    f2 = lambda c: F.floor(c * 100).cast("double") / 100  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            f2(F.sum(dec_price)).alias("sum_base_price"),
            f2(F.sum(dec_price * (one - disc))).alias("sum_disc_price"),
            # cents × (1e6 − micro-disc) stays EXACT in LONG arithmetic
            # (≤ ~1.05e7 × 1e6 ≈ 1e13 ≪ 2^63); only the final factor
            # pushes past long range (~1.1e19), so exactly ONE decimal
            # multiply remains.  Identical integer value per row and in
            # the sum to the previous three-way decimal(38,0) product —
            # just one BigDecimal multiply and one long→decimal cast
            # per row instead of two and three (round-15 measure: the
            # decimal ladder dominated this scan-bound key's CPU).
            (
                F.floor(
                    F.sum(
                        (
                            F.round(F.col("l_extendedprice") * 100)
                            .cast("long")
                            * (
                                F.lit(1000000)
                                - F.round(
                                    F.col("l_discount") * 1000000
                                ).cast("long")
                            )
                        ).cast("decimal(38,0)")
                        * (
                            F.lit(1000000)
                            + F.round(F.col("l_tax") * 1000000).cast("long")
                        ).cast("decimal(38,0)")
                    ).cast("double")
                    / F.lit(1e12)
                ).cast("double")
                / 100
            ).alias("sum_charge"),
            (
                F.floor(
                    F.sum("l_quantity") / F.count(F.lit(1)) * 10000
                ).cast("double")
                / 10000
            ).alias("avg_qty"),
            (
                F.floor(
                    F.sum(dec_price).cast("double")
                    / F.count(F.lit(1))
                    * 100
                ).cast("double")
                / 100
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "f21_tpch_q8_share",
    oracle="""
    SELECT o_year,
           CAST(FLOOR(CAST(SUM(CASE WHEN nation = 'NATION_5'
                                    THEN volume ELSE CAST(0 AS DECIMAL(18,8))
                               END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE) * 10000) AS DOUBLE)
               / 10000 AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(9,6))
                      - CAST(l_discount AS DECIMAL(9,6))) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def f21_tpch_q8_share(spark, sf_dir) -> DataFrame:
    """TPC-H Q8 (national market share) — the conditional-ratio shape:
    one nation's share of a region's order volume per year, computed as
    SUM(CASE)/SUM over the same rows (never two scans).  Both sums are
    exact DECIMAL; the ratio converts each exact sum to its (unique)
    nearest double before dividing, so the quotient is engine-exact,
    then 4dp-floored.

    100 TB shape: eight-table snowflake where every dim broadcasts
    (nation TWICE in different roles); the conditional numerator rides
    the same partial aggregate as the denominator — the CASE costs one
    column, not one scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(9,6)") - F.col("l_discount").cast("decimal(9,6)")
    )
    base = (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == r.r_regionkey)
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    num = F.sum(
        F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,8)")
        )
    )
    den = F.sum("volume")
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.floor(
                    num.cast("double") / den.cast("double") * 10000
                ).cast("double")
                / 10000
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "f22_tpch_q9_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(FLOOR(SUM(amount) * 100) AS DOUBLE) / 100 AS sum_profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(9,6))
                      - CAST(l_discount AS DECIMAL(9,6)))
               - CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(0.1 AS DECIMAL(3,1))
                   * CAST(l_quantity AS DECIMAL(9,1)) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def f22_tpch_q9_profit(spark, sf_dir) -> DataFrame:
    """TPC-H Q9 (product-type profit) — profit per supplier nation per
    year over a name-matched part family (fixture has no partsupp, so
    unit cost re-grounds as 10% of the part's retail price — the
    revenue-minus-cost DECIMAL arithmetic and the nation/year rollup
    are the shape).  All terms are exact DECIMAL products; the sum is
    floored to cents once at the end.

    100 TB shape: the LIKE filter prunes part first (broadcast), the
    fact spine shuffles on its equi-keys, and the (nation, year)
    aggregate is tiny — the query is join-bound, which is why Q9 is
    TPC-H's join-order stress test."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(9,6)")
        - F.col("l_discount").cast("decimal(9,6)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.lit(0.1).cast(
        "decimal(3,1)"
    ) * F.col("l_quantity").cast("decimal(9,1)")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.floor(F.sum("amount") * 100).cast("double") / 100).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "f23_tpch_q12_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def f23_tpch_q12_priority(spark, sf_dir) -> DataFrame:
    """TPC-H Q12 (shipping modes & priority) — conditional counts of
    high/low-priority orders among LATE shipments (fixture has no
    shipmode or commit/receipt dates, so the class key re-grounds on
    returnflag and "late" on ship-after-order+30d — the join +
    dual-CASE-count shape is intact).  The row-level date comparison
    is exact timestamp arithmetic in both engines.

    100 TB shape: one fact⋈fact equi-join on the order key with the
    year slice pushed into the lineitem scan; both CASE counts ride
    the same partial aggregate — the canonical "two measures, one
    pass" pattern."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "f24_tpch_q16_suppcnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2500
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def f24_tpch_q16_suppcnt(spark, sf_dir) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) — distinct supplier
    counts per part attribute group with a NOT IN exclusion subquery
    (fixture has no partsupp, so the part-supplier relation comes from
    lineitem; no s_comment, so the "complaints" exclusion re-grounds
    on low account balance).  NOT IN — unlike NOT EXISTS — is
    NULL-AWARE: one NULL in the subquery would empty the result, and
    Catalyst must plan a null-aware anti join, not a plain anti join.

    100 TB shape: the exclusion list is supplier-sized (broadcast anti
    join); the distinct count shuffles on the group key with the
    supplier set deduplicated per group — Expand + two-phase
    aggregate, never a corpus-wide distinct."""
    for name, tbl in (
        ("f24_part", "part"),
        ("f24_lineitem", "lineitem"),
        ("f24_supplier", "supplier"),
    ):
        load(spark, sf_dir, tbl).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM f24_part
        JOIN f24_lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM f24_supplier WHERE s_acctbal < 2500
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@query(
    "f25_tpch_q21_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_2'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def f25_tpch_q21_waiting(spark, sf_dir) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the double
    correlated EXISTS/NOT-EXISTS over the SAME fact: in finished
    multi-supplier orders, the supplier whose line was the ONLY
    returned one (fixture has no receipt/commit dates, so "late"
    re-grounds on returnflag='R'; the two opposing correlated
    subqueries against lineitem are the shape — TPC-H's hardest
    decorrelation).  Catalyst lowers them to a LEFT SEMI and a LEFT
    ANTI join on l_orderkey, three passes over the same fact that AQE
    plans off one shuffled copy.

    100 TB shape: all three lineitem legs shuffle on l_orderkey —
    co-partitioned, so the semi/anti probes are local; supplier/nation
    broadcast; the final per-supplier count is dimension-sized."""
    for name, tbl in (
        ("f25_supplier", "supplier"),
        ("f25_lineitem", "lineitem"),
        ("f25_orders", "orders"),
        ("f25_nation", "nation"),
    ):
        load(spark, sf_dir, tbl).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM f25_supplier
        JOIN f25_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN f25_orders ON o_orderkey = l1.l_orderkey
        JOIN f25_nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND n_name = 'NATION_2'
          AND EXISTS (
              SELECT 1 FROM f25_lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM f25_lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )


@query(
    "f26_yoy_growth",
    oracle="""
    WITH yearly AS (
        SELECT l_returnflag,
               CAST(year(l_shipdate) AS INT) AS yr,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        GROUP BY l_returnflag, year(l_shipdate)
    )
    SELECT l_returnflag, yr, revenue,
           lag(revenue) OVER w AS prev_revenue,
           FLOOR((revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w * 10000) / 10000 AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY yr)
    """,
)
def f26_yoy_growth(spark, sf_dir) -> DataFrame:
    """Year-over-year revenue growth per return flag — the canonical
    BI ladder: a corpus-sized aggregate first, then window analytics
    over the AGGREGATE (lag + ratio), never over raw rows.  First year
    per flag has NULL prev/growth by definition.

    The window input is |flags|·|years| rows (~21 here), so its sort
    is free; the only real cost is the one fact-table aggregate with
    map-side partials.  Revenue is rounded 4dp BEFORE the ratio so
    both engines difference identical doubles; the growth ratio is
    FLOOR-truncated (§2.0 rule 1).  At 100 TB this reads a per-day
    pre-aggregate (k10's rollup ladder), not the fact table."""
    li = load(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        "l_returnflag", F.year("l_shipdate").cast("int").alias("yr")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )
    w = Window.partitionBy("l_returnflag").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "l_returnflag",
        "yr",
        "revenue",
        prev.alias("prev_revenue"),
        (F.floor((F.col("revenue") - prev) / prev * 10000) / 10000).alias(
            "yoy_growth"
        ),
    )


@query(
    "f27_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def f27_skyline(spark, sf_dir) -> DataFrame:
    """2-D skyline (Pareto frontier): the parts no other part strictly
    dominates on (lower price, bigger size).  The textbook formulation
    is the oracle's quadratic NOT EXISTS self-join; this impl is the
    O(n log n) WINDOW form: collapse to one row per distinct price
    (max size at that price), running-max the sizes in price order,
    and a part is on the frontier iff its size equals the max at its
    own price AND beats the running max over all STRICTLY lower prices
    (rows-frame lag of the prefix max — ties on both axes survive, as
    strict dominance requires).

    100 TB shape: the per-price collapse is one map-side-combined
    groupBy whose output is price-domain-bounded, so the prefix-max
    window runs over a dim-sized table (the classic two-phase prefix
    scan if the domain ever grows), and the verdict joins back
    BROADCAST onto the corpus — never an all-pairs comparison.  The
    plan must contain no CartesianProduct/BroadcastNestedLoopJoin
    (plan-guarded)."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return pareto_frontier(p, "p_retailprice", "p_size")


def pareto_frontier(df: DataFrame, price_col: str, size_col: str) -> DataFrame:
    """The reusable window-form 2-D skyline over (minimize price_col,
    maximize size_col); strict dominance, ties on both axes survive.
    Property-tested against a brute-force dominance scan on random
    points (tests/test_properties.py)."""
    per_price = df.groupBy(price_col).agg(F.max(size_col).alias("mx"))
    # exclusive prefix-max via the two-phase scan: the per-price table
    # is price-DOMAIN-sized, but a domain can grow with the data — the
    # partitioned form costs the same one exchange and never
    # single-partitions (operators/prefix_scan.py)
    lvl = prefix_agg(
        per_price, [price_col], "mx", "m_lt", agg="max", inclusive=False
    )
    return (
        df.join(F.broadcast(lvl), price_col)
        .filter(
            (F.col(size_col) == F.col("mx"))
            & (F.col("m_lt").isNull() | (F.col(size_col) > F.col("m_lt")))
        )
        .select(df.columns)
    )


@query(
    "f28_cumulative_crossover",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               o_orderkey % 2 AS ch,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders
        GROUP BY date_trunc('month', o_orderdate), o_orderkey % 2
    ),
    c AS (
        SELECT mon, ch,
               SUM(rev) OVER (PARTITION BY ch ORDER BY mon) AS cum
        FROM m
    ),
    p AS (
        SELECT mon,
               MAX(CASE WHEN ch = 0 THEN cum END) AS ca,
               MAX(CASE WHEN ch = 1 THEN cum END) AS cb
        FROM c
        GROUP BY mon
    ),
    f AS (
        SELECT mon,
               COALESCE(last_value(ca IGNORE NULLS) OVER w, 0) AS cum_a,
               COALESCE(last_value(cb IGNORE NULLS) OVER w, 0) AS cum_b
        FROM p
        WINDOW w AS (ORDER BY mon
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(mon, '%Y-%m') AS mon,
           CAST(cum_a AS DOUBLE) AS cum_a,
           CAST(cum_b AS DOUBLE) AS cum_b,
           cum_a > cum_b AS a_leads
    FROM f
    ORDER BY mon
    """,
)
def f28_cumulative_crossover(spark, sf_dir) -> DataFrame:
    """TPC-DS Q51's signature shape: two channels' CUMULATIVE revenue
    curves (channel = an orderkey-parity split of the single fixture
    fact) pivoted onto one month axis with a who-leads verdict per
    month — the crossover detector ("when did web overtake store").
    A channel with no sales in some month CARRIES its running total
    (forward-fill over the pivoted axis, e8/k9's ignore-nulls
    pattern) — the first cut full-outer-joined the two curves and
    COALESCEd gaps to 0, which collapsed a 187M curve to zero in any
    month the channel went quiet; both engines agreed, so only the
    monotonicity property test caught it (Q51's own LEFT/FULL JOIN
    sketch has the same trap).  All money math is DECIMAL end to end;
    the lead flag compares exact decimals, so it can never flip on
    float accumulation order (f20/c10 discipline).

    100 TB shape: ONE fact pass (plan-guarded single orders scan —
    the pivot formulation, unlike a per-channel self-join, never
    re-reads the fact); the channel×month aggregate collapses
    map-side to a bucket-bounded frame, and the cumulative windows,
    pivot and forward-fill all run on that tiny frame."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("mon"),
            (F.col("o_orderkey") % 2).alias("ch"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    wc = (
        Window.partitionBy("ch")
        .orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = m.select("mon", "ch", F.sum("rev").over(wc).alias("cum"))
    p = c.groupBy("mon").agg(
        F.max(F.when(F.col("ch") == 0, F.col("cum"))).alias("ca"),
        F.max(F.when(F.col("ch") == 1, F.col("cum"))).alias("cb"),
    )
    wf = Window.orderBy("mon").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    zero = F.lit(0).cast("decimal(38,2)")
    cum_a = F.coalesce(F.last("ca", ignorenulls=True).over(wf), zero)
    cum_b = F.coalesce(F.last("cb", ignorenulls=True).over(wf), zero)
    return (
        p.select(
            F.date_format("mon", "yyyy-MM").alias("mon"),
            cum_a.cast("double").alias("cum_a"),
            cum_b.cast("double").alias("cum_b"),
            (cum_a > cum_b).alias("a_leads"),
        )
        .orderBy("mon")
    )


@query(
    "f29_timeband_battery",
    oracle="""
    SELECT
        COUNT(CASE WHEN h >= 0  AND h < 3  THEN 1 END) AS band_00_03,
        COUNT(CASE WHEN h >= 3  AND h < 6  THEN 1 END) AS band_03_06,
        COUNT(CASE WHEN h >= 6  AND h < 9  THEN 1 END) AS band_06_09,
        COUNT(CASE WHEN h >= 9  AND h < 12 THEN 1 END) AS band_09_12,
        COUNT(CASE WHEN h >= 12 AND h < 15 THEN 1 END) AS band_12_15,
        COUNT(CASE WHEN h >= 15 AND h < 18 THEN 1 END) AS band_15_18,
        COUNT(CASE WHEN h >= 18 AND h < 21 THEN 1 END) AS band_18_21,
        COUNT(CASE WHEN h >= 21 AND h < 24 THEN 1 END) AS band_21_24
    FROM (SELECT CAST(date_part('hour', ts) AS INT) AS h
          FROM events WHERE value > 10)
    """,
)
def f29_timeband_battery(spark, sf_dir) -> DataFrame:
    """TPC-DS Q88's signature: EIGHT time-band counts from ONE scan —
    the original spells it as 8 self-joined subqueries (one per
    3-hour band), which executed literally is 8 fact scans; the
    correct plan is 8 conditional aggregates sharing one pass (the
    d15 FILTER pattern widened to a full band battery).  Output is a
    single row: the day-shape profile of qualifying traffic.

    100 TB shape: one scan with the residual predicate pushed down,
    8 map-side-combining conditional counts in one aggregate node,
    single-row output — the canonical many-questions-one-pass
    rewrite.  Adding bands is free; the scan dominates at any width.
    Plan-guarded to exactly one events scan (the literal Q88 shape's
    8 scans being the regression)."""
    e = load(spark, sf_dir, "events")
    h = F.hour("ts2")
    filtered = e.filter(F.col("value") > 10).select(h.alias("h"))
    bands = [
        F.count(F.when((F.col("h") >= lo) & (F.col("h") < lo + 3), 1)).alias(
            f"band_{lo:02d}_{lo + 3:02d}"
        )
        for lo in range(0, 24, 3)
    ]
    return filtered.agg(*bands)


@query(
    "f30_share_of_parent",
    oracle="""
    WITH lv AS (
        SELECT r_name, n_name,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT r_name,
           COALESCE(n_name, 'ALL') AS n_name,
           CAST(rev AS DOUBLE) AS revenue,
           FLOOR(rev * 10000.0
                 / CASE WHEN n_name IS NOT NULL
                        THEN SUM(CASE WHEN n_name IS NULL THEN rev END)
                             OVER (PARTITION BY r_name)
                        ELSE SUM(CASE WHEN n_name IS NULL THEN rev END)
                             OVER ()
                   END) / 10000 AS share_of_parent
    FROM lv
    WHERE r_name IS NOT NULL
    ORDER BY r_name, n_name
    """,
)
def f30_share_of_parent(spark, sf_dir) -> DataFrame:
    """Share-of-parent in a ROLLUP hierarchy — the BI drill-down
    staple: each nation's revenue as a fraction of its REGION, and
    each region's as a fraction of the GRAND TOTAL — every row divided
    by its parent level (so nation shares sum to 1 within each region
    and region shares sum to 1 overall, both property-tested).  The
    trick is doing it WITHOUT a second scan or a self-join: one ROLLUP
    produces both levels, and a window keyed by "my parent's group"
    (region for nation rows, the NULL singleton — i.e. all regions —
    for region rows) picks each row's parent total from the SAME
    frame: the subtotal rows double as the denominator table.

    100 TB shape: the ROLLUP is one fact pass with map-side partial
    aggregation (k10's physics); the share window runs on the
    (regions × nations + regions)-row aggregate.  Money math is
    DECIMAL through the window; the one division floors at 4dp.
    Plan-guarded: a single orders scan — the join-back-to-subtotals
    formulation reads the fact twice."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    lv = (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        .filter(F.col("r_name").isNotNull())
    )
    # two windows, one per parent level: the region SUBTOTAL row must
    # sit INSIDE the nation rows' partition to serve as denominator —
    # the first cut partitioned nation rows by a key the subtotal row
    # didn't share, so every nation share was NULL in BOTH engines
    # (parity passed; the level-conservation property test caught it)
    subtotal = F.when(F.col("n_name").isNull(), F.col("rev"))
    region_total = F.sum(subtotal).over(Window.partitionBy("r_name"))
    grand_total = F.sum(subtotal).over(Window.partitionBy())
    parent_rev = F.when(
        F.col("n_name").isNotNull(), region_total
    ).otherwise(grand_total)
    return (
        lv.select(
            "r_name",
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.col("rev").cast("double").alias("revenue"),
            (F.floor(F.col("rev") * 10000.0 / parent_rev) / 10000).alias(
                "share_of_parent"
            ),
        )
        .orderBy("r_name", "n_name")
    )
