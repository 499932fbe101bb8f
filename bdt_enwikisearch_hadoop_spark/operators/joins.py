"""§2.C — joins (SURVEY.md §2.C; reference parity: reduce-side join
and distributed-cache map-side join of the reconstructed MR chain).

Scale notes (100 TB):

* Dimension tables (region 5, nation 25, supplier ~1M rows even at
  full scale) are **broadcast** — no shuffle of the fact side at all.
  ``c7`` pins the hint explicitly; elsewhere Catalyst's JoinSelection
  picks broadcast automatically under ``autoBroadcastJoinThreshold``.
* Fact⋈fact equi-joins (orders⋈customer, events self-join) shuffle
  both sides on the key — AQE handles skewed keys
  (``skewJoin.enabled``) by splitting oversized partitions.
* The range/theta join (c8) keeps an equi component (``user_id``) so
  Spark plans a sort-merge join on the key with the range residual as
  a post-join filter — NOT a broadcast-nested-loop over everything.
* The as-of join (c11) is expressed as equi-join + per-row max, which
  shuffles once on the key; same formulation in the oracle (SURVEY §7
  "what's hard" #3 — no DuckDB ASOF JOIN syntax, keeping semantics
  provably identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import query
from ..sources import load


@query(
    "c1_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def c1_join_inner(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "c2_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
      ON c_custkey = o_custkey
    """,
)
def c2_join_left(spark, sf_dir) -> DataFrame:
    """Left outer with genuinely unmatched rows (right side pre-filtered)."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "c3_join_right",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) big
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def c3_join_right(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return big.join(c, big.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "c4_join_full",
    oracle="""
    SELECT rich.c_custkey, rich.c_acctbal, big.o_orderkey, big.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) rich
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
      ON rich.c_custkey = big.o_custkey
    """,
)
def c4_join_full(spark, sf_dir) -> DataFrame:
    """Full outer between two filtered sides → unmatched rows on both."""
    rich = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return rich.join(big, rich.c_custkey == big.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@query(
    "c5_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def c5_join_semi(spark, sf_dir) -> DataFrame:
    """Left semi: probe side streams, build side deduplicates — at scale
    far cheaper than join+distinct."""
    c = load(spark, sf_dir, "customer")
    fo = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(fo, c.c_custkey == fo.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "c6_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def c6_join_anti(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    fo = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(fo, c.c_custkey == fo.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "c7_join_broadcast",
    oracle="""
    SELECT s_suppkey, s_name, n_name, r_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def c7_join_broadcast(spark, sf_dir) -> DataFrame:
    """Explicit broadcast of both dims: zero shuffle of the fact side —
    the Spark-native form of the reference's distributed-cache map-side
    join.  Same rows as a plain join; the feature is the physical plan
    (BroadcastHashJoin, verify via .explain)."""
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@query(
    "c8_join_range_theta",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.ts < b.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def c8_join_range_theta(spark, sf_dir) -> DataFrame:
    """Non-equi range join with an equi anchor: pairs of events of the
    same user within 5 minutes.  The user_id equi component makes this a
    shuffled hash/sort-merge join with the time range as a residual
    filter — never a cross product.  Arithmetic is exact BIGINT
    nanoseconds on the Spark side (ts is epoch-ns, see sources.io)."""
    e = load(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    five_min_ns = 5 * 60 * 1_000_000_000
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.ts") < F.col("b.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.lit(five_min_ns)),
    ).select(
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.user_id").alias("user_id"),
    )


@query(
    "c9_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def c9_join_cross(spark, sf_dir) -> DataFrame:
    """Cartesian product — only ever sane when one side is tiny (5×25
    here); at scale the small side must be broadcast (it is: BNLJ with
    broadcast build)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "c10_join_multiway",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    GROUP BY r_name, n_name
    """,
)
def c10_join_multiway(spark, sf_dir) -> DataFrame:
    """TPC-H Q5-shaped 4-way star join + aggregation.  The two dims
    broadcast; customer⋈orders is the only shuffle, and the final agg
    reuses its partitioning where possible (AQE)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "c11_join_asof",
    oracle="""
    SELECT e.event_id,
           CAST(MAX(o.o_orderdate) AS DATE) AS asof_date,
           COUNT(o.o_orderkey) AS n_prior
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id
    """,
)
def c11_join_asof(spark, sf_dir) -> DataFrame:
    """As-of join: for each event, the latest order of the same user at
    or before the event time (plus how many priors exist) — the
    union/running-window formulation: tag both tables, union, ONE
    shuffle on the user key, and a single ascending time sort per user
    computes the running latest-order date and prior-order count every
    event row then reads off.  Orders sort BEFORE events at equal
    timestamps (is_evt tiebreak) so the asof is inclusive, matching
    the oracle's ``o_orderdate <= ets``.

    At 100 TB this is the one-exchange plan: the earlier equi-join +
    per-event MAX formulation shuffled BOTH tables for the join and
    then paid an events-sized aggregate exchange — measured 0.58 s vs
    0.38 s here at sf0.1 (2 exchanges vs 1), and it replicated each
    event row once per prior order into the join before collapsing.
    Skewed users (one user, millions of rows) are the risk either way;
    AQE's skew handling cannot split a window partition, so a
    pathological key would need the k-series bucketed-time variant.
    """
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    # ts2 is a UTC instant; o_orderdate is naive (NTZ).  Session TZ is
    # pinned UTC so the NTZ cast makes them directly comparable, matching
    # DuckDB's naive-to-naive comparison.
    ev = e.select(
        "user_id",
        F.col("ts2").cast("timestamp_ntz").alias("t"),
        "event_id",
        F.lit(1).alias("is_evt"),
    )
    # NULL-key hygiene: the oracle's equi-join never matches a NULL
    # user_id and `o_orderdate <= ts` is never true for a NULL date, but
    # a window PARTITION BY groups NULLs together — so NULL-keyed or
    # NULL-dated orders must not enter the union or they would count as
    # priors for NULL-keyed events.  Events need no filter: a NULL-key
    # event lands in a partition with no order rows (asof_date NULL,
    # n_prior 0 — exactly the LEFT JOIN's unmatched row), and a NULL-ts
    # event sorts before every order (nulls first ascending).
    ords = o.filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_evt"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_evt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ords.unionByName(ev)
        .withColumn(
            "asof_date",
            F.max(F.when(F.col("is_evt") == 0, F.col("t")))
            .over(w)
            .cast("date"),
        )
        .withColumn("n_prior", F.sum((F.col("is_evt") == 0).cast("long")).over(w))
        .filter(F.col("is_evt") == 1)
        .select("event_id", "asof_date", "n_prior")
    )


@query(
    "c12_subquery_scalar",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
    """,
)
def c12_subquery_scalar(spark, sf_dir) -> DataFrame:
    """Correlated scalar subquery: orders 50% above their customer's
    average.  Catalyst decorrelates this into an aggregate + join
    (RewriteCorrelatedScalarSubquery, SURVEY §4) — at scale it is one
    shuffle on the correlation key, not a per-row probe."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("c12_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM c12_orders o
        WHERE o.o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5
                                FROM c12_orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "c13_join_null_safe",
    oracle="""
    SELECT c.k AS nat_key, COUNT(*) AS n_pairs
    FROM (SELECT NULLIF(c_nationkey, 3) AS k FROM customer) c
    JOIN (SELECT NULLIF(s_nationkey, 3) AS k FROM supplier) s
      ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
)
def c13_join_null_safe(spark, sf_dir) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — still a hash join on
    the key (NULL hashes to one bucket), so the plan is identical to
    c1's; a heavily-NULL key is a skew key and AQE splits it."""
    c = load(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("ck")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("sk")
    )
    return (
        c.join(s, F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(F.col("ck").alias("nat_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "c14_join_shuffle_hash_hint",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
)
def c14_join_shuffle_hash_hint(spark, sf_dir) -> DataFrame:
    """Explicit physical-strategy control: the SHUFFLE_HASH hint forces
    a shuffled hash join (build a hash table per partition) instead of
    sort-merge — the right call when one side is far smaller than the
    other but too big to broadcast: it skips both sort passes.  Same
    rows as an unhinted join; the plan shape is guarded in
    tests/test_plans.py."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@query(
    "c15_subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_totalprice < 5000)
    """,
)
def c15_subquery_exists(spark, sf_dir) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS: customers with a big order and no
    tiny one.  Catalyst decorrelates (RewritePredicateSubquery) into a
    LEFT SEMI + LEFT ANTI join pair — at scale that is two hash joins on
    the correlation key with the order-side predicates pushed into the
    scans, never a per-row re-execution of the subqueries."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    c.createOrReplaceTempView("c15_customer")
    o.createOrReplaceTempView("c15_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM c15_customer c
        WHERE EXISTS (SELECT 1 FROM c15_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
          AND NOT EXISTS (SELECT 1 FROM c15_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_totalprice < 5000)
        """
    )


@query(
    "c16_join_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name, s.s_acctbal
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def c16_join_salted(spark, sf_dir) -> DataFrame:
    """Hand-salted skew join: the fact side tags each row with a
    deterministic salt in [0, S) and the dimension side is replicated S
    times (explode over a salt sequence), so one hot supplier key fans
    out across S reducers instead of pinning one.  The OUTPUT is
    oracle-identical to the plain equi-join — salting is a purely
    physical rewrite.

    100 TB role: this is the manual fallback when AQE's skew-join split
    can't help — AQE splits oversized SORT-MERGE partitions after the
    map stage, but a single key that alone exceeds executor memory (a
    null-bucket, a bot user_id, an empty-string join key) still lands
    in one task; pre-salting spreads even a single-key partition.  Cost
    model: S× replication of the dim side vs S× parallelism on the hot
    key — S stays single-digit.  Salt must be DETERMINISTIC from row
    identity (here xxhash64 of the fact PK), never rand(): retries and
    speculative tasks must re-derive the same salt or the join drops
    rows."""
    s_count = 8
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(s_count)),
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(s_count - 1)))
        )
        .withColumn("salt", F.col("salt").cast("long"))
    )
    return li.join(
        sup,
        (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt),
    ).select("l_orderkey", "l_linenumber", "s_name", "s_acctbal")


def _bucketed_pair(spark, sf_dir):
    """Build-once-per-(session, sf) bucketed copies of orders and
    lineitem, both bucketBy(8, orderkey) + sortBy, stored as external
    tables under a session tmpdir (removed at interpreter exit).
    Spark's bucketed scan reports the bucket spec as the output
    partitioning, which is what lets the join skip its exchanges."""
    import atexit
    import os
    import re
    import shutil
    import tempfile

    # table names carry the applicationId (like the data-path key) so a
    # new session under a persistent metastore (spark-warehouse/) can
    # never see a stale catalog entry whose backing tmpdir was rmtree'd
    # by the previous session's atexit — it just rebuilds under its own
    # names.
    app = re.sub(r"[^a-z0-9]", "_", spark.sparkContext.applicationId.lower())
    tag = re.sub(r"[^a-z0-9]", "_", os.path.basename(sf_dir.rstrip("/")))
    t_orders = f"c17_orders_{tag}_{app}"
    t_lineitem = f"c17_lineitem_{tag}_{app}"
    if not spark.catalog.tableExists(t_lineitem):
        base = os.path.join(
            tempfile.gettempdir(),
            f"bdt_bucketed_{spark.sparkContext.applicationId}_{tag}",
        )
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, "orders"))
            .mode("overwrite")
            .saveAsTable(t_orders)
        )
        (
            load(spark, sf_dir, "lineitem")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, "lineitem"))
            .mode("overwrite")
            .saveAsTable(t_lineitem)
        )
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return spark.table(t_orders), spark.table(t_lineitem)


@query(
    "c17_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_totalprice, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def c17_join_bucketed(spark, sf_dir) -> DataFrame:
    """CO-LOCATED join via bucketing: both sides persisted
    bucketBy(8, orderkey), so the sort-merge join consumes the bucket
    layout directly — ZERO exchanges in the plan (guarded in
    tests/test_plans.py).  The merge hint pins SMJ so the demo can't
    degenerate into a broadcast at test scale.

    100 TB role: THE amortization play for fact-to-fact joins — pay
    one bucketed write per table, then every subsequent orders⋈lineitem
    (same key, bucket counts equal or integer-multiple) runs
    shuffle-free forever.  Bucket count is chosen for target-cluster
    parallelism (thousands, not 8); sortBy makes single-file buckets
    merge without re-sorting.  Same build-once/serve-many economics as
    j21's IVF store, applied to relational co-location."""
    o, li = _bucketed_pair(spark, sf_dir)
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .select("o_orderkey", "l_linenumber", "o_totalprice", "l_quantity")
    )


def _dpp_store(spark, sf_dir) -> str:
    """Build-once-per-(session, sf) customer store partitioned by
    c_nationkey — the layout that makes nation-keyed joins prunable."""
    import atexit
    import os
    import re
    import shutil
    import tempfile

    tag = re.sub(r"[^a-z0-9]", "_", os.path.basename(sf_dir.rstrip("/")))
    base = os.path.join(
        tempfile.gettempdir(),
        f"bdt_dpp_{spark.sparkContext.applicationId}_{tag}",
    )
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        load(spark, sf_dir, "customer").write.mode("overwrite").partitionBy(
            "c_nationkey"
        ).parquet(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


@query(
    "c18_join_dpp",
    oracle="""
    SELECT c_custkey, c_acctbal, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 2
    """,
)
def c18_join_dpp(spark, sf_dir) -> DataFrame:
    """DYNAMIC partition pruning: the fact side is partitioned on the
    join key (customer by c_nationkey), the dim filter (one region)
    is only known through the join — so Catalyst broadcasts the
    filtered dim's keys as a runtime subquery and the fact scan
    prunes to matching PARTITION DIRECTORIES before reading a byte
    (plan-guarded: dynamicpruningexpression in PartitionFilters).

    100 TB role: static pushdown (a3/f9) needs the predicate ON the
    scanned table; DPP covers the star-schema reality where
    selectivity lives in the dim — date-dim month filters pruning a
    date-partitioned fact are THE canonical case.  Scan cost drops
    from full-fact to matching-partitions with zero query rewrite;
    it composes with AQE and survives arbitrary dim predicates.
    Build-once store, j21 economics."""
    cust = spark.read.parquet(_dpp_store(spark, sf_dir))
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return cust.join(nat, cust.c_nationkey == nat.n_nationkey).select(
        "c_custkey", "c_acctbal", "n_name"
    )


@query(
    "c19_asof_forward",
    oracle="""
    SELECT c.event_id,
           MIN(epoch_ns(p.ts)) // 1000000000 AS next_purchase_s,
           COUNT(p.event_id) AS n_later
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id AND p.ts > c.ts
    GROUP BY c.event_id
    """,
)
def c19_asof_forward(spark, sf_dir) -> DataFrame:
    """FORWARD as-of join (c11's mirror): for each CLICK, the earliest
    PURCHASE of the same user strictly after it, plus how many later
    purchases exist — per-event next-touch attribution ("which
    purchase did this click lead to").  c11's backward form answers
    last-touch; k5's funnel answers the per-USER first-conversion
    question; this is the per-EVENT version.  Same equi-join +
    per-row extremal aggregate formulation as the oracle, exact
    integer-ns comparisons throughout.

    100 TB shape identical to c11: both filtered streams shuffle once
    on the user key, the time residual filters inside the join, and
    the per-click MIN partial-aggregates — never a window over the
    union of both streams (which would shuffle everything together)."""
    e = load(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("cts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    joined = c.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pts") > F.col("cts")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.expr("MIN(pts) DIV 1000000000").alias("next_purchase_s"),
        F.count("p_id").alias("n_later"),
    )


@query(
    "c20_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
)
def c20_lateral_topk(spark, sf_dir) -> DataFrame:
    """LATERAL correlated subquery join — each customer's two most
    expensive orders, written the way SQL users actually write per-row
    top-k (a correlated FROM-clause subquery with ORDER BY + LIMIT),
    exercising Spark's lateral-join decorrelation rather than the
    hand-rolled window formulation (e7 is the window twin; both must
    agree — asserted in pytest).

    Catalyst rewrites the lateral subquery into a window-style ranked
    join: ONE shuffle on the correlation key, never a per-customer
    re-execution of the inner query — the plan is guarded against
    cartesian/nested-loop fallback.  At 100 TB the inner ORDER BY
    LIMIT is per-key (bounded heap), not a global sort."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("c20_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("c20_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM c20_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM c20_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@query(
    "c21_existence_flag",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(c_custkey IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice > 300000) AS INT)
               AS has_big_order
    FROM customer
    """,
)
def c21_existence_flag(spark, sf_dir) -> DataFrame:
    """Existence as a PROJECTED column, not a filter: every customer
    with a flag for whether they placed a >300k order.  Semi/anti
    joins (c5/c6) can only keep or drop rows; when the predicate's
    result must survive into the output, Spark plans its third,
    less-known sibling — ExistenceJoin — which augments each left row
    with the match bit in ONE pass instead of scanning the fact table
    twice (the LEFT JOIN + DISTINCT + IS NOT NULL workaround).

    One shuffle each side on the key (or broadcast of the filtered
    order keys — fixture-sized here); the build side is pre-filtered
    by the pushed o_totalprice predicate before it ever reaches the
    join.  Plan-guarded: the physical plan must contain an
    ExistenceJoin, never two scans of orders."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("c21_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("c21_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               CAST(c_custkey IN (SELECT o_custkey FROM c21_orders
                                  WHERE o_totalprice > 300000) AS INT)
                   AS has_big_order
        FROM c21_customer
        """
    )


@query(
    "c22_snapshot_diff",
    oracle="""
    WITH snap_old AS (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    snap_new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0
                    THEN o_totalprice * 1.1 ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
                WHEN b.o_orderkey IS NULL THEN 'deleted'
                ELSE 'updated' END AS change,
           FLOOR(a.o_totalprice * 10000) / 10000 AS old_price,
           FLOOR(b.o_totalprice * 10000) / 10000 AS new_price
    FROM snap_old a FULL OUTER JOIN snap_new b
      ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
    """,
)
def c22_snapshot_diff(spark, sf_dir) -> DataFrame:
    """Snapshot CDC diff: given yesterday's and today's snapshot of a
    keyed table, emit the change set — inserted / deleted / updated
    rows, unchanged rows dropped.  The two snapshots here are derived
    deterministically from the orders fixture (modulus membership for
    inserts/deletes, a *1.1 repricing for updates), so the diff is
    fully oracle-checkable; in production they are two table versions.

    100 TB shape: ONE full-outer sort-merge join keyed on the pk —
    each snapshot shuffles once, and when both snapshots are bucketed
    by pk (the natural layout for versioned tables, c17's machinery)
    the exchange disappears entirely and the diff is a zero-shuffle
    zip of co-located buckets.  Classification and the unchanged-row
    filter are map-side expressions after the join; output is
    change-bounded, not table-bounded.  The float update comparison is
    safe cross-engine because both engines compute the identical IEEE
    double for price*1.1."""
    o = load(spark, sf_dir, "orders")
    snap_old = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k_old"),
        F.col("o_totalprice").alias("p_old"),
    )
    snap_new = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p_new"),
    )
    d = snap_old.join(
        snap_new, snap_old.k_old == snap_new.k_new, "full_outer"
    )
    return d.filter(
        F.col("k_old").isNull()
        | F.col("k_new").isNull()
        | (F.col("p_old") != F.col("p_new"))
    ).select(
        F.coalesce("k_old", "k_new").alias("o_orderkey"),
        F.when(F.col("k_old").isNull(), "inserted")
        .when(F.col("k_new").isNull(), "deleted")
        .otherwise("updated")
        .alias("change"),
        (F.floor(F.col("p_old") * 10000) / 10000).alias("old_price"),
        (F.floor(F.col("p_new") * 10000) / 10000).alias("new_price"),
    )


@query(
    "c23_temporal_join",
    oracle="""
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
               MIN(tns) AS from_tns
        FROM ev GROUP BY user_id, event_type, grp
    ),
    ver AS (
        SELECT user_id, state, seq, from_tns,
               lead(from_tns) OVER (PARTITION BY user_id ORDER BY seq)
                   AS to_tns
        FROM island
    ),
    p AS (
        SELECT event_id, user_id, epoch_ns(ts) AS tns
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT p.event_id, p.user_id, p.tns,
               v.state, v.from_tns, v.to_tns,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY v.seq DESC) AS rk
        FROM p JOIN ver v
          ON v.user_id = p.user_id AND v.from_tns <= p.tns
    )
    SELECT event_id, user_id,
           tns // 1000000000 AS ts_s,
           state,
           from_tns // 1000000000 AS valid_from_s
    FROM m
    WHERE rk = 1 AND (to_tns IS NULL OR tns < to_tns)
    """,
)
def c23_temporal_join(spark, sf_dir) -> DataFrame:
    """Point-in-time (temporal) join: each purchase event joined to the
    SCD Type-2 dimension version (k14's ns-precision island chain over
    the same log) that was VALID at the purchase's timestamp — the
    canonical warehouse question "which state was this user in when
    they bought".  Match = the latest version with valid_from <= ts
    (seq-desc tiebreak pins duplicate-timestamp version bursts, the
    hypothesis-found k14 hazard) that the [from, to) interval actually
    contains.

    100 TB shape: an equi-join on user_id — both sides shuffle ONCE on
    the same key the dimension build itself used, so with the SCD table
    persisted bucketed-by-user the fact side is the only exchange; the
    interval predicate filters per-user pairs (version-count × events
    per user, never a time-range cross product), and the rk=1 window
    rides the join's partitioning.  This is c11's as-of pattern pointed
    at a versioned dimension instead of a raw event stream."""
    from ..streaming.events import scd2_islands

    e = load(spark, sf_dir, "events")
    ver = scd2_islands(e).select(
        "user_id", "state", "seq", "from_tns", "to_tns"
    )
    # c11's union/running-window formulation instead of the range join:
    # the old theta-join (user match AND from_tns <= ts) REPLICATED each
    # purchase once per satisfying version and then shuffled that
    # multiplied stream a second time on event_id for the rk=1 window.
    # Tag versions (at t = from_tns) and purchases (at t = ts), union,
    # ONE shuffle on user_id, and last(version, ignorenulls) over the
    # ascending (t, is_evt, seq) order hands every purchase its valid
    # version: rows shuffled = |purchases| + |versions|, never the
    # pair-multiplied stream.  Equivalence with the oracle's
    # rk=1-by-seq-desc: within a user, from_tns is non-decreasing in
    # seq (islands are numbered by the sequential position of their
    # first event, which the ts-ascending row_number orders), so the
    # carried last version in (t, is_evt, seq) order IS the max-seq
    # version with from_tns <= ts; versions sort before purchases at
    # equal t (is_evt 0 < 1), matching the inclusive from_tns <= ts;
    # the [from, to) containment check applies after, exactly as the
    # oracle applies it after rk=1.  NULL hygiene: the oracle's
    # equi-join never matches a NULL user_id, but a window PARTITION BY
    # groups NULLs — both sides therefore drop NULL-user rows up front;
    # a purchase with no prior version carries NULL and is dropped,
    # matching the inner join's unmatched-row behavior.
    vstruct = F.struct("state", "from_tns", "to_tns")
    vrows = ver.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.col("from_tns").alias("t"),
        F.lit(0).alias("is_evt"),
        "seq",
        vstruct.alias("v"),
        F.lit(None).cast("long").alias("event_id"),
    )
    prows = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(1).alias("is_evt"),
            F.lit(None).cast("long").alias("seq"),
            F.lit(None).cast(
                "struct<state:string,from_tns:bigint,to_tns:bigint>"
            ).alias("v"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_evt", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = vrows.unionByName(prows).withColumn(
        "cv", F.last("v", ignorenulls=True).over(w)
    )
    return (
        carried.filter(
            (F.col("is_evt") == 1)
            & F.col("cv").isNotNull()
            & (
                F.col("cv.to_tns").isNull()
                | (F.col("t") < F.col("cv.to_tns"))
            )
        )
        .select(
            "event_id",
            "user_id",
            F.expr("t DIV 1000000000").alias("ts_s"),
            F.col("cv.state").alias("state"),
            F.expr("cv.from_tns DIV 1000000000").alias("valid_from_s"),
        )
    )


@query(
    "c24_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk(custkey, cur, depth, path_bal) AS (
        SELECT c_custkey, c_custkey, 0, c_acctbal FROM customer
        UNION ALL
        SELECT w.custkey, w.cur // 2, w.depth + 1, w.path_bal + c.c_acctbal
        FROM walk w JOIN customer c ON c.c_custkey = w.cur // 2
        WHERE w.cur > 1
    )
    SELECT custkey AS c_custkey, depth AS depth_to_root,
           FLOOR(path_bal * 100) / 100 AS path_bal
    FROM walk WHERE cur <= 1
    """,
)
def c24_recursive_hierarchy(spark, sf_dir) -> DataFrame:
    """Hierarchy traversal via WITH RECURSIVE (Spark 4's recursive CTE
    — the declarative sibling of j20's hand-rolled driver loop): every
    customer walks its ancestor chain (parent = custkey DIV 2, a
    deterministic binary forest over the fixture keys) accumulating
    depth-to-root and the account-balance sum along the path.  The
    float path sum is engine-exact because BOTH engines add the same
    balances in the same leaf-to-root order — recursion fixes the
    association that a parallel SUM would leave undefined.

    100 TB shape: each recursion step is one equi-join of the frontier
    against the (bucketed) edge table — rows in flight shrink as walks
    terminate, and total work is O(edges × depth) like j20's rounds.
    Recursive CTEs hand the loop to the engine (checkpointing,
    re-planning per step) but the shuffle physics is identical to the
    explicit iteration; prefer j20's pointer doubling when depth is
    data-dependent and large, the CTE when depth is small and the
    query must stay declarative (org charts, category trees, BOM
    explosions).

    At scale the recursion's build side — re-read once PER STEP,
    ~log2 N steps — is the canonical loop-invariant input an engine
    pins in cluster cache (`CACHE TABLE` / storage-level persist)
    rather than re-scanning from storage each round; locally the OS
    page cache already serves the single-file scan, so no explicit pin
    is taken (a checkpoint copy measured inside run noise)."""
    # Spark 4's recursive-CTE valve defaults to 1M CUMULATIVE rows — a
    # toy ceiling this healthy walk crossed at the sf1 rehearsal (every
    # customer emits one row per ancestor level, ~N·log2 N total while
    # the frontier itself shrinks; level limit untouched).  Raise it
    # HERE, not engine-wide (session.py keeps the conservative
    # default): the conf is session-scoped so it persists once this
    # builder runs, but it is only ever raised when a recursive query
    # is actually in play, and the level limit of 100 (untouched)
    # remains the cycle guard.  Runaway-cost bound at 100M: worst case
    # one extra ~0.1 TB spill-backed materialization before refusal,
    # vs. silently refusing legitimate ≥1M-row hierarchies at scale.
    spark.conf.set("spark.sql.cteRecursionRowLimit", "100000000")
    load(spark, sf_dir, "customer").createOrReplaceTempView("c24_customer")
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, cur, depth, path_bal) AS (
            SELECT c_custkey, c_custkey, 0, c_acctbal FROM c24_customer
            UNION ALL
            SELECT w.custkey, w.cur DIV 2, w.depth + 1,
                   w.path_bal + c.c_acctbal
            FROM walk w JOIN c24_customer c ON c.c_custkey = w.cur DIV 2
            WHERE w.cur > 1
        )
        SELECT custkey AS c_custkey, depth AS depth_to_root,
               FLOOR(path_bal * 100) / 100 AS path_bal
        FROM walk WHERE cur <= 1
        """
    )


@query(
    "c25_fuzzy_join",
    oracle="""
    WITH probe AS MATERIALIZED (
        SELECT p_partkey AS probe_key,
               substr(p_name, 1, length(p_name) - 1) AS q
        FROM part
        WHERE substr(md5(CAST(p_partkey AS VARCHAR)), 1, 1) IN ('0', '1')
    ),
    -- the theta-join is stated over DISTINCT strings and joined back
    -- by string equality: levenshtein depends only on the string
    -- VALUES, so this is the identical result set row-for-row, while
    -- the distinct-q x distinct-name cross product stays completely
    -- UNBLOCKED (every pair evaluated — the naive semantics this
    -- oracle exists to state).  Without the identity the oracle is
    -- |probe| x |part| levenshteins (5 billion at sf1) instead of
    -- |distinct q| x |distinct names|.
    dm AS MATERIALIZED (
        SELECT dq.q, dn.p_name, levenshtein(dq.q, dn.p_name) AS dist
        FROM (SELECT DISTINCT q FROM probe) dq
        JOIN (SELECT DISTINCT p_name FROM part) dn
          ON levenshtein(dq.q, dn.p_name) <= 2
    )
    SELECT probe.probe_key, p.p_partkey AS match_key, dm.dist
    FROM probe
    JOIN dm ON dm.q = probe.q
    JOIN part p ON p.p_name = dm.p_name
    ORDER BY probe_key, match_key
    """,
)
def c25_fuzzy_join(spark, sf_dir) -> DataFrame:
    """Fuzzy (similarity) join via q-GRAM PREFIX FILTERING: match
    misspelled part names (a deterministic md5-chosen probe subset
    with the last character dropped) back to the catalog at edit
    distance <= 2.  The oracle states the naive semantics — probe ×
    catalog with a levenshtein predicate; executing THAT is the
    quadratic trap (and the first cut of this key, a 4-char-prefix
    block, measurably LOST distance-2 matches on this corpus — e.g.
    'cold bol' ~ 'old bolt').  The sound construction (Gravano et al.
    q-gram joins + prefix filtering): k edits destroy at most q·k = 2k
    bigram types, so two strings within distance k=2 share a bigram
    among the first q·k+1 = 5 of EACH side's distinct bigrams under
    any one fixed global gram order (md5 order here — deterministic
    with no frequency pass).  Index those 5 grams per string, hash-join
    on the gram, dedup candidate pairs, THEN evaluate levenshtein.
    Parity with the unblocked oracle proves zero lost matches.

    PRECONDITION (ADVICE r6): the prefix theorem requires >= 5 distinct
    bigrams on EACH side; below that a distance-<=2 pair can share no
    indexed gram at all (a length-<=2 string has <=1 bigram).  Strings
    under the threshold — on either side — therefore bypass the gram
    index and verify exhaustively against the other side's distinct
    strings under a |length diff| <= 2 band (sound: 2 edits change
    length by <= 2), expressed as a length-bucket equi-join so the
    plan stays all-hash-join.  Both short sets are vocabulary-bounded
    and empty on TPC-H p_name lengths.

    Resolution runs over DISTINCT STRINGS, not rows: names repeat
    heavily (64 distinct among 20k parts at sf0.1), so the gram join
    matches q-strings to name-strings first and the matched pairs —
    a vocabulary²-bounded table at worst, ~2 matches per probe here —
    broadcast back onto the keyed rows.  Measured 35.7 s → sub-second
    at sf0.1: entity resolution without the dedup step re-verifies
    every duplicate row pair (row²/vocab² times the needed work).

    100 TB shape: candidates = sum over grams of
    |probe_strings_g|×|catalog_strings_g| — string-vocabulary-bounded,
    never row-bounded; the probe side is query-sized and BROADCAST so
    neither the catalog strings nor the keyed back-joins shuffle
    (plan-guarded: BHJ only, no nested-loop/cartesian).  levenshtein
    runs once per candidate STRING pair.  Production drop-in
    improvements, same plan: rank grams by GLOBAL FREQUENCY
    (rarest-first prefixes shrink hot blocks), add a length-band
    conjunct, count-filter before verifying."""
    grams = (
        "transform(slice(array_sort(transform("
        "array_distinct(transform(sequence(1, length({s}) - 1),"
        " i -> substring({s}, i, 2))),"
        " g -> struct(md5(g) AS h, g AS g))), 1, 5), x -> x.g)"
    )
    part = load(spark, sf_dir, "part")
    probe = part.filter(
        F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 1).isin("0", "1")
    ).select(
        F.col("p_partkey").alias("probe_key"),
        F.expr("substr(p_name, 1, length(p_name) - 1)").alias("q"),
    )
    q_strings = probe.select("q").distinct()
    name_strings = part.select("p_name").distinct()
    # The 5-gram prefix theorem needs ≥ 2k+1 = 5 DISTINCT bigrams on
    # each side (ADVICE r6: below that, a distance-≤2 pair can share
    # none of the indexed grams — e.g. a length-≤2 probe has ≤1 bigram).
    # Short strings therefore take an explicit exhaustive path: verify
    # them against the WHOLE other side's distinct strings under a
    # |length|≤2 band.  Both short sets are vocabulary-bounded (and
    # empty on TPC-H p_name lengths), the probe side is query-sized,
    # so the exhaustive block stays broadcast-sized at any corpus size.
    n_bigrams = (
        "size(array_distinct(transform(sequence(1, greatest(length({s}) - 1, 1)),"
        " i -> substring({s}, i, 2))))"
    )
    q_long = q_strings.filter(F.expr(n_bigrams.format(s="q")) >= 5)
    q_short = q_strings.filter(F.expr(n_bigrams.format(s="q")) < 5)
    name_long = name_strings.filter(F.expr(n_bigrams.format(s="p_name")) >= 5)
    name_short = name_strings.filter(F.expr(n_bigrams.format(s="p_name")) < 5)
    probe_g = q_long.select(
        "q", F.explode(F.expr(grams.format(s="q"))).alias("gram")
    )
    cat_g = name_long.select(
        "p_name", F.explode(F.expr(grams.format(s="p_name"))).alias("gram")
    )
    # the length band is expressed as an EQUI-join on an exploded
    # length-bucket key (len±2), not a theta predicate — keeps every
    # join in the plan a hash join (the c25 plan guard forbids
    # BroadcastNestedLoopJoin even on empty branches)
    q_short_exp = q_short.select(
        "q",
        F.explode(
            F.sequence(F.length("q") - 2, F.length("q") + 2)
        ).alias("ln"),
    )
    name_short_exp = name_short.select(
        "p_name",
        F.explode(
            F.sequence(F.length("p_name") - 2, F.length("p_name") + 2)
        ).alias("ln"),
    )
    candidates = (
        cat_g.join(F.broadcast(probe_g), "gram")
        .select("q", "p_name")
        .unionByName(
            name_strings.withColumn("ln", F.length("p_name"))
            .join(F.broadcast(q_short_exp), "ln")
            .select("q", "p_name")
        )
        .unionByName(
            q_strings.withColumn("ln", F.length("q"))
            .join(F.broadcast(name_short_exp), "ln")
            .select("q", "p_name")
        )
        .distinct()
    )
    matched = (
        candidates
        .withColumn("dist", F.levenshtein(F.col("q"), F.col("p_name")))
        .filter(F.col("dist") <= 2)
    )
    return (
        part.join(F.broadcast(matched), "p_name")
        .join(F.broadcast(probe), "q")
        .select("probe_key", F.col("p_partkey").alias("match_key"), "dist")
        .orderBy("probe_key", "match_key")
    )


@query(
    "c26_cdc_apply",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS price
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    changelog AS (
        SELECT 'U' AS op, 1 AS seq, o_orderkey AS k,
               o_totalprice * 1.05 AS price
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT 'D', 2, o_orderkey, NULL
        FROM orders WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT 'I', 3, o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    compacted AS (
        SELECT k, op, price
        FROM changelog
        QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) = 1
    )
    SELECT COALESCE(b.k, c.k) AS o_orderkey,
           FLOOR(CASE WHEN c.op = 'U' AND b.k IS NOT NULL THEN c.price
                      WHEN c.op = 'I' AND b.k IS NULL THEN c.price
                      ELSE b.price END * 10000) / 10000 AS price,
           CASE WHEN c.op IS NULL THEN 'base'
                WHEN c.op = 'U' AND b.k IS NOT NULL THEN 'updated'
                WHEN c.op = 'I' AND b.k IS NULL THEN 'inserted'
                ELSE 'base' END AS src
    FROM base b FULL OUTER JOIN compacted c ON b.k = c.k
    -- COALESCE(...FALSE) everywhere op can be NULL (untouched base
    -- rows): a bare op = 'D' is NULL there and three-valued WHERE
    -- would silently drop the whole base (caught by the Python-merge
    -- property test — parity alone missed it because both engines
    -- dropped identically)
    WHERE NOT (COALESCE(c.op = 'D', FALSE) AND b.k IS NOT NULL)
      AND NOT (b.k IS NULL AND COALESCE(c.op IN ('U', 'D'), FALSE))
    """,
)
def c26_cdc_apply(spark, sf_dir) -> DataFrame:
    """CDC APPLY (the lakehouse MERGE): land a changelog of
    insert/update/delete operations onto a keyed base snapshot —
    c22 derives the change set, this key consumes one.  The changelog
    is derived deterministically (updates on %7 keys at seq 1, deletes
    on %11 at seq 2, inserts of the %97 keys the base excludes at
    seq 3), which exercises the two behaviors that make MERGE more
    than a join: COMPACTION — a key hit by several ops (e.g. %77:
    update then delete) takes only its LAST op by sequence (k11's
    last-state pattern) — and strictness — U on an absent key and D on
    an absent key are no-ops, I lands only where the base has no row.

    100 TB shape: compaction is one changelog-sized shuffle (changelogs
    are deltas, orders of magnitude under the base), then ONE full-outer
    pk join against the base — with the base bucketed by pk (the
    versioned-table layout, c17) the base side never re-shuffles and
    the apply is a per-bucket zip; Delta/Iceberg MERGE physics exactly.
    Output is base-sized; every verdict is a map-side CASE after the
    join."""
    o = load(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("bk"), F.col("o_totalprice").alias("bprice")
    )
    changelog = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") * 1.05).alias("price"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                F.lit("D"), F.lit(2), F.col("o_orderkey"),
                F.lit(None).cast("double"),
            )
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                F.lit("I"), F.lit(3), F.col("o_orderkey"),
                F.col("o_totalprice"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    compacted = (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "op", "price")
    )
    m = base.join(compacted, base.bk == compacted.k, "full_outer")
    # null-safe verdicts: op is NULL on every untouched base row, and
    # (NULL = 'D') AND ... under three-valued logic is NULL, which a
    # filter drops — eqNullSafe/coalesce pin those rows to KEEP (the
    # Python-merge property test caught this; oracle parity alone
    # could not, both engines being identically wrong)
    applied = m.filter(
        ~(F.col("op").eqNullSafe("D") & F.col("bk").isNotNull())
        & ~(
            F.col("bk").isNull()
            & F.coalesce(F.col("op").isin("U", "D"), F.lit(False))
        )
    )
    price = (
        F.when(
            (F.col("op") == "U") & F.col("bk").isNotNull(), F.col("price")
        )
        .when((F.col("op") == "I") & F.col("bk").isNull(), F.col("price"))
        .otherwise(F.col("bprice"))
    )
    src = (
        F.when(F.col("op").isNull(), "base")
        .when((F.col("op") == "U") & F.col("bk").isNotNull(), "updated")
        .when((F.col("op") == "I") & F.col("bk").isNull(), "inserted")
        .otherwise("base")
    )
    return applied.select(
        F.coalesce("bk", "k").alias("o_orderkey"),
        (F.floor(price * 10000) / 10000).alias("price"),
        src.alias("src"),
    )


@query(
    "c27_interval_overlap",
    oracle="""
    WITH act AS (
        SELECT user_id,
               epoch(date_trunc('day', ts))::BIGINT // 86400 AS d,
               CAST(MIN(epoch_ns(ts)) // 1000000000 AS BIGINT) AS a_s,
               CAST(MAX(epoch_ns(ts)) // 1000000000 AS BIGINT) AS a_e
        FROM events
        GROUP BY user_id, date_trunc('day', ts)
    ),
    span AS (
        SELECT CAST(MIN(epoch_ns(ts)) // 1000000000 // 3600 AS BIGINT) AS h0,
               CAST(MAX(epoch_ns(ts)) // 1000000000 // 3600 AS BIGINT) AS h1
        FROM events
    ),
    win AS (
        SELECT (h0 + i) * 3600 AS w_s, (h0 + i) * 3600 + 7200 AS w_e
        FROM span, LATERAL (SELECT unnest(range(0, h1 - h0 + 1)) AS i)
        WHERE (h0 + i) % 37 = 0
    )
    SELECT w_s,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(LEAST(a_e, w_e) - GREATEST(a_s, w_s)) AS BIGINT)
               AS total_overlap_s
    FROM act JOIN win ON a_s < w_e AND w_s < a_e
    GROUP BY w_s
    ORDER BY w_s
    """,
)
def c27_interval_overlap(spark, sf_dir) -> DataFrame:
    """Interval OVERLAP join — the third temporal-join sibling beside
    c8's anchored range pairs and c23's point-in-time lookup: per-user
    daily activity intervals [first event, last event] against
    deterministic 2-hour maintenance windows (every 37th hour of the
    span) — downtime attribution: which windows touched whom, for how
    long.  The oracle states the theta form (a_s < w_e AND w_s < a_e);
    executing THAT against a non-tiny build side is a nested-loop
    product.  The shipped plan is the standard interval-bucketing
    decomposition: explode each interval into the hour buckets it
    covers (bounded: ≤24/day for activity, 2 for windows), EQUI-join
    on the bucket, dedup the (interval, window) pairs a multi-bucket
    overlap finds twice, and post-filter strict overlap > 0 (bucket
    sharing admits boundary-touch pairs the strict predicate must
    drop).  All arithmetic is exact integer seconds.

    100 TB shape: the bucket join is a plain hash join — both sides
    shuffle by bucket key (or the window side broadcasts when small,
    as here); work = Σ per-bucket products, bounded by interval
    length / bucket width, never |A|×|B|.  Bucket width tunes the
    replication-vs-selectivity trade exactly like j8's bands.
    Plan-guarded: no BroadcastNestedLoopJoin, no cartesian."""
    e = load(spark, sf_dir, "events")
    act = (
        e.select(
            "user_id",
            F.unix_timestamp(F.date_trunc("day", "ts2")).alias("day_s"),
            F.expr("ts DIV 1000000000").alias("s"),
        )
        .groupBy("user_id", "day_s")
        .agg(F.min("s").alias("a_s"), F.max("s").alias("a_e"))
    )
    span = e.agg(
        F.expr("MIN(ts) DIV 1000000000 DIV 3600").alias("h0"),
        F.expr("MAX(ts) DIV 1000000000 DIV 3600").alias("h1"),
    )
    win = (
        span.select(
            F.explode(F.sequence("h0", "h1")).alias("h")
        )
        .filter(F.col("h") % 37 == 0)
        .select(
            (F.col("h") * 3600).alias("w_s"),
            (F.col("h") * 3600 + 7200).alias("w_e"),
            F.col("h").alias("wh"),
        )
    )
    # bucket expansion: activity intervals cover [a_s//3600 .. a_e//3600];
    # windows cover exactly (wh, wh+1)
    act_b = act.select(
        "user_id", "day_s", "a_s", "a_e",
        F.explode(
            F.sequence(F.expr("a_s DIV 3600"), F.expr("a_e DIV 3600"))
        ).alias("bh"),
    )
    win_b = win.select(
        "w_s", "w_e", F.explode(F.array(F.col("wh"), F.col("wh") + 1)).alias("bh")
    )
    pairs = (
        act_b.join(F.broadcast(win_b), "bh")
        .select("user_id", "day_s", "a_s", "a_e", "w_s", "w_e")
        .distinct()
    )
    overlap = F.least("a_e", "w_e") - F.greatest("a_s", "w_s")
    return (
        pairs.filter((F.col("a_s") < F.col("w_e")) & (F.col("w_s") < F.col("a_e")))
        .groupBy("w_s")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.sum(overlap).alias("total_overlap_s"),
        )
        .orderBy("w_s")
    )


@query(
    "c29_asof_nearest",
    oracle="""
    WITH c AS (SELECT event_id, user_id, epoch_ns(ts) AS tns
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns
          FROM events WHERE event_type = 'purchase'),
    pairs AS (
        SELECT c.event_id, p.event_id AS p_id,
               ABS(p.tns - c.tns) AS dist
        FROM c JOIN p ON p.user_id = c.user_id
    )
    SELECT event_id,
           FIRST(p_id ORDER BY dist, p_id) AS nearest_purchase,
           MIN(dist) // 1000000000 AS dist_s
    FROM pairs
    GROUP BY event_id
    """,
)
def c29_asof_nearest(spark, sf_dir) -> DataFrame:
    """NEAREST as-of join — the third temporal-lookup direction after
    c11 (backward) and c19 (forward): for each click, the purchase of
    the same user closest in time in EITHER direction, with the
    distance in whole seconds.  This is the attribution question when
    causality is unknown ("which transaction belongs to this
    session?") and the sensor-alignment primitive (match each reading
    to the nearest calibration event).

    Tie policy is explicit: equidistant purchases resolve to the
    smaller event_id (the min-by composite), identically in both
    engines — nearest-match joins without a declared tiebreak are a
    classic cross-engine divergence.

    Plan: c8/c11's physics — one equi shuffle on user_id, the
    |clicks×purchases-per-user| pair stream collapsed by a per-click
    min-by aggregate (map-side partials); never a time-range cross
    product.  At scale, bound the pair fan-in with a time-band
    conjunct (|Δt| < horizon — c27's bucket trick) and the exchange
    carries only in-horizon pairs."""
    e = load(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("event_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    dist = F.abs(F.col("p_ts") - F.col("c_ts"))
    return (
        c.join(p, c.user_id == p.p_user)
        .select("event_id", "p_id", dist.alias("dist"))
        .groupBy("event_id")
        .agg(
            F.min_by("p_id", F.struct("dist", "p_id")).alias(
                "nearest_purchase"
            ),
            F.expr("MIN(dist) DIV 1000000000").alias("dist_s"),
        )
    )


# ---------------------------------------------------------------------------
# c30 — as-of join with a staleness tolerance (feature-store PIT join)
# ---------------------------------------------------------------------------

#: max feature age accepted by the point-in-time join (days).
_PIT_TOLERANCE_DAYS = 30


@query(
    "c30_asof_tolerance",
    oracle=f"""
    SELECT e.event_id,
           CAST(CAST(MAX(o.o_orderdate) AS DATE) AS VARCHAR)
               AS feature_date,
           CASE WHEN MAX(o.o_orderdate) IS NOT NULL
                THEN datediff('day', CAST(MAX(o.o_orderdate) AS DATE),
                              CAST(e.ts AS DATE))
           END AS staleness_days,
           COUNT(o.o_orderkey) AS n_in_window
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate <= e.ts
     AND o.o_orderdate >= e.ts - INTERVAL {_PIT_TOLERANCE_DAYS} DAY
    GROUP BY e.event_id, CAST(e.ts AS DATE)
    """,
)
def c30_asof_tolerance(spark, sf_dir) -> DataFrame:
    """Point-in-time feature join WITH a staleness bound — the
    feature-store contract for training-data assembly: each event
    (training example) gets the latest order-derived feature of its
    user as of the event time, but ONLY if that feature is at most
    {_PIT_TOLERANCE_DAYS} days old; an older value comes back NULL
    rather than silently stale.  This is c11's as-of join plus the
    freshness clause every production feature platform adds (serving a
    90-day-old "latest activity" feature into a model is a data bug
    the plain as-of join cannot express).  staleness_days is emitted
    so the feature's age distribution is auditable in the same pass.

    Plan / 100 TB shape: identical join skeleton to c11 — one shuffle
    on the user key, per-event MAX — but the tolerance predicate makes
    the join BOUNDED: each event matches at most a {_PIT_TOLERANCE_DAYS}-day
    slice of its user's history instead of the entire past, so the
    join's output (and the aggregate's input) stops growing with
    history depth.  That bound is precisely what makes PIT joins
    feasible over years of history: partition the feature table by
    date and the tolerance prunes old partitions at plan time.  NULL
    semantics ride the left join (b3 discipline); date arithmetic is
    exact integer days."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    ev = e.select(
        "event_id",
        "user_id",
        F.col("ts2").cast("timestamp_ntz").alias("ets"),
        F.col("ts2").cast("date").alias("edate"),
    )
    joined = ev.join(
        o,
        (o.o_custkey == ev.user_id)
        & (o.o_orderdate <= ev.ets)
        & (
            o.o_orderdate
            >= ev.ets - F.expr(f"INTERVAL {_PIT_TOLERANCE_DAYS} DAY")
        ),
        "left",
    )
    agg = joined.groupBy("event_id", "edate").agg(
        F.max("o_orderdate").cast("date").alias("fdate"),
        F.count("o_orderkey").alias("n_in_window"),
    )
    # the date ships as an ISO string: a nullable datetime64 column
    # arrives from the oracle as pandas NaT while Spark hands back
    # None — strings keep the null representation identical
    return agg.select(
        "event_id",
        F.date_format("fdate", "yyyy-MM-dd").alias("feature_date"),
        F.when(
            F.col("fdate").isNotNull(),
            F.datediff(F.col("edate"), F.col("fdate")),
        ).alias("staleness_days"),
        "n_in_window",
    )
