"""§2.G — set operations (SURVEY.md §2.G).

Scale notes (100 TB): UNION ALL is free (plan concatenation, no
shuffle).  UNION DISTINCT / INTERSECT / EXCEPT each cost one hash
shuffle on the full row — at scale prefer pre-aggregated or
semi/anti-join formulations when only keys matter (see operators.joins
c5/c6 for the join forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from ..sources import load


def _low(df):  # acctbal 0..6000
    return df.filter(F.col("c_acctbal").between(0, 6000)).select(
        "c_custkey", "c_acctbal"
    )


def _high(df):  # acctbal 4000..10000 — overlaps _low on [4000, 6000]
    return df.filter(F.col("c_acctbal").between(4000, 10000)).select(
        "c_custkey", "c_acctbal"
    )


@query(
    "g1_union_all",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal BETWEEN 0 AND 6000
    UNION ALL
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal BETWEEN 4000 AND 10000
    """,
)
def g1_union_all(spark, sf_dir) -> DataFrame:
    """Bag union — overlapping selections appear twice."""
    c = load(spark, sf_dir, "customer")
    return _low(c).unionByName(_high(c))


@query(
    "g2_union_distinct",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal BETWEEN 0 AND 6000
    UNION
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal BETWEEN 4000 AND 10000
    """,
)
def g2_union_distinct(spark, sf_dir) -> DataFrame:
    """Set union — the overlap is deduplicated (one shuffle)."""
    c = load(spark, sf_dir, "customer")
    return _low(c).unionByName(_high(c)).distinct()


@query(
    "g3_intersect",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < 2000
    """,
)
def g3_intersect(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_nationkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") < 2000).select("c_nationkey", "c_mktsegment")
    return a.intersect(b)


@query(
    "g4_except",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem
    EXCEPT ALL
    SELECT s_suppkey AS suppkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def g4_except(spark, sf_dir) -> DataFrame:
    """Multiset difference (EXCEPT ALL) — keeps multiplicities."""
    li = load(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("suppkey"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    return li.exceptAll(s)


@query(
    "g5_intersect_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    """,
)
def g5_intersect_all(spark, sf_dir) -> DataFrame:
    """Multiset intersection (bag semantics — duplicates survive up to
    the min multiplicity per side).  Plans as one aggregate of counts
    per key per side, not a join explosion."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_orderkey")
    b = li.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return a.intersectAll(b)


@query(
    "g6_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    """,
)
def g6_except_all(spark, sf_dir) -> DataFrame:
    """Multiset difference (bag semantics — multiplicities subtract)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select("l_orderkey")
    b = li.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return a.exceptAll(b)


@query(
    "g7_union_byname",
    oracle="""
    SELECT * FROM (
        SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS balance
        FROM customer
        UNION ALL BY NAME
        SELECT s_suppkey AS entity_id, s_name AS name
        FROM supplier
    )
    """,
)
def g7_union_byname(spark, sf_dir) -> DataFrame:
    """Schema-evolution union: customers carry a balance column that
    suppliers lack; unionByName(allowMissingColumns=True) aligns by
    COLUMN NAME and null-fills the gap — positional UNION (g1) would
    silently mis-bind or reject.  This is the append path when a 100 TB
    table's schema grows: old partitions union with new ones by name,
    missing columns read as null, no rewrite of history."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "g8_intersect_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity >= 25
    """,
)
def g8_intersect_all(spark, sf_dir) -> DataFrame:
    """INTERSECT ALL — BAG semantics: each supplier key survives
    min(count_left, count_right) times, unlike g3's set INTERSECT which
    collapses to one.  The bag form is what reconciliation jobs need
    ("how many line-level matches", not "which keys match at all").

    Plan shape (verified via .explain): Spark rewrites INTERSECT ALL
    into a tagged UNION (each side contributes a marker column) → ONE
    counting aggregate keyed by the value (both per-side counts ride
    the same partial/final pair) → `replicaterows(min(c1,c2))` — a
    single shuffle total, no join at all; duplicate-heavy keys
    collapse to one counted row map-side, which is exactly how you'd
    hand-optimize a 100 TB bag intersection."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_quantity") >= 25).select("l_suppkey")
    return a.intersectAll(b)


@query(
    "g9_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity >= 25
    """,
)
def g9_except_all(spark, sf_dir) -> DataFrame:
    """EXCEPT ALL — bag difference: each key survives
    max(0, count_left - count_right) times (g4's set EXCEPT answers
    membership; this answers SURPLUS — e.g. "how many returned lines
    have no matching high-quantity line", the shape of inventory and
    ledger reconciliation).  Same tagged-union + single counting
    aggregate + replicaterows rewrite as g8 — one shuffle, no join —
    exploding the positive count difference instead of the min."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_quantity") >= 25).select("l_suppkey")
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# g10 — schema-evolution union (missing columns null-filled by NAME)
# ---------------------------------------------------------------------------

@query(
    "g10_union_evolve",
    oracle="""
    WITH v1 AS (
        SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
               CAST(NULL AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 2 = 0
    ),
    v2 AS (
        SELECT doc_id, lang, source, n_chars
        FROM documents WHERE doc_id % 2 = 1
    ),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT lang,
           COUNT(*) AS n,
           CAST(COUNT(source) AS BIGINT) AS with_source,
           CAST(COUNT(*) - COUNT(source) AS BIGINT) AS legacy_rows,
           CAST(SUM(n_chars) AS BIGINT) AS chars_known
    FROM u
    GROUP BY lang
    ORDER BY lang
    """,
)
def g10_union_evolve(spark, sf_dir) -> DataFrame:
    """Schema-EVOLUTION union: a legacy extract (v1: no source/n_chars
    columns — the schema before a migration) unioned with the current
    extract (v2: full schema) via ``unionByName(allowMissingColumns=
    True)`` — position-based UNION would misalign or reject, BY-NAME
    union with null back-fill is how multi-vintage datasets actually
    concatenate (a4 reads mixed schemas from ONE parquet source via
    mergeSchema; g10 is the same contract across two FRAMES).  The
    aggregate makes the null-fill auditable: legacy_rows counts
    exactly the v1 side, chars_known sums only where the column
    exists.

    Plan / 100 TB shape: union is a zero-cost plan node (no shuffle —
    both children feed the same downstream aggregate, partial
    map-side); the null back-fill is a literal projection on the
    legacy child.  At scale this is the multi-vintage ingest pattern:
    N children, one aggregate, no schema rewrite of old data."""
    d = load(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source", "n_chars"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("source").alias("with_source"),
            (F.count(F.lit(1)) - F.count("source")).alias("legacy_rows"),
            F.sum("n_chars").alias("chars_known"),
        )
        .orderBy("lang")
    )
