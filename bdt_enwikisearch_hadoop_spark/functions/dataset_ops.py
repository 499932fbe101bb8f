"""Dataset curation operators (j43-j45): the data-quality /
sampling / outlier-handling passes a production training-data pipeline
runs between ingestion and training (mandated by BASELINE.json:6 —
pipeline operators as first-class, scale-designed components).

Scale notes (100 TB):

* ``j43`` constraint validation is ONE fact scan: every row-level
  check is a conditional aggregate that partial-aggregates map-side,
  the pk-uniqueness check is a distinct-count over the same exchange,
  and referential integrity rides a single key join (broadcast when
  the dim fits, bucketed SMJ when it does not).  The output is
  check-count-bounded (rows = number of declared constraints), never
  data-bounded — the Deequ insight: metrics first, verdicts derived.
* ``j44`` weighted sampling without replacement (Efraimidis-Spirakis
  A-ES): each row gets the key ``u^(1/w)`` from a content-hash uniform
  ``u`` — top-k by key IS a w-weighted sample without replacement.
  One map pass + a size-k ``TakeOrderedAndProject``; no per-group
  state, no rejection loop, deterministic across engines and runs
  (md5-derived ``u``, same §2.0 rule-7 discipline as j15/j8).
* ``j45`` winsorization clips a skewed measure at a per-group
  DISCRETE p95 — the quantile is picked by row-number against a
  ceil(0.95·n) rank (exact integer output, no interpolation float to
  drift cross-engine).  Per-group quantile = one sort-shuffle of the
  (group, measure) pairs; the clip itself is a broadcast join of the
  group→threshold table (group-count-bounded) back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.prefix_scan import (
    global_row_number,
    hex_prefix_bucket,
    prefix_agg,
)
from ..registry import query
from ..sources import load, materialized

_SAMPLE_K = 20


@query(
    "j43_dq_constraints",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN l.l_quantity IS NULL THEN 1 ELSE 0 END)
                   AS null_qty,
               SUM(CASE WHEN l.l_discount < 0 OR l.l_discount > 1
                        THEN 1 ELSE 0 END) AS bad_discount,
               SUM(CASE WHEN l.l_extendedprice <= 0 THEN 1 ELSE 0 END)
                   AS bad_price,
               COUNT(*) - COUNT(DISTINCT (l.l_orderkey, l.l_linenumber))
                   AS dup_pk,
               SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                   AS orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT chk AS check, CAST(violations AS BIGINT) AS violations,
           FLOOR((1 - violations * 1.0 / n_rows) * 10000) / 10000
               AS pass_ratio
    FROM (
        SELECT n_rows, 'completeness_quantity' AS chk,
               null_qty AS violations FROM m
        UNION ALL SELECT n_rows, 'range_discount', bad_discount FROM m
        UNION ALL SELECT n_rows, 'positive_price', bad_price FROM m
        UNION ALL SELECT n_rows, 'unique_pk', dup_pk FROM m
        UNION ALL SELECT n_rows, 'ref_integrity_orderkey', orphans FROM m
    )
    """,
)
def j43_dq_constraints(spark, sf_dir) -> DataFrame:
    """Deequ-style data-quality constraint suite, computed as METRICS in
    one pass and unpivoted into one row per declared check:
    completeness (NULL fraction), value ranges, positivity, primary-key
    uniqueness (the fixture genuinely violates it — ~14k duplicate
    (orderkey, linenumber) rows), and referential integrity against the
    orders dim (a left join; orphans are NULL probe hits).

    100 TB shape: all row-level checks are conditional aggregates over
    ONE fact scan with map-side partials; pk-uniqueness shares the same
    single exchange as a distinct-count; the dim join broadcasts (or
    runs bucketed at dim scale).  Output is constraint-count-bounded —
    5 rows regardless of corpus size — so validation adds one pass, not
    one pass per check (the anti-pattern this operator replaces)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").isNull().cast("long")).alias(
                "null_qty"
            ),
            F.sum(
                ((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
                .cast("long")
            ).alias("bad_discount"),
            F.sum((F.col("l_extendedprice") <= 0).cast("long")).alias(
                "bad_price"
            ),
            (
                F.count(F.lit(1))
                - F.count_distinct("l_orderkey", "l_linenumber")
            ).alias("dup_pk"),
            F.sum(F.col("o_orderkey").isNull().cast("long")).alias(
                "orphans"
            ),
        )
    )
    stacked = m.select(
        F.expr(
            "stack(5,"
            " 'completeness_quantity', null_qty,"
            " 'range_discount', bad_discount,"
            " 'positive_price', bad_price,"
            " 'unique_pk', dup_pk,"
            " 'ref_integrity_orderkey', orphans) AS (check, violations)"
        ),
        "n_rows",
    )
    return stacked.select(
        "check",
        "violations",
        (
            F.floor((1 - F.col("violations") / F.col("n_rows")) * 10000)
            / 10000
        ).alias("pass_ratio"),
    )


@query(
    "j44_weighted_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           FLOOR(POW(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         ::BIGINT / 4294967296.0,
                     1.0 / GREATEST(n_chars, 1)) * 10000) / 10000 AS wkey
    FROM documents
    ORDER BY POW(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT / 4294967296.0,
                 1.0 / GREATEST(n_chars, 1)) DESC, doc_id
    LIMIT {_SAMPLE_K}
    """,
)
def j44_weighted_sample(spark, sf_dir) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES,
    the public exponential-sort construction): every doc draws the key
    ``u^(1/w)`` with ``u`` a deterministic md5-derived uniform and
    ``w = n_chars`` its weight; the global top-k by key is exactly a
    w-weighted sample without replacement.  Long documents are
    proportionally more likely to be kept — the length-weighted corpus
    subsample a token-budgeted training run wants.

    100 TB shape: one map pass (hash + pow per row) and a size-k
    ``TakeOrderedAndProject`` — per-partition top-k heaps merged on the
    driver, never a global sort.  Reproducible on any engine and any
    partitioning because ``u`` is content-derived (j15's rule-7 hash
    discipline), unlike rand()-keyed reservoirs."""
    d = load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") / F.lit(4294967296.0)
    key = F.pow(u, 1.0 / F.greatest("n_chars", F.lit(1)))
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            key.alias("k_full"),
        )
        .orderBy(F.desc("k_full"), "doc_id")
        .limit(_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.floor(F.col("k_full") * 10000) / 10000).alias("wkey"),
        )
    )


@query(
    "j45_winsorize",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    thresh AS (
        SELECT source, n_chars AS p95
        FROM ranked
        WHERE rn = CEIL(0.95 * n)
    )
    SELECT d.doc_id, d.source, d.n_chars,
           LEAST(d.n_chars, t.p95) AS clipped
    FROM documents d JOIN thresh t USING (source)
    """,
)
def j45_winsorize(spark, sf_dir) -> DataFrame:
    """Per-group p95 winsorization of a skewed measure (n_chars per
    source) — the outlier-clipping pass that stops a handful of
    mega-documents from dominating token budgets.  The p95 is DISCRETE:
    the value at row-number ceil(0.95·n) in sort order, so the
    threshold is an actual observed integer and the whole operator is
    exact integer arithmetic end-to-end (interpolated percentiles are
    d12's job; a clip boundary must not sit on a cross-engine float
    ulp).

    100 TB shape: the threshold table is one sort-shuffle of (group,
    measure) — per-group top-5% selection, which AQE splits on skewed
    groups — and is group-count-bounded, so the clip join back onto the
    corpus BROADCASTS.  Net: one wide pass + one map-side join, no
    corpus re-sort."""
    d = load(spark, sf_dir, "documents")
    # sources are LOW-cardinality: a plain (source)-partitioned rank
    # window rides each whole source through one task — the grouped
    # two-phase rank spreads every source across the bucket range and
    # carries the per-source count in the same closure
    # (operators/prefix_scan.py)
    thresh = (
        global_row_number(
            d.select("source", "n_chars", "doc_id"),
            ["n_chars", "doc_id"],
            "rn",
            partition_cols=["source"],
            total_col="n",
        )
        .filter(F.col("rn") == F.ceil(F.lit(0.95) * F.col("n")))
        .select("source", F.col("n_chars").alias("p95"))
    )
    return d.join(F.broadcast(thresh), "source").select(
        "doc_id",
        "source",
        "n_chars",
        F.least("n_chars", "p95").alias("clipped"),
    )


@query(
    "j46_url_dedup",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'https://cdn.example.org/p/'
                             || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 1 THEN 'HTTPS://CDN.EXAMPLE.ORG/p/'
                             || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 2 THEN 'http://cdn.example.org/p/'
                             || CAST(doc_id % 50 AS VARCHAR) || '/'
                 ELSE 'https://cdn.example.org/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                      || '?utm_source=x&utm_campaign=y'
               END AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(lower(url), '^http://', 'https://'),
                       '\\?utm[^#]*$', ''),
                   '/$', '') AS curl
        FROM raw
    )
    SELECT curl, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM canon
    GROUP BY curl
    """,
)
def j46_url_dedup(spark, sf_dir) -> DataFrame:
    """URL-canonicalization dedup — the FIRST dedup pass of a web-corpus
    pipeline, upstream of any content hashing: the same page arrives
    under case-varied hosts, http/https, trailing slashes and utm_*
    tracking params; canonicalize (lowercase, force https, strip
    tracking query, strip trailing slash) and keep the first-crawled
    copy per canonical URL.  The messy variants here are derived
    deterministically from doc_id so the whole pass is oracle-checked
    (four syntactic variants collapsing onto doc_id%50 canonical pages).

    100 TB shape: canonicalization is per-row regex riding the scan
    (anchored, backtracking-free — j26's discipline), and the keeper
    pick is ONE groupBy on the canonical string; because it dedups on a
    short derived key, the exchange carries URLs, never document
    bodies.  Run this before content dedup (j1/j8): it removes the
    bulk crawl-duplication for the cost of a metadata shuffle."""
    d = load(spark, sf_dir, "documents")
    page = (F.col("doc_id") % 50).cast("string")
    raw = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://cdn.example.org/p/"), page),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("HTTPS://CDN.EXAMPLE.ORG/p/"), page),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("http://cdn.example.org/p/"), page, F.lit("/")),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn.example.org/p/"),
                page,
                F.lit("?utm_source=x&utm_campaign=y"),
            )
        )
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), "^http://", "https://"),
            r"\?utm[^#]*$",
            "",
        ),
        "/$",
        "",
    )
    return (
        d.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# j47 — hashed-feature linear quality classifier (fastText-style serving)
# ---------------------------------------------------------------------------

#: hashed feature space (buckets) for the linear scorer.
_CLS_D = 64

#: DuckDB hex-digit value: strpos is 1-based, so value = strpos - 1.
_HX = "strpos('0123456789abcdef', substr(md5({s}), {i}, 1)) - 1"


def cls_z(spark, sf_dir: str):
    """MATERIALIZED (doc_id, z) scorer table over the fixture corpus —
    build-once / serve-many for j47/j55/j62/j67 (the r7 verdict's
    ``_cls_z`` was re-evaluated in three branches of j67's funnel; a
    production pipeline scores the corpus once and every consumer
    reads the persisted score table)."""
    return materialized(
        spark,
        sf_dir,
        "cls_z",
        lambda: _cls_z(spark, load(spark, sf_dir, "documents")),
    )


def _cls_z(spark, docs):
    """(doc_id, z): mean hashed-feature weight per document — the
    linear-scorer core shared by j47 (score + keep flag) and j55
    (AUC evaluation).  See j47's docstring for the serving-join
    scale analysis."""
    feat = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("term"), 1, 2), 16, 10).cast("int")
            % _CLS_D
        ).alias("bucket"),
    )
    weights = spark.range(_CLS_D).select(
        F.col("id").cast("int").alias("bucket"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("w:"), F.col("id").cast("string"))),
                        1, 4,
                    ),
                    16, 10,
                ).cast("double")
                / 65535.0
                - 0.5
            )
            * 2
        ).alias("w"),
    )
    return (
        feat.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg((F.sum("w") / F.count(F.lit(1))).alias("z"))
    )


#: the hashed-feature z-score CTE chain, shared by j47's and j55's
#: oracles (identical md5-derived features and weights in both engines).
_CLS_Z_CTE = f"""
    tokq AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    feat AS (
        SELECT doc_id,
               (({_HX.format(s="term", i=1)}) * 16
                + ({_HX.format(s="term", i=2)})) % {_CLS_D} AS bucket
        FROM tokq
    ),
    wt AS (
        SELECT b AS bucket,
               ((({_HX.format(s="'w:' || CAST(b AS VARCHAR)", i=1)}) * 4096
                 + ({_HX.format(s="'w:' || CAST(b AS VARCHAR)", i=2)}) * 256
                 + ({_HX.format(s="'w:' || CAST(b AS VARCHAR)", i=3)}) * 16
                 + ({_HX.format(s="'w:' || CAST(b AS VARCHAR)", i=4)}))
                / 65535.0 - 0.5) * 2 AS w
        FROM range({_CLS_D}) t(b)
    ),
    z AS (
        SELECT doc_id, SUM(w) / COUNT(*) AS z
        FROM feat JOIN wt USING (bucket)
        GROUP BY doc_id
    )
"""


@query(
    "j47_quality_classifier",
    oracle=f"""
    WITH {_CLS_Z_CTE}
    SELECT doc_id,
           FLOOR(1.0 / (1.0 + EXP(-z)) * 10000) / 10000 AS score,
           CASE WHEN z >= 0 THEN 1 ELSE 0 END AS keep
    FROM z
    """,
)
def j47_quality_classifier(spark, sf_dir) -> DataFrame:
    """Hashed-feature linear quality classifier — the fastText-style
    scorer every production corpus filter runs (CCNet, RefinedWeb,
    FineWeb-Edu all gate documents on a cheap linear model over hashed
    bag-of-words features).  Feature id = md5(token) folded into
    {_CLS_D} buckets; the "trained" weight vector is derived
    deterministically from md5 so BOTH engines reproduce it exactly —
    the plan is byte-identical to serving a real model, only the
    weight values differ.  Score = sigmoid(mean token weight), keep =
    score >= 0.5 (emitted as int; the threshold tests z >= 0, its
    float-exact equivalent, so no engine can flip the flag on a
    sigmoid ulp).

    100 TB shape — THE model-serving join pattern: the weight table is
    model-sized ({_CLS_D} rows here, ~10^6 real), broadcast once per
    executor, hash-joined against the exploded token stream with zero
    shuffle on the corpus side; the only exchange is the per-doc mean
    (partial aggregates map-side).  Swapping in real learned weights =
    replacing the seeded ``range`` frame with a parquet read of the
    model — the plan does not change.  A 10^6-bucket model still
    broadcasts (8 MB); beyond that, fold buckets or shuffle-join —
    both documented, neither needed for any published corpus filter."""
    z = cls_z(spark, sf_dir)
    return z.select(
        "doc_id",
        (F.floor(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) * 10000) / 10000)
        .alias("score"),
        F.when(F.col("z") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# j48 — per-source token-budget selection (greedy prefix fill)
# ---------------------------------------------------------------------------

#: token budget per source for j48.
_BUDGET_TOK = 4000


@query(
    "j48_token_budget_select",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS cum
        FROM t
    )
    SELECT source,
           COUNT(*) AS docs_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
    FROM c
    WHERE cum - n_tok < {_BUDGET_TOK}
    GROUP BY source
    ORDER BY source
    """,
)
def j48_token_budget_select(spark, sf_dir) -> DataFrame:
    """Per-source token-budget selection: fill each source's quota of
    {_BUDGET_TOK} training tokens by greedy prefix over a deterministic
    hash order — the mixture-EXECUTION step downstream of j25's weight
    calculation (j25 says "take 4000 tokens of src3"; this key picks
    WHICH documents that is, reproducibly).  A document is kept iff it
    STARTS before the budget is exhausted (cum - own < budget), so the
    last document may overflow — the standard convention (the trainer
    truncates), chosen because it keeps selection a pure prefix
    predicate instead of a knapsack.

    100 TB shape: j23's physics — one shuffle on (source, md5-prefix
    bucket), the grouped two-phase running sum over the hash order
    (operators/prefix_scan.py), integer arithmetic only.  The hash
    order is a pure function of doc_id (md5 rank, j15/j24 discipline):
    re-runs, engine swaps and repartitions all pick the identical
    document set.  No source ever rides one task — each spreads across
    the bucket range with a |sources|·|buckets|-row closure; the
    j15-style hash-prefix pre-filter to a superset remains the cheaper
    probabilistic shortcut when only the kept set is needed."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    h = t.withColumn("_h", F.md5(F.col("doc_id").cast("string")))
    return (
        prefix_agg(
            h,
            ["_h", "doc_id"],
            "n_tok",
            "cum",
            agg="sum",
            bucket=hex_prefix_bucket(F.col("_h")),
            partition_cols=["source"],
        )
        .filter(F.col("cum") - F.col("n_tok") < _BUDGET_TOK)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tok").alias("tokens_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# j49 — leakage-safe train/val/test split (cluster-aware assignment)
# ---------------------------------------------------------------------------


@query(
    "j49_leakage_safe_split",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, md5(lower(trim(text))) AS ckey FROM documents
    ),
    s AS (
        SELECT doc_id, ckey,
               CASE WHEN b < 8 THEN 'train'
                    WHEN b = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, ckey,
                   (({_HX.format(s="'split:' || ckey", i=1)}) * 4096
                    + ({_HX.format(s="'split:' || ckey", i=2)}) * 256
                    + ({_HX.format(s="'split:' || ckey", i=3)}) * 16
                    + ({_HX.format(s="'split:' || ckey", i=4)})) % 10 AS b
            FROM c
        )
    )
    SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT ckey) AS n_clusters
    FROM s
    GROUP BY split
    ORDER BY split
    """,
)
def j49_leakage_safe_split(spark, sf_dir) -> DataFrame:
    """Leakage-safe train/val/test split: assignment is a hash of the
    duplicate-CLUSTER key (j1's content hash), not of the document —
    so exact duplicates can never straddle splits (the classic eval
    contamination: test doc's twin sits in train, benchmark numbers
    inflate).  80/10/10 by md5-derived bucket; reported per split as
    doc and cluster counts.  The same construction extends to near-dup
    clusters: substitute j20's component label (from j8's LSH pairs)
    for the content hash and the plan is unchanged — hash a GROUP
    representative, never the row.

    100 TB shape: the cluster key and split bucket are per-row md5
    arithmetic riding the scan (no join — the key IS derivable from
    the row; with j20 labels it becomes one broadcast-or-bucketed
    label join); the report is one tiny aggregate.  Determinism:
    assignment is a pure function of content, stable across engines,
    runs, partitionings and corpus growth (adding documents never
    reassigns existing clusters — the property that makes hash splits
    the production standard)."""
    d = load(spark, sf_dir, "documents")
    ckey = F.md5(F.lower(F.trim(F.col("text"))))
    b = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), ckey)), 1, 4), 16, 10
        ).cast("int")
        % 10
    )
    split = (
        F.when(b < 8, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), ckey.alias("ckey"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("ckey").alias("n_clusters"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# j52 — dataset fingerprint (order-insensitive content checksum)
# ---------------------------------------------------------------------------


@query(
    "j52_dataset_fingerprint",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),
                                   1, 15))::BIGINT) AS content_xor
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def j52_dataset_fingerprint(spark, sf_dir) -> DataFrame:
    """Dataset fingerprint: per source, row count, token total, and an
    ORDER-INSENSITIVE 60-bit content checksum (XOR of md5-derived row
    hashes over id+text) — the cheap dataset-versioning primitive:
    two pipeline runs, two engines, or two replicas produced the same
    corpus iff their fingerprints match, regardless of row order or
    partitioning.  This is how a 100 TB curation pipeline asserts
    "stage N changed nothing it shouldn't have" without a sorted diff.

    Why XOR: it is commutative, associative and self-inverse — the
    aggregate partial-combines map-side in any order (SUM mod 2^64
    would too, but overflows ANSI bigint arithmetic in Spark; XOR
    never overflows), and single-row changes flip the checksum with
    probability 1-2^-60.  The hash takes 15 hex chars (60 bits) so
    both engines' BIGINT parse stays positive and exact.

    100 TB shape: one map pass + one source-keyed aggregate of three
    mergeable scalars; output is source-count-bounded.  Fingerprints
    compose: XOR of per-partition fingerprints = the corpus
    fingerprint, so incremental runs re-fingerprint only changed
    partitions and fold (k19's merge algebra applied to checksums)."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        d.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
            h.alias("h"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.bit_xor("h").alias("content_xor"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# j53 — Distinct-N diversity profile (generation/corpus diversity metric)
# ---------------------------------------------------------------------------


@query(
    "j53_distinct_ngram_diversity",
    oracle="""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    u AS (
        SELECT source, unnest(t) AS g FROM toks
    ),
    b AS (
        SELECT source,
               CAST(z[1] AS VARCHAR) || ' ' || CAST(z[2] AS VARCHAR) AS g
        FROM (SELECT source,
                     unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
              FROM toks WHERE len(t) >= 2)
    )
    SELECT u.source,
           ut AS unigram_total,
           FLOOR(ud * 10000.0 / ut) / 10000 AS distinct_1,
           FLOOR(bd * 10000.0 / bt) / 10000 AS distinct_2
    FROM (SELECT source, COUNT(*) AS ut, COUNT(DISTINCT g) AS ud
          FROM u GROUP BY source) u
    JOIN (SELECT source, COUNT(*) AS bt, COUNT(DISTINCT g) AS bd
          FROM b GROUP BY source) b USING (source)
    ORDER BY u.source
    """,
)
def j53_distinct_ngram_diversity(spark, sf_dir) -> DataFrame:
    """Distinct-N diversity profile (Li et al. 2016's Distinct-1/-2 —
    the standard text-generation diversity metric, equally used on
    corpora): per source, the ratio of DISTINCT unigrams and bigrams
    to total — low ratios flag repetitive/templated/mode-collapsed
    text (j18 catches repetition WITHIN a document; this catches it
    ACROSS a source, which per-doc filters structurally cannot).

    Plan: unigrams explode from the split; bigrams zip in-row from the
    same token array (zip_with + slice — no positional self-join, the
    j37/i21 shingle discipline); each n-gram level is one aggregate on
    (source, gram) with the distinct-count collapsing map-side, and
    the final join is source-count-bounded.  Exact integer ratios,
    4dp-floored.

    100 TB shape: gram streams are linear in corpus tokens; the
    distinct-counts are the only heavy state, and each swaps to its
    mergeable HLL sketch (d3/d16) at the scale where exactness stops
    mattering — same output contract, documented trade."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    uni = toks.select("source", F.explode("t").alias("g"))
    bi = toks.filter(F.size("t") >= 2).select(
        "source",
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("g"),
    )
    us = uni.groupBy("source").agg(
        F.count(F.lit(1)).alias("ut"), F.countDistinct("g").alias("ud")
    )
    bs = bi.groupBy("source").agg(
        F.count(F.lit(1)).alias("bt"), F.countDistinct("g").alias("bd")
    )
    return (
        us.join(bs, "source")
        .select(
            "source",
            F.col("ut").alias("unigram_total"),
            (F.floor(F.col("ud") * 10000.0 / F.col("ut")) / 10000).alias(
                "distinct_1"
            ),
            (F.floor(F.col("bd") * 10000.0 / F.col("bt")) / 10000).alias(
                "distinct_2"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# j55 — classifier evaluation: exact ROC-AUC via the rank-sum identity
# ---------------------------------------------------------------------------

@query(
    "j55_classifier_auc",
    oracle=f"""
    WITH {_CLS_Z_CTE},
    scored AS (
        SELECT z.doc_id,
               FLOOR(1.0 / (1.0 + EXP(-z)) * 10000) / 10000 AS score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM z JOIN documents d USING (doc_id)
    ),
    g AS (
        SELECT score, COUNT(*) AS c, CAST(SUM(pos) AS BIGINT) AS cp
        FROM scored GROUP BY score
    ),
    rk AS (
        SELECT score, c, cp,
               CAST(COALESCE(SUM(c) OVER (ORDER BY score
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT) AS cprev
        FROM g
    ),
    m AS (
        SELECT CAST(SUM(cp) AS BIGINT) AS npos,
               CAST(SUM(c - cp) AS BIGINT) AS nneg,
               CAST(SUM(cp * (2 * cprev + c + 1)) AS BIGINT) AS s2
        FROM rk
    )
    SELECT npos, nneg,
           ((s2 - npos * (npos + 1)) * 1000000
            // (2 * npos * nneg)) / 1000000.0 AS auc
    FROM m
    """,
)
def j55_classifier_auc(spark, sf_dir) -> DataFrame:
    """Exact ROC-AUC of the j47 hashed-feature quality scorer against
    an in-corpus label (lang = 'en') — the evaluation half of the
    corpus-filter loop: production pipelines certify a filter's AUC on
    a labeled slice before letting it gate 100 TB (i34 does this for
    retrieval, j54 for dedup; this completes the battery for the
    classifier).

    AUC = P(score_pos > score_neg) + ½P(tie) computed by the
    Mann-Whitney rank-sum identity — NO curve sweep, no trapezoids:
    AUC = (Σ ranks_pos − n⁺(n⁺+1)/2) / (n⁺n⁻), with average ranks for
    ties.  Grouping by DISTINCT score first makes it scale-correct and
    exact: ties collapse into (score, count, pos_count) rows, the
    doubled average-rank sum 2·Σranks = Σ cp·(2·c_prev + c + 1) stays
    in BIGINT, and the single division happens once at the end under
    integer floor (1e-6) — engine-identical by construction.  Scores
    are j47's 4dp-floored sigmoids, already parity-proven.

    Plan: the j47 serving join (broadcast weights, one per-doc
    aggregate), one hash aggregate on score (distinct scores ≈
    thousands, NOT corpus-sized), a one-partition window over that
    tiny table, and a scalar combine.  The corpus is touched exactly
    once; everything past the per-doc aggregate is model-evaluation
    metadata."""
    docs = load(spark, sf_dir, "documents")
    z = cls_z(spark, sf_dir)
    scored = z.join(docs.select("doc_id", "lang"), "doc_id").select(
        (
            F.floor(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) * 10000
            )
            / 10000
        ).alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias(
            "pos"
        ),
    )
    g = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("cp")
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = g.withColumn("cprev", F.coalesce(F.sum("c").over(w), F.lit(0)))
    m = rk.agg(
        F.sum("cp").alias("npos"),
        F.sum(F.col("c") - F.col("cp")).alias("nneg"),
        F.sum(
            F.col("cp") * (2 * F.col("cprev") + F.col("c") + 1)
        ).alias("s2"),
    )
    return m.select(
        "npos",
        "nneg",
        (
            F.expr(
                "(s2 - npos * (npos + 1)) * 1000000"
                " DIV (2 * npos * nneg)"
            )
            / 1000000.0
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# j56 — weight-of-evidence / information value feature scoring
# ---------------------------------------------------------------------------

@query(
    "j56_woe_iv",
    oracle="""
    WITH lab AS (
        SELECT source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ),
    g AS (
        SELECT source,
               COUNT(*) AS n,
               CAST(SUM(pos) AS BIGINT) AS n_pos
        FROM lab GROUP BY source
    ),
    t AS (
        SELECT source, n, n_pos,
               CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos,
               CAST(SUM(n - n_pos) OVER () AS BIGINT) AS tot_neg
        FROM g
    ),
    w AS (
        SELECT source, n, n_pos,
               LN(((n_pos + 0.5) / tot_pos)
                  / ((n - n_pos + 0.5) / tot_neg)) AS woe_raw,
               ((n_pos + 0.5) / tot_pos - (n - n_pos + 0.5) / tot_neg)
                   AS dp
        FROM t
    )
    SELECT source, n, n_pos,
           FLOOR(woe_raw * 10000) / 10000 AS woe,
           FLOOR(SUM(dp * woe_raw) OVER () * 10000) / 10000 AS iv
    FROM w
    ORDER BY source
    """,
)
def j56_woe_iv(spark, sf_dir) -> DataFrame:
    """Weight-of-evidence encoding + information value for a
    categorical feature (source) against the corpus label (lang='en')
    — the classic credit-scoring/feature-selection pair, used in data
    pipelines to rank which metadata columns actually predict a
    quality label before training on them (j55 scores a model; this
    scores a FEATURE).  WOE_i = ln((pos_i/POS)/(neg_i/NEG)) with
    +0.5 Laplace smoothing (zero-cell safe); IV = Σ (pos_i/POS −
    neg_i/NEG)·WOE_i, the standard <0.02 useless / >0.3 strong gauge.

    Determinism: counts are exact BIGINTs; the single ln() per
    CATEGORY (not per row) follows j42/j47's accepted libm discipline
    with 4dp floors.  IV is a window total over the category-sized
    aggregate — d24/d25's one-scan discipline, no join-back rescan.

    Plan / 100 TB shape: one corpus scan → one hash aggregate keyed on
    the feature (map-side partials), then all ratio/ln/IV arithmetic
    runs on the CATEGORY-sized table (5 rows here, ~10³ real) inside
    a single window pass.  Scoring many features = one such aggregate
    each over the same scan (d19's multi-distinct shape), or one
    unpivoted (feature, value) aggregate."""
    lab = load(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias(
            "pos"
        ),
    )
    g = lab.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    wall = Window.partitionBy()
    t = g.select(
        "source",
        "n",
        "n_pos",
        F.sum("n_pos").over(wall).alias("tot_pos"),
        F.sum(F.col("n") - F.col("n_pos")).over(wall).alias("tot_neg"),
    )
    woe_raw = F.log(
        ((F.col("n_pos") + 0.5) / F.col("tot_pos"))
        / ((F.col("n") - F.col("n_pos") + 0.5) / F.col("tot_neg"))
    )
    dp = (F.col("n_pos") + 0.5) / F.col("tot_pos") - (
        F.col("n") - F.col("n_pos") + 0.5
    ) / F.col("tot_neg")
    w = t.select(
        "source", "n", "n_pos", woe_raw.alias("woe_raw"), dp.alias("dp")
    )
    return (
        w.select(
            "source",
            "n",
            "n_pos",
            (F.floor(F.col("woe_raw") * 10000) / 10000).alias("woe"),
            (
                F.floor(
                    F.sum(F.col("dp") * F.col("woe_raw")).over(wall) * 10000
                )
                / 10000
            ).alias("iv"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# j57 — BPE tokenizer training: first-iteration merge-pair counts
# ---------------------------------------------------------------------------

@query(
    "j57_bpe_merge_pairs",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    pairs AS (
        SELECT substr(t, i, 2) AS pair
        FROM tok, LATERAL (SELECT unnest(range(1, length(t))) AS i)
        WHERE length(t) >= 2
    )
    SELECT pair, COUNT(*) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def j57_bpe_merge_pairs(spark, sf_dir) -> DataFrame:
    """BPE tokenizer training, first iteration: count every ADJACENT
    character pair inside every word occurrence and rank the top-20 —
    the argmax of this table IS the first BPE merge (Sennrich et al.
    2016), and production tokenizer training is exactly this aggregate
    iterated (count pairs → merge the winner → recount) over the
    training corpus.  The first iteration is the expensive one (all
    later rounds touch only words containing the merged symbol), so
    its shape is the one that must scale.

    Plan / 100 TB shape: a double explode (token, then in-word
    character offset) that stays inside ONE WholeStageCodegen stage —
    no shuffle until the single (pair)-keyed hash aggregate, whose key
    space is alphabet² (bounded, tiny), so map-side partials collapse
    the corpus-sized pair stream to ~10³ rows per task before the
    exchange; top-20 is a TakeOrderedAndProject heap.  The iterated
    production form keeps the word-frequency table (word, count)
    instead of raw text — one groupBy up front shrinks every later
    round by the corpus/vocabulary ratio; noted, not needed for one
    round."""
    pairs = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("t"))
        .filter(F.length("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# j58 — per-user contribution capping (DP-prep / abuse-bounded aggregates)
# ---------------------------------------------------------------------------

#: max events any one user may contribute per day to the aggregate.
_CONTRIB_CAP = 5


@query(
    "j58_contribution_cap",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
               epoch_ns(ts) AS tns,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    capped AS (
        SELECT day_s, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id, day_s
                                  ORDER BY tns, event_id) AS rn
        FROM ev
    )
    SELECT day_s,
           COUNT(*) AS n_raw,
           CAST(COUNT(*) FILTER (rn <= {_CONTRIB_CAP}) AS BIGINT)
               AS n_kept,
           CAST(SUM(cents) FILTER (rn <= {_CONTRIB_CAP}) AS BIGINT)
               AS sum_cents_capped
    FROM capped
    GROUP BY day_s
    ORDER BY day_s
    """,
)
def j58_contribution_cap(spark, sf_dir) -> DataFrame:
    """Per-user contribution capping: each user contributes at most
    {_CONTRIB_CAP} events per day (earliest first, deterministic
    (ts, event_id) order) to the daily aggregate — the sensitivity-
    bounding step every differential-privacy release and every
    abuse-resistant metric pipeline runs BEFORE aggregating, so one
    hyperactive user (or bot) cannot move the statistic by more than
    a bounded amount.  Emitted per day: raw event count, kept count,
    and the capped cents sum (the quantity noise would be added to in
    a real DP release — the noise draw is the only non-deterministic
    step and is exactly what the oracle contract excludes).

    Plan / 100 TB shape: one shuffle on (user_id, day) for the
    row-number window — the cap is per-key state of size 1 (a
    counter), the k4 dedup shape — then a day-keyed hash aggregate
    with map-side partials.  The window partitioning REFINES the
    aggregate key (user ⊃ day), so AQE coalesces rather than
    re-exchanges; conditional aggregates avoid a second pass for the
    raw-vs-kept comparison (d15/d20 discipline)."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("day", "ts2")).alias("day_s"),
        F.col("ts").alias("tns"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id", "day_s").orderBy("tns", "event_id")
    capped = e.withColumn("rn", F.row_number().over(w))
    keep = F.col("rn") <= _CONTRIB_CAP
    return (
        capped.groupBy("day_s")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.sum(F.when(keep, F.col("cents"))).alias("sum_cents_capped"),
        )
        .orderBy("day_s")
    )


# ---------------------------------------------------------------------------
# j62 — filter agreement: classifier vs heuristic (Cohen's kappa)
# ---------------------------------------------------------------------------

@query(
    "j62_filter_agreement",
    oracle=f"""
    WITH {_CLS_Z_CTE},
    heur AS (
        SELECT doc_id,
               CASE WHEN len(list_distinct(string_split(lower(text), ' ')))
                         * 2 >= len(string_split(lower(text), ' '))
                     AND len(string_split(lower(text), ' ')) >= 30
                    THEN 1 ELSE 0 END AS keep_h
        FROM documents
    ),
    flags AS (
        SELECT h.keep_h,
               CASE WHEN z.z >= 0 THEN 1 ELSE 0 END AS keep_c
        FROM heur h JOIN z ON z.doc_id = h.doc_id
    ),
    m AS (
        SELECT CAST(COUNT(*) FILTER (keep_c = 1 AND keep_h = 1) AS BIGINT)
                   AS n_both,
               CAST(COUNT(*) FILTER (keep_c = 1 AND keep_h = 0) AS BIGINT)
                   AS n_cls_only,
               CAST(COUNT(*) FILTER (keep_c = 0 AND keep_h = 1) AS BIGINT)
                   AS n_heur_only,
               CAST(COUNT(*) FILTER (keep_c = 0 AND keep_h = 0) AS BIGINT)
                   AS n_neither,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM flags
    )
    SELECT n_both, n_cls_only, n_heur_only, n_neither,
           FLOOR((n_both + n_neither) * 1.0 / n * 10000) / 10000 AS po,
           FLOOR((((n_both + n_cls_only) * 1.0 / n)
                  * ((n_both + n_heur_only) * 1.0 / n)
                  + ((n_heur_only + n_neither) * 1.0 / n)
                  * ((n_cls_only + n_neither) * 1.0 / n)) * 10000) / 10000
               AS pe,
           FLOOR(((n_both + n_neither) * 1.0 / n
                  - (((n_both + n_cls_only) * 1.0 / n)
                     * ((n_both + n_heur_only) * 1.0 / n)
                     + ((n_heur_only + n_neither) * 1.0 / n)
                     * ((n_cls_only + n_neither) * 1.0 / n)))
                 / (1 - (((n_both + n_cls_only) * 1.0 / n)
                         * ((n_both + n_heur_only) * 1.0 / n)
                         + ((n_heur_only + n_neither) * 1.0 / n)
                         * ((n_cls_only + n_neither) * 1.0 / n)))
                 * 10000) / 10000 AS kappa
    FROM m
    """,
)
def j62_filter_agreement(spark, sf_dir) -> DataFrame:
    """Corpus-filter AGREEMENT audit: the confusion matrix between two
    independent keep/drop decisions — j47's learned hashed-feature
    classifier and a j7-style rule heuristic (distinct-token ratio ≥
    0.5 ∧ length ≥ 30 tokens, both as INTEGER comparisons so no float
    threshold exists) — plus observed agreement p_o, chance agreement
    p_e, and Cohen's κ.  This is the governance question every
    filter swap raises ("does the new model agree with the rules we
    trust, and where not?"), answered in-engine: the off-diagonal
    counts are exactly the documents to spot-check (j55 scores the
    classifier against a label; this scores it against the INCUMBENT).

    Determinism: the four cells are exact BIGINTs from one pass;
    p_o/p_e/κ are integer-ratio doubles floored at 4dp (identical
    IEEE division in both engines — j25's discipline).

    Plan / 100 TB shape: the heuristic is a shuffle-free map pass over
    the same scan that feeds the classifier's token explode; the only
    corpus exchanges are j47's per-doc aggregate and the doc-keyed
    join of the two flags; everything after is a single 4-cell
    aggregate.  Auditing k filters pairwise = k(k−1)/2 four-cell
    aggregates over the SAME flag table — flags computed once."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    heur = docs.select(
        "doc_id",
        (
            (F.size(F.array_distinct(toks)) * 2 >= F.size(toks))
            & (F.size(toks) >= 30)
        )
        .cast("int")
        .alias("keep_h"),
    )
    z = cls_z(spark, sf_dir)
    flags = heur.join(z, "doc_id").select(
        "keep_h",
        F.when(F.col("z") >= 0, F.lit(1)).otherwise(F.lit(0)).alias(
            "keep_c"
        ),
    )
    m = flags.agg(
        F.sum(((F.col("keep_c") == 1) & (F.col("keep_h") == 1)).cast("long")).alias("n_both"),
        F.sum(((F.col("keep_c") == 1) & (F.col("keep_h") == 0)).cast("long")).alias("n_cls_only"),
        F.sum(((F.col("keep_c") == 0) & (F.col("keep_h") == 1)).cast("long")).alias("n_heur_only"),
        F.sum(((F.col("keep_c") == 0) & (F.col("keep_h") == 0)).cast("long")).alias("n_neither"),
        F.count(F.lit(1)).alias("n"),
    )
    po = (F.col("n_both") + F.col("n_neither")) / F.col("n")
    pe = (
        ((F.col("n_both") + F.col("n_cls_only")) / F.col("n"))
        * ((F.col("n_both") + F.col("n_heur_only")) / F.col("n"))
        + ((F.col("n_heur_only") + F.col("n_neither")) / F.col("n"))
        * ((F.col("n_cls_only") + F.col("n_neither")) / F.col("n"))
    )
    return m.select(
        "n_both",
        "n_cls_only",
        "n_heur_only",
        "n_neither",
        (F.floor(po * 10000) / 10000).alias("po"),
        (F.floor(pe * 10000) / 10000).alias("pe"),
        (F.floor((po - pe) / (1 - pe) * 10000) / 10000).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# j63 — dataset card: the one-pass corpus summary row
# ---------------------------------------------------------------------------

@query(
    "j63_dataset_card",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source, n_chars,
               len(string_split(lower(text), ' ')) AS n_tok,
               md5(lower(trim(text))) AS h
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dups,
           CAST(MIN(n_tok) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tok) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tok) // COUNT(*) AS BIGINT) AS mean_tokens_floor
    FROM t
    """,
)
def j63_dataset_card(spark, sf_dir) -> DataFrame:
    """The DATASET CARD summary row: corpus size, language/source
    cardinalities, token and byte totals, exact-duplicate count, and
    token-length extremes — the header block of every published
    dataset card (The Pile, C4, FineWeb all lead with exactly these
    numbers), computed in ONE pass so the card a release ships is the
    card the data actually has.  Exact-dup count rides the same scan
    as the totals via a distinct-count over the content hash (j1's
    md5 contract); the mean is floor division, keeping every column a
    BIGINT.

    Plan / 100 TB shape: one scan, one global aggregate — the three
    distinct-counts each expand map-side but share the scan; at scale
    swap them for d3-style HLL sketches (the card tolerates ±2% on
    cardinalities, never on totals) and the pass is pure map-combine.
    Per-language/per-source card SECTIONS are the same aggregate keyed
    by the dimension (a6/a7's shape); j60's dedup histogram and j36's
    quality metrics complete the card's later sections — all riding
    passes the pipeline already pays for."""
    t = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias(
            "n_tok"
        ),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"),
        F.min("n_tok").alias("min_tokens"),
        F.max("n_tok").alias("max_tokens"),
        F.expr("sum(n_tok) DIV count(1)").alias("mean_tokens_floor"),
    )


# ---------------------------------------------------------------------------
# j66 — tokenizer coverage: out-of-vocabulary rate per source
# ---------------------------------------------------------------------------

#: vocabulary size for the OOV audit.
_OOV_VOCAB = 1000


@query(
    "j66_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS c,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rn
            FROM tok GROUP BY term
        ) WHERE rn <= {_OOV_VOCAB}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (v.term IS NULL) AS BIGINT) AS n_oov,
           (COUNT(*) FILTER (v.term IS NULL) * 1000000 // COUNT(*))
               / 1000000.0 AS oov_rate
    FROM tok t LEFT JOIN vocab v ON v.term = t.term
    GROUP BY source
    ORDER BY source
    """,
)
def j66_oov_rate(spark, sf_dir) -> DataFrame:
    """Tokenizer COVERAGE audit: the out-of-vocabulary token rate per
    source against a top-{_OOV_VOCAB} frequency vocabulary — the
    metric that decides whether a tokenizer (or its vocab budget) fits
    a corpus before training commits to it (high OOV on one source =
    that source fragments into bytes/unk and trains badly; j57 builds
    merge candidates, THIS measures what a finished vocab covers).
    Token-level counting (total and OOV tokens summed as BIGINTs, one
    floor division per source at 1e-6) rather than averaging per-doc
    ratios — no float accumulation anywhere.

    Plan / 100 TB shape: the vocab is a top-K over the term aggregate
    (heap, vocabulary-sized) and then BROADCASTS into a left join
    against the token stream — membership is the j19/j47 broadcast
    shape, the corpus never shuffles; the per-source rollup is one
    keyed aggregate with map-side partials.  A real subword tokenizer
    swaps the vocab derivation for its merges table; the audit plan is
    unchanged."""
    tok = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    )
    # top-K membership needs no rank column: ORDER BY + LIMIT plans a
    # TakeOrderedAndProject heap (f2's shape) — a rank WINDOW here
    # would single-partition the vocabulary table, which at web scale
    # is billions of raw tokens
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(_OOV_VOCAB)
        .select("term", F.lit(1).alias("in_v"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_v").isNull().cast("long")).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            (F.expr("n_oov * 1000000 DIV n_tokens") / 1000000.0).alias(
                "oov_rate"
            ),
        )
        .orderBy("source")
    )
