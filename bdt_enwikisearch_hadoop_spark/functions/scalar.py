"""§2.H — scalar function battery: string / datetime / math / array /
json / map / higher-order (SURVEY.md §2.H; h1/h4 are the reference's
tokenizer-normalization core).

Scale notes (100 TB): everything here is a narrow per-row projection —
no shuffle, fully inside WholeStageCodegen, vectorized over the Parquet
scan.  These are the cheapest operators in the engine; the design rule
they encode is "stay JVM-side": none of these need a Python UDF.

Cross-engine convention notes (§2.0): Spark ``dayofweek`` is Sun=1 but
DuckDB's is Sun=0 — both sides use the ISO form instead (Mon=1..Sun=7,
Spark ``weekday()+1`` == DuckDB ``isodow``).  ``substring`` is 1-based
in both.  Spark ``regexp_replace`` is global by default; DuckDB needs
the explicit ``'g'`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from ..sources import load


@query(
    "h1_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up,
           LOWER(p_type) AS lo,
           TRIM(CONCAT('  ', p_name, '  ')) AS trimmed,
           SUBSTRING(p_name, 1, 5) AS sub5,
           CONCAT(p_brand, ':', p_name) AS cat,
           LENGTH(p_name) AS len,
           REPLACE(p_name, 'a', '_') AS repl,
           LPAD(p_brand, 12, '*') AS padded,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels,
           (p_type LIKE '%BRASS%') AS is_brass
    FROM part
    """,
)
def h1_string(spark, sf_dir) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_name")).alias("cat"),
        F.length("p_name").cast("long").alias("len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("_")).alias("repl"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
    )


@query(
    "h2_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY FROM o_orderdate) AS dom,
           DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           ISODOW(o_orderdate) AS iso_dow
    FROM orders
    """,
)
def h2_datetime(spark, sf_dir) -> DataFrame:
    """Datetime battery with the conventions normalized (module docstring)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.add_months(d.cast("date"), 1).alias("next_month"),
        F.last_day(d.cast("date")).alias("month_end"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
    )


@query(
    "h3_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS rounded,
           ABS(l_discount - 0.05) AS absdiff,
           CEIL(l_quantity) AS ceiled,
           FLOOR(l_quantity) AS floored,
           ROUND(LN(l_extendedprice), 4) AS ln_price,
           ROUND(LOG10(l_extendedprice), 4) AS log10_price,
           ROUND(POW(1 + l_discount, 2), 6) AS pow2,
           l_orderkey % 7 AS mod7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn,
           ROUND(SQRT(l_quantity), 4) AS sqrt_qty,
           GREATEST(l_quantity, 10.0) AS gq,
           LEAST(l_tax, 0.05) AS lt
    FROM lineitem
    """,
)
def h3_math(spark, sf_dir) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("absdiff"),
        F.ceil("l_quantity").cast("double").alias("ceiled"),
        F.floor("l_quantity").cast("double").alias("floored"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 4).alias("log10_price"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("pow2"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("gq"),
        F.least(F.col("l_tax"), F.lit(0.05)).alias("lt"),
    )


@query(
    "h4_array",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(toks[1:5], ' ') AS head5,
           list_sort(list_distinct(toks)) AS vocab,
           len(list_distinct(toks)) AS n_distinct
    FROM t
    """,
)
def h4_array(spark, sf_dir) -> DataFrame:
    """Array battery over the tokenized corpus — tokenization itself is
    one JVM-side split(), the array functions all stay in codegen.
    list_distinct order is engine-specific → always sort (§2.0 rule 3)."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_join(F.slice("toks", 1, 5), " ").alias("head5"),
        F.sort_array(F.array_distinct("toks")).alias("vocab"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )


@query(
    "h5_json",
    oracle="""
    SELECT event_type,
           COUNT(CASE WHEN CAST(props->>'$.k' AS INTEGER) > 50 THEN 1 END) AS n_high,
           ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def h5_json(spark, sf_dir) -> DataFrame:
    """JSON extraction (props is a JSON string column) then aggregate.
    get_json_object is JVM-side; at scale prefer from_json with an
    explicit schema once per pipeline rather than repeated path probes."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


@query(
    "h6_map",
    oracle="""
    SELECT n_nationkey AS id, 'nat' AS key, n_nationkey AS value FROM nation
    UNION ALL
    SELECT n_nationkey AS id, 'reg' AS key, n_regionkey AS value FROM nation
    """,
)
def h6_map(spark, sf_dir) -> DataFrame:
    """Map construction + explode to rows.  The oracle is the portable
    relational equivalent (a map literal exploded == a 2-way UNION)."""
    n = load(spark, sf_dir, "nation")
    m = n.select(
        F.col("n_nationkey").alias("id"),
        F.create_map(
            F.lit("nat"), F.col("n_nationkey"),
            F.lit("reg"), F.col("n_regionkey"),
        ).alias("m"),
    )
    return m.select("id", F.explode("m").alias("key", "value"))


@query(
    "h7_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           array_to_string(list_transform(toks[1:8], x -> upper(x)), ' ') AS up8,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_chars
    FROM t
    """,
)
def h7_higher_order(spark, sf_dir) -> DataFrame:
    """Lambda higher-order functions over token arrays — per-row, no
    shuffle, no Python."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    return t.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice("toks", 1, 8), lambda x: F.upper(x)), " "
        ).alias("up8"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@query(
    "h8_edit_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, p_type) AS d_name_type,
           levenshtein(p_brand, 'Brand#1') AS d_brand
    FROM part
    """,
)
def h8_edit_distance(spark, sf_dir) -> DataFrame:
    """Levenshtein edit distance (identical integer semantics in both
    engines) — the workhorse of fuzzy string matching / OCR cleanup in
    text pipelines; per-row, codegen, no shuffle."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_name"), F.col("p_type")).cast("long").alias("d_name_type"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).cast("long").alias("d_brand"),
    )


@query(
    "h9_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def h9_variant_json(spark, sf_dir) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse the JSON
    string ONCE into the binary-encoded VARIANT type, then extract
    typed fields with variant_get.  Unlike repeated get_json_object
    probes (h5 — one string re-parse per path), a variant column is
    parsed once, stores typed values, and is the layout parquet
    shredding optimizes at scale; all aggregates here are exact
    integer arithmetic, so the hash-match is engine-stable."""
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "long").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "h10_regexp",
    oracle="""
    SELECT doc_id,
           list_sort(regexp_extract_all(text, '[a-z]{6,}')) AS long_words,
           CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT)
               AS n_long,
           regexp_replace(text, '[aeiou]', '', 'g') AS devoweled,
           CAST(regexp_matches(text, 'spark.*join|join.*spark') AS BOOLEAN)
               AS both_terms
    FROM documents
    """,
)
def h10_regexp(spark, sf_dir) -> DataFrame:
    """Regexp battery: extract-all (sorted for order-independence),
    count, global replace, and a multi-pattern boolean match — all
    JVM-side regexp engines, no Python.  At scale regexp cost is pure
    map-side CPU riding the corpus scan; the only rule is to anchor
    alternations narrowly so the engine can't backtrack
    catastrophically."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_sort(
            F.expr(r"regexp_extract_all(text, '[a-z]{6,}', 0)")
        ).alias("long_words"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]{6,}', 0)"))
        .cast("long")
        .alias("n_long"),
        F.regexp_replace("text", "[aeiou]", "").alias("devoweled"),
        F.col("text").rlike("spark.*join|join.*spark").alias("both_terms"),
    )


@query(
    "h11_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.org/' || lang || '/doc/'
                 || doc_id || '?ref=' || source || '&page=2' AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, 'ref=([^&]*)', 1) AS ref,
           regexp_extract(url, 'page=([^&]*)', 1) AS page
    FROM u
    """,
)
def h11_url_parse(spark, sf_dir) -> DataFrame:
    """URL battery: build a canonical URL from document attributes,
    then take it apart with parse_url (HOST / PATH / QUERY-key
    extraction) — the link-normalization step of web-corpus pipelines
    (group by host, dedup by path, strip tracking params).

    100 TB shape: parse_url is a JVM intrinsic riding the scan in one
    codegen span — per-row string slicing, no shuffle.  The oracle
    mirrors it with anchored regexes; both sides are linear scans of
    the URL bytes.  At scale the derived host column is the natural
    partition/bucket key for per-site aggregation downstream."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("source"), F.lit("&page=2"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
    )


@query(
    "h12_try_arith",
    oracle="""
    SELECT o_orderkey,
           ROUND(CASE WHEN o_custkey % 5 = 0 THEN NULL
                      ELSE o_totalprice / (o_custkey % 5) END, 4)
               AS safe_div,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
           CASE WHEN regexp_matches(o_orderstatus, '^-?[0-9]+$')
                THEN TRY_CAST(o_orderstatus AS INTEGER) IS NULL
                ELSE TRUE END AS status_not_numeric
    FROM orders
    """,
)
def h12_try_arith(spark, sf_dir) -> DataFrame:
    """ANSI-mode error-safe arithmetic battery: try_divide turns
    division-by-zero into NULL instead of a failed 100 TB job;
    try_cast turns unparseable strings into NULL instead of a
    mid-stage exception.  The operational point at scale: under ANSI
    SQL semantics a single malformed row kills the whole stage hours
    in — try_* expressions are the row-level quarantine that keeps
    the job alive and makes the bad rows COUNTABLE (pair with
    observe_quality to alert on the NULL rate).

    Perf note (measured at sf0.1): try_cast pays a per-row exception
    when the parse FAILS (~9 µs/row vs ~1 µs on success — 1.4 s of a
    1.9 s pass came from one all-unparseable column), so point it at
    columns where failure is the exception, not the rule.  The
    priority prefix parses on every row (fast path); the all-alpha
    status column is handled the right way for a garbage-heavy
    column: a cheap regexp GUARD short-circuits the throwing parse,
    and try_cast only runs on rows that look numeric.

    Plain map pass riding the scan; the CASE formulation in the
    oracle is the portable spelling of the same semantics."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5), 4
        ).alias("safe_div"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS int)").alias(
            "prio_rank"
        ),
        F.when(
            F.col("o_orderstatus").rlike("^-?[0-9]+$"),
            F.expr("try_cast(o_orderstatus AS int)").isNull(),
        )
        .otherwise(F.lit(True))
        .alias("status_not_numeric"),
    )


@query(
    "h13_interval_datemath",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           strftime(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                    + INTERVAL 1 MONTH - INTERVAL 1 DAY,
                    '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                AS BIGINT) AS days_since_epoch0,
           CAST(datepart('quarter', o_orderdate) AS INT) AS q,
           CAST(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate)
                AS BIGINT) AS months_elapsed
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def h13_interval_datemath(spark, sf_dir) -> DataFrame:
    """Interval/date arithmetic battery (§2.H breadth): +INTERVAL,
    month-end via trunc+month-interval, whole-day and whole-month
    difference counts, and quarter extraction — the due-date /
    aging-bucket arithmetic every billing or SLA pipeline runs.

    Cross-engine hazards pinned here: Spark's months_between returns
    FRACTIONAL months (DuckDB's date_diff('month') counts boundary
    crossings — the Spark side uses a trunc-to-month diff to match
    exactly); dates are emitted as strings so the µs-vs-ms timestamp
    encodings can never leak into the hash.  All map-side, rides the
    scan."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    trunc_m = F.date_trunc("month", F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(
            trunc_m + F.expr("INTERVAL 1 MONTH") - F.expr("INTERVAL 1 DAY"),
            "yyyy-MM-dd",
        ).alias("month_end"),
        F.datediff(
            F.to_date(F.col("o_orderdate")), F.to_date(F.lit("1995-01-01"))
        )
        .cast("long")
        .alias("days_since_epoch0"),
        F.quarter("o_orderdate").alias("q"),
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12
            + F.month("o_orderdate")
            - F.lit(1)
        )
        .cast("long")
        .alias("months_elapsed"),
    ).orderBy("o_orderkey")


@query(
    "h14_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS and_line,
           bit_or(l_linenumber) AS or_line,
           bit_xor(l_orderkey) AS xor_order,
           MIN(l_orderkey & l_partkey) AS min_and,
           MAX(l_orderkey | l_linenumber) AS max_or,
           MIN((l_orderkey << 2) | l_linenumber) AS min_shift_or,
           CAST(SUM(bit_count(CAST(l_partkey AS BIGINT))) AS BIGINT)
               AS popcount_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def h14_bitwise(spark, sf_dir) -> DataFrame:
    """Bitwise surface battery: the bit_and/bit_or/bit_xor AGGREGATES
    (flag-intersection / union / parity fingerprints over packed
    bitfields) alongside scalar &, |, shifts and popcount — all
    integer-exact, so both engines agree bit for bit.

    Everything folds map-side into one partial aggregate per group:
    bitwise aggregates are commutative/associative, the ideal partial-
    agg shape; popcount rides the same pass.  (Bitmap-based distinct
    counting over these primitives is d18.)"""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_and(l_linenumber)").alias("and_line"),
        F.expr("bit_or(l_linenumber)").alias("or_line"),
        F.expr("bit_xor(l_orderkey)").alias("xor_order"),
        F.expr("MIN(l_orderkey & l_partkey)").alias("min_and"),
        F.expr("MAX(l_orderkey | l_linenumber)").alias("max_or"),
        F.expr("MIN(shiftleft(l_orderkey, 2) | l_linenumber)").alias(
            "min_shift_or"
        ),
        F.expr("SUM(bit_count(CAST(l_partkey AS BIGINT)))").alias(
            "popcount_sum"
        ),
    )


@query(
    "h15_json_shred",
    oracle="""
    SELECT l_orderkey AS o_orderkey,
           COUNT(*) AS n_items,
           FLOOR(SUM(l_quantity) * 10000) / 10000 AS sum_qty,
           FLOOR(MAX(l_extendedprice) * 10000) / 10000 AS max_price
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def h15_json_shred(spark, sf_dir) -> DataFrame:
    """JSON denormalize→shred ROUNDTRIP: aggregate each order's line
    items into ONE nested JSON document (struct + array-of-structs via
    ``to_json``, the event/API document shape), then do what every ELT
    pipeline does to such documents — parse with an explicit schema
    (``from_json``; never schema inference on a 100 TB stream),
    ``explode`` the nested array back to relational rows, aggregate.
    The oracle computes the same aggregate DIRECTLY from lineitem, so
    parity proves the build→parse→shred roundtrip is lossless —
    including float survival through JSON text (Spark serializes
    doubles shortest-roundtrip).

    100 TB shape: the denormalize is one pk-keyed aggregate
    (collect_list is safe here because group size is bounded by order
    width, ≤7 — the per-key-bounded-array rule); parse + explode are
    shuffle-free map stages pipelined into whatever follows.  In a
    real ingest only the shred half exists and the document scan
    prunes to the parsed fields (from_json pushes required-field
    pruning into the parser via schema pruning)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 97 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
    doc = li.groupBy("l_orderkey").agg(
        F.to_json(
            F.struct(
                F.col("l_orderkey").alias("k"),
                F.array_sort(
                    F.collect_list(
                        F.struct("l_linenumber", "l_quantity", "l_extendedprice")
                    )
                ).alias("items"),
            )
        ).alias("doc")
    )
    schema = (
        "k BIGINT, items ARRAY<STRUCT<l_linenumber: INT, "
        "l_quantity: DOUBLE, l_extendedprice: DOUBLE>>"
    )
    parsed = doc.select(F.from_json("doc", schema).alias("p"))
    ex = parsed.select(
        F.col("p.k").alias("o_orderkey"), F.explode("p.items").alias("it")
    )
    return (
        ex.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.floor(F.sum("it.l_quantity") * 10000) / 10000).alias("sum_qty"),
            (F.floor(F.max("it.l_extendedprice") * 10000) / 10000).alias(
                "max_price"
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# h16 — binary codec battery (base64 / hex round trips)
# ---------------------------------------------------------------------------

@query(
    "h16_codec",
    oracle="""
    SELECT doc_id,
           length(base64(encode(text))) AS b64_len,
           md5(decode(from_base64(base64(encode(text))))) AS md5_rt,
           hex(encode(substr(text, 1, 8))) AS hex_prefix,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def h16_codec(spark, sf_dir) -> DataFrame:
    """Binary codec battery: base64 encode → decode round trip proven
    by md5 equality, hex of a UTF-8 byte prefix, and exact byte
    length — the interchange plumbing every ingestion layer leans on
    (webhook payloads, protobuf blobs, m1-m4's opaque media columns
    all arrive base64- or hex-wrapped).  Two independent codec
    implementations (Spark's vs the oracle engine's) agreeing on every
    document — including multi-byte UTF-8 — is the point of the
    parity check; the b64 length also pins the padding convention
    (both emit '=' padding).

    Plan: pure per-row projection, shuffle-free map pass inside one
    codegen stage (j18's shape); the only exchange is the output sort,
    which real pipelines drop.  Codec cost is linear in bytes and
    column-pruned: only text is read."""
    d = load(spark, sf_dir, "documents")
    b = F.col("text").cast("binary")
    # Spark's base64 emits RFC-2045 MIME chunking (CRLF every 76
    # chars) while DuckDB emits the unchunked RFC-4648 form — the
    # decoded bytes agree (decoders skip whitespace) but raw lengths
    # don't, so the length is measured on the whitespace-stripped form
    b64 = F.regexp_replace(F.base64(b), "[\r\n]", "")
    return d.select(
        "doc_id",
        F.length(b64).cast("long").alias("b64_len"),
        F.md5(F.unbase64(b64)).alias("md5_rt"),
        F.hex(F.substring(F.col("text"), 1, 8).cast("binary")).alias(
            "hex_prefix"
        ),
        F.length(b).cast("long").alias("n_bytes"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# h17 — business-day arithmetic (closed-form weekday counting)
# ---------------------------------------------------------------------------

#: h(x) = weekdays among epoch-day-offsets 0..x, closed form; the +3
#: aligns day 0 (1970-01-01, a Thursday) onto the week grid.
_BD_H = "(5 * (({x} + 1) {div} 7) + LEAST(({x} + 1) % 7, 5))"


def _bd_sql(day_expr: str, div: str) -> str:
    """f(d) = weekdays in (epoch, d] for an epoch-day integer expr."""
    return f"({_BD_H.format(x=f'({day_expr} + 3)', div=div)} - 3)"


@query(
    "h17_business_days",
    oracle=f"""
    WITH per_order AS (
        SELECT o.o_orderkey, o.o_orderpriority,
               date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS od,
               date_diff('day', DATE '1970-01-01',
                         CAST(MIN(l.l_shipdate) AS DATE)) AS sd
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(MIN({_bd_sql('sd', '//')} - {_bd_sql('od', '//')})
                AS BIGINT) AS min_bd,
           CAST(MAX({_bd_sql('sd', '//')} - {_bd_sql('od', '//')})
                AS BIGINT) AS max_bd,
           CAST(SUM({_bd_sql('sd', '//')} - {_bd_sql('od', '//')})
                // COUNT(*) AS BIGINT) AS mean_bd_floor
    FROM per_order
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def h17_business_days(spark, sf_dir) -> DataFrame:
    """Business-day arithmetic: fulfillment latency from order date to
    first shipment counted in WEEKDAYS, summarized per order priority
    — the SLA metric every operations report wants, and the date-math
    case naive `datediff/7*5` approximations get wrong at week
    boundaries.  Exact closed form: f(d) = weekdays in (epoch, d]
    via h(x) = 5·⌊(x+1)/7⌋ + min((x+1) mod 7, 5) with a +3 shift
    aligning 1970-01-01 (a Thursday) onto the week grid; the span is
    f(ship) − f(order) — pure integer DIV/mod, engine-identical, no
    calendar table needed (holidays, when required, are a broadcast
    calendar anti-join — the plan gains one join, the formula stays).

    Plan / 100 TB shape: one orderkey join + per-order MIN (both
    shuffled on the key AQE-coalesced — at scale the orders side
    pre-aggregates lineitem map-side), then the weekday arithmetic is
    a shuffle-free projection into a priority-keyed 5-row aggregate.
    The mean is floor division — every output column BIGINT."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # Aggregate lineitem BEFORE the join (guide: aggregate before you
    # shuffle / shuffle fewer bytes): the per-orderkey MIN collapses the
    # fact side map-side to one narrow (orderkey, date) row per order,
    # so the exchange never carries the joined priority/date columns
    # and the broadcast-hash probe sees |orders| rows, not |lineitem|.
    # Row-identical to aggregating after the join: o_orderkey is unique
    # in orders, so the oracle's GROUP BY (orderkey, priority, date)
    # groups are exactly the per-orderkey lineitem groups, and the
    # inner join drops lineitem-less orders either way.
    li_min = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("ship")
    )
    per_order = (
        o.join(li_min, "o_orderkey")
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("od"),
            F.datediff(
                F.col("ship").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("sd"),
        )
    )
    bd = F.expr(
        f"{_bd_sql('sd', 'DIV')} - {_bd_sql('od', 'DIV')}"
    )
    return (
        per_order.withColumn("bd", bd)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("bd").cast("long").alias("min_bd"),
            F.max("bd").cast("long").alias("max_bd"),
            F.expr("sum(bd) DIV count(1)").alias("mean_bd_floor"),
        )
        .orderBy("o_orderpriority")
    )
