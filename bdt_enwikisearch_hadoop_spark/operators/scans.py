"""§2.A — scans, sources, sinks.

Scale notes (100 TB): these queries are pure scan-shape — no shuffle at
all.  Catalyst pushes the a3 predicate into the Parquet reader
(``PushedFilters``) and prunes columns (``ReadSchema``), so a
1000-executor cluster reads only the needed row groups/columns.  The
partitioned sink below is the layout that enables partition pruning for
downstream readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from ..sources import load


@query(
    "a1_scan_full",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def a1_scan_full(spark, sf_dir) -> DataFrame:
    """Full table scan with a fixed column order."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query(
    "a2_scan_project",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def a2_scan_project(spark, sf_dir) -> DataFrame:
    """Column pruning: the Parquet ReadSchema must contain only these two."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "a3_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def a3_scan_filter_pushdown(spark, sf_dir) -> DataFrame:
    """Predicate pushed into the Parquet scan (verify via .explain)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


def write_partitioned_parquet(df: DataFrame, path: str, partition_col: str = "lang") -> None:
    """Partitioned Parquet sink (smoke-checked in tests, no oracle — side effect).

    At scale the partition column choice drives partition pruning for
    every downstream query filtering on it.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def _evolved_dir(spark, sf_dir) -> str:
    """Build-once-per-(session, sf): a two-generation parquet layout —
    gen=1 written with the original 2-column schema, gen=2 with an
    added column — the on-disk shape every long-lived dataset grows
    into.  Removed at interpreter exit."""
    import atexit
    import os
    import re
    import shutil
    import tempfile

    tag = re.sub(r"[^a-z0-9]", "_", os.path.basename(sf_dir.rstrip("/")))
    base = os.path.join(
        tempfile.gettempdir(),
        f"bdt_evolved_{spark.sparkContext.applicationId}_{tag}",
    )
    if not os.path.exists(os.path.join(base, "_DONE")):
        o = load(spark, sf_dir, "orders")
        old = o.filter(F.col("o_orderdate") < "1998-01-01").select(
            "o_orderkey", "o_totalprice"
        )
        new = o.filter(F.col("o_orderdate") >= "1998-01-01").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        old.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
        new.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
        with open(os.path.join(base, "_DONE"), "w") as fh:
            fh.write("ok")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


@query(
    "a4_scan_merge_schema",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 1 AS gen
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority, 2 AS gen
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def a4_scan_merge_schema(spark, sf_dir) -> DataFrame:
    """Schema-evolution READ: one scan over a dataset whose old
    partitions predate a column — ``mergeSchema=true`` unions the
    footer schemas, old files surface the new column as NULL, and the
    partition column (gen) comes from the directory layout.  This is
    g7's by-name union done where it belongs at scale: in the SOURCE,
    with no rewrite of history and no per-generation DataFrame
    plumbing.

    100 TB shape: schema merge reads FOOTERS (metadata), not data; the
    per-file projection adapts per generation, and filters/pruning
    behave exactly as on a uniform table.  The alternative — rewriting
    petabytes of history to add a NULL column — is the anti-pattern
    this exists to avoid."""
    base = _evolved_dir(spark, sf_dir)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(base)
        .select(
            "o_orderkey",
            "o_totalprice",
            "o_orderpriority",
            F.col("gen").cast("int").alias("gen"),
        )
    )


@query(
    "a5_xml_dump_parse",
    oracle="""
    WITH xml AS (
        SELECT '<page><id>' || doc_id || '</id><lang>' || lang
               || '</lang><source>' || source || '</source><text>'
               || replace(replace(replace(text,
                      '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
               || '</text></page>' AS raw
        FROM documents
    )
    SELECT CAST(regexp_extract(raw, '<id>(\\d+)</id>', 1) AS BIGINT)
               AS doc_id,
           regexp_extract(raw, '<lang>([^<]*)</lang>', 1) AS lang,
           regexp_extract(raw, '<source>([^<]*)</source>', 1) AS source,
           length(replace(replace(replace(
               regexp_extract(raw, '<text>([^<]*)</text>', 1),
               '&lt;', '<'), '&gt;', '>'), '&amp;', '&'))
               AS text_chars
    FROM xml
    """,
)
def a5_xml_dump_parse(spark, sf_dir) -> DataFrame:
    """XML dump ingestion — the reference archetype's actual input
    format (MediaWiki ``<page>`` dumps): serialize each fixture row to
    a ``<page>`` element, then parse it back with Spark 4's native
    ``from_xml`` against an explicit schema and project typed columns.
    The roundtrip construction lets a DuckDB oracle (regexp field
    extraction — DuckDB has no XML reader) verify the PARSE step
    end-to-end; text is entity-escaped during serialization on both
    sides (from_xml unescapes, the oracle unescapes explicitly), so a
    fixture refresh introducing <, > or & cannot desynchronize the
    engines.

    Plan: both serialize and parse are per-row projections — a pure
    map pass, zero shuffles, bounded by scan bandwidth.  On a real
    dump the raw XML arrives via text/newline-delimited source (the
    sources/dump_source.py connector) and this same from_xml
    projection runs directly on the wire column; schema-on-read means
    malformed pages surface as NULLs, filterable without job failure."""
    parsed = parse_pages(serialize_pages(load(spark, sf_dir, "documents")))
    return parsed.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("text_chars"),
    )


def serialize_pages(docs: DataFrame) -> DataFrame:
    """documents → one entity-escaped ``<page>`` XML string per row
    (the dump wire format a5 parses; shared with i22's composed
    dump-to-search lifecycle)."""
    return docs.select(
        F.concat(
            F.lit("<page><id>"),
            F.col("doc_id"),
            F.lit("</id><lang>"),
            F.col("lang"),
            F.lit("</lang><source>"),
            F.col("source"),
            F.lit("</source><text>"),
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), "&", "&amp;"),
                    "<", "&lt;"),
                ">", "&gt;"),
            F.lit("</text></page>"),
        ).alias("raw")
    )


def parse_pages(raw: DataFrame) -> DataFrame:
    """raw ``<page>`` XML → typed (doc_id, lang, source, text) via
    Spark 4's native from_xml; malformed pages null out whole-record
    (PERMISSIVE), pinned in pytest."""
    return raw.select(
        F.from_xml(
            "raw",
            "struct<id:bigint, lang:string, source:string, text:string>",
        ).alias("p")
    ).select(
        F.col("p.id").alias("doc_id"),
        F.col("p.lang").alias("lang"),
        F.col("p.source").alias("source"),
        F.col("p.text").alias("text"),
    )


def _csv_dir(spark, sf_dir) -> str:
    """Build-once-per-(session, sf) CSV staging of documents (the c17
    pattern): the fixture ships parquet only, so the CSV source is
    exercised by round-tripping through a session tmpdir."""
    import atexit
    import os
    import shutil
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(),
        f"bdt_csv_{spark.sparkContext.applicationId}_{tag}",
    )
    if not os.path.isdir(base):
        (
            load(spark, sf_dir, "documents")
            .write.mode("overwrite")
            .option("header", True)
            .option("quoteAll", True)  # robust to future delimiter-bearing text
            .csv(base)
        )
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


@query(
    "a6_csv_scan",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS total_tokens
    FROM documents
    GROUP BY source
    """,
)
def a6_csv_scan(spark, sf_dir) -> DataFrame:
    """CSV source with an EXPLICIT schema (never inferSchema — schema
    inference is a full extra pass over the data and type-guesses):
    documents staged once per session as quoted CSV, read back typed,
    and aggregated per source.  The oracle reads the original parquet,
    so the equality proves the CSV round-trip is lossless including
    quoting.

    Scale: CSV is the interchange format 100 TB pipelines RECEIVE, not
    what they should scan repeatedly — it is row-oriented, has no
    column pruning, no predicate pushdown, no statistics (contrast a2/
    a3's parquet scans, plan-guarded for both).  The right pattern is
    exactly this shape: one schema-checked pass that lands the data as
    parquet (the staging write), every later query reading columnar."""
    csv_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs = (
        spark.read.schema(csv_schema)
        .option("header", True)
        .csv(_csv_dir(spark, sf_dir))
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(F.lower(F.col("text")), " "))).cast("long").alias(
            "total_tokens"
        ),
    )


def _jsonl_dir(spark, sf_dir) -> str:
    """Build-once-per-(session, sf) JSON-lines staging of documents
    (a6's pattern for the other interchange format pipelines receive)."""
    import atexit
    import os
    import shutil
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(),
        f"bdt_jsonl_{spark.sparkContext.applicationId}_{tag}",
    )
    if not os.path.isdir(base):
        load(spark, sf_dir, "documents").write.mode("overwrite").json(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


@query(
    "a7_jsonl_scan",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def a7_jsonl_scan(spark, sf_dir) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema (the web-corpus
    interchange format — WARC-derived corpora, API exports and
    annotation dumps all arrive as JSONL): documents staged once per
    session as JSONL, read back typed, aggregated per language.  The
    oracle reads the original parquet, so equality proves the JSON
    round-trip lossless — including text fields full of quotes and
    escapes, the place naive JSON handling corrupts silently.

    Scale: same verdict as a6 — JSONL is row-oriented with every key
    name repeated per row (~2× CSV bytes), no pruning, no pushdown, no
    stats; schema inference would add a full extra pass, so the schema
    is declared.  The production shape is ONE schema-checked pass that
    lands parquet, then columnar reads forever after."""
    json_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs = spark.read.schema(json_schema).json(_jsonl_dir(spark, sf_dir))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


def zvalue(col_a, col_b):
    """16-bit Morton/Z-value of two 8-bit keys (bit interleave, a
    bits in even positions, b in odd) — pure integer bit arithmetic,
    identical in any engine.  Sorting a table by this single scalar
    co-locates 2-D-adjacent rows, which turns per-row-group min/max
    stats into a 2-D pruning index (the layout trick behind
    Z-ORDER clustering in lakehouse table formats)."""
    z = F.lit(0)
    for i in range(8):
        z = (
            z
            + F.shiftleft(F.shiftright(col_a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(col_b, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


_Z_SQL = " + ".join(
    f"((((l_partkey % 256) >> {i}) & 1) << {2 * i})"
    f" + ((((l_suppkey % 256) >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)


@query(
    "a8_zorder_scan",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           l_partkey % 256 AS pk8, l_suppkey % 256 AS sk8,
           {_Z_SQL} AS zval
    FROM lineitem
    WHERE l_partkey % 256 BETWEEN 10 AND 20
      AND l_suppkey % 256 BETWEEN 30 AND 40
    """,
)
def a8_zorder_scan(spark, sf_dir) -> DataFrame:
    """Z-order (Morton) clustering key + a 2-D box predicate: the
    declared surface of multi-dimensional data layout.  A table sorted
    by ONE column prunes row groups only for predicates on that column;
    interleaving the bits of two keys into a single z-value and sorting
    by it gives BOTH columns compact per-row-group min/max ranges, so
    the same footer-stats machinery prunes 2-D boxes.  The z arithmetic
    is exact integer bit ops — engine-identical by construction.

    100 TB shape: layout is free at write time (one extra sort key on
    the ingest pass, a2/a6's landing write) and pays on every read
    thereafter; the physical effect is proven in pytest by counting
    row groups whose (pk8, sk8) stats intersect the box under a
    z-sorted vs a pk-sorted layout of the same rows
    (tests/test_plans.py::test_zorder_layout_prunes_row_groups)."""
    li = load(spark, sf_dir, "lineitem")
    pk8 = (F.col("l_partkey") % 256).alias("pk8")
    sk8 = (F.col("l_suppkey") % 256).alias("sk8")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            pk8,
            sk8,
            zvalue(F.col("l_partkey") % 256, F.col("l_suppkey") % 256).alias(
                "zval"
            ),
        )
        .filter(F.col("pk8").between(10, 20) & F.col("sk8").between(30, 40))
    )


# ---------------------------------------------------------------------------
# a9 — snapshot time travel: versioned copy-on-write table, as-of read
# ---------------------------------------------------------------------------

def _snapshot_dir(spark, sf_dir) -> str:
    """Build-once-per-(session, sf) versioned orders table: two full
    copy-on-write snapshots partitioned by ``snap`` — snap=0 is the
    base orders state, snap=1 applies a deterministic change set
    (5% price bump on o_orderkey % 7 = 0, delete of % 11 = 0).  The
    layout IS the time-travel mechanism: each snapshot is a partition
    directory, so an as-of read prunes to one snapshot's files at
    plan time (lakehouse table formats do exactly this with manifest
    files instead of directory names)."""
    import atexit
    import os
    import shutil
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(),
        f"bdt_snap_{spark.sparkContext.applicationId}_{tag}",
    )
    if not os.path.isdir(base):
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        v0 = o.withColumn("snap", F.lit(0))
        v1 = (
            o.filter(F.col("o_orderkey") % 11 != 0)
            .select(
                "o_orderkey",
                "o_orderstatus",
                F.when(
                    F.col("o_orderkey") % 7 == 0,
                    F.col("o_totalprice") * 1.05,
                )
                .otherwise(F.col("o_totalprice"))
                .alias("o_totalprice"),
            )
            .withColumn("snap", F.lit(1))
        )
        (
            v0.unionByName(v1)
            .write.mode("overwrite")
            .partitionBy("snap")
            .parquet(base)
        )
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


@query(
    "a9_time_travel",
    oracle="""
    SELECT 0 AS snap, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 1, o_orderstatus, COUNT(*),
           CAST(SUM(CAST(ROUND(
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.05
                    ELSE o_totalprice END * 100) AS BIGINT)) AS BIGINT)
    FROM orders
    WHERE o_orderkey % 11 <> 0
    GROUP BY o_orderstatus
    ORDER BY snap, o_orderstatus
    """,
)
def a9_time_travel(spark, sf_dir) -> DataFrame:
    """Time-travel reads over a VERSIONED table: orders is staged once
    as two full copy-on-write snapshots partitioned by ``snap``
    (snap=1 = deterministic update+delete change set), then each
    snapshot is read AS OF its version and summarized — the
    lakehouse-format reproducibility contract (train a model against
    snapshot N while writers land N+1) expressed with the layout
    machinery Spark already has.  The oracle recomputes both states
    from the raw orders table, proving the staged snapshots are
    byte-faithful, and the parity of BOTH rows proves old versions
    stay intact after new ones land.

    Plan / 100 TB shape: ``snap`` is a PARTITION column, so an as-of
    read is file-level pruning at plan time — `PartitionFilters:
    [isnotnull(snap), (snap = 0)]`, zero data files of other
    snapshots touched (plan-guarded in tests/test_plans.py).  Real
    table formats replace directory-per-version with manifest lists
    (so unchanged files are SHARED between snapshots instead of
    copied); the read path — prune to one snapshot's file set, scan
    only that — is identical.  Sums are exact cents (BIGINT)."""
    snap = spark.read.parquet(_snapshot_dir(spark, sf_dir))
    per_version = []
    for v in (0, 1):
        per_version.append(
            snap.filter(F.col("snap") == v)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("total_cents"),
            )
            .select(
                F.lit(v).alias("snap"), "o_orderstatus", "n", "total_cents"
            )
        )
    return per_version[0].unionByName(per_version[1]).orderBy(
        "snap", "o_orderstatus"
    )


@query(
    "a11_snapshot_diff",
    oracle="""
    WITH v0 AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c0
        FROM orders
    ),
    v1 AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(
                   CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.05
                        ELSE o_totalprice END * 100) AS BIGINT) AS c1
        FROM orders WHERE o_orderkey % 11 <> 0
    ),
    d AS (
        SELECT c0, c1 FROM v0 FULL OUTER JOIN v1 ON v0.k = v1.k
    )
    SELECT CASE WHEN c0 IS NULL THEN 'added'
                WHEN c1 IS NULL THEN 'deleted'
                WHEN c0 <> c1 THEN 'modified'
                ELSE 'unchanged' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(COALESCE(c1, 0) - COALESCE(c0, 0)) AS BIGINT)
               AS cents_delta
    FROM d
    GROUP BY 1
    ORDER BY status
    """,
)
def a11_snapshot_diff(spark, sf_dir) -> DataFrame:
    """DATASET-VERSION DIFF between a9's two staged snapshots: every
    row classified added / deleted / modified / unchanged by primary
    key + content comparison, with the aggregate money delta — the
    audit a training-data pipeline runs before switching snapshot
    versions ('what changed between the dataset I trained on and the
    one I'm about to train on', the data-versioning counterpart of
    j60's dedup report and j63's dataset card).  This change set has
    no adds (v1's keys ⊆ v0's), so the 'added' branch is exercised by
    the oracle's CASE but yields no group row — by design, proven
    equal on both engines.

    Plan / 100 TB shape: ONE full-outer hash join on the primary key
    (both snapshot scans prune to their partition at plan time, snap
    being the partition column) + a four-group aggregate; at scale the
    two versions are bucketed/co-partitioned on the key by the table
    format so the diff is exchange-free, and real formats shortcut
    further by diffing manifest file lists before touching rows.
    Content equality compares exact cents (BIGINT), never floats."""
    snap = spark.read.parquet(_snapshot_dir(spark, sf_dir))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v0 = snap.filter(F.col("snap") == 0).select(
        F.col("o_orderkey").alias("k"), cents.alias("c0")
    )
    v1 = snap.filter(F.col("snap") == 1).select(
        F.col("o_orderkey").alias("k"), cents.alias("c1")
    )
    d = v0.join(v1, "k", "full")
    status = (
        F.when(F.col("c0").isNull(), F.lit("added"))
        .when(F.col("c1").isNull(), F.lit("deleted"))
        .when(F.col("c0") != F.col("c1"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        d.select(status.alias("status"), "c0", "c1")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.coalesce(F.col("c1"), F.lit(0))
                - F.coalesce(F.col("c0"), F.lit(0))
            )
            .cast("long")
            .alias("cents_delta"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# a10 — malformed-record ingestion accounting (PERMISSIVE + corrupt column)
# ---------------------------------------------------------------------------

def _corrupt_csv_dir(spark, sf_dir) -> str:
    """Build-once-per-(session, sf) CSV staging of documents with
    DELIBERATE deterministic corruption: every doc_id % 29 == 0 row is
    replaced by a comma-free garbage line (whole-row parse failure),
    every remaining doc_id % 13 == 0 row gets a non-numeric n_chars
    field (single-column type failure, rest of the row salvageable).
    Text fields carry standard CSV quoting (embedded quotes doubled)."""
    import atexit
    import os
    import shutil
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(),
        f"bdt_badcsv_{spark.sparkContext.applicationId}_{tag}",
    )
    if not os.path.isdir(base):
        d = load(spark, sf_dir, "documents")
        quoted = F.concat(
            F.lit('"'),
            F.regexp_replace(F.col("text"), '"', '""'),
            F.lit('"'),
        )
        good = F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            quoted,
            F.col("lang"),
            F.col("source"),
            F.col("n_chars").cast("string"),
        )
        bad_field = F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            quoted,
            F.col("lang"),
            F.col("source"),
            F.concat(F.lit("X"), F.col("doc_id").cast("string")),
        )
        garbage = F.concat(
            F.lit("RAW#"), F.col("doc_id").cast("string"), F.lit("#unparseable")
        )
        line = (
            F.when(F.col("doc_id") % 29 == 0, garbage)
            .when(F.col("doc_id") % 13 == 0, bad_field)
            .otherwise(good)
        )
        d.select(line.alias("value")).write.mode("overwrite").text(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


@query(
    "a10_corrupt_records",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (doc_id % 29 <> 0 AND doc_id % 13 <> 0)
                AS BIGINT) AS n_clean,
           CAST(COUNT(*) FILTER (doc_id % 29 <> 0 AND doc_id % 13 = 0)
                AS BIGINT) AS n_partial,
           CAST(COUNT(*) FILTER (doc_id % 29 = 0) AS BIGINT) AS n_garbage,
           CAST(SUM(n_chars) FILTER (doc_id % 29 <> 0 AND doc_id % 13 <> 0)
                AS BIGINT) AS sum_chars_clean
    FROM documents
    """,
)
def a10_corrupt_records(spark, sf_dir) -> DataFrame:
    """Malformed-record ingestion accounting: read a CSV feed with
    KNOWN deterministic corruption under PERMISSIVE mode with a
    ``_corrupt_record`` column, and report the triage every ingestion
    job owes its operators — clean rows, partially-salvaged rows (one
    bad field, the rest recovered), whole-row garbage, and the clean
    byte total.  The oracle recomputes the same counts from the
    corruption RULES over the pristine table, so parity proves Spark's
    parser classified every injected failure exactly as designed:
    type-failed fields null out just that column (row kept, raw line
    preserved in the corrupt column), comma-free garbage nulls the
    whole row.  This is the operator the survey's ingestion archetype
    needs before any a6-style landing write: bad rows must be COUNTED
    and QUARANTINED (the corrupt column is the quarantine payload),
    never silently dropped.

    Plan / 100 TB shape: one pass, no shuffle before the single global
    aggregate (conditional aggregates, d15 discipline); the corrupt
    column costs nothing on clean rows (NULL) and the raw line on bad
    ones.  FAILFAST is the landing-write alternative when any
    corruption must abort; DROPMALFORMED is the documented
    anti-pattern (silent row loss — exactly what this report makes
    visible)."""
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _corrupt_record string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(_corrupt_csv_dir(spark, sf_dir))
    )
    clean = F.col("_corrupt_record").isNull()
    partial = F.col("_corrupt_record").isNotNull() & F.col("doc_id").isNotNull()
    garbage = F.col("_corrupt_record").isNotNull() & F.col("doc_id").isNull()
    return raw.agg(
        F.sum(clean.cast("long")).alias("n_clean"),
        F.sum(partial.cast("long")).alias("n_partial"),
        F.sum(garbage.cast("long")).alias("n_garbage"),
        F.sum(F.when(clean, F.col("n_chars"))).alias("sum_chars_clean"),
    )
