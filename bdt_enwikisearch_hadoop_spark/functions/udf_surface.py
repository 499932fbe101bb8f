"""§2.L — the Python UDF / UDAF / UDTF surface (SURVEY.md §2.L).

This module is the ONLY place in the engine where row data crosses into
Python — everything else stays JVM-side (SURVEY §7 guiding choice).

Scale notes (100 TB):

* ``l1`` row-at-a-time @udf is deliberately the worst case — it exists
  to exercise the surface; its docstring is the warning.  ~10-100×
  slower than l2's Arrow path for the same logic.
* ``l2`` @pandas_udf ships Arrow record batches to a pooled Python
  worker and evaluates vectorized numpy — the acceptable Python path.
* ``l3`` applyInPandas shuffles on the grouping key, then hands each
  group to pandas whole — group size must fit in worker memory, so key
  cardinality/skew is the scale knob (fine for per-nation groups).
* ``l4`` @udtf generates rows from Python — per-row generator overhead;
  at scale prefer the JVM explode (functions/text_search.tokenize);
  declared here for surface completeness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from ..registry import query
from ..sources import load


@udf(StringType())
def _normalize(s):
    """Deterministic string normalizer: lowercase, strip non-alnum.
    (No type hints on purpose: pyspark's udf-type inference warns on
    plain-Python hints for non-Arrow UDFs.)"""
    import re

    if s is None:
        return None
    return re.sub(r"[^a-z0-9 ]", "", s.lower())


@query(
    "l1_python_udf",
    oracle="""
    SELECT p_partkey,
           regexp_replace(lower(p_name), '[^a-z0-9 ]', '', 'g') AS norm
    FROM part
    """,
)
def l1_python_udf(spark, sf_dir) -> DataFrame:
    """Scalar Python UDF (row-at-a-time — the slow path, see module
    docstring; same semantics as one JVM regexp_replace)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", _normalize(F.col("p_name")).alias("norm"))


@pandas_udf(DoubleType())
def _clipped_log1p(v: pd.Series) -> pd.Series:
    import numpy as np

    return np.log1p(np.clip(v, 0.0, 100.0))


@query(
    "l2_pandas_udf",
    oracle="""
    SELECT event_id,
           ROUND(LN(1 + LEAST(GREATEST(value, 0), 100)), 4) AS feat
    FROM events
    """,
)
def l2_pandas_udf(spark, sf_dir) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow batches, numpy inside).
    Rounding happens JVM-side AFTER the UDF so both engines round the
    identical double."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id", F.round(_clipped_log1p(F.col("value")), 4).alias("feat")
    )


def _group_median(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "c_nationkey": [pdf["c_nationkey"].iloc[0]],
            "median_bal": [pdf["c_acctbal"].median()],
            "n": [len(pdf)],
        }
    )


@query(
    "l3_grouped_median",
    oracle="""
    SELECT c_nationkey,
           ROUND(MEDIAN(c_acctbal), 4) AS median_bal,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
)
def l3_grouped_median(spark, sf_dir) -> DataFrame:
    """UDAF-style exact per-group median via applyInPandas (pandas
    interpolates the even-count middle exactly like DuckDB's MEDIAN).
    Spark 3.4+ has a builtin median — implemented as applyInPandas on
    purpose to exercise the grouped-map surface (SURVEY §2.L)."""
    c = load(spark, sf_dir, "customer")
    out = c.select("c_nationkey", "c_acctbal").groupBy("c_nationkey").applyInPandas(
        _group_median, schema="c_nationkey int, median_bal double, n long"
    )
    return out.select(
        "c_nationkey", F.round("median_bal", 4).alias("median_bal"), "n"
    )


@udtf(returnType="term: string, term_len: bigint")
class _ExplodeTerms:
    """Python UDTF: text → (term, term_len) rows (Spark 4 surface)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for t in text.lower().split(" "):
            yield t, len(t)


@query(
    "l4_python_udtf",
    oracle="""
    SELECT doc_id, CAST(t AS VARCHAR) AS term, LENGTH(t) AS term_len
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
          FROM documents)
    """,
)
def l4_python_udtf(spark, sf_dir) -> DataFrame:
    """UDTF via LATERAL join — Python generator emits (term, len) per
    document (the JVM-side equivalent is functions/text_search.i1)."""
    spark.udtf.register("explode_terms", _ExplodeTerms)
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("l4_documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.term, t.term_len
        FROM l4_documents d, LATERAL explode_terms(d.text) t
        """
    )


@udf(StringType(), useArrow=True)
def _normalize_arrow(s):
    import re

    if s is None:
        return None
    return re.sub(r"[^a-z0-9 ]", "", s.lower())


@query(
    "l5_arrow_udf",
    oracle="""
    SELECT p_partkey,
           regexp_replace(lower(p_name), '[^a-z0-9 ]', '', 'g') AS norm
    FROM part
    """,
)
def l5_arrow_udf(spark, sf_dir) -> DataFrame:
    """The SAME scalar logic as l1 but through Spark 4's Arrow-optimized
    Python UDF (``useArrow=True``): rows cross to Python as Arrow
    batches instead of pickled one-at-a-time — the drop-in mitigation
    when a legacy @udf can't be rewritten as a pandas_udf.  Same
    oracle as l1 (identical semantics, different physical path)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", _normalize_arrow(F.col("p_name")).alias("norm"))


@pandas_udf(DoubleType())
def _midhinge(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: midhinge = (Q1 + Q3) / 2, with the
    quantiles computed by the EXPLICIT (n-1)*q linear-interpolation
    formula (the quantile_cont definition) on the sorted values, so the
    arithmetic matches DuckDB op-for-op instead of trusting
    np.percentile internals."""
    # Arrow-backed arrays arrive read-only — np.sort copies
    x = np.sort(v.to_numpy(dtype="float64"))
    n = len(x)

    def q(p: float) -> float:
        idx = (n - 1) * p
        lo = int(idx)
        if lo == n - 1:
            return float(x[lo])
        # lo*(1-f) + hi*f, NOT lo+(hi-lo)*f: both DuckDB quantile_cont
        # and Spark's builtin percentile use the two-product form, and
        # the one-ulp difference between the forms crosses a FLOOR
        # boundary on real fixture data (nation 22 at sf0.001)
        f = idx - lo
        return float(x[lo] * (1.0 - f) + x[lo + 1] * f)

    return (q(0.25) + q(0.75)) / 2.0


@query(
    "l6_grouped_agg_udf",
    oracle="""
    SELECT c_nationkey,
           FLOOR((quantile_cont(c_acctbal, 0.25)
                  + quantile_cont(c_acctbal, 0.75)) / 2 * 10000) / 10000
               AS midhinge_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def l6_grouped_agg_udf(spark, sf_dir) -> DataFrame:
    """The GROUPED_AGG pandas-UDF surface: a custom aggregate (midhinge
    of account balance) used directly inside ``groupBy().agg`` next to
    builtin aggregates — the true UDAF API (l3 covers the grouped-MAP
    form).  Arrow ships each group's column once; the JVM-side FLOOR
    truncation happens after the UDF so both engines truncate the
    identical double (quantile interpolation is sort-based, hence
    partition-order-insensitive).

    100 TB note: GROUPED_AGG has no partial aggregation — every group's
    full column crosses to Python, so keep it for statistics that
    genuinely need the whole group (quantiles); sums/counts belong in
    builtins (which Spark refuses to mix into the same agg anyway:
    INVALID_PANDAS_UDF_PLACEMENT)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(_midhinge(F.col("c_acctbal")).alias("mh"))
        .select(
            "c_nationkey",
            (F.floor(F.col("mh") * 10000) / 10000).alias("midhinge_bal"),
        )
    )


def _asof_cogroup(events: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    """Shard-level as-of: every user of the shard merged in ONE
    vectorized pd.merge_asof (backward = latest at-or-before, grouped
    by user).  Each order carries its within-user 1-based date rank, so
    the matched order's rank IS the prior-order count — no per-user
    Python loop anywhere."""
    if events.empty:
        return pd.DataFrame(
            {"event_id": pd.Series([], dtype="int64"),
             "asof_date": pd.Series([], dtype="object"),
             "n_prior": pd.Series([], dtype="int64")}
        )
    od = orders.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
    od = od.assign(rank=od.groupby("o_custkey").cumcount() + 1)
    merged = pd.merge_asof(
        events.sort_values("ets", kind="mergesort"),
        od.sort_values("o_orderdate", kind="mergesort"),
        left_on="ets",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        direction="backward",
    )
    n = merged["rank"].fillna(0).to_numpy(dtype="int64")
    dates = merged["o_orderdate"]
    return pd.DataFrame(
        {
            "event_id": merged["event_id"].to_numpy(dtype="int64"),
            "asof_date": [
                d.date() if pd.notna(d) else None for d in dates
            ],
            "n_prior": n,
        }
    )


_ASOF_SHARDS = 32


@query(
    "l7_cogrouped_asof",
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
def l7_cogrouped_asof(spark, sf_dir) -> DataFrame:
    """The COGROUPED applyInPandas surface: events and orders cogrouped
    on a SHARD of user keys, vectorized pandas merge_asof within the
    shard — same result and same oracle as c11's join+aggregate
    formulation (a cross-API parity pair like j13/j21).

    Cogrouping on the raw user key costs ~10 ms of Arrow/Python
    dispatch PER GROUP (measured: 16.9 s for 1500 users at sf0.1 —
    group-per-call overhead, not compute); cogrouping on
    ``user_id % {shards}`` ships whole shards per call and merges all
    of a shard's users in one C-vectorized merge_asof (~1.2 s warm,
    same data).  The same rule governs a 1000-executor run: pick the shard
    count for parallelism × per-task memory, never one Python call per
    key.  Against c11's join the cogroup ships each side once instead
    of materializing |events|x|matching orders| rows before the
    aggregate."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    ev = e.select(
        "event_id", "user_id", F.col("ts2").cast("timestamp_ntz").alias("ets")
    ).withColumn("shard", F.pmod(F.col("user_id"), F.lit(_ASOF_SHARDS)))
    od = o.select("o_custkey", "o_orderdate", "o_orderkey").withColumn(
        "shard", F.pmod(F.col("o_custkey"), F.lit(_ASOF_SHARDS))
    )
    return (
        ev.groupBy("shard")
        .cogroup(od.groupBy("shard"))
        .applyInPandas(
            _asof_cogroup, schema="event_id long, asof_date date, n_prior long"
        )
    )


def _revenue_batches(batches):
    """mapInArrow body: per-batch vectorized revenue without pandas
    conversion — columns stay Arrow arrays end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_linenumber"), rev],
            names=["l_orderkey", "l_linenumber", "revenue"],
        )


@query(
    "l8_arrow_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    """,
)
def l8_arrow_map(spark, sf_dir) -> DataFrame:
    """mapInArrow: the lowest-overhead Python escape hatch — record
    batches cross as raw Arrow (no pandas materialization, no index
    bookkeeping), transformed with pyarrow.compute kernels (C++ SIMD),
    and returned as Arrow.  Completes the §2.L ladder: l1 row-at-a-time
    @udf < l5 Arrow-serialized @udf < l2 pandas_udf < THIS — use it
    when the logic needs a library speaking Arrow natively (tokenizers,
    image codecs — see functions/multimodal.py, which builds on the
    same batch plumbing).

    100 TB shape: a narrow map pass — no shuffle; per-task memory is
    one Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch).
    The per-row arithmetic itself belongs JVM-side (this exact formula
    IS built-in expression work) — l8 exists to pin the API surface
    and its batch shape, not to recommend Python for arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    out = li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).mapInArrow(
        _revenue_batches,
        schema="l_orderkey long, l_linenumber int, revenue double",
    )
    return out.withColumn("revenue", F.round("revenue", 4))


def _flag_stats_arrow(table):
    """Per-group exact stats computed with pyarrow.compute kernels —
    runs once per (returnflag) group, receives the whole group as ONE
    Arrow table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    qty = table.column("l_quantity")
    return pa.table(
        {
            "l_returnflag": [table.column("l_returnflag")[0].as_py()],
            "n": [table.num_rows],
            "sum_qty": [pc.sum(qty).as_py()],
            "max_qty": [pc.max(qty).as_py()],
        }
    )


@query(
    "l9_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def l9_apply_in_arrow(spark, sf_dir) -> DataFrame:
    """``groupBy().applyInArrow`` — the Spark 4 grouped-map variant
    that hands each group to Python as a single Arrow TABLE (no pandas
    conversion; l8's zero-copy batch story, now with grouping).  The
    right surface when grouped logic needs an Arrow-native library
    (per-group tokenizer runs, per-entity model scoring); for plain
    stats like these the JVM aggregate is strictly better — this key
    pins the API and verifies the Arrow path agrees with the exact SQL
    aggregate bit-for-bit on counts/max (sum re-rounded 4dp).

    100 TB shape: one shuffle on the group key, then each group
    materializes as one Arrow table in the Python worker — group size
    is the memory bound, so keys must be finer than executor memory
    (here 3 flags is the DEMO of the API, not the recommended
    cardinality; cogrouped/windowed variants shard further, see l7)."""
    li = load(spark, sf_dir, "lineitem")
    out = li.select("l_returnflag", "l_quantity").groupBy(
        "l_returnflag"
    ).applyInArrow(
        _flag_stats_arrow,
        schema="l_returnflag string, n long, sum_qty double, max_qty double",
    )
    return out.withColumn("sum_qty", F.round("sum_qty", 4))


# ---------------------------------------------------------------------------
# l10 — Unicode NFC normalization (a GENUINE builtin gap: the right UDF)
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def _nfc_normalize(s: pd.Series) -> pd.Series:
    """Arrow-batched NFC normalization via Python's unicodedata —
    vectorized at the batch level, stdlib-exact per the Unicode
    standard."""
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)


@query(
    "l10_unicode_normalize",
    oracle="""
    WITH dec AS (
        SELECT doc_id,
               replace(text, 'e', 'e' || chr(769)) AS raw
        FROM documents
    )
    SELECT doc_id,
           length(raw) AS len_decomposed,
           length(nfc_normalize(raw)) AS len_nfc,
           md5(nfc_normalize(raw)) AS h
    FROM dec
    ORDER BY doc_id
    """,
)
def l10_unicode_normalize(spark, sf_dir) -> DataFrame:
    """Unicode NFC normalization — the one text-pipeline stage where a
    Python UDF is the RIGHT answer, not the measured anti-example:
    Spark has no builtin Unicode normalizer (l1's docstring warns
    against row-Python where a builtin exists; here none does), so the
    pandas UDF ships Arrow batches to stdlib ``unicodedata``.  Every
    real multilingual corpus mixes precomposed (é) and decomposed
    (e + U+0301) encodings of identical text — unnormalized, they hash
    differently and j1/j8-style dedup silently misses duplicates, so
    NFC runs FIRST in CCNet/OSCAR-style pipelines.  The fixture is
    pure ASCII (normalization would be vacuous), so the key first
    derives a decomposed column deterministically (every 'e' becomes
    e + combining acute); the md5 of the normalized text then proves
    BYTE-IDENTICAL normalization against DuckDB's native
    nfc_normalize — stdlib Python vs DuckDB's utf8proc, two
    independent Unicode implementations agreeing on every document.

    100 TB shape: a shuffle-free map stage — Arrow batches through a
    pooled Python worker (l2's physics, ~10-100× over row-Python);
    cost is one pass over text bytes.  The codepoint-length delta
    (len_decomposed − len_nfc) is exactly the combining-mark count
    folded away."""
    d = load(spark, sf_dir, "documents")
    # decomposed replacement: "e" + U+0301 COMBINING ACUTE, spelled as an
    # escape so no editor/normalizer can silently precompose the source
    raw = F.regexp_replace(F.col("text"), "e", "e\u0301")
    dec = d.select("doc_id", raw.alias("raw"))
    nfc = _nfc_normalize(F.col("raw"))
    return (
        dec.select(
            "doc_id",
            F.length("raw").cast("long").alias("len_decomposed"),
            F.length(nfc).cast("long").alias("len_nfc"),
            F.md5(nfc).alias("h"),
        )
        .orderBy("doc_id")
    )
