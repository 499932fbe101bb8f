"""§2.I — text/search core: tokenize → TF → DF → TF-IDF → inverted
index → ranked query (SURVEY.md §2.I).  This IS the reference's domain:
the reconstructed enwikisearch MR job chain re-expressed as one lazy
DataFrame pipeline — what took the reference N chained Hadoop jobs with
HDFS round-trips between them is here a single Catalyst plan.

Scale notes (100 TB):

* ``i1`` explodes documents into ~50× more token rows, but it is a
  pipelined flatMap — no shuffle, no materialization.
* TF (``i2``) shuffles on (doc_id, term) with map-side partial
  aggregation (the reference's combiner, for free).
* DF (``i3``) aggregates on term — stopword terms are heavy hitters;
  partial aggregation collapses them per-partition first, and AQE's
  skew handling splits any oversized reducer partition.  For a real 100 TB
  corpus you'd additionally drop the top-p stopwords before the DF
  shuffle (they carry no ranking signal: idf→0).
* The query side (``i6``/``i7``) filters the TF table to the handful of
  query terms FIRST (predicate on term, pushed to the scan of a
  persisted TF/index table), so the scoring join touches a tiny slice;
  top-k is TakeOrderedAndProject (per-task heaps, no global sort).
* The inverted index (``i5``) is the materialized artifact: written
  partitioned/bucketed by term it serves point lookups with partition
  pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import query
from ..sources import load, materialized

#: fixed conjunctive/disjunctive query of SURVEY §2.I (both terms are
#: frequent in the fixture vocabulary, so ranking is well-exercised).
QUERY_TERMS = ("spark", "join")

# ---------------------------------------------------------------------------
# shared DataFrame builders (the pipeline stages, reused by §2.J too)
# ---------------------------------------------------------------------------


def tokenize(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term): normalize + split + posexplode."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "term"),
    )


def term_freq(tok: DataFrame) -> DataFrame:
    """(doc_id, term, tf)"""
    return tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_freq(tok: DataFrame) -> DataFrame:
    """(term, dfc) — number of distinct docs containing the term."""
    return tok.groupBy("term").agg(F.countDistinct("doc_id").alias("dfc"))


def _tfidf_from(tf: DataFrame, n: DataFrame) -> DataFrame:
    """The ONE spelling of wt = tf * ln(N / df) over a (doc_id, term,
    tf) frame and a single-row (nd) count — both tfidf() and the
    materialized tfidf_w() route through this, so the weight formula
    cannot drift between the ad-hoc and persisted-index paths."""
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    return (
        tf.join(df, "term")
        .join(F.broadcast(n))  # single-row scalar: broadcast, never collect
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("nd").cast("double") / F.col("dfc"))).alias("wt"),
        )
    )


def tfidf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, wt) with wt = tf * ln(N / df) — unrounded.

    DF is derived from the aggregated TF pairs (already one row per
    (doc, term)), NOT by re-tokenizing: one explode instead of two, no
    countDistinct expand, and the TF exchange is reused by both
    branches (ReusedExchange in the physical plan)."""
    return _tfidf_from(
        term_freq(tokenize(docs)),
        docs.agg(F.count(F.lit(1)).alias("nd")),
    )


def tfidf_w(spark, sf_dir: str) -> DataFrame:
    """MATERIALIZED tf-idf weight table (doc_id, term, wt) — the
    persisted-index boundary every §2.I retrieval key reads (i35's
    localCheckpoint discipline promoted to the shared build-once /
    serve-many layer, like j8's shingle sidecar).  Built FROM the
    materialized ``doc_term_tf`` token table so the corpus is tokenized
    once per session across the whole i/j family; the weight formula is
    the SAME CODE as :func:`tfidf` (both route through
    :func:`_tfidf_from`), so every consumer's values are unchanged by
    construction — only the plan under it shrinks to a checkpoint
    scan."""
    from .llm_scale import doc_term_tf

    def build() -> DataFrame:
        return _tfidf_from(
            doc_term_tf(spark, sf_dir),
            load(spark, sf_dir, "documents").agg(
                F.count(F.lit(1)).alias("nd")
            ),
        )

    return materialized(spark, sf_dir, "tfidf_w", build)


def doc_norms(spark, sf_dir: str) -> DataFrame:
    """MATERIALIZED per-document L2 norms (doc_id, nrm) over the tf-idf
    weight table — the norm sidecar index_store persists next to the
    postings (norms change only when a document changes), shared by the
    VSM-cosine rankers (i17/i25/i31) instead of each re-aggregating the
    corpus-wide weight table."""
    return materialized(
        spark,
        sf_dir,
        "doc_norms",
        lambda: tfidf_w(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")),
    )


# ---------------------------------------------------------------------------
# shared oracle CTE: positional tokenization in DuckDB 1.0 (no
# UNNEST WITH ORDINALITY there — list_zip against range() instead)
# ---------------------------------------------------------------------------

_TOK_CTE = """
    tok AS (
        SELECT doc_id, CAST(z[2] AS INT) AS pos, CAST(z[1] AS VARCHAR) AS term
        FROM (SELECT doc_id, unnest(list_zip(toks, range(len(toks)))) AS z
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                    FROM documents))
    )
"""

_TFIDF_CTES = (
    _TOK_CTE
    + """,
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS dfc FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    w AS (SELECT tf.doc_id, tf.term, tf.tf * LN(nd * 1.0 / dfc) AS wt
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
"""
)


@query(
    "i1_tokenize",
    oracle=f"WITH {_TOK_CTE} SELECT doc_id, pos, term FROM tok",
)
def i1_tokenize(spark, sf_dir) -> DataFrame:
    return tokenize(load(spark, sf_dir, "documents"))


@query(
    "i2_term_freq",
    oracle=f"WITH {_TOK_CTE} "
    "SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term",
)
def i2_term_freq(spark, sf_dir) -> DataFrame:
    from .llm_scale import doc_term_tf

    return doc_term_tf(spark, sf_dir)


@query(
    "i3_doc_freq",
    oracle=f"WITH {_TOK_CTE} "
    "SELECT term, COUNT(DISTINCT doc_id) AS dfc FROM tok GROUP BY term",
)
def i3_doc_freq(spark, sf_dir) -> DataFrame:
    # DF = row count per term of the materialized (doc, term, tf) table
    # — one row per (doc, term) by construction, so COUNT(*) there is
    # COUNT(DISTINCT doc_id) over the token stream without the
    # count-distinct expand.
    from .llm_scale import doc_term_tf

    return (
        doc_term_tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("dfc"))
    )


@query(
    "i4_tfidf",
    oracle=f"WITH {_TFIDF_CTES} "
    "SELECT doc_id, term, ROUND(wt, 4) AS weight FROM w",
)
def i4_tfidf(spark, sf_dir) -> DataFrame:
    """Declared formula: weight = tf * ln(N / df), rounded 4dp."""
    return tfidf_w(spark, sf_dir).select(
        "doc_id", "term", F.round("wt", 4).alias("weight")
    )


@query(
    "i5_inverted_index",
    oracle=f"WITH {_TOK_CTE} "
    """
    SELECT term, COUNT(*) AS df_count, list_sort(list(doc_id)) AS postings
    FROM (SELECT DISTINCT doc_id, term FROM tok)
    GROUP BY term
    """,
)
def i5_inverted_index(spark, sf_dir) -> DataFrame:
    """term → sorted postings list.  This is the artifact the reference
    persisted to HDFS; here it would be written bucketed by term
    (collect_list order is nondeterministic → array_sort, §2.0 rule 3).
    Served from the materialized (doc, term, tf) table — one row per
    (doc, term) by construction, so the distinct-pairs stage is a
    checkpoint projection."""
    from .llm_scale import doc_term_tf

    pairs = doc_term_tf(spark, sf_dir).select("doc_id", "term")
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_count"),
        F.array_sort(F.collect_list("doc_id")).alias("postings"),
    )


def _search(spark, sf_dir, conjunctive: bool) -> DataFrame:
    w = tfidf_w(spark, sf_dir).filter(F.col("term").isin(*QUERY_TERMS))
    scored = w.groupBy("doc_id").agg(
        F.round(F.sum("wt"), 4).alias("score"),
        F.countDistinct("term").alias("nterms"),
    )
    if conjunctive:
        scored = scored.filter(F.col("nterms") == len(QUERY_TERMS))
    return (
        scored.select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


@query(
    "i6_search_and",
    oracle=f"WITH {_TFIDF_CTES} "
    f"""
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM w WHERE term IN ({_TERMS_SQL})
    GROUP BY doc_id
    HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}
    ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
    LIMIT 10
    """,
)
def i6_search_and(spark, sf_dir) -> DataFrame:
    """THE flagship: conjunctive ranked retrieval — docs containing ALL
    query terms, scored by summed TF-IDF, top-10 with doc_id tiebreak."""
    return _search(spark, sf_dir, conjunctive=True)


@query(
    "i7_search_or",
    oracle=f"WITH {_TFIDF_CTES} "
    f"""
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM w WHERE term IN ({_TERMS_SQL})
    GROUP BY doc_id
    ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
    LIMIT 10
    """,
)
def i7_search_or(spark, sf_dir) -> DataFrame:
    """Disjunctive ranked retrieval — ANY query term."""
    return _search(spark, sf_dir, conjunctive=False)


#: fixed phrase for i8 — a frequent fixture bigram.
PHRASE = ("table", "hash")


@query(
    "i8_phrase_bigram",
    oracle=f"WITH {_TOK_CTE} "
    f"""
    SELECT a.doc_id, COUNT(*) AS n_occurrences
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
    GROUP BY a.doc_id
    """,
)
def i8_phrase_bigram(spark, sf_dir) -> DataFrame:
    """Positional phrase query: adjacency via self-join on (doc, pos+1).
    At scale both sides are pre-filtered to the two phrase terms before
    the join, so the shuffle carries only candidate positions."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    a = tok.filter(F.col("term") == PHRASE[0]).alias("a")
    b = tok.filter(F.col("term") == PHRASE[1]).alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


@query(
    "i9_corpus_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(len(string_split(lower(text), ' '))), 4) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def i9_corpus_stats(spark, sf_dir) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.lower(F.col("text")), " "))), 4).alias(
            "avg_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# i10 — BM25 ranked retrieval (Okapi, k1=1.2 b=0.75)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "i10_bm25",
    oracle=f"WITH {_TOK_CTE}, "
    f"""
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS nd, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term)
    SELECT tf.doc_id,
           FLOOR(SUM(
               LN(1 + (nd - dfc + 0.5) / (dfc + 0.5))
               * tf * ({_BM25_K1} + 1)
               / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
           ) * 10000) / 10000 AS score
    FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id
    LIMIT 10
    """,
)
def i10_bm25(spark, sf_dir) -> DataFrame:
    """Okapi BM25 top-10 for the fixed disjunctive query — the ranking
    function that superseded raw TF-IDF in every production search
    engine.  Same skeleton as i6/i7 (filter the TF table to the query
    terms FIRST, so the scoring join touches a tiny slice; N/avgdl is a
    single broadcast row, never a collect), plus a join back to the
    per-doc length table for the length normalization.  Score is
    FLOOR-truncated at 4dp (avgdl division → engine-specific last-ulp;
    §2.0 rule 1 / playbook FLOOR trick)."""
    docs = load(spark, sf_dir, "documents")
    tok = tokenize(docs)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("nd"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    idf = F.log(
        1
        + (F.col("nd") - F.col("dfc") + F.lit(0.5)) / (F.col("dfc") + F.lit(0.5))
    )
    s = (
        idf
        * F.col("tf")
        * F.lit(_BM25_K1 + 1)
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (
                F.lit(1 - _BM25_B)
                + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
            )
        )
    )
    return (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg((F.floor(F.sum(s) * 10000) / 10000).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


@query(
    "i11_proximity",
    oracle=f"WITH {_TOK_CTE} "
    f"""
    SELECT a.doc_id, COUNT(*) AS n_windows
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id
     AND b.pos - a.pos BETWEEN 1 AND 5
    WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
    GROUP BY a.doc_id
    """,
)
def i11_proximity(spark, sf_dir) -> DataFrame:
    """Proximity search: '{PHRASE[0]} ... {PHRASE[1]}' within a 5-token
    window (ordered).  Same pre-filtered positional self-join as i8 —
    both sides collapse to just the two query terms' postings before
    the join, so the range predicate runs on a tiny slice; never a
    positions × positions cross product over the corpus."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    a = tok.filter(F.col("term") == PHRASE[0]).alias("a")
    b = tok.filter(F.col("term") == PHRASE[1]).alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).between(1, 5),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )


@query(
    "i12_vocab_prune",
    oracle=f"WITH {_TOK_CTE}, "
    """
    dfreq AS (
        SELECT term, COUNT(DISTINCT doc_id) AS dfc FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT term, dfc,
           FLOOR(LN(nd * 1.0 / dfc) * 10000) / 10000 AS idf,
           dfc * 1.0 / nd <= 0.78 AS kept
    FROM dfreq CROSS JOIN n
    """,
)
def i12_vocab_prune(spark, sf_dir) -> DataFrame:
    """Stopword/top-p vocabulary pruning — the documented 100 TB
    optimization (SCALE.md 'Skew') as a runnable operator: terms in
    >78% of documents carry near-zero idf and dominate the token
    stream, so a real corpus run drops them BEFORE the DF shuffle;
    this query computes the keep/drop verdict + idf per term.  One
    aggregate over distinct (doc, term) pairs; the corpus size is a
    broadcast scalar."""
    docs = load(spark, sf_dir, "documents")
    dfreq = doc_freq(tokenize(docs))
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    return (
        dfreq.join(F.broadcast(n))
        .select(
            "term",
            "dfc",
            (
                F.floor(F.log(F.col("nd") * F.lit(1.0) / F.col("dfc")) * 10000)
                / 10000
            ).alias("idf"),
            (F.col("dfc") * F.lit(1.0) / F.col("nd") <= 0.78).alias("kept"),
        )
    )


#: fixed exclusion term for i13 — frequent in the fixture vocabulary,
#: so the NOT clause prunes a meaningful share of candidates.
EXCLUDE_TERM = "window"


@query(
    "i13_search_not",
    oracle=f"WITH {_TFIDF_CTES} "
    f"""
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM w WHERE term IN ({_TERMS_SQL})
      AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tok
                         WHERE term = '{EXCLUDE_TERM}')
    GROUP BY doc_id
    HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}
    ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
    LIMIT 10
    """,
)
def i13_search_not(spark, sf_dir) -> DataFrame:
    """Boolean NOT retrieval: docs containing ALL query terms and NONE
    of the excluded term, ranked by summed TF-IDF.  The exclusion is a
    LEFT ANTI join against the excluded term's postings — at scale that
    posting list is one index row (a filtered scan), never a second
    corpus pass; the anti join shuffles only candidate doc_ids."""
    from .llm_scale import doc_term_tf

    w = tfidf_w(spark, sf_dir).filter(F.col("term").isin(*QUERY_TERMS))
    # one row per (doc, term) by construction — already distinct
    excluded = (
        doc_term_tf(spark, sf_dir)
        .filter(F.col("term") == EXCLUDE_TERM)
        .select("doc_id")
    )
    scored = (
        w.join(excluded, "doc_id", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("wt"), 4).alias("score"),
            F.countDistinct("term").alias("nterms"),
        )
        .filter(F.col("nterms") == len(QUERY_TERMS))
    )
    return (
        scored.select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


@query(
    "i14_snippet",
    oracle=f"WITH {_TFIDF_CTES}, "
    f"""
    top AS (
        SELECT doc_id, ROUND(SUM(wt), 4) AS score
        FROM w WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id
        HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}
        ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
        LIMIT 10
    )
    SELECT t.doc_id, t.score,
           CAST(strpos(lower(d.text), '{QUERY_TERMS[0]}') AS BIGINT) AS hit_pos,
           substr(d.text,
                  GREATEST(strpos(lower(d.text), '{QUERY_TERMS[0]}') - 20, 1),
                  60) AS snippet
    FROM top t JOIN documents d USING (doc_id)
    """,
)
def i14_snippet(spark, sf_dir) -> DataFrame:
    """Result highlighting: the i6 top-10 joined back to the corpus for
    the first-occurrence offset of the lead query term and a ±-context
    snippet — the search-UX half of ranked retrieval (1-based locate/
    substring semantics are identical in both engines).

    100 TB shape: snippets are computed ONLY for the k result rows —
    the top-10 doc_ids broadcast against the corpus scan, so the text
    payload of non-hits never leaves the scan, and nothing but the k
    snippet strings reaches the driver."""
    docs = load(spark, sf_dir, "documents")
    top = _search(spark, sf_dir, conjunctive=True)  # i6's top-10
    lead = QUERY_TERMS[0]
    pos = F.locate(lead, F.lower(F.col("text")))
    return (
        F.broadcast(top)
        .join(docs, "doc_id")
        .select(
            "doc_id",
            "score",
            pos.cast("long").alias("hit_pos"),
            F.expr(
                f"substring(text, GREATEST(locate('{lead}', lower(text)) - 20, 1), 60)"
            ).alias("snippet"),
        )
    )


#: fixed misspelling for i15 — 'sprak' is edit-distance 2 from 'spark'
#: (transposition = 2 single-char edits under plain levenshtein).
MISSPELLED = "sprak"


@query(
    "i15_did_you_mean",
    oracle=f"WITH {_TOK_CTE}, "
    f"""
    vocab AS (
        SELECT term, COUNT(DISTINCT doc_id) AS dfc
        FROM tok GROUP BY term
    )
    SELECT term, CAST(levenshtein(term, '{MISSPELLED}') AS BIGINT) AS dist, dfc
    FROM vocab
    WHERE levenshtein(term, '{MISSPELLED}') <= 2
    ORDER BY dist, dfc DESC, term
    LIMIT 5
    """,
)
def i15_did_you_mean(spark, sf_dir) -> DataFrame:
    """'Did you mean': closest vocabulary terms to a misspelled query
    term, ranked by edit distance then document frequency — the query-
    correction feature every search frontend needs.

    100 TB shape: the candidate set is the VOCABULARY (distinct terms —
    thousands-to-millions of rows, corpus-size-independent after the DF
    aggregate), not the corpus; the levenshtein scan rides the tiny
    vocab table and ends in a top-k heap.  A production variant prunes
    by length band / first-char buckets before the distance call —
    same plan shape with one extra pushed filter."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    vocab = doc_freq(tok)  # (term, dfc)
    return (
        vocab.select(
            "term",
            F.levenshtein(F.col("term"), F.lit(MISSPELLED))
            .cast("long")
            .alias("dist"),
            "dfc",
        )
        .filter(F.col("dist") <= 2)
        .orderBy("dist", F.col("dfc").desc(), "term")
        .limit(5)
    )


#: fixed prefix for the wildcard query (matches a small term family in
#: the fixture vocabulary: stream, st...)
PREFIX = "st"


@query(
    "i16_prefix_search",
    oracle=f"WITH {_TOK_CTE} "
    f"""
    SELECT doc_id,
           COUNT(DISTINCT term) AS n_terms,
           COUNT(*) AS total_tf
    FROM tok
    WHERE term LIKE '{PREFIX}%'
    GROUP BY doc_id
    ORDER BY total_tf DESC, doc_id
    LIMIT 10
    """,
)
def i16_prefix_search(spark, sf_dir) -> DataFrame:
    """Wildcard PREFIX retrieval (`st*`): docs ranked by total
    occurrences of any term starting with the prefix, top-10 with
    doc_id tiebreak (integer score — no float determinism caveats).

    100 TB shape: the prefix predicate belongs on the TERM DIMENSION,
    not the corpus — against i5's persisted inverted index (sorted /
    bucketed by term) a prefix is a contiguous index range scan whose
    postings are unioned; the raw corpus is never rescanned.  Here the
    tokenized stream is filtered before the doc_id aggregate, so the
    shuffle carries only prefix-matching occurrences; StartsWith
    compiles to a codegen'd comparison riding the scan."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    return (
        tok.filter(F.col("term").startswith(PREFIX))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .orderBy(F.col("total_tf").desc(), "doc_id")
        .limit(10)
    )


@query(
    "i17_vsm_cosine",
    oracle=f"WITH {_TFIDF_CTES} "
    f"""
    , norms AS (
        SELECT doc_id, SQRT(SUM(wt * wt)) AS nrm FROM w GROUP BY doc_id
    ),
    hits AS (
        SELECT doc_id, SUM(wt) AS qdot
        FROM w WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id
        HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}
    )
    SELECT h.doc_id,
           FLOOR(h.qdot / n.nrm * 10000) / 10000 AS score
    FROM hits h JOIN norms n USING (doc_id)
    ORDER BY score DESC, doc_id
    LIMIT 10
    """,
)
def i17_vsm_cosine(spark, sf_dir) -> DataFrame:
    """Vector-space-model ranked retrieval: cosine between the binary
    query vector and each document's tf-idf vector — the classic
    length-NORMALIZED ranking (i6 ranks by raw summed weight, which
    favors long documents; BM25 (i10) normalizes differently).  Score
    = Σ_{{t∈Q}} w(t,d) / ‖d‖, conjunctive semantics, top-10 on the
    4dp-floored score with doc_id tiebreak.

    100 TB shape: document norms are a PER-DOC aggregate over the
    weight table — corpus-shaped but computed once and persisted
    alongside i5's index in production (norms change only when the
    doc changes); the query-time join then touches |Q| postings lists
    + a doc-keyed norm lookup, never the corpus.  Here both sides
    derive from the same tfidf stage so Catalyst reuses the exchange."""
    w = tfidf_w(spark, sf_dir)
    norms = doc_norms(spark, sf_dir)
    hits = (
        w.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id")
        .agg(
            F.sum("wt").alias("qdot"),
            F.countDistinct("term").alias("nterms"),
        )
        .filter(F.col("nterms") == len(QUERY_TERMS))
    )
    score = F.col("qdot") / F.col("nrm")
    return (
        hits.join(norms, "doc_id")
        .select(
            "doc_id", (F.floor(score * 10000) / 10000).alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i18 — arbitrary-length phrase search over a positional index
# ---------------------------------------------------------------------------

#: fixed 3-token phrase — present at EVERY fixture scale (so the parity
#: test never passes on an empty result set), with multi-occurrence docs
#: at sf0.1 exercising the per-doc occurrence count.
PHRASE3 = ("join", "part", "filter")


@query(
    "i18_phrase_positional",
    oracle=f"WITH {_TOK_CTE} "
    f"""
    SELECT a.doc_id, COUNT(*) AS n_occurrences
    FROM tok a
    JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    WHERE a.term = '{PHRASE3[0]}' AND b.term = '{PHRASE3[1]}'
      AND c.term = '{PHRASE3[2]}'
    GROUP BY a.doc_id
    """,
)
def i18_phrase_positional(spark, sf_dir) -> DataFrame:
    """Arbitrary-length phrase query evaluated the way a POSITIONAL
    inverted index serves it: one postings row (term, doc_id,
    positions[]) per query term, doc-keyed equi-joins between the k
    postings lists, then the adjacency check runs IN-ROW over the
    position arrays with higher-order functions — no per-position
    join rows, unlike i8's row-level self-join (the right plan for a
    2-term phrase, but k-1 position-level shuffles for a k-term one).

    Plan: tokenize → filter to the query terms BEFORE any shuffle —
    Catalyst pushes each branch's single-term predicate below its
    postings groupBy, so every exchange carries ONE term's positions
    (|docs-with-term| rows, never the corpus), and the doc-keyed joins
    between the three postings slices are BroadcastHashJoins.
    ``size(filter(p0, p -> contains(p1,p+1) && contains(p2,p+2)))``
    counts occurrences JVM-side.  At 100 TB the postings come from the
    persisted i5-style index (term-pruned scan), so query cost is
    3 postings lists + 2 small joins, independent of corpus size."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    posting = (
        tok.filter(F.col("term").isin(*PHRASE3))
        .groupBy("term", "doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
    )
    p0 = posting.filter(F.col("term") == PHRASE3[0]).select("doc_id", F.col("ps").alias("p0"))
    p1 = posting.filter(F.col("term") == PHRASE3[1]).select("doc_id", F.col("ps").alias("p1"))
    p2 = posting.filter(F.col("term") == PHRASE3[2]).select("doc_id", F.col("ps").alias("p2"))
    n = F.size(
        F.expr(
            "filter(p0, p -> array_contains(p1, p + 1) "
            "AND array_contains(p2, p + 2))"
        )
    )
    return (
        p0.join(p1, "doc_id")
        .join(p2, "doc_id")
        .select("doc_id", n.alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


# ---------------------------------------------------------------------------
# i20 — query-likelihood ranking with Dirichlet smoothing (Zhai &
# Lafferty 2001; the classic LM-based alternative to BM25/VSM)
# ---------------------------------------------------------------------------

_QL_MU = 100  # Dirichlet prior mass; ~fixture mean doc length


@query(
    "i20_query_likelihood",
    oracle=f"WITH {_TOK_CTE}, "
    f"""
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS ctot FROM tok),
    qstats AS (SELECT term, COUNT(*) AS cf FROM tok
               WHERE term IN ({_TERMS_SQL}) GROUP BY term),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term),
    cand AS (SELECT DISTINCT doc_id FROM tf)
    SELECT cand.doc_id,
           FLOOR(SUM(LN((COALESCE(tf.tf, 0) + {_QL_MU} * cf / ctot)
                        / (dl + {_QL_MU}))) * 10000) / 10000 AS score
    FROM cand
    CROSS JOIN qstats
    CROSS JOIN corpus
    JOIN dl USING (doc_id)
    LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = qstats.term
    GROUP BY cand.doc_id
    ORDER BY score DESC, cand.doc_id
    LIMIT 10
    """,
)
def i20_query_likelihood(spark, sf_dir) -> DataFrame:
    """Query-likelihood ranked retrieval with Dirichlet smoothing:
    score(d) = Σ_{t∈Q} ln( (tf_{t,d} + μ·cf_t/|C|) / (|d| + μ) ),
    disjunctive candidates (≥1 query term), top-10, 4dp-floored score
    with doc_id tiebreak.  Docs NOT containing a query term still pay
    that term's smoothed probability — the zero-tf contribution — so
    candidates are crossed with the per-term stats and tf left-joined.

    Plan: term stats (cf per query term, corpus size, per-doc length)
    are aggregates of the one tokenize pass; cf/ctot is a |Q|-row
    table and the corpus total a single-row scalar — both BROADCAST,
    never collected.  The only corpus-shaped shuffles are the tf and
    dl aggregations (at 100 TB both live precomputed beside the i5
    index; dl is the same per-doc stat BM25 needs).  The candidate ×
    query-term expansion is |cand|·|Q| rows — query-shaped, tiny."""
    docs = load(spark, sf_dir, "documents")
    tok = tokenize(docs)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = tok.agg(F.count(F.lit(1)).alias("ctot"))
    qtok = tok.filter(F.col("term").isin(*QUERY_TERMS))
    qstats = qtok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cand = tf.select("doc_id").distinct()
    contrib = F.log(
        (F.coalesce(F.col("tf"), F.lit(0))
         + F.lit(_QL_MU) * F.col("cf") / F.col("ctot"))
        / (F.col("dl") + F.lit(_QL_MU))
    )
    return (
        cand.join(F.broadcast(qstats))
        .join(F.broadcast(corpus))
        .join(dl, "doc_id")
        .join(tf, ["doc_id", "term"], "left")
        .groupBy("doc_id")
        .agg((F.floor(F.sum(contrib) * 10000) / 10000).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i21 — postings delta-gap compression accounting (index compression)
# ---------------------------------------------------------------------------


@query(
    "i21_postings_delta",
    oracle=f"WITH {_TOK_CTE}, "
    """
    posting AS (SELECT DISTINCT term, doc_id FROM tok),
    gaps AS (
        SELECT term,
               doc_id - COALESCE(lag(doc_id) OVER w, 0) AS gap
        FROM posting
        WINDOW w AS (PARTITION BY term ORDER BY doc_id)
    )
    SELECT term,
           COUNT(*) AS df,
           COUNT(*) * 8 AS raw_bytes,
           CAST(SUM((length(bin(gap)) + 6) // 7) AS BIGINT) AS vlq_bytes,
           FLOOR(COUNT(*) * 8 * 10000.0
                 / SUM((length(bin(gap)) + 6) // 7)) / 10000 AS ratio
    FROM gaps
    GROUP BY term
    """,
)
def i21_postings_delta(spark, sf_dir) -> DataFrame:
    """Inverted-index compression accounting: delta-gap encode each
    term's sorted postings list (store the first doc id absolute, then
    successive differences) and cost it under VLQ/varint framing — the
    classic index compression every production search engine applies,
    reported per term as raw (8 B/posting) vs encoded bytes and the
    compression ratio.  Bit widths come from ``length(bin(gap))`` —
    an exact INTEGER path in both engines, never float log2 (whose
    3.999… artifacts misround exact powers of two).

    Plan: the posting pairs come from the materialized (doc, term, tf)
    table (one row per (doc, term) — no distinct exchange needed); the
    lag window partitions on term and the final per-term aggregate
    reuses the window's sorted partitions (one exchange beyond the
    checkpoint scan).  At 100 TB
    this runs beside the i5 index build and its output IS the storage
    layout decision: gaps shrink as postings densify, so hot terms
    compress best exactly when their lists are longest."""
    from .llm_scale import doc_term_tf

    return postings_delta(doc_term_tf(spark, sf_dir).select("term", "doc_id"))


def postings_delta(posting: DataFrame) -> DataFrame:
    """i21's core over any distinct (term, doc_id) frame — separated so
    property tests can drive it with generated posting sets."""
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = posting.withColumn(
        "gap", F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0))
    )
    vlq = (F.length(F.bin(F.col("gap"))) + 6).cast("long") / 7
    return gaps.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        (F.count(F.lit(1)) * 8).alias("raw_bytes"),
        F.sum(F.floor(vlq)).alias("vlq_bytes"),
        (
            F.floor(
                F.count(F.lit(1)) * 8 * 10000.0 / F.sum(F.floor(vlq))
            )
            / 10000
        ).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# i19 — suffix-stripping stemmer (Porter step-1 subset)
# ---------------------------------------------------------------------------

#: inflection suffixes appended to every vocabulary term IN-QUERY so
#: the stemmer has real work at any fixture scale (the fixture
#: vocabulary itself is all base forms): '' keeps the base form as its
#: own surface.
_STEM_SUFFIXES = ("", "s", "es", "ies", "ing", "ed")


@query(
    "i19_stemming",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS base
        FROM documents
    ),
    surf AS (
        SELECT base, base || sfx AS surface
        FROM vocab
        CROSS JOIN (SELECT unnest(
            [{", ".join(repr(s) for s in _STEM_SUFFIXES)}]) AS sfx)
    ),
    stemmed AS (
        SELECT surface,
               CASE
                   WHEN surface LIKE '%sses' THEN
                       left(surface, length(surface) - 2)
                   WHEN surface LIKE '%ies' THEN
                       left(surface, length(surface) - 2)
                   WHEN surface LIKE '%ing' AND length(surface) > 5 THEN
                       left(surface, length(surface) - 3)
                   WHEN surface LIKE '%ed' AND length(surface) > 4 THEN
                       left(surface, length(surface) - 2)
                   WHEN surface LIKE '%ss' THEN surface
                   WHEN surface LIKE '%s' THEN
                       left(surface, length(surface) - 1)
                   ELSE surface
               END AS stem
        FROM surf
    )
    SELECT stem,
           COUNT(*) AS n_surface_forms,
           list_sort(list(surface)) AS surfaces
    FROM (SELECT DISTINCT surface, stem FROM stemmed)
    GROUP BY stem
    """,
)
def i19_stemming(spark, sf_dir) -> DataFrame:
    """Suffix-stripping stemmer (a Porter step-1 subset: sses→ss,
    ies→i, ing/ed stripped above a length floor, terminal s dropped
    unless ss) folding inflected surface forms onto one stem — the
    index-time normalization the reference archetype applies before
    TF/DF so 'joins'/'joining' hit the 'join' postings list.  The
    fixture vocabulary is all base forms, so the query GENERATES the
    inflections deterministically (cross join with a suffix battery)
    and the result groups every stem with its sorted surface forms —
    vacuous-proof at every scale factor.

    The rule chain is a CASE priority ladder (first match wins), the
    exact same ladder in both engines — string ops only, no regex
    dialect hazard.  Plan: vocabulary-sized all the way (distinct
    terms × 6 suffixes); at 100 TB the stem map is built once from
    the vocabulary table and BROADCAST onto the token stream, a narrow
    map pass like j10/j11."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("base")
        )
        .distinct()
    )
    surf = vocab.select(
        F.explode(
            F.array(*[F.concat(F.col("base"), F.lit(s)) for s in _STEM_SUFFIXES])
        ).alias("surface")
    ).distinct()
    ln = F.length("surface")
    stem = (
        F.when(F.col("surface").endswith("sses"), F.expr("left(surface, length(surface) - 2)"))
        .when(F.col("surface").endswith("ies"), F.expr("left(surface, length(surface) - 2)"))
        .when(
            F.col("surface").endswith("ing") & (ln > 5),
            F.expr("left(surface, length(surface) - 3)"),
        )
        .when(
            F.col("surface").endswith("ed") & (ln > 4),
            F.expr("left(surface, length(surface) - 2)"),
        )
        .when(F.col("surface").endswith("ss"), F.col("surface"))
        .when(F.col("surface").endswith("s"), F.expr("left(surface, length(surface) - 1)"))
        .otherwise(F.col("surface"))
    )
    return (
        surf.select("surface", stem.alias("stem"))
        .distinct()
        .groupBy("stem")
        .agg(
            F.count(F.lit(1)).alias("n_surface_forms"),
            F.array_sort(F.collect_list("surface")).alias("surfaces"),
        )
    )


# ---------------------------------------------------------------------------
# i22 — THE LIFECYCLE, composed: dump → parse → index → ranked search
# ---------------------------------------------------------------------------


@query(
    "i22_dump_to_search",
    oracle=f"""
    WITH xml AS (
        SELECT '<page><id>' || doc_id || '</id><lang>' || lang
               || '</lang><source>' || source || '</source><text>'
               || replace(replace(replace(text,
                      '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
               || '</text></page>' AS raw
        FROM documents
    ),
    parsed AS (
        SELECT CAST(regexp_extract(raw, '<id>(\\d+)</id>', 1) AS BIGINT)
                   AS doc_id,
               replace(replace(replace(
                   regexp_extract(raw, '<text>([^<]*)</text>', 1),
                   '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS text
        FROM xml
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM parsed
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS nd FROM parsed),
    w AS (SELECT tf.doc_id, tf.term, tf.tf * LN(nd * 1.0 / dfc) AS wt
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM w WHERE term IN ({_TERMS_SQL})
    GROUP BY doc_id
    HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}
    ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
    LIMIT 10
    """,
)
def i22_dump_to_search(spark, sf_dir) -> DataFrame:
    """The reference's ENTIRE lifecycle as ONE Catalyst plan: XML dump
    pages → from_xml parse → tokenize → TF → DF → TF-IDF → conjunctive
    ranked top-10 — what the Hadoop original ran as N chained
    MapReduce jobs with an HDFS round-trip between every pair (dump
    split, wordcount, docfreq, tfidf, index, query), with each
    boundary a full disk write + read.  Here the whole chain is lazy:
    Catalyst sees every stage at once, pipelines parse+tokenize into
    the scan (no materialization anywhere), drops the unused parsed
    fields (lang/source) in the projection right above the parse, and
    the only shuffles are the TF aggregate and the query-term join —
    identical physics to i6, plus a parse stage costing one map pass.

    Must produce EXACTLY i6's results (same docs, same scores): the
    roundtrip is the identity on the corpus — asserted in pytest on
    top of the oracle."""
    from ..operators.scans import parse_pages, serialize_pages

    docs = load(spark, sf_dir, "documents")
    parsed = parse_pages(serialize_pages(docs)).select("doc_id", "text")
    w = tfidf(parsed).filter(F.col("term").isin(*QUERY_TERMS))
    scored = w.groupBy("doc_id").agg(
        F.round(F.sum("wt"), 4).alias("score"),
        F.countDistinct("term").alias("nterms"),
    )
    return (
        scored.filter(F.col("nterms") == len(QUERY_TERMS))
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i23 — term co-occurrence / pointwise mutual information (collocations)
# ---------------------------------------------------------------------------


@query(
    "i23_cooccurrence_pmi",
    oracle="""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM dt),
    tdf AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY term),
    pairs AS (
        SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS codf
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term
    )
    SELECT term_a, term_b, codf,
           FLOOR(LN(codf * 1.0 * nd / (fa.df * fb.df)) * 10000) / 10000
               AS pmi
    FROM pairs
    JOIN tdf fa ON fa.term = term_a
    JOIN tdf fb ON fb.term = term_b
    CROSS JOIN n
    WHERE codf >= 5
    ORDER BY pmi DESC, term_a, term_b
    LIMIT 20
    """,
)
def i23_cooccurrence_pmi(spark, sf_dir) -> DataFrame:
    """Collocation mining: document-level pointwise mutual information
    for term pairs — PMI = ln( P(a,b) / (P(a)·P(b)) ) with document
    frequencies as the probability estimates, min-support 5 docs,
    top-20 (pmi desc, pair asc).  High PMI = terms that co-occur far
    above chance — the classic related-terms / query-expansion signal
    the reference archetype's search layer would mine from its own
    index.

    Plan: all three statistics (N, per-term df, pair co-df) read the
    same MATERIALIZED (doc, term) table (the i5 index build's input —
    one row per pair by construction, so no distinct expand), exactly
    the persisted-artifact discipline a production run applies; each
    branch is a checkpoint scan.  The pair self-join
    is per-doc quadratic in DISTINCT terms per doc (~30 in fixture,
    bounded by vocabulary not doc length); the df tables are
    vocabulary-sized and broadcast onto the pair aggregate.  At
    100 TB: prune the vocabulary first (i12's min/max-df prune) so the
    per-doc pair expansion stays k², k ≲ 10³, and the pair space is
    capped by vocab², not corpus size."""
    from .llm_scale import doc_term_tf

    dt = doc_term_tf(spark, sf_dir).select("doc_id", "term")
    n = dt.agg(F.countDistinct("doc_id").alias("nd"))
    tdf = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = dt.alias("a")
    b = dt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("codf"))
        .filter(F.col("codf") >= 5)
    )
    fa = tdf.select(F.col("term").alias("term_a"), F.col("df").alias("dfa"))
    fb = tdf.select(F.col("term").alias("term_b"), F.col("df").alias("dfb"))
    pmi = F.log(
        F.col("codf") * F.lit(1.0) * F.col("nd") / (F.col("dfa") * F.col("dfb"))
    )
    return (
        pairs.join(F.broadcast(fa), "term_a")
        .join(F.broadcast(fb), "term_b")
        .join(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "codf",
            (F.floor(pmi * 10000) / 10000).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "term_a", "term_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# i25 — two-stage retrieval cascade: BM25 recall -> VSM precision re-rank
# ---------------------------------------------------------------------------

_SHORTLIST = 100


@query(
    "i25_two_stage_rerank",
    oracle=f"WITH {_TFIDF_CTES},"
    f"""
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS nd2, AVG(dl) AS avgdl FROM dl),
    btf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
            WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term),
    bdf AS (SELECT term, COUNT(*) AS dfc2 FROM btf GROUP BY term),
    bm25 AS (
        SELECT btf.doc_id,
               FLOOR(SUM(
                   LN(1 + (nd2 - dfc2 + 0.5) / (dfc2 + 0.5))
                   * tf * ({_BM25_K1} + 1)
                   / (tf + {_BM25_K1}
                      * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               ) * 10000) / 10000 AS bm25
        FROM btf JOIN bdf USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY btf.doc_id
    ),
    short AS (SELECT doc_id, bm25 FROM bm25
              ORDER BY bm25 DESC, doc_id LIMIT {_SHORTLIST}),
    norms AS (SELECT doc_id, SQRT(SUM(wt * wt)) AS nrm
              FROM w GROUP BY doc_id),
    qdot AS (SELECT doc_id, SUM(wt) AS qd FROM w
             WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id)
    SELECT s.doc_id, s.bm25,
           FLOOR(q.qd / nm.nrm * 10000) / 10000 AS cosine
    FROM short s JOIN qdot q USING (doc_id) JOIN norms nm USING (doc_id)
    ORDER BY cosine DESC, s.doc_id
    LIMIT 10
    """,
)
def i25_two_stage_rerank(spark, sf_dir) -> DataFrame:
    """Two-stage retrieval cascade — the architecture of every modern
    search stack: a cheap RECALL stage (BM25 over the inverted index,
    i10) takes the corpus to a 100-doc shortlist, then an expensive
    PRECISION stage (length-normalized VSM cosine, i17's scorer in
    disjunctive form) re-ranks only the shortlist for the final top-10.
    The shortlist cutoff ranks on the 4dp-FLOORED BM25 score with a
    doc_id tiebreak (j42's discipline) so the stage boundary can never
    flip on a last-ulp float difference between engines.

    100 TB shape: stage 1 is i10's physics (query-term-filtered TF
    slice + broadcast corpus stats — index-served in production);
    stage 2's cost is SHORTLIST-sized, not corpus-sized: the 100-row
    shortlist broadcasts onto the postings slice and the persisted
    norm column (index_store), so making the precision scorer 10×
    fancier — including a cross-encoder via mapInPandas on 100 rows —
    adds nothing to the corpus pass.  This cascade is why engines can
    afford expensive rankers at all."""
    docs = load(spark, sf_dir, "documents")
    tok = tokenize(docs)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("nd2"), F.avg("dl").alias("avgdl")
    )
    btf = (
        tok.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    bdf = btf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc2"))
    s = (
        F.log(
            1
            + (F.col("nd2") - F.col("dfc2") + F.lit(0.5))
            / (F.col("dfc2") + F.lit(0.5))
        )
        * F.col("tf")
        * F.lit(_BM25_K1 + 1)
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (
                F.lit(1 - _BM25_B)
                + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
            )
        )
    )
    shortlist = (
        btf.join(bdf, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg((F.floor(F.sum(s) * 10000) / 10000).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_SHORTLIST)
    )
    w = tfidf_w(spark, sf_dir)
    norms = doc_norms(spark, sf_dir)
    qdot = (
        w.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.sum("wt").alias("qd"))
    )
    return (
        F.broadcast(shortlist)
        .join(qdot, "doc_id")
        .join(norms, "doc_id")
        .select(
            "doc_id",
            "bm25",
            (F.floor(F.col("qd") / F.col("nrm") * 10000) / 10000).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i31 — Rocchio pseudo-relevance feedback (query expansion + re-rank)
# ---------------------------------------------------------------------------

_ROCCHIO_FB = 10   # feedback depth (top-k docs assumed relevant)
_ROCCHIO_BETA = 0.5
_ROCCHIO_EXP = 5   # expansion terms kept


@query(
    "i31_rocchio_feedback",
    oracle=f"WITH {_TFIDF_CTES},"
    f"""
    norms AS (SELECT doc_id, SQRT(SUM(wt * wt)) AS nrm
              FROM w GROUP BY doc_id),
    hits AS (SELECT doc_id, SUM(wt) AS qdot
             FROM w WHERE term IN ({_TERMS_SQL})
             GROUP BY doc_id
             HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}),
    fb AS (SELECT h.doc_id
           FROM hits h JOIN norms n USING (doc_id)
           ORDER BY FLOOR(h.qdot / n.nrm * 10000) / 10000 DESC, h.doc_id
           LIMIT {_ROCCHIO_FB}),
    nf AS (SELECT COUNT(*) AS nf FROM fb),
    cen AS (SELECT term, SUM(wt) / nf AS cw
            FROM w JOIN fb USING (doc_id) CROSS JOIN nf
            WHERE term NOT IN ({_TERMS_SQL})
            GROUP BY term, nf),
    expand AS (SELECT term,
                      FLOOR({_ROCCHIO_BETA} * cw * 10000) / 10000 AS qw
               FROM cen
               ORDER BY FLOOR({_ROCCHIO_BETA} * cw * 10000) / 10000 DESC,
                        term
               LIMIT {_ROCCHIO_EXP}),
    qvec AS (SELECT term, qw FROM expand
             UNION ALL
             SELECT unnest([{_TERMS_SQL}]) AS term, 1.0 AS qw),
    dot AS (SELECT w.doc_id, SUM(q.qw * w.wt) AS qd
            FROM w JOIN qvec q USING (term)
            GROUP BY w.doc_id)
    SELECT d.doc_id, FLOOR(d.qd / n.nrm * 10000) / 10000 AS score
    FROM dot d JOIN norms n USING (doc_id)
    ORDER BY score DESC, d.doc_id
    LIMIT 10
    """,
)
def i31_rocchio_feedback(spark, sf_dir) -> DataFrame:
    """Rocchio pseudo-relevance feedback — the classic query-expansion
    loop (Rocchio 1971, the standard PRF baseline): run the query
    (i17's conjunctive VSM cosine), ASSUME the top-{_ROCCHIO_FB} are
    relevant, move the query vector toward their tf-idf centroid
    (q' = q + β·centroid, β={_ROCCHIO_BETA}), keep the {_ROCCHIO_EXP}
    strongest new terms, and re-rank the corpus disjunctively under
    the expanded weighted query.  Finds documents the original terms
    alone would miss.  Every stage boundary ranks on 4dp-FLOORED
    values with term/doc_id tiebreaks (i25's discipline), so feedback
    set, expansion choice and final cut are all ulp-stable across
    engines.

    100 TB shape: the cascade inverts corpus-scale work into
    query-scale work — the feedback set is {_ROCCHIO_FB} rows, the
    centroid aggregates {_ROCCHIO_FB} documents' postings (broadcast
    join of fb onto the weight table), and the expanded query is
    ≤ {_ROCCHIO_EXP}+{len(QUERY_TERMS)} rows BROADCAST onto the
    postings for the re-rank — so the second corpus pass touches only
    the expanded terms' postings lists (index-served in production,
    like i17/i25).  Norms are computed once and shared by both ranking
    stages (persisted beside the index at scale)."""
    w = tfidf_w(spark, sf_dir)
    norms = doc_norms(spark, sf_dir)
    hits = (
        w.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.sum("wt").alias("qdot"), F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(QUERY_TERMS))
    )
    fb = (
        hits.join(norms, "doc_id")
        .select(
            "doc_id",
            (F.floor(F.col("qdot") / F.col("nrm") * 10000) / 10000).alias("s1"),
        )
        .orderBy(F.col("s1").desc(), "doc_id")
        .limit(_ROCCHIO_FB)
        .select("doc_id")
    )
    nf = fb.agg(F.count(F.lit(1)).alias("nf"))
    cen = (
        w.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("term").isin(*QUERY_TERMS))
        .join(F.broadcast(nf))
        .groupBy("term", "nf")
        .agg((F.sum("wt") / F.first("nf")).alias("cw"))
    )
    qw_f = F.floor(F.lit(_ROCCHIO_BETA) * F.col("cw") * 10000) / 10000
    expand = (
        cen.select("term", qw_f.alias("qw"))
        .orderBy(F.col("qw").desc(), "term")
        .limit(_ROCCHIO_EXP)
    )
    orig = expand.sparkSession.createDataFrame(
        [(t, 1.0) for t in QUERY_TERMS], "term string, qw double"
    )
    qvec = expand.unionAll(orig)
    dot = (
        w.join(F.broadcast(qvec), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("qw") * F.col("wt")).alias("qd"))
    )
    return (
        dot.join(norms, "doc_id")
        .select(
            "doc_id",
            (F.floor(F.col("qd") / F.col("nrm") * 10000) / 10000).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i32 — MaxScore/upper-bound pruned disjunctive retrieval
# ---------------------------------------------------------------------------


@query(
    "i32_maxscore_prune",
    oracle=f"WITH {_TFIDF_CTES} "
    f"""
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM w WHERE term IN ({_TERMS_SQL})
    GROUP BY doc_id
    ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
    LIMIT 10
    """,
)
def i32_maxscore_prune(spark, sf_dir) -> DataFrame:
    """Upper-bound pruned disjunctive retrieval (the MaxScore family —
    Turtle & Flood 1995; the skipping discipline behind WAND): return
    EXACTLY i7's top-10, but aggregate-score only documents that can
    still make the cut.  Three steps, each provably safe:

    1. per-term upper bounds ub_t = max posting weight (index
       metadata in production — term-count-sized, broadcast);
    2. a threshold θ = the floored 10th-best EXACT score among the
       union of each term's top-10 postings (a ≤ |Q|·10-doc seed;
       a SUBSET's 10th best never exceeds the global 10th best, and
       flooring only lowers it, so θ ≤ true cutoff);
    3. prune: a doc's score is bounded by Σ ub_t over its MATCHED
       terms; bound < θ ⇒ score < true cutoff ⇒ provably outside
       top-10 — drop it BEFORE the scoring aggregate.  Parity with
       i7's unpruned oracle is the safety proof.

    100 TB shape: this is why search engines answer disjunctive
    queries without scoring every posting — the scoring aggregate
    (the shuffle) runs on survivors only, while the bound needs just
    the matched-term membership already in hand; ub and θ are
    query-sized broadcasts.  The sequential-skipping WAND refinement
    tightens θ as results accumulate — pointless inside one
    declarative batch pass, noted for the serving path."""
    w = tfidf_w(spark, sf_dir).filter(F.col("term").isin(*QUERY_TERMS))
    ub = w.groupBy("term").agg(F.max("wt").alias("ub"))
    seed_w = Window.partitionBy("term").orderBy(
        F.floor(F.col("wt") * 10000).desc(), "doc_id"
    )
    seed_docs = (
        w.withColumn("rn", F.row_number().over(seed_w))
        .filter(F.col("rn") <= 10)
        .select("doc_id")
        .distinct()
    )
    seed_scores = (
        w.join(F.broadcast(seed_docs), "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum("wt"), 4).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(10)
    )
    # θ is derived from ROUND(SUM(wt), 4) seed scores, and rounding can
    # go UP by as much as 5e-5 past the unrounded score — so subtract a
    # 1e-4 guard band to make the bound direction airtight: a pruned doc
    # has rounded score ≤ exact + 5e-5 ≤ bound + 5e-5 < θ − 5e-5, i.e.
    # strictly below the 10th-best rounded seed score, hence provably
    # outside the top-10 under the oracle's rounded ordering (ADVICE r6:
    # the earlier "flooring only lowers" argument had this hole).
    theta = seed_scores.agg(
        F.when(F.count(F.lit(1)) < 10, F.lit(float("-inf")))
        .otherwise(F.min("s") - F.lit(1e-4))
        .alias("theta")
    )
    bounds = (
        w.join(F.broadcast(ub), "term")
        .groupBy("doc_id")
        .agg(F.sum("ub").alias("bound"))
    )
    survivors = (
        bounds.join(F.broadcast(theta))
        .filter(F.col("bound") >= F.col("theta"))
        .select("doc_id")
    )
    return (
        w.join(survivors, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum("wt"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i33 — field-boosted retrieval (the BM25F construction, VSM-weighted)
# ---------------------------------------------------------------------------

_TITLE_LEN = 3
_TITLE_BOOST = 3


@query(
    "i33_field_boost",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    fielded AS (
        SELECT doc_id, g AS term, {_TITLE_BOOST} AS wgt
        FROM (SELECT doc_id, unnest(t[1:{_TITLE_LEN}]) AS g FROM toks)
        UNION ALL
        SELECT doc_id, g, 1
        FROM (SELECT doc_id, unnest(t[{_TITLE_LEN + 1}:len(t)]) AS g
              FROM toks WHERE len(t) > {_TITLE_LEN})
    ),
    wtf AS (
        SELECT doc_id, term, SUM(wgt) AS wtf
        FROM fielded
        WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, COUNT(DISTINCT doc_id) AS dfc
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        WHERE term IN ({_TERMS_SQL})
        GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT doc_id,
           FLOOR(SUM(wtf * LN(nd * 1.0 / dfc)) * 10000) / 10000 AS score
    FROM wtf JOIN dfreq USING (term) CROSS JOIN n
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 10
    """,
)
def i33_field_boost(spark, sf_dir) -> DataFrame:
    """Field-boosted retrieval — the BM25F construction (Robertson &
    Zaragoza: weight term frequencies PER FIELD, combine, THEN apply
    one shared idf/saturation — never score fields separately and add,
    which double-counts idf and breaks term saturation), here in
    VSM-weighted form: title hits count {_TITLE_BOOST}×, body hits 1×,
    one idf over whole-document presence.  The fixture has no field
    structure, so the first {_TITLE_LEN} tokens are the title — the a5
    synthesis discipline; with a real (title, body) schema only the
    two slice expressions change.

    Plan: both fields explode from ONE token array in one pass (a
    per-field tf table + union would re-tokenize); the weighted tf is
    a single (doc, term) aggregate with the query-term filter pushed
    below it, df and N are broadcast scalars (i10's physics).  At
    100 TB the fielded index is persisted once with per-field tf
    columns and this query touches |Q| postings lists."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    title = toks.select(
        "doc_id",
        F.explode(F.slice("t", 1, _TITLE_LEN)).alias("term"),
        F.lit(_TITLE_BOOST).alias("wgt"),
    )
    body = toks.filter(F.size("t") > _TITLE_LEN).select(
        "doc_id",
        F.explode(
            F.slice("t", _TITLE_LEN + 1, F.size("t") - _TITLE_LEN)
        ).alias("term"),
        F.lit(1).alias("wgt"),
    )
    wtf = (
        title.unionAll(body)
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.sum("wgt").alias("wtf"))
    )
    tok = toks.select("doc_id", F.explode("t").alias("term"))
    dfreq = (
        tok.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("dfc"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    return (
        wtf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            (
                F.floor(
                    F.sum(
                        F.col("wtf")
                        * F.log(F.col("nd").cast("double") / F.col("dfc"))
                    )
                    * 10000
                )
                / 10000
            ).alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i34 — retrieval evaluation metrics (the engine grading its own ranking)
# ---------------------------------------------------------------------------


@query(
    "i34_search_eval",
    oracle=f"WITH {_TFIDF_CTES},"
    f"""
    ranking AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY ROUND(SUM(wt), 4) DESC, doc_id)
                   AS pos
        FROM w WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id
        ORDER BY pos
        LIMIT 10
    ),
    rel AS (
        SELECT doc_id FROM w WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id
        HAVING COUNT(DISTINCT term) = {len(QUERY_TERMS)}
    ),
    nrel AS (SELECT COUNT(*) AS n_rel FROM rel),
    hits AS (
        SELECT r.pos, CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS h
        FROM ranking r LEFT JOIN rel ON rel.doc_id = r.doc_id
    )
    SELECT
        FLOOR(SUM(h) * 10000.0 / 10) / 10000 AS p_at_10,
        FLOOR(SUM(h) * 10000.0 / n_rel) / 10000 AS recall_at_10,
        FLOOR(10000.0 / MIN(CASE WHEN h = 1 THEN pos END)) / 10000 AS mrr,
        FLOOR(SUM(h * 1.0 / (LN(pos + 1) / LN(2.0)))
              / (SELECT SUM(1.0 / (LN(i + 1) / LN(2.0)))
                 FROM (SELECT unnest(range(1, LEAST(10, n_rel) + 1)) AS i))
              * 10000) / 10000 AS ndcg_at_10
    FROM hits CROSS JOIN nrel
    GROUP BY n_rel
    """,
)
def i34_search_eval(spark, sf_dir) -> DataFrame:
    """Retrieval evaluation IN-ENGINE: precision@10, recall@10, MRR
    and binary nDCG@10 of the disjunctive ranking (i7), graded against
    a deterministic relevance set — documents matching ALL query terms
    (i6's conjunctive set): the evaluation loop every search stack
    runs offline, expressed as one plan (rank → join judgments →
    aggregate), so ranking changes get scored in the same engine that
    serves them.  A conjunctive ground truth for a disjunctive ranker
    is a real (if easy) grader: perfect P@10 means the top of the OR
    ranking is dominated by AND matches.

    DCG discounts are ln-ratio log2's — identical IEEE doubles in both
    engines; the ideal DCG places the min(10, |R|) relevant docs first
    (the binary-relevance closed form, computed over a generated
    sequence, never hand-unrolled).  All four metrics 4dp-floored;
    single-row output.

    100 TB shape: judgment sets are query-sized (broadcast); the
    ranking is i7's plan (top-k heap over the postings slice); the
    metric aggregate touches 10 rows.  Scoring 10⁴ eval queries =
    this plan keyed by query_id, one shuffle."""
    w = tfidf_w(spark, sf_dir).filter(F.col("term").isin(*QUERY_TERMS))
    ranking = (
        w.groupBy("doc_id")
        .agg(F.round(F.sum("wt"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .alias("pos"),
        )
    )
    rel = (
        w.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(QUERY_TERMS))
        .select("doc_id", F.lit(1).alias("is_rel"))
    )
    nrel = rel.agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        ranking.join(F.broadcast(rel), "doc_id", "left")
        .select("pos", F.coalesce("is_rel", F.lit(0)).alias("h"))
        .join(F.broadcast(nrel))
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    idcg = F.expr(
        "aggregate(sequence(1, least(10, n_rel)), 0D,"
        " (acc, i) -> acc + 1.0 / (ln(i + 1) / ln(2.0)))"
    )
    return hits.groupBy("n_rel").agg(
        (F.floor(F.sum("h") * 10000.0 / 10) / 10000).alias("p_at_10"),
        (F.floor(F.sum("h") * 10000.0 / F.first("n_rel")) / 10000).alias(
            "recall_at_10"
        ),
        (
            F.floor(10000.0 / F.min(F.when(F.col("h") == 1, F.col("pos"))))
            / 10000
        ).alias("mrr"),
        (
            F.floor(
                F.sum(F.col("h") / log2(F.col("pos") + 1))
                / F.first(idcg)
                * 10000
            )
            / 10000
        ).alias("ndcg_at_10"),
    ).drop("n_rel")


# ---------------------------------------------------------------------------
# i35 — batched multi-query execution (N queries, ONE plan)
# ---------------------------------------------------------------------------

_BATCH_VOCAB = 10  # frequent terms feeding the query batch
_BATCH_QUERIES = 20


@query(
    "i35_batch_queries",
    oracle=f"WITH {_TFIDF_CTES},"
    f"""
    top_terms AS (
        SELECT term FROM dfreq
        ORDER BY dfc DESC, term LIMIT {_BATCH_VOCAB}
    ),
    qdef AS (
        SELECT ROW_NUMBER() OVER (ORDER BY a.term, b.term) AS query_id,
               a.term AS term_a, b.term AS term_b
        FROM top_terms a JOIN top_terms b ON a.term < b.term
        ORDER BY query_id LIMIT {_BATCH_QUERIES}
    ),
    qt AS (
        SELECT query_id, term_a AS term FROM qdef
        UNION ALL SELECT query_id, term_b FROM qdef
    ),
    scored AS (
        SELECT qt.query_id, w.doc_id,
               ROUND(SUM(w.wt), 4) AS score
        FROM w JOIN qt USING (term)
        GROUP BY qt.query_id, w.doc_id
        HAVING COUNT(DISTINCT w.term) = 2
    )
    SELECT query_id, doc_id, rnk, score
    FROM (SELECT query_id, doc_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 3
    ORDER BY query_id, rnk
    """,
)
def i35_batch_queries(spark, sf_dir) -> DataFrame:
    """Batched multi-query execution: {_BATCH_QUERIES} conjunctive
    two-term queries (pairs of the corpus's {_BATCH_VOCAB} most
    frequent terms — derived in-engine, df-ranked with term
    tiebreaks) scored against the corpus in ONE plan — the query
    TABLE joins the postings, instead of one plan execution per query.
    This is the serving insight that makes offline eval and batch
    re-ranking tractable on Spark: i34 grades one query; this
    executes a workload, and its cost is one postings pass plus a
    per-query top-3 window, independent of how many queries ride
    along (the per-query-loop alternative pays plan+scan overhead
    {_BATCH_QUERIES}×).

    Plan: the weight table is materialized ONCE (localCheckpoint —
    it stands for the persisted i5/i21 index both consumers read in
    production; without it, Catalyst re-derived the tokenize→tfidf
    chain in every branch: 30 scan nodes in the physical plan,
    measured) and serves both the query-definition branch and the
    scoring join.  The query-term table is query-batch-sized and
    BROADCAST onto it (no corpus shuffle for the join); the
    (query, doc) aggregate and the per-query window share an
    exchange; conjunctive semantics via the distinct-term count
    exactly like i6.  At 10⁴ queries the qt table is still KBs — the
    batch scales in queries for free until the (query, doc) candidate
    aggregate, which grows with Σ per-query match counts, shuffles on
    (query_id, doc_id) and AQE-splits if one query is hot."""
    w = tfidf_w(spark, sf_dir)  # the "persisted index" (see above)
    dfreq = w.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    top_terms = (
        dfreq.orderBy(F.col("dfc").desc(), "term")
        .limit(_BATCH_VOCAB)
        .select("term")
    )
    a = top_terms.select(F.col("term").alias("term_a"))
    b = top_terms.select(F.col("term").alias("term_b"))
    qdef = (
        a.join(b, F.col("term_a") < F.col("term_b"))
        .withColumn(
            "query_id",
            F.row_number().over(Window.orderBy("term_a", "term_b")),
        )
        .filter(F.col("query_id") <= _BATCH_QUERIES)
    )
    qt = qdef.select("query_id", F.col("term_a").alias("term")).unionAll(
        qdef.select("query_id", F.col("term_b").alias("term"))
    )
    scored = (
        w.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("wt"), 4).alias("score"),
            F.countDistinct("term").alias("nt"),
        )
        .filter(F.col("nt") == 2)
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "doc_id", "rnk", "score")
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# i37 — learning-to-rank feature extraction (text × link-graph join)
# ---------------------------------------------------------------------------

def _ltr_oracle() -> str:
    from .link_graph import _LINKS_CTE

    return f"""
    WITH {_TOK_CTE}, {_LINKS_CTE},
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS nd, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term),
    deg AS (SELECT target, COUNT(*) AS in_deg FROM links GROUP BY target)
    SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
           CAST(COALESCE(deg.in_deg, 0) AS BIGINT) AS in_deg,
           FLOOR(tf * LN(nd * 1.0 / dfc) * 10000) / 10000 AS wt_tfidf,
           FLOOR(LN(1 + (nd - dfc + 0.5) / (dfc + 0.5))
                 * tf * ({_BM25_K1} + 1)
                 / (tf + {_BM25_K1}
                    * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))
                 * 10000) / 10000 AS bm25_term
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    LEFT JOIN deg ON deg.target = 'doc_' || CAST(tf.doc_id AS VARCHAR)
    ORDER BY tf.doc_id, tf.term
    """


@query("i37_ltr_features", oracle=_ltr_oracle())
def i37_ltr_features(spark, sf_dir) -> DataFrame:
    """Learning-to-rank FEATURE EXTRACTION: for every (query term,
    matching doc) pair, the per-term feature vector an LTR trainer
    (LambdaMART et al.) consumes — raw tf, document length, TF-IDF
    weight, the BM25 per-term score, and the doc's wikilink in-degree
    (the query-independent authority signal).  This is the stage
    between a search engine's index and its ranker: production systems
    materialize exactly this table from the same index scans that
    serve retrieval, then train offline.  It composes three existing
    pipelines — tokenization/TF (i2), BM25 statistics (i10), link
    extraction (i27) — in ONE plan, which is the point: feature
    extraction re-uses the index passes, it does not re-scan the
    corpus per feature.

    Plan / 100 TB shape: the corpus is tokenized once (tok feeds both
    dl and tf — ReusedExchange); the query-term filter shrinks tf
    BEFORE any join (i6's discipline) so every join downstream is
    query-result-sized except the link aggregate, which is
    edge-list-sized and keyed on the same doc identity (broadcast here,
    bucketed at scale).  nd/avgdl is one broadcast scalar row.  Output
    is (matched docs × query terms) — the training-candidate set, not
    the corpus."""
    from .link_graph import link_edges

    docs = load(spark, sf_dir, "documents")
    tok = tokenize(docs)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("nd"), F.avg("dl").alias("avgdl"))
    tf = (
        tok.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    deg = (
        link_edges(spark, sf_dir)
        .groupBy("target")
        .agg(F.count(F.lit(1)).alias("in_deg"))
    )
    idf_bm = F.log(
        1
        + (F.col("nd") - F.col("dfc") + F.lit(0.5))
        / (F.col("dfc") + F.lit(0.5))
    )
    bm25_term = (
        idf_bm
        * F.col("tf")
        * F.lit(_BM25_K1 + 1)
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .join(
            F.broadcast(deg),
            F.col("target")
            == F.concat(F.lit("doc_"), F.col("doc_id").cast("string")),
            "left",
        )
        .select(
            "doc_id",
            "term",
            "tf",
            "dl",
            F.coalesce(F.col("in_deg"), F.lit(0).cast("long")).alias(
                "in_deg"
            ),
            (
                F.floor(
                    F.col("tf")
                    * F.log(F.col("nd").cast("double") / F.col("dfc"))
                    * 10000
                )
                / 10000
            ).alias("wt_tfidf"),
            (F.floor(bm25_term * 10000) / 10000).alias("bm25_term"),
        )
        .orderBy("doc_id", "term")
    )


# ---------------------------------------------------------------------------
# i38 — champion lists (impact-ordered posting truncation)
# ---------------------------------------------------------------------------

#: postings kept per term in the champion list.
_CHAMP_M = 50


@query(
    "i38_champion_lists",
    oracle=f"WITH {_TFIDF_CTES},"
    f"""
    ch AS (
        SELECT term, doc_id, wt
        FROM w WHERE term IN ({_TERMS_SQL})
        QUALIFY ROW_NUMBER() OVER (PARTITION BY term
                                   ORDER BY ROUND(wt, 4) DESC, doc_id)
                <= {_CHAMP_M}
    )
    SELECT doc_id, ROUND(SUM(wt), 4) AS score
    FROM ch
    GROUP BY doc_id
    ORDER BY ROUND(SUM(wt), 4) DESC, doc_id
    LIMIT 10
    """,
)
def i38_champion_lists(spark, sf_dir) -> DataFrame:
    """Champion-list (impact-ordered, truncated) retrieval: keep only
    each term's top-{_CHAMP_M} postings by weight at INDEX time, and
    answer the disjunctive query from those lists alone — the classic
    inexact top-k optimization (Manning/IIR ch.7) that bounds
    per-query work by |Q|·m regardless of how common the terms are.
    Where i32's MaxScore prunes at QUERY time with a proof of
    exactness, champion lists trade a bounded, index-time-chosen
    approximation for a hard latency ceiling; both ship in real
    engines, usually stacked.  (With m={_CHAMP_M} ≥ the top-10's true
    posting depth on this corpus, the result equals i7 — the oracle
    states champion semantics, so parity holds regardless.)

    Plan / 100 TB shape: the champion rank is one window per term
    partition over the (already query-filtered) weight slice — at
    index-build time this runs over the FULL vocabulary once and
    persists m rows/term (index_store's bucketed layout, ~m/avg_df of
    full posting bytes); the query path is then |Q| list fetches + a
    doc-keyed aggregate + a top-k heap, never touching full postings.
    Scoring, ordering and ties follow i7's exact 4dp discipline."""
    w = tfidf_w(spark, sf_dir).filter(F.col("term").isin(*QUERY_TERMS))
    champ_w = Window.partitionBy("term").orderBy(
        F.round(F.col("wt"), 4).desc(), "doc_id"
    )
    champions = (
        w.withColumn("rn", F.row_number().over(champ_w))
        .filter(F.col("rn") <= _CHAMP_M)
    )
    return (
        champions.groupBy("doc_id")
        .agg(F.round(F.sum("wt"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i39 — postings compression estimate (delta gaps + variable-byte)
# ---------------------------------------------------------------------------

_VBYTE_SQL = (
    "CASE WHEN {g} < 128 THEN 1 WHEN {g} < 16384 THEN 2"
    " WHEN {g} < 2097152 THEN 3 WHEN {g} < 268435456 THEN 4"
    " ELSE 5 END"
)


@query(
    "i39_postings_compression",
    oracle=f"WITH {_TOK_CTE},"
    f"""
    post AS (SELECT DISTINCT term, doc_id FROM tok),
    gaps AS (
        SELECT term,
               COALESCE(doc_id - LAG(doc_id) OVER (PARTITION BY term
                                                   ORDER BY doc_id),
                        doc_id + 1) AS g
        FROM post
    ),
    sz AS (
        SELECT term,
               COUNT(*) AS df,
               CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
               CAST(SUM({_VBYTE_SQL.format(g='g')}) AS BIGINT)
                   AS vbyte_bytes
        FROM gaps GROUP BY term
    )
    SELECT term, df, raw_bytes, vbyte_bytes,
           (raw_bytes * 10000 // vbyte_bytes) / 10000.0
               AS compression_ratio
    FROM sz
    ORDER BY df DESC, term
    LIMIT 100
    """,
)
def i39_postings_compression(spark, sf_dir) -> DataFrame:
    """Inverted-index compression accounting: per-term posting lists
    delta-encoded (doc-id gaps) and priced under variable-byte coding
    — the storage arithmetic behind every real index format (gap +
    vbyte/PForDelta is why a positional index fits in a fraction of
    raw id width; Manning/IIR ch.5).  The estimate is EXACT integer
    math both engines reproduce bit-for-bit: gap = id − lag(id) (first
    gap id+1, keeping it ≥ 1), vbyte bytes = the 7-bit-group count by
    range CASE, raw = 8 bytes/posting; ratio is floor division at 4dp.
    This closes the survey's "index compression" gap with a checkable
    artifact: the top-100-df rows are exactly the lists whose
    compression decides index size.

    Plan / 100 TB shape: the posting pairs read the MATERIALIZED
    (doc, term, tf) table (one row per pair by construction — the i5
    index-build artifact, no distinct expand); the lag window and the
    size aggregate RIDE one term partitioning (plan-guarded); top-100
    is a heap.  At build time this aggregate is
    computed alongside the index write as free telemetry (j36's
    observe discipline); the decision it feeds — which lists to cache
    raw vs compressed — is index-format engineering, and the numbers
    here are the ones that drive it."""
    from .llm_scale import doc_term_tf

    post = doc_term_tf(spark, sf_dir).select("term", "doc_id")
    wlag = Window.partitionBy("term").orderBy("doc_id")
    gaps = post.select(
        "term",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(wlag),
            F.col("doc_id") + 1,
        ).alias("g"),
    )
    sz = gaps.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        (F.count(F.lit(1)) * 8).alias("raw_bytes"),
        F.sum(F.expr(_VBYTE_SQL.format(g="g"))).cast("long").alias(
            "vbyte_bytes"
        ),
    )
    return (
        sz.select(
            "term",
            "df",
            "raw_bytes",
            "vbyte_bytes",
            (
                F.expr("raw_bytes * 10000 DIV vbyte_bytes") / 10000.0
            ).alias("compression_ratio"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# i40 — PMI-based query expansion (global co-occurrence thesaurus)
# ---------------------------------------------------------------------------

#: expansion terms per query term / their score weight.
_EXP_K = 2
_EXP_BOOST = 0.5


@query(
    "i40_pmi_expansion",
    oracle=f"WITH {_TFIDF_CTES},"
    f"""
    dt AS (SELECT DISTINCT doc_id, term FROM tok),
    ndocs AS (SELECT COUNT(DISTINCT doc_id) AS nd2 FROM dt),
    tdf AS (SELECT term, COUNT(*) AS df2 FROM dt GROUP BY term),
    co AS (
        SELECT a.term AS q, b.term AS e, COUNT(*) AS codf
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND b.term <> a.term
        WHERE a.term IN ({_TERMS_SQL}) AND b.term NOT IN ({_TERMS_SQL})
        GROUP BY a.term, b.term
    ),
    expd AS (
        SELECT q, e FROM (
            SELECT q, e,
                   ROW_NUMBER() OVER (
                       PARTITION BY q
                       ORDER BY FLOOR(LN(codf * 1.0 * nd2
                                         / (fa.df2 * fb.df2)) * 10000)
                                DESC, e) AS rn
            FROM co
            JOIN tdf fa ON fa.term = q
            JOIN tdf fb ON fb.term = e
            CROSS JOIN ndocs
            WHERE codf >= 5
        ) WHERE rn <= {_EXP_K}
    ),
    qset AS (
        SELECT term, 1.0 AS boost
        FROM (SELECT unnest([{_TERMS_SQL}]) AS term)
        UNION ALL
        SELECT DISTINCT e AS term, {_EXP_BOOST} AS boost FROM expd
    )
    SELECT w.doc_id, ROUND(SUM(w.wt * qs.boost), 4) AS score
    FROM w JOIN qset qs USING (term)
    GROUP BY w.doc_id
    ORDER BY ROUND(SUM(w.wt * qs.boost), 4) DESC, w.doc_id
    LIMIT 10
    """,
)
def i40_pmi_expansion(spark, sf_dir) -> DataFrame:
    """Query expansion from a GLOBAL co-occurrence thesaurus: each
    query term recruits its top-{_EXP_K} PMI neighbors (i23's
    association statistic, floored at 4dp for a stable rank, codf ≥ 5
    support), the expanded term set scores documents with the
    originals at weight 1.0 and expansions at {_EXP_BOOST} — the
    corpus-derived synonym expansion every search engine layers over
    exact matching, and the third expansion style in the battery:
    i15 fixes typos (edit distance), i31 learns from the top-ranked
    RESULT set (local feedback), i40 mines the whole corpus once,
    query-independent, so the thesaurus is a BUILD artifact.

    Plan / 100 TB shape: the expensive object is the co-occurrence
    table — built here filtered to the query's rows (a.term IN Q
    before the self-join, so the join is query-posting-sized, not
    vocabulary²); as a build artifact it is i23's full pass, computed
    once and served like the inverted index.  The expansion set is
    query-sized, so scoring is i7's plan with a broadcast boost
    table.  Ties and rounding follow i7's exact 4dp discipline."""
    from .llm_scale import doc_term_tf

    # one row per (doc, term) by construction — already distinct
    dt = doc_term_tf(spark, sf_dir).select("doc_id", "term")
    ndocs = F.broadcast(dt.agg(F.countDistinct("doc_id").alias("nd2")))
    tdf = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df2"))
    a = dt.filter(F.col("term").isin(*QUERY_TERMS)).select(
        F.col("doc_id"), F.col("term").alias("q")
    )
    b = dt.filter(~F.col("term").isin(*QUERY_TERMS)).select(
        F.col("doc_id"), F.col("term").alias("e")
    )
    co = (
        a.join(b, "doc_id")
        .groupBy("q", "e")
        .agg(F.count(F.lit(1)).alias("codf"))
        .filter(F.col("codf") >= 5)
    )
    fa = tdf.select(F.col("term").alias("q"), F.col("df2").alias("dfa"))
    fb = tdf.select(F.col("term").alias("e"), F.col("df2").alias("dfb"))
    pmi_rank = F.floor(
        F.log(
            F.col("codf")
            * F.col("nd2").cast("double")
            / (F.col("dfa") * F.col("dfb"))
        )
        * 10000
    )
    wexp = Window.partitionBy("q").orderBy(pmi_rank.desc(), "e")
    expd = (
        co.join(fa, "q")
        .join(fb, "e")
        .join(ndocs)
        .withColumn("rn", F.row_number().over(wexp))
        .filter(F.col("rn") <= _EXP_K)
        .select("q", "e")
    )
    qset = (
        spark.createDataFrame(
            [(t, 1.0) for t in QUERY_TERMS], "term string, boost double"
        )
        .unionByName(
            expd.select("e").distinct().select(
                F.col("e").alias("term"), F.lit(_EXP_BOOST).alias("boost")
            )
        )
    )
    w = tfidf_w(spark, sf_dir)
    return (
        w.join(F.broadcast(qset), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("wt") * F.col("boost")), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# i42 — term burstiness (collection frequency vs document frequency)
# ---------------------------------------------------------------------------

@query(
    "i42_burstiness",
    oracle=f"WITH {_TOK_CTE},"
    """
    stats AS (
        SELECT term,
               COUNT(*) AS cf,
               COUNT(DISTINCT doc_id) AS dfc
        FROM tok
        GROUP BY term
    )
    SELECT term, cf, dfc,
           (cf * 10000 // dfc) / 10000.0 AS burstiness
    FROM stats
    WHERE dfc >= 10
    ORDER BY (cf * 10000 // dfc) DESC, term
    LIMIT 30
    """,
)
def i42_burstiness(spark, sf_dir) -> DataFrame:
    """Term BURSTINESS — collection frequency over document frequency
    (Church & Gale: content words repeat within the documents that
    mention them, function words spread thin) — the statistic behind
    DFR ranking models and the practical knob for stopword/keyword
    triage beyond raw df (i12 prunes by df; a term with df high AND
    cf/df ≈ 1 is a true function word, one with cf/df ≫ 1 is topical
    even when common).  Top-30 bursty terms with df ≥ 10 support.

    Determinism: cf and df are exact BIGINTs off one aggregate; the
    ratio is integer floor division at 4dp and doubles as the sort
    key, so the ranking can never split from the displayed value.

    Plan / 100 TB shape: one term-keyed hash aggregate computes both
    counts (the distinct-count expands map-side but shares the single
    exchange — d19's multi-distinct shape); top-30 is a heap.  This
    is index-build telemetry: i5/i9 already pay the same aggregate,
    so production emits burstiness as a free extra column."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    stats = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("dfc"),
    )
    return (
        stats.filter(F.col("dfc") >= 10)
        .select(
            "term",
            "cf",
            "dfc",
            (F.expr("cf * 10000 DIV dfc") / 10000.0).alias("burstiness"),
        )
        .orderBy(F.expr("cf * 10000 DIV dfc").desc(), "term")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# i43 — Zipf's-law fit over the rank-frequency curve (integer-exact sums)
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200


@query(
    "i43_zipf_fit",
    oracle=f"WITH {_TOK_CTE},"
    f"""
    cf AS (
        SELECT term, COUNT(*) AS cf,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rnk
        FROM tok GROUP BY term
    ),
    pts AS (
        SELECT CAST(FLOOR(LN(rnk) * 1000000) AS BIGINT) AS x,
               CAST(FLOOR(LN(cf) * 1000000) AS BIGINT) AS y
        FROM cf WHERE rnk <= {_ZIPF_TOP}
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pts
    )
    SELECT n,
           FLOOR(-(n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
                 * 10000) / 10000 AS zipf_exponent,
           FLOOR(((n * sxy - sx * sy) * 1.0) * ((n * sxy - sx * sy) * 1.0)
                 / (((n * sxx - sx * sx) * 1.0)
                    * ((n * syy - sy * sy) * 1.0)) * 10000) / 10000 AS r2
    FROM s
    """,
)
def i43_zipf_fit(spark, sf_dir) -> DataFrame:
    """Zipf's-law fit: regress ln(frequency) on ln(rank) over the
    top-{_ZIPF_TOP} terms and report the exponent (natural corpora sit
    near 1; a corpus that DOESN'T is machine-generated, truncated, or
    over-deduplicated — which makes this a cheap corpus-health
    diagnostic next to j53's distinct-n diversity) and the log-log R²
    (how Zipfian the curve actually is).

    Integer-exact regression: both coordinates quantize to
    floor(ln·1e6) BIGINTs (ln is per-VALUE — the only libm step, the
    j42 precedent), so all five moment sums are order-free integer
    arithmetic; magnitudes stay under 2^63 by construction
    ({_ZIPF_TOP} points × 1e6 scale keeps n·Σxy ≈ 1e18) and the two
    final divisions are identical IEEE doubles floored at 4dp.  The
    quantization scale cancels out of the slope exactly.

    Plan / 100 TB shape: the term-frequency aggregate is i9's pass;
    the top-{_ZIPF_TOP} cut is a ``TakeOrderedAndProject`` heap over
    the vocabulary table (per-task k-row heaps, driver merge — f2's
    shape; a rank WINDOW here would drag the whole vocabulary, which
    at web scale is billions of raw tokens, through one partition);
    the rank numbering then runs over the {_ZIPF_TOP} surviving rows
    and the fit touches the same {_ZIPF_TOP}.  Another free
    index-build telemetry column family (i39/i42's discipline)."""
    tok = tokenize(load(spark, sf_dir, "documents"))
    wr = Window.orderBy(F.col("cf").desc(), "term")
    cf = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
        .orderBy(F.col("cf").desc(), "term")
        .limit(_ZIPF_TOP)
        .withColumn("rnk", F.row_number().over(wr))
    )
    pts = cf.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cf").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "n",
        (F.floor(-num / denx * 10000) / 10000).alias("zipf_exponent"),
        (
            F.floor(
                (num.cast("double") * num.cast("double"))
                / (denx.cast("double") * deny.cast("double"))
                * 10000
            )
            / 10000
        ).alias("r2"),
    )
