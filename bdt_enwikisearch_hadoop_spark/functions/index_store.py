"""Persisted inverted index: build once, serve many (the reference's
actual operating mode — its MR chain wrote the index to HDFS and the
query program read it back; SURVEY §2.I/§3.1).

Scale notes (100 TB):

* The index is written **bucketed by term**: query-time term lookups
  join against the bucket files without shuffling the index (verified
  shuffle-free in tests/test_plans.py for bucketed joins), and the
  bucket count is the only knob that needs to grow with corpus size.
* Index rows carry (term, df_count, postings[(doc_id, weight)]) — the
  postings array keeps each term's data contiguous, so a k-term query
  reads exactly k rows' worth of bytes plus bucket metadata.
* Rebuilds are append-free full swaps (write to a new table/path, then
  repoint) — the same immutable-artifact discipline as the reference's
  HDFS output directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources import load
from .text_search import tfidf


def build_index(spark, sf_dir: str, table: str, path: str, buckets: int = 16) -> None:
    """Compute TF-IDF postings from the corpus and persist them as a
    parquet table bucketed+sorted by term."""
    w = tfidf(load(spark, sf_dir, "documents"))
    index = w.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_count"),
        F.array_sort(
            F.collect_list(F.struct(F.col("doc_id"), F.col("wt")))
        ).alias("postings"),
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        index.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, "term")
        .sortBy("term")
        .saveAsTable(table)
    )


def search_index(
    spark, table: str, terms: tuple[str, ...], k: int = 10, conjunctive: bool = True
) -> DataFrame:
    """Ranked retrieval served from the persisted index: look up the
    query terms' postings rows, explode, score, top-k.  Reads k index
    rows — never the corpus."""
    idx = spark.table(table).filter(F.col("term").isin(*terms))
    hits = idx.select(
        "term", F.explode("postings").alias("p")
    ).select("term", F.col("p.doc_id").alias("doc_id"), F.col("p.wt").alias("wt"))
    scored = hits.groupBy("doc_id").agg(
        F.round(F.sum("wt"), 4).alias("score"),
        F.countDistinct("term").alias("nterms"),
    )
    if conjunctive:
        scored = scored.filter(F.col("nterms") == len(terms))
    return (
        scored.select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )
