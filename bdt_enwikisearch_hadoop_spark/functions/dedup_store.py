"""Persisted near-dup index + ONLINE probe — the dedup-side
build-once/serve-many artifact (index_store.py's postings pattern
applied to j8's MinHash-LSH pipeline, completing j84's incremental
story): an ingestion service asks "is this document a near-duplicate
of anything already ingested?" by banding ONLY the probe text
(pure-Python, driver-side — one document, no job) and reading the
probe's |bands| bucket rows from the persisted band index, then
exact-verifying the handful of candidates against the persisted
shingle-set sidecar.  The corpus is never rescanned per probe.

Two tables per index:

* ``{table}``       — (b, bk, doc_id) band-bucket rows, bucketed +
  sorted by bk so a probe's bucket lookup is a pushed-filter read of
  one bucket file per band instead of a scan;
* ``{table}_sets``  — (doc_id, s) the distinct-shingle arrays for the
  exact-Jaccard verify (the same persisted sidecar the batch pipeline
  writes — j21's store discipline on the text side).

Cross-engine derivation contract: the probe's Python banding MUST be
bit-identical to the corpus-side Spark banding (same lowercase /
single-space split / 3-token shingles / ``md5("{i}:" + shingle)``
minhash family / ``md5("|".join(band rows))`` bucket keys) — pinned by
a property test that recomputes EVERY fixture document's band set in
Python and compares it against the Spark band table.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from .llm_scale import (
    _N_BANDS,
    _N_HASH,
    _ROWS_PER_BAND,
    doc_shingle_sets,
    text_band_table,
)


def build_dedup_index(spark, sf_dir: str, table: str, path: str,
                      buckets: int = 16) -> None:
    """Persist the MinHash band index + shingle-set sidecar for online
    probing.  Both inputs are served from the session's MATERIALIZED
    artifacts (text_band_table / doc_shingle_sets), so a session whose
    batch pipeline already ran pays only the two writes — the 16-md5
    signature pass is never recomputed here; at 100 TB this is the
    artifact the dedup job already writes."""
    band = text_band_table(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        band.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, "bk")
        .sortBy("bk")
        .saveAsTable(table)
    )
    sets = doc_shingle_sets(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {table}_sets")
    (
        sets.write.mode("overwrite")
        .option("path", f"{path.rstrip('/')}_sets")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(f"{table}_sets")
    )


def probe_shingles(text: str, k: int = 3) -> list[str]:
    """The probe's DISTINCT k-token shingles — pure-Python replication
    of ``shingle_sets``'s derivation (lowercase, literal single-space
    split, k-grams joined by single spaces, first-occurrence dedup)."""
    toks = text.lower().split(" ")
    if len(toks) < k:
        return []
    return list(dict.fromkeys(
        " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
    ))


def probe_bands(shingles: list[str]) -> list[tuple[int, str]]:
    """(b, bk) band keys of a probe's shingle set — pure-Python
    replication of ``_text_band_table``'s minhash/band derivation.
    Hex md5 strings compare identically under Python ``min`` and
    Spark's UTF-8 string MIN (both lexicographic over ASCII)."""
    mh = [
        min(
            hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shingles
        )
        for i in range(_N_HASH)
    ]
    return [
        (
            b,
            hashlib.md5(
                "|".join(
                    mh[b * _ROWS_PER_BAND + r] for r in range(_ROWS_PER_BAND)
                ).encode()
            ).hexdigest(),
        )
        for b in range(_N_BANDS)
    ]


def probe_dedup(spark, table: str, text: str,
                theta: float = 0.8) -> DataFrame:
    """(doc_id, jaccard) of every indexed document whose exact shingle
    Jaccard with ``text`` is ≥ theta, candidates drawn ONLY from the
    probe's band buckets — the j8 contract served online.

    Plan: the band-index read carries the probe's (b, bk) disjunction
    as a pushed filter (bucketed on bk, so it opens one bucket file
    per band); the candidate doc_ids then key a join into the
    shingle-set sidecar; the verify is one in-row array_intersect
    against the probe's shingle-array literal.  A probe that is too
    short to shingle, or whose buckets are all empty, returns an empty
    DataFrame — never an error."""
    sh = probe_shingles(text)
    idx = spark.table(table)
    if not sh:
        return (
            idx.select("doc_id").limit(0)
            .withColumn("jaccard", F.lit(0.0))
        )
    bands = probe_bands(sh)
    hit = None
    for b, bk in bands:
        c = (F.col("b") == b) & (F.col("bk") == bk)
        hit = c if hit is None else (hit | c)
    cand = idx.filter(hit).select("doc_id").distinct()
    sets = spark.table(f"{table}_sets").join(cand, "doc_id")
    probe_arr = F.array(*[F.lit(s) for s in sh])
    inter = F.size(F.array_intersect(F.col("s"), probe_arr))
    jac = inter / (F.size("s") + F.lit(len(sh)) - inter)
    return (
        sets.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= theta)
        .select("doc_id", "jaccard")
        .orderBy(F.col("jaccard").desc(), "doc_id")
    )
