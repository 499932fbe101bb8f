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

from ..sources import rebalance
from .index_store import (
    apply_tombstones_in_compaction,
    assert_batch_not_tombstoned,
    assert_manifest_consistent,
    assert_sidecar_populated,
    build_write_lease,
    clear_tombstones,
    compact_store,
    record_tombstones,
    refresh_store,
    reset_manifest,
    stamp_manifest,
    store_write_lease,
    table_buckets as _table_buckets,
    tombstones_df,
    write_store_meta,
)
from .llm_pipeline import shingle_sets
from .llm_scale import (
    _N_BANDS,
    _N_HASH,
    _ROWS_PER_BAND,
    _text_band_table,
    doc_shingle_sets,
    text_band_table,
)


def build_dedup_index(spark, sf_dir: str, table: str, path: str,
                      buckets: int = 16,
                      docs: DataFrame | None = None) -> None:
    """Persist the MinHash band index + shingle-set sidecar for online
    probing.  Without ``docs`` both inputs are served from the
    session's MATERIALIZED artifacts (text_band_table /
    doc_shingle_sets), so a session whose batch pipeline already ran
    pays only the two writes — the 16-md5 signature pass is never
    recomputed here; at 100 TB this is the artifact the dedup job
    already writes.  ``docs`` (a (doc_id, text) frame) builds over a
    custom corpus instead — the property tests' entry point.

    Each table also gets a ``_meta.json`` sidecar so a FRESH process
    (the CLI) can re-register the files with the full bucketing spec
    instead of a plain external table (see register_external_store)."""
    with build_write_lease(spark, table, path, "build_dedup_index"):
        if docs is None:
            band = text_band_table(spark, sf_dir)
            sets = doc_shingle_sets(spark, sf_dir)
        else:
            # a doc_id occurring twice in the build frame would double its
            # sidecar/band rows (duplicating every future probe hit):
            # collapse to one arbitrary representative — same contract as
            # the append lane
            sets = shingle_sets(rebalance(docs.dropDuplicates(["doc_id"])))
            band = _text_band_table(sets)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            band.write.mode("overwrite")
            .option("path", path)
            .bucketBy(buckets, "bk")
            .sortBy("bk")
            .saveAsTable(table)
        )
        write_store_meta(band, path, buckets, "bk")
        spark.sql(f"DROP TABLE IF EXISTS {table}_sets")
        (
            sets.write.mode("overwrite")
            .option("path", f"{path.rstrip('/')}_sets")
            .bucketBy(buckets, "doc_id")
            .sortBy("doc_id")
            .saveAsTable(f"{table}_sets")
        )
        write_store_meta(sets, f"{path.rstrip('/')}_sets", buckets, "doc_id")
        clear_tombstones(spark, table, path)
        reset_manifest(spark, table, spark.table(f"{table}_sets").count())


def compact_dedup_index(spark, table: str, new_path: str) -> None:
    """One-file-per-bucket rewrite of an append-accumulated dedup store
    (immutable swap to ``new_path`` — see index_store.compact_store).
    Reads the persisted band/shingle rows; the corpus is never
    re-signed.  Refuses a store whose sidecar is missing — compaction
    would otherwise rewrite the corruption into a fresh-looking store
    with new meta sidecars; runs under the single-writer lease (a
    compactor IS a writer), anchored at BOTH the current and the new
    base so the mid-swap repoint can't let a second writer in."""
    with store_write_lease(spark, table, extra_paths=(new_path,)):
        assert_sidecar_populated(spark, table, "_sets",
                                 "compact_dedup_index", use_memo=False)
        assert_manifest_consistent(spark, table, "_sets",
                                   "compact_dedup_index", use_memo=False)
        # a deleting compaction: every part anti-joins the tombstoned
        # doc_ids during its rewrite, then the tombstone table retires
        # and the manifest records the negative delta
        tombs = tombstones_df(spark, table)
        transforms = None
        if tombs is not None:
            minus = lambda df: df.join(  # noqa: E731
                tombs.select("doc_id"), "doc_id", "left_anti"
            )
            transforms = {"": minus, "_sets": minus}
        compact_store(spark, table, new_path,
                      [("", "bk"), ("_sets", "doc_id")],
                      transforms=transforms)
        if tombs is not None:
            apply_tombstones_in_compaction(spark, table, "_sets",
                                           new_path)


def append_dedup_index(spark, table: str, docs: DataFrame,
                       shard_id: str | None = None,
                       lease_stale_sec: float = 3600.0) -> None:
    """Append a NEW batch's band rows + shingle sets into the persisted
    index tables — the index-maintenance half of the incremental story:
    j84 decides a daily shard against the corpus without rescanning it,
    and this makes the index itself roll forward at batch-sized cost
    (sign ONLY the batch, two bucketed appends) instead of a rebuild.
    Appended files land in the same bucket layout (the writer's spec
    must match the table's or Spark refuses), so probe-time bucket
    pruning keeps working across build ∪ append; probe-equivalence
    with a full rebuild is pinned by
    test_append_dedup_index_equals_rebuild.

    The batch is signed twice (once per table write) — batch-sized
    work, and keeping the two writer plans independent beats a
    checkpoint for shards that fit the daily-ingest budget.

    IDEMPOTENT on replayed ids: intra-batch duplicate doc_ids collapse
    to one arbitrary representative FIRST (the anti-join only removes
    ids already IN THE SIDECAR, so a dirty shard carrying the same
    doc_id twice would otherwise double-index it — two sidecar rows,
    two probe result rows), then already-indexed doc_ids are
    anti-joined out against the shingle sidecar (batch-sized work —
    the sidecar side is doc_id-bucketed, read in place), so
    re-ingesting a shard never double-indexes a document (which would
    duplicate probe result rows — probe_dedup's candidate list is
    distinct but the sidecar join is not).

    SINGLE-WRITER: the refresh→anti-join→write→stamp sequence runs
    under :func:`index_store.store_write_lease` (a second live
    appender refuses by name; crashed holders are taken over after
    ``lease_stale_sec``), and the ingest manifest is cross-checked
    before the writes and stamped with the shard's NEW id count after
    them (:func:`index_store.assert_manifest_consistent`)."""
    nb = _table_buckets(spark, table)
    with store_write_lease(spark, table, stale_sec=lease_stale_sec):
        refresh_store(spark, table, ("", "_sets"))
        assert_sidecar_populated(spark, table, "_sets",
                                 "append_dedup_index", use_memo=False)
        assert_manifest_consistent(spark, table, "_sets",
                                   "append_dedup_index", use_memo=False)
        existing = spark.table(f"{table}_sets").select("doc_id")
        docs = docs.dropDuplicates(["doc_id"])
        # BEFORE the idempotence anti-join: a tombstoned id is still
        # physically in the sidecar, so the anti-join would silently
        # swallow it instead of surfacing the refusal
        assert_batch_not_tombstoned(spark, table, "doc_id", docs,
                                    "append_dedup_index")
        docs = docs.join(existing, "doc_id", "left_anti")
        sets = shingle_sets(rebalance(docs))
        band = _text_band_table(sets)
        band.write.mode("append").bucketBy(nb, "bk").sortBy(
            "bk"
        ).saveAsTable(table)
        sets.write.mode("append").bucketBy(nb, "doc_id").sortBy(
            "doc_id"
        ).saveAsTable(f"{table}_sets")
        # refresh before the stamp count: a foreachBatch clone's writes
        # are invisible to this session's cached file listing
        spark.sql(f"REFRESH TABLE {table}_sets")
        stamp_manifest(
            spark, table, spark.table(f"{table}_sets").count(), shard_id
        )


def delete_from_dedup_index(spark, table: str, ids,
                            lease_stale_sec: float = 3600.0) -> dict:
    """Tombstone documents in a persisted dedup store (takedown /
    contamination removal without a rebuild — index_store.py's
    tombstone section): from the next call on, ``probe_dedup`` and
    ``shard_dedup_decisions`` never return a deleted doc_id (their
    candidate sets anti-join the tombstones), appends of a tombstoned
    id REFUSE (compaction frees it), and the next
    ``compact_dedup_index`` removes the rows physically and retires
    the tombstones.  ``ids`` is an iterable of doc_ids or a DataFrame
    with a ``doc_id`` column; returns the reconciliation counts
    (requested / deleted / already_deleted / not_indexed).  Runs under
    the single-writer lease with the store guards — a deleter is a
    writer."""
    with store_write_lease(spark, table, stale_sec=lease_stale_sec):
        refresh_store(spark, table, ("", "_sets"))
        assert_sidecar_populated(spark, table, "_sets",
                                 "delete_from_dedup_index",
                                 use_memo=False)
        assert_manifest_consistent(spark, table, "_sets",
                                   "delete_from_dedup_index",
                                   use_memo=False)
        return record_tombstones(spark, table, "_sets", "doc_id", ids,
                                 "delete_from_dedup_index")


def shard_dedup_decisions(spark, table: str, docs: DataFrame,
                          theta: float = 0.8) -> DataFrame:
    """(doc_id, decision, dup_of) for EVERY document of a shard against
    the persisted store — j84's greedy-pairwise delta fold
    (ann.delta_dedup_decisions's rule: drop behind the min corpus
    near-dup, else the min smaller-id batch near-dup, else keep)
    served from the store as ONE distributed job, the shape an
    ingestion service actually runs (``probe-shard-dedup`` in the
    CLI writes the result as a decisions parquet).  ``probe_dedup``
    is the one-document interactive twin; decision parity of this
    fold with j84's batch output is pinned in tests.

    Plan shape: the shard is banded ONCE (batch-sized, the same
    Spark derivation the store was built with); corpus candidates
    come from a (b, bk) equi-join into the band table (the store
    side rides its bk bucketing; the shard side shuffles
    batch-sized rows); within-shard candidates from a band
    self-join (batch²-bounded by bucket collisions, not all
    pairs); both verify via exact shingle Jaccard ≥ theta against
    the respective shingle sets.  The corpus is never rescanned —
    only its colliding band rows and the candidates' sidecar rows
    are read.  A replayed shard (ids already ingested) excludes
    each document's OWN store row (``p != d``); its decisions are
    then what the original ingest would have produced."""
    assert_sidecar_populated(spark, table, "_sets",
                             "shard_dedup_decisions")
    assert_manifest_consistent(spark, table, "_sets",
                               "shard_dedup_decisions")
    docs = docs.dropDuplicates(["doc_id"])
    sets = shingle_sets(rebalance(docs))
    band = _text_band_table(sets)
    nband = band.select(F.col("doc_id").alias("d"), "b", "bk")
    cand = (
        nband.join(
            spark.table(table).select(
                F.col("doc_id").alias("p"), "b", "bk"
            ),
            ["b", "bk"],
        )
        .filter(F.col("p") != F.col("d"))
        .select("d", "p")
        .distinct()
    )
    tombs = tombstones_df(spark, table)
    if tombs is not None:
        # a tombstoned corpus document must not anchor a drop decision
        cand = cand.join(
            tombs.select(F.col("doc_id").alias("p")), "p", "left_anti"
        )
    dsets = sets.select(F.col("doc_id").alias("d"), F.col("s").alias("ds"))
    psets = spark.table(f"{table}_sets").select(
        F.col("doc_id").alias("p"), F.col("s").alias("ps")
    )
    inter = F.size(F.array_intersect("ds", "ps"))
    jac = inter / (F.size("ds") + F.size("ps") - inter)
    corpus_min = (
        cand.join(dsets, "d")
        .join(psets, "p")
        .filter(jac >= theta)
        .groupBy("d")
        .agg(F.min("p").alias("corpus_dup"))
    )
    bcand = (
        nband.join(
            band.select(F.col("doc_id").alias("p"), "b", "bk"),
            ["b", "bk"],
        )
        .filter(F.col("p") < F.col("d"))
        .select("d", "p")
        .distinct()
    )
    batch_min = (
        bcand.join(dsets, "d")
        .join(
            dsets.select(
                F.col("d").alias("p"), F.col("ds").alias("ps")
            ),
            "p",
        )
        .filter(jac >= theta)
        .groupBy("d")
        .agg(F.min("p").alias("batch_dup"))
    )
    return (
        docs.select("doc_id")
        .join(corpus_min, F.col("doc_id") == corpus_min["d"], "left")
        .drop("d")
        .join(batch_min, F.col("doc_id") == batch_min["d"], "left")
        .drop("d")
        .select(
            "doc_id",
            F.when(F.col("corpus_dup").isNotNull(), "drop_corpus_dup")
            .when(F.col("batch_dup").isNotNull(), "drop_batch_dup")
            .otherwise("keep")
            .alias("decision"),
            F.coalesce("corpus_dup", "batch_dup").alias("dup_of"),
        )
        .orderBy("doc_id")
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

    Plan: the band-index read carries a ``bk IN (probe's bucket
    keys)`` conjunct — the shape Spark's bucket-pruning extractor
    recognizes, so the scan opens ONLY the probe's bucket files
    ("SelectedBucketsCount: |bands| out of n" in the plan; the exact
    (b, bk) disjunction alone defeats the extractor and scanned all
    buckets) — plus the (b, bk) disjunction as the exact residual
    filter.  The candidate doc_ids then key a join into the
    shingle-set sidecar; the verify is one in-row array_intersect
    against the probe's shingle-array literal.  A probe that is too
    short to shingle, or whose buckets are all empty, returns an empty
    DataFrame — never an error.  A store whose _sets SIDECAR went
    missing, however, raises: every probe would otherwise answer
    'no duplicate' silently (assert_sidecar_populated).

    Threshold contract: keep/drop applies to the EXACT (unrounded)
    Jaccard — the same ``j >= theta`` cut j8's batch pipeline declares —
    and the emitted ``jaccard`` column is that same unrounded value, so
    the displayed number can never disagree with the cut at the
    boundary (a pair at true J = 0.79996 is dropped and would have
    shown as 0.79996, not a rounded 0.8; pinned by the boundary-J
    fixture in tests/test_properties.py)."""
    sh = probe_shingles(text)
    idx = spark.table(table)
    if not sh:
        # too short to shingle: empty result, no store access needed
        return (
            idx.select("doc_id").limit(0)
            .withColumn("jaccard", F.lit(0.0))
        )
    assert_sidecar_populated(spark, table, "_sets", "probe_dedup")
    assert_manifest_consistent(spark, table, "_sets", "probe_dedup")
    bands = probe_bands(sh)
    hit = None
    for b, bk in bands:
        c = (F.col("b") == b) & (F.col("bk") == bk)
        hit = c if hit is None else (hit | c)
    prune = F.col("bk").isin(*[bk for _, bk in bands])
    cand = idx.filter(prune & hit).select("doc_id").distinct()
    tombs = tombstones_df(spark, table)
    if tombs is not None:
        # deleted documents never surface as near-dups (the candidate
        # set is probe-small, so the anti-join is serve-cheap)
        cand = cand.join(tombs.select("doc_id"), "doc_id", "left_anti")
    sets = spark.table(f"{table}_sets").join(cand, "doc_id")
    probe_arr = F.array(*[F.lit(s) for s in sh])
    inter = F.size(F.array_intersect(F.col("s"), probe_arr))
    jac = inter / (F.size("s") + F.lit(len(sh)) - inter)
    return (
        sets.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= theta)
        .select("doc_id", "jaccard")
        .orderBy(F.col("jaccard").desc(), "doc_id")
    )
