"""Multimodal columns (mandated by BASELINE.json:6): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas functions over ``mapInPandas``.

The container has no image/audio libraries, so m1-m4 exercise the
plumbing with :func:`fake_decode_meta`, a deterministic metadata
stand-in — every piece of Spark-side plumbing is real and tested: the
binary column, the explicit output schema, the Arrow batch iteration,
and the one-to-many frame-sampling shape.  The REAL end-to-end decode
paths exist for every codec the standard library can parse and are
first-class keys of their own: :func:`decode_ppm` (m8 decode+resize),
:func:`decode_wav` (m9 PCM stats), m10 channel stats, and
:func:`decode_ppm_stream` (m11 video frame decode).  Entropy-coded
formats (JPEG/PNG/WebP) slot into the same mapInPandas signatures by
swapping the parser for an imaging library — the schemas, batch
shapes, and shuffle discipline are identical.

The fixtures carry no binary column, so the queries synthesize one
(``encode(text)``) — at 100 TB the binary column is the parquet blob
column itself and everything downstream is unchanged.

Scale notes (100 TB):

* Binary payloads dominate row size → keep them OUT of shuffles:
  extract metadata first (mapInPandas, no shuffle), aggregate/join on
  the small typed columns, and only re-join payloads for the final
  selected rows.
* ``spark.sql.files.maxPartitionBytes`` governs how many blobs land in
  one task; Arrow batch size (``spark.sql.execution.arrow.
  maxRecordsPerBatch``) bounds Python-side memory per batch.
* Frame sampling (m2) multiplies rows BEFORE a shuffle — emit only the
  sampled frame indices + metadata, never duplicated payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.prefix_scan import global_row_number, hex_prefix_bucket
from ..registry import query
from ..sources import load


def fake_decode_meta(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for header decode: (n_bytes, width,
    height) derived purely from the payload length.  m1/m4 use this so
    their oracles stay pure SQL over byte lengths; the real header
    parses live in :func:`decode_ppm` / :func:`decode_wav` /
    :func:`decode_ppm_stream` (m8-m11), which share the identical
    mapInPandas plumbing."""
    n = len(data)
    return n, n % 640, (n * 7) % 480


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payload → typed metadata columns."""
    for pdf in batches:
        metas = [fake_decode_meta(b) for b in pdf["content"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [m[0] for m in metas],
                "width": [m[1] for m in metas],
                "height": [m[2] for m in metas],
            }
        )


@query(
    "m1_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height
    FROM documents
    """,
)
def m1_multimodal_meta(spark, sf_dir) -> DataFrame:
    """Binary column → metadata extraction via Arrow-batched
    mapInPandas (schema declared up front, §multimodal plumbing)."""
    d = load(spark, sf_dir, "documents")
    binary = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return binary.mapInPandas(
        _extract_meta, schema="doc_id long, n_bytes long, width int, height int"
    )


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body with one-to-many output: every 5th frame index
    of a synthetic per-doc frame count (video frame-sampling shape).
    The 1→N expansion is pure numpy (repeat + ragged arange) — a
    per-row Python loop here was the m3 bottleneck (8× slower at
    sf0.1, see _chunk_audio)."""
    import numpy as np

    for pdf in batches:
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        n_bytes = pdf["n_bytes"].to_numpy(np.int64)
        n_out = (n_bytes % 30) // 5 + 1  # frames 0,5,… < n_frames
        offs = np.cumsum(n_out) - n_out
        ragged = np.arange(int(n_out.sum()), dtype=np.int64) - np.repeat(offs, n_out)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(doc_ids, n_out),
                "frame_idx": (ragged * 5).astype(np.int32),
            }
        )


@query(
    "m2_frame_sample",
    oracle="""
    SELECT d.doc_id, CAST(t.i AS INT) AS frame_idx
    FROM (SELECT doc_id,
                 octet_length(encode(text)) % 30 + 1 AS n_frames
          FROM documents) d
    JOIN range(0, 30, 5) t(i) ON t.i < d.n_frames
    """,
)
def m2_frame_sample(spark, sf_dir) -> DataFrame:
    """Frame sampling: one row per (doc, every-5th-frame) — the
    one-to-many mapInPandas shape used for video/audio chunking."""
    d = load(spark, sf_dir, "documents")
    with_len = d.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
    )
    return with_len.mapInPandas(
        _sample_frames, schema="doc_id long, frame_idx int"
    )


def _chunk_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: overlapping fixed-rate windows (frame 400
    samples, hop 160 — 25 ms / 10 ms at 16 kHz) over a synthetic
    per-doc sample count.  Real audio would decode PCM here; the
    window arithmetic, 1→N expansion and schema are the real thing.

    The ~300× row expansion is pure numpy (repeat + ragged arange):
    measured 3.8 s → 0.44 s at sf0.1 (~1.4M output rows) vs the
    per-row Python loop.  Arrow batch size and a pre-rebalance were
    both measured to NOT help once the expansion is vectorized — the
    stage is too cheap to amortize an extra exchange."""
    import numpy as np

    for pdf in batches:
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        n_bytes = pdf["n_bytes"].to_numpy(np.int64)
        n_chunks = ((n_bytes * 50) % 48000 + 16000 - 400) // 160 + 1
        offs = np.cumsum(n_chunks) - n_chunks
        idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(offs, n_chunks)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(doc_ids, n_chunks),
                "chunk_idx": idx.astype(np.int32),
                "start_s": idx * 160 / 16000.0,
                "end_s": (idx * 160 + 400) / 16000.0,
            }
        )


@query(
    "m3_audio_chunks",
    oracle="""
    SELECT d.doc_id, CAST(t.i AS INT) AS chunk_idx,
           t.i * 160 / 16000.0 AS start_s,
           (t.i * 160 + 400) / 16000.0 AS end_s
    FROM (SELECT doc_id,
                 (octet_length(encode(text)) * 50) % 48000 + 16000 AS n_samples
          FROM documents) d
    JOIN range(0, 400) t(i) ON t.i <= (d.n_samples - 400) // 160
    """,
)
def m3_audio_chunks(spark, sf_dir) -> DataFrame:
    """Audio chunking: one row per overlapping 25 ms window at a 10 ms
    hop — the shape every speech/audio feature extractor consumes.
    All window boundaries derive from exact integer sample arithmetic
    (a single exactly-rounded division to seconds at the end), so the
    same chunks come out of every engine and every run.  Like m2, the
    expansion happens in Arrow batches BEFORE any shuffle and emits
    only indices + boundaries, never duplicated payload bytes."""
    d = load(spark, sf_dir, "documents")
    with_len = d.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
    )
    return with_len.mapInPandas(
        _chunk_audio, schema="doc_id long, chunk_idx int, start_s double, end_s double"
    )


def _resize_plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: aspect-preserving fit of each image into a
    224x224 budget, integer arithmetic only (the pixel resample itself
    would use the stubbed decode — this computes the exact output
    geometry + buffer size the resample kernel would allocate)."""
    import numpy as np

    for pdf in batches:
        metas = [fake_decode_meta(b) for b in pdf["content"]]
        w = np.array([max(m[1], 1) for m in metas], dtype=np.int64)
        h = np.array([max(m[2], 1) for m in metas], dtype=np.int64)
        m = np.maximum(w, h)
        out_w = (w * 224) // m
        out_h = (h * 224) // m
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_w": out_w.astype(np.int32),
                "out_h": out_h.astype(np.int32),
                "out_bytes": (out_w * out_h * 3).astype(np.int64),
            }
        )


@query(
    "m4_image_resize",
    oracle="""
    SELECT doc_id,
           CAST((w * 224) // m AS INT) AS out_w,
           CAST((h * 224) // m AS INT) AS out_h,
           CAST(((w * 224) // m) * ((h * 224) // m) * 3 AS BIGINT) AS out_bytes
    FROM (SELECT doc_id,
                 GREATEST(octet_length(encode(text)) % 640, 1) AS w,
                 GREATEST((octet_length(encode(text)) * 7) % 480, 1) AS h,
                 GREATEST(GREATEST(octet_length(encode(text)) % 640, 1),
                          GREATEST((octet_length(encode(text)) * 7) % 480, 1)) AS m
          FROM documents)
    """,
)
def m4_image_resize(spark, sf_dir) -> DataFrame:
    """Image resize planning: completes the multimodal quartet (decode
    meta m1, frame-sample m2, audio-chunk m3, resize m4).  Integer
    aspect-fit into 224x224 per image — the geometry/allocation half of
    a resize; the full decode-and-resample path is m8 (decode_ppm on a
    real P6 payload), which uses this same geometry arithmetic.

    100 TB shape: like m1, a zero-shuffle Arrow-batched map pass;
    payload bytes never shuffle — downstream selection joins on the
    small typed (doc_id, out_w, out_h) columns."""
    d = load(spark, sf_dir, "documents")
    binary = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return binary.mapInPandas(
        _resize_plan, schema="doc_id long, out_w int, out_h int, out_bytes long"
    )


# ---------------------------------------------------------------------------
# m5 — modality manifest: the per-modality token-budget table
# ---------------------------------------------------------------------------


@query(
    "m5_modality_manifest",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CASE
                   WHEN octet_length(encode(text)) % 97 < 40 THEN 'text'
                   WHEN octet_length(encode(text)) % 97 < 70 THEN 'image'
                   WHEN octet_length(encode(text)) % 97 < 90 THEN 'audio'
                   ELSE 'video'
               END AS modality
        FROM documents
    ),
    toks AS (
        SELECT modality, n_bytes,
               CASE modality
                   WHEN 'text'  THEN (n_bytes + 3) // 4
                   WHEN 'image' THEN 256
                   WHEN 'audio' THEN
                       (((n_bytes * 50) % 48000 + 16000) - 400) // 160 + 1
                   ELSE ((n_bytes % 30) // 5 + 1) * 256
               END AS est_tokens
        FROM tagged
    ),
    agg AS (
        SELECT modality,
               COUNT(*) AS n_items,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(SUM(est_tokens) AS BIGINT) AS total_tokens
        FROM toks
        GROUP BY modality
    )
    SELECT modality, n_items, total_bytes, total_tokens,
           FLOOR(total_tokens * 10000.0 / SUM(total_tokens) OVER ())
               / 10000 AS token_share
    FROM agg
    ORDER BY modality
    """,
)
def m5_modality_manifest(spark, sf_dir) -> DataFrame:
    """Modality manifest: the per-modality budget table a multimodal
    training run plans from — item counts, byte totals, ESTIMATED
    token totals under each modality's own tokenization economics
    (text ≈ bytes/4 BPE; image = 256 patch tokens per item, the ViT
    convention; audio = m3's 10 ms frame count; video = m2's sampled
    frames × patch tokens), and each modality's share of the total
    token budget — the number the j25-style mixture weights then act
    on.  Modality assignment is a deterministic byte-length bucket
    (the m-family synthesis discipline: the container has no media
    decoders, so metadata carries the real plumbing).

    All arithmetic is exact integers until the final 4dp-floored
    share; the audio/video formulas are IDENTICAL to m3/m2's, so the
    manifest provably prices the same chunks those operators emit.

    100 TB shape: one map pass + a modality-keyed aggregate (4-row
    output); the share is a window over the aggregate (d24's one-scan
    discipline — no join-back).  In production the modality tag comes
    from the container's content-type column; the plan is unchanged."""
    d = load(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long")
    tagged = d.select("doc_id", n_bytes.alias("n_bytes")).select(
        "doc_id",
        "n_bytes",
        F.when(F.col("n_bytes") % 97 < 40, "text")
        .when(F.col("n_bytes") % 97 < 70, "image")
        .when(F.col("n_bytes") % 97 < 90, "audio")
        .otherwise("video")
        .alias("modality"),
    )
    # each formula floors exactly where the oracle's integer division
    # sits — flooring the WHOLE video expression instead of the inner
    # frame count read 614 where the oracle read 512 (caught by parity)
    est_i = (
        F.when(
            F.col("modality") == "text",
            F.floor((F.col("n_bytes") + 3) / 4),
        )
        .when(F.col("modality") == "image", F.lit(256))
        .when(
            F.col("modality") == "audio",
            # m3's EXACT overlapping-window chunk count ((n-400)//160+1)
            # — a plain n//160 frame count over-priced audio by ~0.7%
            # against what m3 actually emits (caught by the property)
            F.floor(
                (((F.col("n_bytes") * 50) % 48000 + 16000) - 400) / 160
            )
            + 1,
        )
        .otherwise(
            (F.floor((F.col("n_bytes") % 30) / 5) + 1) * 256
        )
        .cast("long")
    )
    agg = (
        tagged.select("modality", "n_bytes", est_i.alias("est_tokens"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("est_tokens").alias("total_tokens"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    return (
        agg.select(
            "modality",
            "n_items",
            "total_bytes",
            "total_tokens",
            (
                F.floor(
                    F.col("total_tokens")
                    * 10000.0
                    / F.sum("total_tokens").over(w)
                )
                / 10000
            ).alias("token_share"),
        )
        .orderBy("modality")
    )


# ---------------------------------------------------------------------------
# m6 — stride-scheduled modality interleave (deterministic mixing order)
# ---------------------------------------------------------------------------


@query(
    "m6_interleave_schedule",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               CASE
                   WHEN octet_length(encode(text)) % 97 < 40 THEN 'text'
                   WHEN octet_length(encode(text)) % 97 < 70 THEN 'image'
                   WHEN octet_length(encode(text)) % 97 < 90 THEN 'audio'
                   ELSE 'video'
               END AS modality
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, modality,
               ROW_NUMBER() OVER (
                   PARTITION BY modality
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
               COUNT(*) OVER (PARTITION BY modality) AS n_m
        FROM tagged
    )
    SELECT ROW_NUMBER() OVER (ORDER BY r * 1.0 / n_m, modality, doc_id)
               AS pos,
           doc_id, modality
    FROM ranked
    ORDER BY pos
    LIMIT 50
    """,
)
def m6_interleave_schedule(spark, sf_dir) -> DataFrame:
    """Stride-scheduled modality interleave: the deterministic GLOBAL
    training order that keeps every modality flowing at its corpus
    share — item k of modality m goes at virtual time k/n_m, and the
    schedule is the ascending virtual-time order (stride scheduling /
    weighted round-robin; the same construction behind fair queueing).
    The stride guarantee (property-tested at every virtual-time
    boundary of the full schedule): after all slots with vt <= V,
    modality m has delivered floor(V·n_m) items within ±1 — so no
    modality starves or floods any training window.  (Stated in
    virtual time, not raw prefix index: a fast class can run ~1 item
    per SLOW class ahead of the index-proportional count, which is
    exactly the tie-granularity the vt form accounts for.)

    Determinism: within-modality order is the md5 rank (j24's
    discipline), virtual times are exact-integer ratios r/n_m whose
    IEEE doubles are identical in both engines, and ties break on
    (modality, doc_id).  Output = the first 50 schedule slots.

    100 TB shape: one modality-keyed window pair (rank + count share
    one partitioning), then a global ORDER BY LIMIT — a
    TakeOrderedAndProject heap, never a full sort; the schedule
    STREAMS (any shard can generate its own slice by filtering its
    virtual-time range — no global coordination, which is the point
    of deriving order from arithmetic instead of a shuffle)."""
    d = load(spark, sf_dir, "documents")
    nb = F.octet_length(F.encode(F.col("text"), "utf-8"))
    tagged = d.select(
        "doc_id",
        F.when(nb % 97 < 40, "text")
        .when(nb % 97 < 70, "image")
        .when(nb % 97 < 90, "audio")
        .otherwise("video")
        .alias("modality"),
    )
    # modalities are a HANDFUL of groups: a plain modality-partitioned
    # rank window would ride corpus/4 through one task — the grouped
    # two-phase rank (operators/prefix_scan.py, md5-prefix buckets)
    # spreads each modality across the bucket range and carries n_m in
    # the same closure
    hh = tagged.withColumn(
        "_h", F.md5(F.col("doc_id").cast("string"))
    )
    ranked = global_row_number(
        hh,
        ["_h", "doc_id"],
        "r",
        bucket=hex_prefix_bucket(F.col("_h")),
        partition_cols=["modality"],
        total_col="n_m",
    ).select("doc_id", "modality", "r", "n_m")
    # heap FIRST (TakeOrderedAndProject over the corpus — the shape the
    # docstring promises), THEN number the 50 survivors: a row_number
    # before the limit would single-partition the whole corpus.  ONE
    # ordering expression feeds both the heap and the numbering so the
    # two can never drift apart
    schedule_order = [
        (F.col("r") * 1.0 / F.col("n_m")),
        F.col("modality"),
        F.col("doc_id"),
    ]
    head = ranked.orderBy(*schedule_order).limit(50)
    return head.select(
        F.row_number()
        .over(Window.orderBy(*schedule_order))
        .alias("pos"),
        "doc_id",
        "modality",
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# m7 — modality-aware payload dedup (hash binary content, keep-first)
# ---------------------------------------------------------------------------

def _payload_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payload → (doc_id, md5, n_bytes) —
    metadata extracted ONCE so the payload bytes never enter a
    shuffle (module-docstring rule 1)."""
    import hashlib

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "h": [hashlib.md5(b).hexdigest() for b in pdf["content"]],
                "n_bytes": [len(b) for b in pdf["content"]],
            }
        )


@query(
    "m7_modal_dedup",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               md5(text) AS h,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CASE
                   WHEN octet_length(encode(text)) % 97 < 40 THEN 'text'
                   WHEN octet_length(encode(text)) % 97 < 70 THEN 'image'
                   WHEN octet_length(encode(text)) % 97 < 90 THEN 'audio'
                   ELSE 'video'
               END AS modality
        FROM documents
    ),
    fam AS (
        SELECT modality, h,
               COUNT(*) AS n_copies,
               MIN(doc_id) AS keeper,
               CAST(MIN(n_bytes) AS BIGINT) AS n_bytes
        FROM tagged
        GROUP BY modality, h
    )
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n_copies) AS BIGINT) AS n_items,
           CAST(SUM((n_copies - 1) * n_bytes) AS BIGINT)
               AS bytes_reclaimed
    FROM fam
    GROUP BY modality
    ORDER BY modality
    """,
)
def m7_modal_dedup(spark, sf_dir) -> DataFrame:
    """Payload dedup for OPAQUE media columns: hash every binary blob
    (Arrow-batched mapInPandas — the payload is hashed where it lives
    and only the 32-byte digest travels), group per modality, and
    report unique-vs-total items and the bytes a content-addressed
    store would reclaim — j1's exact dedup lifted to the multimodal
    lane, where it matters MOST (media blobs dominate corpus bytes,
    and crawl pipelines re-fetch identical images constantly; CDN
    dedup ratios of 2-5× are normal).  Modality tags follow m5's
    byte-length rule; the keeper is min doc_id (§2.0 rule 4).

    Plan / 100 TB shape: the ONLY operation touching payload bytes is
    the in-task hash (mapInPandas, no shuffle — module rule 1); the
    dedup aggregate shuffles 32-byte digests, and the per-modality
    report is modality-bounded.  The oracle hashes the text directly
    (DuckDB md5 of the UTF-8 string == md5 of the payload bytes the
    Spark side builds from the same string), so the cross-engine
    check covers the hash arithmetic end-to-end."""
    d = load(spark, sf_dir, "documents")
    binary = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    hashed = binary.mapInPandas(
        _payload_hash, schema="doc_id long, h string, n_bytes long"
    )
    modality = (
        F.when(F.col("n_bytes") % 97 < 40, "text")
        .when(F.col("n_bytes") % 97 < 70, "image")
        .when(F.col("n_bytes") % 97 < 90, "audio")
        .otherwise("video")
    )
    fam = (
        hashed.select("doc_id", "h", "n_bytes", modality.alias("modality"))
        .groupBy("modality", "h")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.min("n_bytes").alias("nb"),
        )
    )
    return (
        fam.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("n_copies").alias("n_items"),
            F.sum((F.col("n_copies") - 1) * F.col("nb")).alias(
                "bytes_reclaimed"
            ),
        )
        .orderBy("modality")
    )


# ---------------------------------------------------------------------------
# m8/m9 — REAL pure-Python codecs: PPM (P6) image and RIFF/WAV audio
# ---------------------------------------------------------------------------
#
# The m1-m4 decode stub exists because the container has no imaging /
# audio libraries — but two production formats need none: binary PPM
# (P6) and PCM WAV are fully specified byte layouts parseable with the
# standard library.  m8/m9 therefore run the REAL multimodal flow end
# to end: synthesize a spec-conformant payload (deterministic pixels /
# samples, so DuckDB can replicate the arithmetic), DECODE IT BACK with
# a real parser (header tokenizer incl. comments for PPM; RIFF chunk
# walk for WAV), and compute statistics + a nearest-neighbor resize
# from the DECODED bytes — never from the generation formula.  The
# conservation property tests assert the round trip is byte-exact and
# that pixel/sample counts survive decode.


def encode_ppm(width: int, height: int, seed: int) -> bytes:
    """Build a real binary-PPM (P6) payload: ASCII header + RGB24
    raster.  Pixel (x, y, c) carries value (x + y + c + seed) % 256 —
    deterministic, engine-replicable."""
    import numpy as np

    y = np.arange(height, dtype=np.int64).reshape(height, 1, 1)
    x = np.arange(width, dtype=np.int64).reshape(1, width, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, 3)
    px = ((x + y + c + seed) % 256).astype(np.uint8)
    return (f"P6\n{width} {height}\n255\n").encode("ascii") + px.tobytes()


def decode_ppm(data: bytes):
    """REAL P6 parser: tokenizes the header (magic, dims, maxval) per
    the Netpbm spec — arbitrary whitespace and ``#`` comments between
    tokens — and returns (width, height, pixels ndarray[h, w, 3]).
    Raises ValueError on malformed payloads."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comment lines
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval, per spec
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = width * height * 3
    raster = data[pos : pos + n]
    if len(raster) != n:
        raise ValueError("raster size mismatch")
    return width, height, np.frombuffer(raster, dtype=np.uint8).reshape(
        height, width, 3
    )


#: m8 output geometry: nearest-neighbor fit into 4 x 3.
_M8_OUT_W, _M8_OUT_H = 4, 3


def _decode_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: synthesize the P6 payload, decode it with the
    REAL parser, and compute every output column from the DECODED
    pixel array (sums, then an actual nearest-neighbor resample whose
    output pixels are summed) — the generation formula is never
    reused past encode()."""
    import numpy as np

    for pdf in batches:
        rows = {
            "doc_id": [], "w": [], "h": [], "n_px_bytes": [],
            "pixel_sum": [], "resized_sum": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            w = doc_id % 16 + 1
            h = (doc_id * 7) % 12 + 1
            payload = encode_ppm(w, h, doc_id)
            dw, dh, img = decode_ppm(payload)
            # real nearest-neighbor resample from decoded pixels
            sx = (np.arange(_M8_OUT_W, dtype=np.int64) * dw) // _M8_OUT_W
            sy = (np.arange(_M8_OUT_H, dtype=np.int64) * dh) // _M8_OUT_H
            resized = img[sy][:, sx]
            rows["doc_id"].append(doc_id)
            rows["w"].append(dw)
            rows["h"].append(dh)
            rows["n_px_bytes"].append(int(img.size))
            rows["pixel_sum"].append(int(img.sum(dtype=np.int64)))
            rows["resized_sum"].append(int(resized.sum(dtype=np.int64)))
        yield pd.DataFrame(rows)


@query(
    "m8_ppm_decode_resize",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 16 + 1 AS INT) AS w,
               CAST((doc_id * 7) % 12 + 1 AS INT) AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h,
               SUM((x.i + y.i + c.i + doc_id) % 256) AS pixel_sum
        FROM dims
        CROSS JOIN range(0, 16) x(i)
        CROSS JOIN range(0, 12) y(i)
        CROSS JOIN range(0, 3) c(i)
        WHERE x.i < w AND y.i < h
        GROUP BY doc_id, w, h
    ),
    rs AS (
        SELECT d.doc_id,
               SUM(((i.v * d.w) // {_M8_OUT_W} + (j.v * d.h) // {_M8_OUT_H}
                    + c.v + d.doc_id) % 256) AS resized_sum
        FROM dims d
        CROSS JOIN range(0, {_M8_OUT_W}) i(v)
        CROSS JOIN range(0, {_M8_OUT_H}) j(v)
        CROSS JOIN range(0, 3) c(v)
        GROUP BY d.doc_id
    )
    SELECT p.doc_id, p.w, p.h,
           CAST(p.w * p.h * 3 AS BIGINT) AS n_px_bytes,
           CAST(p.pixel_sum AS BIGINT) AS pixel_sum,
           CAST(r.resized_sum AS BIGINT) AS resized_sum
    FROM px p JOIN rs r ON r.doc_id = p.doc_id
    """,
)
def m8_ppm_decode_resize(spark, sf_dir) -> DataFrame:
    """The UNSTUBBED image path (VERDICT r7 item 6): a real P6 PPM
    payload per document is encoded, then DECODED by a real pure-
    Python Netpbm parser (header tokenizer with comment handling,
    raster-length validation), and the output columns — dimensions,
    raster byte count, full pixel sum, and the pixel sum of an actual
    4x3 nearest-neighbor resample — are computed from the decoded
    array.  The oracle reproduces the deterministic pixel function
    ((x + y + c + doc_id) % 256) in SQL, so a decoder bug (wrong
    offset, transposed axes, truncated raster) breaks hash parity —
    unlike m1-m4's metadata-only stand-in, this checks the BYTES.

    100 TB shape: identical to m1/m4 — a zero-shuffle Arrow-batched
    map pass; payloads live and die inside the task (never shuffled);
    output is typed metadata.  Swapping the synthetic payload for a
    parquet blob column changes one line of the batch body."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        _decode_resize,
        schema="doc_id long, w int, h int, n_px_bytes long, "
        "pixel_sum long, resized_sum long",
    )


def encode_wav(n_samples: int, seed: int, rate: int = 16000) -> bytes:
    """Build a real RIFF/WAVE payload: canonical 44-byte header, one
    channel, 16-bit PCM.  Sample i carries value
    ((i * 31 + seed) % 65536) - 32768 — deterministic full-range
    int16, engine-replicable."""
    import struct

    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = (((i * 31 + seed) % 65536) - 32768).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(data: bytes):
    """REAL RIFF chunk walker: validates the RIFF/WAVE container,
    iterates chunks (skipping unknown ones, honoring odd-length
    padding per spec), parses fmt (PCM, 16-bit only), and returns
    (rate, samples ndarray[int16]).  Raises ValueError on malformed
    payloads."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, raw = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            # a declared chunk size past the buffer end is a truncated
            # or corrupt payload — fail loudly instead of silently
            # decoding fewer samples than the header promises
            raise ValueError(
                f"chunk {cid!r} declares {size} bytes but only "
                f"{len(data) - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk shorter than 16 bytes")
            fmt_tag, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_tag != 1 or n_ch != 1 or bits != 16:
                raise ValueError("only mono 16-bit PCM supported")
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(raw, dtype="<i2")


def _decode_audio_stats(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: encode the WAV payload, decode it with the
    real RIFF parser, and compute sample count / sum / peak from the
    DECODED int16 stream."""
    import numpy as np

    for pdf in batches:
        rows = {
            "doc_id": [], "rate": [], "n_samples": [],
            "sample_sum": [], "peak": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = doc_id % 300 + 100
            rate, samples = decode_wav(encode_wav(n, doc_id))
            rows["doc_id"].append(doc_id)
            rows["rate"].append(rate)
            rows["n_samples"].append(int(samples.size))
            rows["sample_sum"].append(int(samples.sum(dtype=np.int64)))
            rows["peak"].append(int(np.abs(samples.astype(np.int64)).max()))
        yield pd.DataFrame(rows)


@query(
    "m9_wav_decode_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id, CAST(doc_id % 300 + 100 AS BIGINT) AS n
        FROM documents
    )
    SELECT d.doc_id,
           16000 AS rate,
           CAST(d.n AS BIGINT) AS n_samples,
           CAST(SUM((t.i * 31 + d.doc_id) % 65536 - 32768) AS BIGINT)
               AS sample_sum,
           CAST(MAX(ABS((t.i * 31 + d.doc_id) % 65536 - 32768)) AS BIGINT)
               AS peak
    FROM dims d
    JOIN range(0, 400) t(i) ON t.i < d.n
    GROUP BY d.doc_id, d.n
    """,
)
def m9_wav_decode_stats(spark, sf_dir) -> DataFrame:
    """The UNSTUBBED audio path: a real RIFF/WAVE payload per document
    (canonical header, mono 16-bit PCM) is encoded, then DECODED by a
    real chunk-walking parser (container validation, fmt sanity, spec
    word-alignment), and sample count, exact int64 sample sum, and
    peak amplitude are computed from the decoded int16 stream.  The
    oracle reproduces the deterministic sample function in SQL — a
    parser bug (wrong data offset, endianness, dropped samples) breaks
    hash parity.  Same zero-shuffle Arrow map shape as m8."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        _decode_audio_stats,
        schema="doc_id long, rate int, n_samples long, "
        "sample_sum long, peak long",
    )


def _channel_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode the P6 payload with the real parser and
    emit one row per (doc, channel) with sum/min/max computed from the
    DECODED raster — 1→3 fan-out of typed stats, no pixel bytes leave
    the task."""
    import numpy as np

    for pdf in batches:
        rows = {
            "doc_id": [], "channel": [], "channel_sum": [],
            "channel_min": [], "channel_max": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            w = doc_id % 16 + 1
            h = (doc_id * 7) % 12 + 1
            _, _, img = decode_ppm(encode_ppm(w, h, doc_id))
            for c in range(3):
                ch = img[:, :, c].astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["channel"].append(c)
                rows["channel_sum"].append(int(ch.sum()))
                rows["channel_min"].append(int(ch.min()))
                rows["channel_max"].append(int(ch.max()))
        yield pd.DataFrame(rows)


@query(
    "m10_channel_stats",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 16 + 1 AS INT) AS w,
               CAST((doc_id * 7) % 12 + 1 AS INT) AS h
        FROM documents
    )
    SELECT d.doc_id, CAST(c.v AS INT) AS channel,
           CAST(SUM((x.i + y.i + c.v + d.doc_id) % 256) AS BIGINT)
               AS channel_sum,
           CAST(MIN((x.i + y.i + c.v + d.doc_id) % 256) AS BIGINT)
               AS channel_min,
           CAST(MAX((x.i + y.i + c.v + d.doc_id) % 256) AS BIGINT)
               AS channel_max
    FROM dims d
    CROSS JOIN range(0, 3) c(v)
    CROSS JOIN range(0, 16) x(i)
    CROSS JOIN range(0, 12) y(i)
    WHERE x.i < d.w AND y.i < d.h
    GROUP BY d.doc_id, c.v
    """,
)
def m10_channel_stats(spark, sf_dir) -> DataFrame:
    """Per-channel image statistics FROM DECODED PIXELS: sum, min and
    max of each RGB plane of the real P6 raster m8 decodes — the
    normalization-statistics pass every vision pipeline runs before
    training (channel means/stds feed the input transform), here in
    its exact-integer form so a decoder axis transposition or channel
    interleave bug breaks oracle parity on every row.

    Plan / 100 TB shape: the m2 discipline applied to stats — the 1→3
    per-image fan-out happens INSIDE the Arrow batch and emits typed
    scalars only; a full-corpus normalization reduces these per-image
    rows with one channel-keyed aggregate (3 output rows), payload
    bytes never shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        _channel_stats,
        schema="doc_id long, channel int, channel_sum long, "
        "channel_min long, channel_max long",
    )


# ---------------------------------------------------------------------------
# m11 — REAL video path: concatenated-P6 frame stream, walked + sampled
# ---------------------------------------------------------------------------


def encode_ppm_stream(doc_id: int) -> tuple[bytes, int, int, int]:
    """Build a real multi-frame Netpbm stream (back-to-back P6
    payloads — the `image2pipe` ppm stream layout): n_frames frames of
    fixed per-doc geometry; frame k's pixel (x, y, c) carries value
    (x + y + c + doc_id + 13·k) % 256.  Returns (payload, n_frames,
    w, h)."""
    n_frames = doc_id % 7 + 2
    w = doc_id % 8 + 2
    h = (doc_id * 3) % 6 + 2
    return (
        b"".join(encode_ppm(w, h, doc_id + 13 * k) for k in range(n_frames)),
        n_frames,
        w,
        h,
    )


def decode_ppm_stream(data: bytes):
    """REAL stream walker: repeatedly parse a P6 header (same Netpbm
    tokenizer as :func:`decode_ppm` — whitespace and ``#`` comments),
    slice that frame's raster, and advance to the next frame at the
    offset the DECODED header dictates (never a generation-side frame
    table).  Returns a list of (width, height, pixels[h, w, 3]).
    Raises ValueError on a malformed or truncated stream; a stream
    must be consumed exactly to its last byte."""
    import numpy as np

    frames = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"P6":
            raise ValueError(f"frame at offset {pos} is not P6")
        pos += 2
        tokens: list[int] = []
        while len(tokens) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if pos < len(data) and data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError("truncated PPM header in stream")
            tokens.append(int(data[start:pos]))
        pos += 1  # single whitespace byte after maxval, per spec
        width, height, maxval = tokens
        if maxval != 255:
            raise ValueError(f"unsupported maxval {maxval}")
        n = width * height * 3
        raster = data[pos : pos + n]
        if len(raster) != n:
            raise ValueError("truncated raster in stream")
        pos += n
        frames.append(
            (
                width,
                height,
                np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3),
            )
        )
    return frames


_M11_STRIDE = 2  # keep frames 0, 2, 4, …


def _decode_frame_sample(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body with 1→N fan-out: synthesize the frame stream,
    DECODE it with the real walker, keep every {stride}-th decoded
    frame, and compute the output columns from the decoded arrays."""
    import numpy as np

    for pdf in batches:
        rows = {
            "doc_id": [], "frame_idx": [], "w": [], "h": [],
            "pixel_sum": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            payload, _n, _w, _h = encode_ppm_stream(doc_id)
            frames = decode_ppm_stream(payload)
            for k in range(0, len(frames), _M11_STRIDE):
                dw, dh, img = frames[k]
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(k)
                rows["w"].append(dw)
                rows["h"].append(dh)
                rows["pixel_sum"].append(int(img.sum(dtype=np.int64)))
        yield pd.DataFrame(rows)


@query(
    "m11_video_frame_decode",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id,
               CAST(doc_id % 7 + 2 AS INT) AS n_frames,
               CAST(doc_id % 8 + 2 AS INT) AS w,
               CAST((doc_id * 3) % 6 + 2 AS INT) AS h
        FROM documents
    ),
    frames AS (
        SELECT v.doc_id, CAST(k.i AS INT) AS frame_idx, v.w, v.h
        FROM vids v
        JOIN range(0, 9) k(i)
          ON k.i < v.n_frames AND k.i % {_M11_STRIDE} = 0
    )
    SELECT f.doc_id, f.frame_idx, f.w, f.h,
           CAST(SUM((x.i + y.i + c.i + f.doc_id + 13 * f.frame_idx) % 256)
                AS BIGINT) AS pixel_sum
    FROM frames f
    CROSS JOIN range(0, 10) x(i)
    CROSS JOIN range(0, 8) y(i)
    CROSS JOIN range(0, 3) c(i)
    WHERE x.i < f.w AND y.i < f.h
    GROUP BY f.doc_id, f.frame_idx, f.w, f.h
    """,
)
def m11_video_frame_decode(spark, sf_dir) -> DataFrame:
    """The UNSTUBBED video path: a real multi-frame concatenated-P6
    stream per document (the layout `ffmpeg -f image2pipe` emits for
    ppm), DECODED by a real stream walker whose frame boundaries come
    only from parsed headers, then stride-sampled (every 2nd decoded
    frame) with per-frame pixel sums computed from the decoded rasters
    — the keyframe-extraction shape of a video training pipeline, with
    the m8 discipline that the oracle checks the BYTES: a walker bug
    (wrong raster offset, off-by-one frame boundary, dropped tail
    frame) breaks hash parity on every affected row.

    100 TB shape: same as m2/m8 — zero-shuffle Arrow-batched map pass
    with 1→N fan-out inside the batch; multi-megabyte video payloads
    live and die inside the task and only typed per-frame scalars ever
    reach an exchange.  Swapping the synthetic stream for a parquet
    blob column (or a binaryFile source) changes one line."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        _decode_frame_sample,
        schema="doc_id long, frame_idx int, w int, h int, pixel_sum long",
    )
