"""Command-line entry points — the engine as a usable tool, mirroring
the reference archetype's two programs (offline index build, online
query) plus ad-hoc corpus search:

    python -m bdt_enwikisearch_hadoop_spark.cli search spark join
    python -m bdt_enwikisearch_hadoop_spark.cli build-index /tmp/idx
    python -m bdt_enwikisearch_hadoop_spark.cli search-index /tmp/idx spark join
    python -m bdt_enwikisearch_hadoop_spark.cli search-vsm /tmp/idx spark join
    python -m bdt_enwikisearch_hadoop_spark.cli bench-key i6_search_and
    python -m bdt_enwikisearch_hadoop_spark.cli card
    python -m bdt_enwikisearch_hadoop_spark.cli dedup-report
    python -m bdt_enwikisearch_hadoop_spark.cli audit
    python -m bdt_enwikisearch_hadoop_spark.cli build-dedup-index /tmp/didx
    python -m bdt_enwikisearch_hadoop_spark.cli dedup-probe /tmp/didx some text here
    python -m bdt_enwikisearch_hadoop_spark.cli build-embedding-index /tmp/eidx
    python -m bdt_enwikisearch_hadoop_spark.cli embedding-probe /tmp/eidx --vec-id 7
    python -m bdt_enwikisearch_hadoop_spark.cli delete-from-dedup-index /tmp/didx 3,17

``search`` ranks live from the corpus (tokenize → TF-IDF → score);
``build-index``/``search-index`` split that into the reference's
build-once/serve-many shape (bucketed postings store, index_store.py);
``search-vsm`` serves i17's length-normalized cosine ranking from the
same store plus its persisted per-document norms table.  All commands
accept ``--sf-dir`` (default /root/testdata/sf0.001) and ``--k``.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F

#: the error classes every store lane converts to a clean exit-2
#: message (never a traceback): ValueError is the stores' own refusal
#: contract (missing sidecar, same-path compaction, unservable rows);
#: AnalysisException is Spark's — an unregistered table (compact
#: without --path in a fresh process), a missing/schema-less batch
#: path, a mis-registered location.
_LANE_ERRORS = (ValueError, AnalysisException)


def _spark(app: str):
    from .session import get_spark

    return get_spark(app_name=app)


def _rank_live(spark, sf_dir: str, terms: list[str], k: int, any_term: bool) -> DataFrame:
    """Parameterized form of the i6/i7 flagship: ranked retrieval for
    arbitrary terms (the declared queries pin QUERY_TERMS so the oracle
    is reproducible; the CLI is the ad-hoc surface)."""
    from .functions.text_search import tfidf
    from .sources import load

    w = tfidf(load(spark, sf_dir, "documents")).filter(F.col("term").isin(*terms))
    scored = w.groupBy("doc_id").agg(
        F.round(F.sum("wt"), 4).alias("score"),
        F.countDistinct("term").alias("nterms"),
    )
    if not any_term:
        scored = scored.filter(F.col("nterms") == len(terms))
    return (
        scored.select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def _register_store_parts(spark, table: str, path: str,
                          suffix: str) -> None:
    """Register a two-part store (main table + sidecar) in a fresh
    process's catalog from the _meta.json sidecars — the one
    registration loop every store lane shares."""
    from .functions.index_store import register_external_store

    for t, p in (
        (table, path),
        (f"{table}{suffix}", f"{path.rstrip('/')}{suffix}"),
    ):
        register_external_store(spark, t, p)


def _cli_append(spark, args, append_fn, suffix: str,
                cols: tuple[str, ...], noun: str) -> int:
    """Shared body of the three append lanes (dedup / embedding / tf):
    register the store's parts from their sidecars, validate the
    shard's contract columns, append, report the sidecar delta.  One
    place, so a fix (a new error class, a guard) lands in every lane.
    The WHOLE body runs under the lane error contract: a bad batch
    path or corrupt sidecar (registration), unservable rows or an
    unbucketed store (append) all print the message and exit 2 —
    never a traceback."""
    try:
        _register_store_parts(spark, args.table, args.path, suffix)
        batch = spark.read.parquet(args.batch)
        missing = set(cols) - set(batch.columns)
        if missing:
            print(
                f"batch parquet lacks column(s) {sorted(missing)}",
                file=sys.stderr,
            )
            return 2
        before = spark.table(f"{args.table}{suffix}").count()
        # the batch path is the natural shard id: the manifest entry
        # then names WHICH shard a later divergence investigation is
        # looking at
        append_fn(spark, args.table, batch.select(*cols),
                  shard_id=args.batch)
        after = spark.table(f"{args.table}{suffix}").count()
    except _LANE_ERRORS as exc:
        print(str(exc), file=sys.stderr)
        return 2
    print(
        f"appended {after - before} new {noun} to {args.table} "
        f"({before} -> {after})"
    )
    return 0


def _cli_compact(spark, args, compact_fn, suffix: str) -> int:
    """Shared body of the three compaction lanes (dedup / embedding /
    tf): re-register the store's parts when running in a fresh process,
    compact to the new path, exit 2 cleanly on refusal (same-path /
    unbucketed store / unregistered table when --path was omitted in a
    fresh process / corrupt sidecar) — never a traceback."""
    try:
        if args.path:
            _register_store_parts(spark, args.table, args.path, suffix)
        compact_fn(spark, args.table, args.new_path)
    except _LANE_ERRORS as exc:
        print(str(exc), file=sys.stderr)
        return 2
    print(f"compacted {args.table} to {args.new_path}")
    return 0


def _cli_delete(spark, args, delete_fn, suffix: str, id_col: str) -> int:
    """Shared body of the three delete lanes (dedup / embedding / tf):
    register the store's parts, parse the takedown list (inline
    comma-separated ids or an --ids-path parquet with the id column),
    tombstone, print the reconciliation counts.  Same lane error
    contract as append/compact: message + exit 2, never a
    traceback."""
    try:
        _register_store_parts(spark, args.table, args.path, suffix)
        if args.ids_path:
            ids = spark.read.parquet(args.ids_path)
            if id_col not in ids.columns:
                print(
                    f"ids parquet lacks column {id_col!r}",
                    file=sys.stderr,
                )
                return 2
        else:
            try:
                ids = [int(s) for s in args.ids.split(",") if s.strip()]
            except (AttributeError, ValueError):
                print(
                    "pass ids as a comma-separated integer list or via "
                    "--ids-path",
                    file=sys.stderr,
                )
                return 2
        counts = delete_fn(spark, args.table, ids)
    except _LANE_ERRORS as exc:
        print(str(exc), file=sys.stderr)
        return 2
    for k in ("requested", "deleted", "already_deleted", "not_indexed"):
        print(f"{k}\t{counts[k]}")
    return 0


def _cli_probe_shard(spark, args, fold_fn, suffix: str,
                     cols: tuple[str, ...], id_col: str) -> int:
    """Shared body of the two probe-shard lanes (dedup / embedding):
    register the store's parts, run the shard-sized delta-dedup fold
    against the persisted index, write the (id, decision, dup_of)
    decisions parquet to --out, print the decision tally.  Same lane
    error contract as append/compact: message + exit 2, never a
    traceback."""
    try:
        _register_store_parts(spark, args.table, args.path, suffix)
        batch = spark.read.parquet(args.batch)
        missing = set(cols) - set(batch.columns)
        if missing:
            print(
                f"batch parquet lacks column(s) {sorted(missing)}",
                file=sys.stderr,
            )
            return 2
        kwargs = {} if args.theta is None else {"theta": args.theta}
        decisions = fold_fn(
            spark, args.table, batch.select(*cols), **kwargs
        )
        decisions.write.mode("overwrite").parquet(args.out)
        tally = {
            r["decision"]: r["n"]
            for r in spark.read.parquet(args.out)
            .groupBy("decision")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    except _LANE_ERRORS as exc:
        print(str(exc), file=sys.stderr)
        return 2
    for k in ("keep", "drop_corpus_dup", "drop_batch_dup"):
        print(f"{k}\t{tally.get(k, 0)}")
    print(f"wrote decisions for {sum(tally.values())} {id_col}s to {args.out}")
    return 0


def _cli_serve(rows_fn, line_fn) -> int:
    """Shared serve-lane contract (search-tf / search-vsm / dedup-probe
    / embedding-probe / search-index): collect, print one line per row,
    exit 2 with the message on a store refusal (missing sidecar, bad
    probe, unregistered table, corrupt sidecar) — never a traceback."""
    try:
        rows = rows_fn()
    except _LANE_ERRORS as exc:
        print(str(exc), file=sys.stderr)
        return 2
    for row in rows:
        print(line_fn(row))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bdt-enwikisearch-spark")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("search", help="ranked retrieval live from the corpus")
    s.add_argument("terms", nargs="+")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--any", action="store_true", help="OR semantics (default AND)")

    b = sub.add_parser("build-index", help="persist the bucketed TF-IDF postings index")
    b.add_argument("path")
    b.add_argument("--table", default="cli_index")
    b.add_argument("--buckets", type=int, default=16)

    q = sub.add_parser("search-index", help="ranked retrieval served from a built index")
    q.add_argument("path")
    q.add_argument("terms", nargs="+")
    q.add_argument("--table", default="cli_index")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--any", action="store_true")

    v = sub.add_parser(
        "search-vsm",
        help="length-normalized VSM cosine retrieval from a built index",
    )
    v.add_argument("path")
    v.add_argument("terms", nargs="+")
    v.add_argument("--table", default="cli_index")
    v.add_argument("--k", type=int, default=10)

    tb = sub.add_parser(
        "build-tf-index",
        help="persist the segmented raw-TF postings index (append-capable; "
        "weights applied query-time, so appends shift scores correctly)",
    )
    tb.add_argument("path")
    tb.add_argument("--table", default="cli_tfindex")
    tb.add_argument("--buckets", type=int, default=16)

    ta = sub.add_parser(
        "append-tf-index",
        help="ingest a parquet batch of (doc_id, text) documents as a new "
        "segment of a persisted raw-TF index (writes only the batch; "
        "replayed doc_ids skipped)",
    )
    ta.add_argument("path")
    ta.add_argument("batch", help="parquet path with doc_id, text columns")
    ta.add_argument("--table", default="cli_tfindex")

    ts = sub.add_parser(
        "search-tf",
        help="ranked retrieval served from a segmented raw-TF index "
        "(same ranking contract as search-index, current N/df)",
    )
    ts.add_argument("path")
    ts.add_argument("terms", nargs="+")
    ts.add_argument("--table", default="cli_tfindex")
    ts.add_argument("--k", type=int, default=10)
    ts.add_argument("--any", action="store_true")

    tc = sub.add_parser(
        "compact-tf-index",
        help="fold accumulated segments back to one row per term and one "
        "file per bucket (immutable swap to NEW_PATH)",
    )
    tc.add_argument("new_path")
    tc.add_argument("--table", default="cli_tfindex")
    tc.add_argument("--path", default=None,
                    help="existing store location (required in a fresh "
                    "process so the catalog can be re-registered)")

    r = sub.add_parser("bench-key", help="run one registered query and print timing")
    r.add_argument("key")

    sub.add_parser("card", help="print the one-row dataset card (j63)")
    sub.add_parser(
        "dedup-report",
        help="run the scale-path dedup pipeline and print its report (j60)",
    )
    sub.add_parser(
        "audit",
        help="LSH trust audit: skew-guard occupancy (j83) + sampled "
        "recall certification (j72/j80) — run before consuming a pair table",
    )

    db = sub.add_parser(
        "build-dedup-index",
        help="persist the MinHash band index + shingle sidecar for "
        "online near-dup probing",
    )
    db.add_argument("path")
    db.add_argument("--table", default="cli_dedup")
    db.add_argument("--buckets", type=int, default=16)

    dp = sub.add_parser(
        "dedup-probe",
        help="ask the persisted index whether TEXT is a near-dup of "
        "any ingested document (bands only the probe; corpus never "
        "rescanned)",
    )
    dp.add_argument("path")
    dp.add_argument("text", nargs="+")
    dp.add_argument("--table", default="cli_dedup")
    dp.add_argument("--theta", type=float, default=0.8)

    da = sub.add_parser(
        "append-dedup-index",
        help="ingest a parquet batch of (doc_id, text) documents into "
        "a persisted dedup store (signs only the batch; replayed "
        "doc_ids skipped)",
    )
    da.add_argument("path")
    da.add_argument("batch", help="parquet path with doc_id, text columns")
    da.add_argument("--table", default="cli_dedup")

    ea = sub.add_parser(
        "append-embedding-index",
        help="ingest a parquet batch of (vec_id, embedding) vectors "
        "into a persisted embedding store (bands only the batch; "
        "replayed vec_ids skipped)",
    )
    ea.add_argument("path")
    ea.add_argument(
        "batch", help="parquet path with vec_id, embedding columns"
    )
    ea.add_argument("--table", default="cli_ededup")

    cs = sub.add_parser(
        "check-store",
        help="one-pass health check: meta sidecars, bucketing, "
        "emptiness agreement, ingest-manifest totals, write lease, "
        "superseded dirs — every serve-lane guard, reported instead "
        "of raised; exit 2 if any check fails",
    )
    cs.add_argument("path")
    cs.add_argument("id_suffix", choices=["_sets", "_vecs", "_docs",
                                          "_norms"])
    cs.add_argument("--table", default="cli_dedup")

    rm = sub.add_parser(
        "repair-manifest",
        help="re-stamp a store's ingest manifest to adopt its CURRENT "
        "id count — the explicit operator action after a crashed "
        "append (ids written, manifest stamp lost) or for a "
        "pre-manifest store; serve lanes refuse, never self-heal",
    )
    rm.add_argument("path")
    rm.add_argument("id_suffix", choices=["_sets", "_vecs", "_docs",
                                          "_norms"],
                    help="which sidecar holds the store's one-row-per-"
                    "ingested-id table")
    rm.add_argument("--table", default="cli_dedup")

    sr = sub.add_parser(
        "store-report",
        help="operational stats of a persisted store (rows, bucket-key "
        "occupancy, files per bucket — the compaction trigger)",
    )
    sr.add_argument("path")
    sr.add_argument("--table", default="cli_dedup")
    sr.add_argument(
        "--bucket-col", default=None,
        help="bucket column (default: read from the _meta.json sidecar)",
    )

    dc = sub.add_parser(
        "compact-dedup-index",
        help="rewrite an append-accumulated dedup store to one file "
        "per bucket (immutable swap to NEW_PATH; reads persisted rows, "
        "never re-signs the corpus)",
    )
    dc.add_argument("new_path")
    dc.add_argument("--table", default="cli_dedup")
    dc.add_argument("--path", default=None,
                    help="existing store location (required in a fresh "
                    "process so the catalog can be re-registered)")

    ec = sub.add_parser(
        "compact-embedding-index",
        help="rewrite an append-accumulated embedding store to one "
        "file per bucket (immutable swap to NEW_PATH)",
    )
    ec.add_argument("new_path")
    ec.add_argument("--table", default="cli_ededup")
    ec.add_argument("--path", default=None,
                    help="existing store location (required in a fresh "
                    "process so the catalog can be re-registered)")

    psd = sub.add_parser(
        "probe-shard-dedup",
        help="run the delta-dedup decision fold for a WHOLE parquet "
        "shard of (doc_id, text) documents against a persisted dedup "
        "store (one distributed job; corpus never rescanned) and write "
        "the (doc_id, decision, dup_of) decisions parquet",
    )
    psd.add_argument("path")
    psd.add_argument("batch", help="parquet path with doc_id, text columns")
    psd.add_argument("out", help="output parquet path for the decisions")
    psd.add_argument("--table", default="cli_dedup")
    psd.add_argument("--theta", type=float, default=None)

    pse = sub.add_parser(
        "probe-shard-embedding",
        help="run the delta-dedup decision fold for a WHOLE parquet "
        "shard of (vec_id, embedding) vectors against a persisted "
        "embedding store and write the (vec_id, decision, dup_of) "
        "decisions parquet",
    )
    pse.add_argument("path")
    pse.add_argument(
        "batch", help="parquet path with vec_id, embedding columns"
    )
    pse.add_argument("out", help="output parquet path for the decisions")
    pse.add_argument("--table", default="cli_ededup")
    pse.add_argument("--theta", type=float, default=None)

    def _delete_parser(name: str, noun: str, default_table: str):
        p = sub.add_parser(
            name,
            help=f"tombstone {noun} in a persisted store (takedown / "
            "contamination removal without a rebuild): serve lanes "
            "exclude them immediately, appends of a deleted id refuse, "
            "and the next compaction removes the rows physically",
        )
        p.add_argument("path")
        p.add_argument(
            "ids", nargs="?", default=None,
            help="comma-separated integer ids (or use --ids-path)",
        )
        p.add_argument("--ids-path", default=None,
                       help="parquet path holding the id column")
        p.add_argument("--table", default=default_table)
        return p

    _delete_parser("delete-from-dedup-index", "documents", "cli_dedup")
    _delete_parser("delete-from-embedding-index", "vectors", "cli_ededup")
    _delete_parser("delete-from-tf-index", "documents", "cli_tfindex")

    vs = sub.add_parser(
        "vacuum-store",
        help="delete directories superseded by compactions (from the "
        "_superseded.json ledger), keeping entries younger than "
        "--min-age-sec or still registered in the catalog",
    )
    vs.add_argument("path", help="the store's CURRENT base location")
    vs.add_argument("--table", default="cli_dedup")
    vs.add_argument(
        "--suffix", default="_sets",
        help="the store's sidecar suffix (_sets / _vecs / _docs / _norms)",
    )
    vs.add_argument("--min-age-sec", type=float, default=86400.0)

    eb = sub.add_parser(
        "build-embedding-index",
        help="persist the hyperplane band index + vector sidecar for "
        "online embedding near-dup probing",
    )
    eb.add_argument("path")
    eb.add_argument("--table", default="cli_ededup")
    eb.add_argument("--buckets", type=int, default=16)

    ep = sub.add_parser(
        "embedding-probe",
        help="ask the persisted embedding index whether a vector is a "
        "near-dup of any ingested vector (bands only the probe; corpus "
        "never rescanned); pass --vec-id to probe a fixture vector or "
        "--vec with comma-separated floats",
    )
    ep.add_argument("path")
    ep.add_argument("--table", default="cli_ededup")
    ep.add_argument("--vec-id", type=int, default=None)
    ep.add_argument("--vec", default=None)
    ep.add_argument("--theta", type=float, default=None)

    args = ap.parse_args(argv)
    spark = _spark(f"cli-{args.cmd}")

    if args.cmd == "search":
        rows = _rank_live(
            spark, args.sf_dir, args.terms, args.k, args.any
        ).collect()
        for row in rows:
            print(f"{row['doc_id']}\t{row['score']}")
        return 0

    if args.cmd == "build-index":
        from .functions.index_store import build_index

        build_index(spark, args.sf_dir, args.table, args.path, args.buckets)
        n = spark.table(args.table).count()
        print(f"built {args.table} at {args.path}: {n} terms")
        return 0

    if args.cmd == "build-tf-index":
        from .functions.index_store import build_tf_index
        from .sources import load

        docs = load(spark, args.sf_dir, "documents").select("doc_id", "text")
        build_tf_index(spark, docs, args.table, args.path, args.buckets)
        n = spark.table(args.table).count()
        nd = spark.table(f"{args.table}_docs").count()
        print(f"built {args.table} at {args.path}: {n} terms, {nd} docs")
        return 0

    if args.cmd == "append-tf-index":
        from .functions.index_store import append_tf_index

        return _cli_append(
            spark, args, append_tf_index, "_docs", ("doc_id", "text"),
            "docs",
        )

    if args.cmd == "search-tf":
        from .functions.index_store import search_tf_index

        def _tf_rows():
            _register_store_parts(spark, args.table, args.path, "_docs")
            return search_tf_index(
                spark, args.table, tuple(args.terms), k=args.k,
                conjunctive=not args.any,
            ).collect()

        return _cli_serve(
            _tf_rows,
            lambda row: f"{row['doc_id']}\t{row['score']}",
        )

    if args.cmd == "compact-tf-index":
        from .functions.index_store import compact_tf_index

        return _cli_compact(spark, args, compact_tf_index, "_docs")

    if args.cmd == "search-index":
        from .functions.index_store import search_index

        def _idx_rows():
            # a fresh process has an empty in-memory catalog:
            # re-register the store's files (both parts — the serve
            # guard cross-checks the norms sidecar and manifest),
            # restoring the bucketing spec from the build-time
            # _meta.json sidecar (plain-external fallback without one
            # — correct answers, no bucket pruning)
            _register_store_parts(spark, args.table, args.path, "_norms")
            return search_index(
                spark, args.table, tuple(args.terms), k=args.k,
                conjunctive=not args.any,
            ).collect()

        return _cli_serve(
            _idx_rows,
            lambda row: f"{row['doc_id']}\t{row['score']}",
        )

    if args.cmd == "search-vsm":
        from .functions.index_store import search_index_vsm

        def _vsm_rows():
            _register_store_parts(spark, args.table, args.path, "_norms")
            return search_index_vsm(
                spark, args.table, tuple(args.terms), k=args.k
            ).collect()

        return _cli_serve(
            _vsm_rows,
            lambda row: f"{row['doc_id']}\t{row['score']}",
        )

    if args.cmd == "card":
        from .registry import QUERIES

        row = QUERIES["j63_dataset_card"](spark, args.sf_dir).collect()[0]
        for name in row.__fields__:
            print(f"{name}\t{row[name]}")
        return 0

    if args.cmd == "dedup-report":
        from .registry import QUERIES

        rows = QUERIES["j60_dedup_report"](spark, args.sf_dir).collect()
        print("n_members\tn_clusters\tdocs_covered\tdocs_removed\tdedup_ratio")
        for r in rows:
            print(
                f"{r['n_members']}\t{r['n_clusters']}\t{r['docs_covered']}"
                f"\t{r['docs_removed']}\t{r['dedup_ratio']}"
            )
        return 0

    if args.cmd == "build-dedup-index":
        from .functions.dedup_store import build_dedup_index

        build_dedup_index(
            spark, args.sf_dir, args.table, args.path, args.buckets
        )
        n = spark.table(args.table).count()
        print(f"built {args.table} at {args.path}: {n} band rows")
        return 0

    if args.cmd == "dedup-probe":
        from .functions.dedup_store import probe_dedup

        def _probe_rows():
            # a fresh process has an empty in-memory catalog:
            # re-register the store's files with the sidecar's
            # bucketing spec (same discipline as search-index)
            _register_store_parts(spark, args.table, args.path, "_sets")
            return probe_dedup(
                spark, args.table, " ".join(args.text), theta=args.theta
            ).collect()

        return _cli_serve(
            _probe_rows,
            lambda row: f"{row['doc_id']}\t{row['jaccard']}",
        )

    if args.cmd == "store-report":
        import json as _json
        import os as _os

        from .functions.index_store import (
            register_external_store,
            store_report,
        )

        bucket_col = args.bucket_col
        mp = f"{args.path.rstrip('/')}_meta.json"
        try:
            if bucket_col is None:
                if not _os.path.exists(mp):
                    print(f"no {mp}; pass --bucket-col", file=sys.stderr)
                    return 2
                with open(mp) as fh:
                    bucket_col = _json.load(fh)["bucket_col"]
            register_external_store(spark, args.table, args.path)
            rep = store_report(spark, args.table, bucket_col)
        except _LANE_ERRORS as exc:
            print(str(exc), file=sys.stderr)
            return 2
        for k, v in rep.items():
            print(f"{k}\t{v}")
        fpb = rep["n_files"] / max(rep["n_buckets"], 1)
        print(f"files_per_bucket\t{fpb:.1f}")
        # ingest-manifest lines: the REPORT never refuses (it is the
        # diagnostic you run on a store the serve lanes just refused),
        # it surfaces the manifest totals the serve-side cross-check
        # enforces — including a CORRUPT manifest, reported as such
        # instead of crashing the one tool meant for the triage
        manp = f"{args.path.rstrip('/')}_manifest.json"
        if _os.path.exists(manp):
            try:
                with open(manp) as fh:
                    entries = _json.load(fh)
                total = sum(e["n_rows"] for e in entries)
                print(f"manifest_shards\t{len(entries)}")
                print(f"manifest_total\t{total}")
            except (ValueError, TypeError, KeyError) as exc:
                print(f"manifest_shards\tCORRUPT ({exc})")
                print("manifest_total\tCORRUPT")
        else:
            print("manifest_shards\t0")
            print("manifest_total\tMISSING")
        return 0

    if args.cmd == "check-store":
        from .functions.index_store import check_store

        try:
            _register_store_parts(
                spark, args.table, args.path, args.id_suffix
            )
            checks = check_store(spark, args.table, args.id_suffix)
        except _LANE_ERRORS as exc:
            print(str(exc), file=sys.stderr)
            return 2
        bad = 0
        for name, res in checks.items():
            mark = "ok" if res["ok"] else "FAIL"
            print(f"{name}\t{mark}\t{res['detail']}")
            bad += 0 if res["ok"] else 1
        return 2 if bad else 0

    if args.cmd == "repair-manifest":
        from .functions.index_store import repair_manifest

        try:
            _register_store_parts(
                spark, args.table, args.path, args.id_suffix
            )
            out = repair_manifest(spark, args.table, args.id_suffix)
        except _LANE_ERRORS as exc:
            print(str(exc), file=sys.stderr)
            return 2
        print(
            f"manifest of {out['table']} re-stamped: adopted "
            f"{out['adopted_rows']} ids as the baseline"
        )
        return 0

    if args.cmd == "append-dedup-index":
        from .functions.dedup_store import append_dedup_index

        return _cli_append(
            spark, args, append_dedup_index, "_sets", ("doc_id", "text"),
            "docs",
        )

    if args.cmd == "append-embedding-index":
        from .functions.embedding_store import append_embedding_index

        return _cli_append(
            spark, args, append_embedding_index, "_vecs",
            ("vec_id", "embedding"), "vectors",
        )

    if args.cmd == "compact-dedup-index":
        from .functions.dedup_store import compact_dedup_index

        return _cli_compact(spark, args, compact_dedup_index, "_sets")

    if args.cmd == "compact-embedding-index":
        from .functions.embedding_store import compact_embedding_index

        return _cli_compact(spark, args, compact_embedding_index, "_vecs")

    if args.cmd == "probe-shard-dedup":
        from .functions.dedup_store import shard_dedup_decisions

        return _cli_probe_shard(
            spark, args, shard_dedup_decisions, "_sets",
            ("doc_id", "text"), "doc_id",
        )

    if args.cmd == "probe-shard-embedding":
        from .functions.embedding_store import shard_embedding_decisions

        return _cli_probe_shard(
            spark, args, shard_embedding_decisions, "_vecs",
            ("vec_id", "embedding"), "vec_id",
        )

    if args.cmd == "delete-from-dedup-index":
        from .functions.dedup_store import delete_from_dedup_index

        return _cli_delete(
            spark, args, delete_from_dedup_index, "_sets", "doc_id"
        )

    if args.cmd == "delete-from-embedding-index":
        from .functions.embedding_store import delete_from_embedding_index

        return _cli_delete(
            spark, args, delete_from_embedding_index, "_vecs", "vec_id"
        )

    if args.cmd == "delete-from-tf-index":
        from .functions.index_store import delete_from_tf_index

        return _cli_delete(
            spark, args, delete_from_tf_index, "_docs", "doc_id"
        )

    if args.cmd == "vacuum-store":
        from .functions.index_store import vacuum_store

        try:
            _register_store_parts(spark, args.table, args.path, args.suffix)
            res = vacuum_store(
                spark, args.table, min_age_sec=args.min_age_sec
            )
        except _LANE_ERRORS as exc:
            print(str(exc), file=sys.stderr)
            return 2
        for p in res["removed"]:
            print(f"removed\t{p}")
        for p in res["kept"]:
            print(f"kept\t{p}")
        print(
            f"vacuumed {args.table}: {len(res['removed'])} removed, "
            f"{len(res['kept'])} kept"
        )
        return 0

    if args.cmd == "build-embedding-index":
        from .functions.embedding_store import build_embedding_index

        build_embedding_index(
            spark, args.sf_dir, args.table, args.path, args.buckets
        )
        n = spark.table(args.table).count()
        print(f"built {args.table} at {args.path}: {n} band rows")
        return 0

    if args.cmd == "embedding-probe":
        from .functions.embedding_store import (
            _J78_THETA,
            probe_embedding_dedup,
        )

        if (args.vec_id is None) == (args.vec is None):
            print("pass exactly one of --vec-id / --vec", file=sys.stderr)
            return 2
        if args.vec is not None:
            try:
                vec = [float(x) for x in args.vec.split(",")]
            except ValueError:
                print(f"--vec is not a comma-separated float list: "
                      f"{args.vec!r}", file=sys.stderr)
                return 2
        else:
            from .sources import load

            row = (
                load(spark, args.sf_dir, "embeddings")
                .filter(F.col("vec_id") == args.vec_id)
                .collect()
            )
            if not row:
                print(f"no vec_id {args.vec_id} in {args.sf_dir}",
                      file=sys.stderr)
                return 2
            vec = [float(x) for x in row[0]["embedding"]]
        theta = _J78_THETA if args.theta is None else args.theta

        def _evec_rows():
            _register_store_parts(spark, args.table, args.path, "_vecs")
            return probe_embedding_dedup(
                spark, args.table, vec, theta=theta
            ).collect()

        return _cli_serve(
            _evec_rows,
            lambda row: f"{row['vec_id']}\t{row['cos']}",
        )

    if args.cmd == "audit":
        from .registry import QUERIES

        # the SCALE.md operational rule, runnable: occupancy guard
        # state per pipeline, then BOTH pipelines' sampled recall
        # certification rows (text j72, embedding j80)
        for r in QUERIES["j83_lsh_guard_report"](spark, args.sf_dir).collect():
            print(
                f"guard\t{r['pipeline']}\tn_buckets={r['n_buckets']}"
                f"\tmax_occ={r['max_occ']}"
                f"\tn_capped_buckets={r['n_capped_buckets']}"
                f"\tcapped_members={r['capped_members']}"
                f"\tchain_edges={r['chain_edges']}"
            )
        trow = QUERIES["j72_lsh_eval_sampled"](spark, args.sf_dir).collect()[0]
        print(
            f"recall\ttext\tn_exact_stratum={trow['n_exact_stratum']}"
            f"\tn_found_stratum={trow['n_dup_found_stratum']}"
            f"\trecall={trow['recall']}"
            f"\test_full_pairs={trow['est_full_pairs']}"
        )
        row = QUERIES["j80_embedding_lsh_recall_sampled"](
            spark, args.sf_dir
        ).collect()[0]
        print(
            f"recall\tembedding\tn_exact_stratum={row['n_exact_stratum']}"
            f"\tn_found_stratum={row['n_found_stratum']}"
            f"\trecall={row['recall']}"
            f"\test_full_pairs={row['est_full_pairs']}"
        )
        return 0

    if args.cmd == "bench-key":
        import time

        from .registry import QUERIES

        if args.key not in QUERIES:
            print(f"unknown key {args.key}", file=sys.stderr)
            return 2
        t = time.time()
        QUERIES[args.key](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{args.key}\t{time.time() - t:.3f}s")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
