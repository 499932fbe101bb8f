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

from pyspark.sql import DataFrame, functions as F


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
    place, so a fix (a new error class, a guard) lands in every lane."""
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
    try:
        append_fn(spark, args.table, batch.select(*cols))
    except ValueError as exc:  # unservable rows / unbucketed store
        print(str(exc), file=sys.stderr)
        return 2
    after = spark.table(f"{args.table}{suffix}").count()
    print(
        f"appended {after - before} new {noun} to {args.table} "
        f"({before} -> {after})"
    )
    return 0


def _cli_compact(spark, args, compact_fn, suffix: str) -> int:
    """Shared body of the three compaction lanes (dedup / embedding /
    tf): re-register the store's parts when running in a fresh process,
    compact to the new path, exit 2 cleanly on refusal (same-path /
    unbucketed store)."""
    if args.path:
        _register_store_parts(spark, args.table, args.path, suffix)
    try:
        compact_fn(spark, args.table, args.new_path)
    except ValueError as exc:  # same-path / unbucketed store
        print(str(exc), file=sys.stderr)
        return 2
    print(f"compacted {args.table} to {args.new_path}")
    return 0


def _cli_serve(rows_fn, line_fn) -> int:
    """Shared serve-lane contract (search-tf / search-vsm / dedup-probe
    / embedding-probe): collect, print one line per row, exit 2 with
    the message on a store refusal (missing sidecar, bad probe) — never
    a traceback."""
    try:
        rows = rows_fn()
    except ValueError as exc:
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

        _register_store_parts(spark, args.table, args.path, "_docs")
        return _cli_serve(
            lambda: search_tf_index(
                spark, args.table, tuple(args.terms), k=args.k,
                conjunctive=not args.any,
            ).collect(),
            lambda row: f"{row['doc_id']}\t{row['score']}",
        )

    if args.cmd == "compact-tf-index":
        from .functions.index_store import compact_tf_index

        return _cli_compact(spark, args, compact_tf_index, "_docs")

    if args.cmd == "search-index":
        from .functions.index_store import register_external_store, search_index

        # a fresh process has an empty in-memory catalog: re-register
        # the store's files, restoring the bucketing spec from the
        # build-time _meta.json sidecar (plain-external fallback
        # without one — correct answers, no bucket pruning)
        register_external_store(spark, args.table, args.path)
        rows = search_index(
            spark, args.table, tuple(args.terms), k=args.k,
            conjunctive=not args.any,
        ).collect()
        for row in rows:
            print(f"{row['doc_id']}\t{row['score']}")
        return 0

    if args.cmd == "search-vsm":
        from .functions.index_store import search_index_vsm

        _register_store_parts(spark, args.table, args.path, "_norms")
        return _cli_serve(
            lambda: search_index_vsm(
                spark, args.table, tuple(args.terms), k=args.k
            ).collect(),
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

        # a fresh process has an empty in-memory catalog: re-register
        # the store's files with the sidecar's bucketing spec (same
        # discipline as search-index)
        _register_store_parts(spark, args.table, args.path, "_sets")
        return _cli_serve(
            lambda: probe_dedup(
                spark, args.table, " ".join(args.text), theta=args.theta
            ).collect(),
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
        if bucket_col is None:
            if not _os.path.exists(mp):
                print(f"no {mp}; pass --bucket-col", file=sys.stderr)
                return 2
            with open(mp) as fh:
                bucket_col = _json.load(fh)["bucket_col"]
        register_external_store(spark, args.table, args.path)
        rep = store_report(spark, args.table, bucket_col)
        for k, v in rep.items():
            print(f"{k}\t{v}")
        fpb = rep["n_files"] / max(rep["n_buckets"], 1)
        print(f"files_per_bucket\t{fpb:.1f}")
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
        _register_store_parts(spark, args.table, args.path, "_vecs")
        theta = _J78_THETA if args.theta is None else args.theta
        return _cli_serve(
            lambda: probe_embedding_dedup(
                spark, args.table, vec, theta=theta
            ).collect(),
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
