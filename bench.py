"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"queries_ms": "86,752,…", "qn": len(registry), "qk_sha1": "…",
     "metric": "total_runtime", "value": N, "unit": "sec", "sf": 0.1}

Each query is materialized through the noop sink (full execution of the
physical plan — unlike count(), which lets Catalyst prune the plan to
metadata for scan-shaped queries).  Each query runs TWICE and the min
is recorded: BASELINE.md's numbers are min-of-3 warm, and a single
cold execution bills whole-stage-codegen JIT compilation (measured
4.05 s cold vs 0.52 s warm on j18, 6.8 s vs 1.4 s on j19) to whichever
query happens to run first — min-of-2 compares steady-state plan cost,
which is what matters at 100 TB where compilation amortizes to zero.

OUTPUT SIZE is load-bearing: the driver records only the LAST ~2000
chars of stdout, and a registry-sized {"key": sec} map is ~9 KB — round
10's externally-recorded artifact carried a truncated tail and a null
parse.  The printed line therefore encodes the complete per-key record
as ``queries_ms``: integer-millisecond timings comma-joined in
sorted(registry-key) order ("x" marks a failed key), ~4 B per key,
with ``qn`` (= len(registry)) and ``qk_sha1`` (hash of the joined key
list) so a decoder can verify alignment against the commit's registry.
Decode:  dict(zip(sorted(QUERIES), queries_ms.split(","))).  The
human-readable {key: sec} map plus the per-tag materialize ledger is
persisted to bench_full.json next to this file, and a >1900-char
fallback drops the (elastic) error map so the line can never overflow
the capture on a failure round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from bdt_enwikisearch_hadoop_spark.registry import QUERIES
    from bdt_enwikisearch_hadoop_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm-up: JVM, codegen, parquet footer caches
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    wasted = 0.0  # time burned by failing queries — still billed to total
    for key in sorted(QUERIES):
        best = None
        for _run in range(2):  # min-of-2: see module docstring
            t0 = time.perf_counter()
            try:
                df = QUERIES[key](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            except Exception as exc:  # one broken query must not void the round
                wasted += time.perf_counter() - t0
                errors[key] = f"{type(exc).__name__}: {exc}"[:200]
                break
        if best is not None and key not in errors:
            timings[key] = round(best, 3)

    # a failed query may not understate the headline total: bill its
    # elapsed time AND flag the run so a partially-failed round can't
    # quietly pass a perf gate on fewer queries.  Build time for
    # materialized shared intermediates (sources.io.materialized) is
    # billed ONCE here too — per-key min-of-2 would otherwise discard
    # it (run 1 builds, run 2 serves from the checkpoint).
    from bdt_enwikisearch_hadoop_spark.sources.io import MATERIALIZE_SECONDS

    materialize_sec = round(sum(MATERIALIZE_SECONDS.values()), 3)
    total = round(sum(timings.values()) + wasted + materialize_sec, 3)
    # Complete per-key record, compact enough to survive the driver's
    # ~2000-char tail capture (see module docstring): integer ms in
    # sorted-key order, "x" for failed keys.
    import hashlib

    all_keys = sorted(QUERIES)

    def keyed_csv(divisor: int) -> str:
        return ",".join(
            str(int(round(timings[k] * 1000 / divisor)))
            if k in timings
            else "x"
            for k in all_keys
        )

    qk_sha1 = hashlib.sha1(",".join(all_keys).encode()).hexdigest()[:12]
    result: dict = {
        "queries_ms": keyed_csv(1),
        "qn": len(all_keys),
        "qk_sha1": qk_sha1,
    }
    if errors:
        # Kept SHORT by construction (60-char messages, ≤2 keys each):
        # the whole printed line must stay under the ~2000-char capture
        # even on a failure round — failed keys are also recoverable
        # from queries_ms ('x' entries) + bench_full.json.
        by_msg: dict[str, list[str]] = {}
        for key, msg in errors.items():
            by_msg.setdefault(msg[:60], []).append(key)
        result["errors"] = {
            msg: keys if len(keys) <= 2 else keys[:2] + [f"+{len(keys)-2}"]
            for msg, keys in by_msg.items()
        }
        result["failed_count"] = len(errors)
    result.update(
        {
            "metric": "total_runtime",
            "materialize_sec": materialize_sec,
            "sf": sf,
            "unit": "sec",
            "value": total,
        }
    )
    # Persist the human-readable COMPLETE record — full {key: sec}
    # map, full error messages, the per-tag materialize ledger — so
    # round-over-round per-key regression checks read a committed
    # artifact without decoding the compact queries_ms line.
    full = dict(result)
    full["queries"] = timings
    if errors:
        full["errors"] = errors
    # SUM per tag: the ledger is keyed (applicationId, sf_dir, tag) so a
    # tag rebuilt in a second session adds a second entry — a dict
    # comprehension keyed on tag alone would silently keep only one and
    # stop reconciling with materialize_sec (the sum of ALL entries).
    by_tag: dict[str, float] = {}
    for (_app, _sf, tag), sec in MATERIALIZE_SECONDS.items():
        by_tag[tag] = round(by_tag.get(tag, 0.0) + sec, 3)
    full["materialize_by_tag"] = dict(sorted(by_tag.items()))
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_full.json"),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    # HARD guarantee the printed line survives the ~2000-char tail
    # capture (an overflow truncates the line's HEAD — the exact
    # round-10 null-parse failure).  Elastic parts, dropped in order
    # of least information lost: (1) the error map (failed_count
    # stays; failures remain as 'x' in the CSV and in full detail in
    # bench_full.json); (2) per-key precision — re-encode the CSV in
    # centi- then deci-seconds (renamed key says which), which bounds
    # the line even if every key ran tens of seconds.
    line = json.dumps(result)
    if len(line) > 1900 and "errors" in result:
        del result["errors"]
        line = json.dumps(result)
    for unit_key, divisor in (("queries_cs", 10), ("queries_ds", 100)):
        if len(line) <= 1900:
            break
        del result[next(k for k in result if k.startswith("queries_"))]
        result = {unit_key: keyed_csv(divisor), **result}
        line = json.dumps(result)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
