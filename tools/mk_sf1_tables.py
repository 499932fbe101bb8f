"""Generate the BASELINE.md sf1 / CPU-floor tables from committed
round artifacts (VERDICT r14 #2/#3/#5).  Pure formatting — no Spark,
no measurement: every number is read from an artifact whose provenance
the table header names, so the tables stay single-provenance and
regenerable.

Usage:
    python tools/mk_sf1_tables.py ratio            # sf0.1->sf1 correctness-sweep wall ratios
    python tools/mk_sf1_tables.py cpu  RUN.json... # per-key CPU floors (min over bench_full runs)
    python tools/mk_sf1_tables.py sf1bench SF1.json SF01_RUN.json...
                                                   # Spark-only sf1 bench vs same-series sf0.1 mins
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: declared quadratic oracle anchors — each grows ~O(N²) BY CONTRACT
#: (exact ground truth for a plan-guarded linear substitute, named here)
QUADRATIC = {
    "j2_dedup_near_jaccard": "declared quadratic oracle anchor; scale substitute j8/j32",
    "j17_dup_cluster_reps": "declared quadratic anchor (shared-shingle pairs); scale path j32",
    "j27_containment": "declared quadratic anchor; banded containment is the scale path",
    "j54_lsh_eval": "full-corpus exact ground truth; scale substitute j72",
    "j68_dedup_threshold_curve": "full-corpus exact ground truth; scale substitute j73",
    "j12_embedding_near_dup": "exact all-pairs block grid by contract (the oracle form)",
    "j34_semdedup": "within-cell all-pairs by contract",
    "f27_skyline": "dominance check quadratic in the skyline band by contract",
}
ITERATIVE = {
    "j20_connected_components": "iterative fixed point (min-label propagation rounds grow with diameter)",
    "j40_pagerank": "iterative (5 rounds) + oracle-side all-pairs kNN CTE",
    "j64_lpa_communities": "iterative + oracle-side all-pairs kNN CTE",
    "j29_kmeans_step": "iterative step",
}
ORACLE_SIDE = {
    "j51_knn_triangles": "oracle-side all-pairs kNN CTE (DuckDB cost, Spark side linear)",
    "j59_negative_sampling": "oracle-side all-pairs kNN CTE (DuckDB cost, Spark side linear)",
}
COMPARE_COST = {
    "a2_scan_project": "harness value-compare on a 6M-row result (not plan cost)",
    "b3_filter_null_semantics": "harness value-compare on a multi-M-row result (not plan cost)",
    "c25_fuzzy_join": "118M-row result at sf1: count-only compare mode (fan-out is the key's semantics)",
}


def _note(key: str) -> str:
    for m in (QUADRATIC, ITERATIVE, ORACLE_SIDE, COMPARE_COST):
        if key in m:
            return m[key]
    return ""


def ratio_table() -> None:
    s01 = json.load(open(f"{REPO}/CORRECTNESS_SF01_r14.json"))["results"]
    s1 = json.load(open(f"{REPO}/CORRECTNESS_SF1_r14.json"))["results"]
    fx = json.load(open(f"{REPO}/CORRECTNESS_SF1_FIXES_r14.json"))["results"]
    merged = dict(s1)
    merged.update(fx)  # the two conf-fix re-runs supersede their first reads
    tot01 = sum(v["sec"] for v in s01.values())
    tot1 = sum(merged[k]["sec"] for k in s01)
    print(f"Sweep totals: {tot01:.0f} s (sf0.1) -> {tot1:.0f} s (sf1) "
          f"= {tot1 / tot01:.1f}x for 10x data.")
    print()
    print("| query key | corr sweep sf0.1 (s) | sf1 (s) | ratio | note |")
    print("|---|---|---|---|---|")
    for k in sorted(s01):
        t01, t1 = s01[k]["sec"], merged[k]["sec"]
        r = t1 / t01 if t01 > 0 else float("nan")
        star = " **" if r > 15 else ""
        print(f"| {k} | {t01} | {t1} | {r:.1f}x{star.strip()} | {_note(k)} |")


def cpu_table(run_paths: list[str]) -> None:
    runs = [json.load(open(p)) for p in run_paths]
    keys = sorted(runs[0]["queries_cpu"])
    wall_tot = [r["value"] for r in runs]
    print(f"{len(runs)} runs; per-run totals (incl. materialize): "
          + " / ".join(f"{v:.1f}" for v in wall_tot) + " s")
    print()
    print("Materialized-intermediate build costs (min per tag across runs):")
    print()
    print("| tag | build (s) |")
    print("|---|---|")
    tags = sorted(runs[0].get("materialize_by_tag", {}))
    mat_sum = 0.0
    for t in tags:
        m = min(r["materialize_by_tag"][t] for r in runs
                if t in r.get("materialize_by_tag", {}))
        mat_sum += m
        print(f"| {t} | {m} |")
    print()
    print("| query key | wall floor (s) | cpu floor (s) |")
    print("|---|---|---|")
    cpu_sum = wall_sum = 0.0
    for k in keys:
        c = min(r["queries_cpu"][k] for r in runs if k in r["queries_cpu"])
        w = min(r["queries"][k] for r in runs if k in r["queries"])
        cpu_sum += c
        wall_sum += w
        print(f"| {k} | {w} | {c} |")
    print(f"\nPer-key-min totals: wall {wall_sum:.3f} s, cpu {cpu_sum:.3f} s "
          f"({len(keys)} keys) + {mat_sum:.3f} s min-per-tag materialize.")


def _load_runs(paths: list[str]) -> list[dict]:
    """Each path is either one bench_full-format record or a committed
    {provenance, runs: [...]} bundle (BENCH_SF01_*_r15.json style)."""
    out: list[dict] = []
    for p in paths:
        d = json.load(open(p))
        out.extend(d["runs"] if "runs" in d else [d])
    return out


def sf1_bench_table(sf1_path: str, sf01_paths: list[str]) -> None:
    sf1 = json.load(open(sf1_path))
    runs = _load_runs(sf01_paths)
    print("| query key | sf1 wall (s) | sf1 cpu (s) | sf1/sf0.1 wall | note |")
    print("|---|---|---|---|---|")
    w_tot = c_tot = 0.0
    for k in sorted(sf1["queries"]):
        w = sf1["queries"][k]
        c = sf1.get("queries_cpu", {}).get(k)
        w01 = min((r["queries"][k] for r in runs if k in r["queries"]),
                  default=None)
        r10 = f"{w / w01:.1f}x" if w01 else "-"
        w_tot += w
        c_tot += c or 0.0
        cs = f"{c}" if c is not None else "-"
        # COMPARE_COST notes describe the CORRECTNESS sweep's harness
        # compare term; the Spark-only bench has no compare, so those
        # notes would mislabel real (noop-materialization) cost here
        note = "" if k in COMPARE_COST else _note(k)
        print(f"| {k} | {w} | {cs} | {r10} | {note} |")
    print(f"\nTotals: wall {w_tot:.1f} s, cpu {c_tot:.1f} s, "
          f"materialize {sf1.get('materialize_sec')} s.")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ratio"
    if mode == "ratio":
        ratio_table()
    elif mode == "cpu":
        cpu_table(sys.argv[2:])
    elif mode == "sf1bench":
        sf1_bench_table(sys.argv[2], sys.argv[3:])
    else:
        raise SystemExit(f"unknown mode {mode!r}")
