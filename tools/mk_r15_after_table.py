"""Generate the OPTIMIZATION_r15.md after-table: per-key min across the
round-15 after-bench runs vs the committed quiet-host floors.

Usage: python tools/mk_r15_after_table.py after1.json [after2.json ...]
"""

from __future__ import annotations

import json
import statistics
import sys

TOUCHED = (
    "j50_minhash_jaccard_est",
    "j19_decontaminate",
    "j67_curation_funnel",
    "k18_session_conversion",
    "j33_bigram_logprob",
    "f13_tpch_q2_mincost",
    "f20_tpch_q1_pricing",
    # batch 3 (sidecar compaction + query shapes)
    "j83_lsh_guard_report",
    "j79_embedding_dedup_components",
    "j20_connected_components",
    "j17_dup_cluster_reps",
    "c23_temporal_join",
    "h17_business_days",
    # batch 4 (found by the sf1 record; after-numbers in its
    # OPTIMIZATION_r15.md section, measured per-key — it landed after
    # the three after-table runs)
    "j4_knn_self",
)


def main() -> int:
    afters = [json.load(open(p)) for p in sys.argv[1:]]
    fl = json.load(open("BENCH_SF01_FLOORS_r15.json"))
    keys = sorted(fl["runs"][0]["queries"])
    floor = {k: min(r["queries"][k] for r in fl["runs"]) for k in keys}
    cfloor = {
        k: min(r["queries_cpu"].get(k, 9e9) for r in fl["runs"]) for k in keys
    }
    aw = {k: min(a["queries"][k] for a in afters) for k in keys}
    ac = {
        k: min(a["queries_cpu"].get(k, 9e9) for a in afters) for k in keys
    }
    mat_after = {}
    for a in afters:
        for t, s in a["materialize_by_tag"].items():
            mat_after[t] = min(s, mat_after.get(t, 9e9))
    print("run totals:", [a["value"] for a in afters])
    print(
        f"per-key-min total: floors {sum(floor.values()):.1f}s -> after "
        f"{sum(aw.values()):.1f}s ({len(keys)} keys)"
    )
    print(
        f"executor-CPU-min total: floors {sum(cfloor.values()):.1f}s -> "
        f"after {sum(ac.values()):.1f}s"
    )
    print(
        "materialize min-per-tag: after "
        f"{sum(mat_after.values()):.1f}s over {len(mat_after)} tags"
    )
    ratios = [aw[k] / floor[k] for k in keys if floor[k] > 0]
    print(f"median wall ratio vs floor: {statistics.median(ratios):.3f}")
    print("\n| key | floor wall | after wall | floor cpu | after cpu |")
    print("|---|---|---|---|---|")
    for k in TOUCHED:
        print(
            f"| {k} | {floor[k]:.3f} | {aw[k]:.3f} | {cfloor[k]:.3f} | "
            f"{ac[k]:.3f} |"
        )
    worst = sorted(
        ((aw[k] / floor[k], k) for k in keys if floor[k] > 0.2),
        reverse=True,
    )[:12]
    print("\nworst ratios (floor>0.2s):")
    for r, k in worst:
        print(
            f"  {k:34s} {aw[k]:7.3f} vs {floor[k]:7.3f} ({r:.2f}x) "
            f"cpu {ac[k]:.2f} vs {cfloor[k]:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
