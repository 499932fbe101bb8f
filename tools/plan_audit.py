"""Round-15 plan audit: capture explain("formatted") for EVERY
registered key and summarize plan-shape signals (exchange count, scan
count, Python-eval nodes, sort-aggregate count, duplicated aggregate
subtrees by repeated identical Function lists) into one TSV — the
measure-first sweep the optimization round reads before touching
anything.  Plans land under plans/r15/all/ (gitignored bulk; only the
keys a change touches get committed before/after copies).

Usage:  python tools/plan_audit.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdt_enwikisearch_hadoop_spark.registry import QUERIES  # noqa: E402
from bdt_enwikisearch_hadoop_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r15/all"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-audit")
    rows = []
    for key in sorted(QUERIES):
        try:
            df = QUERIES[key](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # audit must cover every key
            rows.append((key, -1, -1, -1, -1, -1, f"ERROR {type(exc).__name__}"))
            continue
        with open(os.path.join(out_dir, f"{key}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan)) - len(
            re.findall(r"ReusedExchange", plan)
        )
        n_bex = len(re.findall(r"BroadcastExchange", plan))
        n_scan = len(re.findall(r"Scan (parquet|ExistingRDD)", plan))
        n_py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                              r"MapInPandas|FlatMapGroupsInPandas)", plan))
        n_sortagg = len(re.findall(r"\bSortAggregate\b", plan))
        # duplicated aggregate subtrees: identical "Functions [n]: [...]"
        # detail lines appearing >2x (partial+final = 2x is normal)
        funcs = re.findall(r"^Functions \[\d+\]: .*$", plan, re.M)
        canon = [re.sub(r"#\d+L?", "#", f) for f in funcs]
        dup = sum(1 for f in set(canon) if canon.count(f) > 2)
        rows.append((key, n_ex, n_bex, n_scan, n_py, n_sortagg,
                     f"dupagg={dup}" if dup else ""))
    with open(os.path.join(out_dir, "_summary.tsv"), "w") as fh:
        fh.write("key\texchanges\tbroadcasts\tscans\tpyeval\tsortagg\tnote\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    print(f"{len(rows)} keys audited -> {out_dir}/_summary.tsv")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
