"""Decode a driver-captured BENCH_r{N}.json back into per-key seconds.

The bench line encodes the complete per-key record compactly so it
survives the driver's ~2000-char tail capture (see bench.py's module
docstring).  This tool reverses every encoding rung — ms/cs/ds CSVs
and the fixed-width base36 centisecond forms (qw36cs wall 2 ch/key,
qc36cs cpu 3 ch/key) — and verifies alignment against the CURRENT
registry via qk_sha1.

Usage:
    python tools/decode_bench_line.py BENCH_r15.json [--top N]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _b36_series(blob: str, width: int) -> list[float | None]:
    out: list[float | None] = []
    for i in range(0, len(blob), width):
        chunk = blob[i:i + width]
        out.append(None if chunk[0] == "~" else int(chunk, 36) / 100.0)
    return out


def decode(rec: dict) -> dict:
    """Return {"wall": {key: sec}, "cpu": {key: sec}, "failed": [...]}."""
    from bdt_enwikisearch_hadoop_spark.registry import QUERIES

    keys = sorted(QUERIES)
    sha = hashlib.sha1(",".join(keys).encode()).hexdigest()[:12]
    if rec.get("qk_sha1") != sha:
        print(f"WARNING: qk_sha1 {rec.get('qk_sha1')} != current registry "
              f"{sha} — the artifact was produced at a different key set; "
              "per-key alignment below is unreliable", file=sys.stderr)
    if rec.get("qn") not in (None, len(keys)):
        keys = keys[: rec["qn"]]  # subset runs encode only their qn keys

    def csv_series(blob: str, divisor: float) -> list[float | None]:
        return [None if tok == "x" else int(tok) / divisor
                for tok in blob.split(",")]

    wall = cpu = None
    if "queries_ms" in rec:
        wall = csv_series(rec["queries_ms"], 1000.0)
    elif "queries_cs" in rec:
        wall = csv_series(rec["queries_cs"], 100.0)
    elif "queries_ds" in rec:
        wall = csv_series(rec["queries_ds"], 10.0)
    elif "qw36cs" in rec:
        wall = _b36_series(rec["qw36cs"], 2)
    if "queries_cpu_ms" in rec:
        cpu = csv_series(rec["queries_cpu_ms"], 1000.0)
    elif "qc36cs" in rec:
        cpu = _b36_series(rec["qc36cs"], 3)

    out: dict = {"wall": {}, "cpu": {}, "failed": []}
    for i, k in enumerate(keys):
        w = wall[i] if wall and i < len(wall) else None
        if w is None:
            out["failed"].append(k)
        else:
            out["wall"][k] = w
        if cpu and i < len(cpu) and cpu[i] is not None:
            out["cpu"][k] = cpu[i]
    return out


def main(argv: list[str]) -> int:
    path = argv[1]
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 20
    artifact = json.load(open(path))
    rec = artifact.get("parsed") if "parsed" in artifact else artifact
    if rec is None:
        print(f"{path}: parsed is null — the line did not survive capture "
              "(see bench.py's shutdown-order docstring)", file=sys.stderr)
        return 1
    dec = decode(rec)
    wall_sum = sum(dec["wall"].values())
    print(f"keys: {len(dec['wall'])} wall, {len(dec['cpu'])} cpu, "
          f"{len(dec['failed'])} failed; per-key wall sum {wall_sum:.1f} s; "
          f"line total {rec.get('value')} {rec.get('unit')} "
          f"(sf={rec.get('sf')}, materialize={rec.get('materialize_sec')})")
    for k in sorted(dec["wall"], key=lambda k: -dec["wall"][k])[:top]:
        c = dec["cpu"].get(k)
        print(f"  {k:36s} wall {dec['wall'][k]:8.3f}"
              + (f"  cpu {c:8.3f}" if c is not None else ""))
    if dec["failed"]:
        print("failed keys:", ", ".join(dec["failed"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
