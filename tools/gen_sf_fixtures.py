"""Generate scale-factor fixtures that mirror FIXTURES.md exactly —
schemas, domains, distributions, and determinism (seed 42) — so the
318-key oracle-parity sweep can run at decades the driver never ships
(sf1 = ~6M lineitem / 1M events / 50k documents / 20k embeddings).

Every distribution below was measured from the shipped sf0.1 fixtures
(FIXTURES.md + direct inspection, recorded inline next to each column):
the point is a faithful 10× decade, not new data shapes.  region and
nation are copied VERBATIM from a shipped sf dir (they are fixed-size).

The parity sweep compares Spark vs DuckDB on the SAME files, so
correctness never depends on this generator matching the driver's
bit-for-bit — but scaling CURVES do depend on the same value domains
(join fan-outs, group cardinalities, dup densities), which is why every
knob is measured, not invented.

Usage (writes ~1 GB; .localdata/ is gitignored):

    python tools/gen_sf_fixtures.py 1 [.localdata/sf1]

Row groups are capped (256k rows) so Spark gets split-parallel scans
at sf1 instead of one fat row group per table.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHIPPED = "/root/testdata/sf0.1"  # domain source for fixed tables
DAY_US = 86_400_000_000

# measured sf0.1 domains (see module docstring)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "es", "de", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ADJ = ["blue", "old", "small", "new", "large", "hot", "cold", "red"]
NOUN = ["widget", "gizmo", "ring", "gear", "bolt", "plate", "rod", "anvil"]
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
STATUS = ["O", "P", "F"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RFLAG = ["N", "A", "R"]
LSTATUS = ["O", "F"]
ETYPES = ["error", "signup", "purchase", "view", "click"]


def _write(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, row_group_size=262_144)
    print(f"  {os.path.basename(path):24s} {table.num_rows:>9,} rows")


def _ts_us(days_from_epoch_us: np.ndarray) -> pa.Array:
    return pa.array(days_from_epoch_us, type=pa.timestamp("us"))


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.1  # sf0.1 is the measured base decade

    n_supp = int(1_000 * scale)
    n_cust = int(15_000 * scale)
    n_part = int(20_000 * scale)
    n_ord = int(150_000 * scale)
    n_li = int(600_000 * scale)
    n_ev = int(100_000 * scale)
    n_doc = int(5_000 * scale)
    n_emb = int(2_000 * scale)
    n_user = int(1_500 * scale)

    # region / nation: fixed-size, copied verbatim from the shipped dir
    for name in ("region", "nation"):
        _write(
            os.path.join(out_dir, f"{name}.parquet"),
            pq.read_table(os.path.join(SHIPPED, f"{name}.parquet")),
        )

    # supplier: acctbal uniform [-1000, 10000), nationkey uniform 0..24
    _write(os.path.join(out_dir, "supplier.parquet"), pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1_000, 10_000, n_supp), 2),
    }))

    # customer: same acctbal domain; mktsegment uniform over 5
    _write(os.path.join(out_dir, "customer.parquet"), pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1_000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[
            rng.integers(0, len(SEGMENTS), n_cust)],
    }))

    # part: name = adj+noun (8×8), 25 brands, 6 types, size 1..50,
    # retailprice = 900 + 0.1·partkey (exact shipped formula)
    pk = np.arange(n_part)
    _write(os.path.join(out_dir, "part.parquet"), pa.table({
        "p_partkey": pa.array(pk, type=pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part),
                            rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        )[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * pk, 2),
    }))

    # orders: dates = midnight, uniform 1995-01-01..2001-08-01;
    # totalprice uniform [1000, 500000); custkey uniform
    d0 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    d1 = np.datetime64("2001-08-01").astype("datetime64[D]").astype(int)
    o_days = rng.integers(d0, d1 + 1, n_ord)
    _write(os.path.join(out_dir, "orders.parquet"), pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": np.array(STATUS)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(o_days.astype("int64") * DAY_US),
        "o_orderpriority": np.array(PRIO)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: orderkey uniform over orders (≈Poisson(4) lines/order,
    # matching the shipped 147,236/150,000 distinct ratio); linenumber
    # uniform 1..7 (shipped is NOT a within-order sequence); shipdate =
    # the line's order date + 1..95 days; quantity 1..50;
    # extendedprice uniform [900, 105000); discount 0..0.10 (2dp);
    # tax 0..0.08 (2dp)
    lo = rng.integers(0, n_ord, n_li)
    ship_days = o_days[lo] + rng.integers(1, 96, n_li)
    _write(os.path.join(out_dir, "lineitem.parquet"), pa.table({
        "l_orderkey": pa.array(lo, type=pa.int64()),
        "l_partkey": pa.array(
            rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(
            rng.integers(1, 8, n_li), type=pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(
            rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(RFLAG)[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(LSTATUS)[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(ship_days.astype("int64") * DAY_US),
    }))

    # events: ts uniform over 2024-01 (30 days), SORTED, ids sequential
    # (shipped ordering); value ~ Exp(mean 50) rounded 2dp (measured
    # median 34.7 ≈ 50·ln2); user uniform; props = {"k": 0..100}
    t0 = np.datetime64("2024-01-01T00:00:00").astype(
        "datetime64[us]").astype("int64")
    ev_ts = np.sort(
        t0 + rng.integers(0, 30 * DAY_US, n_ev, dtype=np.int64))
    _write(os.path.join(out_dir, "events.parquet"), pa.table({
        "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
        "ts": _ts_us(ev_ts),
        "user_id": pa.array(
            rng.integers(0, n_user, n_ev), type=pa.int64()),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [
            json.dumps({"k": int(k)})
            for k in rng.integers(0, 101, n_ev)
        ],
    }))

    # documents: 10..98 words (avg 54, matching shipped) from the
    # 31-word vocab; lang multinomial (en 41%, others ~14.75%);
    # source = src{doc_id % 20} (shipped is exactly uniform);
    # ~0.16% exact duplicates planted (shipped: 8/5000)
    lens = rng.integers(10, 99, n_doc)
    word_ids = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts: list[str] = []
    pos = 0
    vocab_arr = np.array(VOCAB)
    for ln in lens:
        texts.append(" ".join(vocab_arr[word_ids[pos:pos + ln]]))
        pos += ln
    n_dup = max(1, int(round(n_doc * 8 / 5_000)))
    dup_to = rng.integers(0, n_doc, n_dup)
    dup_from = rng.integers(0, n_doc, n_dup)
    for t, f in zip(dup_to, dup_from):
        if t != f:
            texts[t] = texts[f]
    _write(os.path.join(out_dir, "documents.parquet"), pa.table({
        "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array(
            [len(t) for t in texts], type=pa.int64()),
    }))

    # embeddings: unit-norm float32 gaussians, dim 64 (measured: no
    # label structure, no exact dups; cos≥0.45 pair density ≈ e^-6.5
    # arises naturally at dim 64); label uniform 0..9
    M = rng.standard_normal((n_emb, 64))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    M = M.astype(np.float32)
    _write(os.path.join(out_dir, "embeddings.parquet"), pa.table({
        "vec_id": pa.array(np.arange(n_emb), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(M.ravel(), type=pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), type=pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata", f"sf{sf:g}",
        )
    )
    print(f"generating sf={sf} into {out}")
    generate(sf, out)
