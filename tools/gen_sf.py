"""Deterministic scale-factor generator extending the driver's TESTDATA
protocol beyond sf0.1 (round-5 VERDICT #4).

/root/testdata is read-only and tops out at sf0.1, where Spark's 0.2–1 s
per-query floor dominates the bench signal. This tool reproduces the same
star schema, column types (incl. timestamp[us]), and observed value
distributions (profiled from sf0.1: lang weights, 31-word doc vocabulary,
unit-norm float32[64] embeddings with structure-free labels, TPC-H-ish
ranges) at any multiple, seeded — so `tools/check_correctness.py` and
`bench.py` run unchanged against the output dir via SPARK_GRAFT_SF_DIR.

Usage::

    python tools/gen_sf.py --sf 1 --out /root/repo/testdata_sf1

Pure numpy + pyarrow; ~6M lineitem rows for sf=1 in a couple of minutes.
The output is NOT committed (see .gitignore); the committed artifacts are
the CORRECTNESS_SF1_r<k>.json and BENCH_NOTES tables produced from it.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = [
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "a", "big", "key", "window", "row", "table", "stream",
    "merge", "data", "vector", "join", "index", "cache", "shuffle",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "light"]
P_NOUN = ["ring", "bolt", "case", "drum", "tube", "cap", "plate", "wheel"]
P_TYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]

US_PER_DAY = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def _ts_us(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def generate(sf: float, out_dir: str, only: set[str] | None = None) -> None:
    """``only`` limits which tables are written (e.g. {"documents",
    "embeddings"} for the LLM scale-curve corpora, where the 60M-row
    lineitem at sf10 would dominate generation cost for nothing). NOTE:
    skipping tables advances the shared RNG stream differently, so a
    filtered dir's contents are NOT byte-identical to the same table in a
    full generation — filtered dirs are for scale-curve walls only, never
    for cross-checking against full-gen fixtures."""
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.1  # sizes below are the profiled sf0.1 counts

    def want(*names: str) -> bool:
        return only is None or bool(set(names) & only)

    rng = np.random.RandomState(SEED)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))

    if want("customer", "supplier", "part", "orders", "lineitem", "events"):
        n_cust = int(15000 * scale)
        _write(out_dir, "customer", pa.table({
            "c_custkey": pa.array(range(n_cust), type=pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.randint(0, 25, n_cust), type=pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
        }))

        n_supp = int(1000 * scale)
        _write(out_dir, "supplier", pa.table({
            "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.randint(0, 25, n_supp), type=pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }))

        n_part = int(20000 * scale)
        adj = rng.randint(0, len(P_ADJ), n_part)
        noun = rng.randint(0, len(P_NOUN), n_part)
        _write(out_dir, "part", pa.table({
            "p_partkey": pa.array(range(n_part), type=pa.int64()),
            "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in zip(adj, noun)],
            "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, n_part)],
            "p_type": [P_TYPE[i] for i in rng.randint(0, len(P_TYPE), n_part)],
            "p_size": pa.array(rng.randint(1, 51, n_part), type=pa.int32()),
            "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
        }))

        n_ord = int(150000 * scale)
        base_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(
            np.int64
        )
        order_day = rng.randint(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
        _write(out_dir, "orders", pa.table({
            "o_orderkey": pa.array(range(n_ord), type=pa.int64()),
            "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), type=pa.int64()),
            "o_orderstatus": [("O", "P", "F")[i] for i in rng.randint(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _ts_us(base_1995 + order_day * US_PER_DAY),
            "o_orderpriority": [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)],
        }))

        n_li = int(600000 * scale)
        li_order = rng.randint(0, n_ord, n_li)
        # deterministic linenumber = cumcount within orderkey (vectorized)
        order_sorted = np.sort(li_order, kind="stable")
        first = np.r_[True, order_sorted[1:] != order_sorted[:-1]]
        idx = np.arange(n_li)
        start = np.maximum.accumulate(np.where(first, idx, 0))
        linenumber = (idx - start + 1).astype(np.int32)
        ship_delay = rng.randint(1, 96, n_li)
        _write(out_dir, "lineitem", pa.table({
            "l_orderkey": pa.array(order_sorted, type=pa.int64()),
            "l_partkey": pa.array(rng.randint(0, n_part, n_li), type=pa.int64()),
            "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), type=pa.int64()),
            "l_linenumber": pa.array(linenumber, type=pa.int32()),
            "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
            "l_returnflag": [("A", "N", "R")[i] for i in rng.randint(0, 3, n_li)],
            "l_linestatus": [("F", "O")[i] for i in rng.randint(0, 2, n_li)],
            "l_shipdate": _ts_us(
                base_1995 + (order_day[order_sorted] + ship_delay) * US_PER_DAY
            ),
        }))

        n_ev = int(100000 * scale)
        n_users = int(1500 * scale)
        base_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(
            np.int64
        )
        ev_us = np.sort(rng.randint(0, 30 * US_PER_DAY, n_ev))
        _write(out_dir, "events", pa.table({
            "event_id": pa.array(range(n_ev), type=pa.int64()),
            "ts": _ts_us(base_2024 + ev_us),
            "user_id": pa.array(rng.randint(0, n_users, n_ev), type=pa.int64()),
            "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)],
            "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 560.0), 2),
            "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
        }))

    if want("documents"):
        n_doc = int(5000 * scale)
        n_words = rng.randint(8, 97, n_doc)
        texts = [
            " ".join(VOCAB[w] for w in rng.randint(0, len(VOCAB), nw))
            for nw in n_words
        ]
        # plant duplicate structure at sf0.1-like rates so the dedup operators
        # have real work (pure random 31-word text has ~no 0.8-jaccard pairs):
        # ~0.2% exact twins and ~0.5% near-twins (one word substituted)
        for i in range(400, n_doc, 400):
            texts[i] = texts[i - 17]
        for i in range(160, n_doc, 160):
            if i % 400 == 0:
                continue
            words = texts[i - 23].split(" ")
            words[int(rng.randint(0, len(words)))] = VOCAB[
                int(rng.randint(0, len(VOCAB)))
            ]
            texts[i] = " ".join(words)
        _write(out_dir, "documents", pa.table({
            "doc_id": pa.array(range(n_doc), type=pa.int64()),
            "text": texts,
            "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_W)],
            "source": [f"src{i % 20}" for i in range(n_doc)],
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }))

    if want("embeddings"):
        n_vec = int(2000 * scale)
        vecs = rng.standard_normal((n_vec, 64))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs.astype(np.float32)
        _write(out_dir, "embeddings", pa.table({
            "vec_id": pa.array(range(n_vec), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, n_vec), type=pa.int32()),
        }))


def main() -> int:
    argv = sys.argv[1:]
    sf = 1.0
    out = None
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = None
    if "--tables" in argv:
        i = argv.index("--tables")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    out = out or f"/root/repo/testdata_sf{sf:g}"
    print(f"generating sf={sf} into {out}"
          + (f" (tables: {sorted(only)})" if only else ""))
    generate(sf, out, only)
    return 0


if __name__ == "__main__":
    sys.exit(main())
