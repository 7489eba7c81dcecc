"""Generate a larger scale factor of the driver-shaped test lake.

The shipped lake stops at sf0.1 (600k lineitem rows), but the
divergence class SCALE.md §42 documents is MONOTONE IN N — both
round-10 bugs (RANGE-frame epoch-boundary collisions, double-sum
drift past ROUND precision) were invisible below sf0.1. This tool
extrapolates the observed sf0.1 schemas and value distributions 10x
(or any --scale) with an independent seeded generator so the full
Spark-vs-DuckDB parity sweep can run at sf1: ~6M lineitem rows, 1M
events, 50k documents. The sweep needs SELF-CONSISTENT data (both
engines read the same parquet), not the driver's exact generator —
every distribution below was measured from /root/testdata/sf0.1
(schemas, key ranges, categorical domains, planted near-dup rate,
deterministic source=src{doc_id%20} assignment, timestamp[us]
logical type) so every registered query and oracle stays meaningful.

Usage:  python tools/sfgen.py [--out DIR] [--scale 10] [--seed 42]

Everything is numpy-vectorized; sf1 generates in ~1 min and ~350 MB.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US_PER_DAY = 86_400_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(days_from, days_to, n, rng, base="1995-01-01"):
    """Uniform midnight timestamps in [days_from, days_to) days from base."""
    days = rng.integers(days_from, days_to, n)
    return (
        np.datetime64(base, "us") + days.astype("timedelta64[D]").astype(
            "timedelta64[us]"
        )
    )


def generate(out: str, scale: float = 10.0, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    s = lambda n: int(round(n * scale))  # noqa: E731

    # -- fixed dimensions (identical at every sf) ------------------------
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # -- customer ---------------------------------------------------------
    rng = np.random.default_rng(seed)
    n_cust = s(1500)
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )[rng.integers(0, 5, n_cust)],
    }))

    # -- supplier ---------------------------------------------------------
    rng = np.random.default_rng(seed + 1)
    n_supp = s(100)
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # -- part ---------------------------------------------------------------
    rng = np.random.default_rng(seed + 2)
    n_part = s(2000)
    adjs = np.array(["blue", "cold", "hot", "large", "new", "old", "red", "small"])
    nouns = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"])
    name_a = adjs[rng.integers(0, 8, n_part)]
    name_n = nouns[rng.integers(0, 8, n_part)]
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(name_a, " "), name_n),
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        )[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
    }))

    # -- orders -------------------------------------------------------------
    rng = np.random.default_rng(seed + 3)
    n_ord = s(15000)
    # o_orderdate: uniform midnight days 1995-01-01 .. 2001-08-01 (2404 d)
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_us(0, 2405, n_ord, rng),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n_ord)],
    }))

    # -- lineitem -------------------------------------------------------------
    rng = np.random.default_rng(seed + 4)
    # lines per order: 1 + Poisson(3), capped (observed mean 4.0, max 17)
    lines = 1 + np.minimum(rng.poisson(3.0, n_ord), 16)
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines)
    n_li = lkey.size
    lnum = (np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines) + 1)
    # l_shipdate: independent uniform (observed deltas span +-2400 days)
    _write(out, "lineitem", pa.table({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lnum.astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(1, 2500, n_li, rng),
    }))

    # -- events ---------------------------------------------------------------
    rng = np.random.default_rng(seed + 5)
    n_ev = s(10000)
    n_users = s(150)
    window_us = 30 * US_PER_DAY  # 2024-01-01 .. 2024-01-31, sorted by ts
    offs = np.sort(rng.integers(0, window_us, n_ev))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": np.datetime64("2024-01-01", "us") + offs.astype("timedelta64[us]"),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(
            ["click", "error", "purchase", "signup", "view"]
        )[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # -- documents ---------------------------------------------------------
    # 31-type vocabulary (30 common + the rare 'dup' marker), 10-100
    # words, ~5% of docs are near-dup copies of an earlier doc with 1-2
    # words swapped to 'dup' (observed jaccard 0.9-0.99), ~0.16% exact
    # copies; source is deterministic src{doc_id % 20}.
    rng = np.random.default_rng(seed + 6)
    n_doc = s(500)
    vocab = np.array(
        "spark window merge table column vector stream value batch part "
        "line order small sort fast scan a hash slow group agg filter "
        "query big key row data code plan join".split()
    )
    assert vocab.size == 30
    lens = rng.integers(10, 101, n_doc)
    words = vocab[rng.integers(0, 30, int(lens.sum()))]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(w) for w in np.split(words, bounds)]
    # plant near-dups and exact dups (copy an EARLIER doc's text)
    n_near, n_exact = int(n_doc * 0.05), max(1, int(n_doc * 0.0016))
    steal = rng.choice(np.arange(1, n_doc), n_near + n_exact, replace=False)
    for i, tgt in enumerate(steal):
        src = int(rng.integers(0, tgt))
        ws = texts[src].split(" ")
        if i < n_near and len(ws) >= 10:  # near: swap 1-2 words to 'dup'
            for p in rng.choice(len(ws), int(rng.integers(1, 3)), replace=False):
                ws[p] = "dup"
        texts[int(tgt)] = " ".join(ws)
    langs = np.array(["en", "de", "es", "fr", "zh"])[
        rng.choice(5, n_doc, p=[0.41, 0.1425, 0.1525, 0.1475, 0.1475])
    ]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # -- embeddings ------------------------------------------------------
    # observed: 64-dim L2-normalized with NO cluster structure (within-
    # label mean cos == cross-label == 0.0) and no >0.9-cos pairs;
    # labels are plain metadata -> normalized gaussians + uniform labels
    rng = np.random.default_rng(seed + 7)
    n_emb = s(200)
    V = rng.standard_normal((n_emb, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--scale", type=float, default=100.0,
                    help="multiplier vs sf0.01 row counts (100 = sf1)")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.out, a.scale, a.seed)
    print(f"wrote {a.out} at scale {a.scale} (sf{a.scale / 100:g})")
