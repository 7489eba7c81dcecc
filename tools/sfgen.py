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

GENERATOR v2 (round 12): the big tables stream through a
pyarrow.ParquetWriter in fixed-size chunks with per-(seed, chunk) rng
streams, so sf100 (600M lineitem rows, ~17 GB parquet) generates in
bounded memory instead of materializing ~50 GB of numpy at once.
Chunking changes the drawn values relative to the round-11 v1
generator (same seed, different stream interleaving) — the lakes are
regenerated fresh each round and every parity/scaling comparison is
within-round, so only absolute counts quoted in older SCALE entries
(e.g. §43's 2464/2475 banding tail) are v1-specific. Within v2 the
output is deterministic in (--scale, --seed) and INDEPENDENT of the
chunk size: chunk boundaries are fixed in units of rows, each chunk's
stream is seeded by its absolute chunk index. Near-dup planting in
``documents`` steals from an earlier doc of the SAME chunk (chunks
are >= 100k docs whenever chunking kicks in, so the planted 5% rate
and jaccard band are preserved); ``events`` chunks own disjoint
consecutive time slices so the global ts-sorted property survives.

Usage:  python tools/sfgen.py [--out DIR] [--scale 10] [--seed 42]

sf1 generates in ~1 min / ~350 MB; sf100 in bounded (<10 GB) memory.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US_PER_DAY = 86_400_000_000

# chunk sizes, in base-unit rows (orders for orders+lineitem)
ORDERS_PER_CHUNK = 2_000_000
EVENTS_PER_CHUNK = 20_000_000
DOCS_PER_CHUNK = 500_000
EMB_PER_CHUNK = 500_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _chunked(total: int, per_chunk: int):
    """Yield (chunk_index, start, n) covering [0, total)."""
    i, start = 0, 0
    while start < total:
        n = min(per_chunk, total - start)
        yield i, start, n
        i, start = i + 1, start + n


class _ChunkWriter:
    """Stream pa.Tables into one parquet file in bounded row groups.

    Row groups are the minimum parquet read-split unit: a single
    500k-row documents row group serialized the whole corpus scan to
    ONE Spark task at sf10 (SCALE §53 — text_token_stats took the
    same 11 s at sf10 and sf100 because sf10 ran on one thread).
    250k-row groups keep every table's scan splittable at every sf
    while staying well above the tiny-row-group overhead regime."""

    ROWS_PER_GROUP = 250_000

    def __init__(self, out: str, name: str):
        self.path = os.path.join(out, f"{name}.parquet")
        self.name = name
        self.writer: pq.ParquetWriter | None = None
        self.rows = 0

    def write(self, table: pa.Table) -> None:
        if self.writer is None:
            self.writer = pq.ParquetWriter(self.path, table.schema)
        self.writer.write_table(table, row_group_size=self.ROWS_PER_GROUP)
        self.rows += table.num_rows

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
        print(f"  {self.name}: {self.rows} rows")


def _ts_us(days_from, days_to, n, rng, base="1995-01-01"):
    """Uniform midnight timestamps in [days_from, days_to) days from base."""
    days = rng.integers(days_from, days_to, n)
    return (
        np.datetime64(base, "us") + days.astype("timedelta64[D]").astype(
            "timedelta64[us]"
        )
    )


def generate(
    out: str, scale: float = 10.0, seed: int = 42, tables=None
) -> None:
    """``tables`` (default: all) names the subset to write — the r13
    verdict #5 sf300 money probe only needs the relational money set,
    and skipping events/documents/embeddings keeps a 1.8B-row lineitem
    lake inside the host's disk budget. Determinism is per-table
    (independent seeded streams), so a subset lake's tables are
    IDENTICAL to the full lake's."""
    want = set(tables) if tables else None
    os.makedirs(out, exist_ok=True)
    s = lambda n: int(round(n * scale))  # noqa: E731

    def skip(name: str) -> bool:
        return want is not None and name not in want

    # -- fixed dimensions (identical at every sf) ------------------------
    if not skip("region"):
        _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    if not skip("nation"):
        _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # -- customer ---------------------------------------------------------
    rng = np.random.default_rng(seed)
    n_cust = s(1500)
    if not skip("customer"):
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
    if not skip("supplier"):
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
    if not skip("part"):
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

    # -- orders + lineitem (chunked over order ranges) --------------------
    n_ord = s(15000)
    ow = _ChunkWriter(out, "orders") if not skip("orders") else None
    lw = _ChunkWriter(out, "lineitem") if not skip("lineitem") else None
    for ci, start, n in _chunked(n_ord, ORDERS_PER_CHUNK):
        if ow is None and lw is None:
            break
        okey = np.arange(start, start + n, dtype=np.int64)
        rng = np.random.default_rng((seed + 3, ci))
        # o_orderdate: uniform midnight days 1995-01-01..2001-08-01 (2404 d)
        if ow is not None:
            ow.write(pa.table({
            "o_orderkey": okey,
            "o_custkey": rng.integers(0, n_cust, n),
            "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n), 2),
            "o_orderdate": _ts_us(0, 2405, n, rng),
            "o_orderpriority": np.array(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
            )[rng.integers(0, 5, n)],
        }))
        rng = np.random.default_rng((seed + 4, ci))
        # lines per order: 1 + Poisson(3), capped (observed mean 4.0, max 17)
        lines = 1 + np.minimum(rng.poisson(3.0, n), 16)
        lkey = np.repeat(okey, lines)
        n_li = lkey.size
        lnum = (
            np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines) + 1
        )
        # l_shipdate: independent uniform (observed deltas span +-2400 days)
        if lw is not None:
            lw.write(pa.table({
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
    if ow is not None:
        ow.close()
    if lw is not None:
        lw.close()

    # -- events (chunked over disjoint consecutive time slices, so the
    #    concatenation stays globally ts-sorted like the driver lake) ----
    n_ev = s(10000)
    n_users = s(150)
    window_us = 30 * US_PER_DAY  # 2024-01-01 .. 2024-01-31
    ew = _ChunkWriter(out, "events") if not skip("events") else None
    for ci, start, n in _chunked(n_ev, EVENTS_PER_CHUNK):
        if ew is None:
            break
        rng = np.random.default_rng((seed + 5, ci))
        lo = window_us * start // n_ev
        hi = window_us * (start + n) // n_ev
        offs = np.sort(rng.integers(lo, hi, n))
        ew.write(pa.table({
            "event_id": np.arange(start, start + n, dtype=np.int64),
            "ts": np.datetime64("2024-01-01", "us")
            + offs.astype("timedelta64[us]"),
            "user_id": rng.integers(0, n_users, n),
            "event_type": np.array(
                ["click", "error", "purchase", "signup", "view"]
            )[rng.integers(0, 5, n)],
            "value": np.round(rng.exponential(50.0, n), 2),
            "props": [
                json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)
            ],
        }))
    if ew is not None:
        ew.close()

    # -- documents ---------------------------------------------------------
    # 31-type vocabulary (30 common + the rare 'dup' marker), 10-100
    # words, ~5% of docs are near-dup copies of an earlier doc with 1-2
    # words swapped to 'dup' (observed jaccard 0.9-0.99), ~0.16% exact
    # copies; source is deterministic src{doc_id % 20}. Steal sources
    # stay within the chunk (>= 100k docs whenever chunking engages).
    n_doc = s(500)
    vocab = np.array(
        "spark window merge table column vector stream value batch part "
        "line order small sort fast scan a hash slow group agg filter "
        "query big key row data code plan join".split()
    )
    assert vocab.size == 30
    dw = _ChunkWriter(out, "documents") if not skip("documents") else None
    for ci, start, n in _chunked(n_doc, DOCS_PER_CHUNK):
        if dw is None:
            break
        rng = np.random.default_rng((seed + 6, ci))
        lens = rng.integers(10, 101, n)
        words = vocab[rng.integers(0, 30, int(lens.sum()))]
        bounds = np.cumsum(lens)[:-1]
        texts = [" ".join(w) for w in np.split(words, bounds)]
        # plant near-dups and exact dups (copy an EARLIER doc's text)
        n_near, n_exact = int(n * 0.05), max(1, int(n * 0.0016))
        steal = rng.choice(np.arange(1, n), n_near + n_exact, replace=False)
        for i, tgt in enumerate(steal):
            src = int(rng.integers(0, tgt))
            ws = texts[src].split(" ")
            if i < n_near and len(ws) >= 10:  # near: swap 1-2 words to 'dup'
                for p in rng.choice(
                    len(ws), int(rng.integers(1, 3)), replace=False
                ):
                    ws[p] = "dup"
            texts[int(tgt)] = " ".join(ws)
        langs = np.array(["en", "de", "es", "fr", "zh"])[
            rng.choice(5, n, p=[0.41, 0.1425, 0.1525, 0.1475, 0.1475])
        ]
        dw.write(pa.table({
            "doc_id": np.arange(start, start + n, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 20}" for i in range(start, start + n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }))
    if dw is not None:
        dw.close()

    # -- embeddings ------------------------------------------------------
    # observed: 64-dim L2-normalized with NO cluster structure (within-
    # label mean cos == cross-label == 0.0) and no >0.9-cos pairs;
    # labels are plain metadata -> normalized gaussians + uniform labels
    n_emb = s(200)
    vw = _ChunkWriter(out, "embeddings") if not skip("embeddings") else None
    for ci, start, n in _chunked(n_emb, EMB_PER_CHUNK):
        if vw is None:
            break
        rng = np.random.default_rng((seed + 7, ci))
        V = rng.standard_normal((n, 64)).astype(np.float32)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        vw.write(pa.table({
            "vec_id": np.arange(start, start + n, dtype=np.int64),
            "embedding": pa.array(list(V), pa.list_(pa.float32())),
            "label": rng.integers(0, 10, n).astype(np.int32),
        }))
    if vw is not None:
        vw.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--scale", type=float, default=100.0,
                    help="multiplier vs sf0.01 row counts (100 = sf1)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all)")
    a = ap.parse_args()
    generate(a.out, a.scale, a.seed,
             tables=a.tables.split(",") if a.tables else None)
    print(f"wrote {a.out} at scale {a.scale} (sf{a.scale / 100:g})")
