"""Pin-lifetime probe: does `release_pinned_shingles()` keep a
long-lived session's storage bounded when composing many corpora?

The served near-dup pipelines (`minhash_dedup_pairs`,
`minhash_pairs_from_index`) persist their candidate-shingle frame and
hand the pin's lifetime to the caller (the returned frame is lazy, so
the pin cannot be released inside the function without re-shingling
per consumer — round-10 advice / verdict #6). The documented contract
says long-lived sessions should call `release_pinned_shingles()`
between corpora; this probe measures what actually sits in the
executor storage tab either way.

One session, two phases over docgen corpora (seeds differ per corpus):
- phase "accumulate": serve pairs for C corpora, never release —
  record cached-RDD count + memory bytes after each corpus.
- phase "release": serve pairs for C more corpora, releasing after
  each — record the same; steady state should be 0 pinned frames
  between corpora.

Usage: python tools/pin_release_probe.py [n_docs] [n_corpora]
       (default 30000 3)
Prints one JSON line per step plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_imdb_data_pipeline_spark.extensions.dedup import (  # noqa: E402
    build_minhash_band_index,
    minhash_pairs_from_index,
    release_pinned_shingles,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.docgen import (  # noqa: E402
    DocGenDataSource,
)

PARAMS = dict(k=3, num_hashes=64, bands=16)
THRESHOLD = 0.6


def storage_tab(spark) -> dict:
    """Cached-RDD count and total memory/disk bytes, straight from the
    same source as the UI's Storage tab."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        "cached_rdds": len(infos),
        "mem_bytes": sum(i.memSize() for i in infos),
        "disk_bytes": sum(i.diskSize() for i in infos),
    }


def corpus(spark, n: int, seed: int):
    """docgen corpus ∪ light mutations of every 20th doc (ids shifted
    by 10M) — a planted near-dup population, so the candidate set (and
    with it the pinned candidate-shingle frame) is non-trivial."""
    from pyspark.sql import functions as F

    base = (
        spark.read.format("docgen")
        .option("n_docs", n)
        .option("n_partitions", 32)
        .option("seed", seed)
        .load()
        .select("doc_id", "text")
    )
    words = F.split("text", " ")
    mutated = base.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.filter(words, lambda w, i: F.pmod(i, F.lit(17)) != 0)
        ).alias("text"),
    )
    return base.unionByName(mutated)


def serve_one(spark, n: int, seed: int, root: str) -> int:
    docs = corpus(spark, n, seed)
    path = os.path.join(root, f"idx_{seed}")
    build_minhash_band_index(docs, "doc_id", "text", path, **PARAMS)
    pairs = minhash_pairs_from_index(
        docs, path, "doc_id", "text", threshold=THRESHOLD
    )
    return pairs.count()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("pin_release_probe")
    spark.dataSource.register(DocGenDataSource)
    root = tempfile.mkdtemp(prefix="pin_probe_")
    steps = []
    try:
        for phase, release in (("accumulate", False), ("release", True)):
            for i in range(c):
                seed = 100 * (2 if release else 1) + i
                t0 = time.time()
                n_pairs = serve_one(spark, n, seed, root)
                wall = round(time.time() - t0, 2)
                released = release_pinned_shingles() if release else 0
                step = {
                    "phase": phase,
                    "corpus": i + 1,
                    "n_docs": n,
                    "pairs": n_pairs,
                    "sec": wall,
                    "released": released,
                    **storage_tab(spark),
                }
                steps.append(step)
                print(json.dumps(step), flush=True)
            if not release:
                # end of the accumulate phase: one release drains
                # every pin the phase left behind
                drained = release_pinned_shingles()
                step = {
                    "phase": "drain",
                    "released": drained,
                    **storage_tab(spark),
                }
                steps.append(step)
                print(json.dumps(step), flush=True)
        acc_end = [s for s in steps if s["phase"] == "accumulate"][-1]
        rel_max = max(
            s["mem_bytes"] for s in steps if s["phase"] == "release"
        )
        print(
            json.dumps(
                {
                    "summary": "pin_release_probe",
                    "n_docs": n,
                    "n_corpora": c,
                    "accumulate_end_mem_bytes": acc_end["mem_bytes"],
                    "accumulate_end_cached_rdds": acc_end["cached_rdds"],
                    "release_phase_max_mem_bytes": rel_max,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
