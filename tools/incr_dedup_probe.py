"""Incremental dedup vs full re-minhash — the claim behind
extensions.dedup.build_minhash_band_index / incremental_near_dup_pairs:
at scale you minhash the corpus ONCE and each arriving batch probes
the persisted band index, instead of re-running the whole LSH pipeline
on corpus+batch per arrival.

This probe measures both paths on a docgen corpus with a fixed-size
batch (1k docs, half of them mutated copies of corpus docs so matches
exist), at growing corpus N:

- incremental: band the batch with the index's params, broadcast-join
  against the persisted (band, bucket, id) parquet, verify candidates.
  Expected ~flat in N (the index join is a broadcast probe; only the
  candidate verify touches corpus text, and only for matched docs).
- full: minhash_dedup_pairs over corpus ∪ batch, filtered to cross
  pairs. Expected ~linear in N (re-shingles and re-hashes the corpus
  every time).

The one-off index build is reported separately — it is the amortized
cost, paid once per corpus version (same story as the PQ index and
the CDC snapshot, SCALE.md §9/§11).

Usage: python tools/incr_dedup_probe.py [corpus_n ...] (default 100k 300k)
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.dedup import (  # noqa: E402
    build_minhash_band_index,
    incremental_near_dup_pairs,
    minhash_dedup_pairs,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.docgen import (  # noqa: E402
    DocGenDataSource,
)

BATCH = 1000
THRESHOLD = 0.6


def load_corpus(spark, n: int):
    return (
        spark.read.format("docgen")
        .option("n_docs", n)
        .option("n_partitions", 32)
        .option("seed", 7)
        .load()
        .select("doc_id", "text")
    )


def make_batch(spark, corpus, n_corpus: int):
    """BATCH docs: half mutated copies of corpus docs (drop every 17th
    word — known near-dups), half fresh docgen docs (no match)."""
    words = F.split(F.col("text"), r"\s+")
    mutated = F.array_join(
        F.filter(words, lambda w, i: (i % 17) != 16), " "
    )
    dups = (
        corpus.filter(F.col("doc_id") % (2 * n_corpus // BATCH) == 0)
        .limit(BATCH // 2)
        .select(
            (F.col("doc_id") + 10 * n_corpus).alias("doc_id"),
            mutated.alias("text"),
        )
    )
    fresh = (
        spark.read.format("docgen")
        .option("n_docs", BATCH // 2)
        .option("n_partitions", 4)
        .option("seed", 99)
        .load()
        .select(
            (F.col("doc_id") + 20 * n_corpus).alias("doc_id"), "text"
        )
    )
    return dups.unionByName(fresh)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 300_000]
    spark = get_spark(
        "incr-dedup-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DocGenDataSource)
    for n in sizes:
        corpus = load_corpus(spark, n).persist()
        corpus.count()
        batch = make_batch(spark, corpus, n).persist()
        batch.count()
        work = tempfile.mkdtemp(prefix="incr_dedup_")

        t0 = time.perf_counter()
        build_minhash_band_index(
            corpus, "doc_id", "text", work, k=3, num_hashes=64, bands=16
        )
        build_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        incr = incremental_near_dup_pairs(
            batch, corpus, work, "doc_id", "text", threshold=THRESHOLD
        )
        incr_pairs = incr.count()
        incr_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        full = minhash_dedup_pairs(
            corpus.unionByName(batch), "doc_id", "text",
            k=3, num_hashes=64, bands=16, threshold=THRESHOLD,
        ).filter(
            # cross pairs only: exactly one side is a batch id
            (F.col("id_a") >= 10 * n) != (F.col("id_b") >= 10 * n)
        )
        full_pairs = full.count()
        full_s = round(time.perf_counter() - t0, 2)

        print(
            json.dumps(
                {
                    "corpus_n": n,
                    "batch_n": BATCH,
                    "index_build_sec": build_s,
                    "incremental_sec": incr_s,
                    "incremental_pairs": incr_pairs,
                    "full_reminhash_sec": full_s,
                    "full_cross_pairs": full_pairs,
                }
            ),
            flush=True,
        )
        corpus.unpersist()
        batch.unpersist()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
