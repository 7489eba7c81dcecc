"""Near-dup dedup at corpus scale: MinHash+LSH and SimHash end-to-end
on a docgen-generated corpus with PLANTED near-duplicates — the
measurement behind the claim that candidate generation is banded
(≈linear), never all-pairs.

Every 50th document is duplicated with a light word-level mutation
(drop every 17th word), giving a known dup population. For each
algorithm the probe reports wall time, candidate-pair count vs the N²
all-pairs strawman, verified-pair count, and recall over the planted
pairs.

Usage: python tools/dedup_scale_probe.py [n_docs ...]  (default 100k 250k)
Prints one JSON line per (algo, size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_docs,
    simhash_near_dup_pairs,
    jaccard_on_shingles,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.docgen import DocGenDataSource  # noqa: E402


def corpus_with_planted_dups(spark, n_docs: int):
    docs = (
        spark.read.format("docgen")
        .option("n_docs", n_docs)
        .option("n_partitions", 32)
        .option("seed", 7)
        .load()
        .select("doc_id", "text")
    )
    # mutate: drop every 17th word; dup id = orig + 10*n_docs
    words = F.split(F.col("text"), r"\s+")
    mutated = F.array_join(
        F.filter(words, lambda w, i: (i % 17) != 16), " "
    )
    dups = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(10 * n_docs)).alias("doc_id"),
        mutated.alias("text"),
    )
    return docs.unionByName(dups), n_docs // 50


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 250_000]
    spark = get_spark("dedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DocGenDataSource)

    for n in sizes:
        corpus, n_planted = corpus_with_planted_dups(spark, n)
        n_total = n + n_planted

        # --- MinHash + LSH (staged so candidate counts are observable)
        t0 = time.perf_counter()
        sh = shingle_docs(corpus, "doc_id", "text", k=3).persist()
        sig = minhash_signatures(sh, "doc_id", "__shingles", 64)
        cand = lsh_candidate_pairs(sig, "doc_id", "__sig", 16, 4).persist()
        n_cand = cand.count()
        verified = jaccard_on_shingles(cand, sh, "doc_id", "__shingles").filter(
            F.col("jaccard") >= 0.6
        )
        planted_found = verified.filter(
            F.col("id_b") - F.col("id_a") == 10 * n
        ).count()
        n_pairs = verified.count()
        mh_wall = round(time.perf_counter() - t0, 2)
        sh.unpersist()
        cand.unpersist()
        print(
            json.dumps(
                {
                    "algo": "minhash_lsh",
                    "docs": n_total,
                    "wall_sec": mh_wall,
                    "candidates": n_cand,
                    "allpairs": n_total * (n_total - 1) // 2,
                    "cand_frac": round(
                        n_cand / (n_total * (n_total - 1) / 2), 8
                    ),
                    "verified_pairs": n_pairs,
                    "planted": n_planted,
                    "planted_recall": round(planted_found / n_planted, 4),
                }
            ),
            flush=True,
        )

        # --- SimHash banded
        t0 = time.perf_counter()
        sh_pairs = simhash_near_dup_pairs(
            corpus, "doc_id", "text", max_hamming=3, bands=4
        ).persist()
        n_sh = sh_pairs.count()
        sh_planted = sh_pairs.filter(
            F.col("id_b") - F.col("id_a") == 10 * n
        ).count()
        sh_wall = round(time.perf_counter() - t0, 2)
        sh_pairs.unpersist()
        print(
            json.dumps(
                {
                    "algo": "simhash",
                    "docs": n_total,
                    "wall_sec": sh_wall,
                    "pairs": n_sh,
                    "planted": n_planted,
                    "planted_recall": round(sh_planted / n_planted, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
