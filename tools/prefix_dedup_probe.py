"""Truncated-prefix dedup scale probe (SCALE.md §20).

dedup_truncated_prefix_pairs' scale claim: candidates come from an
EXACT equi-join on the first-40-char bucket key (a strict-prefix pair
with |short| >= 40 necessarily collides on it), so the quadratic term
never materializes — candidate count is driven by key collisions, not
N². This probe measures that on growing corpora with planted
truncations (every 9th doc reappears truncated to its first 20 words):

- candidate pairs (bucket-key join matches) as a fraction of N²/2;
- verified pairs (startswith + strict length) and planted recall;
- wall time for the whole detect pass.

Usage: python tools/prefix_dedup_probe.py [N ...] (default 20k 80k 200k)
One JSON line per N.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.docgen import (  # noqa: E402
    DocGenDataSource,
)

KEY_LEN = 40
TRUNC_WORDS = 20


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 80_000, 200_000]
    spark = get_spark("prefix-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DocGenDataSource)

    for n in sizes:
        docs = (
            spark.read.format("docgen")
            .options(n_docs=str(n), min_words="10", max_words="99", seed="5")
            .load()
            .select("doc_id", "text")
        )
        shift = n  # docgen ids are 0..n-1, so n is a safe disjoint shift
        trunc = docs.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + F.lit(shift)).alias("doc_id"),
            F.array_join(
                F.slice(F.split("text", " "), 1, TRUNC_WORDS), " "
            ).alias("text"),
        )
        aug = docs.unionByName(trunc).persist()
        n_total = aug.count()
        # planted pairs that the operator CAN find: source has more
        # words than the truncation (strict prefix) and the truncated
        # text reaches the bucket-key length
        planted = (
            docs.filter(
                (F.col("doc_id") % 9 == 0)
                & (F.size(F.split("text", " ")) > TRUNC_WORDS)
            )
            .select("doc_id")
            .filter(
                F.length(
                    F.array_join(
                        F.slice(F.split("text", " "), 1, TRUNC_WORDS), " "
                    )
                )
                >= KEY_LEN
            )
            .count()
        )

        t0 = time.perf_counter()
        short = aug.select(
            F.col("doc_id").alias("short_id"), F.col("text").alias("__st")
        ).filter(F.length("__st") >= KEY_LEN)
        long = aug.select(
            F.col("doc_id").alias("long_id"), F.col("text").alias("__lt")
        )
        cand = (
            short.withColumn("__k", F.substring("__st", 1, KEY_LEN))
            .join(long.withColumn("__k", F.substring("__lt", 1, KEY_LEN)), "__k")
            .filter(F.col("short_id") != F.col("long_id"))
        )
        stats = cand.agg(
            F.count(F.lit(1)).alias("candidates"),
            F.sum(
                (
                    (F.length("__st") < F.length("__lt"))
                    & F.col("__lt").startswith(F.col("__st"))
                ).cast("long")
            ).alias("verified"),
            F.sum(
                (
                    (F.length("__st") < F.length("__lt"))
                    & F.col("__lt").startswith(F.col("__st"))
                    & (F.col("short_id") >= shift)
                    & (F.col("long_id") == F.col("short_id") - shift)
                ).cast("long")
            ).alias("planted_found"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        brute = n_total * (n_total - 1) / 2.0
        print(json.dumps({
            "n_docs": n_total,
            "planted_findable": planted,
            "candidates": int(stats["candidates"]),
            "candidate_frac_of_brute": round(stats["candidates"] / brute, 10),
            "verified_pairs": int(stats["verified"]),
            "planted_found": int(stats["planted_found"]),
            "planted_recall": round(stats["planted_found"] / planted, 4)
            if planted
            else None,
            "detect_sec": wall,
        }), flush=True)
        aug.unpersist()


if __name__ == "__main__":
    main()
