"""Brute-force vs LSH near-dup crossover probe.

At the test lake's N=2,000 embeddings the LSH path's fixed costs
(numpy hyperplane pass, banding exchange, candidate distinct) exceed
the whole brute-force O(N^2) scan. This probe measures both paths on
seeded synthetic embeddings at growing N to find the crossover — the
number the scale claim actually rests on.

Usage: python tools/ann_crossover_probe.py [N ...]  (default 2k 8k 16k)
Prints one JSON line per N with wall times and emitted pair counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402

DIM = 64


def synth_embeddings(spark, n: int):
    """Seeded pseudo-random unit-ish vectors, fully JVM-side: element
    (i, j) = (xxhash64(i, j) % 2001 - 1000) / 1000. Deterministic for
    any partitioning; includes planted near-dup pairs (id and id+n/2
    share all but one coordinate) so threshold matches exist."""
    base = spark.range(n).withColumnRenamed("id", "vec_id")
    elem = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (F.xxhash64(F.col("vec_id") % (F.lit(n) / 2).cast("long"), j) % 2001)
            - 1000
        ).cast("double")
        / 1000.0
        # twin vectors (upper half ids) get one coordinate nudged
        + F.when(
            (F.col("vec_id") >= n / 2) & (j == 0), F.lit(0.05)
        ).otherwise(F.lit(0.0)),
    )
    return base.select("vec_id", elem.alias("embedding"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000, 16000]
    spark = get_spark("ann-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        emb = synth_embeddings(spark, n).persist()
        emb.count()
        out = {"n": n}
        t0 = time.perf_counter()
        brute = embedding_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.8
        )
        out["brute_pairs"] = brute.count()
        out["brute_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        lsh = embedding_near_dup_pairs_lsh(
            emb, "vec_id", "embedding", dim=DIM, threshold=0.8
        )
        out["lsh_pairs"] = lsh.count()
        out["lsh_sec"] = round(time.perf_counter() - t0, 2)
        emb.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
