"""Banded-hamming near-dup asymptotics (the kernel behind SimHash text
dedup and perceptual image dedup).

Random 64-bit fingerprints generated JVM-side (`xxhash64(id)` — no
Python rows) at increasing N, plus a planted near-twin per 1000 ids
(source fingerprint with one low bit flipped — hamming 1). Measures
the banded pipeline end-to-end and reports the candidate-pair count
the bucket join produced, against the closed-form expectation
E[candidates] ≈ bands * N^2 / 2^(64/bands) / 2 for uniform
fingerprints — the number that decides where banding stops scaling
and wider slices / segmentation take over.

Usage: python tools/hamming_scale_probe.py [base_n]   (default 250000)
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.dedup import (  # noqa: E402
    hamming_near_dup_pairs,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    spark = get_spark(
        "hamming-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    for mult in (1, 4, 16):
        n = base * mult
        ids = spark.range(n).select(
            F.col("id"), F.xxhash64("id").alias("fp")
        )
        twins = ids.filter(F.col("id") % 1000 == 0).select(
            (F.col("id") + 10 * n).alias("id"),
            F.col("fp").bitwiseXOR(F.lit(1)).alias("fp"),
        )
        fps = ids.unionByName(twins)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            # FULL materialization (noop sink): counting only the
            # planted pairs lets Catalyst push the id equality INTO
            # the bucket join and prune the candidate explosion this
            # probe exists to measure
            hamming_near_dup_pairs(
                fps, "id", "fp", max_hamming=3, bands=4
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        pairs = hamming_near_dup_pairs(fps, "id", "fp", max_hamming=3, bands=4)
        found = pairs.filter(F.col("id_b") == F.col("id_a") + 10 * n).count()
        expected_cand = 4 * n * n / 2**16 / 2
        print(
            json.dumps(
                {
                    "n": n,
                    "sec": round(best, 2),
                    "planted": n // 1000,
                    "planted_found": found,
                    "expected_candidates_M": round(expected_cand / 1e6, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
