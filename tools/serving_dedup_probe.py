"""Corpus-INTERNAL near-dup serving vs one-shot at growing N — the
measurement behind the round-9/10 `minhash_pairs_from_index` rewrite
(plans/extensions.py `minhash_dedup_documents`).

At sf0.1 (5k docs) the two forms are wall-par: the one-shot's
shingle+sign+band cost roughly equals the served form's bucket window
+ self-join over the tiny index (SCALE §39). The claim that serving
wins is an at-scale claim, so measure it at scale: a docgen corpus
with planted near-dups (every 50th doc lightly mutated), N ∈
{100k, 250k} by default.

- one-shot: minhash_dedup_pairs — re-shingles, re-signs, re-bands the
  WHOLE corpus per call. Linear in N with the full fingerprint
  constant.
- served: minhash_pairs_from_index over the pre-built band index —
  bucket window + self-join over (band, bucket, id) rows, then an
  exact-Jaccard verify that re-shingles ONLY candidate docs. Linear
  in N with the 24-byte-index-row constant; text is touched for
  candidates alone.
- build: the amortized once-per-corpus-version cost (reported
  separately, same convention as incr_dedup_probe).

Usage: python tools/serving_dedup_probe.py [n ...]  (default 100000 250000)
Prints one JSON line per size.
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
    minhash_dedup_pairs,
    minhash_pairs_from_index,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.docgen import (  # noqa: E402
    DocGenDataSource,
)

THRESHOLD = 0.6
PARAMS = dict(k=3, num_hashes=64, bands=16)


def planted_corpus(spark, n: int):
    """docgen corpus ∪ light mutations of every 50th doc (ids shifted
    by 10M) — a known near-dup population at any N."""
    base = (
        spark.read.format("docgen")
        .option("n_docs", n)
        .option("n_partitions", 32)
        .option("seed", 7)
        .load()
        .select("doc_id", "text")
    )
    words = F.split("text", " ")
    mutated = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.filter(words, lambda w, i: F.pmod(i, F.lit(17)) != 0),
        ).alias("text"),
    )
    return base.unionByName(mutated)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 250_000]
    spark = get_spark(
        "serving-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DocGenDataSource)

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    for n in sizes:
        docs = planted_corpus(spark, n)
        docs.count()  # materialize generator cost out of the first timing
        tmp = tempfile.mkdtemp(prefix="serving_probe_")
        idx = os.path.join(tmp, "bands")
        t0 = time.perf_counter()
        build_minhash_band_index(docs, "doc_id", "text", idx, **PARAMS)
        build_s = time.perf_counter() - t0

        served_best = one_shot_best = float("inf")
        n_pairs = None
        for _ in range(2):
            t0 = time.perf_counter()
            run_noop(
                minhash_pairs_from_index(
                    docs, idx, "doc_id", "text", threshold=THRESHOLD
                )
            )
            served_best = min(served_best, time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            run_noop(
                minhash_dedup_pairs(
                    docs, "doc_id", "text", threshold=THRESHOLD, **PARAMS
                )
            )
            one_shot_best = min(one_shot_best, time.perf_counter() - t0)
        n_pairs = minhash_pairs_from_index(
            docs, idx, "doc_id", "text", threshold=THRESHOLD
        ).count()
        shutil.rmtree(tmp, ignore_errors=True)
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "build_s": round(build_s, 2),
                    "served_s": round(served_best, 2),
                    "one_shot_s": round(one_shot_best, 2),
                    "speedup": round(one_shot_best / served_best, 2),
                    "n_pairs": n_pairs,
                }
            )
        )


if __name__ == "__main__":
    main()
