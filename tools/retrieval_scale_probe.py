"""Token-stats / BM25 asymptotics on a REALISTIC vocabulary.

The shipped testdata corpus has 31 distinct terms, which makes every
query term match ~1/31 of ALL postings — the degenerate worst case
SCALE.md §25 documents. This probe rebuilds the measurement on a
synthetic corpus with a 5,000-term vocabulary (JVM-side generation:
``concat_ws(transform(sequence(...)))`` over ``spark.range`` — no
Python rows), where the posting probe is selective, and measures:

- the artifact build (one corpus tokenize + tf-frame aggregates),
- a 1,000-query BM25 batch served from the artifact vs recomputing
  corpus statistics from raw text per batch,
- incremental vocabulary maintenance (merge_dfl) for a 1% append vs
  a full rebuild.

Usage: python tools/retrieval_scale_probe.py [n_docs]  (default 300k)
Prints one JSON line per step.
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

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(label, fn, trials=3, extra=None):
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rec = {"step": label, "sec": round(best, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return best


def gen_docs(spark, n, offset=0):
    # ~45-125 words per doc from a 5k-term vocabulary; word draw mixes
    # doc id and position so term frequency varies across docs
    return spark.range(offset, offset + n).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 45 + CAST(pmod(id, 80) AS INT)),"
        " i -> concat('w', pmod(hash(id, i), 5000)))) AS text",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark("retrieval-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from aws_imdb_data_pipeline_spark.extensions.retrieval import bm25_topk
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import (
        batch_token_stats,
        merge_dfl,
        token_stats,
    )

    work = tempfile.mkdtemp(prefix="retrieval_probe_")
    art = tempfile.mkdtemp(prefix="retrieval_probe_art_")
    os.environ["SPARK_GRAFT_ARTIFACTS"] = art
    try:
        gen_docs(spark, n).write.parquet(os.path.join(work, "documents.parquet"))
        docs = spark.read.parquet(os.path.join(work, "documents.parquet"))

        t_build = timed(
            "artifact_build",
            lambda: token_stats(spark, work),
            trials=1,
            extra={"n_docs": n},
        )
        ts = token_stats(spark, work)

        queries = docs.filter(F.col("doc_id") % (n // 1000) == 0).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(F.split(F.lower("text"), r"\s+"), 1, 6), " "
            ).alias("qtext"),
        )
        tf = ts.tfl().select(
            "doc_id", F.col("lword").alias("__t"),
            F.col("tf").alias("__tf"), F.col("dl").alias("__dl"),
        )
        dfreq = ts.dfl().select(
            F.col("lword").alias("__t"), F.col("df").alias("__df")
        )

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        t_served = timed(
            "bm25_1k_queries_served",
            lambda: noop(
                bm25_topk(
                    docs, queries, k=5,
                    corpus=(tf, dfreq, (ts.n_docs, ts.avgdl)),
                )
            ),
            trials=2,
        )
        t_raw = timed(
            "bm25_1k_queries_raw",
            lambda: noop(bm25_topk(docs, queries, k=5)),
            trials=1,
        )

        batch = gen_docs(spark, n // 100, offset=n)
        def merge():
            _btfl, bdfl = batch_token_stats(batch)
            noop(merge_dfl(ts.dfl(), bdfl))
        t_merge = timed("vocab_merge_1pct_append", merge, trials=2)
        def rebuild():
            _t, d = batch_token_stats(docs.unionByName(batch))
            noop(d)
        t_rebuild = timed("vocab_full_rebuild", rebuild, trials=1)

        print(
            json.dumps(
                {
                    "step": "summary",
                    "n_docs": n,
                    "build_sec": round(t_build, 3),
                    "serve_speedup": round(t_raw / t_served, 1),
                    "merge_speedup": round(t_rebuild / t_merge, 1),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(art, ignore_errors=True)


if __name__ == "__main__":
    main()
