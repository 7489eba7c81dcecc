"""Measure the token-stats artifact crossover (SCALE.md §25).

Times, at $SPARK_GRAFT_SF_DIR (default sf0.1):
- the artifact build (the one corpus tokenize pass + tf-frame aggs),
- each consumer SERVED from the artifact (warm path),
- each consumer's PRE-ARTIFACT form recomputing its statistics from
  raw text (what rounds ≤7 shipped),
and prints the per-query savings + the build break-even point.

Usage: python tools/token_stats_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(label, fn, trials=3, extra=None):
    best = min(_once(fn) for _ in range(trials))
    rec = {"step": label, "sec": round(best, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return best


def _once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark("token-stats-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.extensions.retrieval import bm25_topk
    from aws_imdb_data_pipeline_spark.extensions.textstats import (
        top_terms_per_doc,
        unigram_lm_scores,
    )
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats
    from aws_imdb_data_pipeline_spark.plans.registry import REGISTRY
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    art = tempfile.mkdtemp(prefix="token_stats_probe_")
    os.environ["SPARK_GRAFT_ARTIFACTS"] = art
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        # ---- build (cold) ----
        t_build = timed(
            "artifact_build", lambda: token_stats(spark, sf_dir), trials=1
        )

        # ---- served (warm) vs pre-artifact forms ----
        queries = docs.filter(F.col("doc_id") % 20 == 0).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(
                    F.filter(
                        F.split(F.lower("text"), r"\s+"), lambda w: w != ""
                    ),
                    1, 6,
                ),
                " ",
            ).alias("qtext"),
        )
        pairs = {
            "bm25_self_retrieval": (
                lambda: noop(REGISTRY["bm25_self_retrieval"].fn(spark, sf_dir)),
                lambda: noop(
                    bm25_topk(
                        docs, queries, id_col="doc_id", text_col="text",
                        qid_col="query_id", qtext_col="qtext", k=3,
                    )
                ),
            ),
            "doc_lm_scores": (
                lambda: noop(REGISTRY["doc_lm_scores"].fn(spark, sf_dir)),
                lambda: noop(unigram_lm_scores(docs, "doc_id", "text")),
            ),
            "doc_top_terms": (
                lambda: noop(REGISTRY["doc_top_terms"].fn(spark, sf_dir)),
                lambda: noop(
                    top_terms_per_doc(docs, id_col="doc_id", text_col="text", k=3)
                ),
            ),
            "vocab_coverage": (
                lambda: noop(REGISTRY["vocab_coverage"].fn(spark, sf_dir)),
                None,  # new in round 8: no pre-artifact form shipped
            ),
            "bm25_hard_negatives": (
                lambda: noop(REGISTRY["bm25_hard_negatives"].fn(spark, sf_dir)),
                None,
            ),
        }
        saved_total = 0.0
        for name, (served, old) in pairs.items():
            t_served = timed(f"{name}_served", served)
            if old is not None:
                t_old = timed(f"{name}_raw", old)
                saved_total += max(0.0, t_old - t_served)
        print(
            json.dumps(
                {
                    "step": "summary",
                    "sf_dir": sf_dir,
                    "build_sec": round(t_build, 3),
                    "saved_per_suite_pass_sec": round(saved_total, 3),
                    "break_even_passes": round(t_build / saved_total, 2)
                    if saved_total
                    else None,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(art, ignore_errors=True)


if __name__ == "__main__":
    main()
