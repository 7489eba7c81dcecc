"""End-to-end retrieval stack: the lexical + dense serving surface
composed into one flow.

    token-stats artifact (build-if-missing, one corpus tokenize)
    → BM25 self-retrieval (persisted postings + broadcast query probe)
    → hard-negative mining (gold-excluded ranking, contrastive pairs)
    → RRF hybrid fusion (BM25 ranks ⊕ dense cosine ranks)
    → streaming serve (the same artifact answering a query stream
      micro-batch by micro-batch, availableNow)

Every stage is the same operator a registered query exercises
(`bm25_self_retrieval`, `bm25_hard_negatives`,
`rrf_hybrid_retrieval`; `streaming.bm25serve`); this example proves
they compose into the hard-negative-mining / first-stage-retrieval
flow an embedding-training pipeline runs: ONE artifact build
amortizes across every downstream consumer (SCALE.md §25), and the
serve loop never touches raw corpus text.

Run: python examples/run_retrieval_pipeline.py [workdir]
Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402


def run_retrieval(spark, sf_dir: str, workdir: str) -> dict:
    from aws_imdb_data_pipeline_spark.extensions.tokenindex import token_stats
    from aws_imdb_data_pipeline_spark.plans.registry import REGISTRY
    from aws_imdb_data_pipeline_spark.sources.tables import load_table
    from aws_imdb_data_pipeline_spark.streaming.bm25serve import (
        stream_bm25_topk,
    )

    # stage 1: the one corpus-sized pass (no-op when fresh)
    ts = token_stats(spark, sf_dir)

    # stages 2-4: retrieval consumers, all riding the same artifact
    pos = REGISTRY["bm25_self_retrieval"].fn(spark, sf_dir)
    neg = REGISTRY["bm25_hard_negatives"].fn(spark, sf_dir)
    fused = REGISTRY["rrf_hybrid_retrieval"].fn(spark, sf_dir)
    n_pos, n_neg, n_fused = pos.count(), neg.count(), fused.count()

    # contrastive pairs: (query, gold, hard negative) — what an
    # embedding trainer actually consumes
    pairs = (
        neg.select(
            "query_id",
            F.col("query_id").alias("gold_doc_id"),
            F.col("doc_id").alias("negative_doc_id"),
            "rank",
        )
    )
    pairs_dir = os.path.join(workdir, "contrastive_pairs")
    pairs.write.mode("overwrite").parquet(pairs_dir)

    # stage 5: the SAME artifact serving a query stream
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != ""),
                1, 6,
            ),
            " ",
        ).alias("qtext"),
    )
    feed = os.path.join(workdir, "query_feed")
    queries.repartition(2).write.mode("overwrite").parquet(feed)
    out = os.path.join(workdir, "served")
    q = stream_bm25_topk(
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        sf_dir, out, os.path.join(workdir, "ckpt"),
        k=3, trigger_available_now=True,
    )
    q.awaitTermination(180)
    q.stop()
    n_served = spark.read.parquet(out).count()

    return {
        "corpus_docs": ts.n_docs,
        "corpus_tokens": ts.sum_dl,
        "bm25_results": n_pos,
        "hard_negatives": n_neg,
        "hybrid_results": n_fused,
        "stream_served": n_served,
    }


def main(workdir: str | None = None) -> None:
    workdir = workdir or tempfile.mkdtemp(prefix="retrieval_")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark()
    stats = run_retrieval(spark, sf_dir, workdir)
    print(f"retrieval stack complete: {stats}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
