"""End-to-end training-corpus build: the LLM-data extension surface
composed into one gated pipeline.

    quality filters (C4 rules + repetition signals)
    → PII redaction → exact dedup (keep-list)
    → benchmark decontamination → LM perplexity-tail filter
    → split assignment → per-source mixture sampling
    → token-budget packing → deterministic training-order shuffle
    → partitioned lake write → expectation gate + composition report

Every stage is the same operator a registered query exercises
(`c4_style_filters`, `repetition_signals`, `dedup_keep_list`,
`corpus_contamination`, `lm_quality_buckets`, `corpus_split_counts`,
`corpus_mixture_sample`, `corpus_pack_bins`, `corpus_shuffle_shards`); this example proves they compose — filters stay
whole-stage-codegen projections that pipeline into one scan, the only
shuffles are the dedup window and the contamination join, and the final
write is Hive-partitioned by (split, source) so downstream training
jobs prune to their slice.

Run: python examples/run_corpus_pipeline.py [workdir]
Reads /root/testdata/sf0.001/documents.parquet unless $SPARK_GRAFT_SF_DIR
points elsewhere.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.extensions.corpus import (
    contamination_overlap,
    mixture_sample,
    pack_documents,
    redact_pii,
    seeded_shuffle,
    split_assignment,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import (
    repetition_signals,
    unigram_lm_scores,
)
from aws_imdb_data_pipeline_spark.quality import (
    expect_min_rows,
    expect_not_null,
    expect_unique,
    validate,
)

PACK_BUDGET = 512  # tokens per training bin


def mixture_rates(docs: DataFrame) -> dict[str, float]:
    """Design the source mixture from the observed source list (tiny
    driver-side control flow — one distinct over a low-cardinality
    column): keep even-numbered sources fully, downsample the rest."""
    sources = [r.source for r in docs.select("source").distinct().collect()]
    return {
        s: 1.0 if int("".join(filter(str.isdigit, s)) or 0) % 2 == 0 else 0.5
        for s in sources
    }


def quality_gate(docs: DataFrame) -> DataFrame:
    """Stage 1 — C4-style hard filters + Gopher repetition caps as one
    codegen'd projection; survivors keep flowing, nothing materializes."""
    words = F.split(F.col("text"), r"\s+")
    n_words = F.size(words)
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    symbols = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
    scored = repetition_signals(docs)
    return scored.filter(
        (n_words >= 10)
        & (n_words <= 100000)
        & (nonspace / n_words).between(2, 12)
        & (symbols / nonspace <= 0.1)
        & (F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)) <= 0.95)
        & (F.coalesce(F.col("top_bigram_frac"), F.lit(1.0)) <= 0.9)
    ).drop("dup_bigram_frac", "top_bigram_frac", "dup_trigram_frac", "top_trigram_frac")


def dedup_gate(docs: DataFrame) -> DataFrame:
    """Stage 3 — normalized exact dedup, survivor = min doc_id. One
    shuffle; at 100 TB partition on xxhash64 of the normalized text."""
    ntext = F.lower(F.regexp_replace(F.col("clean_text"), r"\s+", " "))
    w = Window.partitionBy(ntext)
    return (
        docs.withColumn("__survivor", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__survivor"))
        .drop("__survivor")
    )


def decontamination_gate(
    docs: DataFrame, benchmark: DataFrame, max_ratio: float = 0.5
) -> DataFrame:
    """Stage 4 — drop documents sharing too many 3-gram shingles with
    the benchmark. Benchmark side broadcast (eval sets are tiny)."""
    overlap = contamination_overlap(
        docs.select("doc_id", F.col("clean_text").alias("text")),
        benchmark.select("doc_id", "text"),
    ).select("doc_id", "contamination_ratio")
    return docs.join(overlap, "doc_id", "left").filter(
        F.coalesce(F.col("contamination_ratio"), F.lit(0.0)) <= max_ratio
    ).drop("contamination_ratio")


def lm_tail_gate(docs: DataFrame, drop_frac: float = 1 / 3) -> DataFrame:
    """Stage 4.5 — CCNet-style perplexity filter: drop the worst
    ``drop_frac`` of documents by unigram-LM mean log-prob. The cutoff
    is ONE exact percentile (a broadcast scalar — swap in
    approx_percentile at 100 TB); scoring is two shuffles
    (extensions.textstats.unigram_lm_scores)."""
    scored = unigram_lm_scores(
        docs.select("doc_id", F.col("clean_text").alias("text"))
    ).select("doc_id", "avg_logprob")
    cut = scored.agg(
        F.percentile("avg_logprob", F.lit(drop_frac)).alias("__cut")
    )
    keep = (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("avg_logprob") >= F.col("__cut"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def build_corpus(spark, sf_dir: str, out_dir: str) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_raw = docs.count()

    # benchmark = a held-out slice standing in for an eval set
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    staged = quality_gate(docs)
    staged = redact_pii(staged)  # stage 2: adds clean_text, n_redactions
    staged = dedup_gate(staged)
    staged = decontamination_gate(staged, benchmark)
    staged = lm_tail_gate(staged)  # stage 4.5: perplexity-tail drop
    staged = split_assignment(staged, "doc_id")  # stage 5: adds split
    sampled = mixture_sample(staged, mixture_rates(docs))  # stage 6

    # stage 7: pack the train split into fixed-token bins
    train = sampled.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.col("clean_text"), r"\s+"))
    )
    packed = pack_documents(train, "doc_id", "n_tokens", PACK_BUDGET)

    final = sampled.join(
        packed.select("doc_id", "bin_id"), "doc_id", "left"
    ).select(
        "doc_id", "clean_text", "n_redactions", "lang", "source", "split", "bin_id"
    )
    # stage 8: reproducible training order (plan-stable, unlike rand)
    final = seeded_shuffle(final, "doc_id", seed=20240814, n_shards=4)
    final.write.mode("overwrite").partitionBy("split", "source").parquet(out_dir)

    built = spark.read.parquet(out_dir)
    # expectation gate on the built corpus — halts before any consumer
    validate(
        [
            expect_min_rows(built, 1),
            expect_not_null(built, "doc_id"),
            expect_not_null(built, "split"),
            expect_unique(built, ["doc_id"]),
        ]
    )
    report = {
        r["split"]: r["n"]
        for r in built.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n_bins = built.filter(F.col("bin_id").isNotNull()).select("bin_id").distinct().count()
    return {
        "raw_docs": n_raw,
        "built_docs": sum(report.values()),
        "splits": report,
        "train_bins": n_bins,
    }


def main(workdir: str | None = None) -> None:
    workdir = workdir or tempfile.mkdtemp(prefix="corpus_")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark()
    stats = build_corpus(spark, sf_dir, os.path.join(workdir, "corpus"))
    print(f"corpus build complete: {stats}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
