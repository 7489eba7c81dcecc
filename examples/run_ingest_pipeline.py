"""Day-2 ingest: a new crawl increment admitted, deduped, cleaned and
landed against an EXISTING corpus — the streaming/incremental half of
the curation surface (examples/run_corpus_pipeline.py is the day-0
batch build).

    corpus bootstrap: MinHash band index artifact (built once)
    → new crawl arrives as a STREAM (docgen micro-batches)
    → per-source quota admission (stateful streaming, one long/source)
    → admitted docs stream through incremental near-dup vs the
      PERSISTED index (foreachBatch; corpus never re-minhashed)
    → batch finish: drop matched re-crawls, strip cross-document
      boilerplate chunks (hashed keys)
    → landed increment partitioned by source + expectation gate

Every stage is an operator a registered query/test exercises
(`admit_per_source_quota`, `stream_incremental_near_dup`,
`remove_repeated_lines`, the band-index artifact); this example
proves they compose: the quota feed carries
ids only (payload re-fetched by id — the real admission-queue shape),
the dedup stream reads the quota lake as a FILE-SOURCE stream, and
the finishing pass is pure batch over the landed increments.

Run: python examples/run_ingest_pipeline.py [workdir]
The existing corpus is yesterday's crawl of the same feed (docgen,
every even-id page); today's crawl re-fetches the whole feed under
shifted ids — every micro-batch interleaves true re-crawls (the index
drops them) with genuinely new pages (they land).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.extensions.corpus import (
    remove_repeated_lines,
)
from aws_imdb_data_pipeline_spark.extensions.dedup import (
    build_minhash_band_index,
)
from aws_imdb_data_pipeline_spark.quality import (
    expect_min_rows,
    expect_not_null,
    expect_unique,
    validate,
)
from aws_imdb_data_pipeline_spark.sources.docgen import DocGenDataSource
from aws_imdb_data_pipeline_spark.streaming.incremental import (
    stream_incremental_near_dup,
)
from aws_imdb_data_pipeline_spark.streaming.quota import (
    admit_per_source_quota,
)

N_CRAWL = 400
QUOTA = 12
ID_SHIFT = 10_000_000


def _idle(query) -> bool:
    # drained = the last completed trigger ingested zero rows (all
    # pending input processed) after at least one real batch — or the
    # query already terminated on its own
    if not query.isActive:
        return True
    p = query.lastProgress
    return p is not None and p["numInputRows"] == 0 and p["batchId"] >= 1


def _drain(query, done, deadline_s=180):
    deadline = time.time() + deadline_s
    while not done() and time.time() < deadline:
        time.sleep(1)
    try:
        query.stop()
    except Exception:
        pass  # a stop racing the final trigger is fine: data is on disk


def main(workdir: str | None = None, spark=None) -> dict:
    work = workdir or tempfile.mkdtemp(prefix="ingest_pipeline_")
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark("ingest-pipeline-example")
        spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DocGenDataSource)

    # ---- day-0 bootstrap: the corpus and its band index artifact.
    # The existing corpus is YESTERDAY'S crawl of the same feed: every
    # even-id page. Today's crawl re-fetches the whole feed, so every
    # micro-batch interleaves true re-crawls (even ids — the index
    # must drop them) with genuinely new pages (odd ids — they land).
    corpus = (
        spark.read.format("docgen")
        .options(n_docs=str(N_CRAWL), rows_per_batch="100", seed="3")
        .load()
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )
    index_path = os.path.join(work, "band_index")
    build_minhash_band_index(corpus, "doc_id", "text", index_path)

    # ---- stage 1: quota admission over the arriving crawl stream ----
    crawl_opts = {"n_docs": str(N_CRAWL), "rows_per_batch": "100", "seed": 3}
    crawl_stream = (
        spark.readStream.format("docgen").options(**crawl_opts).load()
        .select("source", (F.col("doc_id") + ID_SHIFT).alias("doc_id"))
    )
    admitted_dir = os.path.join(work, "admitted")
    q1 = (
        admit_per_source_quota(crawl_stream, cap=QUOTA)
        .writeStream.format("parquet")
        .option("path", admitted_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt_quota"))
        .outputMode("append")
        .start()
    )
    _drain(q1, lambda: _idle(q1))
    admitted_ids = spark.read.parquet(admitted_dir).select("doc_id")

    # payload re-fetch by id (the admission feed carries ids only) —
    # docgen regenerates deterministically; a real pipeline reads its
    # fetch store here
    crawl_batch = (
        spark.read.format("docgen").options(**crawl_opts).load()
        .select(
            (F.col("doc_id") + ID_SHIFT).alias("doc_id"), "text", "source"
        )
    )
    admitted_docs = crawl_batch.join(admitted_ids, "doc_id", "left_semi")
    admitted_path = os.path.join(work, "admitted_docs")
    admitted_docs.write.mode("overwrite").parquet(admitted_path)

    # ---- stage 2: incremental near-dup vs the persisted index, as a
    # file-source stream over the admitted lake ----
    admitted_stream = (
        spark.readStream.schema(admitted_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(admitted_path)
        .select("doc_id", "text")
    )
    pairs_dir = os.path.join(work, "near_dup_pairs")
    q2 = stream_incremental_near_dup(
        admitted_stream, corpus, index_path, pairs_dir,
        os.path.join(work, "ckpt_dedup"), threshold=0.8,
    )
    n_admitted = admitted_docs.count()

    _drain(q2, lambda: _idle(q2))
    try:
        matched = (
            spark.read.parquet(pairs_dir).select("new_id").distinct()
        )
    except Exception:
        matched = spark.createDataFrame([], "new_id long")

    # ---- stage 3: batch finish on the accepted increment ----
    accepted = admitted_docs.join(
        matched.withColumnRenamed("new_id", "doc_id"), "doc_id", "left_anti"
    )
    # boilerplate strip at 10-word-chunk granularity: derive the
    # multi-line form (chunks joined by newline — same derivation the
    # oracled corpus_remove_boilerplate query uses), drop chunks shared
    # by >= 3 admitted docs, and land the cleaned single-line text
    words = F.split("text", " ")
    n_chunks = F.ceil(F.size(words) / 10.0).cast("int")
    chunked = accepted.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(words, i * 10 + 1, 10), " "),
            ),
            "\n",
        ).alias("text"),
    )
    cleaned = remove_repeated_lines(
        chunked, "doc_id", "text", min_docs=3, key_on_hash=True
    ).select(
        "doc_id",
        F.regexp_replace("text", "\n", " ").alias("clean_text"),
    )
    final = accepted.join(cleaned, "doc_id").select(
        "doc_id", "source", "clean_text"
    )
    out_dir = os.path.join(work, "increment")
    final.write.mode("overwrite").partitionBy("source").parquet(out_dir)

    landed = spark.read.parquet(out_dir)
    validate(
        [
            expect_min_rows(landed, 1),
            expect_not_null(landed, "doc_id"),
            expect_unique(landed, ["doc_id"]),
        ]
    )
    report = {
        "admitted": n_admitted,
        "matched_recrawls": matched.count(),
        "landed": landed.count(),
        "sources": landed.select("source").distinct().count(),
    }
    print(report)
    if owns_spark:
        spark.stop()
    return report


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
