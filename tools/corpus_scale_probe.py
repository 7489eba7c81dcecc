"""Corpus-operator scale probe: run the training-data operators on a
docgen-generated corpus ~200x the sf0.1 documents table, measure wall
time per stage, print one JSON line.

Usage: python tools/corpus_scale_probe.py [n_docs] (default 1_000_000)

This is the measurement behind SCALE.md §5 — the corpus ops' cost
shapes (explode + hash aggregate, zero-shuffle projections, window
chunking) validated at a row count where a quadratic or interpreted
hot path would be unmissable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.extensions.corpus import (  # noqa: E402
    chunk_documents,
    redact_pii,
    split_assignment,
)
from aws_imdb_data_pipeline_spark.extensions.textstats import (  # noqa: E402
    exploded_ngrams,
    repetition_signals,
)
from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.sources.docgen import DocGenDataSource  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("corpus-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DocGenDataSource)
    docs = (
        spark.read.format("docgen")
        .option("n_docs", n_docs)
        .option("n_partitions", 64)
        .option("seed", 7)
        .load()
    )

    timings: dict[str, float] = {}

    def stage(name: str, df) -> None:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)

    stage("generate_only", docs)
    stage("split_assignment", split_assignment(docs, "doc_id"))
    stage("redact_pii", redact_pii(docs))
    stage("chunking", chunk_documents(docs, chunk_size=32, overlap=8))
    stage("repetition_signals", repetition_signals(docs).drop("text"))
    stage(
        "top_trigrams",
        exploded_ngrams(docs, 3)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(20),
    )
    stage(
        "exact_dedup_keep_list",
        docs.withColumn(
            "survivor",
            F.min("doc_id").over(__import__("pyspark").sql.Window.partitionBy("text")),
        ),
    )
    print(json.dumps({"n_docs": n_docs, "stages_sec": timings}))


if __name__ == "__main__":
    main()
