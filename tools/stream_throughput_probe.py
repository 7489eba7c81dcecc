"""Structured Streaming throughput probe: drain N synthetic events
through the watermarked tumbling-window aggregation and report
events/second (end-to-end: file source -> window agg -> memory sink).

Usage: python tools/stream_throughput_probe.py [n_events] [n_files]
       (defaults 1_000_000 events across 32 files, 8 files/trigger)

The event stream is staged as parquet files (the local stand-in for a
Kafka topic — same transformations, different ``format()``); timing
starts when the query starts and stops when the availableNow drain
terminates, so it includes every micro-batch's planning + state
update + sink commit. Numbers go to SCALE.md §7.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_imdb_data_pipeline_spark.session import get_spark  # noqa: E402
from aws_imdb_data_pipeline_spark.streaming import (  # noqa: E402
    stream_events_from_dir,
    tumbling_counts,
)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("stream-throughput-probe")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        # synthetic events: ~30 days of per-second activity, seeded ids
        (
            spark.range(n_events)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.pmod(F.xxhash64("id"), F.lit(2_592_000))
                ).alias("ts"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in ("view", "click", "purchase")]),
                    (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(3)) + 1).cast("int"),
                ).alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)) / 10.0).alias(
                    "value"
                ),
            )
            .repartition(n_files)
            .write.parquet(src)
        )
        schema = spark.read.parquet(src).schema

        stream = stream_events_from_dir(spark, src, schema, max_files_per_trigger=8)
        agg = tumbling_counts(stream, window_size="1 hour", watermark="2 hours")
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName("probe_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        n_batches = len(q.recentProgress)
        print(
            json.dumps(
                {
                    "n_events": n_events,
                    "n_files": n_files,
                    "wall_sec": round(wall, 2),
                    "events_per_sec": int(n_events / wall),
                    "micro_batches": n_batches,
                    "result_rows": spark.table("probe_sink").count(),
                }
            )
        )


if __name__ == "__main__":
    main()
