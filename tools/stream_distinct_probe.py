"""Streaming exact-distinct probe: drain N events through
stream_distinct_bitmaps in B micro-batches and measure what the
100 TB claim needs measured — per-batch wall staying FLAT as history
accumulates (state read+write is the bitmap page table, independent
of how many events came before) and the committed state size staying
proportional to the live (day, value-bucket) domain, not to history.

Usage: python tools/stream_distinct_probe.py [n_events] [n_batches]
           [user_domain]
       (defaults 10_000_000 events across 20 batches, 1M-user domain)

Events are staged as parquet files (one per micro-batch via
maxFilesPerTrigger=1); per-batch wall comes from the query's
recentProgress, state size from du over the committed version dir.
Numbers go to SCALE.md.
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
from aws_imdb_data_pipeline_spark.streaming.distinctserve import (  # noqa: E402
    current_distinct,
    stream_distinct_bitmaps,
)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    user_domain = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    spark = get_spark(
        "distinct-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # recentProgress retains only numRecentProgressUpdates
            # entries (default 100) — without this a >100-batch probe
            # would silently report a truncated tail as the full
            # per-batch series; raise the buffer past n_batches and
            # flag truncation explicitly in the output regardless.
            "spark.sql.streaming.numRecentProgressUpdates": str(
                n_batches + 8
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="distinct_probe_")
    feed = os.path.join(work, "feed")

    # synthetic stream: 30 days, 1M-user domain, uniform arrivals
    per_batch = n_events // n_batches
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(days=(F.col("id") % 30).cast("int"))
        ).alias("day"),
        F.pmod(F.xxhash64("id"), F.lit(user_domain)).alias("user_id"),
        (F.col("id") / per_batch).cast("int").alias("__file"),
    )
    t0 = time.perf_counter()
    # partitionBy gives exactly one dir per __file value; a hash
    # repartition(n, "__file") collides values into shared partitions
    # and leaves others empty, silently making FEWER, bigger batches
    # (first 50M-domain run: 15 actual batches for n_batches=20, which
    # tripped the truncation flag spuriously)
    ev.repartition(n_batches, "__file").write.partitionBy(
        "__file"
    ).parquet(feed)
    gen_s = time.perf_counter() - t0
    n_feed_files = sum(
        1 for _r, _d, fs in os.walk(feed)
        for f in fs if f.endswith(".parquet")
    )

    state = os.path.join(work, "state")
    stream = (
        spark.readStream.schema(
            "event_id long, day timestamp, user_id long, __file int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .drop("__file")
    )
    t0 = time.perf_counter()
    q = stream_distinct_bitmaps(
        stream,
        state,
        os.path.join(work, "ckpt"),
        key_cols=["day"],
        value_col="user_id",
        trigger_available_now=True,
    )
    q.awaitTermination(3600)
    drain_s = time.perf_counter() - t0
    batch_walls = [
        round(p["batchDuration"] / 1000.0, 2)
        for p in (q.recentProgress or [])
    ]
    q.stop()

    marker = json.load(open(os.path.join(state, "_latest.json")))
    vdir = os.path.join(state, f"v={marker['batch_id']}")
    state_bytes = _du(os.path.join(vdir, "bitmaps"))

    t0 = time.perf_counter()
    rows = current_distinct(spark, state, ["day"]).collect()
    read_s = time.perf_counter() - t0
    total = current_distinct(spark, state).first().distinct_exact

    state_files = sum(
        1 for _r, _d, fs in os.walk(os.path.join(vdir, "bitmaps"))
        for f in fs if f.endswith(".parquet")
    )
    print(json.dumps({
        "n_events": n_events,
        "n_batches": n_batches,
        "user_domain": user_domain,
        "state_files_final": state_files,
        "gen_sec": round(gen_s, 2),
        "drain_sec": round(drain_s, 2),
        "events_per_sec": int(n_events / drain_s),
        "batch_walls_sec": batch_walls,
        "n_feed_files": n_feed_files,
        "batch_walls_truncated": len(batch_walls) < n_feed_files,
        "state_bytes_final": state_bytes,
        "n_days": len(rows),
        "global_distinct": total,
        "read_current_sec": round(read_s, 2),
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
