"""Stream-stream interval join state probe.

streaming/joins.py claims the event-time RANGE condition is what makes
stream-stream join state FINITE (Spark derives per-side "can this row
still find a partner" from watermark + max gap and evicts past it).
This probe measures that claim instead of asserting it: the same
click→purchase interval join over the same input, WITH the range bound
vs WITHOUT (keys-only join — legal for inner joins, but Spark cannot
ever evict state), reporting the state store's row count and memory
from the query's own progress metrics after each micro-batch.

Input: N synthetic events per side written as K time-ordered parquet
files; the file source feeds one file per trigger so the watermark
ADVANCES across micro-batches — eviction only happens when event time
moves, which a single-batch drain would hide.

Usage: python tools/stream_join_state_probe.py [N ...] (default 4M)
Prints one JSON line per (N, variant); copy into SCALE.md §14.
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
from aws_imdb_data_pipeline_spark.streaming.joins import (  # noqa: E402
    interval_join_streams,
)

N_FILES = 16          # micro-batches (one file per trigger)
N_KEYS = 100_000
RATE = 1111           # events/sec/side — FIXED, so event-time span
                      # grows with n: bounded state must stay flat
                      # while unbounded state grows with n
GAP_S = 120           # join window
WATERMARK = "60 seconds"


def write_side(spark, base: str, n: int, offset_s: int, ts_col: str):
    """n rows at RATE events/sec in N_FILES chronological files.
    Event time derives from the row id so files are time-ordered —
    the property that lets the watermark advance batch by batch."""
    per = n // N_FILES
    for i in range(N_FILES):
        (
            spark.range(i * per, (i + 1) * per)
            .select(
                (F.col("id") % N_KEYS).alias("k"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000 + offset_s) + (F.col("id") / RATE)
                ).alias(ts_col),
                F.col("id").alias(f"{ts_col}_id"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(base)
        )


def run_variant(spark, left_dir, right_dir, schema_l, schema_r, ranged: bool):
    left = (
        spark.readStream.schema(schema_l)
        .option("maxFilesPerTrigger", 1)
        .parquet(left_dir)
    )
    right = (
        spark.readStream.schema(schema_r)
        .option("maxFilesPerTrigger", 1)
        .parquet(right_dir)
    )
    if ranged:
        joined = interval_join_streams(
            left, right, ["k"], "lts", "rts", GAP_S, watermark=WATERMARK
        )
    else:
        # keys-only inner join: watermarks set, but no event-time
        # condition -> Spark has no eviction rule, state accretes
        left = left.withWatermark("lts", WATERMARK)
        right = right.withWatermark("rts", WATERMARK).withColumnRenamed(
            "k", "rk"
        )
        joined = left.join(right, F.col("k") == F.col("rk"), "inner")

    ckpt = tempfile.mkdtemp(prefix="sjsp_ckpt_")
    t0 = time.perf_counter()
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    state_rows_max = 0
    state_mem_max = 0
    while q.isActive:
        time.sleep(0.5)
        p = q.lastProgress
        if p and p.get("stateOperators"):
            so = p["stateOperators"][0]
            state_rows_max = max(state_rows_max, so.get("numRowsTotal", 0))
            state_mem_max = max(
                state_mem_max, so.get("memoryUsedBytes", 0)
            )
    q.awaitTermination()
    # final progress after stop
    p = q.lastProgress
    final_rows = (
        p["stateOperators"][0].get("numRowsTotal", 0)
        if p and p.get("stateOperators")
        else None
    )
    wall = round(time.perf_counter() - t0, 2)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "variant": "range_bound" if ranged else "keys_only",
        "wall_sec": wall,
        "state_rows_final": final_rows,
        "state_rows_max": state_rows_max,
        "state_mb_max": round(state_mem_max / 1e6, 1),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4_000_000]
    spark = get_spark(
        "stream-join-state",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        work = tempfile.mkdtemp(prefix="sjsp_")
        ldir, rdir = os.path.join(work, "l"), os.path.join(work, "r")
        write_side(spark, ldir, n, 0, "lts")
        write_side(spark, rdir, n, 30, "rts")  # purchases trail clicks
        schema_l = spark.read.parquet(ldir).schema
        schema_r = spark.read.parquet(rdir).schema
        for ranged in (True, False):
            out = run_variant(spark, ldir, rdir, schema_l, schema_r, ranged)
            out["n_per_side"] = n
            print(json.dumps(out), flush=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
