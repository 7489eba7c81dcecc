"""Streaming EXACT distinct counting from OR-merged bitmap partials.

Distinct-user counting on a stream is usually served approximately
(HLL state) because additive counters can't undo a replayed batch.
The bitmap partial (operators/sketches.py:bitmap_partials — one ≤4 KB
page per (key group, 32768-value bucket) of an integer key column)
removes that trade-off: the state merge is a bitwise OR, and OR is
IDEMPOTENT, so an at-least-once replay that re-merges the same batch
leaves the state bit-identical. The committed state therefore answers
"exact distinct users per group so far" at any time, exactly, from a
KB-scale artifact.

The versioned-marker protocol (streaming/ivmserve.py) is still used —
it gives atomic publication, skips redundant replay work, and rejects
a different stream claiming the state dir — but unlike the additive
IVM/drift state, correctness here does not DEPEND on the skip: a
replay that raced past the marker would OR in the same bits and
change nothing. That claim requires the commit to be a STAGE +
RENAME (below): a same-version replay re-merges prev FROM
``v={batch_id}`` while writing the result INTO ``v={batch_id}``, and
a lazy in-place ``mode("overwrite")`` of a path being read is exactly
the self-overwrite Spark rejects. Writing to a staging dir and
renaming makes the OR-idempotence argument hold for the
implementation, not just the algebra. ``n_rows`` is deliberately
dropped from the streaming state for the same reason (a sum is not
idempotent); row counting belongs to an additive view, not the
distinct artifact.

100 TB story: per trigger the stream-side work is one partial
aggregate over the batch (bitmap pages combine map-side); state
read+write is a |groups| × |buckets| frame of 4 KB pages —
independent of event volume and history length, proportional only to
the live key domain. Reading the current answer never touches the raw
stream history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.sketches import (
    BITMAP_BUCKET_COL,
    BITMAP_COL,
    bitmap_distinct,
    bitmap_partials,
)

# Commit-parallelism target: one output file per ~64 MB of on-disk
# state. At the design domain (KB-MB state) this stays 1 — identical
# to the old coalesce(1) — but a very large (group x bucket) domain
# (e.g. 50M-user buckets x days = GB-scale pages) no longer funnels
# the whole state write through a single task.
_STATE_BYTES_PER_PARTITION = 64 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total
from aws_imdb_data_pipeline_spark.streaming.ivmserve import (
    _gc_versions,
    _read_marker,
    _replay_guard,
    _write_marker,
)


def current_distinct(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT distinct counts per ``group_cols`` (or one global row) as
    of the latest committed version — two tiny aggregations over the
    stored bitmap pages."""
    marker = _read_marker(state_dir)
    if marker is None:
        raise FileNotFoundError(
            f"no committed bitmap state under {state_dir}"
        )
    pages = spark.read.parquet(
        os.path.join(state_dir, f"v={marker['batch_id']}", "bitmaps")
    )
    return bitmap_distinct(pages, group_cols)


def stream_distinct_bitmaps(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    key_cols: list[str],
    value_col: str,
    trigger_available_now: bool = False,
):
    """Start a query folding each arriving micro-batch's bitmap
    partials into the committed state with a per-(key, bucket) OR.
    Semantics per batch are identical to the batch operator on the
    same rows (pinned by tests/test_streaming.py): foreachBatch hands
    a plain DataFrame, so the exact same bitmap_partials plan runs."""
    spark = stream_df.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = _read_marker(state_dir)
        if _replay_guard(marker, batch_id, checkpoint_dir):
            return  # replay of an already-committed batch

        delta = bitmap_partials(batch_df, key_cols, value_col).drop(
            "n_rows"
        )
        n_parts = 1
        if marker is not None:
            prev_dir = os.path.join(
                state_dir, f"v={marker['batch_id']}", "bitmaps"
            )
            prev = spark.read.parquet(prev_dir)
            merged = (
                prev.unionByName(delta)
                .groupBy(*key_cols, BITMAP_BUCKET_COL)
                .agg(F.bitmap_or_agg(BITMAP_COL).alias(BITMAP_COL))
            )
            # domain-proportional commit parallelism: size the write
            # from the PREVIOUS version's on-disk bytes (state grows
            # by at most the batch's new pages, so prev is the right
            # estimator and costs one os.walk, no extra Spark job)
            n_parts = max(
                1, -(-_dir_bytes(prev_dir) // _STATE_BYTES_PER_PARTITION)
            )
        else:
            merged = delta  # already one page per (key, bucket)

        # Stage + rename: the merged plan lazily READS the previous
        # version while the write runs, and on a same-version replay
        # (marker lost, guard bypassed) prev and the target are the
        # SAME directory — an in-place overwrite would self-clobber.
        # Writing to a sibling staging dir and os.replace-ing it into
        # place makes every replay shape safe and keeps the version
        # publication crash-atomic (a crashed commit leaves only an
        # unreferenced staging dir, cleaned on the next attempt).
        vdir = os.path.join(state_dir, f"v={batch_id}")
        staging = os.path.join(state_dir, f"_staging_v{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        merged.repartition(
            n_parts, *key_cols, BITMAP_BUCKET_COL
        ).write.mode("overwrite").parquet(os.path.join(staging, "bitmaps"))
        if os.path.exists(vdir):
            # orphan from a crash between data write and marker move —
            # never published (the marker still points elsewhere)
            shutil.rmtree(vdir)
        os.replace(staging, vdir)
        _write_marker(
            state_dir,
            {"batch_id": batch_id, "checkpoint": checkpoint_dir},
        )
        if marker is not None and marker["batch_id"] >= 1:
            _gc_versions(state_dir, marker["batch_id"])

    writer = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
