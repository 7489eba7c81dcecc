"""Stream-stream joins with bounded state.

Batch interval joins (operators.temporal.interval_join) replicate one
side into time buckets; STREAMING interval joins instead lean on
Spark's native stream-stream join machinery: an equi-key plus an
event-time RANGE condition, with watermarks on both inputs. The range
condition is what makes the state finite — Spark derives, per side,
how long a row can still find a partner (watermark + max gap) and
evicts join state past it. Without it a stream-stream join would
buffer both streams forever.

The same function accepts BATCH frames (no watermark applied, same
join condition), which is how the stream path is tested: drain the
streaming plan with availableNow and compare to the batch run on
identical input (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same keys where
    ``left_ts <= right_ts <= left_ts + max_gap_seconds`` (forward
    direction: left is the earlier event — click; right the later —
    purchase).

    Streaming inputs get ``withWatermark(ts, watermark)`` on each side
    (required: Spark rejects stream-stream joins without watermarks +
    a time bound in append mode). ``how='leftOuter'`` emits unmatched
    left rows with NULL right columns once the watermark passes their
    join window — the "clicks that never converted" stream; outer
    emission timing is watermark-driven, so late-arriving output is
    expected within the watermark delay.

    Key and timestamp column names must not collide across the two
    inputs apart from ``on`` (rename right-side duplicates first —
    the returned frame carries all columns of both sides).
    """
    if watermark is not None and left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if watermark is not None and right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # disambiguate the equi-keys on the right so the range condition
    # can reference both sides' columns by name
    renamed = {k: f"__r_{k}" for k in on}
    for k, rk in renamed.items():
        right = right.withColumnRenamed(k, rk)
    cond = None
    for k, rk in renamed.items():
        c = F.col(k) == F.col(rk)
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"interval {int(max_gap_seconds)} seconds")
        )
    )
    return left.join(right, cond, how).drop(*renamed.values())


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: attach dimension attributes to an event
    stream. The static side is broadcast-hinted — each micro-batch
    probes the dimension locally, no shuffle of the stream and no join
    state at all (unlike stream-stream joins, the static side is
    re-resolved per batch, so a dim refresh between batches is picked
    up). The same call works in batch for testing parity."""
    return stream.join(F.broadcast(dim), on, how)
