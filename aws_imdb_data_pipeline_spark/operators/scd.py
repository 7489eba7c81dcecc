"""Slowly-changing-dimension (type 2) history construction.

The reference's warehouse layer rebuilds dimensions from full snapshots
(airflow/dags/imdb_batch_pipeline.py staged loads); a complete engine
also needs the change-history form: given an event/observation stream
per entity, produce validity-interval rows (effective_from,
effective_to, is_current, version) with consecutive duplicate states
collapsed. That is SCD2 compression, and it is pure window algebra —
no merge loop, no driver iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
    out_prefix: str = "",
) -> DataFrame:
    """Compress an observation stream into SCD2 validity intervals.

    For each ``key_col`` entity, order observations by (ts, tiebreak)
    and keep only rows where ``attr_col`` CHANGED vs the previous
    observation (first observation always kept, null-safe comparison).
    Each kept row becomes one dimension row:

    - ``effective_from`` = its timestamp
    - ``effective_to``   = the next kept row's timestamp (NULL = open)
    - ``is_current``     = effective_to IS NULL
    - ``version``        = 1-based change ordinal per entity

    Two windows over the SAME (key) partitioning → one shuffle: the
    change filter's lag runs on the raw stream, the interval lead on
    the compressed stream, and both exchanges hash on ``key_col`` (AQE
    reuses the exchange). Deterministic given a unique tiebreak.
    """
    w_raw = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = df.withColumn(
        "__prev", F.lag(F.col(attr_col)).over(w_raw)
    ).filter(~F.col(attr_col).eqNullSafe(F.col("__prev")))

    w_kept = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    p = out_prefix
    return (
        changed.withColumn(f"{p}effective_from", F.col(ts_col))
        .withColumn(f"{p}effective_to", F.lead(F.col(ts_col)).over(w_kept))
        .withColumn(f"{p}is_current", F.col(f"{p}effective_to").isNull())
        .withColumn(f"{p}version", F.row_number().over(w_kept))
        .drop("__prev")
    )
