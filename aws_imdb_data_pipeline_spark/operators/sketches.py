"""Mergeable-sketch operators: incremental distinct counting with HLL
sketches (Apache DataSketches, built into Spark >= 3.5).

The 100 TB pattern this enables: a nightly job computes ONE small HLL
sketch per (partition, column) — a few KB each — and stores them next
to the data (here: a tiny parquet side table). Any later rollup
("distinct users last 90 days", "distinct keys across all runs")
merges the stored sketches in milliseconds instead of rescanning
terabytes. Sketches are commutative/associative, so late or replayed
partitions just re-merge; estimates carry the usual HLL error
(~1.6% at lgConfigK=12, tested).

The DQ profiler's `approx_count_distinct` answers "how many distinct
NOW"; these operators answer "how many distinct across ANY combination
of slices, later, without the raw data".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "hll_sketch"


def partition_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``key_cols`` group — the
    artifact to persist alongside each written partition. One shuffle
    (partial sketches merge map-side, exactly like a sum)."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(SKETCH_COL),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored sketches — all of them, or per ``group_cols`` —
    and estimate the distinct count of the union. Input is the tiny
    sketch table, so this runs in milliseconds regardless of how much
    raw data the sketches summarize."""
    merged = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    ).agg(
        F.hll_union_agg(SKETCH_COL).alias(SKETCH_COL),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(SKETCH_COL).cast("long")
    ).drop(SKETCH_COL)
