"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders) is
the shuffle. Writing both tables bucketed BY THE JOIN KEY into the
catalog puts co-keyed rows in matching bucket files, so Catalyst plans
a SortMergeJoin with NO Exchange on either side — the join runs
map-side. The bucket count is a write-time choice: pick so one bucket
of the bigger table fits an executor (e.g. 100 TB / 4096 buckets ≈
25 GB; with 128 buckets per this local rig the same layout holds).

Trade-off: bucketed writes shuffle once at write time and lock the
bucket count; worth it for keys joined repeatedly (the reference
re-joins on tconst five times per run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_within: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a catalog table bucketed (and optionally sorted)
    by the join key. Sorting within buckets lets SortMergeJoin skip
    its sort as well — the join degenerates to a streamed merge."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_within:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket counts the plan has no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
