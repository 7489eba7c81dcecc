"""Staged warehouse load (S8, S9, L2).

The reference loads its warehouse from an external parquet stage:
``SELECT $1:"field"::type ... FROM @stage/run_date=.../`` with
TRY_TO_NUMBER / NULLIF tolerant casts, guarded by a per-run_date
DELETE then INSERT (batch.py:211-299). Spark-native equivalent:

    read the staged slice → typed tolerant projection → dynamic
    partition overwrite into the lake table → catalog refresh.

One function, one shuffle (the pre-write compaction), idempotent by
construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.lifecycle.catalog import (
    refresh_table,
    register_lake_table,
)
from aws_imdb_data_pipeline_spark.sources.lake import replace_run_partition


def typed_projection(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Tolerant typed projection: try_cast each listed column
    (malformed → NULL, the TRY_TO_NUMBER semantics, batch.py:228-239);
    unlisted columns pass through unchanged."""
    return df.select(
        *[
            F.col(c).try_cast(t).alias(c) if t is not None else F.col(c)
            for c, t in ((c, casts.get(c)) for c in df.columns)
        ]
    )


def staged_load(
    spark: SparkSession,
    stage_root: str,
    run_date: str,
    lake_path: str,
    casts: dict[str, str] | None = None,
    table_name: str | None = None,
) -> DataFrame:
    """Load one run_date slice from a staged parquet layout into the
    warehouse lake table, idempotently.

    Reads ``{stage_root}/run_date={run_date}`` (partition-pruned scan —
    only that slice's files are listed), applies the tolerant typed
    projection, stamps the run_date back on, and replaces exactly that
    partition in ``lake_path``. With ``table_name``, (re)registers the
    catalog entry and refreshes partitions — the crawler step
    (batch.py:42-61) reduced to metadata calls.
    """
    slice_path = os.path.join(stage_root, f"run_date={run_date}")
    df = spark.read.parquet(slice_path)
    if casts:
        df = typed_projection(df, casts)
    df = df.withColumn("run_date", F.lit(run_date))
    replace_run_partition(df, lake_path, ["run_date"])
    if table_name is not None:
        out = register_lake_table(spark, table_name, lake_path)
        refresh_table(spark, table_name)
        return out
    return spark.read.parquet(lake_path)
