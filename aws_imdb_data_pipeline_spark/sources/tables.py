"""Parquet table access for the engine's lake directory.

A "scale-factor directory" holds one parquet file/dir per table
(see /root/repo/TESTDATA.md). At 100 TB these would be partitioned
datasets; ``spark.read.parquet`` handles both shapes identically and
Catalyst prunes partitions/columns from the declarative plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Timestamp columns whose parquet physical type has varied across
# testdata generations: TIMESTAMP(NANOS) (surfaced as long under
# nanosAsLong) or naive TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ).
# Both normalize to a session-UTC TimestampType so every downstream
# operator sees one type regardless of which generation wrote the file.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table. Column pruning + predicate
    pushdown happen automatically downstream (verify with
    ``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``)."""
    if name in _NANOS_TS_COLS:
        # Runtime-settable; required even when the session wasn't built
        # by our factory (e.g. the correctness driver's bare session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # date_trunc/window operate in session-local time; pin UTC so
        # window starts are host-timezone-independent (matches how SQL
        # engines treat these naive parquet timestamps).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col not in df.columns:
            continue
        dtype = df.schema[col].dataType
        if isinstance(dtype, LongType):
            # integer div keeps full int64 precision (double would not)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif isinstance(dtype, TimestampNTZType):
            # naive micros: same wall time, session tz already pinned UTC
            df = df.withColumn(col, F.to_timestamp(F.col(col)))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` text queries
    (the reference's SQL dialect surface) run against the same data."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
