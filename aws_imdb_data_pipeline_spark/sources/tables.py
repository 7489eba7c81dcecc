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


# ---------------------------------------------------------------------------
# Size-gated broadcast for SF-SCALED dimensions (r12 verdict #1).
#
# nation/region are bounded forever (25/5 rows) — hint them
# unconditionally. customer/supplier/part GROW with scale factor: at a
# 100 TB design point part is billions of rows, and a hard-coded
# F.broadcast is a guaranteed executor OOM plus an N-fold network ship
# of the build side. The sf100 decade sweep measured exactly that cost
# curve (SCALE §53: 11.8-14.2x per decade on the three broadcast-hint
# headline queries vs 6-7x scan-bound). The gate mirrors the
# reference's own framing (SURVEY §2.3/§4.3: dimension sides are
# broadcast CANDIDATES; at scale leave the decision to the engine) and
# this engine's bm25 plan-time candidate gate: decide from a fact the
# planner can know for free — the dimension's on-disk footprint, one
# os.stat, no Spark job.
#
# Threshold: 32 MB of parquet (~3-5x that decompressed in the
# broadcast hash relation, comfortably inside a 4 GB executor). On the
# shipped lakes every gated dimension is far under it, so bench plans
# are unchanged; on the generated decades the gate flips customer
# (233 MB) and part (154 MB) to AQE at sf100 while supplier (16 MB)
# keeps the hint. Override with $SPARK_GRAFT_BROADCAST_BYTES for A/B.
# ---------------------------------------------------------------------------
DEFAULT_DIM_BROADCAST_BYTES = 32 << 20


def _broadcast_bytes_budget() -> int:
    try:
        return int(os.environ["SPARK_GRAFT_BROADCAST_BYTES"])
    except (KeyError, ValueError):
        return DEFAULT_DIM_BROADCAST_BYTES


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of one table (file or partitioned dir), stat only."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return os.stat(path).st_size
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.stat(os.path.join(root, f)).st_size
            except OSError:
                pass
    return total


def maybe_broadcast(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """``df`` (the named base table or any projection/filter/aggregate
    of it at up-to-table grain — those only shrink, so the base
    table's footprint is a sound upper bound) with a broadcast hint
    only when the table fits the broadcast budget; above it, the join
    strategy is left to AQE's runtime statistics."""
    if table_bytes(sf_dir, name) <= _broadcast_bytes_budget():
        return F.broadcast(df)
    return df
