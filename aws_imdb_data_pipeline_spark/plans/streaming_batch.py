"""Batch-mode runs of the streaming operators (unified API): the same
functions power Structured Streaming jobs (tests/test_streaming.py
drives them through readStream); here they run as batch queries so the
driver's DuckDB oracle can verify the window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import load_table
from aws_imdb_data_pipeline_spark.streaming.events import (
    sessionize,
    sliding_value_stats,
    tumbling_counts,
)


@register(
    "events_hourly_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    operators=("STR-window", "A1"),
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window — identical code path runs
    under readStream with a watermark (see streaming tests)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


@register(
    "events_sliding_stats",
    oracle="""
    WITH w AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
               event_type, value
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           ROUND(SUM(value), 4) / COUNT(value) AS avg_value,
           COUNT(*) AS n_events
    FROM w
    GROUP BY 1, 2, 3
    """,
    operators=("STR-sliding", "A1"),
)
def events_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows — every event lands in exactly two
    windows; the oracle materializes both via the two slide-aligned
    starts (time_bucket and its predecessor)."""
    return sliding_value_stats(
        load_table(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


@register(
    "events_user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 5 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    operators=("STR-session", "W4"),
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (session_window, Spark >= 3.2) per
    user. The oracle re-derives sessions with the lag/cumsum islands
    trick — new session when the gap >= 5 minutes, matching
    session_window's strict-merge semantics."""
    return sessionize(load_table(spark, sf_dir, "events"), gap="5 minutes")
