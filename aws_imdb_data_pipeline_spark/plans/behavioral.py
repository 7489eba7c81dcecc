"""Behavioral event analytics: funnels and retention cohorts — the
product-analytics queries an events table exists for. Both reduce to
grouped min-timestamps + conditional aggregation (single shuffle on
user_id), fully oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import load_table, maybe_broadcast


@register(
    "user_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
    FROM per_user
    """,
    operators=("A6", "A1", "EXT-behavioral"),
)
def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered funnel: first-occurrence
    timestamps per stage per user (one conditional-min aggregate),
    then ordered-stage counts. One shuffle on user_id; NULL-safe
    comparisons (a missing stage never counts)."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(viewed, 1).otherwise(0)).cast("long").alias("viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("long").alias("clicked_after_view"),
        F.sum(F.when(purchased, 1).otherwise(0))
        .cast("long")
        .alias("purchased_after_click"),
    )


@register(
    "daily_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(day_offset AS INTEGER) AS day_offset,
           COUNT(*) AS active_users
    FROM activity
    WHERE day_offset IN (0, 1, 7)
    GROUP BY cohort_day, day_offset
    """,
    operators=("A1", "J1", "EXT-behavioral"),
)
def daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    day 0 / 1 / 7 offsets. The first-seen aggregate is small (one row
    per user) → broadcast back onto the event scan.

    Gate note (r13 ADVICE): in path mode the gate's facts cannot see
    that this user-grain aggregate is far smaller than the events
    table it derives from — the base-table footprint is the bound and
    the plan-size estimate has no NDV to shrink the aggregate's row
    count, so above budget the hint is (intentionally, conservatively)
    surrendered to AQE's runtime statistics. In catalog mode with
    ANALYZE ... FOR COLUMNS user_id, the CBO's NDV-based aggregate
    estimate restores the hint exactly where it is genuinely small."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(maybe_broadcast(first_seen, sf_dir, "events"), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").isin(0, 1, 7))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "asof_view_before_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, v.view_value AS last_view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    operators=("J-asof", "EXT-behavioral"),
)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: each purchase annotated with the most recent prior
    view's value for that user — the merge-scan composition
    (operators.temporal.asof_join: one shuffle+sort, linear), verified
    against DuckDB's native ASOF JOIN."""
    from aws_imdb_data_pipeline_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_value_cols=["view_value"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("view_value").alias("last_view_value")
    )


@register(
    "click_purchase_interval_pairs",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_seconds
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
    """,
    operators=("J-range", "EXT-behavioral"),
)
def click_purchase_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE/interval join: (click, purchase) pairs for the same user
    within one hour — bucketed equi-join composition
    (operators.temporal.interval_join), verified against DuckDB's
    inequality join."""
    from aws_imdb_data_pipeline_spark.operators.temporal import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    pairs = interval_join(
        purchases, clicks, on=["user_id"], left_ts="p_ts", right_ts="c_ts",
        max_gap_seconds=3600, direction="forward",
    )
    return pairs.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.floor(
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / 1_000_000
        ).alias("gap_seconds"),
    )


@register(
    "session_conversion",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 5 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_no,
               CAST(MIN(ts) AS DATE) AS session_day,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM numbered GROUP BY user_id, session_no
    )
    SELECT CAST(session_day AS VARCHAR) AS session_day,
           COUNT(*) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS converted_sessions,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM sessions
    GROUP BY session_day
    """,
    operators=("STR-session", "A6", "EXT-behavioral"),
)
def session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session conversion: gap-based sessions (session_window)
    with an in-session purchase flag, rolled up to daily conversion
    rates. Two shuffles total (sessionize on user, rollup on day);
    the rate is an int-ratio raw quotient (cross-engine stable)."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), F.col("user_id")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    return (
        sessions.groupBy(
            F.date_format(F.col("w.start").cast("date"), "yyyy-MM-dd").alias(
                "session_day"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").cast("long").alias("converted_sessions"),
            (F.sum("converted") / F.count(F.lit(1))).alias("conversion_rate"),
        )
    )
