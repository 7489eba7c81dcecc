"""Fourth relational batch: order statistics (exact percentiles),
statistical aggregates (stddev/corr), and pivot — OLAP surface beyond
the reference's inventory that a complete engine provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import load_table


@register(
    "price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5)  AS p50,
           quantile_cont(o_totalprice, 0.9)  AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("A-percentile",),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT continuous percentiles per group (F.percentile ==
    quantile_cont: same linear interpolation on identical sorted
    values → bitwise-identical output, no rounding needed).

    Scale note: exact percentile sorts within groups; for 100 TB use
    approx_percentile (t-digest) — provided as the rows-only variant
    ``price_percentiles_approx``.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


@register(
    "price_percentiles_approx",
    oracle="""
    SELECT o_orderpriority,
           TRUE AS p50_in_band,
           TRUE AS p90_in_band
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("A-percentile", "A8"),
)
def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based scale path (bounded memory,
    one pass, mergeable across partitions).

    Sketch outputs can never hash-match a foreign engine, so the oracle
    checks the ACCURACY CONTRACT instead: with accuracy=10000 the rank
    error is <= N/10000, far inside a +/-0.02 rank band, so each approx
    percentile must land between the exact quantiles 0.02 on either
    side. The query emits those band checks as booleans; the oracle is
    the constant-TRUE frame. A sketch regression (or a broken
    percentile) flips a boolean and fails the hash compare."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000))
        .between(
            F.percentile("o_totalprice", F.lit(0.48)),
            F.percentile("o_totalprice", F.lit(0.52)),
        )
        .alias("p50_in_band"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000))
        .between(
            F.percentile("o_totalprice", F.lit(0.88)),
            F.percentile("o_totalprice", F.lit(0.92)),
        )
        .alias("p90_in_band"),
    )


@register(
    "lineitem_price_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    operators=("A-stats",),
)
def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / correlation / covariance per group. These are
    quotient-shaped with non-identical operands across engines, so a
    decimal tie is theoretically possible but the values are
    effectively irrational — round-4 is stable in practice (same
    policy as cosine scores)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
    )


@register(
    "orders_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("A-pivot",),
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an EXPLICIT value list — one pass, no
    second job to discover pivot values (critical at scale: implicit
    pivot triggers a distinct scan first)."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    renames = {s: f"status_{s}" for s in ("F", "O", "P")}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot leaves NULL for empty cells; the CASE oracle produces 0
    return out.fillna(0, subset=list(renames.values()))


@register(
    "events_range_window",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
               AS sum_last_hour,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_last_hour
    FROM events
    """,
    operators=("W4", "STR-window"),
)
def events_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE frame: per-user trailing-hour running sum/count —
    ordered by epoch seconds with rangeBetween (ROWS frames count
    rows; RANGE frames cover a value interval, the time-series shape).

    The oracle floors epoch(ts) to WHOLE seconds to mirror Spark's
    unix_timestamp truncation: DuckDB's raw epoch() keeps fractional
    seconds, so an event exactly 3600.x s older sat inside Spark's
    frame but outside DuckDB's — invisible at sf0.01 (no boundary
    collision in the sample), a real row diff at sf0.1 (found by the
    round-10 full-parity sweep at every sf)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@register(
    "salted_revenue_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE)
               AS sum_l_extendedprice,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    operators=("A1", "SKEW-salt"),
)
def salted_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators.salted_aggregate): the
    salt spreads a hot key over 16 reducers in phase 1, phase 2 merges
    partials — results provably equal the plain GROUP BY (this oracle).
    l_returnflag has 3 values over 600k rows: exactly the
    low-cardinality-hot-key shape that needs salting at 100 TB.

    The price is summed as DECIMAL(18,2) on both sides (money
    semantics): a double sum over 600k values drifts with summation
    order — salted two-phase vs DuckDB's single pass differed by 2e-4
    at sf0.1, past any fixed ROUND precision — while the decimal sum
    is exact and order-independent at every scale. Cast back to double
    for a stable cross-engine pandas dtype."""
    from aws_imdb_data_pipeline_spark.operators.agg_patterns import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_extendedprice", F.col("l_extendedprice").cast("decimal(18,2)")
    )
    out = salted_aggregate(li, ["l_returnflag"], ["l_extendedprice"], 16)
    return out.select(
        "l_returnflag",
        F.col("sum_l_extendedprice").cast("double").alias(
            "sum_l_extendedprice"
        ),
        "n_rows",
    )
