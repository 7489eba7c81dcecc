"""Data-quality queries (SURVEY.md §2.9) bound to oracles.

The exact-distinct profile is fully SQL-verifiable. The approx variant
(HLL++, the reference's actual choice at glue.py:105-106) is ALSO
oracled as of round 10: the profiled distinct columns are all
tiny-cardinality categoricals where the HLL++ estimate is exactly the
true count (see dq_profile_union_approx's docstring); the
high-cardinality tolerance contract stays in dq_approx_distinct_check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.quality.profile import dq_profile, dq_union
from aws_imdb_data_pipeline_spark.sources.tables import load_table

_ORDERS_PROFILE_ORACLE = """
SELECT 'orders' AS dataset,
       COUNT(*) AS row_count,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_custkey,
       CAST(SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus = '\\N'
                      OR length(trim(o_orderstatus)) = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderstatus,
       MIN(o_totalprice) AS min_o_totalprice,
       MAX(o_totalprice) AS max_o_totalprice,
       COUNT(DISTINCT o_orderpriority) AS distinct_o_orderpriority
FROM orders
"""


@register("dq_profile_orders", oracle=_ORDERS_PROFILE_ORACLE, operators=("Q1", "A6", "A7", "A9"))
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass DQ snapshot of orders (glue.py:67-114) with exact
    distinct counts so it hash-matches the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    return dq_profile(
        orders,
        dataset="orders",
        null_cols=["o_custkey", "o_orderstatus"],
        numeric_cols=["o_totalprice"],
        distinct_cols=["o_orderpriority"],
        exact_distinct=True,
    )


@register(
    "dq_profile_union_approx",
    oracle="""
    SELECT 'orders' AS dataset, COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_o_custkey,
           MIN(o_totalprice) AS min_o_totalprice,
           MAX(o_totalprice) AS max_o_totalprice,
           COUNT(DISTINCT o_orderpriority) AS distinct_o_orderpriority,
           COUNT(DISTINCT o_orderstatus) AS distinct_o_orderstatus
    FROM orders
    UNION ALL BY NAME
    SELECT 'lineitem' AS dataset, COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_l_orderkey,
           MIN(l_quantity) AS min_l_quantity,
           MAX(l_quantity) AS max_l_quantity,
           MIN(l_extendedprice) AS min_l_extendedprice,
           MAX(l_extendedprice) AS max_l_extendedprice,
           COUNT(DISTINCT l_returnflag) AS distinct_l_returnflag
    FROM lineitem
    UNION ALL BY NAME
    SELECT 'customer' AS dataset, COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN c_name IS NULL OR c_name = '\\N'
                          OR length(trim(c_name)) = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS null_c_name,
           MIN(c_acctbal) AS min_c_acctbal,
           MAX(c_acctbal) AS max_c_acctbal,
           COUNT(DISTINCT c_mktsegment) AS distinct_c_mktsegment
    FROM customer
    """,
    operators=("Q1", "Q2", "A8", "U1"),
)
def dq_profile_union_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-faithful variant: approx_count_distinct (HLL++)
    profiles for three datasets unioned by name (glue.py:320-355).

    ORACLED as of round 10 (retiring a permanent rows-only row) with
    EXACT distinct counts, which is sound here without changing the
    engine computation at all: every profiled distinct column is a
    tiny-cardinality categorical (order priority 5, order status 3,
    return flag 3, market segment 5) where HLL++'s estimator is exact —
    at n distinct values over m = 2^9 registers, linear counting
    returns m*ln(m/(m-n)) which rounds to n for n << m, and the fixed
    corpus + fixed hash make it deterministic. That is also the
    realistic regime: DQ profiles approx-count CATEGORICAL columns; the
    high-cardinality tolerance contract (where the estimate genuinely
    deviates) stays pinned by dq_approx_distinct_check's 5% band. If a
    profile column ever gains enough cardinality to leave the exact
    regime, this query's hash row fails loudly — the signal that the
    oracle, not the engine, must move to the tolerance form."""
    profiles = [
        dq_profile(
            load_table(spark, sf_dir, "orders"),
            dataset="orders",
            null_cols=["o_custkey"],
            numeric_cols=["o_totalprice"],
            distinct_cols=["o_orderpriority", "o_orderstatus"],
        ),
        dq_profile(
            load_table(spark, sf_dir, "lineitem"),
            dataset="lineitem",
            null_cols=["l_orderkey"],
            numeric_cols=["l_quantity", "l_extendedprice"],
            distinct_cols=["l_returnflag"],
        ),
        dq_profile(
            load_table(spark, sf_dir, "customer"),
            dataset="customer",
            null_cols=["c_name"],
            numeric_cols=["c_acctbal"],
            distinct_cols=["c_mktsegment"],
        ),
    ]
    return dq_union(profiles)


@register(
    "incremental_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS distinct_custkeys,
           TRUE AS within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("A8", "A4", "EXT-sketch"),
)
def incremental_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch incremental distinct (operators/sketches.py):
    one HLL sketch per order priority, merged and estimated WITHOUT
    rescanning the fact — the pattern that answers cross-partition
    distinct questions at 100 TB from a KB-sized side table. The query
    emits the exact distinct (oracled) alongside the sketch's accuracy
    band: the oracle pins within_5pct = TRUE, so a sketch regression
    (estimate drifting > 5% from truth) fails the correctness gate,
    while the hash compare never sees the engine-specific estimate
    itself (Spark DataSketches vs DuckDB HLL differ)."""
    from aws_imdb_data_pipeline_spark.operators.sketches import (
        merge_sketches,
        partition_sketches,
    )

    orders = load_table(spark, sf_dir, "orders")
    est = merge_sketches(
        partition_sketches(orders, ["o_orderpriority"], "o_custkey"),
        ["o_orderpriority"],
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("distinct_custkeys")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_rows",
        "distinct_custkeys",
        (
            F.abs(F.col("distinct_estimate") - F.col("distinct_custkeys"))
            / F.col("distinct_custkeys")
            <= 0.05
        ).alias("within_5pct"),
    )


_CMS_ROWS_SQL = """(VALUES (0, 48271, 12345), (1, 69621, 54321),
                           (2, 16807, 7919), (3, 40692, 104729))
                   AS hrow(d, a, c)"""

_CMS_H_SQL = f"""
    h AS (
        SELECT e.user_id, hrow.d AS depth,
               (((((hrow.a * e.user_id + hrow.c) % 1000000007)
                  * ((hrow.a * e.user_id + hrow.c) % 1000000007))
                 % 1000000007)
                * ((hrow.a * e.user_id + hrow.c) % 1000000007))
               % 1000000007 % 64 AS bucket
        FROM events e, {_CMS_ROWS_SQL}
    )
"""


@register(
    "cms_user_event_sketch",
    oracle=f"""
    WITH {_CMS_H_SQL}
    SELECT depth, bucket, COUNT(*) AS count
    FROM h GROUP BY depth, bucket
    """,
    operators=("EXT-sketch", "A1"),
)
def cms_user_event_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of per-user event frequencies as a
    depth×width=4×64-row MERGEABLE table (operators.sketches.cms_build)
    — the frequency analogue of the HLL pattern: persist one sketch
    per slice, sum them later, estimate any key's count without the
    raw data. Hashing is the engine-portable affine-then-cube map, so
    the ORACLE rebuilds the identical sketch (vs xxhash-based sketches,
    which are rows-only by necessity)."""
    from aws_imdb_data_pipeline_spark.operators.sketches import cms_build

    ev = load_table(spark, sf_dir, "events")
    return cms_build(ev, "user_id", depth=4, width=64)


@register(
    "cms_user_event_estimates",
    oracle=f"""
    WITH {_CMS_H_SQL},
    sketch AS (
        SELECT depth, bucket, COUNT(*) AS c FROM h GROUP BY depth, bucket
    ),
    truec AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
    probes AS (SELECT DISTINCT user_id, depth, bucket FROM h),
    est AS (
        SELECT p.user_id, MIN(s.c) AS estimate
        FROM probes p JOIN sketch s
          ON s.depth = p.depth AND s.bucket = p.bucket
        GROUP BY p.user_id
    )
    SELECT t.user_id, e.estimate, t.c AS true_count,
           e.estimate - t.c AS overestimate
    FROM est e JOIN truec t ON t.user_id = e.user_id
    """,
    operators=("EXT-sketch", "A1", "J1"),
)
def cms_user_event_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates vs ground truth for every user: estimate =
    min over the 4 hash rows of the bucket count (broadcast lookup
    joins against the 256-row sketch), overestimate >= 0 always —
    the defining CMS guarantee, verified row-for-row by the oracle."""
    from aws_imdb_data_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id", depth=4, width=64)
    users = ev.select("user_id").distinct()
    est = cms_estimate(sketch, users, "user_id", depth=4, width=64)
    true_c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return est.join(true_c, "user_id").select(
        "user_id",
        "estimate",
        "true_count",
        (F.col("estimate") - F.col("true_count")).alias("overestimate"),
    )


@register(
    "bitmap_distinct_users_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           COUNT(DISTINCT user_id) AS distinct_exact,
           COUNT(user_id) AS n_rows
    FROM events
    GROUP BY 1
    """,
    operators=("EXT-sketch", "A4", "A1"),
)
def bitmap_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct via bitmap partials
    (operators/sketches.py:bitmap_partials): partial bitmaps are built
    at (day, event_type) grain — the slices an ingest job would write
    one at a time — then OR-merged up to day WITHOUT rescanning the
    fact, and the popcount is the exact per-day distinct user count.
    The exact complement of incremental_distinct_customers' HLL
    estimate, for bounded-integer key domains where the rollup must
    reconcile exactly; the oracle pins every value, not a tolerance
    band. Two tiny shuffles over KB-sized bitmap pages after the one
    partial-build shuffle."""
    from aws_imdb_data_pipeline_spark.operators.sketches import (
        bitmap_distinct,
        bitmap_partials,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    partials = bitmap_partials(ev, ["day", "event_type"], "user_id")
    return bitmap_distinct(partials, ["day"])


@register(
    "bitmap_distinct_windows",
    oracle="""
    SELECT 'all' AS win,
           COUNT(DISTINCT user_id) AS distinct_exact,
           COUNT(user_id) AS n_rows
    FROM events
    UNION ALL
    SELECT 'first_half' AS win,
           COUNT(DISTINCT user_id) AS distinct_exact,
           COUNT(user_id) AS n_rows
    FROM events
    WHERE date_trunc('day', ts) < TIMESTAMP '2024-01-16'
    """,
    operators=("EXT-sketch", "A4", "U1"),
)
def bitmap_distinct_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Artifact-reuse story for the bitmap partials: ONE per-day
    partial table answers BOTH a global and a date-windowed distinct
    exactly, by filtering the KB-sized partials on their day key and
    re-merging. In production the partial table is written as a
    parquet side artifact (the HLL pattern above), so every later
    "distinct users over window W" is a millisecond OR over a few
    pages; here the frame is recomputed per leg rather than pinned —
    see SCALE §44 for why queries avoid leaving persists behind.
    Window predicate is on the partial's own grain (whole days), so
    the filter is exact."""
    from aws_imdb_data_pipeline_spark.operators.sketches import (
        bitmap_distinct,
        bitmap_partials,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    partials = bitmap_partials(ev, ["day"], "user_id")
    cut = F.lit("2024-01-16").cast("timestamp")
    out = (
        bitmap_distinct(partials, []).select(F.lit("all").alias("win"), "*")
    ).unionByName(
        bitmap_distinct(partials.filter(F.col("day") < cut), []).select(
            F.lit("first_half").alias("win"), "*"
        )
    )
    return out
