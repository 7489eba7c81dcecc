"""The reference's Power BI measure layer (README.md:146-161) as
oracled queries over the testdata corpus.

The real measures run over EPISODE_FACTS (pipelines/measures.py —
tested against the IMDb fixtures, the driver corpus has no episode
table), so each query here maps the same relational shape onto
orders/customer: customer = series, order year = season, order =
episode, ``o_orderstatus = 'F'`` = "has a rating", o_totalprice = the
rated value. The fallback chains run through the same
``preferential_pick`` operator the IMDb measures use, so the driver's
DuckDB oracle verifies the measure semantics end-to-end:

- Dim Series (unique key + "Title (Year)" label)  → dim_series_labels
- Series – Pilot ★ (4-tier fallback → 0)          → series_pilot_measure
- Series – Best Season ★ (max season agg → 0)     → series_best_season_measure
- Finale Δ vs Avg (finale − avg, COALESCE'd)      → series_finale_delta_measure

Float policy: picked values are raw input doubles (identical in both
engines); season revenue is round(SUM, 2) (inputs have 2 decimals);
the series average is round(SUM, 2) / COUNT — identical operands give
bitwise-identical quotients, so it is emitted raw, never re-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.fallback import (
    preferential_pick,
    preferential_pick_predicates,
)
from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import load_table


def _order_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders as an episode grain: (series_key, season, episode_number)
    with the first season precomputed — one narrow projection, one
    window per (customer, year) partition. Consumers pick tiers with
    preferential_pick_predicates, so this subtree is derived ONCE per
    query — no union fan-out, and no persist() pin left behind to
    pollute the suite's block-manager between bench queries (the
    round-8 per-query regression suspect)."""
    orders = load_table(spark, sf_dir, "orders")
    eps = orders.select(
        F.col("o_custkey").alias("series_key"),
        F.year("o_orderdate").alias("season"),
        "o_orderdate",
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
    )
    w_ep = Window.partitionBy("series_key", "season").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_first = Window.partitionBy("series_key")
    return eps.withColumn(
        "episode_number", F.row_number().over(w_ep)
    ).withColumn("first_season", F.min("season").over(w_first))


_EPS_CTE = """
    WITH eps AS (
        SELECT o_custkey AS series_key,
               EXTRACT(year FROM o_orderdate) AS season,
               o_orderdate, o_orderkey, o_orderstatus, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey, EXTRACT(year FROM o_orderdate)
                   ORDER BY o_orderdate, o_orderkey) AS episode_number,
               MIN(EXTRACT(year FROM o_orderdate))
                   OVER (PARTITION BY o_custkey) AS first_season
        FROM orders
    )
"""


@register(
    "dim_series_labels",
    oracle="""
    SELECT c.c_custkey AS series_key,
           c.c_name    AS series_title,
           MIN(EXTRACT(year FROM o.o_orderdate)) AS series_start,
           concat(c.c_name, ' (',
                  COALESCE(CAST(MIN(EXTRACT(year FROM o.o_orderdate)) AS VARCHAR),
                           'n/a'), ')') AS series_label
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    operators=("A2", "J1", "F5"),
)
def dim_series_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim Series shape (README.md:146-148): one row per entity key with
    a '"Title (Year)"' slicer label; entities with no facts keep a row
    ('n/a' year) — the 1→* dim side of the model."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    start = orders.groupBy(F.col("o_custkey").alias("series_key")).agg(
        F.min(F.year("o_orderdate")).cast("long").alias("series_start")
    )
    return (
        customer.select(
            F.col("c_custkey").alias("series_key"),
            F.col("c_name").alias("series_title"),
        )
        .join(start, "series_key", "left")
        .select(
            "series_key",
            "series_title",
            "series_start",
            F.concat(
                F.col("series_title"),
                F.lit(" ("),
                F.coalesce(F.col("series_start").cast("string"), F.lit("n/a")),
                F.lit(")"),
            ).alias("series_label"),
        )
    )


@register(
    "series_pilot_measure",
    oracle=_EPS_CTE
    + """,
    tiers AS (
        SELECT series_key, o_totalprice, o_orderdate, o_orderkey, 0 AS pref
        FROM eps WHERE season = first_season AND episode_number = 1
                   AND o_orderstatus = 'F'
        UNION ALL
        SELECT series_key, o_totalprice, o_orderdate, o_orderkey, 1
        FROM eps WHERE season = first_season AND o_orderstatus = 'F'
        UNION ALL
        SELECT series_key, o_totalprice, o_orderdate, o_orderkey, 2
        FROM eps WHERE season = first_season AND episode_number = 1
        UNION ALL
        SELECT series_key, o_totalprice, o_orderdate, o_orderkey, 3 FROM eps
    ),
    best AS (
        SELECT series_key, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY series_key
                                  ORDER BY pref, o_orderdate, o_orderkey) AS rn
        FROM tiers
    )
    SELECT c.c_custkey AS series_key,
           COALESCE(b.o_totalprice, 0.0) AS pilot_rating
    FROM customer c
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.series_key = c.c_custkey
    """,
    operators=("U1", "W2", "J1"),
)
def series_pilot_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series – Pilot ★ shape (README.md:156): 4-tier preferential pick
    — first-season-first-episode 'rated' → any first-season rated →
    first-season-first-episode → any episode → 0. Tiers are PREDICATES
    over one episode frame (preferential_pick_predicates): a
    first-match-wins CASE tags each row with its best tier, so the
    whole pick is one scan + one window shuffle — no 4-way union, no
    persist pin."""
    eps = _order_episodes(spark, sf_dir)
    is_first = F.col("season") == F.col("first_season")
    is_ep1 = F.col("episode_number") == 1
    rated = F.col("o_orderstatus") == "F"
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("series_key")
    )
    picked = preferential_pick_predicates(
        eps,
        preds=[
            is_first & is_ep1 & rated,
            is_first & rated,
            is_first & is_ep1,
            F.lit(True),
        ],
        key_cols=["series_key"],
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
        value_cols=["o_totalprice"],
        keys=customer,
        defaults={"o_totalprice": 0.0},
    )
    return picked.select(
        "series_key", F.col("o_totalprice").alias("pilot_rating")
    )


@register(
    "series_best_season_measure",
    oracle="""
    WITH yearly AS (
        SELECT o_custkey AS series_key,
               EXTRACT(year FROM o_orderdate) AS season,
               ROUND(SUM(o_totalprice), 2) AS season_revenue
        FROM orders
        GROUP BY 1, 2
    ),
    best AS (
        SELECT series_key, season, season_revenue,
               ROW_NUMBER() OVER (PARTITION BY series_key
                                  ORDER BY season_revenue DESC, season) AS rn
        FROM yearly
    )
    SELECT c.c_custkey AS series_key,
           b.season AS best_season,
           COALESCE(b.season_revenue, 0.0) AS best_season_revenue
    FROM customer c
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.series_key = c.c_custkey
    """,
    operators=("A2", "W2", "O3"),
)
def series_best_season_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series – Best Season ★ shape (README.md:158): max season
    aggregate per entity (tie → earliest season), 0 for entities with
    no seasons. Partial-agg shuffle on (key, season), then the pick is
    a window over the already-aggregated (small) set."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.col("o_custkey").alias("series_key"),
        F.year("o_orderdate").cast("long").alias("season"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("season_revenue"))
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("series_key")
    )
    picked = preferential_pick(
        [yearly],
        key_cols=["series_key"],
        order_by=[F.desc("season_revenue"), F.col("season")],
        value_cols=["season", "season_revenue"],
        keys=customer,
        defaults={"season_revenue": 0.0},
    )
    return picked.select(
        "series_key",
        F.col("season").alias("best_season"),
        F.col("season_revenue").alias("best_season_revenue"),
    )


@register(
    "series_finale_delta_measure",
    oracle=_EPS_CTE
    + """,
    tiers AS (
        SELECT series_key, o_totalprice, o_orderdate, o_orderkey, 0 AS pref
        FROM eps WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT series_key, o_totalprice, o_orderdate, o_orderkey, 1 FROM eps
    ),
    best AS (
        SELECT series_key, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY series_key
                                  ORDER BY pref, o_orderdate DESC,
                                           o_orderkey DESC) AS rn
        FROM tiers
    ),
    avgs AS (
        SELECT o_custkey AS series_key,
               ROUND(SUM(o_totalprice), 2) / COUNT(*) AS series_avg
        FROM orders GROUP BY 1
    )
    SELECT c.c_custkey AS series_key,
           COALESCE(b.o_totalprice, 0.0) AS finale_rating,
           COALESCE(a.series_avg, 0.0)   AS series_avg,
           COALESCE(b.o_totalprice, 0.0) - COALESCE(a.series_avg, 0.0)
               AS finale_delta
    FROM customer c
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.series_key = c.c_custkey
    LEFT JOIN avgs a ON a.series_key = c.c_custkey
    """,
    operators=("U1", "W2", "A2", "J1"),
)
def series_finale_delta_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finale Δ vs Avg shape (README.md:157,159): latest 'rated'
    episode (fallback: latest any) minus the entity average, both
    COALESCE'd to 0. The average is round(SUM,2)/COUNT so both engines
    divide identical operands (bitwise-identical quotient, emitted
    raw)."""
    eps = _order_episodes(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("series_key")
    )
    picked = preferential_pick_predicates(
        eps,
        preds=[F.col("o_orderstatus") == "F", F.lit(True)],
        key_cols=["series_key"],
        order_by=[F.desc("o_orderdate"), F.desc("o_orderkey")],
        value_cols=["o_totalprice"],
        keys=customer,
        defaults={"o_totalprice": 0.0},
    )
    orders = load_table(spark, sf_dir, "orders")
    avgs = orders.groupBy(F.col("o_custkey").alias("series_key")).agg(
        (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("series_avg")
    )
    return (
        picked.join(avgs, "series_key", "left")
        .select(
            "series_key",
            F.col("o_totalprice").alias("finale_rating"),
            F.coalesce("series_avg", F.lit(0.0)).alias("series_avg"),
            (
                F.col("o_totalprice") - F.coalesce("series_avg", F.lit(0.0))
            ).alias("finale_delta"),
        )
    )
