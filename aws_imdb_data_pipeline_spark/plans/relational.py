"""Relational operator queries (SURVEY.md §2.2-§2.8) over the test lake.

Each query re-expresses a reference operator pattern on the TPC-H-ish
test tables, Spark-first: declarative DataFrame plans, broadcast hints
for dimension joins, rounding of floating aggregates to 4 decimals on
BOTH engine and oracle so cross-engine summation order can't flip the
value hash.

Reference citations use ``glue.py`` =
glue_jobs/etl_movies_episodes_analytics_advanced.py and ``batch.py`` =
airflow/dags/imdb_batch_pipeline.py, paths under /root/reference/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.functions.cleaning import banding
from aws_imdb_data_pipeline_spark.operators.agg_patterns import ordered_collect_concat
from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group, top_k_global
from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import (
    load_table,
    maybe_broadcast,
    register_views,
)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def money_sum_cents(expr: F.Column, scale: int) -> F.Column:
    """Portable EXACT money sum, long-fixed-point form: per row,
    ``round(expr * scale)`` recovers the exact integer fixed-point
    value (the double carries the decimal value to within ~1e-10 of
    its true <= 4dp amount, both engines compute the IDENTICAL IEEE
    product, and round() has half-a-unit of slack), the int64 sum is
    exact and order-invariant, and the final ``/ scale`` divides
    identical operands — bitwise-identical doubles in both engines at
    any magnitude. Oracle twin:
    ``SUM(CAST(ROUND(x * scale, 0) AS BIGINT)) / scale.0``.

    Chosen over the decimal accumulator for HOT aggregates: long adds
    A/B'd 0.44 s vs decimal's 0.68 s (double's unsound 0.28 s) on the
    sf0.1 pricing summary — SCALE §47, where the sf10 sweep caught
    both unsound forms: ROUND(SUM(double), 4) drifts with summation
    order, and even an exact decimal sum diverges at the EDGE CAST
    (DuckDB's direct decimal->double double-rounds through int128
    scaling, one ulp off Spark's correctly-rounded cast at ~1e12).
    Bounds: int64 sum overflows at ~9e18/scale — sf>1000 for this
    corpus; the non-headline money queries keep the decimal
    accumulator + VARCHAR-mediated oracle edge cast instead. That
    bound is GUARDED at runtime, not just documented — two layers:
    Spark 4's ANSI mode (on by default, kept on by session.py) already
    errors on an actual cast/sum overflow, and the same aggregation
    pass additionally computes the conservative no-cancellation bound
    ``max(abs(cents)) * count`` (in double — itself overflow-proof)
    and raises a self-describing decimal-fallback message whenever the
    mass COULD exceed int64 — including cancellation-heavy corpora
    ANSI never sees, and on clusters running ansi=false. The sentinel
    costs one extra max/count pair fused into the existing partial
    aggregate (A/B'd: headline pricing_summary unchanged within
    noise) and never fires below the bound, so oracle parity is
    untouched."""
    cents = F.round(expr * F.lit(scale), 0).cast("long")
    bound = F.max(F.abs(cents)).cast("double") * F.count(cents)
    # bound is NULL on an empty or all-NULL group (max of nothing);
    # that case must fall through to SUM (which is NULL there), not to
    # the raise_error branch — a zero-row global aggregate is legal.
    total = F.when(
        (bound < F.lit(9.0e18)) | bound.isNull(), F.sum(cents)
    ).otherwise(
        F.raise_error(
            F.lit(
                "money_sum_cents: per-group |cents| mass may exceed "
                "int64 (max(abs)*count >= 9e18) — the fixed-point sum "
                "would wrap silently; use a DECIMAL accumulator for "
                "this magnitude (SCALE.md §47)"
            )
        )
    )
    return total / F.lit(float(scale))


def stable_avg(col: str) -> F.Column:
    """Cross-engine-stable mean: ROUND(SUM, 4) snaps both engines'
    near-identical sums to the same double (safe because the inputs
    have <= 4 decimals, so the rounding can never land on a tie), then
    divide by the non-null count WITHOUT rounding the quotient —
    identical operands give a bitwise-identical quotient.

    Never round a quotient: when the true ratio has a decimal tie
    (e.g. 7/32 = 0.21875), Spark rounds the double's shortest decimal
    repr (HALF_UP -> up) while DuckDB rounds the binary value (often
    down) — the SAME double rounds differently in the two engines."""
    return F.round(F.sum(col), 4) / F.count(col)


# ---------------------------------------------------------------------------
# Aggregations (A1, A6, A7) — TPC-H Q1-shaped pricing summary
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)      AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
               AS sum_base_price,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
                    AS BIGINT)) / 10000.0 AS sum_disc_price,
           ROUND(SUM(l_quantity), 4) / COUNT(l_quantity) AS avg_qty,
           ROUND(SUM(l_discount), 4) / COUNT(l_discount) AS avg_disc,
           COUNT(*)                       AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    operators=("A1", "A6", "A7"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate in one shuffle (glue.py:300-308 pattern).

    Scale: partial aggregation (map-side combine) means the shuffle
    carries one row per (group x task), not per input row. Money sums
    are exact LONG FIXED-POINT (money_sum_cents — the r11 sf10 sweep
    caught the ROUND(SUM(double), 4) form drifting at ~5e11 totals;
    the cents form A/B'd 0.44 s vs the decimal accumulator's 0.68 s
    at sf0.1, SCALE §47); quantity sums are integer-valued doubles
    (exact below 2^53) and keep the original ROUND form."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        money_sum_cents(F.col("l_extendedprice"), 100).alias(
            "sum_base_price"
        ),
        money_sum_cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            10000,
        ).alias("sum_disc_price"),
        stable_avg("l_quantity").alias("avg_qty"),
        stable_avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Inner join chain + agg + global top-k (J3, A2, O1) — TPC-H Q3-shaped
# ---------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    operators=("J3", "A2", "O1", "P2"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → join chain → agg → top-k (docs/top_movies_by_rating.sql
    shape). Customer side filtered before the join (manual pushdown the
    reference practices, glue.py:122-133), PROJECTED to the join key
    (customer contributes only the segment filter — the broadcast
    relation is keys, not rows, and Catalyst's size estimate of the
    build side sees that, so the gate keeps the hint at decades where
    the base table is over budget: SCALE §55/§60), and broadcast — at
    100 TB the fact-side shuffle is on o_orderkey only once for
    join+agg."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )
    return top_k_global(joined, [F.desc("revenue"), F.col("o_orderkey")], 10)


# ---------------------------------------------------------------------------
# Flagship: join + agg + top-n per group (J1, A1, W2) — the
# marts_top_movies_by_genre.sql pattern transposed to parts/brands.
# ---------------------------------------------------------------------------
@register(
    "top_parts_by_brand_revenue",
    oracle="""
    SELECT p_brand, p_partkey, p_name, revenue
    FROM (
        SELECT p_brand, p_partkey, p_name,
               ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) DESC,
                            p_partkey
               ) AS rn
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey, p_name
    ) WHERE rn <= 3
    """,
    operators=("J1", "A1", "W2", "O2"),
)
def top_parts_by_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by revenue — the reference's top-25-per-
    (genre, decade) window pattern (marts_top_movies_by_genre.sql:3-19).

    part is a dimension → broadcast join, no shuffle on the fact side
    for the join; one shuffle for the groupBy, window runs on the
    (small) aggregated set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )
    return top_n_per_group(
        rev,
        partition_by=["p_brand"],
        order_by=[F.desc("revenue"), F.col("p_partkey")],
        n=3,
    ).select("p_brand", "p_partkey", "p_name", "revenue")


# ---------------------------------------------------------------------------
# Window row_number per key (W1) — cast-cap pattern glue.py:154-155
# ---------------------------------------------------------------------------
@register(
    "top_lines_per_order",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, CAST(rn AS INTEGER) AS qty_rank
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_quantity DESC, l_linenumber
               ) AS rn
        FROM lineitem
    ) WHERE rn <= 2
    """,
    operators=("W1", "O2"),
)
def top_lines_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number capped at 2 per order — the reference caps cast at 3
    per title the same way (glue.py:154-155)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_quantity"), F.col("l_linenumber")
    )
    return (
        li.withColumn("qty_rank", F.row_number().over(w))
        .filter(F.col("qty_rank") <= 2)
    )


# ---------------------------------------------------------------------------
# Unordered partition max (W3) — finale-flag pattern glue.py:255-257
# ---------------------------------------------------------------------------
@register(
    "max_line_flag",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS max_qty_in_order,
           CAST(CASE WHEN l_quantity = MAX(l_quantity) OVER (PARTITION BY l_orderkey)
                THEN 1 ELSE 0 END AS INTEGER) AS is_max_line
    FROM lineitem
    """,
    operators=("W3",),
)
def max_line_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition analytic max with no orderBy (default unbounded
    frame) → 0/1 flag, like the reference's isFinale = max episode per
    (series, season) (glue.py:255-257)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    w = Window.partitionBy("l_orderkey")
    return li.withColumn(
        "max_qty_in_order", F.max("l_quantity").over(w)
    ).withColumn(
        "is_max_line",
        (F.col("l_quantity") == F.col("max_qty_in_order")).cast("int"),
    )


# ---------------------------------------------------------------------------
# Left join + COALESCE fallback (J1, P8)
# ---------------------------------------------------------------------------
@register(
    "orders_enriched",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COALESCE(c_name, 'UNKNOWN')       AS customer_name,
           COALESCE(c_mktsegment, 'UNKNOWN') AS segment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    operators=("J1", "P1", "P8"),
)
def orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join on a broadcast dimension with COALESCE fallback
    (glue.py:136-140 join style; batch.py:259-273 fallback style)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return orders.join(
        maybe_broadcast(cust, sf_dir, "customer"),
        orders.o_custkey == cust.c_custkey,
        "left",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.coalesce("c_name", F.lit("UNKNOWN")).alias("customer_name"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
    )


# ---------------------------------------------------------------------------
# Join on mismatched key names + drop (J2) through a snowflaked dim chain
# ---------------------------------------------------------------------------
@register(
    "customers_per_region",
    oracle="""
    SELECT r_name AS region_name,
           COUNT(*) AS customers,
           (SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0)
               / COUNT(c_acctbal) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    operators=("J2", "A1", "A2"),
)
def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-joins on differently-named keys with dup-key drop
    (glue.py:181-182,216-226 pattern); both dims broadcast, so the
    customer side never shuffles for the joins."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .drop("n_nationkey")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .drop("r_regionkey")
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            # region grain is FIXED (5 groups): balance mass crosses
            # the ~1e10 drift bound at sf100 (money-grain audit r13)
            # — exact cents numerator, raw quotient
            (money_sum_cents(F.col("c_acctbal"), 100) / F.count("c_acctbal"))
            .alias("avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Lateral explode (J4, F1, F2) — genre-explode pattern glue.py:173
# ---------------------------------------------------------------------------
@register(
    "part_name_tokens",
    oracle="""
    SELECT name_token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS name_token FROM part)
    GROUP BY name_token
    """,
    operators=("J4", "F1", "F2", "A3"),
)
def part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode + count — the reference explodes comma-separated
    genres exactly this way (glue.py:173; docs/top_genre.sql:6)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("name_token"))
        .groupBy("name_token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Scalar-aggregate cross join → latest slice (J5, A12, L1)
# ---------------------------------------------------------------------------
@register(
    "latest_day_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    CROSS JOIN (SELECT MAX(o_orderdate) AS latest_date FROM orders)
    WHERE o_orderdate = latest_date
    """,
    operators=("J5", "A12", "L1"),
)
def latest_day_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row max aggregate cross-joined then filtered — the reference's
    latest-run-only view (marts_movie_facts_view.sql:9-16). Catalyst
    broadcasts the 1-row side; on a partitioned lake the same filter on
    run_date triggers dynamic partition pruning."""
    orders = load_table(spark, sf_dir, "orders")
    latest = orders.agg(F.max("o_orderdate").alias("latest_date"))
    return (
        orders.crossJoin(F.broadcast(latest))
        .filter(F.col("o_orderdate") == F.col("latest_date"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Self-join via double reference (J6)
# ---------------------------------------------------------------------------
@register(
    "nation_pairs_same_region",
    oracle="""
    SELECT n1.n_regionkey AS regionkey, n1.n_name AS nation_a, n2.n_name AS nation_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
    """,
    operators=("J6",),
)
def nation_pairs_same_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same source joined twice under aliases (glue.py:215-238 joins
    title_basics to itself as episode + parent-series metadata)."""
    nation = load_table(spark, sf_dir, "nation")
    n1, n2 = nation.alias("n1"), nation.alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_name") < F.col("n2.n_name")),
    ).select(
        F.col("n1.n_regionkey").alias("regionkey"),
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
    )


# ---------------------------------------------------------------------------
# DISTINCT (U2)
# ---------------------------------------------------------------------------
@register(
    "distinct_segments_by_nation",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    operators=("U2",),
)
def distinct_segments_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = shuffle on all projected cols (glue.py:178 pattern);
    project FIRST so the shuffle carries only the two columns."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
    )


# ---------------------------------------------------------------------------
# unionByName with missing columns (U1, A7)
# ---------------------------------------------------------------------------
@register(
    "profile_union",
    oracle="""
    SELECT * FROM (
        SELECT 'orders' AS dataset, COUNT(*) AS row_count,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE)
                   AS sum_totalprice
        FROM orders
    )
    UNION ALL BY NAME
    SELECT * FROM (
        SELECT 'lineitem' AS dataset, COUNT(*) AS row_count,
               ROUND(SUM(l_quantity), 4) AS sum_quantity
        FROM lineitem
    )
    """,
    operators=("U1", "A7"),
)
def profile_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of differently-shaped one-row profiles, missing columns →
    NULL — exactly the reference's DQ union sink (glue.py:347-350).

    Money sums as exact DECIMAL(18,2), double at the output edge only
    (the salted_revenue policy): the grand total over orders drifted
    past ROUND(_, 4) at sf1 — round-11 sweep catch, same class as
    SCALE §42. l_quantity stays a plain double SUM: integers 1-50 sum
    exactly in binary far beyond any realistic N."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p1 = orders.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_totalprice"),
    ).select(F.lit("orders").alias("dataset"), "*")
    p2 = li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.round(F.sum("l_quantity"), 4).alias("sum_quantity"),
    ).select(F.lit("lineitem").alias("dataset"), "*")
    return p1.unionByName(p2, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Global top-k + CASE banding (O1, P9)
# ---------------------------------------------------------------------------
@register(
    "top_orders_banded",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice >= 400000 THEN 'high'
                WHEN o_totalprice >= 200000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    operators=("O1", "P9"),
)
def top_orders_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT plans as TakeOrderedAndProject (real top-k, no
    global sort); banding is the VOTE_BUCKET CASE chain
    (movie_facts_anl.sql:27-40)."""
    orders = load_table(spark, sf_dir, "orders")
    banded = orders.select(
        "o_orderkey",
        "o_totalprice",
        banding("o_totalprice", [400000.0, 200000.0], ["high", "mid", "low"]).alias(
            "price_band"
        ),
    )
    return top_k_global(banded, [F.desc("o_totalprice"), F.col("o_orderkey")], 10)


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) + MAX-as-any per group (A4, A5)
# ---------------------------------------------------------------------------
@register(
    "brand_diversity_by_type",
    oracle="""
    SELECT p_type,
           COUNT(DISTINCT p_brand) AS n_brands,
           MAX(p_name)             AS sample_name
    FROM part
    GROUP BY p_type
    """,
    operators=("A4", "A5"),
)
def brand_diversity_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct per group + MAX-as-representative
    (docs/most_verstaile_actor_actress.sql:3-4)."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy("p_type")
        .agg(
            F.countDistinct("p_brand").alias("n_brands"),
            F.max("p_name").alias("sample_name"),
        )
    )


# ---------------------------------------------------------------------------
# JSON extraction + tolerant cast + fallback (F18, P7, P8)
# ---------------------------------------------------------------------------
@register(
    "events_json_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), -1)) AS DOUBLE)
               / COUNT(*) AS avg_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    operators=("F18", "P7", "P8", "A1"),
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object + try_cast + COALESCE default — the Snowflake
    `$1:"x"::type` / TRY_TO_NUMBER / fallback-chain patterns
    (batch.py:228-273) on a JSON props column. All JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(
        F.get_json_object("props", "$.k").try_cast("int"), F.lit(-1)
    )
    return ev.groupBy("event_type").agg(
        (F.sum(k) / F.count(F.lit(1))).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Semi-structured VARIANT type (Spark 4) on the same JSON column
# ---------------------------------------------------------------------------
@register(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           COUNT(*) AS n_missing_j
    FROM events
    GROUP BY event_type
    """,
    operators=("F18", "P7", "A1"),
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT path for semi-structured columns:
    ``try_parse_json`` builds a binary variant once, then typed
    ``try_variant_get`` extractions replace per-path string re-parsing
    — at 100 TB the JSON text is parsed ONCE per row however many
    fields downstream expressions pull. The probe for a path that
    never exists ($.j) shows the try-semantics: NULL, not error, and
    the oracle pins that every row misses it."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    ev = ev.select("event_type", v.alias("__v"))
    k = F.try_variant_get(F.col("__v"), "$.k", "int")
    j = F.try_variant_get(F.col("__v"), "$.j", "int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(j.isNull().cast("long")).alias("n_missing_j"),
    )


# ---------------------------------------------------------------------------
# Decade math (F13) on order dates
# ---------------------------------------------------------------------------
@register(
    "orders_per_decade",
    oracle="""
    SELECT CAST((year(o_orderdate) // 10) * 10 AS INTEGER) AS order_decade,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
               AS decade_revenue
    FROM orders
    GROUP BY 1
    """,
    operators=("F13", "A1"),
)
def orders_per_decade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer decade bucketing ((year/10)::int*10, glue.py:132,241).
    Decade-grain revenue reaches ~2.9e12 at sf10, where the double
    ROUND(SUM) drifted (r11 sweep) — exact cents sum instead."""
    orders = load_table(spark, sf_dir, "orders")
    dec = ((F.year("o_orderdate") / 10).cast("int") * 10).alias("order_decade")
    return orders.groupBy(dec).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum_cents(F.col("o_totalprice"), 100).alias("decade_revenue"),
    )


# ---------------------------------------------------------------------------
# Ordered collect + concat_ws (A10, A11, F3-F6)
# ---------------------------------------------------------------------------
@register(
    "order_part_names",
    oracle="""
    SELECT l_orderkey,
           string_agg(p_name, ', ' ORDER BY l_linenumber, p_name) AS part_names
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey
    """,
    operators=("A10", "A11", "F3", "F4", "F5", "F6"),
)
def order_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_array(collect_list(struct)) → transform → concat_ws — the
    reference's ordered top-cast string (glue.py:157-168). The sort is
    per-group inside the array, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    joined = li.join(
        maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey
    )
    return ordered_collect_concat(
        joined,
        group_by=["l_orderkey"],
        order_col="l_linenumber",
        value_col="p_name",
        out_col="part_names",
    )


# ---------------------------------------------------------------------------
# Conjunctive filter + isin + LIKE (P2, P3, P4, P5)
# ---------------------------------------------------------------------------
@register(
    "filtered_parts",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size >= 10
      AND p_type IN ('ECONOMY', 'PROMO')
      AND lower(p_name) LIKE '%widget%'
    """,
    operators=("P2", "P3", "P4", "P5"),
)
def filtered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates + isin + case-insensitive LIKE
    (glue.py:123-128,147,177). All three push down to the parquet scan
    — check PushedFilters in .explain('formatted')."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_size") >= 10)
        & F.col("p_type").isin("ECONOMY", "PROMO")
        & F.lower(F.col("p_name")).like("%widget%")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


# ---------------------------------------------------------------------------
# SQL-text surface (§3.3): same engine, query authored as SQL
# ---------------------------------------------------------------------------
@register(
    "sql_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0
               / COUNT(o_totalprice) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("S5", "A2", "A3"),
)
def sql_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SQL dialect surface (dbt/Athena models) runs
    through spark.sql over catalog views — Catalyst parses/optimizes
    the same as the DataFrame API."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   / CAST(100 AS DOUBLE)
                   / COUNT(o_totalprice) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
        """
    )
