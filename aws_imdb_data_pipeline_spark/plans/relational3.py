"""Third relational batch: TPC-H-shaped composite queries exercising
multi-join chains, conditional-aggregate ratios, correlated-subquery
patterns (decorrelated to joins), and zero-preserving distributions —
the shapes a complete engine must plan well at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.plans.relational import money_sum_cents
from aws_imdb_data_pipeline_spark.sources.tables import load_table, maybe_broadcast


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: snowflake join chain + grouped revenue
# ---------------------------------------------------------------------------
@register(
    "regional_revenue",
    oracle="""
    SELECT n_name AS nation,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
                    AS BIGINT)) / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    operators=("J3", "J2", "A1", "P2"),
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table snowflake chain filtered to one region. The region
    filter reaches nation through the broadcast chain BEFORE touching
    the fact table — only matching customers survive to the fact join,
    so the big side shuffles once (orderkey) and probes broadcasts.
    Revenue is an exact long-fixed-point sum (money_sum_cents — the
    double ROUND(SUM) drifted at sf10's ~1.2e11 per-nation totals,
    r11 sweep, SCALE §47)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(dims, sf_dir, "customer"), orders.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum_cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                10000,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional-aggregate ratio
# ---------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    oracle="""
    SELECT (SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1.0 - l_discount)
                          ELSE 0 END * 10000, 0) AS BIGINT)) / 10000.0)
           / (SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
                       AS BIGINT)) / 10000.0) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    operators=("A6", "A7", "P9"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio in one scan (sum(when)/sum). Both sums
    are GLOBAL money masses (~3e10 already at sf0.1 — the largest
    grain in the registry; money-grain audit r13), so both use the
    exact cents form; the quotient divides identical operands."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = li.join(
        maybe_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey
    )
    return joined.agg(
        (
            money_sum_cents(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0), 10000
            )
            / money_sum_cents(rev, 10000)
        ).alias("promo_share")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery, decorrelated
# ---------------------------------------------------------------------------
@register(
    "small_quantity_revenue",
    oracle="""
    WITH avg_per_part AS (
        SELECT l_partkey, ROUND(SUM(l_quantity), 4) / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS VARCHAR) AS DOUBLE) AS total_price
    FROM lineitem
    JOIN avg_per_part USING (l_partkey)
    WHERE l_quantity < 0.5 * avg_qty
    """,
    operators=("A12", "J1", "A1"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Lines below half the part's average quantity' — the correlated
    scalar subquery decorrelated into an aggregate + self-join, which
    is exactly how an optimizer executes it. The aggregate side is
    small (one row per part) → broadcast back onto the fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_per_part = li.groupBy("l_partkey").agg(
        (F.round(F.sum("l_quantity"), 4) / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(maybe_broadcast(avg_per_part, sf_dir, "part"), "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: zero-preserving distribution via left join
# ---------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
    operators=("J1", "A3", "A1"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer INCLUDING zero-order customers
    (left join + count of the nullable key — count(col) skips NULLs,
    so no-match rows contribute 0, not 1)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item ranking
# ---------------------------------------------------------------------------
@register(
    "top_return_customers",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS returned_revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY returned_revenue DESC, c_custkey
    LIMIT 20
    """,
    operators=("J3", "A1", "O1", "P2"),
)
def top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of returned items per customer, top-20. The returnflag
    filter pushes into the fact scan (PushedFilters) before any join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                4,
            ).alias("returned_revenue")
        )
        .orderBy(F.desc("returned_revenue"), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "nation_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
                    AS BIGINT)) / 10000.0 AS volume,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name
    """,
    operators=("J3", "J6", "A1"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume between supplier and
    customer nations — nation joined twice under two roles (J6), all
    dimension sides broadcast; completes coverage of every test table.

    volume is the exact long-fixed-point money sum (round 12): the
    sf100 divergence sweep caught the ROUND(SUM(double), 4) form one
    ulp off at the ~4.8e10 nation-pair grain — the §47 class, one
    decade later than the headline queries because the grain is 600x
    coarser. money_sum_cents is order-invariant at any magnitude."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            money_sum_cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                10000,
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
