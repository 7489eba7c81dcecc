"""Fifth relational batch: the remaining TPC-H-shaped decision-support
patterns expressible on the test lake's columns — conditional EXISTS
semi-join, bidirectional nation trade, market share, synthetic profit,
argmax-by-join, group-HAVING join-back, disjunctive join predicates,
and scalar-subquery anti-join. The reference's SQL surface (Athena/dbt)
supports all of these shapes; together with relational.py/2/3/4 a user
can run any of the classic warehouse query forms.

Cross-engine float policy (see plans.relational.stable_avg): ROUND only
SUMs, never a quotient or comparison boundary computed per-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.plans.relational import money_sum_cents
from aws_imdb_data_pipeline_spark.sources.tables import load_table, maybe_broadcast


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS with a correlated inequality — conditional
# left-semi join (the anti of customers_without_orders' anti-join).
# ---------------------------------------------------------------------------
@register(
    "late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS late_orders
    FROM orders o
    WHERE year(o_orderdate) = 1997
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    operators=("J-semi", "A1", "F13"),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (1997) with >= 1 lineitem shipped > 60 days after the
    order date, counted per priority. The correlated EXISTS becomes a
    LEFT SEMI join whose condition carries the inequality — Spark
    dedups the probe side in the join itself (no distinct needed), and
    the orders-side year filter is pushed to the parquet scan.

    Scale: semi join shuffles both sides on l_orderkey once; the
    fact-side payload is just (orderkey, shipdate)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("late_orders"))


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
# ---------------------------------------------------------------------------
@register(
    "nation_trade_by_year",
    oracle="""
    SELECT n_s.n_name AS supp_nation, n_c.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
                    AS BIGINT)) / 10000.0 AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n_s ON s_nationkey = n_s.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n_c ON c_nationkey = n_c.n_nationkey
    WHERE (n_s.n_name = 'NATION_1' AND n_c.n_name = 'NATION_2')
       OR (n_s.n_name = 'NATION_2' AND n_c.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    operators=("J3", "J-self", "A1", "F13"),
)
def nation_trade_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations, both directions, per ship
    year. The nation dimension joins twice (supplier side, customer
    side) — both broadcast; the disjunctive pair filter runs after the
    dim joins attach names but before the aggregate.

    Scale: the only big-big shuffle is lineitem->orders on the order
    key; all four dimension attachments are broadcasts, so the fact
    table is shuffled exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n_c = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(money_sum_cents(_revenue(), 10000).alias("volume"))


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier nation within a
# customer region, per year — conditional-sum ratio.
# ---------------------------------------------------------------------------
@register(
    "market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           (SUM(CAST(ROUND(CASE WHEN n_s.n_name = 'NATION_5'
                           THEN l_extendedprice * (1.0 - l_discount)
                           ELSE 0 END * 10000, 0) AS BIGINT)) / 10000.0)
           / (SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
                       AS BIGINT)) / 10000.0)
           AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n_c ON c_nationkey = n_c.n_nationkey
    JOIN region ON n_c.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n_s ON s_nationkey = n_s.n_nationkey
    WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    GROUP BY 1
    """,
    operators=("J3", "A6", "F13", "P4"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of PROMO-part revenue sold into EUROPE, per
    order year. Both sums are rounded (snapping the two engines' sums
    to identical doubles) and then divided WITHOUT rounding — identical
    operands give a bitwise-identical quotient (see stable_avg).

    Scale: part/customer/nation/region/supplier all broadcast; the
    selective part+region filters shrink the fact stream before the
    single lineitem->orders shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_c = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(
            maybe_broadcast(part.select("p_partkey"), sf_dir, "part"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"), "left_semi")
        .join(maybe_broadcast(supp, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
    )
    rev = _revenue()
    national = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0))
    # per-year grain is FIXED: the denominator mass crosses the drift
    # bound at sf100 (money-grain audit r13) — exact cents both legs,
    # raw quotient of identical operands
    return joined.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        (money_sum_cents(national, 10000) / money_sum_cents(rev, 10000))
        .alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: synthetic profit by supplier nation and year (the
# test lake has no partsupp, so cost is proxied from p_retailprice).
# ---------------------------------------------------------------------------
@register(
    "profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS order_year,
           SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)
                           - 0.01 * p_retailprice * l_quantity) * 10000, 0)
                    AS BIGINT)) / 10000.0 AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    operators=("J3", "A1", "F2", "F13"),
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue minus a 1%-of-retail unit cost proxy) for
    widget parts, by supplier nation and order year. The part-name
    LIKE filter is broadcast with the part keys so the fact stream
    shrinks before its one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = (
        li.join(
            maybe_broadcast(part.select("p_partkey", "p_retailprice"), sf_dir, "part"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(maybe_broadcast(supp, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    profit = _revenue() - F.lit(0.01) * F.col("p_retailprice") * F.col("l_quantity")
    # (nation, year) grain is FIXED — cents form (audit r13); the
    # profit expression is exactly 4dp (4dp revenue minus
    # 0.01 x 2dp x integer qty)
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year")
    ).agg(money_sum_cents(profit, 10000).alias("profit"))


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: argmax — supplier(s) with the maximum revenue in a
# quarter, found by joining against the aggregated max (no window).
# ---------------------------------------------------------------------------
@register(
    "top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1998-01-01' AND l_shipdate < DATE '1998-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    operators=("A2", "J1", "O-argmax"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-revenue supplier for 1998Q1. The scalar MAX subquery becomes
    a 1-row broadcast cross join against the per-supplier aggregate —
    no global window, no second scan of lineitem.

    Revenue sums exactly as DECIMAL (price 2dp x (1 - discount 2dp) is
    an exact 4dp product): the argmax EQUALITY needs the aggregate to
    be re-evaluation-stable — at sf1 the oracle's double sum drifted
    BETWEEN the CTE's two evaluations (revenue vs the scalar MAX
    subquery re-running it under different parallel order), so its own
    max matched no row and it returned 0 rows (round-11 sweep). An
    exact decimal sum is order-invariant, so the equality — and the
    cross-engine value after the output-edge double cast — is
    deterministic at any N."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    best = revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx")).drop(
        "__mx"
    )
    return (
        best.join(maybe_broadcast(supp, sf_dir, "supplier"), best.supplier_no == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: GROUP BY ... HAVING on the fact, joined back to the
# enclosing dimensions.
# ---------------------------------------------------------------------------
@register(
    "large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 200)
    GROUP BY 1, 2, 3, 4, 5
    """,
    operators=("A2", "A-having", "J1", "J-semi"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 200, with their customers.

    Round-8 restructure (the round-7 bench regression): the old form
    scanned AND shuffled lineitem twice — once for the HAVING keeper
    keys, once to re-aggregate quantities for the report — betting on
    an exchange reuse that the executed plan did not deliver (the semi
    join's keeper side aggregates BEFORE the second scan's shuffle, so
    the exchanges differ). But the report's grain is (customer, order)
    and every report column is functionally dependent on o_orderkey,
    so the per-order SUM already IS total_qty: aggregate lineitem
    ONCE, filter > 200 (6% of orders at sf0.1), and join orders to the
    filtered aggregate. One lineitem scan, one lineitem shuffle, no
    second aggregate. The filtered side is left un-hinted: AQE sees
    its runtime size and picks broadcast at bench scale, while at
    100 TB (where 6% of orders is billions of rows) it stays a
    key-partitioned join — the choice belongs to the runtime stats,
    not the code. Customer attaches by broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big_qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 200)
    )
    return (
        orders.join(big_qty, orders.o_orderkey == big_qty.l_orderkey)
        .join(maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("__q", 4).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctive band predicates spanning
# both join sides.
# ---------------------------------------------------------------------------
@register(
    "banded_brand_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0)
               AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    operators=("J1", "P2-disjunctive", "A6"),
)
def banded_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under a 3-way disjunction of (brand, size, quantity)
    bands. The part-side disjuncts (brand OR'd, size <= the max band)
    are pre-filtered onto the broadcast build side so the probe join
    touches only possibly-matching parts; the full mixed-side
    disjunction evaluates post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")
        & F.col("p_size").between(1, 15)
    )
    joined = li.join(
        maybe_broadcast(part.select("p_partkey", "p_brand", "p_size"), sf_dir, "part"),
        li.l_partkey == F.col("p_partkey"),
    )
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    # exact long-fixed-point sum (round 12): the sf100 divergence
    # sweep caught ROUND(SUM(double), 4) one ulp off at this query's
    # single ~1.6e11 global total — the §47 class at a grand-total
    # grain (SCALE §53)
    return joined.filter(cond).agg(
        money_sum_cents(_revenue(), 10000).alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: fully-pushed-down filter + single global aggregate.
# ---------------------------------------------------------------------------
@register(
    "discount_revenue_delta",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0)
                    AS BIGINT)) / 10000.0 AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1997
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 15
    """,
    operators=("P2", "P5", "A7"),
)
def discount_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be recovered by dropping small discounts on
    small-quantity 1997 lines (the forecasting-what-if aggregate). The
    whole query is one scan: every predicate is scan-pushable (year
    range, discount band, quantity threshold) and the aggregate is a
    partial+final sum — the cheapest possible plan shape, included so
    the suite covers the filter-only/no-join extreme.

    Scale: no shuffle beyond the 1-row final aggregate; the parquet
    reader prunes to 3 columns and row groups matching the predicates."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1997)
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 15)
    )
    return li.agg(
        # global filtered grain crosses the drift bound at sf100
        # (money-grain audit r13) — exact cents (4dp product)
        money_sum_cents(
            F.col("l_extendedprice") * F.col("l_discount"), 10000
        ).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact — the
# "sole blocking supplier" pattern. The test lake has no
# commit/receipt dates, so "kept the order waiting" is recast as
# shipping > 60 days after the order date (same correlation shape).
# ---------------------------------------------------------------------------
@register(
    "blocking_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
    operators=("J-semi", "J-anti", "A4", "A6"),
)
def blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper in a finished
    multi-supplier order, with how many of their lines were late. The
    correlated EXISTS/NOT EXISTS pair collapses into two whole-
    partition window sets over l_orderkey — distinct suppliers overall
    and distinct *late* suppliers — so the fact table is scanned ONCE
    and shuffled ONCE (no aggregate-then-join-back second traversal; a
    plan test asserts the single scan). A row survives iff it is late,
    its order has >1 supplier, and exactly 1 distinct late supplier
    (which must then be this one).

    Scale: per-order groups are small (lines per order is bounded), so
    the collect_set window state is tiny; supplier names attach by
    broadcast at the end. When the orders join runs as a sort-merge on
    l_orderkey at full scale, the window inherits that partitioning —
    zero additional exchanges."""
    from pyspark.sql import Window

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "__late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    w = Window.partitionBy("l_orderkey")
    # collect_set skips nulls, so the when() filter makes the second
    # set count only late lines' suppliers
    counted = lo.withColumn(
        "__n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "__n_late_supp",
        F.size(F.collect_set(F.when(F.col("__late"), F.col("l_suppkey"))).over(w)),
    )
    waiting = counted.filter(
        F.col("__late") & (F.col("__n_supp") > 1) & (F.col("__n_late_supp") == 1)
    )
    return (
        waiting.join(maybe_broadcast(supp, sf_dir, "supplier"), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar subquery threshold + anti join.
# ---------------------------------------------------------------------------
@register(
    "dormant_rich_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_custs,
           SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0
               AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT (SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0)
               / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c_mktsegment
    """,
    operators=("J-anti", "A-scalar", "A1"),
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no order since 2000, by
    segment. The scalar average joins as a 1-row broadcast (computed
    with the stable ROUND(SUM)/COUNT form on both engines); the NOT
    EXISTS is an anti join against date-filtered orders.

    Scale: the anti join's build side is orders pruned by the date
    predicate at the scan; customer never shuffles (broadcast scalar +
    key-partitioned anti join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    # the scalar threshold AND the per-segment totals both sit on
    # fixed grains whose mass crosses the drift bound at sf100
    # (money-grain audit r13) — exact cents; a drifted threshold
    # would flip MEMBERSHIP, not just a value
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (money_sum_cents(F.col("c_acctbal"), 100) / F.count("c_acctbal"))
        .alias("__avg")
    )
    rich = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("__avg")).drop(
        "__avg"
    )
    dormant = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        money_sum_cents(F.col("c_acctbal"), 100).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form rollup/cube specialize.
# ---------------------------------------------------------------------------
@register(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    operators=("A13", "A1"),
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-status totals, per-priority totals,
    and the grand total in ONE pass (Expand + single hash aggregate),
    where the naive formulation unions three scans. Spark's SQL
    GROUPING SETS and the DataFrame groupingSets() both plan the same
    Expand; the SQL text form is used so the catalog surface matches
    the reference's dialect layer.

    Money is summed as DECIMAL(18,2) (the salted_revenue_by_flag
    policy): the grand-total grouping set sums EVERY order, and at sf1
    (1.5M rows, ~4e11 total) a double sum's order drift exceeded
    ROUND(_, 4) — the first divergence the round-11 sf1 sweep caught.
    The exact decimal casts to DOUBLE only at the output edge."""
    from aws_imdb_data_pipeline_spark.sources.tables import register_views

    register_views(spark, sf_dir, tables=("orders",))
    # two-phase (the sales_rollup treatment): one decimal pass over the
    # fact into (status, priority) partials, grouping sets over the 15
    # base groups — exact re-association, 3x less accumulator input
    return spark.sql(
        """
        WITH base AS (
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(*) AS __n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS __s
            FROM orders
            GROUP BY o_orderstatus, o_orderpriority
        )
        SELECT o_orderstatus, o_orderpriority,
               SUM(__n) AS n_orders,
               CAST(SUM(__s) AS DOUBLE) AS revenue
        FROM base
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# mode() — most frequent value per group (Spark 4 / DuckDB both native).
# ---------------------------------------------------------------------------
@register(
    "segment_modal_priority",
    oracle="""
    WITH counts AS (
        SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    ), ranked AS (
        SELECT c_mktsegment, o_orderpriority,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY n DESC, o_orderpriority ASC
               ) AS rk,
               CAST(SUM(n) OVER (PARTITION BY c_mktsegment) AS BIGINT)
                   AS n_orders
        FROM counts
    )
    SELECT c_mktsegment, o_orderpriority AS modal_priority, n_orders
    FROM ranked WHERE rk = 1
    """,
    operators=("A1", "A-mode", "J1"),
)
def segment_modal_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order priority per customer segment via the
    native mode() aggregate (deterministic=true -> lowest value wins
    ties). The oracle spells the same tie-break out as an explicit
    arg-min (ROW_NUMBER over COUNT DESC, value ASC) rather than relying
    on DuckDB mode()'s undocumented tie behavior. Customer attaches by
    broadcast; one fact shuffle on the segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(maybe_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.mode("o_orderpriority", True).alias("modal_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# UNPIVOT — wide-to-long, the inverse of orders_status_pivot.
# ---------------------------------------------------------------------------
@register(
    "lineitem_charge_unpivot",
    oracle="""
    SELECT l_returnflag, component,
           CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS total
    FROM (
        SELECT l_returnflag, 'base' AS component,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    AS DECIMAL(30,6)) AS amount
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount',
               CAST(-(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(4,2)))
                    AS DECIMAL(30,6))
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'tax',
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * CAST(l_tax AS DECIMAL(4,2))
                    AS DECIMAL(30,6))
        FROM lineitem
    )
    GROUP BY l_returnflag, component
    """,
    operators=("U-unpivot", "A1"),
)
def lineitem_charge_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charge decomposition: derive base/discount/tax amount columns,
    unpivot() them wide-to-long (one Expand, no self-union triple
    scan — the oracle spells out the UNION ALL it replaces), then
    aggregate per (returnflag, component).

    All three amounts are EXACT decimals (price 2dp, x discount 2dp,
    x tax 2dp — scales add under multiplication, nothing rounds):
    DECIMAL(30,6) is the unpivot's common type and the sum is exact
    and order-invariant. The double formulation's ROUND(SUM, 4)
    drifted at sf1 (6M rows — the round-11 sweep's second catch, same
    class as SCALE §42). The exact-arithmetic price is ~3x the old
    double pass (0.26 -> ~0.9 s at sf0.1), carried by the per-row
    decimal products, NOT the Expand: a two-phase
    aggregate-then-unpivot rewrite was A/B'd at 1.03-1.06 s vs this
    form's 0.89-0.93 s and rejected.

    The output edge follows the money_sum convention
    (plans/relational.py): Spark casts the exact decimal sum to double
    directly (correctly rounded), the oracle casts VIA VARCHAR —
    at sf10 the per-flag totals reach ~1.06e12, where one double ulp
    is 2.4e-4 and DuckDB's DIRECT decimal->double cast double-rounds
    through int128 scaling onto the ADJACENT double even though the
    decimal sums are bit-identical (r11 sf10 sweep, SCALE §47)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("__p"),
        F.col("l_discount").cast("decimal(4,2)").alias("__d"),
        F.col("l_tax").cast("decimal(4,2)").alias("__t"),
    ).select(
        "l_returnflag",
        F.col("__p").cast("decimal(30,6)").alias("base"),
        (-(F.col("__p") * F.col("__d"))).cast("decimal(30,6)").alias(
            "discount"
        ),
        (F.col("__p") * (F.lit(1) - F.col("__d")) * F.col("__t"))
        .cast("decimal(30,6)")
        .alias("tax"),
    )
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["base", "discount", "tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )
    return long.groupBy("l_returnflag", "component").agg(
        F.sum("amount").cast("double").alias("total")
    )
