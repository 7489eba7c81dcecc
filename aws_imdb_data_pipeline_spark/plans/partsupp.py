"""TPC-H Q2/Q11/Q16/Q20 shapes over a synthesized partsupp table.

The test lake has no partsupp, so these four decision-support shapes —
correlated min-cost supplier, HAVING vs a scaled global aggregate,
anti-join + count-distinct, and a nested semi-join against a correlated
quantity threshold (reference-class coverage: the same query families
the reference's warehouse serves, COVERAGE.md §2.6-2.8) — derive one
deterministically from `part` × a small key fan-out, with pure integer
arithmetic so the DuckDB oracle rebuilds the identical rows:

    ps_suppkey    = (p_partkey*4 + k) % n_suppliers        k in 0..3
    ps_availqty   = (p_partkey*31 + ps_suppkey*17) % 9999 + 1
    ps_supplycost = ((p_partkey*131 + ps_suppkey*29) % 100000)/100.0 + 1

Within a part the four suppkeys are distinct whenever n_suppliers > 3
(differences 1..3 can't be ≡ 0). Every query broadcasts the dimension
sides and shuffles the synthesized fact at most once on its group key —
at 100 TB partsupp would be a real table, and these plans read exactly
like the ones they'd get: the synthesis is a zero-shuffle projection
that fuses into the scan stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.registry import register
from aws_imdb_data_pipeline_spark.sources.tables import (
    load_table,
    maybe_broadcast,
    table_rows,
)

# Shared oracle prefix: DuckDB rebuilds partsupp with the same integer
# arithmetic (generate_series fan-out == the Spark explode).
PARTSUPP_SQL = """
    ps_keys AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey * 4 + t.k) % (SELECT COUNT(*) FROM supplier)
                   AS ps_suppkey
        FROM part, generate_series(0, 3) t(k)
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS INT)
                   AS ps_availqty,
               CAST((ps_partkey * 131 + ps_suppkey * 29) % 100000 AS DOUBLE)
                   / 100.0 + 1.0 AS ps_supplycost
        FROM ps_keys
    )
"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp as a deterministic projection of `part`: explode a
    4-element sequence (codegen generator, zero shuffle — the whole
    synthesis fuses into the part scan) and derive keys/qty/cost with
    the integer formulas above. The supplier count is read driver-side
    once (the supplier table is dimension-sized at any SF)."""
    # footer-metadata count (exact == COUNT(*)): no Spark job at
    # construction time
    n_supp = table_rows(sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    sk = (F.col("ps_partkey") * 4 + F.col("k")) % n_supp
    return part.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
    ).select(
        F.col("ps_partkey"),
        sk.alias("ps_suppkey"),
        ((F.col("ps_partkey") * 31 + sk * 17) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 131 + sk * 29) % 100000).cast("double")
            / 100.0
            + 1.0
        ).alias("ps_supplycost"),
    )


# ---------------------------------------------------------------------------
# Q2 shape — correlated min-cost supplier.
# ---------------------------------------------------------------------------
@register(
    "min_cost_supplier",
    oracle="""
    WITH """ + PARTSUPP_SQL + """,
    eligible AS (
        SELECT p_partkey, ps_supplycost, s_name, n_name, s_acctbal
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
    )
    SELECT p_partkey, ps_supplycost AS min_cost, s_name, n_name, s_acctbal
    FROM eligible e
    WHERE ps_supplycost = (
        SELECT MIN(ps_supplycost) FROM eligible i
        WHERE i.p_partkey = e.p_partkey
    )
    """,
    operators=("J1", "A3", "P2", "SQ-correlated"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small STANDARD part, the EUROPE
    supplier(s) offering the minimum supply cost. The correlated
    MIN subquery decorrelates to a per-part aggregate joined back on
    (partkey, cost) — equality on doubles is safe because both sides
    carry the identical synthesized value. All dimension sides
    (part-filtered, supplier⋈nation⋈region) broadcast; the only
    exchange is the min-aggregate's partial/final pair. Ties (two
    suppliers at the same min cost) are kept, as in the original."""
    ps = synth_partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    eligible = (
        ps.join(maybe_broadcast(part, sf_dir, "part"), ps.ps_partkey == part.p_partkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), ps.ps_suppkey == supp.s_suppkey)
        .select("p_partkey", "ps_supplycost", "s_name", "n_name", "s_acctbal")
    )
    min_cost = (
        eligible.groupBy("p_partkey")
        .agg(F.min("ps_supplycost").alias("__min"))
        .select(F.col("p_partkey").alias("__pk"), "__min")
    )
    return (
        eligible.join(
            maybe_broadcast(min_cost, sf_dir, "part"),
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("ps_supplycost") == F.col("__min")),
        )
        .select(
            "p_partkey",
            F.col("ps_supplycost").alias("min_cost"),
            "s_name",
            "n_name",
            "s_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape — HAVING against a scaled global aggregate.
# ---------------------------------------------------------------------------
_Q11_SQL = ("""
    WITH """ + PARTSUPP_SQL + """,
    national AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS v
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7')
    )
    SELECT ps_partkey, ROUND(SUM(v), 2) AS stock_value
    FROM national
    GROUP BY ps_partkey
    HAVING SUM(v) > (SELECT SUM(v) * 0.001 FROM national)
    """)


@register(
    "important_stock",
    oracle=_Q11_SQL,
    operators=("A1", "J1", "SQ-scalar", "A-having"),
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value restricted to two
    nations' suppliers, HAVING above a fraction of the same
    restricted global total. The scalar side is the identical
    aggregate re-rolled globally and attached as a 1-row broadcast
    (BNL on one row — the cheapest correct plan); the comparison runs
    on the UNROUNDED sums exactly like the SQL, rounding applied only
    to the output column."""
    ps = synth_partsupp(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    national = ps.join(maybe_broadcast(supp, sf_dir, "supplier"), ps.ps_suppkey == supp.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    )
    per_part = national.groupBy("ps_partkey").agg(F.sum("v").alias("__sum"))
    total = national.agg((F.sum("v") * F.lit(0.001)).alias("__threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__sum") > F.col("__threshold"))
        .select(
            "ps_partkey", F.round(F.col("__sum"), 2).alias("stock_value")
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape — anti-join + count-distinct.
# ---------------------------------------------------------------------------
@register(
    "parts_supplier_counts",
    oracle="""
    WITH """ + PARTSUPP_SQL + """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    operators=("A2", "J-anti", "P2"),
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type,
    size), excluding deficit suppliers (the lake has no s_comment, so
    s_acctbal < 0 stands in for the complaints predicate). The NOT IN
    becomes a broadcast anti-join (the exclusion list is tiny at any
    scale); count-distinct shuffles once on the group key."""
    ps = synth_partsupp(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(maybe_broadcast(part, sf_dir, "part"), ps.ps_partkey == part.p_partkey)
        .join(
            maybe_broadcast(bad, sf_dir, "supplier"),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — nested semi-join against a correlated quantity threshold.
# ---------------------------------------------------------------------------
@register(
    "promotable_suppliers",
    oracle="""
    WITH """ + PARTSUPP_SQL + """
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey = 2
      AND s_suppkey IN (
          SELECT ps_suppkey FROM partsupp
          WHERE ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND ps_availqty > (
              SELECT 0.5 * SUM(l_quantity) FROM lineitem
              WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
          )
      )
    """,
    operators=("J-semi", "SQ-correlated", "A1", "P2"),
)
def promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: region-2 suppliers whose stock of any 'small'
    part exceeds half the quantity they shipped of it in 1996. The
    correlated SUM decorrelates to a (partkey, suppkey) aggregate of
    the filtered lineitem inner-joined to partsupp — the inner join
    reproduces the SQL's NULL-comparison-is-false semantics for pairs
    with no shipments. Semi-joins all the way up: no multiplicity ever
    reaches the supplier side. Lineitem is the only big side; it
    aggregates once on (partkey, suppkey) and everything else
    broadcasts."""
    ps = synth_partsupp(spark, sf_dir)
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("__half_qty"))
    )
    overstocked = (
        ps.join(maybe_broadcast(small, sf_dir, "part"), ps.ps_partkey == small.p_partkey, "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("__half_qty"))
        # distinct is free under the left_semi consumer and restores the
        # gate's upper-bound invariant: without it this frame is
        # partsupp-grain (duplicate ps_suppkey rows), so the supplier
        # table's footprint would NOT bound the broadcast relation.
        .select("ps_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            maybe_broadcast(overstocked, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# partsupp as a REAL bucketed lake table (stretch: co-located aggregates)
# ---------------------------------------------------------------------------
def ensure_partsupp_bucketed(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> str:
    """Materialize the synthesized partsupp as a catalog table BUCKETED
    by ps_partkey (sorted within buckets), build-if-missing. Returns
    the table name, which embeds a fingerprint of the source `part`
    parquet + bucket count, so a data refresh naturally invalidates
    (stale fingerprint tables with the same prefix are dropped).

    Why ps_partkey: the four Q2/Q11/Q16/Q20 shapes broadcast every
    dimension side, so their only exchanges are the aggregates keyed
    by (or prefixed by) ps_partkey. A bucketed scan already delivers
    hash(ps_partkey) distribution — HashPartitioning on a subset of
    the grouping keys satisfies the aggregate's clustering — so those
    exchanges disappear: the write-time shuffle is paid once, every
    repeat query runs map-side (sources/bucketed.py rationale)."""
    import shutil

    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import (
        source_fingerprint,
    )

    fp = source_fingerprint(
        os.path.join(sf_dir, "part.parquet"), {"num_buckets": num_buckets}
    )[:12]
    # the table name embeds the SF-DIR scope before the fingerprint, so
    # GC below only ever touches THIS sf_dir's stale versions — tables
    # for other scale factors coexisting in the same warehouse (tests
    # at sf0.001, bench at sf0.1) are never dropped or rmtree'd
    scope = "".join(
        ch if ch.isalnum() else "_"
        for ch in os.path.basename(os.path.normpath(sf_dir))
    ).lower()
    prefix = f"partsupp_b_{scope}_"
    table = f"{prefix}{fp}"
    if spark.catalog.tableExists(table):
        return table
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    # GC stale fingerprints of THIS scope: drop the catalog entries AND
    # their files (attach-by-LOCATION tables — DROP alone leaves data).
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix) and t.name != table:
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    for name in os.listdir(warehouse) if os.path.isdir(warehouse) else []:
        if name.startswith(prefix) and name != table:
            shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
    ps = synth_partsupp(spark, sf_dir)
    # The session catalog is in-memory but the warehouse directory
    # persists across sessions: if a previous session already wrote
    # this fingerprint's files TO COMPLETION (the _BUCKETED_OK marker
    # is written only after the bucketed write returns — a crashed
    # partial write leaves no marker and is rebuilt, never attached),
    # re-ATTACH them with bucket-spec DDL (bucketing metadata lives in
    # the catalog, not the files) — warm start for every later session.
    loc = os.path.join(warehouse, table)
    marker = os.path.join(loc, "_BUCKETED_OK")
    if os.path.isfile(marker):
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in ps.schema.fields
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING parquet "
            f"CLUSTERED BY (ps_partkey) SORTED BY (ps_partkey) "
            f"INTO {num_buckets} BUCKETS LOCATION '{loc}'"
        )
        return table
    if os.path.isdir(loc):  # partial previous write: rebuild from scratch
        shutil.rmtree(loc, ignore_errors=True)
    from aws_imdb_data_pipeline_spark.sources.bucketed import (
        write_bucketed_table,
    )

    write_bucketed_table(ps, table, "ps_partkey", num_buckets)
    with open(marker, "w") as f:
        f.write(fp)
    return table


@register(
    "min_cost_supplier_bucketed",
    oracle="""
    WITH """ + PARTSUPP_SQL + """,
    eligible AS (
        SELECT p_partkey, ps_supplycost, s_name, n_name, s_acctbal
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
    )
    SELECT p_partkey, ps_supplycost AS min_cost, s_name, n_name, s_acctbal
    FROM eligible e
    WHERE ps_supplycost = (
        SELECT MIN(ps_supplycost) FROM eligible i
        WHERE i.p_partkey = e.p_partkey
    )
    """,
    operators=("J1", "A3", "P2", "SQ-correlated", "S-bucketed"),
)
def min_cost_supplier_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 over the MATERIALIZED bucketed partsupp (the
    important_stock_bucketed treatment applied to the second shape
    whose only exchange is keyed by ps_partkey): same rows and oracle
    as `min_cost_supplier`, but the min-cost aggregate groups on the
    BUCKETED side's ps_partkey, so the hash(ps_partkey) distribution
    comes straight from the bucketed scan and the plan has NO Exchange
    at all — dimension sides broadcast, the per-part min re-joins as a
    broadcast. One bucketed write amortizes across every
    partsupp-keyed shape, which is the point of bucketing a 100 TB
    fact table."""
    table = ensure_partsupp_bucketed(spark, sf_dir)
    ps = spark.table(table)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    # keep the BUCKETED key through the aggregate: grouping on
    # ps_partkey (not the part side's equivalent p_partkey) reads the
    # scan's hash distribution without relying on join-key equivalence
    # propagation
    eligible = (
        ps.join(maybe_broadcast(part, sf_dir, "part"), ps.ps_partkey == part.p_partkey, "left_semi")
        .join(maybe_broadcast(supp, sf_dir, "supplier"), ps.ps_suppkey == supp.s_suppkey)
        .select("ps_partkey", "ps_supplycost", "s_name", "n_name", "s_acctbal")
    )
    min_cost = (
        eligible.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("__min"))
        .select(F.col("ps_partkey").alias("__pk"), "__min")
    )
    return (
        eligible.join(
            maybe_broadcast(min_cost, sf_dir, "part"),
            (F.col("ps_partkey") == F.col("__pk"))
            & (F.col("ps_supplycost") == F.col("__min")),
        )
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.col("ps_supplycost").alias("min_cost"),
            "s_name",
            "n_name",
            "s_acctbal",
        )
    )


@register(
    "important_stock_bucketed",
    oracle=_Q11_SQL,
    operators=("A1", "J1", "SQ-scalar", "A-having", "S-bucketed"),
)
def important_stock_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 over the MATERIALIZED bucketed partsupp: same rows as
    `important_stock` (same oracle), different physical story — the
    per-part aggregate reads hash(ps_partkey)-bucketed files, so the
    plan has NO Exchange on the partsupp side (asserted in
    tests/test_plans.py). The one-off bucketed write is the amortized
    cost; at 100 TB this is the difference between re-shuffling the
    fact table per query and never shuffling it again."""
    table = ensure_partsupp_bucketed(spark, sf_dir)
    ps = spark.table(table)
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    national = ps.join(maybe_broadcast(supp, sf_dir, "supplier"), ps.ps_suppkey == supp.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    )
    per_part = national.groupBy("ps_partkey").agg(F.sum("v").alias("__sum"))
    total = national.agg((F.sum("v") * F.lit(0.001)).alias("__threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__sum") > F.col("__threshold"))
        .select(
            "ps_partkey", F.round(F.col("__sum"), 2).alias("stock_value")
        )
    )
