"""money_sum_cents (plans/relational.py): the long-fixed-point money
sum must equal the exact decimal accumulator on any <= 4dp data —
including adversarial values whose doubles sit just off the decimal
gridpoint — and stay order/partition-invariant.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans.relational import money_sum_cents


def _exact(vals, scale):
    return float(sum((Decimal(v) * scale).to_integral_value() for v in vals)
                 / Decimal(scale))


def test_cents_sum_equals_exact_decimal(spark):
    # 2dp money including the classic float offenders (x.x5, x.x1)
    vals = ["0.10", "0.05", "1.15", "2.675", "999999.99", "0.01", "12345.67"]
    vals = [v for v in vals if Decimal(v) == Decimal(v).quantize(Decimal("0.01"))]
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    got = df.agg(money_sum_cents(F.col("x"), 100).alias("s")).first().s
    assert got == _exact(vals, 100)


def test_cents_sum_4dp_and_partition_invariance(spark):
    # 4dp amounts (price * (1 - discount) shape), summed across
    # different partitionings — identical result every time
    rows = [(round(0.0001 * ((i * 7919) % 100000), 4),) for i in range(5000)]
    want = _exact([f"{r[0]:.4f}" for r in rows], 10000)
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, ["x"]).repartition(parts)
        got = df.agg(money_sum_cents(F.col("x"), 10000).alias("s")).first().s
        assert got == want, parts


def test_cents_sum_matches_duckdb_oracle_form(spark, duck):
    """The documented oracle twin produces the bit-identical double."""
    rows = [(round(900 + 0.01 * ((i * 31) % 10400), 2),) for i in range(4000)]
    df = spark.createDataFrame(rows, ["x"])
    got = df.agg(money_sum_cents(F.col("x"), 100).alias("s")).first().s
    want = duck.execute(
        "SELECT SUM(CAST(ROUND(x * 100, 0) AS BIGINT)) / 100.0 FROM "
        "(SELECT UNNEST(?::DOUBLE[]) AS x)",
        [[r[0] for r in rows]],
    ).fetchone()[0]
    assert got == want
