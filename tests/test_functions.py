"""Unit tests for the scalar-function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.functions import (
    banding,
    coalesce_bool_as_int,
    decade,
    decade_label,
    null_sentinel_cast,
    try_cast,
    year_span,
    zero_pad,
)


def test_null_sentinel_cast(spark):
    df = spark.createDataFrame(
        [("1994",), (r"\N",), ("",), ("   ",), (None,), ("x",)], ["y"]
    )
    out = df.select(null_sentinel_cast("y", "int").alias("v")).collect()
    assert [r.v for r in out] == [1994, None, None, None, None, None]


def test_try_cast_tolerant(spark):
    df = spark.createDataFrame([("12",), ("nope",), (None,)], ["x"])
    out = df.select(try_cast("x", "int").alias("v")).collect()
    assert [r.v for r in out] == [12, None, None]


def test_coalesce_bool_as_int(spark):
    df = spark.createDataFrame([("3",), ("true",), ("FALSE",), ("meh",)], ["x"])
    out = df.select(coalesce_bool_as_int("x").alias("v")).collect()
    assert [r.v for r in out] == [3, 1, 0, None]


def test_banding(spark):
    df = spark.createDataFrame([(95.0,), (55.0,), (10.0,), (None,)], ["score"])
    col = banding("score", [90.0, 50.0], ["high", "mid", "low"], null_label="n/a")
    out = df.select(col.alias("band")).collect()
    assert [r.band for r in out] == ["high", "mid", "low", "n/a"]


def test_decade_and_label(spark):
    df = spark.createDataFrame([(1994,), (2001,)], ["y"])
    out = df.select(
        decade("y").alias("d"), decade_label(decade("y")).alias("l")
    ).collect()
    assert [(r.d, r.l) for r in out] == [(1990, "1990s"), (2000, "2000s")]


def test_year_span_and_zero_pad(spark):
    df = spark.createDataFrame([("1990", "2005", 7)], ["a", "b", "s"])
    row = df.select(
        year_span("a", "b").alias("span"), zero_pad("s").alias("z")
    ).first()
    assert row.span == 15 and row.z == "07"
