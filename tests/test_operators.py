"""Unit tests for the relational operator library."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators import (
    latest_run_filter,
    ordered_collect_concat,
    top_k_global,
    top_n_per_group,
)


def _people(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 30.0),
            ("a", 3, 20.0),
            ("b", 4, 5.0),
            ("b", 5, 5.0),
        ],
        ["grp", "id", "score"],
    )


def test_top_n_per_group_deterministic(spark):
    df = _people(spark)
    out = top_n_per_group(
        df, ["grp"], [F.desc("score"), F.col("id")], n=1
    ).collect()
    got = {(r.grp, r.id) for r in out}
    assert got == {("a", 2), ("b", 4)}  # tie in b broken by id


def test_top_n_keep_rank(spark):
    out = top_n_per_group(
        _people(spark), ["grp"], [F.desc("score"), F.col("id")], n=2, keep_rank=True
    )
    assert "rn" in out.columns
    assert out.filter("rn > 2").count() == 0


def test_top_k_global(spark):
    out = top_k_global(_people(spark), [F.desc("score"), F.col("id")], 2).collect()
    assert [r.id for r in out] == [2, 3]


def test_latest_run_filter(spark):
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-02-01", 2), ("2024-02-01", 3)], ["run_date", "v"]
    )
    out = latest_run_filter(df).collect()
    assert sorted(r.v for r in out) == [2, 3]


def test_ordered_collect_concat(spark):
    df = spark.createDataFrame(
        [("x", 2, "b"), ("x", 1, "a"), ("x", 3, "c"), ("y", 1, "z")],
        ["k", "o", "v"],
    )
    out = {
        r.k: r.joined
        for r in ordered_collect_concat(df, ["k"], "o", "v", "joined").collect()
    }
    assert out == {"x": "a, b, c", "y": "z"}


def test_salted_aggregate_matches_plain(spark):
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators.agg_patterns import salted_aggregate

    # skewed: key 'hot' holds 90% of rows
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i%10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    salted = {
        r.k: (round(r.sum_v, 6), r.n_rows)
        for r in salted_aggregate(df, ["k"], ["v"], salt_buckets=8).collect()
    }
    plain = {
        r.k: (round(r.sum_v, 6), r.n_rows)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert salted == plain
