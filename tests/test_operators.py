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


def test_asof_join_semantics(spark):
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:05:00"),
         (2, "2024-01-01 09:00:00")],
        ["k", "ts_s"],
    ).select("k", F.col("ts_s").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:59:00", 10.0), (1, "2024-01-01 10:05:00", 20.0),
         (2, "2024-01-01 12:00:00", 99.0)],
        ["k", "ts_s", "v"],
    ).select("k", F.col("ts_s").cast("timestamp").alias("rts"), "v")
    out = {
        (r.k, str(r.lts)): r.v
        for r in asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    }
    assert out[(1, "2024-01-01 10:00:00")] == 10.0   # strictly earlier match
    assert out[(1, "2024-01-01 10:05:00")] == 20.0   # equal ts is inclusive
    assert out[(2, "2024-01-01 09:00:00")] is None   # future rows never match


def test_asof_join_tolerance(spark):
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators import asof_join

    left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], ["k", "ts_s"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("lts")
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", 5.0)], ["k", "ts_s", "v"]
    ).select("k", F.col("ts_s").cast("timestamp").alias("rts"), "v")
    strict = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance_seconds=3600
    ).first()
    assert strict.v is None  # 2h-old match rejected by 1h tolerance
    loose = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance_seconds=7201
    ).first()
    assert loose.v == 5.0


def test_asof_join_subsecond_tolerance(spark):
    """Tolerance is enforced at microsecond precision: a match 0.5s past
    the tolerance must be rejected (unix_timestamp would truncate both
    sides to the same second and keep it)."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:02.600")], ["k", "ts_s"]
    ).select("k", F.col("ts_s").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00.000", 5.0)], ["k", "ts_s", "v"]
    ).select("k", F.col("ts_s").cast("timestamp").alias("rts"), "v")
    # gap is 2.6s: a 2s tolerance must reject (second-truncation keeps it)
    out = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance_seconds=2
    ).first()
    assert out.v is None
    ok = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance_seconds=3
    ).first()
    assert ok.v == 5.0
    # fractional tolerances must not truncate to 0 seconds: 2.7s accepts
    # the 2.6s gap, 2.5s rejects it
    frac_ok = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance_seconds=2.7
    ).first()
    assert frac_ok.v == 5.0
    frac_no = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance_seconds=2.5
    ).first()
    assert frac_no.v is None


def test_asof_join_rejects_colliding_value_cols(spark):
    import pytest
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators import asof_join

    left = spark.createDataFrame([(1, "2024-01-01 10:00:00", 1.0)], ["k", "ts_s", "v"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("lts"), "v"
    )
    right = spark.createDataFrame([(1, "2024-01-01 09:00:00", 5.0)], ["k", "ts_s", "v"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("rts"), "v"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "lts", "rts", ["v"])


def test_interval_join_boundaries(spark):
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators import interval_join

    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:10:00")], ["k", "lid", "ts_s"]
    ).select("k", "lid", F.col("ts_s").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, 200, "2024-01-01 10:00:00"),   # 600s before → in (gap=600)
         (1, 201, "2024-01-01 09:59:59"),   # 601s before → out
         (1, 202, "2024-01-01 10:10:00"),   # same instant → in
         (1, 203, "2024-01-01 10:11:00")],  # after left → out (forward)
        ["k", "rid", "ts_s"],
    ).select("k", "rid", F.col("ts_s").cast("timestamp").alias("rts"))
    out = {
        r.rid
        for r in interval_join(
            left, right, ["k"], "lts", "rts", max_gap_seconds=600
        ).collect()
    }
    assert out == {200, 202}


def test_hll_partition_sketches_merge_to_global_estimate(spark, sf_dir):
    """Per-partition HLL sketches merged later must estimate the global
    distinct count within HLL error, and slicing must compose: the
    union of per-priority sketches equals a directly-built global
    sketch's estimate."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators.sketches import (
        merge_sketches,
        partition_sketches,
    )
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    per_prio = partition_sketches(orders, ["o_orderpriority"], "o_custkey")
    assert per_prio.columns == ["o_orderpriority", "hll_sketch", "n_rows"]
    # merging the per-partition sketches ~= true global distinct
    est = merge_sketches(per_prio).first()
    truth = orders.agg(F.count_distinct("o_custkey")).first()[0]
    assert est["n_rows"] == orders.count()
    assert abs(est["distinct_estimate"] - truth) / truth < 0.05
    # per-group estimates also hold per slice
    per = {
        r["o_orderpriority"]: r["distinct_estimate"]
        for r in merge_sketches(per_prio, ["o_orderpriority"]).collect()
    }
    for prio, e in per.items():
        t = (
            orders.filter(F.col("o_orderpriority") == prio)
            .agg(F.count_distinct("o_custkey"))
            .first()[0]
        )
        assert abs(e - t) / t < 0.05
