"""Quality module: DQ profiles and mostly-threshold expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.quality import (
    dq_profile,
    dq_union,
    expect_min_rows,
    expect_not_null,
    expect_unique,
    expect_values_between,
    validate,
)


def test_dq_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 7.0), (3, r"\N", None), (4, "  ", 1.0)],
        ["id", "s", "x"],
    )
    row = dq_profile(
        df, "t", null_cols=["s", "x"], numeric_cols=["x"], distinct_cols=["id"],
        exact_distinct=True, run_date="20240101",
    ).first()
    assert row.dataset == "t" and row.row_count == 4
    assert row.null_s == 3  # None, \N sentinel, blank
    assert row.null_x == 1
    assert row.min_x == 1.0 and row.max_x == 7.0
    assert row.distinct_id == 4 and row.run_date == "20240101"


def test_dq_profile_approx_close_to_exact(spark, sf_dir):
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    approx = dq_profile(orders, "o", distinct_cols=["o_custkey"]).first()
    exact = dq_profile(
        orders, "o", distinct_cols=["o_custkey"], exact_distinct=True
    ).first()
    assert abs(approx.distinct_o_custkey - exact.distinct_o_custkey) <= (
        0.05 * exact.distinct_o_custkey
    )


def test_dq_union_missing_cols(spark):
    a = spark.createDataFrame([(1,)], ["x"]).agg(F.count("*").alias("row_count"))
    a = a.withColumn("only_a", F.lit(1))
    b = spark.createDataFrame([(1,)], ["x"]).agg(F.count("*").alias("row_count"))
    out = dq_union([a, b])
    assert out.count() == 2
    assert out.filter(F.col("only_a").isNull()).count() == 1


def test_expectations_mostly(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    ok = expect_values_between(df, "v", lo=0, hi=98, mostly=0.98)
    assert ok.success and ok.violations == 1
    bad = expect_values_between(df, "v", lo=0, hi=50, mostly=0.98)
    assert not bad.success


def test_expect_not_null_and_unique(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], ["k"])
    assert not expect_not_null(df, "k").success
    assert expect_not_null(df, "k", mostly=0.7).success
    uniq = expect_unique(df, ["k"])
    assert not uniq.success and uniq.violations == 1


def test_validate_gate_raises(spark):
    df = spark.createDataFrame([(None,)], "k: int")
    with pytest.raises(AssertionError, match="not_null"):
        validate([expect_not_null(df, "k")])
    validate([expect_min_rows(df, 1)])  # passes silently


def test_approx_percentile_brackets_exact(spark, sf_dir):
    """The approx-percentile query emits its accuracy contract as
    booleans (each sketch percentile inside the exact +/-0.02 rank
    band); every group must report both bands satisfied."""
    from aws_imdb_data_pipeline_spark.plans import REGISTRY

    exact_groups = {
        r.o_orderpriority
        for r in REGISTRY["price_percentiles"].fn(spark, sf_dir).collect()
    }
    rows = REGISTRY["price_percentiles_approx"].fn(spark, sf_dir).collect()
    assert {r.o_orderpriority for r in rows} == exact_groups
    for r in rows:
        assert r.p50_in_band is True and r.p90_in_band is True, r


def test_observed_metrics_ride_the_write(spark, sf_dir, tmp_path):
    """attach_metrics: counters materialize as a side effect of the
    one write action — no separate aggregate job — and match an
    explicit recount."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.quality.observe import (
        attach_metrics,
        standard_metrics,
    )
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "maybe_null", F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(1)
    )
    observed, obs = attach_metrics(
        orders, standard_metrics(orders, ["maybe_null"])
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "observed_out"))
    got = obs.get
    assert got["n_rows"] == orders.count()
    assert got["n_null_maybe_null"] == orders.filter(
        F.col("maybe_null").isNull()
    ).count()


def test_observed_metrics_streaming_progress(spark, sf_dir, tmp_path):
    """The same observe call surfaces per-batch metrics in streaming
    query progress — counters for every micro-batch, no extra pass."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.quality.observe import attach_metrics
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    src = str(tmp_path / "obs_stream")
    ev.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    observed, _ = attach_metrics(
        stream, {"n_rows": F.count(F.lit(1)), "sum_value": F.sum("value")}
    )
    q = (
        observed.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    batches = [p for p in q.recentProgress if p["observedMetrics"]]
    assert batches, "no observed metrics in any micro-batch"
    total = sum(p["observedMetrics"]["metrics"]["n_rows"] for p in batches)
    assert total == ev.count()


def test_union_approx_profile_exact_in_categorical_regime(spark, sf_dir):
    """The dq_profile_union_approx ORACLE (round 10) rests on a claim:
    every profiled distinct column is a tiny-cardinality categorical
    where HLL++'s linear-counting estimate equals the true count
    exactly. Pin that claim in-repo so a changed rsd, a swapped
    profile column, or a cardinality-grown fixture fails HERE before
    the external driver sees a hash mismatch."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    cases = [
        ("orders", ["o_orderpriority", "o_orderstatus"]),
        ("lineitem", ["l_returnflag"]),
        ("customer", ["c_mktsegment"]),
    ]
    for table, cols in cases:
        df = load_table(spark, sf_dir, table)
        row = df.agg(
            *[F.approx_count_distinct(c).alias(f"a_{c}") for c in cols],
            *[F.count_distinct(c).alias(f"e_{c}") for c in cols],
        ).collect()[0]
        for c in cols:
            assert row[f"a_{c}"] == row[f"e_{c}"], (
                f"{table}.{c}: approx {row[f'a_{c}']} != exact "
                f"{row[f'e_{c}']} — the column left HLL++'s exact "
                f"regime; move dq_profile_union_approx's oracle to the "
                f"tolerance form (see its docstring)"
            )
            assert row[f"e_{c}"] <= 16, (
                f"{table}.{c}: cardinality {row[f'e_{c}']} is no longer "
                f"tiny-categorical — re-justify the exactness claim"
            )
