"""Count-Min sketch (operators.sketches.cms_build/cms_estimate):
mergeability, the overestimate-only guarantee, and exactness when the
sketch is wide enough to avoid collisions."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)


def _skewed(spark, n=5000):
    # key = id % 100, so key k appears n/100 times; plus a hot key 7
    base = spark.range(n).select((F.col("id") % 100).alias("k"))
    hot = spark.range(n // 2).select(F.lit(7).alias("k"))
    return base.unionByName(hot)


def test_cms_merges_by_summing(spark):
    df = _skewed(spark)
    whole = cms_build(df, "k")
    left = cms_build(df.filter(F.col("k") < 50), "k")
    right = cms_build(df.filter(F.col("k") >= 50), "k")
    merged = (
        left.unionByName(right)
        .groupBy("depth", "bucket")
        .agg(F.sum("count").alias("count"))
    )
    got = {(r.depth, r.bucket): r["count"] for r in merged.collect()}
    want = {(r.depth, r.bucket): r["count"] for r in whole.collect()}
    assert got == want


def test_cms_never_underestimates(spark):
    df = _skewed(spark)
    sketch = cms_build(df, "k", depth=4, width=16)  # narrow → collisions
    truth = df.groupBy("k").agg(F.count(F.lit(1)).alias("t"))
    est = cms_estimate(sketch, truth.select("k"), "k", depth=4, width=16)
    joined = est.join(truth, "k")
    assert joined.filter(F.col("estimate") < F.col("t")).count() == 0
    # and the hot key is within the 2N/width bound at >=1 depth
    n_total = df.count()
    hot = joined.filter(F.col("k") == 7).collect()[0]
    assert hot.estimate - hot.t <= 2 * n_total / 16


def test_cms_exact_when_wide(spark):
    df = _skewed(spark, n=2000)
    sketch = cms_build(df, "k", depth=4, width=4096)
    truth = df.groupBy("k").agg(F.count(F.lit(1)).alias("t"))
    est = cms_estimate(sketch, truth.select("k"), "k", depth=4, width=4096)
    mism = est.join(truth, "k").filter(F.col("estimate") != F.col("t"))
    # 100 keys into 4096 buckets x 4 independent rows: a collision
    # surviving the min across all 4 depths is ~impossible
    assert mism.count() == 0


def test_cms_sketch_size_is_bounded(spark):
    big = spark.range(0, 200_000).select((F.col("id") % 997).alias("k"))
    sketch = cms_build(big, "k", depth=4, width=64)
    assert sketch.count() <= 4 * 64
