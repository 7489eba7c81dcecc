"""Bitmap partials (operators.sketches.bitmap_partials/bitmap_distinct):
exactness vs count_distinct, OR-merge identity across disjoint ingest
slices, NULL handling, and the bounded per-page size that makes the
partial table a KB-scale side artifact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.sketches import (
    bitmap_distinct,
    bitmap_partials,
)


def _events(spark, n=4000):
    # user = id*id % 997 → collisions, includes 0; slice = id % 4
    return spark.range(n).select(
        ((F.col("id") * F.col("id")) % 997).alias("user"),
        (F.col("id") % 4).alias("slice"),
        (F.col("id") % 3).alias("grp"),
    )


def test_bitmap_distinct_is_exact(spark):
    df = _events(spark)
    got = bitmap_distinct(bitmap_partials(df, ["grp"], "user"), ["grp"])
    want = df.groupBy("grp").agg(
        F.count_distinct("user").alias("distinct_exact"),
        F.count("user").alias("n_rows"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bitmap_partials_merge_across_slices(spark):
    """Partials written per ingest slice OR-merge to the same answer as
    one full-scan build — the mergeability contract."""
    df = _events(spark)
    whole = bitmap_distinct(bitmap_partials(df, ["grp"], "user"), ["grp"])
    per_slice = bitmap_partials(df, ["grp", "slice"], "user")
    merged = bitmap_distinct(per_slice, ["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bitmap_ignores_nulls_like_count_distinct(spark):
    df = spark.range(100).select(
        F.when(F.col("id") % 5 != 0, F.col("id") % 17).alias("user"),
        F.lit(1).alias("grp"),
    )
    row = bitmap_distinct(bitmap_partials(df, ["grp"], "user"), ["grp"]).first()
    assert row.distinct_exact == 17
    assert row.n_rows == 80  # non-null values only


def test_bitmap_global_group(spark):
    df = _events(spark)
    row = bitmap_distinct(bitmap_partials(df, [], "user"), []).first()
    assert row.distinct_exact == df.select("user").distinct().count()


def test_bitmap_pages_are_bounded(spark):
    # values spanning several 32768-wide buckets: one ≤4 KB page each
    df = spark.range(100_000).select(
        (F.col("id") * 3).alias("user"), F.lit(1).alias("grp")
    )
    pages = bitmap_partials(df, ["grp"], "user")
    stats = pages.agg(
        F.max(F.length("bitmap")).alias("max_bytes"),
        F.count(F.lit(1)).alias("n_pages"),
    ).first()
    assert stats.max_bytes <= 4096
    # bitmap_bucket_number is 1-indexed (value 0 lands in its own
    # page), so a 0..299997 domain spans ceil-ish pages + 1
    assert stats.n_pages <= (100_000 * 3) // 32768 + 2
