"""Empty and degenerate inputs: every operator family must return an
empty (or correctly-shaped) result, never throw."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def test_empty_aggregation_and_windows(spark):
    empty = spark.createDataFrame(
        [], "l_returnflag string, l_quantity double, l_orderkey long"
    )
    agg = empty.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert agg.count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy("l_quantity")
    assert empty.withColumn("rn", F.row_number().over(w)).count() == 0


def test_global_agg_on_empty_is_one_row(spark):
    """A global (no-group) aggregate over empty input yields ONE row of
    NULLs/zeros — the SQL semantics the DQ profiler relies on."""
    from aws_imdb_data_pipeline_spark.quality import dq_profile

    empty = spark.createDataFrame([], "x double, k string")
    row = dq_profile(
        empty, "empty", null_cols=["k"], numeric_cols=["x"], distinct_cols=["k"],
        exact_distinct=True,
    ).first()
    assert row.row_count == 0
    assert row.null_k == 0 or row.null_k is None
    assert row.min_x is None and row.max_x is None


def test_minhash_on_empty_and_blank_docs(spark):
    from aws_imdb_data_pipeline_spark.extensions import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, "one two")], ["doc_id", "text"]
    )
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    # blank doc contributes nothing; identical short docs match
    assert {(r.id_a, r.id_b) for r in pairs} == {(2, 3)}

    none_docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_dedup_pairs(none_docs, "doc_id", "text").count() == 0


def test_cosine_topk_empty_queries(spark):
    from aws_imdb_data_pipeline_spark.extensions import cosine_topk

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    vecs = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    assert cosine_topk(empty, vecs, "vec_id", "embedding").count() == 0
    assert cosine_topk(vecs, empty, "vec_id", "embedding").count() == 0


def test_sessionize_empty_events(spark):
    from aws_imdb_data_pipeline_spark.streaming import sessionize

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    assert sessionize(empty).count() == 0


def test_topk_on_fewer_rows_than_k(spark):
    from aws_imdb_data_pipeline_spark.operators import top_k_global, top_n_per_group

    df = spark.createDataFrame([("a", 1)], ["g", "v"])
    assert top_k_global(df, [F.desc("v")], 10).count() == 1
    assert top_n_per_group(df, ["g"], [F.desc("v")], 10).count() == 1


def test_prefix_sum_exact_above_double_precision(spark):
    """Bucket assignment uses integer DIV: order keys above 2^53 (where
    doubles lose integer resolution) must still land in the right range
    bucket and produce the exact running sum."""
    from aws_imdb_data_pipeline_spark.extensions.corpus import prefix_sum

    base = 1 << 54
    rows = [(base + i, 1) for i in range(64)]
    df = spark.createDataFrame(rows, "ord long, v int")
    out = {r.ord: r.cumsum for r in
           prefix_sum(df, "ord", "v", out_col="cumsum", n_buckets=8).collect()}
    assert out == {base + i: i + 1 for i in range(64)}
