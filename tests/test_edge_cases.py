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
        [(1, ""), (2, "one two"), (3, "one two"), (4, "one two three x"),
         (5, "one two three x")],
        ["doc_id", "text"],
    )
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    # blank doc contributes nothing; sub-k docs (2 words < k=3) emit NO
    # shingles and never pair (standard w-shingling — the round-10
    # advice fix: the old partial gram paired (2, 3) in the engine but
    # not in the full-k-gram oracle); identical >=k-word docs match
    assert {(r.id_a, r.id_b) for r in pairs} == {(4, 5)}

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


def test_remove_repeated_lines_empty_and_single_doc(spark):
    """Degenerate corpora: an empty frame yields an empty frame; a
    single document can never cross a min_docs=2 threshold, so its
    text survives untouched — in both exact and hashed-key modes."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        remove_repeated_lines,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema)
    for hashed in (False, True):
        assert remove_repeated_lines(
            empty, "doc_id", "text", key_on_hash=hashed
        ).count() == 0
    one = spark.createDataFrame([(1, "a\nb\na")], schema)
    for hashed in (False, True):
        got = remove_repeated_lines(
            one, "doc_id", "text", key_on_hash=hashed
        ).collect()
        assert got[0].text == "a\nb\na"


def test_per_source_cap_smaller_groups_untouched(spark):
    """A source with fewer docs than the cap keeps everything; caps
    never invent rows."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group

    df = spark.createDataFrame(
        [("a", i) for i in range(3)] + [("b", i) for i in range(20)],
        ["source", "doc_id"],
    )
    kept = top_n_per_group(
        df, partition_by=["source"], order_by=[F.col("doc_id")], n=5
    )
    counts = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    assert counts == {"a": 3, "b": 5}


def test_cell_hash_ranks_is_a_permutation_per_cell(spark):
    """Within every cell the hash rank is exactly 1..n — no gaps, no
    duplicates — so any cap selects exactly min(cap, n) rows."""
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.extensions.similarity import (
        cell_hash_ranks,
    )

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], ["vec_id", "__list"]
    )
    ranked = cell_hash_ranks(df, "vec_id", seed=7)
    per_cell = (
        ranked.groupBy("__list")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("__rn").alias("nd"),
            F.min("__rn").alias("lo"),
            F.max("__rn").alias("hi"),
        )
        .collect()
    )
    for r in per_cell:
        assert (r.n, r.nd, r.lo, r.hi) == (10, 10, 1, 10)


def test_truncated_prefix_pairs_ignore_short_keys(spark):
    """Documents whose text is shorter than the 40-char bucket key are
    excluded from the SHORT side by contract (both engines filter the
    same way), and equal-length identical texts are NOT prefix pairs
    (strict length)."""
    from pyspark.sql import functions as F

    long_a = " ".join(["alpha"] * 20)            # 119 chars
    df = spark.createDataFrame(
        [(1, "tiny text"), (2, "tiny text"), (3, long_a), (4, long_a + " tail")],
        ["doc_id", "text"],
    )
    short = df.select(
        F.col("doc_id").alias("short_id"), F.col("text").alias("__st")
    ).filter(F.length("__st") >= 40)
    long = df.select(
        F.col("doc_id").alias("long_id"), F.col("text").alias("__lt")
    )
    pairs = (
        short.withColumn("__k", F.substring("__st", 1, 40))
        .join(long.withColumn("__k", F.substring("__lt", 1, 40)), "__k")
        .filter(
            (F.length("__st") < F.length("__lt"))
            & F.col("__lt").startswith(F.col("__st"))
        )
        .select("short_id", "long_id")
        .collect()
    )
    assert {(r.short_id, r.long_id) for r in pairs} == {(3, 4)}
