"""Property tests for the second extensions batch (SCD2, exact
stratified sampling, top terms, BPE merges). Value parity vs DuckDB is
covered by tests/test_parity.py's registry-wide sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.plans import REGISTRY


def test_scd2_intervals_partition_history(spark, sf_dir):
    hist = REGISTRY["scd2_user_event_type"].fn(spark, sf_dir).cache()
    # exactly one open (current) row per user
    per_user = hist.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("version").alias("max_v"),
    )
    bad = per_user.filter(
        (F.col("n_current") != 1) | (F.col("max_v") != F.col("n_rows"))
    )
    assert bad.count() == 0
    # intervals chain: each row's effective_to equals the next row's
    # effective_from (no gaps, no overlaps)
    nxt = hist.select(
        "user_id",
        F.col("version").alias("v"),
        F.col("effective_from").alias("nxt_from"),
    )
    chained = hist.join(
        nxt,
        (hist.user_id == nxt.user_id) & (hist.version + 1 == nxt.v),
        "inner",
    )
    assert chained.filter(F.col("effective_to") != F.col("nxt_from")).count() == 0
    # compression: consecutive versions never repeat the attribute
    same = hist.select(
        "user_id", F.col("version").alias("v"), F.col("event_type").alias("t2")
    )
    adj = hist.join(
        same, (hist.user_id == same.user_id) & (hist.version + 1 == same.v)
    )
    assert adj.filter(F.col("event_type") == F.col("t2")).count() == 0
    hist.unpersist()


def test_stratified_sample_exact_counts(spark, sf_dir):
    from aws_imdb_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sampled = REGISTRY["corpus_stratified_sample"].fn(spark, sf_dir)
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    want = {r["lang"]: min(40, r["n"]) for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    # deterministic: a second draw returns the identical id set
    again = set(
        r["doc_id"]
        for r in REGISTRY["corpus_stratified_sample"].fn(spark, sf_dir)
        .select("doc_id").collect()
    )
    assert again == {r["doc_id"] for r in sampled.select("doc_id").collect()}


def test_top_terms_rank_contract(spark, sf_dir):
    terms = REGISTRY["doc_top_terms"].fn(spark, sf_dir).cache()
    # <= 3 rows per doc, and tf is non-increasing within a doc
    sizes = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert sizes.filter(F.col("n") > 3).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), "word")
    mono = terms.withColumn("prev_tf", F.lag("tf").over(w)).filter(
        F.col("prev_tf").isNotNull() & (F.col("tf") > F.col("prev_tf"))
    )
    assert mono.count() == 0
    terms.unpersist()


def test_bpe_pairs_are_bigrams(spark, sf_dir):
    pairs = REGISTRY["bpe_merge_pairs"].fn(spark, sf_dir).collect()
    assert len(pairs) == 20
    assert all(len(r["pair"]) == 2 and r["pair"].isalpha() for r in pairs)
    counts = [r["pair_count"] for r in pairs]
    assert counts == sorted(counts, reverse=True)
