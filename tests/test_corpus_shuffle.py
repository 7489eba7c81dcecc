"""seeded_shuffle: deterministic training-order shuffle — plan-stable
(unlike rand), shard-balanced, and free of any global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.extensions.corpus import seeded_shuffle


def _collect(df):
    return sorted((r.doc_id, r.shard, r.pos) for r in df.collect())


def test_seeded_shuffle_stable_under_repartition(spark):
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = _collect(seeded_shuffle(docs, "doc_id"))
    b = _collect(seeded_shuffle(docs.repartition(13), "doc_id"))
    c = _collect(seeded_shuffle(docs.coalesce(1), "doc_id"))
    assert a == b == c  # rand(seed) fails exactly this


def test_seeded_shuffle_is_a_permutation_and_balanced(spark):
    n, shards = 5000, 8
    docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
    out = seeded_shuffle(docs, "doc_id", n_shards=shards)
    rows = out.collect()
    assert len(rows) == n
    # per-shard positions are 1..len(shard) with no gaps
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(shards))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
        # affine-permutation sharding keeps shards within 20% of even
        assert abs(len(poss) - n / shards) < 0.2 * n / shards
    # the order is actually shuffled: the first 100 positions of shard 0
    # are not simply the 100 smallest doc_ids
    first = [d for d, s, p in sorted(((r.doc_id, r.shard, r.pos) for r in rows
             if r.shard == 0), key=lambda t: t[2])][:100]
    assert first != sorted(first)


def test_seeded_shuffle_seed_changes_order(spark):
    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = _collect(seeded_shuffle(docs, "doc_id", seed=1))
    b = _collect(seeded_shuffle(docs, "doc_id", seed=2))
    assert a != b


def test_seeded_shuffle_no_global_sort_in_plan(spark):
    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    plan = (
        seeded_shuffle(docs, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash exchange on shard for the per-shard window; never a
    # rangepartitioning (global sort) exchange
    assert "rangepartitioning" not in plan.lower()


def test_sqrt_temperature_mixture_balances_sources(spark):
    """T=2 mixing: smallest source kept ~fully, a 100x bigger source
    kept at ~sqrt(1/100)=10% of its rows, and the filter is
    deterministic (same result twice)."""
    import math

    from aws_imdb_data_pipeline_spark.extensions.corpus import (
        sqrt_temperature_mixture,
    )

    small = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("small").alias("source")
    )
    big = spark.range(0, 100_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"), F.lit("big").alias("source")
    )
    docs = small.unionByName(big)
    kept = sqrt_temperature_mixture(docs)
    counts = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] >= 990  # rate 1.0 (mod buckets may miss a hair)
    want_big = 100_000 * math.sqrt(1000 / 100_000)
    assert abs(counts["big"] - want_big) / want_big < 0.05
    again = {r.source: r.n for r in
             sqrt_temperature_mixture(docs).groupBy("source")
             .agg(F.count("*").alias("n")).collect()}
    assert again == counts
