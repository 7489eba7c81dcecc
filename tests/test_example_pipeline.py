"""The example pipeline IS the reference smoke DAG
(airflow/dags/imdb_smoke_pipeline.py:10-35: ge_validate >> dbt_run >>
dbt_test): it must run green end-to-end on clean data and HALT when an
expectation is violated, like a failed Airflow task gating downstream
stages."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

from run_imdb_pipeline import dbt_test, ge_validate, main  # noqa: E402


def test_example_runs_end_to_end(tmp_path, spark, capsys):
    main(str(tmp_path))
    out = capsys.readouterr().out
    assert "ge_validate: PASSED" in out
    assert "dbt_test: PASSED" in out
    # every model in the DAG materialized
    for model in ("marts_movie_facts_view", "marts_top_movies_by_genre",
                  "marts_episode_season_trends", "movie_facts_anl",
                  "episode_facts_anl", "series_season_summary_anl"):
        assert f"model {model}:" in out


def _facts(spark, tconst_col, rating=7.5):
    movies = spark.range(20).select(
        tconst_col.alias("tconst"),
        F.lit("Drama").alias("genre"),
        F.lit(rating).alias("averageRating"),
        F.lit(100).alias("numVotes"),
        F.lit(90).alias("runtimeMinutes"),
    )
    episodes = movies.withColumn("seasonNumber", F.lit(1)).withColumn(
        "episodeNumber", F.lit(1)
    )
    return movies, episodes


def test_gate_halts_on_out_of_range_ratings(spark):
    # every rating out of [0,10] → mostly=0.995 cannot hold
    movies, episodes = _facts(
        spark, F.concat(F.lit("tt"), F.col("id")), rating=99.0
    )
    with pytest.raises(AssertionError, match="between\\[averageRating"):
        ge_validate(movies, episodes)


def test_gate_halts_on_duplicate_keys(spark):
    # all rows share (tconst, genre) → grain violated
    movies, episodes = _facts(spark, F.lit("tt0000001"))
    with pytest.raises(AssertionError, match="unique\\[tconst,genre"):
        ge_validate(movies, episodes)


def test_dbt_test_halts_on_null_model_column(spark):
    bad_view = spark.range(5).select(
        F.lit(None).cast("string").alias("tconst"),
        F.lit(7.5).alias("averageRating"),
    )
    trends = spark.range(5).select(F.lit(1).alias("seasonNumber"))
    with pytest.raises(AssertionError, match="not_null\\[tconst"):
        dbt_test({"marts_movie_facts_view": bad_view,
                  "marts_episode_season_trends": trends})


def test_corpus_pipeline_end_to_end(tmp_path, spark):
    """The corpus-build example: quality gates, redaction, dedup,
    decontamination, splits, mixture, packing, partitioned write,
    expectation gate — all in one run, with invariants checked on
    the built lake."""
    from run_corpus_pipeline import build_corpus

    out = str(tmp_path / "corpus")
    stats = build_corpus(spark, "/root/testdata/sf0.001", out)
    assert stats["built_docs"] <= stats["raw_docs"]
    assert set(stats["splits"]) <= {"train", "val", "test"}
    assert stats["train_bins"] >= 1

    built = spark.read.parquet(out)
    # split is recoverable from doc_id -> no doc may sit in two splits
    assert built.select("doc_id").distinct().count() == built.count()
    # every train doc landed in a bin; non-train docs have no bin
    from pyspark.sql import functions as F

    assert built.filter(
        (F.col("split") == "train") & F.col("bin_id").isNull()
    ).count() == 0
    assert built.filter(
        (F.col("split") != "train") & F.col("bin_id").isNotNull()
    ).count() == 0
    # bins obey the starting-offset rule exactly: recompute the running
    # token offset in doc_id order and check bin = floor(start / budget)
    from run_corpus_pipeline import PACK_BUDGET

    train_rows = (
        built.filter(F.col("bin_id").isNotNull())
        .withColumn("n_tokens", F.size(F.split(F.col("clean_text"), r"\s+")))
        .select("doc_id", "n_tokens", "bin_id")
        .orderBy("doc_id")
        .collect()
    )
    offset = 0
    for r in train_rows:
        assert r.bin_id == offset // PACK_BUDGET, r
        offset += r.n_tokens


def test_corpus_pipeline_lm_filter_and_shuffle(tmp_path, spark):
    """Round-4 stages: the perplexity-tail gate drops documents (but
    never all), and the built lake carries a deterministic
    (shard, pos) training order — per-shard ranks are dense from 1."""
    from pyspark.sql import functions as F

    from run_corpus_pipeline import build_corpus

    out = str(tmp_path / "corpus_lm")
    build_corpus(spark, "/root/testdata/sf0.001", out)
    built = spark.read.parquet(out)
    assert {"shard", "pos"} <= set(built.columns)
    per_shard = {
        r.shard: r.n
        for r in built.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_shard) <= {0, 1, 2, 3} and len(per_shard) >= 2
    maxpos = {
        r.shard: r.m
        for r in built.groupBy("shard").agg(F.max("pos").alias("m")).collect()
    }
    assert maxpos == per_shard  # dense 1..n ranks per shard


def test_ingest_example_runs_end_to_end(tmp_path, spark):
    """Day-2 ingest composition (examples/run_ingest_pipeline.py):
    quota admission caps every source, the incremental index drops the
    planted re-crawls (even-id pages already in yesterday's corpus),
    and only genuinely new pages land."""
    from run_ingest_pipeline import main as ingest_main

    report = ingest_main(str(tmp_path / "work"), spark=spark)
    assert report["admitted"] == report["matched_recrawls"] + report["landed"]
    assert report["matched_recrawls"] > 0      # re-crawls were caught
    assert report["landed"] > 0                # new pages got through
    assert report["sources"] >= 2


def test_retrieval_pipeline_example(spark, sf_dir, tmp_path):
    """examples/run_retrieval_pipeline.py composes: artifact build →
    BM25 → hard negatives → hybrid fusion → streaming serve; the
    streamed result count equals the batch BM25 count (same query
    set, same k) and negatives never contain their gold."""
    from run_retrieval_pipeline import run_retrieval

    stats = run_retrieval(spark, sf_dir, str(tmp_path))
    assert stats["corpus_docs"] > 0 and stats["corpus_tokens"] > 0
    assert stats["bm25_results"] > 0
    assert stats["stream_served"] == stats["bm25_results"]
    assert stats["hard_negatives"] > 0 and stats["hybrid_results"] > 0
    pairs = spark.read.parquet(str(tmp_path / "contrastive_pairs"))
    assert pairs.filter("gold_doc_id = negative_doc_id").count() == 0


def test_quality_pipeline_example(spark, sf_dir):
    """examples/run_quality_pipeline.py composes: perceptual dedup →
    classifier gate → DSIR reweighting → importance sample; the
    canonical set shrinks, the gate keeps the clean docs, the sample
    is exactly k, and the target-class share does not decrease."""
    from run_quality_pipeline import run_quality

    out = run_quality(spark, sf_dir, k=40)
    assert 0 < out["n_canonical"] <= out["n_docs"]
    assert 0 < out["n_kept"] <= out["n_canonical"]
    assert out["n_sampled"] == min(40, out["n_kept"])
    assert out["target_share_sample"] >= out["target_share_pool"] - 1e-9
