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
