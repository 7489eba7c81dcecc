"""End-to-end IMDb pipeline: the reference's whole DAG in one process.

    ingest (change-detected TSV) → ETL (movies/episodes/seasons/DQ)
    → partitioned lake (idempotent) → catalog
    → ge_validate (expectation gate)  → dbt_run (model layer)
    → dbt_test (model-output tests)   → analyst queries

The three gate stages mirror the reference's smoke DAG
(airflow/dags/imdb_smoke_pipeline.py:10-35: ge_validate >> dbt_run >>
dbt_test); the expectations are the reference's own
(tests/ge_validate_athena.py:38-72, imdb_analytics/models/schema.yml)
plus an `expect_unique` key check. Any violated expectation raises and
halts the pipeline — the downstream stages never run, exactly like a
failed Airflow task.

Run: python examples/run_imdb_pipeline.py [workdir]
Uses synthetic fixture data (tests/imdb_fixtures.py) as the "remote";
swap ``fetcher`` for an HTTP client to ingest the real IMDb dumps.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark import get_spark
from aws_imdb_data_pipeline_spark.lifecycle import register_lake_table
from aws_imdb_data_pipeline_spark.lifecycle.ingest import ingest_datasets, latest_slice
from aws_imdb_data_pipeline_spark.pipelines import ImdbRaw, run_etl
from aws_imdb_data_pipeline_spark.pipelines.models import top_genres, top_movies_by_genre
from aws_imdb_data_pipeline_spark.pipelines.sql_models import run_models
from aws_imdb_data_pipeline_spark.quality import (
    expect_min_rows,
    expect_not_null,
    expect_unique,
    expect_values_between,
    validate,
)
from aws_imdb_data_pipeline_spark.pipelines.imdb import RAW_TABLES


def ge_validate(movies, episodes) -> None:
    """Stage 3a — the reference's Great Expectations gate
    (tests/ge_validate_athena.py:38-72) on the freshly built facts.
    Raises AssertionError listing every failed expectation.

    The unique key is the fact grain — (tconst, genre), one row per
    movie per exploded genre (glue.py:122-192). The episode range
    checks run on the regular-season slice: the reference validates a
    ``WHERE seasonNumber = '1'`` sample, which structurally excludes
    the specials the ETL lands as season -1 (glue quirk #7), so the
    faithful mirror excludes them too."""
    regular = episodes.filter(F.col("seasonNumber") != -1)
    validate(
        [
            expect_min_rows(movies, 1),
            expect_not_null(movies, "tconst"),
            expect_unique(movies, ["tconst", "genre"]),
            expect_values_between(movies, "averageRating", 0, 10, mostly=0.995),
            expect_values_between(movies, "numVotes", 0, None),
            expect_values_between(movies, "runtimeMinutes", 1, None, mostly=0.98),
            expect_min_rows(episodes, 1),
            expect_not_null(episodes, "tconst"),
            expect_values_between(regular, "averageRating", 0, 10, mostly=0.99),
            expect_values_between(regular, "seasonNumber", 1, None, mostly=0.99),
            expect_values_between(regular, "episodeNumber", 1, None, mostly=0.99),
        ]
    )


def dbt_test(models) -> None:
    """Stage 3c — the reference's dbt schema tests
    (imdb_analytics/models/schema.yml: not_null columns) run against
    the materialized model outputs."""
    validate(
        [
            expect_not_null(models["marts_movie_facts_view"], "tconst"),
            expect_not_null(models["marts_movie_facts_view"], "averageRating"),
            expect_not_null(models["marts_episode_season_trends"], "seasonNumber"),
        ]
    )


def main(workdir: str) -> None:
    spark = get_spark("imdb-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    run_date = "20240115"

    # --- 1. ingest: synthetic fixtures as the "remote" ---------------
    from imdb_fixtures import build_raw

    fixture = build_raw(spark)

    def fetcher(name):
        pdf = getattr(fixture, name).toPandas()
        tsv = pdf.to_csv(sep="\t", index=False, na_rep=r"\N").encode()
        data = gzip.compress(tsv)
        return {"etag": f"{name}-v1", "content_length": len(data)}, lambda: iter([data])

    raw_root = os.path.join(workdir, "raw")
    result = ingest_datasets(list(RAW_TABLES), fetcher, raw_root, run_date)
    print("ingest:", result.statuses)

    # --- 2. ETL over the ingested TSVs -------------------------------
    raw = ImdbRaw(
        **{
            name: __import__(
                "aws_imdb_data_pipeline_spark.sources.tsv", fromlist=["read_imdb_tsv"]
            ).read_imdb_tsv(spark, latest_slice(raw_root, name))
            for name in RAW_TABLES
        }
    )
    lake = os.path.join(workdir, "processed")
    outputs = run_etl(raw, run_date, out_root=lake)
    for name, df in outputs.items():
        print(f"  {name}: {df.count()} rows")

    # --- 3a. catalog + ge_validate gate ------------------------------
    movies = register_lake_table(
        spark, "analytics_movie_facts", os.path.join(lake, "analytics_movie_facts")
    )
    episodes = register_lake_table(
        spark, "analytics_episode_facts", os.path.join(lake, "analytics_episode_facts")
    )
    register_lake_table(
        spark, "series_season_summary", os.path.join(lake, "series_season_summary")
    )
    ge_validate(movies, episodes)
    print("ge_validate: PASSED")

    # --- 3b. dbt_run: the full model DAG as temp views ---------------
    models = run_models(spark)
    for name, df in models.items():
        print(f"  model {name}: {df.count()} rows")

    # --- 3c. dbt_test: schema tests on the model outputs -------------
    dbt_test(models)
    print("dbt_test: PASSED")

    # --- 4. analyst queries ------------------------------------------
    top_movies_by_genre(models["marts_movie_facts_view"], n=5).show(truncate=False)
    top_genres(movies).show(truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="imdb_lake_"))
