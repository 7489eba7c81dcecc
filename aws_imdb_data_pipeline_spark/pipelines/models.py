"""The reference's SQL model layer (dbt models + ad-hoc analyst
queries) re-expressed as Spark transforms over the fact tables.

dbt models (imdb_analytics/models/*.sql, airflow/dags/dbt/models/
marts/*.sql) become functions over DataFrames; "materialization" is
the caller's choice (createOrReplaceTempView vs saveAsTable).
Dialect translations per SURVEY §7 build plan step 6:
``$path``-regex latest-run → native partition-column max filter;
``REGEXP_SUBSTR`` → regexp_extract; ``IFF`` → when; ``TO_CHAR || 's'``
→ concat; ``::NUMBER`` → cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.functions.cleaning import banding
from aws_imdb_data_pipeline_spark.functions.derive import decade_label, zero_pad
from aws_imdb_data_pipeline_spark.operators.latest import latest_run_filter
from aws_imdb_data_pipeline_spark.operators.topk import top_k_global, top_n_per_group


def movie_facts_view(movie_facts: DataFrame) -> DataFrame:
    """marts_movie_facts_view.sql:1-19 — latest run only, drop rows
    with NULL rating/votes (the layer that tightens quirk #3)."""
    return latest_run_filter(movie_facts).filter(
        F.col("averageRating").isNotNull() & F.col("numVotes").isNotNull()
    )


def top_movies_by_genre(movie_view: DataFrame, n: int = 25) -> DataFrame:
    """marts_top_movies_by_genre.sql:3-19 — top-n per (genre, decade)
    by rating desc, votes desc, among titles with >= 1000 votes."""
    eligible = movie_view.filter(F.col("numVotes") >= 1000)
    return top_n_per_group(
        eligible,
        partition_by=["genre", "decade"],
        order_by=[F.desc("averageRating"), F.desc("numVotes"), F.col("tconst")],
        n=n,
        keep_rank=True,
    )


def episode_season_trends(episode_facts: DataFrame) -> DataFrame:
    """marts_episode_season_trends.sql:3-37 — latest run, non-null
    rating/season, avg rating + votes per series-season."""
    latest = latest_run_filter(episode_facts)
    clean = latest.filter(
        F.col("averageRating").isNotNull() & (F.col("seasonNumber") >= 0)
    )
    return clean.groupBy(
        "seriesId", "seriesTitle", "series_decade", "seasonNumber"
    ).agg(
        F.avg("averageRating").alias("avg_rating"),
        F.sum("numVotes").alias("total_votes"),
        F.count(F.lit(1)).alias("episodes"),
    )


def movie_facts_anl(movie_facts: DataFrame) -> DataFrame:
    """movie_facts_anl.sql:10-40 — typed projection + VOTE_BUCKET /
    RATING_BAND CASE banding + decade label."""
    return movie_facts.select(
        "tconst",
        "primaryTitle",
        "genre",
        "decade",
        F.col("averageRating").cast("double").alias("rating"),
        F.col("numVotes").cast("int").alias("votes"),
        banding(
            F.col("numVotes").cast("int"),
            [50000, 10000, 1000],
            ["50k+", "10k-49k", "1k-9k", "<1k"],
        ).alias("vote_bucket"),
        banding(
            F.col("averageRating").cast("double"),
            [8.0, 6.0],
            ["Excellent", "Good", "Mixed"],
            null_label="Unrated",
        ).alias("rating_band"),
        decade_label("decade").alias("decade_label"),
        "run_date",
    )


def episode_facts_anl(episode_facts: DataFrame) -> DataFrame:
    """episode_facts_anl.sql:1-20 — typed rename projection over
    EPISODE_FACTS: TCONST→episode_key, SERIESID→series_key,
    AVERAGERATING→avg_rating, NUMVOTES→num_votes, RUN_DATE_DT→run_date
    (the date-typed run column), pass-through flags and season fields."""
    return episode_facts.select(
        F.col("tconst").alias("episode_key"),
        F.col("seriesId").alias("series_key"),
        "seriesTitle",
        "seriesStartYear",
        "series_decade",
        "seasonNumber",
        "episodeNumber",
        "episodeTitle",
        "episodeYear",
        F.col("averageRating").alias("avg_rating"),
        F.col("numVotes").alias("num_votes"),
        "isPilot",
        "isFinale",
        "isSpecial",
        F.col("run_date_dt").alias("run_date"),
    )


def series_season_summary_anl(season_summary: DataFrame) -> DataFrame:
    """series_season_summary_anl.sql:13 — zero-padded SEASON_LABEL
    ('S01'), typed metrics."""
    return season_summary.select(
        "seriesId",
        "seriesTitle",
        "series_decade",
        "seasonNumber",
        F.concat(F.lit("S"), zero_pad("seasonNumber")).alias("season_label"),
        "episodesInSeason",
        F.round("avgSeasonRating", 2).alias("avg_season_rating"),
        "seasonStartYear",
        "seasonEndYear",
        "run_date",
    )


# --------------------------------------------------------------------------
# docs/*.sql — the four ad-hoc analyst queries, over raw-shaped inputs
# --------------------------------------------------------------------------

def top_movies_by_rating(movie_facts: DataFrame, min_votes: int = 10000) -> DataFrame:
    """docs/top_movies_by_rating.sql — global top-10 by rating, votes."""
    dedup = movie_facts.dropDuplicates(["tconst"])  # facts are genre-exploded
    return top_k_global(
        dedup.filter(F.col("numVotes") > min_votes).select(
            "tconst", "primaryTitle", "averageRating", "numVotes"
        ),
        [F.desc("averageRating"), F.desc("numVotes"), F.col("tconst")],
        10,
    )


def top_genres(movie_facts: DataFrame) -> DataFrame:
    """docs/top_genre.sql — titles per genre, top-10."""
    counts = (
        movie_facts.groupBy("genre")
        .agg(F.countDistinct("tconst").alias("n_titles"))
    )
    return top_k_global(counts, [F.desc("n_titles"), F.col("genre")], 10)


def longest_running_shows(series_meta: DataFrame) -> DataFrame:
    """docs/top_10_longest_running_tv_show.sql — endYear - startYear,
    top-10 (expects a tvSeries-filtered frame with int-castable years)."""
    runs = series_meta.filter(
        F.col("startYear").isNotNull() & F.col("endYear").isNotNull()
    ).select(
        "tconst",
        "primaryTitle",
        (F.col("endYear").cast("int") - F.col("startYear").cast("int")).alias(
            "run_years"
        ),
    )
    return top_k_global(runs, [F.desc("run_years"), F.col("tconst")], 10)


def most_versatile_actors(
    principals: DataFrame, basics: DataFrame, names: DataFrame
) -> DataFrame:
    """docs/most_verstaile_actor_actress.sql — distinct genres per
    actor via genre explode, top-10."""
    acted = principals.filter(F.col("category").isin("actor", "actress")).select(
        "tconst", "nconst"
    )
    with_genres = acted.join(
        basics.select("tconst", "genres").filter(
            F.col("genres").isNotNull() & (F.col("genres") != r"\N")
        ),
        "tconst",
    ).withColumn("genre", F.explode(F.split("genres", ",")))
    per_actor = with_genres.groupBy("nconst").agg(
        F.countDistinct("genre").alias("n_genres")
    )
    named = per_actor.join(
        F.broadcast(names.select("nconst", "primaryName")), "nconst", "left"
    )
    return top_k_global(named, [F.desc("n_genres"), F.col("nconst")], 10)
