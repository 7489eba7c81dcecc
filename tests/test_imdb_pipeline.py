"""Reference-faithful IMDb ETL: output schemas (FIXTURES.md §2), quirk
semantics (SURVEY.md §2.12), idempotent writes, model layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.pipelines import (
    episodes_pipeline,
    movies_pipeline,
    quality_snapshot,
    run_etl,
    season_rollup,
)
from aws_imdb_data_pipeline_spark.pipelines.models import (
    movie_facts_anl,
    movie_facts_view,
    most_versatile_actors,
    top_genres,
    top_movies_by_genre,
    top_movies_by_rating,
)
from aws_imdb_data_pipeline_spark.quality import (
    expect_not_null,
    expect_values_between,
    validate,
)
from tests.imdb_fixtures import build_raw

RUN = "20240115"


@pytest.fixture(scope="module")
def raw(spark):
    return build_raw(spark)


@pytest.fixture(scope="module")
def movies(raw):
    return movies_pipeline(raw, RUN).cache()


@pytest.fixture(scope="module")
def episodes(raw):
    return episodes_pipeline(raw, RUN).cache()


MOVIE_COLS = [
    "tconst", "primaryTitle", "originalTitle", "startYear", "decade",
    "runtimeMinutes", "genre", "genres", "averageRating", "numVotes",
    "directors", "writers", "topActors", "topActors_nconst", "oscarWinner",
    "run_date", "run_date_dt",
]


def test_movie_facts_schema_and_grain(movies):
    assert movies.columns == MOVIE_COLS
    rows = movies.collect()
    # genre-exploded grain: Alpha (2 genres) + Beta (1) + Delta (2) = 5
    assert len(rows) == 5
    by_title = {(r.tconst, r.genre) for r in rows}
    assert ("tt0000001", "Drama") in by_title and ("tt0000001", "Crime") in by_title
    # filters: no-year, non-movie, no-genre titles excluded
    assert not any(r.tconst in ("tt0000003", "tt0000005", "tt0000006") for r in rows)


def test_movie_null_rating_kept_in_facts(movies):
    delta = movies.filter("tconst = 'tt0000004'").collect()
    assert len(delta) == 2 and all(r.averageRating is None for r in delta)


def test_top_cast_capped_and_ordered(movies):
    row = movies.filter("tconst = 'tt0000001'").first()
    assert row.topActors == "Ada One, Ben Two, Cee Three"  # ordering 1,2,3 only
    assert row.topActors_nconst == "nm0000001, nm0000002, nm0000003"


def test_oscar_heuristic(movies):
    flags = {r.tconst: r.oscarWinner for r in movies.collect()}
    assert flags["tt0000001"] == 1  # "OSCAR" aka
    assert flags["tt0000002"] == 1  # "Academy award" aka
    assert flags["tt0000004"] == 0


def test_decade_and_run_date(movies):
    row = movies.filter("tconst = 'tt0000001'").first()
    assert row.decade == 1990
    assert row.run_date == RUN and str(row.run_date_dt) == "2024-01-15"


def test_episode_flags_and_special_remap(episodes):
    rows = {r.tconst: r for r in episodes.collect()}
    assert rows["tt0000101"].isPilot == 1 and rows["tt0000101"].isFinale == 0
    assert rows["tt0000102"].isFinale == 1  # max episode in S1
    assert rows["tt0000103"].isPilot == 1 and rows["tt0000103"].isFinale == 1
    sp = rows["tt0000104"]
    assert sp.isSpecial == 1 and sp.seasonNumber == -1 and sp.isFinale == 0
    assert rows["tt0000101"].seriesTitle == "ShowOne"
    assert rows["tt0000101"].series_decade == 2000


def test_season_rollup_quirks(episodes):
    seasons = {
        (r.seriesId, r.seasonNumber): r for r in season_rollup(episodes).collect()
    }
    s1 = seasons[("tt0000100", 1)]
    assert s1.episodesInSeason == 2
    assert abs(s1.avgSeasonRating - 7.55) < 1e-9  # avg of 7.0, 8.1
    # specials form their own season -1 group (quirk #4)
    sp = seasons[("tt0000100", -1)]
    assert sp.episodesInSeason == 1 and sp.avgSeasonRating is None
    # unrated episode: count=1, avg NULL (quirk #5 denominators differ)
    t1 = seasons[("tt0000200", 1)]
    assert t1.episodesInSeason == 1 and t1.avgSeasonRating is None


def test_quality_snapshot_shape(movies, episodes):
    seasons = season_rollup(episodes)
    q = quality_snapshot(movies, episodes, seasons, RUN, exact_distinct=True)
    rows = {r.dataset: r for r in q.collect()}
    assert set(rows) == {
        "analytics_movie_facts",
        "analytics_episode_facts",
        "series_season_summary",
    }
    assert rows["analytics_movie_facts"].row_count == 5
    assert rows["analytics_movie_facts"].null_averageRating == 2
    assert rows["analytics_episode_facts"].distinct_seriesId == 2


def test_expectation_gate_on_outputs(movies):
    validate(
        [
            expect_not_null(movies, "tconst"),
            expect_values_between(movies, "averageRating", 0, 10, mostly=0.995),
            expect_values_between(movies, "numVotes", lo=0),
        ]
    )


def test_run_etl_idempotent_writes(raw, spark, tmp_path):
    out = str(tmp_path / "lake")
    run_etl(raw, RUN, out_root=out)
    first = spark.read.parquet(f"{out}/analytics_movie_facts").count()
    run_etl(raw, RUN, out_root=out)  # same run_date → replaced, not duplicated
    second = spark.read.parquet(f"{out}/analytics_movie_facts").count()
    assert first == second == 5
    # partition layout per reference (glue.py:199)
    import os

    assert os.path.isdir(
        f"{out}/analytics_movie_facts/run_date={RUN}/decade=1990/genre=Drama"
    )


def test_model_layer(raw, movies, spark):
    view = movie_facts_view(movies)
    assert view.filter(F.col("averageRating").isNull()).count() == 0
    anl = movie_facts_anl(movies)
    row = anl.filter("tconst = 'tt0000001'").first()
    assert row.vote_bucket == "50k+" and row.rating_band == "Excellent"
    assert row.decade_label == "1990s"

    top = top_movies_by_genre(view, n=5)
    assert top.filter("genre = 'Drama'").count() >= 1

    tg = top_genres(movies).collect()
    assert tg[0].genre == "Drama" and tg[0].n_titles == 2

    tm = top_movies_by_rating(movies, min_votes=1000).collect()
    assert tm[0].tconst == "tt0000001"

    va = most_versatile_actors(
        raw.title_principals, raw.title_basics, raw.name_basics
    ).collect()
    by_name = {r.primaryName: r.n_genres for r in va}
    assert by_name["Ada One"] == 2  # Drama + Crime via tt0000001


def test_sql_models_match_dataframe_models(raw, movies, episodes, spark):
    """The SQL-text model layer (spark.sql) produces the same results
    as the DataFrame model layer."""
    from aws_imdb_data_pipeline_spark.pipelines.models import (
        episode_season_trends,
        movie_facts_anl,
        movie_facts_view,
        top_movies_by_genre,
    )
    from aws_imdb_data_pipeline_spark.pipelines.sql_models import run_models
    from aws_imdb_data_pipeline_spark.pipelines import season_rollup

    movies.createOrReplaceTempView("analytics_movie_facts")
    episodes.createOrReplaceTempView("analytics_episode_facts")
    season_rollup(episodes).createOrReplaceTempView("series_season_summary")

    out = run_models(spark)

    # view model ≡ DataFrame model
    sql_view = out["marts_movie_facts_view"]
    df_view = movie_facts_view(movies)
    assert sorted(r.tconst for r in sql_view.select("tconst").collect()) == sorted(
        r.tconst for r in df_view.select("tconst").collect()
    )

    # top-25 model ≡ DataFrame model (same rank keys)
    sql_top = {
        (r.genre, r.decade, r.tconst, r.rn)
        for r in out["marts_top_movies_by_genre"].select("genre", "decade", "tconst", "rn").collect()
    }
    df_top = {
        (r.genre, r.decade, r.tconst, r.rn)
        for r in top_movies_by_genre(df_view).select("genre", "decade", "tconst", "rn").collect()
    }
    assert sql_top == df_top

    # banding model ≡ DataFrame model
    sql_anl = {
        r.tconst: (r.vote_bucket, r.rating_band, r.decade_label)
        for r in out["movie_facts_anl"].collect()
    }
    df_anl = {
        r.tconst: (r.vote_bucket, r.rating_band, r.decade_label)
        for r in movie_facts_anl(movies).collect()
    }
    assert sql_anl == df_anl

    # trends model ≡ DataFrame model
    sql_tr = {
        (r.seriesId, r.seasonNumber): (r.avg_rating, r.episodes)
        for r in out["marts_episode_season_trends"].collect()
    }
    df_tr = {
        (r.seriesId, r.seasonNumber): (r.avg_rating, r.episodes)
        for r in episode_season_trends(episodes).collect()
    }
    assert sql_tr == df_tr


def test_episode_facts_anl_model(episodes, spark):
    """episode_facts_anl (reference episode_facts_anl.sql:1-20): typed
    rename projection — exact column mapping, date-typed run_date, and
    SQL-text twin equivalence."""
    from aws_imdb_data_pipeline_spark.pipelines.models import episode_facts_anl
    from aws_imdb_data_pipeline_spark.pipelines.sql_models import run_models

    anl = episode_facts_anl(episodes)
    assert anl.columns == [
        "episode_key", "series_key", "seriesTitle", "seriesStartYear",
        "series_decade", "seasonNumber", "episodeNumber", "episodeTitle",
        "episodeYear", "avg_rating", "num_votes", "isPilot", "isFinale",
        "isSpecial", "run_date",
    ]
    assert dict(anl.dtypes)["run_date"] == "date"
    # renames carry values through unchanged
    src = {r.tconst: (r.averageRating, r.numVotes) for r in episodes.collect()}
    got = {r.episode_key: (r.avg_rating, r.num_votes) for r in anl.collect()}
    assert got == src

    episodes.createOrReplaceTempView("analytics_episode_facts")
    sql_out = run_models(spark, only=["episode_facts_anl"])["episode_facts_anl"]
    assert sql_out.columns == anl.columns
    assert {tuple(r) for r in sql_out.collect()} == {tuple(r) for r in anl.collect()}
