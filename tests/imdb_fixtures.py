r"""Deterministic IMDb-shaped fixtures (FIXTURES.md §1), covering the
edge shapes the reference's logic depends on: movies without ratings
(left-join null path), >3 principals (row_number cap), a multi-season
series with a \N season (specials) and varying episode counts (finale
window), duplicate + oscar-bait akas rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from aws_imdb_data_pipeline_spark.pipelines.imdb import ImdbRaw

N = r"\N"


def build_raw(spark: SparkSession) -> ImdbRaw:
    title_basics = spark.createDataFrame(
        [
            # tconst, titleType, primaryTitle, originalTitle, startYear, endYear, runtimeMinutes, genres
            ("tt0000001", "movie", "Alpha", "Alpha Orig", "1994", N, "120", "Drama,Crime"),
            ("tt0000002", "movie", "Beta", "Beta", "2001", N, "95", "Comedy"),
            ("tt0000003", "movie", "Gamma", "Gamma", N, N, "100", "Drama"),  # dropped: no year
            ("tt0000004", "movie", "Delta", "Delta", "1999", N, N, "Action,Drama"),  # no runtime, no rating
            ("tt0000005", "short", "Eps", "Eps", "2000", N, "10", "Drama"),  # dropped: not movie
            ("tt0000006", "movie", "Zeta", "Zeta", "2010", N, "80", N),  # dropped: no genres
            ("tt0000100", "tvSeries", "ShowOne", "ShowOne", "2005", "2012", N, "Drama"),
            ("tt0000200", "tvSeries", "ShowTwo", "ShowTwo", "1998", N, N, "Comedy,Drama"),
            ("tt0000101", "tvEpisode", "S1E1", "S1E1", "2005", N, "42", N),
            ("tt0000102", "tvEpisode", "S1E2", "S1E2", "2005", N, "42", N),
            ("tt0000103", "tvEpisode", "S2E1", "S2E1", "2006", N, "42", N),
            ("tt0000104", "tvEpisode", "Special", "Special", "2007", N, "80", N),
            ("tt0000201", "tvEpisode", "T-S1E1", "T-S1E1", "1998", N, "21", N),
        ],
        "tconst string, titleType string, primaryTitle string, originalTitle string, "
        "startYear string, endYear string, runtimeMinutes string, genres string",
    )

    title_ratings = spark.createDataFrame(
        [
            ("tt0000001", "8.8", "150000"),
            ("tt0000002", "6.4", "5000"),
            # tt0000004 deliberately missing (left-join null path)
            ("tt0000101", "7.0", "900"),
            ("tt0000102", "8.1", "1100"),
            ("tt0000103", "6.0", "700"),
            # tt0000104 (special) unrated; tt0000201 unrated
        ],
        "tconst string, averageRating string, numVotes string",
    )

    title_crew = spark.createDataFrame(
        [
            ("tt0000001", "nm0000001,nm0000002", "nm0000003"),
            ("tt0000002", "nm0000002", N),
            ("tt0000004", N, N),
        ],
        "tconst string, directors string, writers string",
    )

    name_basics = spark.createDataFrame(
        [
            ("nm0000001", "Ada One"),
            ("nm0000002", "Ben Two"),
            ("nm0000003", "Cee Three"),
            ("nm0000004", "Dee Four"),
            ("nm0000005", "Eli Five"),
        ],
        "nconst string, primaryName string",
    )

    title_principals = spark.createDataFrame(
        [
            # tt0000001 has 5 actor credits → cap at 3 by ordering
            ("tt0000001", "nm0000001", "1", "actress"),
            ("tt0000001", "nm0000002", "2", "actor"),
            ("tt0000001", "nm0000003", "3", "actor"),
            ("tt0000001", "nm0000004", "4", "actor"),
            ("tt0000001", "nm0000005", "5", "actor"),
            ("tt0000001", "nm0000003", "1", "director"),  # non-acting ignored
            ("tt0000002", "nm0000004", "2", "actor"),
            ("tt0000002", "nm0000005", N, "actor"),  # null ordering ignored
            ("tt0000101", "nm0000001", "1", "actress"),
            ("tt0000102", "nm0000002", "1", "actor"),
        ],
        "tconst string, nconst string, ordering string, category string",
    )

    title_akas = spark.createDataFrame(
        [
            ("tt0000001", "Alpha: An OSCAR Story"),
            ("tt0000001", "Alpha: An OSCAR Story"),  # duplicate row → distinct
            ("tt0000001", "Alpha (US)"),
            ("tt0000002", "Beta Academy award edition"),
            ("tt0000004", "Delta plain"),
        ],
        "titleId string, title string",
    )

    title_episode = spark.createDataFrame(
        [
            # tconst, parentTconst, seasonNumber, episodeNumber
            ("tt0000101", "tt0000100", "1", "1"),
            ("tt0000102", "tt0000100", "1", "2"),   # finale of S1
            ("tt0000103", "tt0000100", "2", "1"),   # sole ep → pilot AND finale
            ("tt0000104", "tt0000100", N, N),        # special → season -1
            ("tt0000201", "tt0000200", "1", "1"),
        ],
        "tconst string, parentTconst string, seasonNumber string, episodeNumber string",
    )

    return ImdbRaw(
        title_basics=title_basics,
        title_ratings=title_ratings,
        title_crew=title_crew,
        name_basics=name_basics,
        title_principals=title_principals,
        title_akas=title_akas,
        title_episode=title_episode,
    )
