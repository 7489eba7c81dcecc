r"""The IMDb ETL re-expressed Spark-first.

Re-implementation of the reference's single Glue job
(glue_jobs/etl_movies_episodes_analytics_advanced.py, ``glue.py``
below) as composable pipeline functions:

- ``movies_pipeline``   — movie x genre facts (glue.py:122-192)
- ``episodes_pipeline`` — series x season x episode facts (glue.py:208-288)
- ``season_rollup``     — series x season summary (glue.py:300-310)
- ``quality_snapshot``  — per-dataset DQ profiles (glue.py:320-355)
- ``run_etl``           — orchestrates all four with the cache fix

Deliberate quirk decisions (SURVEY.md §2.12):
1. isFinale = max(episodeNumber) per (seriesId, seasonNumber) window —
   the reference's dead both-branches-0 ``when`` placeholder
   (glue.py:247-251) is dropped; the window overwrite (glue.py:255-257)
   defines the real semantics, including the NULL-season partition.
2. The oscar flag stays a heuristic contains-match on aka titles
   (glue.py:176-183), not awards data.
3. Movie facts keep rows with NULL rating (left join, glue.py:137);
   dropping them is the *view* layer's job (models.movie_facts_view).
4. Specials are remapped to seasonNumber = -1 / isSpecial = 1 BEFORE
   the season rollup, so specials form their own season group
   (glue.py:282-286,300-308).
5. avgSeasonRating ignores NULL ratings while episodesInSeason counts
   all episodes (glue.py:303-305) — denominators intentionally differ.
6. Cast capping keeps the double guard: ordering <= 3 AND row_number
   <= 3 (glue.py:149,155); episode variant also requires non-null
   ordering (glue.py:263).
10. run_date is both a 'yyyyMMdd' string partition column and a
   run_date_dt date column (glue.py:190-192).

Scale notes vs the reference:
- Shared subtrees are cached before multi-action fan-out (the Glue job
  recomputed the full episode lineage three times, SURVEY §4.3).
- Dimension-sized join inputs (ratings, crew, names, oscar titles,
  cast aggregates) carry broadcast hints; at real IMDb scale these are
  100s of MB — drop the hint and let AQE decide (``broadcast_dims``).
- Writes use dynamic partition overwrite (idempotent re-runs) instead
  of the reference's blind append + warehouse-side DELETE.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.functions.cleaning import null_sentinel_cast
from aws_imdb_data_pipeline_spark.functions.derive import decade
from aws_imdb_data_pipeline_spark.quality.profile import dq_profile, dq_union
from aws_imdb_data_pipeline_spark.sources.lake import replace_run_partition
from aws_imdb_data_pipeline_spark.sources.tsv import read_imdb_tsv

RAW_TABLES = (
    "title_basics",
    "title_ratings",
    "title_crew",
    "name_basics",
    "title_principals",
    "title_akas",
    "title_episode",
)


@dataclass
class ImdbRaw:
    """The 7 raw IMDb tables, all-string typed (glue.py:53-60)."""

    title_basics: DataFrame
    title_ratings: DataFrame
    title_crew: DataFrame
    name_basics: DataFrame
    title_principals: DataFrame
    title_akas: DataFrame
    title_episode: DataFrame

    @classmethod
    def from_tsv_dir(cls, spark: SparkSession, root: str) -> "ImdbRaw":
        """Load ``{root}/{name}.tsv[.gz]`` for each raw table."""
        import glob as _glob
        import os

        frames = {}
        for name in RAW_TABLES:
            matches = _glob.glob(os.path.join(root, f"{name}.tsv*"))
            if not matches:
                raise FileNotFoundError(f"missing raw table {name} under {root}")
            frames[name] = read_imdb_tsv(spark, matches[0])
        return cls(**frames)


def _maybe_broadcast(df: DataFrame, hint: bool) -> DataFrame:
    return F.broadcast(df) if hint else df


def _valid(col: str) -> Column:
    """Non-null, non-sentinel, non-blank (glue.py:123-128 filter idiom)."""
    c = F.col(col)
    return c.isNotNull() & (c != r"\N") & (F.length(F.trim(c)) > 0)


def _top_cast(
    principals: DataFrame,
    names: DataFrame,
    ordered_concat: bool,
    broadcast_dims: bool,
) -> DataFrame:
    """Top-3 credited actors per title.

    Movies variant (ordered_concat=True): sorted by billing order via
    sort_array(collect_list(struct)) (glue.py:146-168). Episode variant:
    unsorted concat_ws(collect_list) with the extra non-null-ordering
    guard (glue.py:261-270).
    """
    cast = principals.filter(
        F.col("category").isin("actor", "actress")
        & _valid("ordering")
        & (null_sentinel_cast("ordering", "int") <= 3)
    ).select(
        "tconst",
        "nconst",
        null_sentinel_cast("ordering", "int").alias("ordering"),
    )
    cast = cast.join(
        _maybe_broadcast(names.select("nconst", "primaryName"), broadcast_dims),
        "nconst",
        "left",
    )
    w = Window.partitionBy("tconst").orderBy("ordering", "nconst")
    cast = cast.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    if ordered_concat:
        pairs = F.sort_array(F.collect_list(F.struct("ordering", "primaryName")))
        npairs = F.sort_array(F.collect_list(F.struct("ordering", "nconst")))
        return cast.groupBy("tconst").agg(
            F.concat_ws(", ", F.transform(pairs, lambda x: x["primaryName"])).alias(
                "topActors"
            ),
            F.concat_ws(", ", F.transform(npairs, lambda x: x["nconst"])).alias(
                "topActors_nconst"
            ),
        )
    return cast.groupBy("tconst").agg(
        F.concat_ws(", ", F.collect_list("primaryName")).alias("epTopActors")
    )


def _oscar_titles(akas: DataFrame) -> DataFrame:
    """Heuristic oscar flag source: aka titles containing 'oscar' or
    'academy award', case-insensitive, distinct ids (glue.py:176-183)."""
    t = F.lower(F.col("title"))
    return (
        akas.filter(t.like("%oscar%") | t.like("%academy award%"))
        .select(F.col("titleId"))
        .distinct()
    )


def movies_pipeline(
    raw: ImdbRaw, run_date: str, broadcast_dims: bool = True
) -> DataFrame:
    """Movie x genre facts (glue.py:122-192). Grain: one row per movie
    per exploded genre."""
    b = raw.title_basics
    movies = b.filter(
        (F.col("titleType") == "movie")
        & _valid("startYear")
        & _valid("genres")
        & _valid("primaryTitle")
    ).select(
        "tconst",
        "primaryTitle",
        "originalTitle",
        null_sentinel_cast("startYear", "int").alias("startYear"),
        null_sentinel_cast("runtimeMinutes", "int").alias("runtimeMinutes"),
        "genres",
    )
    movies = movies.withColumn("decade", decade("startYear"))

    ratings = raw.title_ratings.select(
        "tconst",
        null_sentinel_cast("averageRating", "double").alias("averageRating"),
        null_sentinel_cast("numVotes", "int").alias("numVotes"),
    )
    movies = movies.join(_maybe_broadcast(ratings, broadcast_dims), "tconst", "left")

    crew = raw.title_crew.select("tconst", "directors", "writers")
    movies = movies.join(_maybe_broadcast(crew, broadcast_dims), "tconst", "left")

    cast_agg = _top_cast(
        raw.title_principals, raw.name_basics, ordered_concat=True,
        broadcast_dims=broadcast_dims,
    )
    movies = movies.join(_maybe_broadcast(cast_agg, broadcast_dims), "tconst", "left")

    oscar = _oscar_titles(raw.title_akas)
    movies = movies.join(
        _maybe_broadcast(oscar, broadcast_dims),
        movies.tconst == oscar.titleId,
        "left",
    ).withColumn(
        "oscarWinner", F.when(F.col("titleId").isNotNull(), 1).otherwise(0)
    ).drop("titleId")

    movies = movies.withColumn("genre", F.explode(F.split("genres", ",")))

    return movies.select(
        "tconst",
        "primaryTitle",
        "originalTitle",
        "startYear",
        "decade",
        "runtimeMinutes",
        "genre",
        "genres",
        "averageRating",
        "numVotes",
        "directors",
        "writers",
        "topActors",
        "topActors_nconst",
        "oscarWinner",
        F.lit(run_date).alias("run_date"),
        F.to_date(F.lit(run_date), "yyyyMMdd").alias("run_date_dt"),
    )


def episodes_pipeline(
    raw: ImdbRaw, run_date: str, broadcast_dims: bool = True
) -> DataFrame:
    """Series x season x episode facts (glue.py:208-288)."""
    ep = raw.title_episode.select(
        "tconst",
        "parentTconst",
        null_sentinel_cast("seasonNumber", "int").alias("seasonNumber_raw"),
        null_sentinel_cast("episodeNumber", "int").alias("episodeNumber"),
    )

    b = raw.title_basics
    ep_meta = b.select(
        F.col("tconst").alias("ep_tconst"),
        F.col("primaryTitle").alias("episodeTitle"),
        null_sentinel_cast("startYear", "int").alias("episodeYear"),
    )
    series_meta = b.filter(F.col("titleType") == "tvSeries").select(
        F.col("tconst").alias("seriesId"),
        F.col("primaryTitle").alias("seriesTitle"),
        null_sentinel_cast("startYear", "int").alias("seriesStartYear"),
        F.col("genres").alias("seriesGenres"),
    )

    # self-join of title_basics under two roles (J6, glue.py:215-238)
    episodes = ep.join(
        _maybe_broadcast(ep_meta, False), ep.tconst == ep_meta.ep_tconst, "left"
    ).drop("ep_tconst")
    episodes = episodes.join(
        _maybe_broadcast(series_meta, broadcast_dims),
        episodes.parentTconst == series_meta.seriesId,
        "left",
    )
    episodes = episodes.withColumn("series_decade", decade("seriesStartYear"))

    ratings = raw.title_ratings.select(
        "tconst",
        null_sentinel_cast("averageRating", "double").alias("averageRating"),
        null_sentinel_cast("numVotes", "int").alias("numVotes"),
    )
    episodes = episodes.join(
        _maybe_broadcast(ratings, broadcast_dims), "tconst", "left"
    )

    ep_cast = _top_cast(
        raw.title_principals, raw.name_basics, ordered_concat=False,
        broadcast_dims=broadcast_dims,
    )
    episodes = episodes.join(
        _maybe_broadcast(ep_cast, broadcast_dims), "tconst", "left"
    )

    # pilot flag (glue.py:247-251's live branch)
    episodes = episodes.withColumn(
        "isPilot", F.when(F.col("episodeNumber") == 1, 1).otherwise(0)
    )
    # finale = max episode within (series, season) incl. NULL season —
    # quirk #1: the window defines the semantics (glue.py:255-257)
    w = Window.partitionBy("seriesId", "seasonNumber_raw")
    episodes = episodes.withColumn(
        "isFinale",
        F.when(
            F.col("episodeNumber").isNotNull()
            & (F.col("episodeNumber") == F.max("episodeNumber").over(w)),
            1,
        ).otherwise(0),
    )
    # specials: NULL season → -1 partition value + flag (glue.py:282-286)
    episodes = episodes.withColumn(
        "isSpecial", F.when(F.col("seasonNumber_raw").isNull(), 1).otherwise(0)
    ).withColumn(
        "seasonNumber", F.coalesce("seasonNumber_raw", F.lit(-1))
    )

    return episodes.select(
        "tconst",
        "episodeTitle",
        "episodeYear",
        "parentTconst",
        "seriesId",
        "seriesTitle",
        "seriesStartYear",
        "seriesGenres",
        "series_decade",
        "seasonNumber",
        "episodeNumber",
        "averageRating",
        "numVotes",
        "isPilot",
        "isFinale",
        "isSpecial",
        "epTopActors",
        F.lit(run_date).alias("run_date"),
        F.to_date(F.lit(run_date), "yyyyMMdd").alias("run_date_dt"),
    )


def season_rollup(episode_facts: DataFrame) -> DataFrame:
    """Series x season summary over the episode facts (glue.py:300-310).
    Specials (-1) roll up as their own group (quirk #4); avg ignores
    NULL ratings while count counts all (quirk #5)."""
    return episode_facts.groupBy(
        "seriesId", "seriesTitle", "series_decade", "seasonNumber",
        "run_date", "run_date_dt",
    ).agg(
        F.count(F.lit(1)).alias("episodesInSeason"),
        F.avg("averageRating").alias("avgSeasonRating"),
        F.min("episodeYear").alias("seasonStartYear"),
        F.max("episodeYear").alias("seasonEndYear"),
    ).select(
        "seriesId", "seriesTitle", "series_decade", "seasonNumber",
        "episodesInSeason", "avgSeasonRating", "seasonStartYear",
        "seasonEndYear", "run_date", "run_date_dt",
    )


def quality_snapshot(
    movie_facts: DataFrame,
    episode_facts: DataFrame,
    season_summary: DataFrame,
    run_date: str,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-dataset DQ profile union (glue.py:320-355)."""
    profiles = [
        dq_profile(
            movie_facts,
            dataset="analytics_movie_facts",
            null_cols=["tconst", "averageRating", "genre"],
            numeric_cols=["averageRating", "numVotes", "runtimeMinutes"],
            distinct_cols=["tconst", "genre"],
            run_date=run_date,
            exact_distinct=exact_distinct,
        ),
        dq_profile(
            episode_facts,
            dataset="analytics_episode_facts",
            null_cols=["tconst", "seriesId", "averageRating"],
            numeric_cols=["averageRating", "seasonNumber", "episodeNumber"],
            distinct_cols=["tconst", "seriesId"],
            run_date=run_date,
            exact_distinct=exact_distinct,
        ),
        dq_profile(
            season_summary,
            dataset="series_season_summary",
            null_cols=["seriesId", "avgSeasonRating"],
            numeric_cols=["avgSeasonRating", "episodesInSeason"],
            distinct_cols=["seriesId"],
            run_date=run_date,
            exact_distinct=exact_distinct,
        ),
    ]
    return dq_union(profiles)


def run_etl(
    raw: ImdbRaw,
    run_date: str,
    out_root: str | None = None,
    broadcast_dims: bool = True,
) -> dict[str, DataFrame]:
    """Full ETL: movies + episodes + season rollup + DQ snapshot.

    Shared subtrees are cached before the multi-action fan-out — the
    reference recomputed the episode lineage for each of its 3 actions
    (SURVEY §4.3). With ``out_root`` set, each output is written
    Hive-partitioned with dynamic partition overwrite (idempotent
    re-runs of the same run_date — replaces the reference's
    append + warehouse DELETE dance, glue.py:196-202 / batch.py:217).
    """
    movies = movies_pipeline(raw, run_date, broadcast_dims).cache()
    episodes = episodes_pipeline(raw, run_date, broadcast_dims).cache()
    seasons = season_rollup(episodes)
    quality = quality_snapshot(movies, episodes, seasons, run_date)

    outputs = {
        "analytics_movie_facts": (movies, ["run_date", "decade", "genre"]),
        "analytics_episode_facts": (
            episodes,
            ["run_date", "series_decade", "seasonNumber"],
        ),
        "series_season_summary": (seasons, ["run_date", "series_decade"]),
        "analytics_quality": (quality, ["dataset", "run_date"]),
    }
    if out_root is not None:
        import os

        for name, (df, parts) in outputs.items():
            replace_run_partition(df, os.path.join(out_root, name), parts)
    return {name: df for name, (df, _) in outputs.items()}
