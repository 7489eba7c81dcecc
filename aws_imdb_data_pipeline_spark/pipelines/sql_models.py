"""The reference's SQL models as SQL TEXT through spark.sql (§3.3).

`pipelines.models` re-expresses the dbt models as DataFrame
transforms; this module runs them as dialect-fixed SQL strings against
the session catalog — the surface an analyst who writes SQL against
the reference would actually use. Translations applied
(SURVEY §7 step 6): `$path`-regex latest-run → partition-column max,
`CROSS JOIN (SELECT max..)` kept (Catalyst broadcasts the 1-row side),
`REGEXP_SUBSTR`→`regexp_extract`, `IFF`→`if`, `::`→`CAST`,
`TO_CHAR(x)||'s'`→`concat`.

Each model is a CREATE OR REPLACE TEMP VIEW (the dbt "view"
materialization); `materialize_table` gives the CTAS path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# model name -> (depends-on view that must exist, SQL)
MODELS: dict[str, str] = {
    # marts_movie_facts_view.sql:1-19 — latest run, non-null ratings
    "marts_movie_facts_view": """
        SELECT f.*
        FROM analytics_movie_facts f
        CROSS JOIN (SELECT max(run_date) AS latest_run FROM analytics_movie_facts) r
        WHERE f.run_date = r.latest_run
          AND f.averageRating IS NOT NULL
          AND f.numVotes IS NOT NULL
    """,
    # marts_top_movies_by_genre.sql:3-19 — top 25 per (genre, decade)
    "marts_top_movies_by_genre": """
        SELECT * FROM (
            SELECT v.*,
                   row_number() OVER (
                       PARTITION BY genre, decade
                       ORDER BY averageRating DESC, numVotes DESC, tconst
                   ) AS rn
            FROM marts_movie_facts_view v
            WHERE numVotes >= 1000
        ) WHERE rn <= 25
    """,
    # marts_episode_season_trends.sql:3-37
    "marts_episode_season_trends": """
        SELECT seriesId, seriesTitle, series_decade, seasonNumber,
               avg(averageRating) AS avg_rating,
               sum(numVotes)      AS total_votes,
               count(*)           AS episodes
        FROM (
            SELECT e.*
            FROM analytics_episode_facts e
            CROSS JOIN (SELECT max(run_date) AS latest_run
                        FROM analytics_episode_facts) r
            WHERE e.run_date = r.latest_run
        )
        WHERE averageRating IS NOT NULL AND seasonNumber >= 0
        GROUP BY 1, 2, 3, 4
    """,
    # movie_facts_anl.sql:10-40 — typed + banded
    "movie_facts_anl": """
        SELECT tconst, primaryTitle, genre, decade,
               CAST(averageRating AS DOUBLE) AS rating,
               CAST(numVotes AS INT)         AS votes,
               CASE WHEN numVotes >= 50000 THEN '50k+'
                    WHEN numVotes >= 10000 THEN '10k-49k'
                    WHEN numVotes >= 1000  THEN '1k-9k'
                    ELSE '<1k' END AS vote_bucket,
               CASE WHEN averageRating IS NULL THEN 'Unrated'
                    WHEN averageRating >= 8.0 THEN 'Excellent'
                    WHEN averageRating >= 6.0 THEN 'Good'
                    ELSE 'Mixed' END AS rating_band,
               concat(CAST(decade AS STRING), 's') AS decade_label,
               run_date
        FROM analytics_movie_facts
    """,
    # episode_facts_anl.sql:1-20 — typed rename projection
    "episode_facts_anl": """
        SELECT tconst        AS episode_key,
               seriesId      AS series_key,
               seriesTitle, seriesStartYear, series_decade,
               seasonNumber, episodeNumber, episodeTitle, episodeYear,
               averageRating AS avg_rating,
               numVotes      AS num_votes,
               isPilot, isFinale, isSpecial,
               run_date_dt   AS run_date
        FROM analytics_episode_facts
    """,
    # series_season_summary_anl.sql — season labels
    "series_season_summary_anl": """
        SELECT seriesId, seriesTitle, series_decade, seasonNumber,
               concat('S', lpad(CAST(seasonNumber AS STRING), 2, '0'))
                   AS season_label,
               episodesInSeason,
               round(avgSeasonRating, 2) AS avg_season_rating,
               seasonStartYear, seasonEndYear, run_date
        FROM series_season_summary
    """,
}

# model execution order (dependencies first)
MODEL_ORDER = [
    "marts_movie_facts_view",
    "marts_top_movies_by_genre",
    "marts_episode_season_trends",
    "movie_facts_anl",
    "episode_facts_anl",
    "series_season_summary_anl",
]


def run_models(spark: SparkSession, only: list[str] | None = None) -> dict[str, DataFrame]:
    """Execute the model DAG as temp views over the registered source
    tables (analytics_movie_facts / analytics_episode_facts /
    series_season_summary must exist as views or catalog tables)."""
    out: dict[str, DataFrame] = {}
    for name in MODEL_ORDER:
        if only and name not in only:
            continue
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {MODELS[name]}")
        out[name] = spark.table(name)
    return out


def materialize_table(spark: SparkSession, model: str, table_name: str) -> DataFrame:
    """dbt 'table' materialization: CTAS into the session catalog."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    spark.sql(f"CREATE TABLE {table_name} USING PARQUET AS {MODELS[model]}")
    return spark.table(table_name)
