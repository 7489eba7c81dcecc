"""The reference's Power BI measure layer (README.md:146-161) as Spark
transforms — the last reference compute surface: Dim Series and the
four headline DAX measures, re-expressed relationally.

DAX computes these per-slicer-selection at render time; batch-side we
compute them for EVERY series in one pass each — the same numbers the
dashboard would show, as a table. Fallback chains use
``operators.fallback.preferential_pick`` (one window shuffle per
measure; no per-tier joins).

Reference semantics ported:
- Dim Series (README.md:146-148): unique by SERIES_KEY, latest
  SERIESSTARTYEAR, ``Series Label = "Title (Year)"``.
- Series – Pilot ★ (README.md:156): prefer S1E1 with ISPILOT=1 and a
  rating → any rated S1 pilot → S1E1 rated → earliest rated → 0.
- Series – Finale ★ Active (README.md:157): latest rated finale →
  latest rated season-final episode → latest rated → 0.
- Series – Best Season ★ (README.md:158): max season avg rating → 0.
- Finale Δ vs Avg (README.md:159): finale − series avg rating, both
  COALESCE'd to 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.fallback import (
    preferential_pick,
    preferential_pick_predicates,
)


def dim_series(episode_facts: DataFrame) -> DataFrame:
    """Dim Series: unique by series_key with the latest start year and
    the slicer label ``"Title (Year)"`` (README.md:146-148)."""
    return (
        episode_facts.groupBy(F.col("seriesId").alias("series_key"))
        .agg(
            F.max_by("seriesTitle", "seriesStartYear").alias("seriesTitle"),
            F.max("seriesStartYear").alias("seriesStartYear"),
        )
        .withColumn(
            "series_label",
            F.concat(
                F.col("seriesTitle"),
                F.lit(" ("),
                F.col("seriesStartYear").cast("string"),
                F.lit(")"),
            ),
        )
    )


def _rated(eps: DataFrame) -> DataFrame:
    return eps.filter(F.col("averageRating").isNotNull())


def series_pilot_rating(episode_facts: DataFrame) -> DataFrame:
    """Series – Pilot ★: S1E1 pilot rated → any S1 pilot rated → S1E1
    rated → earliest rated episode → 0 (README.md:156).

    Output: (series_key, pilot_rating, pilot_season, pilot_episode).
    """
    eps = episode_facts.select(
        F.col("seriesId").alias("series_key"),
        "seasonNumber",
        "episodeNumber",
        "isPilot",
        "averageRating",
    )
    rated = F.col("averageRating").isNotNull()
    s1 = rated & (F.col("seasonNumber") == 1)
    picked = preferential_pick_predicates(
        eps,
        preds=[
            s1 & (F.col("episodeNumber") == 1) & (F.col("isPilot") == 1),
            s1 & (F.col("isPilot") == 1),
            s1 & (F.col("episodeNumber") == 1),
            rated,
        ],
        key_cols=["series_key"],
        order_by=[F.col("seasonNumber"), F.col("episodeNumber")],
        value_cols=["averageRating", "seasonNumber", "episodeNumber"],
        keys=dim_series(episode_facts).select("series_key"),
        defaults={"averageRating": 0.0},
    )
    return picked.select(
        "series_key",
        F.col("averageRating").alias("pilot_rating"),
        F.col("seasonNumber").alias("pilot_season"),
        F.col("episodeNumber").alias("pilot_episode"),
    )


def series_finale_rating(episode_facts: DataFrame) -> DataFrame:
    """Series – Finale ★ (Active): latest rated finale → latest rated
    season-final episode → latest rated episode → 0 (README.md:157).

    "Season-final" = max episodeNumber within (series, season) — the
    ISFINALE flag marks the series finale (max episode of the max
    season), so the middle tier catches shows whose last rated episode
    closes a season without ending the series.
    """
    eps = episode_facts.select(
        F.col("seriesId").alias("series_key"),
        "seasonNumber",
        "episodeNumber",
        "isFinale",
        "averageRating",
    )
    # season-final = max episodeNumber among ALL episodes of the season,
    # rated or not — computing it after the rated filter would promote a
    # season's last *rated* episode to season-final when the true last
    # episode is unrated.
    w = Window.partitionBy("series_key", "seasonNumber")
    with_last = eps.withColumn(
        "__season_last", F.max("episodeNumber").over(w)
    )
    rated = F.col("averageRating").isNotNull()
    picked = preferential_pick_predicates(
        with_last,
        preds=[
            rated & (F.col("isFinale") == 1),
            rated & (F.col("episodeNumber") == F.col("__season_last")),
            rated,
        ],
        key_cols=["series_key"],
        order_by=[F.desc("seasonNumber"), F.desc("episodeNumber")],
        value_cols=["averageRating", "seasonNumber", "episodeNumber"],
        keys=dim_series(episode_facts).select("series_key"),
        defaults={"averageRating": 0.0},
    )
    return picked.select(
        "series_key",
        F.col("averageRating").alias("finale_rating"),
        F.col("seasonNumber").alias("finale_season"),
        F.col("episodeNumber").alias("finale_episode"),
    )


def series_best_season(season_summary: DataFrame) -> DataFrame:
    """Series – Best Season ★: max season avg rating per series (ties →
    earliest season), 0 when no season is rated (README.md:158).

    Output: (series_key, best_season, best_season_rating).
    """
    rated = season_summary.filter(
        F.col("avgSeasonRating").isNotNull() & (F.col("seasonNumber") >= 0)
    ).select(
        F.col("seriesId").alias("series_key"), "seasonNumber", "avgSeasonRating"
    )
    all_series = season_summary.select(
        F.col("seriesId").alias("series_key")
    ).distinct()
    picked = preferential_pick(
        [rated],
        key_cols=["series_key"],
        order_by=[F.desc("avgSeasonRating"), F.col("seasonNumber")],
        value_cols=["seasonNumber", "avgSeasonRating"],
        keys=all_series,
        defaults={"avgSeasonRating": 0.0},
    )
    return picked.select(
        "series_key",
        F.col("seasonNumber").alias("best_season"),
        F.col("avgSeasonRating").alias("best_season_rating"),
    )


def finale_delta_vs_avg(episode_facts: DataFrame) -> DataFrame:
    """Finale Δ vs Avg: finale rating − series avg rating, both
    COALESCE'd to 0 (README.md:159)."""
    finale = series_finale_rating(episode_facts)
    avg = (
        _rated(episode_facts)
        .groupBy(F.col("seriesId").alias("series_key"))
        .agg(F.avg("averageRating").alias("series_avg_rating"))
    )
    return (
        finale.join(avg, "series_key", "left")
        .select(
            "series_key",
            "finale_rating",
            F.coalesce("series_avg_rating", F.lit(0.0)).alias("series_avg_rating"),
            (
                F.coalesce("finale_rating", F.lit(0.0))
                - F.coalesce("series_avg_rating", F.lit(0.0))
            ).alias("finale_delta"),
        )
    )
