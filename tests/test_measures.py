"""Power BI measure layer (reference README.md:146-161): Dim Series +
the four DAX measures as batch transforms, on the IMDb fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.fallback import preferential_pick
from aws_imdb_data_pipeline_spark.pipelines import episodes_pipeline, season_rollup
from aws_imdb_data_pipeline_spark.pipelines.measures import (
    dim_series,
    finale_delta_vs_avg,
    series_best_season,
    series_finale_rating,
    series_pilot_rating,
)
from tests.imdb_fixtures import build_raw

RUN = "20240115"


@pytest.fixture(scope="module")
def episodes(spark):
    return episodes_pipeline(build_raw(spark), RUN).cache()


def test_preferential_pick_tiers_and_default(spark):
    rows = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 2, 30.0)], ["k", "tier_tag", "v"]
    )
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], ["k"])
    out = {
        r.k: r.v
        for r in preferential_pick(
            [rows.filter("tier_tag = 1"), rows.filter("tier_tag = 2")],
            key_cols=["k"],
            order_by=[F.col("v")],
            value_cols=["v"],
            keys=keys,
            defaults={"v": 0.0},
        ).collect()
    }
    # a: tier-1 row beats tier-2 row; b: only tier 2; c: default
    assert out == {"a": 10.0, "b": 30.0, "c": 0.0}


def test_preferential_pick_predicates_equals_union_form(spark):
    """The predicate form must pick IDENTICALLY to the union form on
    same-frame tiers — including rows qualifying for MULTIPLE tiers
    (the union carries them once per tier; the CASE tags each once
    with its min tier) and keys matched by no tier (defaulted)."""
    from aws_imdb_data_pipeline_spark.operators.fallback import (
        preferential_pick_predicates,
    )

    rows = spark.createDataFrame(
        [
            # key a: row 1 satisfies BOTH tiers (appears twice in the
            # union), row 2 only tier 2 but with a better order value
            ("a", 1, 1, 10.0),
            ("a", 0, 1, 5.0),
            ("b", 0, 1, 30.0),
            ("c", 0, 0, 40.0),  # satisfies no tier -> excluded
        ],
        ["k", "t1", "t2", "v"],
    )
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], ["k"])
    kw = dict(
        key_cols=["k"],
        order_by=[F.col("v")],
        value_cols=["v"],
        keys=keys,
        defaults={"v": 0.0},
    )
    union_out = {
        r.k: r.v
        for r in preferential_pick(
            [rows.filter("t1 = 1"), rows.filter("t2 = 1")], **kw
        ).collect()
    }
    pred_out = {
        r.k: r.v
        for r in preferential_pick_predicates(
            rows, preds=[F.col("t1") == 1, F.col("t2") == 1], **kw
        ).collect()
    }
    assert pred_out == union_out
    # a: its only tier-1 row (v=10) beats the lower-ordered tier-2 row
    assert pred_out == {"a": 10.0, "b": 30.0, "c": 0.0}


def test_dim_series(episodes):
    dims = {r.series_key: r for r in dim_series(episodes).collect()}
    assert set(dims) == {"tt0000100", "tt0000200"}
    assert dims["tt0000100"].series_label == "ShowOne (2005)"
    assert dims["tt0000200"].series_label == "ShowTwo (1998)"


def test_series_pilot_rating(episodes):
    out = {r.series_key: r for r in series_pilot_rating(episodes).collect()}
    # ShowOne: S1E1 is a rated pilot → tier 1 hit
    assert out["tt0000100"].pilot_rating == 7.0
    assert (out["tt0000100"].pilot_season, out["tt0000100"].pilot_episode) == (1, 1)
    # ShowTwo: sole episode unrated → every tier empty → 0
    assert out["tt0000200"].pilot_rating == 0.0


def test_series_finale_rating(episodes):
    out = {r.series_key: r for r in series_finale_rating(episodes).collect()}
    # ShowOne: rated season finales are S1E2 (8.1) and S2E1 (6.0);
    # latest (season desc) wins → S2E1
    assert out["tt0000100"].finale_rating == 6.0
    assert (out["tt0000100"].finale_season, out["tt0000100"].finale_episode) == (2, 1)
    assert out["tt0000200"].finale_rating == 0.0


def test_series_finale_unrated_last_episode(spark):
    """Season-final = max episodeNumber among ALL episodes of the
    season. S2's true final (E2) is unrated, so S2 contributes no
    season-final row — the rated S1 final must win tier 2; the last
    *rated* episode of S2 must not be promoted to season-final."""
    eps = spark.createDataFrame(
        [
            ("ttX", "Show", 2000, 1, 1, 0, 7.0),
            ("ttX", "Show", 2000, 1, 2, 0, 8.0),   # true + rated S1 final
            ("ttX", "Show", 2000, 2, 1, 0, 5.0),   # last RATED ep of S2
            ("ttX", "Show", 2000, 2, 2, 0, None),  # true S2 final, unrated
        ],
        "seriesId string, seriesTitle string, seriesStartYear int, "
        "seasonNumber int, episodeNumber int, isFinale int, averageRating double",
    )
    row = series_finale_rating(eps).collect()[0]
    assert row.finale_rating == 8.0
    assert (row.finale_season, row.finale_episode) == (1, 2)


def test_series_best_season(episodes):
    seasons = season_rollup(episodes)
    out = {r.series_key: r for r in series_best_season(seasons).collect()}
    # ShowOne: S1 avg (7.0+8.1)/2 = 7.55 beats S2 (6.0); special (-1) excluded
    assert out["tt0000100"].best_season == 1
    assert abs(out["tt0000100"].best_season_rating - 7.55) < 1e-9
    # ShowTwo: no rated season → 0
    assert out["tt0000200"].best_season_rating == 0.0


def test_finale_delta_vs_avg(episodes):
    out = {r.series_key: r for r in finale_delta_vs_avg(episodes).collect()}
    avg_one = (7.0 + 8.1 + 6.0) / 3
    assert abs(out["tt0000100"].finale_delta - (6.0 - avg_one)) < 1e-9
    # both sides coalesce to 0 → delta 0 for the unrated series
    assert out["tt0000200"].finale_delta == 0.0
