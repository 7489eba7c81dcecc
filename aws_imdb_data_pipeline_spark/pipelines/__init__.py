from aws_imdb_data_pipeline_spark.pipelines.imdb import (
    ImdbRaw,
    movies_pipeline,
    episodes_pipeline,
    season_rollup,
    quality_snapshot,
    run_etl,
)

__all__ = [
    "ImdbRaw",
    "movies_pipeline",
    "episodes_pipeline",
    "season_rollup",
    "quality_snapshot",
    "run_etl",
]
