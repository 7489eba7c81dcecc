from aws_imdb_data_pipeline_spark.streaming.events import (
    tumbling_counts,
    sliding_value_stats,
    sessionize,
    stream_events_from_dir,
)

__all__ = [
    "tumbling_counts",
    "sliding_value_stats",
    "sessionize",
    "stream_events_from_dir",
]
