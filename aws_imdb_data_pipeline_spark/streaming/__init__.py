from aws_imdb_data_pipeline_spark.streaming.joins import (
    enrich_stream,
    interval_join_streams,
)
from aws_imdb_data_pipeline_spark.streaming.stateful import (
    user_event_type_counts,
    user_running_totals,
)
from aws_imdb_data_pipeline_spark.streaming.events import (
    dedup_events,
    tumbling_counts,
    sliding_value_stats,
    sessionize,
    stream_events_from_dir,
    stream_to_lake,
)

__all__ = [
    "dedup_events",
    "enrich_stream",
    "interval_join_streams",
    "tumbling_counts",
    "sliding_value_stats",
    "sessionize",
    "stream_events_from_dir",
    "user_event_type_counts",
    "user_running_totals",
    "stream_to_lake",
]
