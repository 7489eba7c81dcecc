from aws_imdb_data_pipeline_spark.streaming.annserve import stream_ann_topk
from aws_imdb_data_pipeline_spark.streaming.events import (
    dedup_events,
    sessionize,
    sliding_value_stats,
    stream_events_from_dir,
    stream_to_lake,
    tumbling_counts,
)
from aws_imdb_data_pipeline_spark.streaming.incremental import (
    stream_incremental_near_dup,
)
from aws_imdb_data_pipeline_spark.streaming.joins import (
    enrich_stream,
    interval_join_streams,
)
from aws_imdb_data_pipeline_spark.streaming.quota import (
    admit_per_source_quota,
)
from aws_imdb_data_pipeline_spark.streaming.stateful import (
    user_event_type_counts,
    user_running_totals,
)

__all__ = [
    "admit_per_source_quota",
    "dedup_events",
    "enrich_stream",
    "interval_join_streams",
    "sessionize",
    "sliding_value_stats",
    "stream_ann_topk",
    "stream_events_from_dir",
    "stream_incremental_near_dup",
    "stream_to_lake",
    "tumbling_counts",
    "user_event_type_counts",
    "user_running_totals",
]
