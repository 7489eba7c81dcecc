from aws_imdb_data_pipeline_spark.operators.topk import top_n_per_group, top_k_global
from aws_imdb_data_pipeline_spark.operators.latest import latest_run_filter
from aws_imdb_data_pipeline_spark.operators.temporal import asof_join, interval_join
from aws_imdb_data_pipeline_spark.operators.agg_patterns import (
    ordered_collect_concat,
    grouped_profile,
    salted_aggregate,
)

__all__ = [
    "top_n_per_group",
    "top_k_global",
    "latest_run_filter",
    "ordered_collect_concat",
    "grouped_profile",
    "salted_aggregate",
    "asof_join",
    "interval_join",
]
