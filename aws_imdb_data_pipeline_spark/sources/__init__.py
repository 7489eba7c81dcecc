from aws_imdb_data_pipeline_spark.sources.tables import TABLES, load_table, register_views
from aws_imdb_data_pipeline_spark.sources.tsv import (
    read_imdb_tsv,
    read_imdb_tsv_with_quarantine,
)
from aws_imdb_data_pipeline_spark.sources.lake import (
    write_partitioned,
    replace_run_partition,
)
from aws_imdb_data_pipeline_spark.sources.bucketed import (
    write_bucketed_table,
    bucketed_join,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_imdb_tsv",
    "read_imdb_tsv_with_quarantine",
    "write_partitioned",
    "replace_run_partition",
    "write_bucketed_table",
    "bucketed_join",
]
