from aws_imdb_data_pipeline_spark.lifecycle.artifacts import (
    artifact_dir,
    ensure_artifact,
    source_fingerprint,
)
from aws_imdb_data_pipeline_spark.lifecycle.retention import (
    expire_runs,
    list_run_partitions,
)
from aws_imdb_data_pipeline_spark.lifecycle.runs import (
    RunManifest,
    write_manifest,
    read_manifest,
    content_changed,
)
from aws_imdb_data_pipeline_spark.lifecycle.catalog import (
    register_lake_table,
    refresh_table,
)
from aws_imdb_data_pipeline_spark.lifecycle.warehouse import (
    staged_load,
    typed_projection,
)

__all__ = [
    "artifact_dir",
    "ensure_artifact",
    "source_fingerprint",
    "expire_runs",
    "list_run_partitions",
    "RunManifest",
    "write_manifest",
    "read_manifest",
    "content_changed",
    "register_lake_table",
    "refresh_table",
    "staged_load",
    "typed_projection",
]
