"""Query registry: every implemented operator from SURVEY.md §2 is bound
here to (a) a Spark DataFrame implementation and (b) an ANSI-SQL oracle
string DuckDB can run on the same parquet tables.

Importing this package populates the registry.
"""

from aws_imdb_data_pipeline_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    register,
    queries,
    oracles,
)

# Populate the registry (order matters only for display).
from aws_imdb_data_pipeline_spark.plans import relational  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational2  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational3  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import relational4  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import quality  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import extensions  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import streaming_batch  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import measures  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import behavioral  # noqa: E402,F401
from aws_imdb_data_pipeline_spark.plans import corpus  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracles"]
