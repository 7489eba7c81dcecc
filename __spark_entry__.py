"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query on /root/testdata/sf0.001 (smoke).
- ``queries()``      — every implemented operator (SURVEY.md §2 + extensions),
                       callables (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``   — DuckDB-equivalent SQL per query (correctness gate).

The registry lives in ``aws_imdb_data_pipeline_spark.plans``; importing
it populates both mappings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_imdb_data_pipeline_spark.plans import oracles as _oracles
from aws_imdb_data_pipeline_spark.plans import queries as _queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-3 parts per brand by discounted revenue —
    broadcast join + grouped agg + ranked window + projection."""
    return _queries()["top_parts_by_brand_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracles()
