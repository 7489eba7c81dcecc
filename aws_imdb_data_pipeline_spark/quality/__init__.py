from aws_imdb_data_pipeline_spark.quality.profile import dq_profile, dq_union
from aws_imdb_data_pipeline_spark.quality.observe import (
    attach_metrics,
    standard_metrics,
)
from aws_imdb_data_pipeline_spark.quality.expectations import (
    ExpectationResult,
    expect_not_null,
    expect_values_between,
    expect_unique,
    expect_min_rows,
    validate,
)

__all__ = [
    "attach_metrics",
    "standard_metrics",
    "dq_profile",
    "dq_union",
    "ExpectationResult",
    "expect_not_null",
    "expect_values_between",
    "expect_unique",
    "expect_min_rows",
    "validate",
]
