from aws_imdb_data_pipeline_spark.functions.cleaning import (
    null_sentinel_cast,
    try_cast,
    coalesce_bool_as_int,
    banding,
)
from aws_imdb_data_pipeline_spark.functions.derive import (
    decade,
    decade_label,
    year_span,
    zero_pad,
)

__all__ = [
    "null_sentinel_cast",
    "try_cast",
    "coalesce_bool_as_int",
    "banding",
    "decade",
    "decade_label",
    "year_span",
    "zero_pad",
]
