r"""IMDb-shaped TSV reader.

Re-expresses the reference's raw-zone scan (S1):
``spark.read.options(delimiter='\t', header='true').csv(path)`` with
every column string-typed and the IMDb ``\N`` null sentinel
(reference: glue_jobs/etl_movies_episodes_analytics_advanced.py:53-60).

Improvement over the reference: the sentinel is handled at scan time
via ``nullValue`` so no per-column ``when(col != '\N')`` scrubbing is
needed downstream, and an optional typed schema avoids a second pass
of casts. Both behaviors are flag-controlled so quirk-faithful mode
is still available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_imdb_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    null_sentinel: str | None = r"\N",
    header: bool = True,
) -> DataFrame:
    """Read a (possibly gzipped) tab-separated file.

    Gzip decompression is automatic in Spark's text-based sources.
    With ``schema=None`` every column is string (the reference's
    behavior); pass a ``StructType`` for typed reads where malformed
    values become NULL (PERMISSIVE mode) — the tolerant-cast semantics
    the reference gets from Snowflake TRY_TO_NUMBER (batch.py:228-239).
    """
    reader = spark.read.options(sep="\t", header=str(header).lower())
    if null_sentinel is not None:
        reader = reader.options(nullValue=null_sentinel)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)
