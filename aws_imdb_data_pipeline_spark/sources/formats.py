"""Interchange formats beyond gz-TSV and parquet: CSV, JSON-lines, and
ORC read/write with schema preservation.

The reference's lake is parquet-only with TSV ingest
(airflow/dags/imdb_raw_ingest.py, glue_jobs/*); a complete engine also
round-trips the interchange formats users bring. All three are
built-in Spark datasources (splittable, predicate/column pushdown for
ORC; schema-on-read for CSV/JSON with an explicit schema to avoid the
double-scan inference pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_WRITERS = {
    "csv": lambda w: w.option("header", "true"),
    "json": lambda w: w,
    "orc": lambda w: w,
}


def write_interchange(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` as csv/json/orc. CSV gets a header; CSV and JSON
    are text formats — downstream readers should be handed the schema
    (see :func:`read_interchange`) rather than re-inferring it."""
    if fmt not in _WRITERS:
        raise ValueError(f"unsupported format: {fmt!r} (use csv|json|orc)")
    writer = _WRITERS[fmt](df.write.mode(mode).format(fmt))
    writer.save(path)


def read_interchange(
    spark: SparkSession, path: str, fmt: str, schema: StructType | None = None
) -> DataFrame:
    """Read csv/json/orc. Passing ``schema`` skips inference — for CSV/
    JSON, inference is a full extra pass over the data (and for JSON
    can widen types run-to-run); ORC carries its own schema.

    Timestamp note: CSV/JSON serialize timestamps as strings; with an
    explicit schema both round-trip at microsecond precision.
    """
    if fmt not in _WRITERS:
        raise ValueError(f"unsupported format: {fmt!r} (use csv|json|orc)")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        # header option is independent of schema: without it an
        # explicit-schema read parses the header line as a data row
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)
