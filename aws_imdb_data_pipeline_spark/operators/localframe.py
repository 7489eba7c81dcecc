"""Driver-literal frames without the Python-RDD scan.

``spark.createDataFrame(small_python_list)`` parallelizes the rows into
``defaultParallelism`` pickled RDD slices, so EVERY evaluation of the
frame — typically a broadcast build under a join — runs one Python
worker round-trip per slice: 32 Python tasks to ship 16 centroid rows
on the local rig, and (cores)x on any cluster. Measured at sf0.1
(OPTIMIZATION_r14.md): broadcasting a 16-row centroid frame costs
0.62-1.12 s as a createDataFrame vs 0.33 s as a literal plan, and the
pattern repeats at every probe/serve construction.

:func:`local_literal_frame` plans the same rows as a single-partition
JVM-only literal (``range(1) -> Generate inline(array<struct>)``): no
Python worker, no pickle, one task. Values and schema are identical —
every column is explicitly cast to the caller's schema, exactly as
``createDataFrame`` would coerce.

Use it for SMALL frames only (query batches, centroid tables, size/
target literals, one-row results): the rows become plan literals, so
a frame with more than a few thousand scalar cells belongs in
``createDataFrame`` (plan size grows with the literal count). That
cutoff is asserted, not prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

_MAX_LITERAL_CELLS = 20_000


def _parse_schema(spark: SparkSession, schema: str | StructType) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    parsed = _parse_datatype_string(schema)
    if not isinstance(parsed, StructType):
        raise ValueError(f"expected a struct schema, got {parsed}")
    return parsed


def _lit_cell(value, dtype: DataType):
    # None must carry the column's type (lit(None) alone is NullType,
    # which would poison the struct's schema)
    if value is None:
        return F.lit(None).cast(dtype)
    if hasattr(value, "item") and not isinstance(value, (list, tuple)):
        value = value.item()  # numpy scalar -> Python scalar for F.lit
    return F.lit(value).cast(dtype)


def local_literal_frame(
    spark: SparkSession, rows: list[tuple], schema: str | StructType
) -> DataFrame:
    """``rows`` as a single-partition literal DataFrame with ``schema``
    — value-identical to ``spark.createDataFrame(rows, schema)`` but
    planned as a JVM literal Generate instead of a Python RDD scan.

    Falls back to ``createDataFrame`` for empty input (no literal to
    explode) and refuses frames beyond the literal-cell budget."""
    struct_schema = _parse_schema(spark, schema)
    fields = struct_schema.fields
    if not rows:
        return spark.createDataFrame(rows, struct_schema)
    n_cells = len(rows) * len(fields)
    if n_cells > _MAX_LITERAL_CELLS:
        raise ValueError(
            f"local_literal_frame: {n_cells} literal cells exceeds "
            f"{_MAX_LITERAL_CELLS} — a frame this large belongs in "
            "createDataFrame (plan literals are not free)"
        )
    structs = [
        F.struct(
            *[
                _lit_cell(v, f.dataType).alias(f.name)
                for v, f in zip(row, fields)
            ],
            F.lit(True).alias("__keep"),
        )
        for row in rows
    ]
    # one hidden all-NULL sentinel row, filtered back out: literal
    # columns are otherwise non-nullable, and the frame must carry the
    # same NULLABLE schema createDataFrame declares (bare literals
    # would silently tighten converted queries' declared schemas)
    sentinel = F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in fields],
        F.lit(False).alias("__keep"),
    )
    return (
        spark.range(0, 1, 1, 1)
        .select(F.inline(F.array(*structs, sentinel)))
        .filter(F.col("__keep"))
        .drop("__keep")
    )
