"""Driver-local frames without the per-core Python-RDD scan.

``spark.createDataFrame(small_python_list)`` parallelizes the rows into
``defaultParallelism`` pickled RDD slices, so EVERY evaluation of the
frame — typically a broadcast build under a join — runs one Python
worker round-trip per slice: 32 Python tasks to ship 16 centroid rows
on the local rig, and (cores)x on any cluster.

Two replacements, routed automatically by :func:`local_literal_frame`
on the frame's literal-cell count (array elements counted):

- **literal plan** (small scalar frames — size/target literals,
  one-row check results): rows become a single-partition JVM
  ``range(1) -> Generate inline(array<struct>)``. No Python worker, no
  pickle, no task fan-out. Measured: broadcasting a 16-row frame costs
  0.33 s vs 0.62-1.12 s for the 32-slice createDataFrame.
- **single-slice createDataFrame** (wider frames — centroid tables
  with 64-float payloads): plan-literal ANALYSIS cost grows with the
  cell count and overtakes the execution win (measured on the IVF
  serve path: literal 2.9 s vs single-slice 1.4 s end-to-end), so
  bigger frames keep createDataFrame but as ONE pickled slice — one
  Python round-trip per evaluation instead of one per core.

Values and schema are identical to ``createDataFrame(rows, schema)``
in both regimes (the literal branch casts every cell to the declared
schema and keeps columns nullable via a filtered-out all-NULL sentinel
row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

# routing threshold between the literal plan and the single-slice
# pickled form, in literal cells (array/struct elements counted):
# measured crossover on the IVF serve path sits near the 16x64
# centroid table (1k cells, literal loses); 3-row scalar frames
# (literal wins) are two orders below it
_LITERAL_CELL_CUTOFF = 256


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


def _cell_count(rows: list[tuple]) -> int:
    n = 0
    for row in rows:
        for v in row:
            n += len(v) if isinstance(v, (list, tuple)) else 1
    return n


def single_slice_frame(
    spark: SparkSession, rows: list[tuple], schema: str | StructType
) -> DataFrame:
    """``createDataFrame`` over ONE pickled slice: identical values and
    schema, one Python round-trip per evaluation instead of one per
    core."""
    struct_schema = _parse_schema(spark, schema)
    if not rows:
        return spark.createDataFrame(rows, struct_schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), struct_schema
    )


def local_literal_frame(
    spark: SparkSession, rows: list[tuple], schema: str | StructType
) -> DataFrame:
    """``rows`` as a single-partition DataFrame with ``schema`` —
    value-identical to ``spark.createDataFrame(rows, schema)`` but
    planned either as a JVM literal Generate (small frames) or a
    single-slice pickled RDD (wider frames), never as one RDD slice
    per core. See the module docstring for the measured crossover."""
    struct_schema = _parse_schema(spark, schema)
    fields = struct_schema.fields
    if not rows:
        return spark.createDataFrame(rows, struct_schema)
    if _cell_count(rows) > _LITERAL_CELL_CUTOFF:
        return single_slice_frame(spark, rows, struct_schema)
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
