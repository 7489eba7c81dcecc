"""Z-order (Morton) multi-dimensional clustering for data skipping.

Sorting a table by one column gives perfect zone-map pruning on that
column and none on any other; interleaving the bits of several columns
(the Z-order curve) gives GOOD pruning on each of them simultaneously.
Lakehouse formats expose this as ``OPTIMIZE ... ZORDER BY``; here it is
a pure Spark expression + range-partitioned sorted write on bare
parquet: row groups end up covering narrow ranges of EVERY z-column,
so parquet min/max stats skip row groups for predicates on any of
them.

The z-value is built entirely from JVM bitwise ops (shiftright/
bitwiseAND/shiftleft/sum) — codegen'd, no UDF, and exactly mirrored by
the SQL twin for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_column(cols: list[str], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Bit i of column j lands at output position ``i * n_cols + j`` —
    column 0 takes the most significant position within each round.
    Columns are masked to ``bits`` bits first; for real tables,
    pre-map each column to a bounded rank (e.g. ``pmod`` for uniform
    ints, range-bucketing for skewed ones) so the mask loses nothing
    it shouldn't.
    """
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        masked = F.col(c).cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            bit = F.shiftright(masked, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + (n - 1 - j)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(cols: list[str], bits: int = 8) -> str:
    """ANSI-SQL twin of :func:`zvalue_column` (same bit layout), for
    oracle checks and for engines without the DataFrame API."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            # outer parens are load-bearing: in ANSI/DuckDB precedence,
            # + binds tighter than <<, so a bare "x << 1 + y << 3"
            # parses as x << ((1 + y) << 3)
            terms.append(
                f"(((({c} & {mask}) >> {i}) & 1) << {i * n + (n - 1 - j)})"
            )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered along the Z-order curve of ``zcols``:
    range-partition on the z-value (each output file owns a contiguous
    z-range), sort within partitions (row groups inside a file are
    z-contiguous too), drop the helper column, write parquet.

    Scale: repartitionByRange samples the z-value distribution, so
    skewed composites still give balanced files; the sort is per
    partition, never global.
    """
    z = df.withColumn("__z", zvalue_column(zcols, bits))
    parted = (
        z.repartitionByRange(n_files, "__z")
        if n_files
        else z.repartitionByRange("__z")
    )
    parted.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
