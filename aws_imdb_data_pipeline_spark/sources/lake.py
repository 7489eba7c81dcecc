"""Partitioned parquet lake writer (S2-S4, S9, L2).

The reference writes Hive-partitioned parquet with a pre-write
``repartition`` on the partition columns so each partition gets ~1
file (glue.py:195-202), and gets idempotency from a warehouse-side
DELETE+INSERT (batch.py:211-299). Here both are Spark-native:

- ``write_partitioned``: repartition-by-partition-columns + partitionBy
  append, with ``maxRecordsPerFile`` bounding file size (session conf).
- ``replace_run_partition``: dynamic partition overwrite — re-running a
  run_date replaces exactly that slice instead of appending duplicates
  (fixes the reference's append-duplication risk, SURVEY §4.3).

At 100 TB the repartition-by-partition-cols shuffle is what keeps the
file count sane (one task per output partition instead of
tasks x partitions small files); skewed partitions are split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
    compact: bool = True,
    cluster_by: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write, optionally compacted to ~1 file
    per partition (reference: glue.py:195-202).

    ``cluster_by`` sorts rows within each output file — the Spark-side
    equivalent of the reference's warehouse CLUSTER BY
    (batch.py:194-196): parquet row-group min/max stats on the sorted
    columns let later scans skip row groups (zone-map pruning)."""
    out = df.repartition(*partition_cols) if compact and partition_cols else df
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def replace_run_partition(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    compact: bool = True,
) -> None:
    """Idempotent slice replacement via dynamic partition overwrite.

    Only partitions present in ``df`` are overwritten, all other
    slices are untouched — the Spark-native equivalent of the
    reference's per-run_date DELETE+INSERT (batch.py:217,246,280).
    The overwrite mode is pinned per-write (not session conf) so the
    semantics hold in ANY session — under the default STATIC mode this
    write would silently wipe every other run's partitions.
    """
    out = df.repartition(*partition_cols) if compact and partition_cols else df
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
