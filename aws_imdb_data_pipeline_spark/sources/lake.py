"""Partitioned parquet lake writer (S2-S4, S9, L2) and keyed merge.

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

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
    compact: bool = True,
    cluster_by: list[str] | None = None,
    bloom_filter_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write, optionally compacted to ~1 file
    per partition (reference: glue.py:195-202).

    ``cluster_by`` clusters rows on the listed columns — the
    Spark-side equivalent of the reference's warehouse CLUSTER BY
    (batch.py:194-196) — at two granularities:

    - WITHIN files always: rows are sorted inside each output file, so
      parquet row-group min/max stats segment the key and range scans
      skip row groups (zone-map pruning; layout pinned by
      tests/test_sources.py, effect measured in SCALE.md §15).
    - ACROSS files too, when there are no Hive ``partition_cols``: the
      frame is ``repartitionByRange`` on the cluster key first, so
      each FILE owns a disjoint key range and a selective scan skips
      whole files from the footer alone. (With Hive partitions the
      file layout is owned by the partition columns; clustering then
      only orders within each partition's file.)

    ``bloom_filter_cols`` writes a parquet bloom filter per listed
    column — the point-lookup complement to zone maps: min/max stats
    prune ranges on SORTED columns, blooms prune row groups on
    equality predicates over UNSORTED high-cardinality keys (user_id,
    orderkey), where every row group's min/max spans the whole domain.
    Costs ~1 MB/row-group/column at write; pays off on any selective
    key lookup at read (the reader consults the bloom before touching
    the pages). parquet-mr skips the bloom for fully
    dictionary-encoded chunks (the dictionary is already an exact
    filter), so only genuinely high-cardinality chunks pay the bytes."""
    out = df.repartition(*partition_cols) if compact and partition_cols else df
    if cluster_by:
        if not partition_cols:
            out = out.repartitionByRange(*cluster_by)
        out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode(mode)
    for col in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
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


def read_lake(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    """Read the partitioned lake tolerating per-run schema EVOLUTION:
    columns added in later runs union into one schema (``mergeSchema``
    combines parquet footers at planning time — a metadata pass, not a
    data scan), and rows written before a column existed surface as
    NULL in it. Pair with ``replace_run_partition``: run N+1 can start
    writing a new metric without rewriting history, and every
    latest-run consumer sees the full evolved schema.

    Partition pruning and filter pushdown are unaffected (the merged
    schema only widens the projection). Column REMOVAL or retyping is
    deliberately NOT masked — Spark fails loudly on an incompatible
    merge, which is the correct lakehouse contract: additive evolution
    is routine, destructive evolution needs a migration."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
    staging_dir: str | None = None,
) -> None:
    """MERGE INTO for a plain-parquet table: rows in ``updates`` replace
    target rows with the same key; unmatched update rows insert;
    untouched target rows survive. The upsert half of what table
    formats (Delta/Iceberg) do transactionally, expressed on bare
    parquet.

    Scale shape: with ``partition_cols``, only the partitions the
    updates TOUCH are read and rewritten — the target slice is loaded
    with a partition-pruned scan (semi join against the updates'
    distinct partition values, broadcast), survivors are found with an
    anti join on the key, and the dynamic-overwrite commit replaces
    exactly those slices. A 100 TB table with a 1-partition update
    rewrites one partition, not the table. Without ``partition_cols``
    the whole table is rewritten (documented cost of formatless MERGE).

    Because the plan both reads and overwrites ``path``, the merged
    slice is materialized to a staging directory first, then the
    commit re-reads staging — a lazy plan that read its own overwrite
    target mid-write would corrupt it. Staging adds one extra write of
    the affected slice only; table formats avoid it with metadata
    commits, which plain parquet does not have.
    """
    staging = staging_dir or f"{path}__staging_{uuid.uuid4().hex[:8]}"
    target = spark.read.parquet(path)
    if partition_cols:
        touched = updates.select(*partition_cols).distinct()
        slice_df = target.join(F.broadcast(touched), partition_cols, "left_semi")
    else:
        slice_df = target
    survivors = slice_df.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = survivors.unionByName(updates.select(*survivors.columns))
    merged.write.mode("overwrite").parquet(staging)
    if not partition_cols:
        # staging IS the new table — swap it into place, no second write
        shutil.rmtree(path)
        shutil.move(staging, path)
        return
    try:
        replace_run_partition(spark.read.parquet(staging), path, partition_cols)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
