"""Catalog registration (S5, S11) — the Glue-crawler/Athena-catalog
role, Spark-native.

The reference runs a Glue crawler after each write so Athena can see
new partitions (batch.py:42-61,129-133). In Spark the catalog is the
session's metastore: register the lake path once as an external
partitioned table, then ``MSCK REPAIR TABLE`` / ``refreshTable`` picks
up new partition directories — milliseconds, not a 20-minute crawler
budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_lake_table(
    spark: SparkSession,
    name: str,
    path: str,
    refresh_partitions: bool = True,
    analyze: bool = False,
) -> DataFrame:
    """Register a Hive-partitioned parquet directory as catalog table
    ``name`` (idempotent). Partition columns are discovered from the
    directory layout; MSCK REPAIR syncs the partition metadata.

    ``analyze=True`` runs ANALYZE TABLE COMPUTE STATISTICS so the
    cost-based optimizer (joinReorder, broadcast decisions) has
    rowCount/sizeInBytes — one extra scan at registration time that
    pays for itself across every subsequent multi-join query."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} USING PARQUET LOCATION '{path}'"
    )
    if refresh_partitions:
        try:
            spark.sql(f"MSCK REPAIR TABLE {name}")
        except Exception:
            # non-partitioned layout — nothing to repair
            pass
    if analyze:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    return spark.table(name)


def refresh_table(spark: SparkSession, name: str) -> None:
    """Invalidate cached file listings after an external write
    (the crawler-refresh equivalent, batch.py:129-133)."""
    spark.catalog.refreshTable(name)
    try:
        spark.sql(f"MSCK REPAIR TABLE {name}")
    except Exception:
        pass
