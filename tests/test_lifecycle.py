"""Lifecycle: manifests, change detection, catalog registration."""

from __future__ import annotations

import json
import os

from aws_imdb_data_pipeline_spark.lifecycle import (
    RunManifest,
    content_changed,
    read_manifest,
    register_lake_table,
    refresh_table,
    write_manifest,
)
from aws_imdb_data_pipeline_spark.sources.lake import write_partitioned


def test_manifest_roundtrip(tmp_path):
    m = RunManifest(run_date="2024-01-15")
    m.record("title_basics", "downloaded", md5="abc", size=100)
    m.record("title_ratings", "skipped_unchanged")
    path = write_manifest(m, str(tmp_path / "run"))
    assert os.path.exists(path)
    assert os.path.exists(str(tmp_path / "run" / "_SUCCESS"))
    back = read_manifest(str(tmp_path / "run"))
    assert back["run_date"] == "2024-01-15"
    assert back["status_counts"] == {"downloaded": 1, "skipped_unchanged": 1}


def test_content_changed_control_file(tmp_path):
    ctl = str(tmp_path / "ctl" / "title_basics.json")
    meta1 = {"etag": "e1", "content_length": 100}
    assert content_changed(ctl, meta1)          # first sight → changed
    assert not content_changed(ctl, meta1)      # unchanged → skip
    assert content_changed(ctl, {"etag": "e2", "content_length": 120})
    assert json.load(open(ctl))["etag"] == "e2"  # control updated


def test_register_lake_table_sees_new_partitions(spark, tmp_path):
    lake = str(tmp_path / "facts")
    d1 = spark.createDataFrame([("r1", 1)], ["run_date", "v"])
    write_partitioned(d1, lake, ["run_date"])
    tbl = "test_facts_catalog"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    df = register_lake_table(spark, tbl, lake)
    assert df.count() == 1
    # new partition lands outside the catalog's knowledge → refresh
    d2 = spark.createDataFrame([("r2", 2)], ["run_date", "v"])
    write_partitioned(d2, lake, ["run_date"])
    refresh_table(spark, tbl)
    assert spark.table(tbl).count() == 2
    # partition-pruned read (S6): filter on the partition column
    assert spark.table(tbl).filter("run_date = 'r2'").count() == 1
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
