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


def test_staged_load_idempotent_and_typed(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.lifecycle.warehouse import staged_load

    # build a stage: run_date partitions with all-string payloads
    stage = str(tmp_path / "stage")
    raw = spark.createDataFrame(
        [("d1", "1", "8.5"), ("d1", "2", "oops"), ("d2", "3", "6.0")],
        ["run_date", "id", "rating"],
    )
    raw.write.partitionBy("run_date").parquet(stage)

    lake = str(tmp_path / "wh")
    out = staged_load(
        spark, stage, "d1", lake, casts={"id": "long", "rating": "double"}
    )
    rows = {r.id: r.rating for r in out.collect()}
    assert rows == {1: 8.5, 2: None}  # tolerant cast: 'oops' → NULL
    assert dict(out.dtypes)["id"] == "bigint"

    # load d2, then re-load d1 → no duplication, both slices present
    staged_load(spark, stage, "d2", lake, casts={"id": "long", "rating": "double"})
    staged_load(spark, stage, "d1", lake, casts={"id": "long", "rating": "double"})
    final = spark.read.parquet(lake)
    assert final.count() == 3
    assert {r.run_date for r in final.select("run_date").distinct().collect()} == {"d1", "d2"}


def test_ingest_change_detection_and_manifest(tmp_path):
    import gzip
    import json

    from aws_imdb_data_pipeline_spark.lifecycle.ingest import (
        ingest_datasets,
        latest_slice,
    )

    payloads = {"title_basics": b"tconst\tstartYear\nt1\t1994\n"}
    etags = {"title_basics": "e1"}

    def fetcher(name):
        data = gzip.compress(payloads[name])
        meta = {"etag": etags[name], "content_length": len(data)}
        return meta, lambda: iter([data[:10], data[10:]])

    lake = str(tmp_path / "raw")
    r1 = ingest_datasets(["title_basics"], fetcher, lake, "2024-01-15")
    assert r1.statuses == {"title_basics": "downloaded"}
    slice_dir = latest_slice(lake, "title_basics")
    assert slice_dir.endswith("run_date=2024-01-15")

    # unchanged remote → skipped, latest pointer NOT advanced
    r2 = ingest_datasets(["title_basics"], fetcher, lake, "2024-01-16")
    assert r2.statuses == {"title_basics": "skipped_unchanged"}
    assert latest_slice(lake, "title_basics").endswith("2024-01-15")
    m = json.load(open(r2.manifest_path))
    assert m["status_counts"] == {"skipped_unchanged": 1}

    # changed remote → downloaded again, pointer advances
    etags["title_basics"] = "e2"
    r3 = ingest_datasets(["title_basics"], fetcher, lake, "2024-01-17")
    assert r3.statuses == {"title_basics": "downloaded"}
    assert latest_slice(lake, "title_basics").endswith("2024-01-17")
    assert json.load(open(r3.manifest_path))["files"]["title_basics"]["md5"]


def test_ingest_failed_download_is_retried(tmp_path):
    """A crash mid-download must NOT advance the control file — the next
    run has to see the dataset as changed and retry, or the slice is
    silently lost forever (write-control-after-success ordering)."""
    import gzip

    import pytest

    from aws_imdb_data_pipeline_spark.lifecycle.ingest import ingest_datasets

    data = gzip.compress(b"tconst\nt1\n")
    calls = {"n": 0}

    def failing_fetcher(name):
        meta = {"etag": "e1", "content_length": len(data)}

        def payload():
            calls["n"] += 1
            if calls["n"] == 1:
                raise ConnectionError("transfer died mid-stream")
            return iter([data])

        return meta, lambda: payload()

    lake = str(tmp_path / "raw_retry")
    with pytest.raises(ConnectionError):
        ingest_datasets(["title_basics"], failing_fetcher, lake, "2024-03-01")

    # retry with identical remote metadata must download, not skip
    r2 = ingest_datasets(["title_basics"], failing_fetcher, lake, "2024-03-02")
    assert r2.statuses == {"title_basics": "downloaded"}

    # and a third run with unchanged metadata now skips
    r3 = ingest_datasets(["title_basics"], failing_fetcher, lake, "2024-03-03")
    assert r3.statuses == {"title_basics": "skipped_unchanged"}


def test_ingested_tsv_reads_into_spark(spark, tmp_path):
    import gzip

    from aws_imdb_data_pipeline_spark.lifecycle.ingest import (
        ingest_datasets,
        latest_slice,
    )
    from aws_imdb_data_pipeline_spark.sources import read_imdb_tsv

    tsv = "tconst\tstartYear\nt1\t1994\nt2\t\\N\n"

    def fetcher(name):
        data = gzip.compress(tsv.encode())
        return {"etag": "x", "content_length": len(data)}, lambda: iter([data])

    lake = str(tmp_path / "raw2")
    ingest_datasets(["title_basics"], fetcher, lake, "2024-02-01")
    df = read_imdb_tsv(spark, latest_slice(lake, "title_basics"))
    rows = {r.tconst: r.startYear for r in df.collect()}
    assert rows == {"t1": "1994", "t2": None}


def test_register_with_analyze_records_stats(spark, tmp_path):
    from aws_imdb_data_pipeline_spark.sources.lake import write_partitioned

    lake = str(tmp_path / "stats_lake")
    df = spark.createDataFrame([("r1", i) for i in range(100)], ["run_date", "v"])
    write_partitioned(df, lake, ["run_date"])
    tbl = "test_stats_catalog"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    register_lake_table(spark, tbl, lake, analyze=True)
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    stats = [r.data_type for r in detail if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0]  # rowCount recorded for CBO
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_retention_expires_old_runs_keeps_latest(spark, tmp_path):
    """expire_runs drops all but the newest keep_last run partitions at
    the directory level; the latest-run view is unaffected, dry_run
    plans without deleting, and keep_last < 1 refuses."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from aws_imdb_data_pipeline_spark.lifecycle.retention import (
        expire_runs,
        list_run_partitions,
    )
    from aws_imdb_data_pipeline_spark.operators.latest import (
        latest_run_filter,
    )

    lake = str(tmp_path / "lake")
    for i, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]):
        spark.createDataFrame(
            [(i * 10 + j, day) for j in range(3)], ["id", "run_date"]
        ).write.mode("append").partitionBy("run_date").parquet(lake)

    assert list_run_partitions(lake) == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"
    ]
    plan = expire_runs(lake, keep_last=2, dry_run=True)
    assert plan["expired"] == ["2024-01-01", "2024-01-02"]
    assert plan["reclaimed_bytes"] > 0
    assert list_run_partitions(lake)[0] == "2024-01-01"  # nothing deleted

    out = expire_runs(lake, keep_last=2)
    assert out["kept"] == ["2024-01-03", "2024-01-04"]
    assert out["expired"] == ["2024-01-01", "2024-01-02"]
    assert out["failed"] == []  # bytes counted only for verified-gone dirs
    assert out["reclaimed_bytes"] == plan["reclaimed_bytes"]
    assert list_run_partitions(lake) == ["2024-01-03", "2024-01-04"]
    assert not os.path.isdir(os.path.join(lake, "run_date=2024-01-01"))

    remaining = spark.read.parquet(lake)
    latest = latest_run_filter(remaining)
    # partition values type-infer to DATE on read; compare as strings
    assert {str(r.run_date) for r in latest.select("run_date").collect()} == {
        "2024-01-04"
    }
    assert remaining.count() == 6

    with pytest.raises(ValueError, match="keep_last"):
        expire_runs(lake, keep_last=0)


def test_retention_refuses_mixed_width_keys(tmp_path):
    import os

    import pytest

    from aws_imdb_data_pipeline_spark.lifecycle.retention import (
        list_run_partitions,
    )

    lake = str(tmp_path / "lake")
    for v in ["9", "10"]:
        os.makedirs(os.path.join(lake, f"run_date={v}"))
    with pytest.raises(ValueError, match="mixed-width"):
        list_run_partitions(lake)
