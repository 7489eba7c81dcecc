"""Z-order operator: interleave correctness vs a Python Morton
reference, SQL-twin equivalence (also oracle-checked in test_parity),
and the clustered-write layout contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.zorder import (
    write_zordered,
    zvalue_column,
    zvalue_sql,
)


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            out += ((v >> i) & 1) << (i * n + (n - 1 - j))
    return out


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 256, 1000) for b in (0, 3, 254, 999)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zvalue_column(["a", "b"], bits=8)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton([a, b], 8), (a, b)


def test_zvalue_sql_twin_matches_column(spark):
    df = spark.createDataFrame([(i, i * 7 % 256) for i in range(300)], ["a", "b"])
    df.createOrReplaceTempView("zt")
    via_sql = spark.sql(
        f"SELECT a, b, {zvalue_sql(['a', 'b'], 8)} AS z FROM zt"
    )
    via_col = df.withColumn("z", zvalue_column(["a", "b"], 8))
    assert via_sql.exceptAll(via_col).count() == 0
    assert via_col.exceptAll(via_sql).count() == 0


def test_write_zordered_files_cover_disjoint_z_ranges(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 251, (i * 17) % 249) for i in range(5000)], ["x", "y"]
    )
    out = str(tmp_path / "zlake")
    write_zordered(df, out, ["x", "y"], bits=8, n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 5000
    # each file owns a contiguous, non-overlapping z-range
    spans = (
        back.withColumn("z", zvalue_column(["x", "y"], 8))
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(spans) >= 2
    ordered = sorted((r["lo"], r["hi"]) for r in spans)
    for (lo1, hi1), (lo2, _) in zip(ordered, ordered[1:]):
        assert hi1 <= lo2, "file z-ranges overlap"
    assert len(os.listdir(out)) > 0
