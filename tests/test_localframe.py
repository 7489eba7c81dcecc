"""local_literal_frame: value/schema parity with createDataFrame and
the plan property the optimization relies on (no Python-RDD scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.operators.localframe import (
    _LITERAL_CELL_CUTOFF,
    local_literal_frame,
)


def test_values_and_schema_match_createdataframe(spark):
    rows = [
        (0, [0.5, 1.5], "a", True, None),
        (1, [2.0, -3.25], None, False, 7),
    ]
    schema = (
        "id bigint, vec array<double>, name string, flag boolean, opt int"
    )
    a = spark.createDataFrame(rows, schema)
    b = local_literal_frame(spark, rows, schema)
    assert b.schema == a.schema
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, a.collect()))


def test_plans_without_python_rdd_scan(spark):
    df = local_literal_frame(spark, [(1,), (2,)], "x int")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # createDataFrame plans as "Scan ExistingRDD" — the Python-RDD
    # scan whose every evaluation is a Python worker round-trip per
    # slice. The literal form must not.
    assert "ExistingRDD" not in plan
    # single partition: no fan-out of near-empty tasks
    assert df.rdd.getNumPartitions() == 1


def test_numpy_scalars_coerce(spark):
    np = pytest.importorskip("numpy")
    rows = [(np.int64(3), np.float64(0.5), np.bool_(True))]
    df = local_literal_frame(spark, rows, "a long, b double, c boolean")
    assert df.collect() == [(3, 0.5, True)]


def test_empty_rows_fall_back(spark):
    df = local_literal_frame(spark, [], "a int, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_wide_frames_route_to_single_slice(spark):
    """Above the literal-cell cutoff (array elements counted) the
    helper must route to a SINGLE-slice pickled frame: plan-literal
    analysis cost overtakes the execution win there, but the per-core
    slice fan-out must never come back."""
    rows = [(i, [float(j) for j in range(64)]) for i in range(16)]
    assert 16 * 65 > _LITERAL_CELL_CUTOFF
    df = local_literal_frame(spark, rows, "id bigint, vec array<double>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan  # createDataFrame form...
    assert df.rdd.getNumPartitions() == 1  # ...but one slice, not 32
    ref = spark.createDataFrame(rows, "id bigint, vec array<double>")
    assert df.schema == ref.schema
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_sized_write_restores_conf(spark):
    from aws_imdb_data_pipeline_spark.lifecycle.artifacts import sized_write

    pf = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    before = spark.conf.get(pf, None)
    with sized_write(spark, advisory="32m"):
        assert spark.conf.get(pf) == "false"
        assert (
            spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes"
            )
            == "32m"
        )
    assert spark.conf.get(pf, None) == before


def test_band_index_one_file_per_band(spark, tmp_path):
    """The artifact compaction contract: one parquet part file per
    band dir (sliver files cost one scan task per file per consumer)."""
    import glob
    import os

    from aws_imdb_data_pipeline_spark.extensions.dedup import (
        build_minhash_band_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i}") for i in range(40)],
        "doc_id long, text string",
    ).repartition(8)
    build_minhash_band_index(
        docs, "doc_id", "text", str(tmp_path / "band"), k=3, num_hashes=8,
        bands=4,
    )
    band_dirs = sorted(glob.glob(str(tmp_path / "band" / "bands" / "band=*")))
    assert len(band_dirs) == 4
    for d in band_dirs:
        parts = [p for p in os.listdir(d) if p.startswith("part-")]
        assert len(parts) == 1, (d, parts)
