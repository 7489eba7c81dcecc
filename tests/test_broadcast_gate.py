"""Size-gated broadcast on SF-scaled dimensions (r12 verdict #1): the
~27 customer/supplier/part hint sites must hint below the footprint
budget (shipped lakes — bench plans unchanged) and LEAVE THE DECISION
TO AQE above it (100 TB design point: a forced broadcast of a
corpus-scaled table is a guaranteed OOM). Both regimes produce
identical results; only where the join strategy is decided moves.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.sources.tables import (
    DEFAULT_DIM_BROADCAST_BYTES,
    load_table,
    maybe_broadcast,
    table_bytes,
)

# Headline queries the sf100 sweep measured super-linear under the
# forced hint (SCALE §53) — the gate's primary beneficiaries.
GATED = ["shipping_priority", "top_parts_by_brand_revenue",
         "order_part_names"]


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_table_bytes_is_stat_only(sf_dir):
    got = table_bytes(sf_dir, "part")
    want = os.stat(os.path.join(sf_dir, "part.parquet")).st_size
    assert got == want > 0
    # every shipped dimension sits far under the default budget
    for t in ("customer", "supplier", "part"):
        assert table_bytes(sf_dir, t) < DEFAULT_DIM_BROADCAST_BYTES


def test_gate_hints_below_budget(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    hinted = maybe_broadcast(part, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    plan = _analyzed(li.join(hinted, li.l_partkey == hinted.p_partkey))
    assert "ResolvedHint" in plan


def test_gate_defers_to_aqe_above_budget(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_BYTES", "0")
    part = load_table(spark, sf_dir, "part")
    ungated = maybe_broadcast(part, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    plan = _analyzed(li.join(ungated, li.l_partkey == ungated.p_partkey))
    assert "ResolvedHint" not in plan


@pytest.mark.parametrize("name", GATED)
def test_both_regimes_same_rows(name, spark, sf_dir, monkeypatch):
    """The gate only moves WHERE the strategy is decided — values are
    identical either way, and with the hint stripped the engine (AQE /
    size estimate) still picks a working plan on the tiny lake."""
    from aws_imdb_data_pipeline_spark.plans import REGISTRY

    hinted = REGISTRY[name].fn(spark, sf_dir)
    assert "ResolvedHint" in _analyzed(hinted), "gate must hint here"
    want = sorted(map(tuple, hinted.collect()))

    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_BYTES", "0")
    unhinted = REGISTRY[name].fn(spark, sf_dir)
    assert "ResolvedHint" not in _analyzed(unhinted)
    assert sorted(map(tuple, unhinted.collect())) == want
