"""Incremental aggregate maintenance and interchange-format round
trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_imdb_data_pipeline_spark.lifecycle.incremental import (
    update_aggregate_state,
)
from aws_imdb_data_pipeline_spark.sources.formats import (
    read_interchange,
    write_interchange,
)
from aws_imdb_data_pipeline_spark.sources.tables import load_table

MEASURES = {
    "revenue": ("sum", "o_totalprice"),
    "n_orders": ("count", "o_orderkey"),
    "first_order": ("min", "o_orderdate"),
    "last_order": ("max", "o_orderdate"),
}


def test_incremental_state_matches_full_recompute(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < "1998-01-01")
    late = orders.filter(F.col("o_orderdate") >= "1998-01-01")
    state_path = str(tmp_path / "state")

    update_aggregate_state(
        spark, state_path, early, ["o_orderpriority"], MEASURES, slice_id="early"
    )
    state = update_aggregate_state(
        spark, state_path, late, ["o_orderpriority"], MEASURES, slice_id="late"
    )

    full = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count("o_orderkey").alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )
    got = {
        r["o_orderpriority"]: (round(r["revenue"], 4), r["n_orders"],
                               r["first_order"], r["last_order"])
        for r in state.collect()
    }
    want = {
        r["o_orderpriority"]: (round(r["revenue"], 4), r["n_orders"],
                               r["first_order"], r["last_order"])
        for r in full.collect()
    }
    assert got == want


def test_incremental_state_skips_replayed_slice(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    state_path = str(tmp_path / "state2")
    s1 = update_aggregate_state(
        spark, state_path, orders, ["o_orderstatus"], MEASURES, slice_id="all"
    )
    n1 = {r["o_orderstatus"]: r["n_orders"] for r in s1.collect()}
    # replaying the same slice id must not double-count
    s2 = update_aggregate_state(
        spark, state_path, orders, ["o_orderstatus"], MEASURES, slice_id="all"
    )
    n2 = {r["o_orderstatus"]: r["n_orders"] for r in s2.collect()}
    assert n1 == n2


def test_interchange_round_trips_preserve_schema(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").limit(200)
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / f"o_{fmt}")
        write_interchange(orders, path, fmt)
        back = read_interchange(spark, path, fmt, schema=orders.schema)
        assert back.schema == orders.schema, fmt
        assert back.count() == 200, fmt
        # spot-check values survive the text formats too
        a = {r["o_orderkey"]: r["o_totalprice"] for r in back.collect()}
        b = {r["o_orderkey"]: r["o_totalprice"] for r in orders.collect()}
        assert a == b, fmt
