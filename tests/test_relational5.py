"""Physical-plan audits for the fifth relational batch's decision-
support shapes (conditional semi join, broadcast dim chains,
argmax-by-join, anti join). Value parity vs DuckDB is covered by
tests/test_parity.py's registry-wide sweep."""

from __future__ import annotations

from tests.test_plans import plan_of


def test_late_shipment_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "late_shipment_priority")
    # the correlated EXISTS must plan as a semi join (no distinct, no
    # row-multiplying inner join feeding the count)
    assert "LeftSemi" in plan


def test_nation_trade_fact_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "nation_trade_by_year")
    # supplier, customer, and both nation attachments broadcast; the
    # only big-big exchange is lineitem<->orders on the order key
    assert plan.count("BroadcastHashJoin") >= 4


def test_top_supplier_no_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_supplier")
    # the scalar-max argmax is a broadcast join, not a global window
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_dormant_rich_plans_anti_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dormant_rich_customers")
    assert "LeftAnti" in plan
