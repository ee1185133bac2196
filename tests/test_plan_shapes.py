"""Physical-plan regression guards: the performance properties the
engine is designed around, asserted structurally so a refactor that
silently loses a broadcast or doubles a sort fails CI, not production.
Uses the post-AQE executed plan (the pre-execution explain prints
Initial+Final and double-counts operators)."""

from __future__ import annotations

import re

import pytest

from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES
from tests.conftest import SF_SMOKE


def executed_plan(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # keep only the final adaptive plan
    return plan.split("+- == Initial Plan ==")[0]


def test_pricing_summary_scan_pruned_and_pushed(spark):
    plan = executed_plan(spark, "pricing_summary")
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1)
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    read_cols = m.group(1)
    assert "l_comment" not in read_cols
    assert read_cols.count(":") <= 7  # only the needed columns

def test_shipping_priority_broadcasts_dims(spark):
    plan = executed_plan(spark, "shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_islands_pipeline_single_sort_exchange(spark):
    plan = executed_plan(spark, "interval_coverage")
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bSort \[", plan)) == 1
    assert len(re.findall(r"\bWindow ", plan)) == 2  # both windows share them


def test_aggregations_partial_map_side(spark):
    plan = executed_plan(spark, "region_order_stats")
    assert "partial" in plan  # map-side combine before the shuffle


def test_anti_join_is_native(spark):
    plan = executed_plan(spark, "customers_without_open_orders")
    assert "LeftAnti" in plan
