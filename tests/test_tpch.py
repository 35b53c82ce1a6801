"""TPC-H-suite plan assertions: the fact table must never shuffle
before aggregation — every dimension chain collapses to broadcasts."""

from __future__ import annotations

import re

from market_etl_spark.queries import REGISTRY

from conftest import SF_SMOKE


def _executed_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_star_join_all_broadcast(spark):
    """The 6-way Q5 join: every join is a BroadcastHashJoin; the only
    shuffle exchanges carry aggregated rows (25 nations max), so no
    ShuffledHashJoin/SortMergeJoin appears anywhere in the plan."""
    plan = _executed_plan(spark, "q_tpch_q5")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q6_predicates_pushed(spark):
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = _executed_plan(spark, "q_tpch_q6")
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    m = re.search(r"PushedFilters: \[[^\]]*\]", plan)
    assert m, "no PushedFilters in scan"
    pushed = m.group(0)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"


def test_q18_semi_filter_is_keys_only(spark):
    """The HAVING subquery aggregates (key, qty) — the broadcast that
    comes back to orders must not carry lineitem detail columns."""
    plan = _executed_plan(spark, "q_tpch_q18")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q1_result_shape(spark):
    rows = REGISTRY["q_tpch_q1"].fn(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 6  # returnflag × linestatus combinations
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price
        assert r.count_order > 0
