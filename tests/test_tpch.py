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


def test_q2_correlated_min_window(spark):
    """Q2's correlated-min decorrelates to a window over the eligible
    set; every min_cost row must equal the per-part minimum, and ties
    (several suppliers at the min) must all be kept."""
    rows = REGISTRY["q_tpch_q2"].fn(spark, SF_SMOKE).collect()
    per_part = {}
    for r in rows:
        per_part.setdefault(r.p_partkey, set()).add(r.min_cost)
    for pk, costs in per_part.items():
        assert len(costs) == 1, f"part {pk} has multiple 'min' costs {costs}"


def test_q4_semi_join_no_fanout(spark):
    """EXISTS must not duplicate orders: total order_count is bounded by
    the number of orders in the quarter."""
    from market_etl_spark.tables import load
    import pyspark.sql.functions as F

    res = REGISTRY["q_tpch_q4"].fn(spark, SF_SMOKE).collect()
    o = (
        load(spark, SF_SMOKE, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.order_count for r in res) <= o
    plan = _executed_plan(spark, "q_tpch_q4")
    assert "LeftSemi" in plan


def test_q9_one_fact_shuffle_at_most(spark):
    """Part/supplier/nation chains must broadcast; the only allowed
    non-broadcast join is lineitem⋈orders."""
    plan = _executed_plan(spark, "q_tpch_q9")
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "CartesianProduct" not in plan


def test_q11_threshold_exact_and_scale_invariant(spark):
    """Every kept part must be strictly above 2x the mean part value,
    recomputed here from the base tables in exact integer cents.  (At
    the sf0.001 smoke scale the filter may legitimately keep nothing —
    non-emptiness at sf0.01/sf0.1 is covered by the oracle gate, which
    returns 197/1724 rows there.)"""
    from market_etl_spark.tables import load
    import pyspark.sql.functions as F

    rows = REGISTRY["q_tpch_q11"].fn(spark, SF_SMOKE).collect()
    vals = [r.part_value_cents for r in rows]
    assert vals == sorted(vals, reverse=True)
    n = load(spark, SF_SMOKE, "nation").filter(F.col("n_name") == "NATION_7")
    s = load(spark, SF_SMOKE, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cents = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.col("l_quantity").cast("long")
    )
    val = (
        load(spark, SF_SMOKE, "lineitem")
        .join(F.broadcast(s.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("v"))
        .collect()
    )
    total = sum(r.v for r in val)
    nparts = len(val)
    expect = sorted(
        (r.v for r in val if r.v * nparts > 2 * total), reverse=True
    )
    assert vals == expect


def test_q12_counts_partition_the_join(spark):
    """high + low counts must equal the joined row count (each line falls
    in exactly one bucket)."""
    from market_etl_spark.tables import load
    import pyspark.sql.functions as F

    res = REGISTRY["q_tpch_q12"].fn(spark, SF_SMOKE).collect()
    l = (
        load(spark, SF_SMOKE, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in res) == l


def test_q16_anti_join_excludes_negative_suppliers(spark):
    plan = _executed_plan(spark, "q_tpch_q16")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_nested_in_is_semi_chain(spark):
    plan = _executed_plan(spark, "q_tpch_q20")
    assert plan.count("LeftSemi") >= 2  # part-name semi + supplier semi
    assert "CartesianProduct" not in plan


def test_q21_double_correlation_semi_plus_anti(spark):
    plan = _executed_plan(spark, "q_tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    rows = REGISTRY["q_tpch_q21"].fn(spark, SF_SMOKE).collect()
    # numwait counts only sole-fault suppliers: every reported supplier
    # must be in NATION_4 by construction; just sanity the ordering.
    vals = [r.numwait for r in rows]
    assert vals == sorted(vals, reverse=True)
