"""Production trades-table queries: sketch accuracy bounds and
partition-pruning plan assertions."""

from __future__ import annotations

import pyspark.sql.functions as F

from market_etl_spark.queries import REGISTRY
from market_etl_spark.queries.etl_pipeline import ensure_trades_table

from conftest import SF_SMOKE


def test_approx_percentile_accuracy(spark):
    """percentile_approx(accuracy=10000) returns an actual element whose
    rank is within ±1/accuracy of the target — so it must land between
    the exact p98 and the max (exact `percentile` interpolates between
    order statistics, which on small groups can sit several % away from
    any element; the rank bound is the sketch's real contract)."""
    t = spark.table(ensure_trades_table(spark, SF_SMOKE))
    both = t.groupBy("symbol").agg(
        F.percentile_approx("quote_qty", 0.99, 10000).alias("approx"),
        F.expr("percentile(quote_qty, 0.98)").alias("lo"),
        F.max("quote_qty").alias("hi"),
    )
    for r in both.collect():
        assert r.lo <= r.approx <= r.hi, (r.symbol, r.lo, r.approx, r.hi)


def test_whales_approx_close_to_exact(spark):
    """The reworked query audits the percentile_approx sketch against the
    exact p99 in-query as a RANK bound (what the sketch actually
    guarantees): rows strictly above the sketch cut ≈ 1% of the group."""
    rows = REGISTRY["q_trades_whales_approx"].fn(spark, SF_SMOKE).collect()
    assert rows, "no symbols"
    t = spark.table(ensure_trades_table(spark, SF_SMOKE))
    per_symbol = {r.symbol: r.n for r in t.groupBy("symbol").agg(F.count("*").alias("n")).collect()}
    assert set(per_symbol) == {r.symbol for r in rows}
    for r in rows:
        assert r.approx_rank_ok, f"{r.symbol}: sketch cut outside rank bound"
        assert r.max_trade_value >= r.p99_trade_value
        # >= exact-p99 cut keeps about 1% of rows (interpolated cut ⇒ at
        # least the ceil-1% order statistics, at most a few ties more).
        n = per_symbol[r.symbol]
        assert 1 <= r.n_whales <= max(0.05 * n, 10), (r.symbol, r.n_whales, n)


def test_pruned_day_vwap_plan_prunes(spark):
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = REGISTRY["q_trades_pruned_day_vwap"].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:600]
    assert "2024" in pf and "PURCHASE" in pf


def test_dpp_join_plans_dynamic_pruning(spark):
    """The dimension-join query must prune the fact scan's symbol
    partitions with a runtime (dynamicpruning) subquery, not read all
    symbol directories and filter post-join."""
    df = REGISTRY["q_trades_dpp_join"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result only contains the conversion-tier symbols
    symbols = {r.symbol for r in df.select("symbol").distinct().collect()}
    assert symbols == {"PURCHASE", "SIGNUP"}


def test_partition_histogram_reads_no_data_columns(spark):
    """Counting by partition keys must not read any parquet data column."""
    df = REGISTRY["q_trades_partition_histogram"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<>" in plan
