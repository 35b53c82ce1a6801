"""Bucketed co-located join: pre-bucketing both sides on the join key
eliminates the shuffle entirely — the 100 TB strategy for repeated
large-large joins (brief: 'bucketing for co-located joins')."""

from __future__ import annotations

import pathlib
import shutil

import pyspark.sql.functions as F

from market_etl_spark.tables import load

from conftest import SF_SMOKE

SCRATCH = pathlib.Path(__file__).resolve().parent.parent / ".scratch" / "bucketing"


def test_bucketed_join_has_no_shuffle(spark):
    wh = SCRATCH / "warehouse"
    shutil.rmtree(wh, ignore_errors=True)
    prev_aqe = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        orders = load(spark, SF_SMOKE, "orders")
        lineitem = load(spark, SF_SMOKE, "lineitem")
        for name, df, key in (
            ("b_orders", orders, "o_orderkey"),
            ("b_lineitem", lineitem, "l_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .option("path", str(wh / name))
                .saveAsTable(name)
            )

        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must read bucketed files directly - no Exchange
        # between the scans and the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan

        # equivalence with the shuffled join
        expect = {
            (r.o_orderstatus, r.n)
            for r in lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {(r.o_orderstatus, r.n) for r in joined.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
