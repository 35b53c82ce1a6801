"""AQE skew-join auto-split: plan-level proof (sibling of
test_bucketed_layout.py — VERDICT r8 item 3).

The registered query q_aqe_skew_join already pins `skew_split_applied`
through the oracle gate; these tests pin the PLAN shape itself — the
final adaptive plan must carry the skew markers, and the split must be
a real one (more join tasks than shuffle partitions)."""

from __future__ import annotations

import re

from market_etl_spark.queries.round9 import run_skewed_join_drill

SF = "/root/testdata/sf0.001"


def test_final_adaptive_plan_splits_the_skew(spark):
    row, plan = run_skewed_join_drill(spark, SF)
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan
    # the join node itself is marked
    assert re.search(r"SortMergeJoin\(skew=true\)", plan), plan[:2000]
    # the hot side's shuffle read reports skew handling
    assert re.search(r"AQEShuffleRead.*skewed", plan), plan[:2000]
    # and the split changed nothing semantically: the exact-integer
    # fold matches a plain (no-AQE-drama) recompute of the same join
    from pyspark.sql import functions as F

    from market_etl_spark.tables import load

    e = load(spark, SF, "events")
    l = e.select(
        F.when(F.col("user_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("event_id"))
        .cast("long")
        .alias("k"),
        "value",
    )
    r = e.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").cast("long").alias("k"),
        (F.col("event_id") % 97).cast("long").alias("w"),
    )
    (ref,) = (
        l.join(F.broadcast(r), "k")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("w").cast("long").alias("sum_w"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .collect()
    )
    assert (row.n_rows, row.sum_w, row.value_micros) == (
        ref.n_rows,
        ref.sum_w,
        ref.value_micros,
    )
