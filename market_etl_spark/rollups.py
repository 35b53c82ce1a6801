"""Continuous-aggregate rollups (the hypertable pattern).

Materialize a fine-grained time-bucket rollup ONCE, then serve coarser
queries by re-aggregating the rollup instead of rescanning raw events —
at 100 TB a daily dashboard query reads the ~1/1000-sized minute rollup,
not the fact table.

Correct re-aggregation is the whole trick: COUNT/SUM/MIN/MAX merge
trivially, but AVG and VWAP must be carried as (numerator, denominator)
pairs in the rollup and recombined at serve time — averaging the
averages is wrong whenever bucket weights differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import round6, safe_div

#: Rollup schema: mergeable components only (no pre-divided ratios).
ROLLUP_AGGS = (
    "num_trades",
    "sum_qty",  # VWAP denominator
    "sum_value_qty",  # VWAP numerator
    "low",
    "high",
)


def build_minute_rollup(events_with_qty: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The fine-grained (minute × event_type) rollup with mergeable
    components."""
    return events_with_qty.groupBy(
        F.date_trunc("minute", ts_col).alias("minute"), "event_type"
    ).agg(
        F.count("*").alias("num_trades"),
        F.sum("qty").alias("sum_qty"),
        F.sum(F.col("value") * F.col("qty")).alias("sum_value_qty"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
    )


def merge_rollups(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two rollups of the same grain: union, then re-merge the
    mergeable components per (minute, event_type). Because every
    carried component is associative (counts/sums add, min/max nest),
    a rollup maintained by repeated merges is bit-equal in meaning to
    one rebuilt from scratch — the invariant the incremental-refresh
    oracle checks."""
    return (
        a.unionByName(b)
        .groupBy("minute", "event_type")
        .agg(
            F.sum("num_trades").alias("num_trades"),
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("sum_value_qty").alias("sum_value_qty"),
            F.min("low").alias("low"),
            F.max("high").alias("high"),
        )
    )


def refresh_rollup(
    rollup: DataFrame, new_events_with_qty: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Incremental continuous-aggregate maintenance: aggregate ONLY the
    newly-arrived rows to minute grain and merge their components into
    the existing rollup. At 100 TB this is the difference between
    re-scanning the fact table per refresh and touching just the delta
    — the rolled-up history is never read again, only its (tiny)
    aggregate rows pass through the merge shuffle."""
    return merge_rollups(rollup, build_minute_rollup(new_events_with_qty, ts_col))


def serve_from_rollup(rollup: DataFrame, bucket: str = "day") -> DataFrame:
    """Answer a coarser-bucket query from the rollup: counts/sums add,
    min/max nest, VWAP recombines from the carried components."""
    return (
        rollup.groupBy(
            F.date_trunc(bucket, "minute").alias(bucket), "event_type"
        )
        .agg(
            F.sum("num_trades").alias("num_trades"),
            round6(F.sum("sum_qty")).alias("total_volume"),
            round6(safe_div(F.sum("sum_value_qty"), F.sum("sum_qty"))).alias("vwap_value"),
            F.min("low").alias("low"),
            F.max("high").alias("high"),
        )
    )
