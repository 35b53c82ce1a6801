"""Window-function extensions (SURVEY.md §2.5 / §7.2 M-f).

The reference has no OVER clauses — time-bucketing is GROUP BY
date_trunc — but its correlation/candle queries are exactly where a
windowed engine adds lag returns, rolling VWAP, and per-group top-N.
All three are classic market-data windows, all oracle-checkable.

Scale: every window below partitions by a bounded key (event_type) and
orders within partition — Spark executes one hash-partitioned shuffle
+ in-partition sort; no global sort, frames are incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import round6, safe_div, vwap
from ..tables import load
from .registry import query

#: Shared minute-VWAP series (the Q2/Q6 aggregation, reused as input).
_MINUTE_SERIES_SQL = """
    SELECT event_type,
           date_trunc('minute', ts) AS minute,
           ROUND(SUM(value * qty) / NULLIF(SUM(qty), 0), 6) AS vwap_value,
           SUM(qty) AS vol
    FROM (SELECT *, CAST(event_id % 7 + 1 AS DOUBLE) AS qty FROM events)
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY event_type, date_trunc('minute', ts)
"""


def _minute_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "qty", ((F.col("event_id") % 7) + 1).cast("double")
    )
    return (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        )
        .groupBy("event_type", F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            round6(vwap(F.col("value"), F.col("qty"))).alias("vwap_value"),
            F.sum("qty").alias("vol"),
        )
    )


@query(
    "q_window_lag_returns",
    oracle=f"""
    WITH ms AS ({_MINUTE_SERIES_SQL})
    SELECT event_type, minute, vwap_value,
           ROUND((vwap_value - LAG(vwap_value) OVER w)
                 / NULLIF(LAG(vwap_value) OVER w, 0) * 100, 6) AS pct_return
    FROM ms
    WINDOW w AS (PARTITION BY event_type ORDER BY minute)
    ORDER BY event_type, minute
    """,
    tags=("windows", "extension"),
)
def q_window_lag_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-over-minute percentage returns per series: LAG over a
    (event_type, minute-ordered) window — the delta computation the
    reference's correlation query (Q6) stops short of."""
    w = Window.partitionBy("event_type").orderBy("minute")
    ms = _minute_series(spark, sf_dir)
    prev = F.lag("vwap_value").over(w)
    return ms.select(
        "event_type",
        "minute",
        "vwap_value",
        round6(safe_div(F.col("vwap_value") - prev, prev) * 100).alias("pct_return"),
    ).orderBy("event_type", "minute")


@query(
    "q_window_rolling_vwap",
    oracle=f"""
    WITH ms AS ({_MINUTE_SERIES_SQL})
    SELECT event_type, minute,
           ROUND(SUM(vwap_value * vol) OVER w / NULLIF(SUM(vol) OVER w, 0), 6)
               AS rolling_vwap_5m
    FROM ms
    WINDOW w AS (PARTITION BY event_type ORDER BY minute
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, minute
    """,
    tags=("windows", "extension"),
)
def q_window_rolling_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute rolling VWAP: ratio of two framed sums (ROWS BETWEEN 4
    PRECEDING AND CURRENT ROW) — incremental frame evaluation, no
    self-join re-scan per offset."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(-4, Window.currentRow)
    )
    ms = _minute_series(spark, sf_dir)
    return ms.select(
        "event_type",
        "minute",
        round6(
            safe_div(
                F.sum(F.col("vwap_value") * F.col("vol")).over(w),
                F.sum("vol").over(w),
            )
        ).alias("rolling_vwap_5m"),
    ).orderBy("event_type", "minute")


@query(
    "q_window_topn_per_group",
    oracle="""
    SELECT event_type, event_id, value
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value DESC, event_id
               ) AS rn
        FROM events
    )
    WHERE rn <= 3
    ORDER BY event_type, value DESC, event_id
    """,
    tags=("windows", "extension"),
)
def q_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per type via row_number — the per-group
    complement of the corpus's global top-k (O2). The rank filter
    pushes into the window sort (Spark's WindowGroupLimit), so each
    partition keeps a 3-row heap instead of fully sorting."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("event_type", F.desc("value"), "event_id")
    )
