"""The reference's 10-query analytics corpus, re-expressed over the
driver testdata tables (mapping per FIXTURES.md §F3).

Each query preserves the *operator shape* of its reference counterpart
(file:line cited per query, into /root/reference/) while running on the
TPC-H-ish tables so the DuckDB oracle can verify it. The same operators
are also exposed over a generated ``trades_binance`` partitioned table in
:mod:`market_etl_spark.queries.trades` (sketch-based production variants).

Scale notes (100 TB posture):
 - every aggregate is a hash aggregate with map-side partial aggregation —
   one shuffle per groupBy, no sort-based fallback needed;
 - filters precede aggregates so they push into the parquet scan
   (min/max row-group skipping + partition pruning on partitioned layouts);
 - the one join with a small build side is explicitly ``broadcast()``;
 - top-k is ORDER BY+LIMIT which Spark executes as TakeOrderedAndProject
   (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    VALID_CALENDAR_DATE_SQL,
    count_if,
    round2,
    round6,
    safe_div,
    valid_calendar_date,
    vwap,
)
from ..tables import load
from .registry import query


def _events_with_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + a deterministic synthetic quantity column.

    The trades schema pairs every price with a quantity; the events table
    has only ``value``, so queries that exercise ratio-of-sums derive
    qty = (event_id % 7) + 1 — deterministic and oracle-reproducible.
    """
    e = load(spark, sf_dir, "events")
    return e.withColumn("qty", ((F.col("event_id") % 7) + 1).cast("double"))


_EVENTS_QTY_SQL = "(SELECT *, CAST(event_id % 7 + 1 AS DOUBLE) AS qty FROM events)"


# ---------------------------------------------------------------------------
# Q1 — partition-pruned multi-aggregate GROUP BY
# ---------------------------------------------------------------------------
@query(
    "q1_pruned_multi_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS trade_count,
           ROUND(SUM(l_extendedprice), 2) AS total_value,
           MIN(l_quantity) AS low_qty,
           MAX(l_quantity) AS high_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("corpus", "A3", "P9"),
)
def q1_pruned_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q1 (sql/athena_sample_queries.sql:9-21): pruning filter +
    COUNT/SUM/MIN/MAX multi-aggregate grouped by low-cardinality keys."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("trade_count"),
            round2(F.sum("l_extendedprice")).alias("total_value"),
            F.min("l_quantity").alias("low_qty"),
            F.max("l_quantity").alias("high_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q2 — minute-bucket VWAP (the reference's flagship computation)
# ---------------------------------------------------------------------------
@query(
    "q2_minute_vwap",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS minute,
           COUNT(*) AS num_trades,
           ROUND(SUM(qty), 6) AS total_volume,
           ROUND(SUM(value * qty) / NULLIF(SUM(qty), 0), 6) AS vwap_value,
           MIN(value) AS low,
           MAX(value) AS high
    FROM {_EVENTS_QTY_SQL}
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY date_trunc('minute', ts)
    ORDER BY minute
    """,
    tags=("corpus", "A4", "A5"),
)
def q2_minute_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q2 (sql/athena_sample_queries.sql:32-45): day-sliced minute
    candles — COUNT / volume / ratio-of-sums VWAP / low / high per
    date_trunc('minute') bucket."""
    e = _events_with_qty(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    )
    return (
        e.groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            F.count("*").alias("num_trades"),
            round6(F.sum("qty")).alias("total_volume"),
            round6(vwap(F.col("value"), F.col("qty"))).alias("vwap_value"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
        )
        .orderBy("minute")
    )


# ---------------------------------------------------------------------------
# Q3 — order-flow analysis with a CASE display dimension
# ---------------------------------------------------------------------------
@query(
    "q3_order_flow",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'Urgent' ELSE 'Normal' END AS priority_class,
           COUNT(*) AS order_count,
           ROUND(SUM(o_totalprice), 2) AS total_value,
           ROUND(AVG(o_totalprice), 6) AS avg_value
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("corpus", "A10", "A6"),
)
def q3_order_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q3 (sql/athena_sample_queries.sql:56-70): group by a raw
    dimension, display through a CASE relabel, COUNT/SUM/AVG aggregates."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("order_count"),
            round2(F.sum("o_totalprice")).alias("total_value"),
            round6(F.avg("o_totalprice")).alias("avg_value"),
        )
        .select(
            "o_orderpriority",
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "Urgent")
            .otherwise("Normal")
            .alias("priority_class"),
            "order_count",
            "total_value",
            "avg_value",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q4 — hourly heatmap (EXTRACT(HOUR) bucketing + unit scaling)
# ---------------------------------------------------------------------------
@query(
    "q4_hourly_heatmap",
    oracle="""
    SELECT event_type,
           CAST(hour(ts) AS INT) AS hour_utc,
           COUNT(*) AS event_count,
           ROUND(SUM(value) / 1000000.0, 6) AS volume_millions,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY event_type, CAST(hour(ts) AS INT)
    ORDER BY event_type, hour_utc
    """,
    tags=("corpus", "A5", "A6"),
)
def q4_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q4 (sql/athena_sample_queries.sql:80-90): EXTRACT(HOUR)
    time-bucketed aggregation with /1e6 unit scaling."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.hour("ts").cast("int").alias("hour_utc"))
        .agg(
            F.count("*").alias("event_count"),
            F.round(F.sum("value") / 1000000.0, 6).alias("volume_millions"),
            round6(F.avg("value")).alias("avg_value"),
        )
        .orderBy("event_type", "hour_utc")
    )


# ---------------------------------------------------------------------------
# Q5 — whale detection: percentile CTE → broadcast join → theta filter → top-k
# ---------------------------------------------------------------------------
@query(
    "q5_whales",
    oracle="""
    WITH percentiles AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.99) AS p99_trade_value
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           l.l_extendedprice AS trade_value
    FROM lineitem l
    JOIN percentiles p ON l.l_returnflag = p.l_returnflag
    WHERE l.l_extendedprice >= p.p99_trade_value
    ORDER BY trade_value DESC, l.l_orderkey, l.l_linenumber
    LIMIT 100
    """,
    tags=("corpus", "A8", "J1", "O2"),
)
def q5_whales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q5 (sql/athena_sample_queries.sql:100-121): per-group p99
    aggregate joined back to the fact table (broadcast — the build side is
    group-cardinality rows), residual theta predicate, then true
    distributed top-k (TakeOrderedAndProject, no global sort).

    Exact ``percentile`` here so the DuckDB oracle (quantile_cont) agrees
    bit-for-bit; production entry point
    :func:`market_etl_spark.queries.trades.q_trades_whales_approx` uses
    ``percentile_approx`` (sketch-based, single-pass, merge-friendly) as the
    reference recommends for large data (athena_sample_queries.sql:233).
    """
    li = load(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99_trade_value")
    )
    return (
        li.join(F.broadcast(pct), "l_returnflag")
        .filter(F.col("l_extendedprice") >= F.col("p99_trade_value"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").alias("trade_value"),
        )
        .orderBy(F.desc("trade_value"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q6 — multi-series alignment via CTE reuse + 3-way FULL OUTER JOIN
# ---------------------------------------------------------------------------
@query(
    "q6_full_outer_align",
    oracle=f"""
    WITH minute_series AS (
        SELECT event_type,
               date_trunc('minute', ts) AS minute,
               ROUND(SUM(value * qty) / NULLIF(SUM(qty), 0), 6) AS vwap_value
        FROM {_EVENTS_QTY_SQL}
        WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        GROUP BY event_type, date_trunc('minute', ts)
    )
    SELECT c.minute AS minute,
           c.vwap_value AS click_vwap,
           v.vwap_value AS view_vwap,
           p.vwap_value AS purchase_vwap
    FROM (SELECT * FROM minute_series WHERE event_type = 'click') c
    FULL OUTER JOIN (SELECT * FROM minute_series WHERE event_type = 'view') v
        ON c.minute = v.minute
    FULL OUTER JOIN (SELECT * FROM minute_series WHERE event_type = 'purchase') p
        ON c.minute = p.minute
    ORDER BY minute
    """,
    tags=("corpus", "J2", "J3"),
)
def q6_full_outer_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q6 (sql/athena_sample_queries.sql:131-152): one minute-VWAP
    aggregation fanned into three filtered branches and FULL-OUTER-joined
    on minute (NULL-padded where a series is missing). The shared
    aggregation is cached so the CTE is computed once — without the cache
    Spark would rescan events and re-aggregate once per branch (3 full
    fact-table scans at 100 TB). (The pivot form of this query is
    :func:`q6_pivot_align` — idiomatic Spark, one shuffle, no join.)
    """
    mp = (
        _events_with_qty(spark, sf_dir)
        .filter(
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        )
        .groupBy("event_type", F.date_trunc("minute", "ts").alias("minute"))
        .agg(round6(vwap(F.col("value"), F.col("qty"))).alias("vwap_value"))
        .cache()
    )
    c = mp.filter(F.col("event_type") == "click").select(
        F.col("minute").alias("c_minute"), F.col("vwap_value").alias("click_vwap")
    )
    v = mp.filter(F.col("event_type") == "view").select(
        F.col("minute").alias("v_minute"), F.col("vwap_value").alias("view_vwap")
    )
    p = mp.filter(F.col("event_type") == "purchase").select(
        F.col("minute").alias("p_minute"), F.col("vwap_value").alias("purchase_vwap")
    )
    return (
        c.join(v, c["c_minute"] == v["v_minute"], "full_outer")
        .join(p, c["c_minute"] == p["p_minute"], "full_outer")
        .select(
            F.col("c_minute").alias("minute"),
            "click_vwap",
            "view_vwap",
            "purchase_vwap",
        )
        .orderBy("minute")
    )


@query(
    "q6_pivot_align",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS minute,
           ROUND(SUM(value * qty) FILTER (event_type = 'click')
                 / NULLIF(SUM(qty) FILTER (event_type = 'click'), 0), 6) AS click_vwap,
           ROUND(SUM(value * qty) FILTER (event_type = 'view')
                 / NULLIF(SUM(qty) FILTER (event_type = 'view'), 0), 6) AS view_vwap,
           ROUND(SUM(value * qty) FILTER (event_type = 'purchase')
                 / NULLIF(SUM(qty) FILTER (event_type = 'purchase'), 0), 6) AS purchase_vwap
    FROM {_EVENTS_QTY_SQL}
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
      AND event_type IN ('click', 'view', 'purchase')
    GROUP BY date_trunc('minute', ts)
    ORDER BY minute
    """,
    tags=("corpus", "J2-idiomatic"),
)
def q6_pivot_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idiomatic-Spark form of Q6: groupBy().pivot() — one shuffle, no
    join, no NULL-key subtleties. At 100 TB this replaces the 3-way
    full-outer sort-merge join with a single hash aggregate. Semantics
    differ from the verbatim form only in that the minute key is always
    present (no NULL-minute rows)."""
    e = _events_with_qty(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        & F.col("event_type").isin("click", "view", "purchase")
    )
    return (
        e.groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(round6(vwap(F.col("value"), F.col("qty"))))
        .select(
            "minute",
            F.col("click").alias("click_vwap"),
            F.col("view").alias("view_vwap"),
            F.col("purchase").alias("purchase_vwap"),
        )
        .orderBy("minute")
    )


# ---------------------------------------------------------------------------
# Q7 — data-quality audit: COUNT DISTINCT + conditional aggregation
# ---------------------------------------------------------------------------
@query(
    "q7_dq_audit",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           o_orderstatus,
           COUNT(*) AS row_count,
           COUNT(DISTINCT o_orderkey) AS unique_orders,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS duplicate_count,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           ROUND(AVG(o_totalprice), 6) AS avg_price,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS invalid_price_count,
           CAST(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT) AS large_order_count
    FROM orders
    GROUP BY CAST(year(o_orderdate) AS INT), o_orderstatus
    ORDER BY order_year, o_orderstatus
    """,
    tags=("corpus", "A7", "A9"),
)
def q7_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q7 (sql/athena_sample_queries.sql:162-178): per-group row
    counts, duplicate detection via COUNT(*)-COUNT(DISTINCT), and
    invalid-value counts via conditional sums."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"), "o_orderstatus"
        )
        .agg(
            F.count("*").alias("row_count"),
            F.countDistinct("o_orderkey").alias("unique_orders"),
            (F.count("*") - F.countDistinct("o_orderkey")).alias("duplicate_count"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            round6(F.avg("o_totalprice")).alias("avg_price"),
            count_if(F.col("o_totalprice") <= 0).cast("long").alias("invalid_price_count"),
            count_if(F.col("o_totalprice") > 400000).cast("long").alias("large_order_count"),
        )
        .orderBy("order_year", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Q8 — partition-pruned count
# ---------------------------------------------------------------------------
@query(
    "q8_pruned_count",
    oracle="""
    SELECT COUNT(*) AS trade_count
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-07-01' AND l_shipdate < TIMESTAMP '1995-08-01'
      AND l_returnflag = 'A'
    """,
    tags=("corpus", "A12", "P9"),
)
def q8_pruned_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q8 (sql/athena_sample_queries.sql:189-199): COUNT(*) under
    pruning predicates. On a partitioned table the filter prunes
    directories before any I/O; here it pushes into parquet row-group
    min/max skipping — both visible in .explain()."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-08-01").cast("timestamp"))
        & (F.col("l_returnflag") == "A")
    ).agg(F.count("*").alias("trade_count"))


# ---------------------------------------------------------------------------
# Q9 — daily summary statistics
# ---------------------------------------------------------------------------
@query(
    "q9_daily_summary",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS y,
           CAST(month(l_shipdate) AS INT) AS m,
           CAST(day(l_shipdate) AS INT) AS d,
           COUNT(*) AS trades,
           ROUND(SUM(l_extendedprice) / 1000000.0, 8) AS volume_millions,
           MIN(l_extendedprice) AS low,
           MAX(l_extendedprice) AS high,
           ROUND(SUM(l_extendedprice * l_quantity) / NULLIF(SUM(l_quantity), 0), 6) AS vwap
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-07-01' AND l_shipdate < TIMESTAMP '1995-08-01'
    GROUP BY 1, 2, 3
    ORDER BY y, m, d
    """,
    tags=("corpus", "A3", "A4"),
)
def q9_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q9 (sql/athena_sample_queries.sql:209-223): daily OHLC-ish
    summary — counts, scaled volume, min/max, VWAP grouped by calendar
    day parts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-08-01").cast("timestamp"))
    )
    return (
        li.groupBy(
            F.year("l_shipdate").cast("int").alias("y"),
            F.month("l_shipdate").cast("int").alias("m"),
            F.dayofmonth("l_shipdate").cast("int").alias("d"),
        )
        .agg(
            F.count("*").alias("trades"),
            F.round(F.sum("l_extendedprice") / 1000000.0, 8).alias("volume_millions"),
            F.min("l_extendedprice").alias("low"),
            F.max("l_extendedprice").alias("high"),
            round6(vwap(F.col("l_extendedprice"), F.col("l_quantity"))).alias("vwap"),
        )
        .orderBy("y", "m", "d")
    )


# ---------------------------------------------------------------------------
# Q9b — recent-activity dashboard (relative time window + pct pressure)
# ---------------------------------------------------------------------------
@query(
    "q9b_recent_activity",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS trades_last_hour,
           ROUND(SUM(value), 6) AS volume,
           MIN(value) AS low,
           MAX(value) AS high,
           ROUND(SUM(value * qty) / NULLIF(SUM(qty), 0), 6) AS vwap_value,
           ROUND(SUM(CASE WHEN event_id % 2 = 0 THEN value ELSE 0.0 END)
                 / NULLIF(SUM(value), 0) * 100, 6) AS pct_even_pressure
    FROM {_EVENTS_QTY_SQL}
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    GROUP BY event_type
    ORDER BY volume DESC
    """,
    tags=("corpus", "P10", "A9"),
)
def q9b_recent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref Q9b (sql/athena_sample_queries.sql:330-342): last-hour slice +
    conditional-share aggregate. The reference anchors on
    current_timestamp (non-deterministic); we anchor on MAX(ts) — the
    1-row aggregate is broadcast back so the filter stays distributed
    (no driver-side collect in the plan)."""
    e = _events_with_qty(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("_max_ts"))
    return (
        e.join(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("_max_ts") - F.expr("INTERVAL 1 HOUR"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("trades_last_hour"),
            round6(F.sum("value")).alias("volume"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            round6(vwap(F.col("value"), F.col("qty"))).alias("vwap_value"),
            round6(
                safe_div(
                    F.sum(F.when(F.col("event_id") % 2 == 0, F.col("value")).otherwise(F.lit(0.0))),
                    F.sum("value"),
                )
                * 100
            ).alias("pct_even_pressure"),
        )
        .orderBy(F.desc("volume"))
    )


# ---------------------------------------------------------------------------
# ETL operator parity: projection/derivation ops (P2-P6) as a query
# ---------------------------------------------------------------------------
@query(
    "q_etl_projection",
    oracle="""
    SELECT event_id,
           epoch_ms(1700000000000 + event_id * 60000) AS derived_ts,
           CAST(day(epoch_ms(1700000000000 + event_id * 60000)) AS INT) AS derived_day,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k_val,
           CASE WHEN regexp_extract(props, '"k": (\\d+)', 1) = '42'
                THEN TRUE ELSE FALSE END AS is_answer
    FROM events
    WHERE event_id % 10 = 0
    ORDER BY event_id
    """,
    tags=("etl", "P2", "P3", "P4", "P5", "P6"),
)
def q_etl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ETL's derivation ops as a verifiable query: epoch-millis →
    timestamp (ref glue_spark_trades_etl.py:85), dayofmonth (:88), regex
    metadata extraction + int cast (:80-82), and the exact-match
    string→bool conversion (:91-98, NULL/non-match → false)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    ts = F.timestamp_millis(F.lit(1700000000000) + F.col("event_id") * 60000)
    k_str = F.regexp_extract("props", r'"k": (\d+)', 1)
    return e.select(
        "event_id",
        ts.alias("derived_ts"),
        F.dayofmonth(ts).cast("int").alias("derived_day"),
        k_str.cast("int").alias("k_val"),
        F.when(k_str == "42", F.lit(True)).otherwise(F.lit(False)).alias("is_answer"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# ETL operator parity: the calendar-validity DQ filter (P8) as a query
# ---------------------------------------------------------------------------
_DQ_INNER_SQL = """
    SELECT CAST(1900 + event_id % 200 AS INT) AS y,
           CAST(1 + event_id % 12 AS INT) AS m,
           CAST(1 + event_id % 31 AS INT) AS d,
           value - 100.0 AS val
    FROM events
"""


@query(
    "q_etl_dq_filter",
    oracle=f"""
    SELECT m, COUNT(*) AS valid_rows
    FROM ({_DQ_INNER_SQL}) t
    WHERE val IS NOT NULL AND val > 0
      AND {VALID_CALENDAR_DATE_SQL.format(y="y", m="m", d="d")}
    GROUP BY m
    ORDER BY m
    """,
    tags=("etl", "P8"),
)
def q_etl_dq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DQ predicate (glue_spark_trades_etl.py:125-172) —
    positivity + explicit Gregorian calendar validity incl. leap-year
    arithmetic — applied to a deterministic synthetic (y, m, d, val)
    projection of events so the oracle can count survivors."""
    e = load(spark, sf_dir, "events").select(
        (F.lit(1900) + F.col("event_id") % 200).cast("int").alias("y"),
        (F.lit(1) + F.col("event_id") % 12).cast("int").alias("m"),
        (F.lit(1) + F.col("event_id") % 31).cast("int").alias("d"),
        (F.col("value") - 100.0).alias("val"),
    )
    kept = e.filter(
        F.col("val").isNotNull()
        & (F.col("val") > 0)
        & valid_calendar_date(F.col("y"), F.col("m"), F.col("d"))
    )
    return kept.groupBy("m").agg(F.count("*").alias("valid_rows")).orderBy("m")
