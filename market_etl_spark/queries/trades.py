"""Production-posture queries over the generated partitioned
``trades_binance`` table (the corpus operators' scale variants).

The corpus (:mod:`.corpus`) favors exact aggregates so the DuckDB
oracle can hash-match; these entries make the production choices the
reference itself recommends for large data — sketch-based
``percentile_approx`` (sql/athena_sample_queries.sql:233 "use
APPROX_PERCENTILE") and ``approx_count_distinct`` — and run against a
real Hive-partitioned table so partition pruning is exercised on every
read. Sketch outputs are engine-specific → those entries are rows-only
with accuracy bounds asserted in tests/test_trades.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round6
from .etl_pipeline import ensure_trades_table
from .registry import query


@query(
    "q_trades_sanity_summary",
    oracle="""
    SELECT upper(event_type) AS symbol,
           COUNT(*) AS row_count,
           MIN(make_timestamp((epoch_us(ts) // 1000) * 1000)) AS first_trade,
           MAX(make_timestamp((epoch_us(ts) // 1000) * 1000)) AS last_trade
    FROM events
    WHERE value > 0 AND ts IS NOT NULL
    GROUP BY upper(event_type)
    ORDER BY symbol
    """,
    tags=("trades", "A11"),
)
def q_trades_sanity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-load sanity aggregate (A11 — MIN/MAX over timestamps,
    sql/athena_create_trades_tales.sql:37-44) against the partitioned
    table; the oracle recomputes from events through the same epoch-ms
    truncation the ETL applies."""
    t = spark.table(ensure_trades_table(spark, sf_dir))
    return (
        t.groupBy("symbol")
        .agg(
            F.count("*").alias("row_count"),
            F.min("trade_time").alias("first_trade"),
            F.max("trade_time").alias("last_trade"),
        )
        .orderBy("symbol")
    )


@query(
    "q_trades_partition_histogram",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
           CAST(day(ts) AS INT) AS day, upper(event_type) AS symbol,
           COUNT(*) AS cnt
    FROM events
    WHERE value > 0 AND ts IS NOT NULL
    GROUP BY 1, 2, 3, 4
    ORDER BY year, month, day, symbol
    """,
    tags=("trades", "A2"),
)
def q_trades_partition_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's partition-distribution report
    (glue_spark_trades_etl.py:185-188): groupBy partition keys → count.
    Partition columns come straight from directory metadata — the scan
    reads no data columns at all (ReadSchema: struct<>)."""
    t = spark.table(ensure_trades_table(spark, sf_dir))
    return (
        t.groupBy("year", "month", "day", "symbol")
        .agg(F.count("*").alias("cnt"))
        .orderBy("year", "month", "day", "symbol")
    )


@query(
    "q_trades_whales_approx",
    oracle="""
    WITH trades AS (
        SELECT upper(event_type) AS symbol,
               value * CAST(event_id % 7 + 1 AS DOUBLE) AS quote_qty
        FROM events
        WHERE value > 0 AND ts IS NOT NULL
    ), p AS (
        SELECT symbol, quantile_cont(quote_qty, 0.99) AS p99 FROM trades
        GROUP BY symbol
    )
    SELECT t.symbol AS symbol,
           CAST(SUM(CASE WHEN t.quote_qty >= p.p99 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_whales,
           ROUND(MAX(t.quote_qty), 6) AS max_trade_value,
           ROUND(MAX(p.p99), 6) AS p99_trade_value,
           TRUE AS approx_rank_ok
    FROM trades t JOIN p ON t.symbol = p.symbol
    GROUP BY t.symbol
    ORDER BY t.symbol
    """,
    tags=("trades", "A8"),
)
def q_trades_whales_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 whales, production path: single-pass mergeable
    ``percentile_approx`` sketch per symbol (the reference's own
    recommendation for large data, sql/athena_sample_queries.sql:233)
    → broadcast join → per-symbol whale summary.

    The sketch value is engine-specific, so the hashable output is the
    whale summary computed from the EXACT p99 (bit-matched to DuckDB's
    ``quantile_cont``, same as q5_whales) plus ``approx_rank_ok`` — the
    sketch's contract evaluated in-query AS A RANK BOUND: the count of
    rows strictly above the sketch cut must sit within ``n/accuracy + 2``
    of the ideal ``0.01·n``. A value tolerance would be wrong here
    (the sketch returns an order statistic while the exact p99
    interpolates, and adjacent top-tail order statistics can differ by
    far more than any fixed %% on small groups); the rank bound is what
    the GK-style sketch actually guarantees, at every scale factor.
    Both summaries ride ONE conditional aggregate over the broadcast
    join — same two fact-table scans as the pure production query."""
    t = spark.table(ensure_trades_table(spark, sf_dir))
    pct = t.groupBy("symbol").agg(
        F.expr("percentile(quote_qty, 0.99)").alias("exact_p99"),
        F.percentile_approx("quote_qty", 0.99, 10000).alias("approx_p99"),
    )
    joined = t.join(F.broadcast(pct), "symbol")
    summary = joined.groupBy("symbol").agg(
        F.count("*").alias("n"),
        F.sum((F.col("quote_qty") >= F.col("exact_p99")).cast("long")).alias(
            "n_whales"
        ),
        round6(F.max("quote_qty")).alias("max_trade_value"),
        round6(F.max("exact_p99")).alias("p99_trade_value"),
        F.sum((F.col("quote_qty") > F.col("approx_p99")).cast("long")).alias(
            "_gt_approx"
        ),
    )
    return summary.select(
        "symbol",
        "n_whales",
        "max_trade_value",
        "p99_trade_value",
        (
            F.abs(F.col("_gt_approx") - 0.01 * F.col("n"))
            <= F.col("n") / 10000.0 + 2.0
        ).alias("approx_rank_ok"),
    ).orderBy("symbol")


#: Symbol → tier dimension for the DPP demo (and its inlined oracle).
SYMBOL_TIERS = [
    ("PURCHASE", "conversion"),
    ("SIGNUP", "conversion"),
    ("CLICK", "engagement"),
    ("VIEW", "engagement"),
    ("ERROR", "ops"),
]


@query(
    "q_trades_dpp_join",
    oracle="""
    WITH dim(symbol, tier) AS (
        VALUES ('PURCHASE','conversion'),('SIGNUP','conversion'),
               ('CLICK','engagement'),('VIEW','engagement'),('ERROR','ops')
    )
    SELECT upper(event_type) AS symbol, CAST(day(ts) AS INT) AS day,
           COUNT(*) AS n_trades,
           ROUND(SUM(value * CAST(event_id % 7 + 1 AS DOUBLE)), 6) AS volume
    FROM events JOIN dim ON upper(event_type) = dim.symbol
    WHERE dim.tier = 'conversion' AND value > 0 AND ts IS NOT NULL
    GROUP BY 1, 2
    ORDER BY symbol, day
    """,
    tags=("trades", "P9", "dynamic-partition-pruning"),
)
def q_trades_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the pruning predicate is not a
    literal (cf. ``q_trades_pruned_day_vwap``) but the output of a
    dimension join — symbols in the 'conversion' tier. Catalyst plants
    a ``dynamicpruning`` subquery on the fact scan's ``symbol``
    partition column, reusing the join's broadcast exchange, so only
    the 2-of-5 matching symbol directories are ever listed or read.
    At 100 TB this is the star-schema access path: the fact side is
    pruned by a filter known only at runtime.
    tests/test_trades.py asserts the executed plan carries the
    dynamicpruning subquery."""
    t = spark.table(ensure_trades_table(spark, sf_dir))
    dim = spark.createDataFrame(SYMBOL_TIERS, "symbol string, tier string")
    return (
        t.join(dim.filter(F.col("tier") == "conversion"), "symbol")
        .groupBy("symbol", "day")
        .agg(
            F.count("*").alias("n_trades"),
            round6(F.sum("quote_qty")).alias("volume"),
        )
        .orderBy("symbol", "day")
    )


@query(
    "q_trades_pruned_day_vwap",
    oracle="""
    WITH trades AS (
        SELECT value AS price,
               CAST(event_id % 7 + 1 AS DOUBLE) AS quantity,
               value * CAST(event_id % 7 + 1 AS DOUBLE) AS quote_qty,
               upper(event_type) AS symbol,
               CAST(day(ts) AS INT) AS day,
               date_trunc('hour', make_timestamp((epoch_us(ts) // 1000) * 1000)) AS hr
        FROM events
        WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) = 15
          AND upper(event_type) = 'PURCHASE'
          AND value > 0 AND ts IS NOT NULL
    )
    SELECT hr,
           COUNT(*) AS trades,
           ROUND(SUM(quote_qty), 6) AS volume,
           ROUND(SUM(price * quantity) / NULLIF(SUM(quantity), 0), 6) AS vwap
    FROM trades
    GROUP BY hr
    ORDER BY hr
    """,
    tags=("trades", "P9", "A4", "A5"),
)
def q_trades_pruned_day_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical access pattern: partition filters on
    (year, month, day, symbol) prune to a single directory, then an
    hour-bucketed VWAP over just that slice — the 2-3 s dashboard query
    (BASELINE.md Athena latency) in Spark form."""
    t = spark.table(ensure_trades_table(spark, sf_dir))
    day = t.filter(
        (F.col("year") == 2024)
        & (F.col("month") == 1)
        & (F.col("day") == 15)
        & (F.col("symbol") == "PURCHASE")
    )
    return (
        day.groupBy(F.date_trunc("hour", "trade_time").alias("hr"))
        .agg(
            F.count("*").alias("trades"),
            round6(F.sum("quote_qty")).alias("volume"),
            round6(
                F.sum(F.col("price") * F.col("quantity"))
                / F.nullif(F.sum("quantity"), F.lit(0))
            ).alias("vwap"),
        )
        .orderBy("hr")
    )
