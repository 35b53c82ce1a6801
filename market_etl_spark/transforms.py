"""The trades ETL transform chain (SURVEY.md §2.2, P1-P8).

Composes the reference's column derivations and data-quality filter
(jobs/etl/glue_spark_trades_etl.py:66-172) as pure DataFrame→DataFrame
functions. Everything is built-in expressions — Catalyst folds the
constant-heavy calendar predicate and keeps the whole chain inside
whole-stage codegen; nothing here forces a shuffle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import string_true_to_bool, valid_calendar_date

#: Final projection, in output order (8 data + 4 partition columns).
OUTPUT_COLUMNS = (
    "trade_id",
    "trade_time",
    "symbol",
    "price",
    "quantity",
    "quote_qty",
    "is_buyer_maker",
    "is_best_match",
    "load_dt",
    "year",
    "month",
    "day",
)


def with_lineage(df: DataFrame) -> DataFrame:
    """P1 — per-row input-file lineage (glue_spark_trades_etl.py:76)."""
    return df.withColumn("_input_file", F.input_file_name())


def extract_path_partitions(df: DataFrame, file_col: str = "_input_file") -> DataFrame:
    """P2/P6 — recover Hive-style partition metadata from the file path
    by regex (glue_spark_trades_etl.py:80-82): ``symbol=([A-Z]+)``,
    ``year=(\\d+)``, ``month=(\\d+)`` with int casts.
    """
    f = F.col(file_col)
    return (
        df.withColumn("symbol", F.regexp_extract(f, r"symbol=([A-Z]+)", 1))
        .withColumn("year", F.regexp_extract(f, r"year=(\d+)", 1).cast("int"))
        .withColumn("month", F.regexp_extract(f, r"month=(\d+)", 1).cast("int"))
    )


def derive_trade_columns(df: DataFrame, load_dt: dt.date | None = None) -> DataFrame:
    """P3/P4/P5/P6 — epoch-millis→timestamp, dayofmonth, exact-match
    string→bool, and the load-date stamp
    (glue_spark_trades_etl.py:85-101).

    ``load_dt`` defaults to the current date like the reference; pass a
    fixed date for deterministic/verifiable runs.
    """
    load_col: Column = F.lit(load_dt) if load_dt is not None else F.current_date()
    return (
        df.withColumn("trade_time", F.timestamp_millis(F.col("time")))
        .withColumn("day", F.dayofmonth("trade_time"))
        .withColumn("is_buyer_maker", string_true_to_bool(F.col("is_buyer_maker")))
        .withColumn("is_best_match", string_true_to_bool(F.col("is_best_match")))
        .withColumn("load_dt", load_col.cast("date"))
    )


def dq_predicate() -> Column:
    """P8 — the reference's validity conjunction
    (glue_spark_trades_etl.py:125-172): non-null timestamp, positive
    price/quantity, and explicit Gregorian calendar validity (31/30-day
    months + leap-year February arithmetic, day >= 1).
    """
    return (
        F.col("trade_time").isNotNull()
        & F.col("price").isNotNull()
        & (F.col("price") > 0)
        & F.col("quantity").isNotNull()
        & (F.col("quantity") > 0)
        & valid_calendar_date(F.col("year"), F.col("month"), F.col("day"))
    )


def apply_dq_filter(df: DataFrame) -> DataFrame:
    return df.filter(dq_predicate())


def final_projection(df: DataFrame) -> DataFrame:
    """P7 — the 12-column output projection (glue_spark_trades_etl.py:104-117)."""
    return df.select(*OUTPUT_COLUMNS)


def transform_trades(
    raw: DataFrame, load_dt: dt.date | None = None, validate: bool = True
) -> DataFrame:
    """The full P1→P8 chain: lineage → path-partition recovery → typed
    derivations → DQ filter → final projection. One narrow pipeline —
    no shuffle until a downstream aggregate or the partitioned write.
    """
    df = with_lineage(raw)
    df = extract_path_partitions(df)
    df = derive_trade_columns(df, load_dt)
    if validate:
        df = apply_dq_filter(df)
    return final_projection(df)
