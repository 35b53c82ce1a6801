"""Reusable column expressions (the engine's scalar/aggregate vocabulary).

All pure built-in ``pyspark.sql.functions`` compositions — JVM-side,
codegen-friendly, no UDFs — covering SURVEY.md §2.8 plus the aggregate
idioms of the query corpus (§2.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "safe_div",
    "vwap",
    "count_if",
    "round6",
    "round2",
    "valid_calendar_date",
    "string_true_to_bool",
]


def safe_div(num: Column, den: Column) -> Column:
    """num / NULLIF(den, 0) — the reference's zero-guarded ratio
    (sql/athena_sample_queries.sql:36)."""
    return num / F.nullif(den, F.lit(0))


def vwap(price: Column, quantity: Column) -> Column:
    """Volume-weighted average price: SUM(price*qty)/NULLIF(SUM(qty),0).

    Ratio-of-sums (not AVG of ratios); partial aggregation map-side, one
    shuffle. Parity: sql/athena_sample_queries.sql:36,135,218.
    """
    return safe_div(F.sum(price * quantity), F.sum(quantity))


def count_if(cond: Column) -> Column:
    """SUM(CASE WHEN cond THEN 1 ELSE 0 END) — conditional count
    (sql/athena_sample_queries.sql:173-174)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def round6(c: Column) -> Column:
    """Round derived double aggregates for stable cross-engine hashing.

    Double sums are order-dependent in the last ulp; rounding (applied
    identically in the DuckDB oracle SQL) makes value hashes portable.
    """
    return F.round(c, 6)


def round2(c: Column) -> Column:
    return F.round(c, 2)


def string_true_to_bool(c: Column) -> Column:
    """Exact-match "True" → true, anything else (incl. NULL) → false.

    Parity with reference jobs/etl/glue_spark_trades_etl.py:91-98 — a plain
    cast("boolean") would map NULL→NULL and "true"→true, which the
    reference does NOT do.
    """
    return F.when(c == "True", F.lit(True)).otherwise(F.lit(False))


def valid_calendar_date(year: Column, month: Column, day: Column) -> Column:
    """The reference's explicit calendar-validity predicate.

    31-day months, 30-day months, and February with full Gregorian
    leap-year arithmetic (div-4 / not-div-100 / div-400), plus day >= 1.
    Kept as explicit boolean arithmetic (not ``to_date`` round-trip) so DQ
    drop counts match the reference bit-for-bit.
    Parity: jobs/etl/glue_spark_trades_etl.py:125-172.
    """
    is_leap = ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)
    return (
        (
            (month.isin(1, 3, 5, 7, 8, 10, 12) & (day <= 31))
            | (month.isin(4, 6, 9, 11) & (day <= 30))
            | (
                (month == 2)
                & ((is_leap & (day <= 29)) | (~is_leap & (day <= 28)))
            )
        )
        & (day >= 1)
    )


#: The same predicate as ANSI SQL, for DuckDB-oracle parity checks.
VALID_CALENDAR_DATE_SQL = """(
  (
    ({m} IN (1, 3, 5, 7, 8, 10, 12) AND {d} <= 31)
    OR ({m} IN (4, 6, 9, 11) AND {d} <= 30)
    OR (
      {m} = 2
      AND (
        ((({y} % 4 = 0 AND {y} % 100 <> 0) OR {y} % 400 = 0) AND {d} <= 29)
        OR (NOT (({y} % 4 = 0 AND {y} % 100 <> 0) OR {y} % 400 = 0) AND {d} <= 28)
      )
    )
  )
  AND {d} >= 1
)"""
