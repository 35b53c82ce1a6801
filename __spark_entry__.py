"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real work lives in :mod:`market_etl_spark`; this module only
adapts the engine's query registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_etl_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (minute VWAP candles — the reference's headline
    computation, sql/athena_sample_queries.sql:32-45) on sf0.001."""
    return REGISTRY["q2_minute_vwap"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB) for every hash-checkable query; queries
    without an oracle get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
