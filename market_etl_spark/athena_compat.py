"""Athena/Presto SQL compatibility: run the reference's own SQL on Spark.

A user of the reference runs Athena (Presto/Trino dialect) SQL against
``market_data.trades_binance``. This module lets that SQL run on Spark
unmodified: a catalog shim registers the same database-qualified name
over the engine's partitioned trades table, and :func:`translate`
rewrites the (three) Presto constructs Spark spells differently:

- ``APPROX_PERCENTILE(x, p)`` → ``percentile_approx(x, p)``
- ``date_add('unit', n, ts)`` (Presto 3-arg) → ``ts + INTERVAL n unit``
  (Spark's ``date_add`` is days-only, an easy silent-semantics trap)
- everything else — ``date_trunc``, ``EXTRACT``, ``NULLIF``, CTEs,
  ``CASE``, join/limit syntax — is shared and passes through verbatim.

tests/test_athena_compat.py replays every statement of the reference's
``sql/athena_sample_queries.sql`` (read from the reference checkout at
test time, never vendored) through this layer and asserts each one
parses, plans, and executes on the Spark tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: Presto 3-arg date_add('unit', n, expr) — Spark needs interval arithmetic.
_DATE_ADD = re.compile(
    r"(?i)\bdate_add\(\s*'(\w+)'\s*,\s*(-?\d+)\s*,\s*([^()]*(?:\([^()]*\))?[^()]*)\)"
)


def translate(sql: str) -> str:
    """Rewrite Presto-dialect constructs to Spark SQL (see module doc)."""
    out = re.sub(r"(?i)\bAPPROX_PERCENTILE\s*\(", "percentile_approx(", sql)
    out = _DATE_ADD.sub(r"(\3 + INTERVAL \2 \1)", out)
    return out


def split_statements(sql_text: str) -> list[str]:
    """Split a .sql file into executable statements: strip ``--``
    comments, split on ``;``, drop empties."""
    lines = []
    for line in sql_text.splitlines():
        lines.append(line.split("--", 1)[0])
    stmts = [s.strip() for s in "\n".join(lines).split(";")]
    return [s for s in stmts if s]


def ensure_athena_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Register ``market_data.trades_binance`` — the name the reference's
    SQL addresses — as a view over the engine's partitioned trades
    table (materialized once per session by the ETL)."""
    from .queries.etl_pipeline import ensure_trades_table

    table = ensure_trades_table(spark, sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS market_data")
    spark.sql(
        f"CREATE OR REPLACE VIEW market_data.trades_binance AS SELECT * FROM {table}"
    )


def run_athena_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Translate one Athena statement and run it on Spark."""
    return spark.sql(translate(sql))
