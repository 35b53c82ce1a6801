"""Sinks (SURVEY.md §2.1 S8/S12): partitioned columnar writes.

Parity: the reference's single write —
``df.write.mode("overwrite").partitionBy("year","month","day","symbol")
.parquet(out)`` (jobs/etl/glue_spark_trades_etl.py:194-197), Snappy at
the table level.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from .schemas import TRADES_PARTITION_COLS


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = TRADES_PARTITION_COLS,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """S8 — Hive-layout Snappy Parquet write.

    Scale notes: with ``partitionOverwriteMode=dynamic`` (session
    default) re-running one (year,month,day,symbol) slice replaces only
    that slice — at 100 TB an overwrite must never truncate sibling
    partitions. ``maxRecordsPerFile`` caps file size under skewed
    partitions; AQE coalescing keeps small partitions from producing
    thousands of tiny files.
    """
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def preview(df: DataFrame, n: int = 5) -> None:
    """S12 — sample sink (glue_spark_trades_etl.py:181,188)."""
    df.show(n, truncate=False)
