"""Catalog DDL (SURVEY.md §2.1 S10/S11): external-table registration
over a partitioned Parquet location, plus partition discovery.

Parity: the reference's Glue-catalog external table
(sql/athena_create_trades_tales.sql:5-27) and
``MSCK REPAIR TABLE`` / ``SHOW PARTITIONS``
(sql/athena_repair_partitions.sql:5-8). Spark SQL supports all three
natively against its session catalog; on a cluster with a Hive
metastore the same statements register durable shared tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .schemas import TRADES_PARTITION_COLS, TRADES_PROCESSED

#: column -> SQL type for the processed trades table DDL.
_SQL_TYPES = {
    field.name: field.dataType.simpleString() for field in TRADES_PROCESSED.fields
}


def create_external_trades_table(
    spark: SparkSession,
    table: str,
    location: str,
    partition_cols: Sequence[str] = TRADES_PARTITION_COLS,
) -> None:
    """S10 — ``CREATE TABLE ... USING PARQUET PARTITIONED BY ... LOCATION``.

    Drops any prior registration first so re-running the ETL is
    idempotent (the data itself is only rewritten by the writer's
    dynamic partition overwrite, never by this DDL).
    """
    data_cols = [c for c in _SQL_TYPES if c not in partition_cols]
    cols_sql = ",\n  ".join(f"{c} {_SQL_TYPES[c]}" for c in data_cols + list(partition_cols))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"""
        CREATE TABLE {table} (
          {cols_sql}
        )
        USING PARQUET
        PARTITIONED BY ({", ".join(partition_cols)})
        LOCATION '{location}'
        """
    )


def repair_partitions(spark: SparkSession, table: str) -> None:
    """S11 — ``MSCK REPAIR TABLE``: sync discovered Hive-layout
    directories into the catalog so partition pruning works."""
    spark.sql(f"MSCK REPAIR TABLE {table}")


def show_partitions(spark: SparkSession, table: str) -> DataFrame:
    """S11 — ``SHOW PARTITIONS`` (sql/athena_create_trades_tales.sql:31-34)."""
    return spark.sql(f"SHOW PARTITIONS {table}")


def register_trades_table(spark: SparkSession, table: str, location: str) -> DataFrame:
    """Create + repair + return the table handle — the full S9/S10/S11
    query-side surface in one call."""
    create_external_trades_table(spark, table, location)
    repair_partitions(spark, table)
    return spark.table(table)


def analyze_table(
    spark: SparkSession, table: str, columns: Sequence[str] | None = None
) -> None:
    """Collect catalog statistics for the cost-based optimizer:
    table-level row count + size, and per-column NDV/min/max/null
    counts when ``columns`` is given (``None`` → all columns).

    On a real warehouse this is the step that lets Catalyst pick join
    orders and broadcast sides from cardinality instead of raw file
    size (``spark.sql.cbo.enabled``) — at 100 TB a mis-ordered 3-way
    join costs more than every other optimization combined. The scan
    is one pass, column stats ride the same job."""
    if columns is None:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR ALL COLUMNS")
    else:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, table: str) -> dict[str, str]:
    """Read back the table-level statistics line from the catalog
    (rowCount + sizeInBytes) as a small dict — the audit hook for
    "did ANALYZE actually land"."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out: dict[str, str] = {}
    for r in rows:
        if r.col_name == "Statistics":
            out["statistics"] = r.data_type
    return out
