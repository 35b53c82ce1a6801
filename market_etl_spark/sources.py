"""Sources (SURVEY.md §2.1): schema-on-read scans into DataFrames.

Every reader keeps the plan declarative so Catalyst retains pushdown,
column pruning, and partition discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .schemas import TRADES_RAW_CSV


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    recursive: bool = True,
    header: bool = False,
) -> DataFrame:
    """S7 — headerless CSV scan with an explicit schema (never inferred)
    and recursive directory walk.

    Parity: reference jobs/etl/glue_spark_trades_etl.py:66-71. The
    recursive lookup makes Hive-style ingest layouts
    (``symbol=X/year=Y/month=M/part.csv``) scan as one dataset while
    `input_file_name()` retains per-row lineage for partition recovery.
    """
    return (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true" if recursive else "false")
        .option("header", "true" if header else "false")
        .csv(path)
    )


def read_trades_csv(spark: SparkSession, path: str) -> DataFrame:
    """The trades ingest scan: 7 positional columns, booleans as strings."""
    return read_csv(spark, path, TRADES_RAW_CSV)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S9 — parquet scan (partition columns recovered from directory names)."""
    return spark.read.parquet(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S4 — distributed object listing + content as a DataFrame.

    ``binaryFile`` yields (path, modificationTime, length, content) — the
    Spark-native replacement for the reference's paginated
    ``list_objects_v2`` loop (glue_binance_unzipper.py:33-50), and the
    scale path for distributed archive processing: list once, map
    per-file work across executors.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
