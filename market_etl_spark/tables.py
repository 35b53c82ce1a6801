"""Testdata table access.

``load(spark, sf_dir, name)`` is the single entry point every query module
uses to read the driver-provided parquet tables. It goes straight through
``spark.read.parquet`` so Catalyst keeps full pushdown/pruning ability —
no caching, no repartitioning here; the plan decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from pyspark.sql.types import TimestampNTZType

from .schemas import TESTDATA_TABLES
from .session import apply_runtime_conf

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # events.ts has shipped as INT64 TIMESTAMP(NANOS) (reads as
        # nanosecond longs under nanosAsLong) and as TIMESTAMP(MICROS,
        # isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ). Normalize both
        # to TimestampType so downstream epoch math (unix_micros etc.)
        # resolves; the session timezone is pinned to UTC, so the
        # NTZ→TIMESTAMP cast preserves wall-clock and matches the DuckDB
        # oracle, which reads the file natively as a naive timestamp.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Integer-divide nanos to micros (exact — no double round-trip).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
