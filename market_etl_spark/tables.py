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


def fanout_partitions(spark: SparkSession) -> int:
    """Partition count for spreading a per-row CPU stage across the cluster.

    The single-file testdata scan is ONE map task, so per-row compute
    stages (codec decode, md5 fan-out) must repartition first or run
    serially. The right width is the cluster's, not a constant: on
    ``local[N]`` this is N, on a real cluster it is total executor cores
    — the same stages ride every core at 100 TB without a code change.
    """
    return max(spark.sparkContext.defaultParallelism, 2)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    # Timestamp columns have shipped as INT64 TIMESTAMP(NANOS) (read as
    # nanosecond longs under nanosAsLong — events.ts in some rounds) and
    # as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ
    # — events.ts, orders.o_orderdate, lineitem.l_shipdate). Normalize
    # both to TimestampType so downstream epoch math and literal
    # comparisons resolve; the session timezone is pinned to UTC, so the
    # NTZ→TIMESTAMP cast preserves wall-clock and matches the DuckDB
    # oracle, which reads the files natively as naive timestamps. The
    # casts are plan-level projections — pushdown/pruning on other
    # columns is unaffected.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Integer-divide nanos to micros (exact — no double round-trip).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
