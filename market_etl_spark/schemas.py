"""Canonical schemas.

The engine never infers schemas on the ingest path — the reference declares
them explicitly at three layers (read schema, table DDL, final projection;
see SURVEY.md §1.2) and we preserve that: schema-on-read for headerless CSV,
a fixed processed-table schema, and typed testdata accessors.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Headerless Binance trades CSV, 7 positional fields.
#: Parity with reference jobs/etl/glue_spark_trades_etl.py:20-32
#: (booleans arrive as the strings "True"/"False").
TRADES_RAW_CSV = StructType(
    [
        StructField("trade_id", LongType(), False),
        StructField("price", DoubleType(), False),
        StructField("quantity", DoubleType(), False),
        StructField("quote_qty", DoubleType(), False),
        StructField("time", LongType(), False),
        StructField("is_buyer_maker", StringType(), False),
        StructField("is_best_match", StringType(), False),
    ]
)

#: Processed trades table: 8 data columns + 4 partition columns.
#: Parity with reference sql/athena_create_trades_tales.sql:5-21 and
#: infra/terraform/main.tf:405-478.
TRADES_PROCESSED = StructType(
    [
        StructField("trade_id", LongType(), True),
        StructField("trade_time", TimestampType(), True),
        StructField("symbol", StringType(), True),
        StructField("price", DoubleType(), True),
        StructField("quantity", DoubleType(), True),
        StructField("quote_qty", DoubleType(), True),
        StructField("is_buyer_maker", BooleanType(), True),
        StructField("is_best_match", BooleanType(), True),
        StructField("load_dt", DateType(), True),
        StructField("year", IntegerType(), True),
        StructField("month", IntegerType(), True),
        StructField("day", IntegerType(), True),
    ]
)

#: Hive partition columns of the processed table, in layout order.
TRADES_PARTITION_COLS = ("year", "month", "day", "symbol")

#: Names of the driver-provided testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
