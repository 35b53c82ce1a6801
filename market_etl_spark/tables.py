"""Testdata table access.

``load(spark, sf_dir, name)`` is the single entry point every query module
uses to read the driver-provided parquet tables. It goes straight through
``spark.read.parquet`` so Catalyst keeps full pushdown/pruning ability —
no caching, no repartitioning here; the plan decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES
from .session import apply_runtime_conf

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    apply_runtime_conf(spark)
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
