"""The composed trades ETL job: CSV zone → partitioned Parquet + catalog.

Spark-first restatement of the reference's Glue job
(jobs/etl/glue_spark_trades_etl.py:37-205): one declarative pipeline,
one pass over the data (DQ metrics observed during the write instead of
the reference's five recomputations), dynamic-partition overwrite for
idempotent re-runs.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .catalog import register_trades_table
from .quality import filter_with_metrics
from .sinks import write_partitioned_parquet
from .sources import read_trades_csv
from .transforms import dq_predicate, transform_trades


@dataclass
class EtlResult:
    output_path: str
    table: str | None
    metrics: dict


def run_trades_etl(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    table: str | None = None,
    load_dt: dt.date | None = None,
) -> EtlResult:
    """CSV → transform → DQ-filter (metrics in the same pass) →
    partitioned Parquet → optional catalog registration.

    The whole job is a single Spark action (the write); scan, projection
    and filter stay in one whole-stage-codegen pipeline, and the only
    shuffle-like step is the dynamic partition write's file fan-out.
    """
    raw = read_trades_csv(spark, input_path)
    derived = transform_trades(raw, load_dt=load_dt, validate=False)
    dq = filter_with_metrics(derived, dq_predicate())
    write_partitioned_parquet(dq.df, output_path)

    metrics = dq.metrics()
    if table:
        register_trades_table(spark, table, output_path)
    return EtlResult(output_path=output_path, table=table, metrics=metrics)
