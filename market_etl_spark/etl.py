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


def main(argv: list[str] | None = None) -> None:
    """CLI mirroring the reference Glue job's arguments
    (``--input_path --output_path [--table] [--load_dt]``), so the job
    is runnable as ``python -m market_etl_spark.etl`` on any
    spark-submit-able environment instead of only inside Glue."""
    import argparse
    import json

    from .session import get_spark

    p = argparse.ArgumentParser(description="CSV trades zone -> partitioned Parquet")
    p.add_argument("--input-path", required=True, help="raw CSV zone (recursive)")
    p.add_argument("--output-path", required=True, help="partitioned parquet root")
    p.add_argument("--table", default=None, help="optional catalog table to register")
    p.add_argument("--load-dt", default=None, help="YYYY-MM-DD load date override")
    args = p.parse_args(argv)

    load_dt = dt.date.fromisoformat(args.load_dt) if args.load_dt else None
    spark = get_spark("trades-etl")
    result = run_trades_etl(
        spark, args.input_path, args.output_path, table=args.table, load_dt=load_dt
    )
    print(json.dumps({"output_path": result.output_path, "table": result.table,
                      "metrics": result.metrics}))


if __name__ == "__main__":
    main()
