"""Continuous-aggregate re-aggregation semantics + small-file compaction."""

from __future__ import annotations

import pathlib
import shutil

import pyspark.sql.functions as F

from market_etl_spark.rollups import build_minute_rollup, serve_from_rollup
from market_etl_spark.sinks import compact_partitioned, write_partitioned_parquet
from market_etl_spark.tables import load

from conftest import SF_SMOKE

SCRATCH = pathlib.Path(__file__).resolve().parent.parent / ".scratch" / "rollcomp"


def test_rollup_serving_equals_direct(spark):
    """Daily served-from-rollup must equal direct aggregation — incl.
    VWAP, which would be wrong if averaged instead of recombined."""
    e = load(spark, SF_SMOKE, "events").withColumn(
        "qty", ((F.col("event_id") % 7) + 1).cast("double")
    )
    served = {
        (r.day, r.event_type): (r.num_trades, r.total_volume, r.vwap_value, r.low, r.high)
        for r in serve_from_rollup(build_minute_rollup(e), "day").collect()
    }
    direct = {
        (r.day, r.event_type): (r.num_trades, r.total_volume, r.vwap_value, r.low, r.high)
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("num_trades"),
            F.round(F.sum("qty"), 6).alias("total_volume"),
            F.round(
                F.sum(F.col("value") * F.col("qty")) / F.nullif(F.sum("qty"), F.lit(0)), 6
            ).alias("vwap_value"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
        )
        .collect()
    }
    assert set(served) == set(direct) and len(served) > 0
    for k, s in served.items():
        d = direct[k]
        assert (s[0], s[1], s[3], s[4]) == (d[0], d[1], d[3], d[4]), k
        # VWAP recombines from different summation orders — exact to the
        # last ulp is not promised, 1e-5 closeness is (avg-of-avgs would
        # be off by whole units)
        assert abs(s[2] - d[2]) < 1e-5, (k, s[2], d[2])


def test_compaction_reduces_files_preserves_rows(spark):
    out = SCRATCH / "frag"
    shutil.rmtree(out, ignore_errors=True)
    e = load(spark, SF_SMOKE, "events").select(
        "event_id",
        "value",
        F.year("ts").cast("int").alias("year"),
        F.month("ts").cast("int").alias("month"),
        F.dayofmonth("ts").cast("int").alias("day"),
        F.upper("event_type").alias("symbol"),
    )
    # fragment: many shuffle partitions -> many files per Hive partition
    write_partitioned_parquet(e.repartition(16), str(out))
    rows_before = spark.read.parquet(str(out)).count()
    before, after = compact_partitioned(spark, str(out))
    partitions = len({p.parent for p in out.rglob("*.parquet")})
    assert before > after
    assert after == partitions  # one file per Hive partition
    assert spark.read.parquet(str(out)).count() == rows_before
