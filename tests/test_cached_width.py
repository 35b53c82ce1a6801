"""Cached-partition-width lint (round-7 verdict item 2).

The class of defect, generalized from ``q_scd2_history_build``: a
relation ``.cache()``d under a wide session default (the driver's
vanilla 200 shuffle partitions) materializes with far more partitions
than its bytes justify, and an iterated consumer then pays a
session-default-wide task sweep PER ITERATION — pure scheduling cost,
invisible in any single ``explain`` because the loop is driver-side.

Two detectors in :mod:`market_etl_spark.planlint`:

- ``cached_width_offenders`` — live storage-info sweep: cached
  partitions vs a bytes-justified width;
- ``record_stage_widths`` + ``assert_bounded_stage_widths`` — runtime
  stage-width audit for folds whose caches are gone by return time.

This module seeds the ORIGINAL defect shape and proves both detectors
fire on it (red), then runs the fixed registered queries under a
200-partition session and proves the audit passes (green) — the
"lint red on the seeded current scd2 shape, green registry-wide after
the fix" contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_etl_spark import planlint
from market_etl_spark.queries import REGISTRY

from conftest import SF_SMOKE


@pytest.fixture()
def vanilla_partitions(spark):
    """Mimic the driver's vanilla session default around a block."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_offenders_flag_wide_tiny_cache(spark):
    """A few-KB relation cached at 200 partitions is the seeded trap."""
    df = spark.range(100).repartition(200).cache()
    try:
        df.count()
        bad = planlint.cached_width_offenders(spark)
        assert bad, "200-partition 100-row cache must be flagged"
        _, _, parts, justified = bad[0]
        assert parts == 200 and justified < 200
        with pytest.raises(AssertionError, match="coalesce/repartition"):
            planlint.assert_no_oversized_cache(spark, "seeded")
    finally:
        df.unpersist()


def test_offenders_pass_input_width_cache(spark):
    """An input-width (32-way) cache of a small relation is normal
    local-scan currency, not the trap — the floor keeps it green."""
    df = spark.range(1000).repartition(32).cache()
    try:
        df.count()
        assert planlint.cached_width_offenders(spark) == []
    finally:
        df.unpersist()


def test_stage_audit_flags_seeded_wide_loop(vanilla_partitions):
    """The original q_scd2_history_build shape, miniaturized: cache
    materialized at the 200-partition session default, then an
    iterated consumer rescans it.  Every iteration schedules a
    200-task stage — the width recorder must see them."""
    spark = vanilla_partitions
    base = (
        spark.range(2000)
        .select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
        .cache()  # materializes at 200 (the groupBy shuffle width)
    )
    try:
        with planlint.record_stage_widths(spark) as rec:
            base.count()
            for i in range(3):
                base.filter(F.col("k") == i).count()
        assert max(rec.widths) >= 200, rec.widths
        with pytest.raises(AssertionError, match="wider than"):
            planlint.assert_bounded_stage_widths(
                rec.widths, max_width=64, name="seeded-scd2-shape"
            )
    finally:
        base.unpersist()


#: Iterated / eager-fold queries (driver-side loop of bounded jobs) and
#: their scheduling contracts under a VANILLA-wide session:
#: (max_width, wide_threshold, wide_budget).  max_width 64 rejects any
#: stage at the 200-partition session default while allowing
#: input-width (<=32-way) scans; the wide budget bounds how many
#: scan-width stages the fold may launch — the loop body itself must
#: stay at its pinned width.
_ITERATED = {
    "q_scd2_history_build": (64, 8, 8),
}


@pytest.mark.parametrize("name", sorted(_ITERATED))
def test_iterated_query_stage_widths(vanilla_partitions, name):
    spark = vanilla_partitions
    max_width, wide_threshold, wide_budget = _ITERATED[name]
    fn = REGISTRY[name].fn
    with planlint.record_stage_widths(spark) as rec:
        df = fn(spark, SF_SMOKE)
        df.count()
    assert rec.widths, "the fold should have launched eager jobs"
    planlint.assert_bounded_stage_widths(
        rec.widths,
        max_width=max_width,
        wide_threshold=wide_threshold,
        wide_budget=wide_budget,
        name=name,
    )
