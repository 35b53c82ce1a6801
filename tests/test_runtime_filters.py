"""Runtime row-level filtering (injected bloom filter).

For a SHUFFLE equi join where one side carries a selective filter,
Catalyst can inject a ``bloom_filter_agg`` built on the filtered
(creation) side and apply ``might_contain`` on the probe side BEFORE
the shuffle — rows that cannot match never leave the map stage. At
100 TB this fires on the DEFAULT thresholds (creation side < 10 MB
after filtering, application side scan > 10 GB); the test lowers the
application-side threshold only because sf0.01 is far below 10 GB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from market_etl_spark.tables import load

from conftest import SF_SMOKE

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def _urgent_join(spark):
    li = load(spark, SF_SMOKE, "lineitem")
    o = load(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def test_runtime_bloom_filter_injected_and_neutral(spark):
    baseline = _urgent_join(spark).collect()
    saved = {k: spark.conf.get(k) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        df = _urgent_join(spark)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "runtime filter not injected"
        assert "might_contain" in plan, "probe side not filtered"
        got = df.collect()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert got == baseline  # the filter is a pure pruning optimization
