"""As-of join edge semantics (ties, no-match, tolerance)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from market_etl_spark.queries.relational_ext import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(10), 200.0), (2, _ts(3), 300.0)],
        "user_id long, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0), (1, _ts(9), 2.0), (3, _ts(1), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        (r.user_id, r.ts): (r.asof_value, r.asof_ts)
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    # equal timestamps match ("at or before")
    assert out[(1, _ts(5))] == (1.0, _ts(5))
    # latest prior, not first
    assert out[(1, _ts(10))] == (2.0, _ts(9))
    # no right row for user 2 -> NULLs, row preserved (left semantics)
    assert out[(2, _ts(3))] == (None, None)
    # right-only user 3 produces no output row
    assert len(out) == 3


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(30), 1.0)], "user_id long, ts timestamp, lv double"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 7.0)], "user_id long, ts timestamp, value double"
    )
    no_tol = asof_join(left, right, on="user_id", ts="ts").collect()[0]
    assert no_tol.asof_value == 7.0
    with_tol = asof_join(
        left, right, on="user_id", ts="ts", tolerance_expr="600"
    ).collect()[0]  # 10-minute tolerance, match is 30 min old
    assert with_tol.asof_value is None and with_tol.asof_ts is None


def test_binned_interval_join_spanning_and_boundaries(spark):
    """An interval spanning multiple bins still matches facts in every
    covered bin; start is inclusive, end exclusive; a fact matching
    two intervals appears twice (once per interval)."""
    from market_etl_spark.queries.relational_ext import binned_interval_join

    facts = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:02:30"),
         (3, "2024-01-01 10:05:00"), (4, "2024-01-01 10:04:59.999")],
        "fid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivals = spark.createDataFrame(
        [(100, "2024-01-01 10:00:00", "2024-01-01 10:05:00"),
         (200, "2024-01-01 10:02:00", "2024-01-01 10:03:00")],
        "iid long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )
    out = binned_interval_join(facts, ivals, "ts", "s", "e", 60)
    got = sorted((r.fid, r.iid) for r in out.collect())
    # fid 3 at exactly 10:05:00 is excluded (end-exclusive);
    # fid 2 matches both the 5-min and the 1-min interval
    assert got == [(1, 100), (2, 100), (2, 200), (4, 100)]
    assert "BroadcastNestedLoopJoin" not in out._jdf.queryExecution().executedPlan().toString()


def test_range_band_join_half_open_edges(spark):
    from market_etl_spark.queries.relational_ext import range_band_join

    facts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 9.999999), (4, 20.0)], "fid long, v double"
    )
    bands = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0)], "band_id long, lo double, hi double"
    )
    got = {r.fid: r.band_id for r in range_band_join(facts, bands, "v").collect()}
    # 20.0 == hi of the last band → excluded (half-open)
    assert got == {1: 0, 2: 1, 3: 0}


def test_salted_join_matches_plain_join(spark):
    """salted_join must be EXACTLY the unsalted join: every big row
    meets each matching small row once (in its own salt lane)."""
    from market_etl_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(1000)],
        "id long, k string",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0), ("absent", 3.0)], "k string, w double"
    )
    plain = sorted((r.id, r.k, r.w) for r in big.join(small, "k").collect())
    salted = sorted(
        (r.id, r.k, r.w) for r in salted_join(big, small, "k", 8).collect()
    )
    assert plain == salted
    assert len(plain) == 1000  # every big row matched exactly once

    # left join keeps unmatched big rows with NULL fill, same as unsalted
    small2 = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    left = sorted(
        (r.id, r.w) for r in salted_join(big, small2, "k", 8, how="left").collect()
    )
    assert len(left) == 1000
    assert sum(1 for _, w in left if w is None) == 100  # the "cold" rows


def test_salted_join_spreads_key_in_plan(spark):
    """The physical join key must be (k, _salt), not k alone — that is
    the whole point: a hot k now hashes into salt_buckets reducers."""
    from market_etl_spark.functions.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "id long, k string")
    small = spark.createDataFrame([("a", 1.0)], "k string, w double")
    df = salted_join(big, small.hint("shuffle_hash"), "k", 4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "_salt" in plan
