"""As-of join edge semantics (ties, no-match, tolerance)."""

from __future__ import annotations

import datetime as dt

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
