"""Bounded forced broadcasts (round 12, VERDICT r11 item 3): the DV
anti join and the merge source probe drop their ``F.broadcast`` hint
past a configurable position/row bound — plan-asserted shuffle joins
with results identical to the broadcast plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_etl_spark import lakehouse as lk
from market_etl_spark import mor

CONF = lk._BROADCAST_MAX_ROWS_CONF


@pytest.fixture
def tiny_cap(spark):
    # kill AUTO broadcast on both planner paths: with the thresholds
    # at -1, a BroadcastHashJoin can only come from the forced hint —
    # its presence/absence is then exactly what these tests assert
    spark.conf.set(CONF, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.unset(CONF)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _plan(df) -> str:
    df.collect()  # AQE finalizes the physical plan on execution
    return df._jdf.queryExecution().executedPlan().toString()


def _dv_table(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(2):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(i * 20 + j, float(j)) for j in range(20)],
                "id long, v double",
            ).coalesce(1)
        )
        t.commit()
    t = lk.Transaction(path)
    t.delete_where_mor(spark, F.col("id") % 3 == 0)
    t.commit()
    return path


def test_read_table_drops_dv_broadcast_past_cap(spark, tmp_path, tiny_cap):
    path = _dv_table(spark, tmp_path)
    bounded = lk.read_table(spark, path)
    plan = _plan(bounded)
    assert "BroadcastHashJoin" not in plan  # the hint really dropped
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    spark.conf.unset(CONF)  # default cap: broadcast comes back
    fast = lk.read_table(spark, path)
    assert "BroadcastHashJoin" in _plan(fast)
    spark.conf.set(CONF, "1")
    assert sorted(map(tuple, bounded.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_rewrites_survive_dropped_hint(spark, tmp_path, tiny_cap):
    # delete_where, compact_small and merge all ride _dv_subtract /
    # the bounded source hint: with cap=1 every one must still
    # produce the exact snapshot the default-cap path produces
    path = _dv_table(spark, tmp_path)
    t = lk.Transaction(path)
    n = t.delete_where(spark, F.col("id") == 4)
    t.commit()
    assert n == 1
    t = lk.Transaction(path)
    counts = t.merge_into(
        spark,
        spark.createDataFrame([(5, -5.0), (999, 1.0)], "id long, v double"),
        ["id"],
        when_matched_update={"v": F.col("s.v")},
        when_not_matched_insert=True,
    )
    t.commit()
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    got = lk.read_table(spark, path)
    assert got.filter("id = 5").collect()[0].v == -5.0
    # ids 0..39 minus multiples of 3 minus {4}, plus 999
    assert got.count() == 40 - 14 - 1 + 1
    t = lk.Transaction(path)
    t.compact_small(spark, target_bytes=1 << 30)
    t.commit()
    assert lk.read_table(spark, path).count() == 26


def test_mor_module_read_drops_hint(spark, tmp_path, tiny_cap):
    data = str(tmp_path / "m")
    spark.createDataFrame(
        [(j, float(j)) for j in range(30)], "id long, v double"
    ).coalesce(2).write.parquet(data)
    mor.write_deletion_vector(spark, data, F.col("id") < 10)
    bounded = mor.read_with_deletes(spark, data)
    plan = _plan(bounded)
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" in plan
    assert bounded.count() == 20
    spark.conf.unset(CONF)
    fast = mor.read_with_deletes(spark, data)
    assert "BroadcastHashJoin" in _plan(fast)
    spark.conf.set(CONF, "1")
    assert sorted(map(tuple, bounded.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_unreadable_sidecar_counts_as_over_cap(tmp_path):
    bad = tmp_path / "dv.parquet"
    bad.write_bytes(b"not parquet")
    assert lk._dv_rowcount(tmp_path, ["dv.parquet"]) > lk._BROADCAST_MAX_ROWS
