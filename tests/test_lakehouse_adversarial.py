"""Adversarial composition tests for the round-11 lakehouse surface:
degenerate inputs, concurrency interleavings and cross-feature
combinations the happy-path suites don't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_etl_spark import lakehouse as lk


def _ranged(spark, tmp_path, files=4, chunk=100):
    path = str(tmp_path / "t")
    for i in range(files):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(i * chunk + j, (i * chunk + j) % 7, float(j)) for j in range(chunk)],
                "id long, k long, v double",
            ).coalesce(1)
        )
        t.commit()
    return path


def test_zorder_three_columns(spark, tmp_path):
    path = _ranged(spark, tmp_path)
    t = lk.Transaction(path)
    before, after = t.optimize_zorder(spark, ["id", "k", "v"], n_files=8, bits=5)
    t.commit()
    assert before == 4 and after >= 1
    # all three dimensions still read correctly and id still prunes
    assert lk.read_table(spark, path).count() == 400
    _v, kept, total = lk.prune_files(path, [("id", "<", 50)])
    assert len(kept) < total
    assert lk.read_table(spark, path, predicate=[("id", "<", 50)]).count() == 50


def test_zorder_constant_column_degenerates_gracefully(spark, tmp_path):
    # one clustered column constant: every row lands in bucket 0 for it
    # and the z-value degenerates to the other column's ordering
    path = str(tmp_path / "t")
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(i, 42.0) for i in range(200)], "id long, c double"
        ).coalesce(1)
    )
    t.commit()
    t = lk.Transaction(path)
    t.optimize_zorder(spark, ["c", "id"], n_files=4)
    t.commit()
    assert lk.read_table(spark, path).count() == 200
    _v, kept, total = lk.prune_files(path, [("id", "<", 50)])
    assert len(kept) < total  # id still clusters despite the dead dim


def test_parallel_slice_backfills_commute(spark, tmp_path):
    # two replace_where transactions on DISJOINT slices: both commit
    path = _ranged(spark, tmp_path)
    mk = lambda lo, hi, val: spark.createDataFrame(  # noqa: E731
        [(j, j % 7, val) for j in range(lo, hi)], "id long, k long, v double"
    ).coalesce(1)
    t1 = lk.Transaction(path)
    t1.replace_where(spark, [("id", ">=", 0), ("id", "<", 100)], mk(0, 100, -1.0))
    t2 = lk.Transaction(path)
    t2.replace_where(spark, [("id", ">=", 200), ("id", "<", 300)], mk(200, 300, -2.0))
    t2.commit()
    t1.commit()  # disjoint files: no conflict
    df = lk.read_table(spark, path)
    assert df.count() == 400
    assert df.filter("id < 100").agg(F.sum("v")).collect()[0][0] == -100.0
    assert df.filter("id >= 200 and id < 300").agg(F.sum("v")).collect()[0][0] == -200.0
    assert df.filter("id >= 100 and id < 200").agg(F.sum("v")).collect()[0][0] == sum(
        float(j) for j in range(100)
    )


def test_overlapping_slice_backfills_conflict(spark, tmp_path):
    path = _ranged(spark, tmp_path)
    new = spark.createDataFrame(
        [(j, j % 7, 0.0) for j in range(100)], "id long, k long, v double"
    ).coalesce(1)
    t1 = lk.Transaction(path)
    t1.replace_where(spark, [("id", "<", 100)], new)
    t2 = lk.Transaction(path)
    t2.replace_where(spark, [("id", "<", 100)], new)
    t2.commit()
    with pytest.raises(lk.CommitConflict):
        t1.commit()


def test_zorder_commutes_with_concurrent_append(spark, tmp_path):
    # Delta semantics: a rewrite reads its snapshot; a blind append
    # adds a file the rewrite never touched — both commits land
    path = _ranged(spark, tmp_path)
    t1 = lk.Transaction(path)
    t1.optimize_zorder(spark, ["id", "k"], n_files=4)
    t2 = lk.Transaction(path)
    t2.append(
        spark.createDataFrame([(9999, 0, 1.0)], "id long, k long, v double")
    )
    t2.commit()
    t1.commit()
    assert lk.read_table(spark, path).count() == 401
    assert (
        lk.read_table(spark, path).filter("id = 9999").count() == 1
    )  # the concurrent append survived the whole-table rewrite


def test_zorder_conflicts_with_concurrent_delete(spark, tmp_path):
    path = _ranged(spark, tmp_path)
    t1 = lk.Transaction(path)
    t1.optimize_zorder(spark, ["id", "k"], n_files=4)
    t2 = lk.Transaction(path)
    t2.delete_where_mor(spark, F.col("id") < 10)
    t2.commit()
    # t1's staged rewrite (without the DV) would resurrect the deletes
    with pytest.raises(lk.CommitConflict):
        t1.commit()


def test_generated_column_with_unrelated_evolution(spark, tmp_path):
    import datetime

    path = str(tmp_path / "t")
    t = lk.Transaction(path)
    t.set_generated_column(spark, "day", "CAST(ts AS DATE)", "date")
    t.commit()
    base = datetime.datetime(2026, 2, 1)
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(1, base)], "id long, ts timestamp"
        )
    )
    t.commit()
    # evolve an unrelated column; the generated invariant still holds
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(2, base, "x")], "id long, ts timestamp, tag string"
        ),
        evolve_schema=True,
    )
    t.commit()
    df = lk.read_table(spark, path)
    assert set(df.columns) == {"id", "ts", "day", "tag"}
    assert df.filter("day <> CAST(ts AS DATE)").count() == 0


def test_skipping_in_op_and_conjunction_edges(spark, tmp_path):
    path = _ranged(spark, tmp_path)
    # IN hitting two distinct files
    _v, kept, total = lk.prune_files(path, [("id", "in", (5, 305))])
    assert (len(kept), total) == (2, 4)
    got = {
        r.id
        for r in lk.read_table(
            spark, path, predicate=[("id", "in", (5, 305))]
        ).collect()
    }
    assert got == {5, 305}
    # empty IN list: provably nothing
    assert lk.prune_files(path, [("id", "in", ())])[1] == []
    assert lk.read_table(spark, path, predicate=[("id", "in", ())]).count() == 0


def test_expire_after_zorder_drops_prezorder_generation(spark, tmp_path):
    path = _ranged(spark, tmp_path)
    t = lk.Transaction(path)
    t.optimize_zorder(spark, ["id", "k"], n_files=2)
    t.commit()  # v5
    res = lk.expire_versions(path, 5)
    assert res["data_files_deleted"] == 4  # the pre-zorder files
    assert lk.read_table(spark, path).count() == 400
    _v, kept, total = lk.prune_files(path, [("id", "<", 100)])
    assert len(kept) <= total <= 2  # skipping intact off the checkpoint


def test_threaded_maintenance_races_appenders(spark, tmp_path):
    """Genuine contention across OP TYPES: 3 appender threads land
    blind single-row appends while a maintenance thread drives
    compact_small and disjoint-slice replace_where transactions with
    a retry loop — the real shape of a table with ingest + nightly
    maintenance.  Invariants: no append lost, no row duplicated, the
    maintenance retry loop converges, final state consistent."""
    import threading

    path = _ranged(spark, tmp_path)  # ids 0..399 in 4 files
    errors: list[Exception] = []
    lock = threading.Lock()
    appended: list[int] = []

    def appender(wid: int) -> None:
        try:
            for j in range(3):
                rid = 10_000 + wid * 10 + j
                t = lk.Transaction(path)
                t.append(
                    spark.createDataFrame(
                        [(rid, 0, 0.5)], "id long, k long, v double"
                    ).coalesce(1)
                )
                t.commit()
                with lock:
                    appended.append(rid)
        except Exception as e:  # pragma: no cover - surfaced below
            with lock:
                errors.append(e)

    def maintainer() -> None:
        try:
            for attempt in range(20):  # compact_small with retry
                t = lk.Transaction(path)
                if t.compact_small(spark, target_bytes=1 << 20) == (0, 0):
                    break
                try:
                    t.commit()
                    break
                except lk.CommitConflict:
                    continue
            new = spark.createDataFrame(
                [(j, j % 7, -5.0) for j in range(100, 200)],
                "id long, k long, v double",
            ).coalesce(1)
            for attempt in range(20):  # slice backfill with retry
                t = lk.Transaction(path)
                t.replace_where(
                    spark, [("id", ">=", 100), ("id", "<", 200)], new
                )
                try:
                    t.commit()
                    return
                except lk.CommitConflict:
                    continue
            raise AssertionError("backfill never converged")
        except Exception as e:  # pragma: no cover
            with lock:
                errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(w,)) for w in range(3)
    ] + [threading.Thread(target=maintainer)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    df = lk.read_table(spark, path)
    rows = {(r.id, r.v) for r in df.collect()}
    ids = [r[0] for r in rows]
    assert len(ids) == len(set(ids)) == 400 + 9  # nothing lost or doubled
    assert all((rid, 0.5) in rows for rid in appended)
    assert df.filter("id >= 100 and id < 200").agg(F.sum("v")).collect()[0][0] == -500.0


def _identity_table(spark, tmp_path):
    path = str(tmp_path / "t")
    t = lk.Transaction(path)
    t.set_identity_column("rid", start=1, step=1)
    t.commit()
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(j, float(j)) for j in range(20)], "x long, v double"
        ).coalesce(2)
    )
    t.commit()
    return path


def test_merge_into_identity_table_stamps_inserts(spark, tmp_path):
    path = _identity_table(spark, tmp_path)
    t = lk.Transaction(path)
    counts = t.merge_into(
        spark,
        spark.createDataFrame([(5, -5.0), (500, 1.0)], "x long, v double"),
        ["x"],
        when_matched_update={"v": F.col("s.v")},
        when_not_matched_insert=True,
    )
    t.commit()
    assert counts["updated"] == 1 and counts["inserted"] == 1
    df = lk.read_table(spark, path)
    # the inserted row got a fresh engine id; uniqueness holds
    assert df.count() == df.select("rid").distinct().count() == 21
    assert df.filter("x = 500").select("rid").collect()[0][0] is not None
    # SETting the identity column is refused
    t = lk.Transaction(path)
    with pytest.raises(ValueError, match="engine-assigned"):
        t.merge_into(
            spark,
            spark.createDataFrame([(5, 0.0)], "x long, v double"),
            ["x"],
            when_matched_update={"rid": F.lit(9)},
        )
    t2 = lk.Transaction(path)
    with pytest.raises(ValueError, match="engine-assigned"):
        t2.update_where_mor(spark, F.col("x") == 5, {"rid": F.lit(9)})


def test_rename_identity_column_rekeys_spec(spark, tmp_path):
    path = _identity_table(spark, tmp_path)
    t = lk.Transaction(path)
    t.rename_column("rid", "row_key")
    t.commit()
    t = lk.Transaction(path)
    t.append(spark.createDataFrame([(100, 1.0)], "x long, v double"))
    t.commit()
    df = lk.read_table(spark, path)
    assert "row_key" in df.columns and "rid" not in df.columns
    assert df.count() == df.select("row_key").distinct().count() == 21
    # stamping continued above the pre-rename high-water
    pre = df.filter("x < 20").agg(F.max("row_key")).collect()[0][0]
    post = df.filter("x = 100").collect()[0].row_key
    assert post > pre


def test_replace_where_refuses_identity_slice(spark, tmp_path):
    path = _identity_table(spark, tmp_path)
    t = lk.Transaction(path)
    with pytest.raises(ValueError, match="engine-assigned|NEW"):
        t.replace_where(
            spark,
            [("rid", "<", 10)],
            spark.createDataFrame([(1, 1.0)], "x long, v double"),
        )


def test_identity_generated_mutual_exclusion(spark, tmp_path):
    path = str(tmp_path / "t")
    t = lk.Transaction(path)
    t.set_identity_column("a")
    with pytest.raises(ValueError, match="cannot.*also be generated"):
        t.set_generated_column(spark, "a", "1 + 1", "long")
    t2 = lk.Transaction(path)
    t2.set_generated_column(spark, "b", "x * 2", "long")
    with pytest.raises(ValueError, match="cannot.*also be an identity"):
        t2.set_identity_column("b")


# --- ADVICE r11 regressions -------------------------------------------


def test_replace_where_absent_slice_is_pure_insert(spark, tmp_path):
    """Backfilling a slice NOT yet in the table (stats prune every
    live file) must degenerate to a validated append, not crash on a
    zero-path snapshot frame (ADVICE r11)."""
    path = _ranged(spark, tmp_path, files=2, chunk=50)  # ids 0..99
    t = lk.Transaction(path)
    deleted, added = t.replace_where(
        spark,
        [("id", ">=", 1000), ("id", "<", 1100)],
        spark.createDataFrame(
            [(1000 + j, j % 7, float(j)) for j in range(10)],
            "id long, k long, v double",
        ),
    )
    t.commit()
    assert deleted == 0 and added >= 1
    df = lk.read_table(spark, path)
    assert df.count() == 110
    assert df.filter("id >= 1000").count() == 10
    # and on a COMPLETELY empty table: pure insert as well
    p2 = str(tmp_path / "empty")
    t0 = lk.Transaction(p2)
    t0.append(
        spark.createDataFrame([(1, 0, 0.0)], "id long, k long, v double")
    )
    t0.commit()
    t1 = lk.Transaction(p2)
    d2, a2 = t1.replace_where(
        spark,
        [("id", ">=", 50)],
        spark.createDataFrame([(60, 0, 1.0)], "id long, k long, v double"),
    )
    t1.commit()
    assert d2 == 0 and a2 == 1
    assert lk.read_table(spark, p2).count() == 2


def test_identity_survives_wide_schema(spark, tmp_path):
    """An identity column on a table with more than _STATS_MAX_COLS
    user columns: the identity column lands LAST physically, past the
    stats cap — it must still be force-indexed so the high-water
    advances (ADVICE r11)."""
    import pyspark.sql.functions as SF

    path = str(tmp_path / "wide")
    t = lk.Transaction(path)
    t.set_identity_column("rid", start=1, step=1)
    t.commit()
    ncols = lk._STATS_MAX_COLS + 4
    base = spark.range(10).select(
        *[SF.col("id").alias(f"c{i:02d}") for i in range(ncols)]
    )
    t = lk.Transaction(path)
    assert t.append(base) >= 1
    t.commit()
    t = lk.Transaction(path)
    t.append(base)
    t.commit()
    df = lk.read_table(spark, path)
    assert df.count() == 20
    # dense, unique, monotone across the two appends
    rids = sorted(r.rid for r in df.select("rid").collect())
    assert rids == list(range(1, 21))


def test_stats_admit_date_vs_datetime_shapes(spark, tmp_path):
    """Date-shaped footer stats vs datetime predicate values (and the
    reverse) must align to Spark's midnight promotion — the raw
    lexicographic compare pruned a file whose max day IS the
    predicate's day, silently dropping rows (ADVICE r11)."""
    import datetime as dt

    st = {
        "rows": 5,
        "cols": {"day": {"min": "2024-01-10", "max": "2024-01-15", "nulls": 0}},
    }
    mid = dt.datetime(2024, 1, 15)  # == max day at midnight
    assert lk._stats_admit(st, "day", "=", mid)
    assert lk._stats_admit(st, "day", ">=", mid)
    assert lk._stats_admit(st, "day", "<=", dt.datetime(2024, 1, 10))
    # ... and still prunes what it can prove
    assert not lk._stats_admit(st, "day", "=", dt.datetime(2024, 1, 16))
    assert not lk._stats_admit(st, "day", ">", dt.datetime(2024, 1, 15))
    assert not lk._stats_admit(st, "day", "<", dt.datetime(2024, 1, 10))
    # intraday value inside the max day: the day's rows may match
    assert lk._stats_admit(st, "day", "<=", dt.datetime(2024, 1, 15, 12))
    # reverse: datetime-shaped stats, date predicate value
    st2 = {
        "rows": 5,
        "cols": {
            "ts": {
                "min": "2024-01-10T00:00:00",
                "max": "2024-01-15T08:30:00",
                "nulls": 0,
            }
        },
    }
    assert lk._stats_admit(st2, "ts", "=", dt.date(2024, 1, 15))
    assert not lk._stats_admit(st2, "ts", "=", dt.date(2024, 1, 16))
    assert lk._stats_admit(st2, "ts", ">", dt.date(2024, 1, 15))


def test_date_column_datetime_predicate_end_to_end(spark, tmp_path):
    """Pruned read == full filtered read when the predicate value is a
    datetime and the column is a DATE (the exact ADVICE r11 silent-
    drop scenario)."""
    import datetime as dt

    path = str(tmp_path / "dated")
    for d in (10, 15):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(dt.date(2024, 1, d), float(j)) for j in range(5)],
                "day date, v double",
            ).coalesce(1)
        )
        t.commit()
    pred = [("day", "=", dt.datetime(2024, 1, 15))]
    _v, kept, total = lk.prune_files(path, pred)
    assert total == 2 and len(kept) == 1  # skips day-10, KEEPS day-15
    got = lk.read_table(spark, path, predicate=pred)
    assert got.count() == 5  # previously 0: file wrongly pruned


def test_mixed_allnull_row_group_never_allnull_pruned(spark, tmp_path):
    """A file whose column is all-null in SOME row groups but valued
    in others must keep sound bounds: admitted inside the valued
    range, prunable outside it, and NEVER hit by the all-null rule
    (ADVICE r11)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = tmp_path / "mixed.parquet"
    tbl = pa.table(
        {
            "id": pa.array(list(range(10)), pa.int64()),
            "x": pa.array([None] * 5 + list(range(100, 105)), pa.int64()),
        }
    )
    pq.write_table(tbl, str(f), row_group_size=5)  # rg0 all-null, rg1 valued
    st = lk._file_stats(f)
    assert st["rows"] == 10
    c = st["cols"]["x"]
    assert c["min"] == 100 and c["max"] == 104 and c["nulls"] == 5
    assert lk._stats_admit(st, "x", "=", 102)       # valued range admits
    assert not lk._stats_admit(st, "x", "=", 99)    # outside bounds prunes
    # undercounted nulls (writer emitted no null_count) stay SAFE:
    # the all-null prune needs nulls == rows exactly
    under = {"rows": 10, "cols": {"x": {"min": None, "max": None, "nulls": 4}}}
    assert lk._stats_admit(under, "x", "=", 1)
    allnull = {"rows": 10, "cols": {"x": {"min": None, "max": None, "nulls": 10}}}
    assert not lk._stats_admit(allnull, "x", "=", 1)
