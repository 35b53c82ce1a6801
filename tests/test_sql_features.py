"""SQL-feature semantics on fixtures: recursive-spine zero-fill,
VARIANT null handling for absent keys, schema-evolution column
back-fill, and distribution-window bounds."""

from __future__ import annotations

import datetime as dt

from market_etl_spark.queries import sql_features


def _events_view(spark, rows):
    df = spark.createDataFrame(
        [
            (i, ts, uid, etype, float(val), props)
            for i, (ts, uid, etype, val, props) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.createOrReplaceTempView("events")
    return df


def test_recursive_spine_zero_fills(spark, monkeypatch):
    rows = [
        (dt.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),
        (dt.datetime(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (dt.datetime(2024, 1, 31, 9), 1, "view", 1.0, "{}"),
    ]
    _events_view(spark, rows)
    monkeypatch.setattr(sql_features, "register_all", lambda s, d: None)
    out = sql_features.q_recursive_calendar_spine(spark, "unused").collect()
    assert len(out) == 31
    counts = {r.day: r.n_events for r in out}
    assert counts[dt.date(2024, 1, 1)] == 2
    assert counts[dt.date(2024, 1, 31)] == 1
    assert counts[dt.date(2024, 1, 15)] == 0


def test_variant_absent_key_is_null(spark, monkeypatch):
    rows = [
        (dt.datetime(2024, 1, 1, 9), 1, "view", 1.0, '{"k": 5}'),
        (dt.datetime(2024, 1, 1, 10), 1, "view", 1.0, '{"other": 1}'),
        (dt.datetime(2024, 1, 1, 11), 1, "view", 1.0, "{}"),
    ]
    df = _events_view(spark, rows)
    monkeypatch.setattr(sql_features, "load", lambda s, d, n: df)
    out = sql_features.q_variant_props(spark, "unused").collect()[0]
    assert out.n_events == 3
    assert out.n_with_k == 1
    assert out.sum_k == 5
    assert out.min_k == 5 and out.max_k == 5


def test_schema_evolution_backfills_nulls(spark, monkeypatch, tmp_path):
    rows = [
        (dt.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),  # id 0 -> batch1
        (dt.datetime(2024, 1, 1, 10), 1, "click", 2.0, "{}"),  # id 1 -> batch2
        (dt.datetime(2024, 1, 1, 11), 1, "view", 3.0, "{}"),  # id 2 -> batch1
    ]
    df = _events_view(spark, rows)
    monkeypatch.setattr(sql_features, "load", lambda s, d, n: df)
    monkeypatch.setattr(sql_features, "SCRATCH", tmp_path)
    out = {
        r.event_type_merged: (r.n_rows, r.total_value)
        for r in sql_features.q_schema_evolution_roundtrip(spark, "sfX").collect()
    }
    assert out["__absent__"] == (2, 4.0)
    assert out["click"] == (1, 2.0)
    # batch-1 files genuinely lack the column on disk
    b1 = spark.read.parquet(str(tmp_path / "schema_evo_sfX" / "b1"))
    assert "event_type" not in b1.columns


def test_percent_rank_bounds(spark, monkeypatch):
    rows = [
        (dt.datetime(2024, 1, d, 9), 1, "view", float(d * 10), "{}")
        for d in (1, 2, 3, 4)
    ]
    df = _events_view(spark, rows)
    monkeypatch.setattr(sql_features, "load", lambda s, d, n: df)
    out = sorted(
        sql_features.q_percent_rank_days(spark, "unused").collect(),
        key=lambda r: r.day,
    )
    assert out[0].pct_rank == 0.0
    assert out[-1].pct_rank == 1.0
    assert out[-1].cume == 1.0
    assert out[1].pct_rank == round(1 / 3, 6)
