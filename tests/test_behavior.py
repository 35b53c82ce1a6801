"""Behavioral-analytics semantics on hand-built fixtures: ordered
funnel sequencing, retention cohort arithmetic, time-weighted average
weighting, and anomaly z-score flagging."""

from __future__ import annotations

import datetime as dt

from market_etl_spark.queries import behavior


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, uid, etype, float(val), "{}")
            for i, (ts, uid, etype, val) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_strict_order(spark, monkeypatch):
    # user 1: full ordered funnel; user 2: purchase BEFORE click (step 3
    # must not count); user 3: view only.
    rows = [
        (_ts(0), 1, "view", 1.0),
        (_ts(1), 1, "click", 1.0),
        (_ts(2), 1, "purchase", 1.0),
        (_ts(0), 2, "view", 1.0),
        (_ts(2), 2, "click", 1.0),
        (_ts(1), 2, "purchase", 1.0),
        (_ts(0), 3, "view", 1.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(behavior, "load", lambda s, d, n: df)
    out = behavior.q_funnel_conversion(spark, "unused").collect()[0]
    assert out.users_viewed == 3
    assert out.users_clicked_after_view == 2
    assert out.users_purchased_after_click == 1


def test_funnel_equal_timestamp_does_not_count(spark, monkeypatch):
    # click at exactly the view time: "strictly after" excludes it.
    rows = [(_ts(0), 1, "view", 1.0), (_ts(0), 1, "click", 1.0)]
    df = _events(spark, rows)
    monkeypatch.setattr(behavior, "load", lambda s, d, n: df)
    out = behavior.q_funnel_conversion(spark, "unused").collect()[0]
    assert out.users_viewed == 1
    assert out.users_clicked_after_view == 0


def test_retention_offsets(spark, monkeypatch):
    # user 1 first active Mon Jan 1, returns Jan 10 (offset 1) and
    # Jan 17 (offset 2); user 2 joins week 2 only.
    rows = [
        (dt.datetime(2024, 1, 1, 9), 1, "view", 1.0),
        (dt.datetime(2024, 1, 10, 9), 1, "view", 1.0),
        (dt.datetime(2024, 1, 17, 9), 1, "view", 1.0),
        (dt.datetime(2024, 1, 10, 9), 2, "view", 1.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(behavior, "load", lambda s, d, n: df)
    out = {
        (r.cohort_week, r.week_offset): r.active_users
        for r in behavior.q_retention_cohorts(spark, "unused").collect()
    }
    wk1 = dt.date(2024, 1, 1)
    wk2 = dt.date(2024, 1, 8)
    assert out[(wk1, 0)] == 1
    assert out[(wk1, 1)] == 1
    assert out[(wk1, 2)] == 1
    assert out[(wk2, 0)] == 1
    assert len(out) == 4


def test_time_weighted_average_weights_by_duration(spark, monkeypatch):
    # value 10 held for 30 s, value 0 held for 10 s, final event opens
    # no interval: twav = (10*30 + 0*10) / 40 = 7.5 (plain AVG = 40/3).
    rows = [
        (_ts(0, 0), 1, "view", 10.0),
        (_ts(0, 30), 1, "view", 0.0),
        (_ts(0, 40), 1, "view", 99.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(behavior, "load", lambda s, d, n: df)
    out = behavior.q_time_weighted_value(spark, "unused").collect()
    assert len(out) == 1
    assert out[0].twav == 7.5
    assert out[0].n_intervals == 2


def test_anomaly_zscore_flags_outlier_day(spark, monkeypatch):
    # ten quiet days at 10 and one spike at 100: a lone outlier among n
    # equal points has z = (n-1)/sqrt(n) — 3.02 here, above the 2.0
    # threshold (with only 5 points it would cap at 1.79 and never
    # flag, hence the wider fixture).
    rows = [
        (dt.datetime(2024, 1, day, 12), 1, "view", 10.0) for day in range(1, 11)
    ]
    rows.append((dt.datetime(2024, 1, 11, 12), 1, "view", 100.0))
    df = _events(spark, rows)
    monkeypatch.setattr(behavior, "load", lambda s, d, n: df)
    out = {r.day: r for r in behavior.q_anomaly_zscore_days(spark, "unused").collect()}
    assert not any(out[dt.date(2024, 1, d)].anomalous for d in range(1, 11))
    spike = out[dt.date(2024, 1, 11)]
    assert spike.anomalous
    assert abs(spike.zscore - 10 / 11**0.5) < 1e-6
