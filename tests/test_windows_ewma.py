"""q_window_ewma semantics + plan shape.

The EWMA query unrolls the linear recurrence over a bounded 20-row
frame via a BUCKETED rank band join (ADVICE r4): ranks hash into
width-20 buckets, anchors probe the ≤2 buckets their band can span,
and the exact band predicate filters inside the bucket.  These tests
pin (a) the numeric semantics against a pure-Python reference across
bucket boundaries, and (b) the join-key shape — the bucket column must
reach the physical join so the per-series fan-out stays constant
instead of quadratic.
"""

from __future__ import annotations

import datetime as dt

from market_etl_spark.queries import windows


def _events(spark, n_per_series=55):
    rows = []
    eid = 0
    for etype in ("trade", "view"):
        for i in range(n_per_series):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 15, 9, 0, 0) + dt.timedelta(seconds=i),
                    eid % 3,  # user_id < 5 keeps every row
                    etype,
                    float((eid * 37) % 101) / 7.0,
                    "{}",
                )
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _py_ewma(values, alpha=0.2, window=20):
    out = []
    for i in range(len(values)):
        lo = max(0, i - (window - 1))
        num = sum(values[j] * (1 - alpha) ** (i - j) for j in range(lo, i + 1))
        den = sum((1 - alpha) ** (i - j) for j in range(lo, i + 1))
        out.append((i + 1, i + 1 - lo, round(num / den, 6)))
    return out  # (rn, n_terms, ewma)


def test_ewma_matches_python_reference_across_buckets(spark, monkeypatch):
    """55 rows per series crosses the width-20 bucket boundary twice
    (rn 20→21 and 40→41) — exactly where a wrong bucket probe would
    drop band rows and deflate n_terms/ewma."""
    df = _events(spark)
    monkeypatch.setattr(windows, "load", lambda s, d, n: df)
    got = {
        (r.event_type, r.rn): (r.n_terms, r.ewma)
        for r in windows.q_window_ewma(spark, "unused").collect()
    }
    for etype in ("trade", "view"):
        vals = [
            r.value
            for r in df.filter(df.event_type == etype)
            .orderBy("ts", "event_id")
            .collect()
        ]
        for rn, n_terms, ewma in _py_ewma(vals):
            g_terms, g_ewma = got[(etype, rn)]
            assert g_terms == n_terms, (etype, rn)
            assert abs(g_ewma - ewma) < 2e-6, (etype, rn, g_ewma, ewma)
    assert len(got) == 110


def test_ewma_band_join_is_bucketed(spark):
    """The physical join must carry the bkt column as an equi-key —
    otherwise the band degenerates to a per-event_type cross product
    with the rank predicate as a post-filter (quadratic per series)."""
    from conftest import SF_SMOKE

    df = windows.q_window_ewma(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket column participates in an equi-join key list
    assert "bkt" in plan, "bucket key missing from physical plan"
