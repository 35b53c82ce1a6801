"""Property-based tests (hypothesis) for the round-6 governance &
monitoring operators: mathematical invariants that must hold on
ARBITRARY inputs, checked against the same engine code the registered
queries call (monkeypatched table loads, the llm_substring_dedup test
pattern)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import market_etl_spark.queries.governance as gov
import market_etl_spark.queries.monitoring as mon

from conftest import SF_SMOKE

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _with_docs(module, spark, rows, schema, fn):
    """Run a query builder against a synthetic documents frame."""
    df = spark.createDataFrame(rows, schema)
    orig = module.load
    try:
        module.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        return fn()
    finally:
        module.load = orig


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),  # doc_id (split parity varies)
            st.integers(1, 999),  # n_chars
            st.sampled_from(["en", "fr", "de"]),
        ),
        min_size=4,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_psi_nonnegative_on_arbitrary_splits(spark, docs):
    """PSI is a symmetrized KL divergence — ≥ 0 for ANY pair of
    smoothed distributions, 0 only when they coincide."""
    rows = [(i, "x", lang, "s", nc) for (i, nc, lang) in docs]
    out = _with_docs(
        gov,
        spark,
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
        lambda: gov.llm_psi_drift(spark, SF_SMOKE).collect(),
    )
    row = out[0]
    assert row.psi_length >= 0.0, row
    assert row.psi_lang >= 0.0, row


@settings(**_SETTINGS)
@given(
    a=st.lists(st.integers(1, 50), min_size=1, max_size=25),
    b=st.lists(st.integers(1, 50), min_size=1, max_size=25),
)
def test_ks_bounds_and_python_parity(spark, a, b):
    """0 ≤ D ≤ 1, and D equals the brute-force CDF-diff max."""
    rows = [(i, "x", "en", "src0", v) for i, v in enumerate(a)] + [
        (1000 + i, "x", "en", "src1", v) for i, v in enumerate(b)
    ]
    out = _with_docs(
        gov,
        spark,
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
        lambda: gov.llm_ks_drift(spark, SF_SMOKE).collect(),
    )
    row = out[0]
    support = sorted(set(a) | set(b))
    d_ref = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in support
    )
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.ks_stat == round(d_ref, 6)
    assert row.n_a == len(a) and row.n_b == len(b)


@settings(**_SETTINGS)
@given(
    sources=st.lists(
        st.tuples(st.text(alphabet="st", min_size=1, max_size=3), st.integers(1, 40)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_mixture_hare_quota_property(spark, sources):
    """Largest-remainder allocation satisfies the Hare-quota bound:
    every source's slots differ from its exact share p·1000 by < 1,
    and slots sum exactly to 1000."""
    rows = []
    did = 0
    for src, n_docs in sources:
        for _ in range(n_docs):
            rows.append((did, "a b c", "en", src, 5))
            did += 1
    out = _with_docs(
        gov,
        spark,
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
        lambda: gov.llm_mixture_temperature(spark, SF_SMOKE).collect(),
    )
    assert sum(r.slots for r in out) == 1000
    tot = sum(math.sqrt(r.n_tokens) for r in out)
    for r in out:
        exact = math.sqrt(r.n_tokens) / tot * 1000
        assert exact - 1 < r.slots < exact + 1, (r, exact)


@settings(**_SETTINGS)
@given(
    events=st.lists(st.integers(0, 30), min_size=1, max_size=200),
)
def test_cms_no_underestimate_any_key(spark, events):
    """CMS never underestimates ANY key on arbitrary event streams —
    checked for every distinct key, not just the top-10 the registered
    query reports (engine sketch rebuilt in Python)."""
    import hashlib

    def bucket(seed, key):
        return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16) % 64

    seeds = ("cms0", "cms1", "cms2", "cms3")
    cells: dict = {}
    exact: dict = {}
    for u in events:
        exact[u] = exact.get(u, 0) + 1
        for s in seeds:
            k = (s, bucket(s, u))
            cells[k] = cells.get(k, 0) + 1
    for u, cnt in exact.items():
        est = min(cells[(s, bucket(s, u))] for s in seeds)
        assert est >= cnt
        # CMS error bound with e/w ≈ 0.0425: over N events the min-row
        # overestimate is ≤ N (trivial) — tight bound needs the union
        # argument; assert the trivial sanity bound here.
        assert est <= len(events)

    # and the engine agrees with the Python rebuild on this stream
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(events)], "event_id long, user_id long"
    )
    orig = gov.load
    try:
        gov.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        out = gov.q_cms_heavy_hitters(spark, SF_SMOKE).collect()
    finally:
        gov.load = orig
    for r in out:
        assert r.exact_cnt == exact[r.user_id]
        assert r.cms_est == min(
            cells[(s, bucket(s, r.user_id))] for s in seeds
        )


def test_pca_loading_unit_norm(spark):
    """The returned principal direction is unit-norm and the explained
    ratio is in (0, 1]."""
    import pytest

    from market_etl_spark.queries import REGISTRY

    rows = REGISTRY["llm_embedding_pca_power"].fn(spark, SF_SMOKE).collect()
    norm = math.sqrt(sum(r.loading**2 for r in rows))
    assert norm == pytest.approx(1.0, abs=1e-4)
    assert 0.0 < rows[0].explained_ratio <= 1.0


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(0, 100), min_size=3, max_size=40),
)
def test_cusum_final_value_is_zero(spark, counts):
    """Σ of standardized deviations telescopes to 0 — the final CUSUM
    must round to (positive) 0 unless the series is constant."""
    if len(set(counts)) < 2:
        return  # stddev undefined/zero on constant series
    import datetime as dt

    rows = []
    eid = 0
    for day, n in enumerate(counts, start=1):
        base = dt.datetime(2024, 1, 1) + dt.timedelta(days=day - 1)
        for k in range(n):
            rows.append((eid, base + dt.timedelta(seconds=k)))
            eid += 1
    if eid == 0:
        return
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    orig = mon.load
    try:
        mon.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        out = mon.q_cusum_changepoint(spark, SF_SMOKE).collect()
    finally:
        mon.load = orig
    # days with zero events vanish from the daily frame; recompute the
    # expected final S over the OBSERVED days only
    observed = [n for n in counts if n > 0]
    if len(set(observed)) < 2 or len(observed) < 2:
        return
    assert out[-1].cusum == 0.0
    assert math.copysign(1.0, out[-1].cusum) == 1.0  # +0.0, never -0.0
    assert sum(1 for r in out if r.is_changepoint) == 1
