"""Hand-computed semantics for the round-6 governance suite
(queries/governance.py) — the same strategy as the rest of the suite:
tiny frames where the statistic is checkable by hand or against a
pure-Python/numpy reference, independent of the DuckDB oracle gate.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from market_etl_spark.queries import REGISTRY, governance as gov

from conftest import SF_SMOKE


def test_psi_identical_snapshots_near_zero(spark):
    """Even/odd splits of the same distribution should PSI ≈ 0 (only
    smoothing noise), and the 0.2 gate must hold on the smoke data."""
    row = REGISTRY["llm_psi_drift"].fn(spark, SF_SMOKE).collect()[0]
    assert row.drift_ok
    assert abs(row.psi_length) < 0.2 and abs(row.psi_lang) < 0.2


def test_ks_statistic_matches_python_reference(spark):
    """Engine KS == scipy-free pure-Python D on the same two sources."""
    import duckdb

    con = duckdb.connect()
    a, b = [], []
    for (nc, src) in con.execute(
        f"SELECT n_chars, source FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        f" WHERE source IN ('src0', 'src1')"
    ).fetchall():
        (a if src == "src0" else b).append(nc)
    con.close()
    support = sorted(set(a) | set(b))
    d_ref = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in support
    )
    row = REGISTRY["llm_ks_drift"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.ks_stat == round(d_ref, 6)


def test_token_budget_never_exceeds_budget(spark):
    """Selected token mass must be ≤ 60% of the corpus total, and
    adding the single next-ranked doc must push past it (greedy
    maximality)."""
    from market_etl_spark.llm.text import bpe_token_count

    d = gov._docs(spark, SF_SMOKE)
    total = d.select(F.sum(bpe_token_count("text"))).collect()[0][0]
    kept = (
        REGISTRY["llm_token_budget_select"]
        .fn(spark, SF_SMOKE)
        .agg(F.sum("tokens_kept"))
        .collect()[0][0]
    )
    assert kept <= math.floor(0.6 * total)


def test_mixture_temperature_allocation(spark):
    """Slots sum exactly to 1000; sqrt-temperature flattens the mix
    (low-token sources gain share vs raw); p columns are simplex."""
    rows = REGISTRY["llm_mixture_temperature"].fn(spark, SF_SMOKE).collect()
    assert sum(r.slots for r in rows) == 1000
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-4
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    assert smallest.p_temp >= smallest.p_raw  # up-sampled
    assert largest.p_temp <= largest.p_raw  # down-sampled


def test_quantile_norm_decile_shape(spark):
    """Every source gets deciles 1..10; decile counts are balanced
    within 1; per-cell min ≤ max; micro-sum consistent with bounds."""
    rows = REGISTRY["llm_quality_quantile_norm"].fn(spark, SF_SMOKE).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, cells in by_src.items():
        assert sorted(c.decile for c in cells) == list(range(1, 11)), src
        ns = [c.n_docs for c in cells]
        assert max(ns) - min(ns) <= 1, src
        for c in cells:
            assert c.min_q <= c.max_q
            assert (
                c.n_docs * round(c.min_q * 1e6)
                <= c.sum_q_micro
                <= c.n_docs * round(c.max_q * 1e6)
            )


def test_shard_balance_partitions_everything(spark):
    """Shards 0..7 each non-empty and doc counts sum to the corpus."""
    rows = REGISTRY["llm_shard_balance"].fn(spark, SF_SMOKE).collect()
    assert sorted(r.shard for r in rows) == list(range(8))
    n_docs = (
        gov._docs(spark, SF_SMOKE).count()
    )
    assert sum(r.n_docs for r in rows) == n_docs


def test_cms_never_underestimates(spark):
    """The CMS structural guarantee: est ≥ exact for every probed key
    (min over d rows of counters that each include the key's count)."""
    rows = REGISTRY["q_cms_heavy_hitters"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_est >= r.exact_cnt
        assert r.overestimate == r.cms_est - r.exact_cnt


def test_cms_matches_python_reference(spark):
    """Engine CMS estimates == a pure-Python rebuild of the identical
    md5 sketch (d=4, w=64) — the sketch is deterministic, not just
    bounded."""
    import duckdb
    import hashlib

    con = duckdb.connect()
    users = [
        r[0]
        for r in con.execute(
            f"SELECT user_id FROM read_parquet('{SF_SMOKE}/events.parquet')"
        ).fetchall()
    ]
    con.close()

    def bucket(seed, key):
        h = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()
        return int(h[:8], 16) % 64

    cells: dict = {}
    for u in users:
        for s in ("cms0", "cms1", "cms2", "cms3"):
            k = (s, bucket(s, u))
            cells[k] = cells.get(k, 0) + 1

    def est(u):
        return min(cells[(s, bucket(s, u))] for s in ("cms0", "cms1", "cms2", "cms3"))

    for r in REGISTRY["q_cms_heavy_hitters"].fn(spark, SF_SMOKE).collect():
        assert r.cms_est == est(r.user_id), r.user_id


def test_substring_dedup_hand_case(spark):
    """Two docs sharing one exact 20-char span, one unrelated doc."""
    shared = "ABCDEFGHIJKLMNOPQRST"  # exactly 20 chars
    df = spark.createDataFrame(
        [
            (1, shared + "xxxxx"),
            (2, "yyyyy" + shared),
            (3, "z" * 30),
        ],
        "doc_id long, text string",
    )
    orig = gov.load
    try:
        gov.load = lambda spark, sf_dir, name: df  # noqa: ARG005
        out = {
            r.doc_id: r
            for r in gov.llm_substring_dedup(spark, SF_SMOKE).collect()
        }
    finally:
        gov.load = orig
    # doc1: 6 positions (len 25), only position 1 is the shared gram
    assert out[1].n_positions == 6 and out[1].n_shared_positions == 1
    # doc2: 6 positions, only position 6 shared
    assert out[2].n_positions == 6 and out[2].n_shared_positions == 1
    # doc3: 'z'*30 — 11 positions, all identical gram but only 1 doc → 0 shared
    assert out[3].n_positions == 11 and out[3].n_shared_positions == 0


def test_pca_power_matches_numpy(spark):
    """Engine loadings == numpy running the IDENTICAL two power
    iterations (same v0, same centering, population λ)."""
    import duckdb

    con = duckdb.connect()
    X = np.array(
        [
            r[0]
            for r in con.execute(
                f"SELECT embedding FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
                f" ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    con.close()
    C = X - X.mean(axis=0)
    v = np.zeros(C.shape[1])
    v[0] = 1.0
    for _ in range(2):
        u = C.T @ (C @ v)
        v = u / np.linalg.norm(u)
    lam = float(((C @ v) ** 2).sum() / len(C))
    trace = float((C**2).sum() / len(C))
    jmax = int(np.argmax(np.abs(v)))
    if v[jmax] < 0:
        v = -v
    rows = REGISTRY["llm_embedding_pca_power"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.loading == pytest.approx(v[r.j], abs=2e-6)
        assert r.eigval == pytest.approx(lam, abs=2e-6)
        assert r.explained_ratio == pytest.approx(lam / trace, abs=2e-6)
    # the top PC must explain a non-trivial share on clustered data
    assert rows[0].explained_ratio > 0.01
