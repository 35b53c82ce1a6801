"""K-means + new window-shape invariants.

The oracle hash-checks assignment parity with DuckDB; these tests pin
the algorithmic properties the oracle can't see: exact agreement with
a NumPy double-precision reference, monotone inertia, and the
session/hopping window geometry invariants.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from market_etl_spark.llm import cluster
from market_etl_spark.queries import REGISTRY
from market_etl_spark.tables import load

from conftest import SF_SMOKE


def _numpy_lloyd(vecs: dict[int, np.ndarray], k: int, rounds: int) -> dict[int, int]:
    """Reference Lloyd's in float64: seed = k lowest ids, argmin with
    (distance, cid) tie-break, means over members, empty clusters drop."""
    ids = sorted(vecs)
    cents = {c: vecs[i].astype(np.float64) for c, i in enumerate(ids[:k])}
    assign: dict[int, int] = {}
    for r in range(rounds):
        assign = {
            i: min(
                ((float(np.sum((vecs[i] - cents[c]) ** 2)), c) for c in cents)
            )[1]
            for i in ids
        }
        if r < rounds - 1:
            new = {}
            for c in cents:
                members = [vecs[i] for i in ids if assign[i] == c]
                if members:
                    new[c] = np.mean(np.stack(members), axis=0)
            cents = new
    return assign


def _spark_assign(df) -> dict[int, int]:
    return {r.vec_id: r.cid for r in df.collect()}


def test_kmeans_matches_numpy_reference(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float32)
        for r in emb.collect()
    }
    for rounds in (1, 2):
        got = _spark_assign(cluster.kmeans_fit(emb, 8, rounds=rounds))
        expect = _numpy_lloyd(vecs, 8, rounds)
        assert got == expect, f"rounds={rounds}"


def test_kmeans_inertia_non_increasing(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    inertias = []
    for rounds in (1, 2, 3):
        assigned = cluster.kmeans_fit(emb, 8, rounds=rounds)
        inertias.append(assigned.agg(F.sum("d2")).collect()[0][0])
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-9, inertias


def test_kmeans_cluster_count_bounded(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    assigned = cluster.kmeans_fit(emb, 8, rounds=2)
    n_clusters = assigned.select("cid").distinct().count()
    assert 1 <= n_clusters <= 8
    # every vector assigned exactly once
    assert assigned.count() == emb.count()


def test_hopping_window_double_counts(spark):
    """size = 2 × slide ⇒ every event lands in exactly two windows."""
    df = REGISTRY["q_hopping_window_vwap"].fn(spark, SF_SMOKE)
    windowed_events = df.agg(F.sum("n_events")).collect()[0][0]
    base = (
        load(spark, SF_SMOKE, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        )
        .count()
    )
    assert windowed_events == 2 * base


def test_session_windows_disjoint_and_complete(spark):
    """Per user: sessions cover every event once, and consecutive
    sessions are separated by at least the 30-minute gap."""
    df = REGISTRY["q_session_window_native"].fn(spark, SF_SMOKE)
    rows = df.collect()
    total = sum(r.n_events for r in rows)
    base = (
        load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 30).count()
    )
    assert total == base
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r.session_start)
        for a, b in zip(sessions, sessions[1:]):
            # session_end already includes the +gap padding, so the
            # next session may start no earlier than the previous end
            assert b.session_start >= a.session_end
