"""Round-4 operators: PassJoin edit-distance join, canonical selection,
weighted priority sampling, manifest-pruned scans, and the PIT join's
strict no-leakage semantics — the properties the SQL oracles can't
state (losslessness, leakage, pruning invariants, determinism)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from market_etl_spark.llm.datasets import priority_key, weighted_sample
from market_etl_spark.llm.dedup import canonical_docs, passjoin_pairs
from market_etl_spark.sinks import read_stats_pruned, write_manifested

from conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# PassJoin
# ---------------------------------------------------------------------------
def _brute_pairs(rows, d):
    """O(n²) reference levenshtein (plain DP)."""

    def lev(a, b):
        if abs(len(a) - len(b)) > d:
            return d + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            e = lev(rows[i][1], rows[j][1])
            if e <= d:
                out.append((rows[i][0], rows[j][0], e))
    return sorted(out)


def test_passjoin_matches_brute_force_with_planted_edits(spark):
    """Adversarial edits at segment boundaries, pure inserts/deletes that
    shift every later position, and edits clustered in one segment — the
    cases the pigeonhole window must absorb."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base.replace("quick", "quack")),          # 1 substitution
        (3, base[:10] + base[14:]),                   # 4-char delete, all shifts
        (4, "XY" + base + "ZW"),                      # 2+2 inserts at both ends
        (5, base[:20] + "abcd" + base[20:]),          # 4-char insert mid-string
        (6, base.replace("e", "3")),                  # many edits — must NOT pair
        (7, "completely different text that shares nothing with the others at all"),
        (8, base[:-4]),                               # 4-char suffix delete
        (9, base.upper()),                            # far away
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.edit_distance)
        for r in passjoin_pairs(docs, max_distance=4).collect()
    )
    assert got == _brute_pairs(rows, 4)
    assert (1, 2, 1) in got and (1, 3, 4) in got and (1, 4, 4) in got


def test_passjoin_empty_and_short_strings(spark):
    """Strings shorter than k=d+1 segments are excluded by the length
    guard rather than crashing the segment arithmetic."""
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "a" * 50), (4, "a" * 50 + "bb")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b) for r in passjoin_pairs(docs, max_distance=4).collect()}
    # the two long strings pair; the <k-length ones are out of scope
    assert (3, 4) in got
    assert all(a not in (1, 2) and b not in (1, 2) for a, b in got)


# ---------------------------------------------------------------------------
# Canonical selection
# ---------------------------------------------------------------------------
def test_canonical_docs_picks_best_score_not_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.cluster_id: r for r in canonical_docs(docs, pairs, "q").collect()}
    # cluster {1,2,3}: best score 0.9 held by 2 and 3 → tie to lower id 2
    assert out[1].canonical_id == 2 and out[1].cluster_size == 3
    assert out[1].best_score == pytest.approx(0.9)
    # singleton keeps itself
    assert out[10].canonical_id == 10 and out[10].cluster_size == 1


# ---------------------------------------------------------------------------
# Weighted priority sampling
# ---------------------------------------------------------------------------
def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    df = spark.range(1, 2001).select(
        F.col("id").alias("k"), (F.col("id") % 100 + 1).alias("w")
    )
    s1 = {r.k for r in weighted_sample(df, "k", "w", 200).collect()}
    s2 = {r.k for r in weighted_sample(df, "k", "w", 200).collect()}
    assert s1 == s2 and len(s1) == 200
    # heavier items must be overrepresented: mean weight of the sample
    # clearly above the population mean (~50.5)
    mean_w = (
        df.filter(F.col("k").isin(list(s1))).agg(F.avg("w")).collect()[0][0]
    )
    assert mean_w > 60
    # a different seed moves the sample
    s3 = {r.k for r in weighted_sample(df, "k", "w", 200, seed="other").collect()}
    assert s3 != s1


def test_priority_key_growth_is_stable(spark):
    """Adding rows never changes existing rows' priorities (pure function
    of key+weight+seed) — the property that makes the sample auditable."""
    small = spark.range(1, 101).select(F.col("id").alias("k"), F.lit(10).alias("w"))
    big = spark.range(1, 201).select(F.col("id").alias("k"), F.lit(10).alias("w"))
    p_small = {
        r.k: r.p
        for r in small.select("k", priority_key(F.col("k"), F.col("w")).alias("p")).collect()
    }
    p_big = {
        r.k: r.p
        for r in big.select("k", priority_key(F.col("k"), F.col("w")).alias("p")).collect()
    }
    assert all(p_big[k] == v for k, v in p_small.items())


# ---------------------------------------------------------------------------
# Manifest-pruned scan
# ---------------------------------------------------------------------------
def test_manifest_pruning_skips_files_and_preserves_results(spark, tmp_path):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    path = str(tmp_path / "manifested")
    write_manifested(events, path, "value", n_files=8)
    pruned, scanned, total = read_stats_pruned(spark, path, "value", 100.0, 200.0)
    assert total == 8
    assert 0 < scanned < total, "a narrow band must not scan every file"
    expect = events.filter(F.col("value").between(100.0, 200.0))
    assert pruned.count() == expect.count()
    got = pruned.agg(F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))).collect()[0][0]
    want = expect.agg(F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))).collect()[0][0]
    assert got == want


def test_manifest_pruning_empty_band(spark, tmp_path):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    path = str(tmp_path / "manifested2")
    write_manifested(events, path, "value", n_files=4)
    pruned, scanned, total = read_stats_pruned(spark, path, "value", 1e9, 2e9)
    assert scanned == 0 and pruned.count() == 0


# ---------------------------------------------------------------------------
# PIT join: strict no-leakage
# ---------------------------------------------------------------------------
def test_pit_join_never_uses_co_timestamped_version(spark):
    """A feature version effective AT the fact's exact timestamp must not
    be visible (strict <) — the training-serving leakage off-by-one."""
    from market_etl_spark.queries.behavior import q_feature_store_pit  # noqa: F401

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    events = spark.createDataFrame(
        [
            (1, t0, 7, "purchase", 600.0, None),
            (2, t0, 7, "click", 1.0, None),
            (3, t0 + dt.timedelta(seconds=5), 7, "click", 2.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        events.write.parquet(os.path.join(d, "events.parquet"))
        out = {r.event_id: r for r in q_feature_store_pit(spark, d).collect()}
    # click at exactly the purchase ts: no feature yet (strict <)
    assert out[2].feature_tier is None and out[2].feature_age_sec is None
    # click 5s later sees the whale tier with age 5
    assert out[3].feature_tier == "whale" and out[3].feature_age_sec == 5
