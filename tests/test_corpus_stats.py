"""Corpus-stats operator tests: repetition flags on planted spam,
heavy-hitter exactness, centroid math, tombstone completeness (and its
broadcast anti-join plan), and correlation identities."""

from __future__ import annotations

import pyspark.sql.functions as F

from market_etl_spark.queries.corpus_stats import (
    llm_repetition_filter,
    q_event_type_correlation,
    q_heavy_hitters_words,
    q_tombstone_forget,
)
from market_etl_spark.tables import load

from conftest import SF_SMOKE


def test_repetition_filter_flags_planted_spam(spark, tmp_path):
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    for t in ("documents",):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    spam = spark.createDataFrame(
        [(10_000_000, "buy now " * 50, "en", "src0", 400)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    spam.unionByName(base.select(*spam.columns)).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = {r.doc_id: r for r in llm_repetition_filter(spark, str(d)).collect()}
    planted = out[10_000_000]
    # "buy now buy now ..." → one bigram dominates and words repeat.
    assert planted.repetitive
    assert planted.top_bigram_frac > 0.4
    assert planted.dup_word_frac > 0.9
    # The flag separates: most of the natural corpus stays unflagged
    # (short sf0.001 docs inflate top_bigram_frac, so the bound is loose).
    flagged = sum(1 for r in out.values() if r.repetitive)
    assert flagged < 0.5 * len(out)


def test_heavy_hitters_exact_counts(spark):
    out = q_heavy_hitters_words(spark, SF_SMOKE).collect()
    assert len(out) == 20
    # Monotone non-increasing counts, word tie-break.
    for a, b in zip(out, out[1:]):
        assert (a.n, b.word) > (b.n, a.word) or (a.n > b.n)
    d = load(spark, SF_SMOKE, "documents")
    top = out[0]
    manual = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") == top.word)
        .count()
    )
    assert manual == top.n


def test_tombstone_forget_is_complete(spark):
    ev = load(spark, SF_SMOKE, "events")
    total = ev.count()
    dropped = ev.filter(F.col("user_id") % 97 == 0).count()
    out = q_tombstone_forget(spark, SF_SMOKE)
    assert out.agg(F.sum("n_events")).first()[0] == total - dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_correlation_self_is_one(spark):
    out = {(r.type_a, r.type_b): r.corr_val for r in q_event_type_correlation(spark, SF_SMOKE).collect()}
    assert len(out) == 10
    for v in out.values():
        assert v is None or -1.0 <= v <= 1.0


def test_tfidf_ranks_discriminative_terms(spark):
    """'whale' appears only in doc 1 (idf high); 'the' is in every doc
    (idf ~0) — the per-doc top term must be the discriminative one."""
    from market_etl_spark.llm.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "the whale the whale the"),
            (2, "the cat the cat the"),
            (3, "the dog the dog the"),
        ],
        "doc_id long, text string",
    ).withColumn("toks", F.split("text", " "))
    top1 = {
        r.doc_id: r.term
        for r in tfidf_top_terms(df, "toks", "doc_id", 1).collect()
    }
    assert top1 == {1: "whale", 2: "cat", 3: "dog"}


def test_build_vocab_dense_ids_and_coverage(spark):
    from market_etl_spark.llm.text import build_vocab

    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    ).withColumn("toks", F.split("text", " "))
    rows = sorted(build_vocab(df, "toks", 10).collect(), key=lambda r: r.token_id)
    assert [(r.token_id, r.token, r.freq) for r in rows] == [
        (0, "a", 3), (1, "b", 2), (2, "c", 1)
    ]
    assert rows[-1].cum_coverage == 1.0
    cov = [r.cum_coverage for r in rows]
    assert cov == sorted(cov)
