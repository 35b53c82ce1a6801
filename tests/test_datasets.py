"""Dataset-construction operator tests: split determinism and
proportions, stratified-sample membership, packing invariants, PII
redaction completeness, decontamination recall on planted overlap, and
the approx-distinct error bound (the rows-only sketch's accuracy
contract)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from market_etl_spark.llm import datasets
from market_etl_spark.llm.text import bpe_token_count, shingles, words
from market_etl_spark.tables import load

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_SMOKE, "documents").cache()


def test_split_deterministic_and_exhaustive(docs):
    a = datasets.assign_split(docs, "doc_id").select("doc_id", "split")
    b = datasets.assign_split(docs, "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0  # identical across invocations
    counts = dict(a.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    total = sum(counts.values())
    assert total == docs.count()  # every row lands in exactly one split
    # 90/5/5 within generous tolerance on a small corpus.
    assert counts["train"] / total > 0.8
    assert 0 < counts.get("val", 0) < 0.15 * total
    assert 0 < counts.get("test", 0) < 0.15 * total


def test_split_stable_under_growth(docs):
    """Adding documents must not move existing ones between splits —
    the property hash splits have and random splits don't."""
    subset = docs.filter(F.col("doc_id") < 30)
    full = datasets.assign_split(docs, "doc_id").select("doc_id", "split")
    part = datasets.assign_split(subset, "doc_id").select("doc_id", "split")
    joined = part.alias("p").join(full.alias("f"), "doc_id")
    assert joined.filter(F.col("p.split") != F.col("f.split")).count() == 0


def test_stratified_sample_membership_and_rates(docs):
    rates = {"en": 0.25, "zh": 0.8}
    sampled = datasets.stratified_sample(docs, "lang", rates, "doc_id")
    # Subset of the input, deterministic.
    assert sampled.exceptAll(docs).count() == 0
    again = datasets.stratified_sample(docs, "lang", rates, "doc_id")
    assert sampled.exceptAll(again).count() == 0
    pop = dict(docs.groupBy("lang").count().collect())
    got = dict(sampled.groupBy("lang").count().collect())
    # Non-listed strata keep everything (default rate 1.0).
    for lang in pop:
        if lang not in rates:
            assert got.get(lang, 0) == pop[lang]
    # Listed strata are actually downsampled (loose bounds at sf0.001).
    assert 0 < got.get("en", 0) < pop["en"]


def test_pack_sequences_invariants(docs):
    budget = 512
    d = docs.withColumn("n_tokens", bpe_token_count("text"))
    packed = datasets.pack_sequences(d, "source", "doc_id", "n_tokens", budget)
    stats = (
        packed.groupBy("source", "chunk_id")
        .agg(
            F.sum("n_tokens").alias("tok"),
            F.max("n_tokens").alias("max_doc"),
            F.min("chunk_id").alias("cid"),
        )
        .collect()
    )
    # A chunk never exceeds budget + its largest document (a document
    # that *starts* inside the window may run past it), and chunk ids
    # per source are dense from 0.
    for r in stats:
        assert r.tok <= budget + r.max_doc
    for src, rows in {r.source: None for r in stats}.items():
        ids = sorted(r.chunk_id for r in stats if r.source == src)
        assert ids == list(range(len(ids)))


def test_redact_pii_removes_all_matches(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith@example.com or call 555-0199 now"),
            (2, "no pii here"),
            (3, "two mails a@b.com c@d.org and 555-1234 555-9999"),
        ],
        "id long, text string",
    )
    red = df.select("id", datasets.redact_pii(F.col("text")).alias("r"))
    leaked = red.filter(
        F.col("r").rlike(datasets.EMAIL_REGEX) | F.col("r").rlike(datasets.PHONE_REGEX)
    )
    assert leaked.count() == 0
    rows = {r.id: r.r for r in red.collect()}
    assert rows[1] == "mail me at [EMAIL] or call [PHONE] now"
    assert rows[2] == "no pii here"
    assert rows[3].count("[EMAIL]") == 2 and rows[3].count("[PHONE]") == 2


def test_decontamination_detects_planted_overlap(spark, docs):
    """A train document that IS an eval document must be flagged with
    every one of its shingles shared."""
    d = docs.withColumn("toks", words("text"))
    eval_set = d.filter(F.col("source") == "src0")
    planted = eval_set.limit(1).withColumn("doc_id", F.lit(999_999))
    train = d.filter(F.col("source") != "src0").unionByName(planted)
    report = datasets.contamination_report(train, eval_set)
    hit = report.filter(F.col("doc_id") == 999_999).collect()
    assert len(hit) == 1
    n_sh = planted.select(F.size(shingles("toks", 5))).first()[0]
    assert hit[0].n_shared_shingles == n_sh
    assert hit[0].n_eval_docs_hit >= 1


def test_approx_distinct_error_bound(spark):
    e = load(spark, SF_SMOKE, "events")
    both = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert abs(r.approx - r.exact) / r.exact <= 0.05


def test_chunk_documents_covers_every_token(spark):
    """150 tokens, C=64, O=16 (stride 48): chunks at 1/49/97 → the last
    clamps to 54 tokens; reassembling strides recovers the document."""
    toks = [f"t{i}" for i in range(150)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    df = df.withColumn("toks", F.split("text", " "))
    rows = sorted(
        datasets.chunk_documents(df, "toks", "doc_id", 64, 16).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_tokens for r in rows] == [64, 64, 54]
    chunks = [r.chunk_text.split(" ") for r in rows]
    # overlap: each chunk's first 16 tokens = previous chunk's last 16
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur[:16] == prev[-16:]
    # full coverage: first chunk + each successor's non-overlap tail
    rebuilt = chunks[0] + [t for c in chunks[1:] for t in c[16:]]
    assert rebuilt == toks


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    df = df.withColumn("toks", F.split("text", " "))
    rows = datasets.chunk_documents(df, "toks", "doc_id", 64, 16).collect()
    assert len(rows) == 1
    assert rows[0].chunk_idx == 0 and rows[0].chunk_text == "a b c"
