"""Round-3 operators: inverted index, text normalization, batch
brute-force top-k, equi-width histogram."""

from __future__ import annotations

import pyspark.sql.functions as F

from market_etl_spark.llm import similarity
from market_etl_spark.llm.text import inverted_index, normalize_text, words
from market_etl_spark.queries import REGISTRY
from market_etl_spark.tables import load

from conftest import SF_SMOKE


def test_inverted_index_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog"),
            (3, "cat cat cat"),
        ],
        "doc_id long, text string",
    ).withColumn("toks", words("text"))
    rows = {
        (r.term, r.doc_id): (r.tf, r.df, r.cf)
        for r in inverted_index(df).collect()
    }
    # "the": docs 1 (tf=2) and 2 (tf=1) → df=2, cf=3
    assert rows[("the", 1)] == (2, 2, 3)
    assert rows[("the", 2)] == (1, 2, 3)
    # "cat": docs 1 (tf=1) and 3 (tf=3) → df=2, cf=4
    assert rows[("cat", 3)] == (3, 2, 4)
    # term_filter prunes postings entirely
    only_cat = inverted_index(df, term_filter=F.col("term") == "cat")
    assert {r.term for r in only_cat.collect()} == {"cat"}


def test_normalize_text_semantics(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! (42)  ")], "id long, text string"
    )
    got = df.select(normalize_text("text").alias("n")).collect()[0].n
    assert got == "hello world 42"


def test_batch_topk_matches_per_query_plan(spark):
    """The batch path must return exactly the per-query union's result
    (same fold arithmetic, same tie rule) — it only changes the plan."""
    emb = load(spark, SF_SMOKE, "embeddings")
    qids = [0, 1, 2]
    a = sorted(
        (r.query_id, r.neighbor_id, r.cos_sim)
        for r in similarity.brute_force_topk(emb, qids, k=5).collect()
    )
    b = sorted(
        (r.query_id, r.neighbor_id, r.cos_sim)
        for r in similarity.brute_force_topk_batch(
            emb, qids, k=5, bucket_target=50
        ).collect()
    )
    assert a == b
    # tiny bucket_target forces many buckets → exercises the merge level
    c = sorted(
        (r.query_id, r.neighbor_id, r.cos_sim)
        for r in similarity.brute_force_topk_batch(
            emb, qids, k=5, bucket_target=7
        ).collect()
    )
    assert a == c


def test_value_histogram_counts_and_bounds(spark):
    out = REGISTRY["q_value_histogram"].fn(spark, SF_SMOKE).collect()
    e = load(spark, SF_SMOKE, "events")
    total = e.count()
    assert sum(r.cnt for r in out) == total
    assert all(r.lo < r.hi for r in out)
    assert {r.bucket for r in out} <= set(range(20))
    # buckets tile [min, max] without overlap
    by_bucket = sorted(out, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi <= b.lo + 1e-9
