"""Unit semantics for weighted dataset mixing and embedding
standardization."""

from __future__ import annotations

import pyspark.sql.functions as F

from market_etl_spark.llm.datasets import mixture_copies
from market_etl_spark.llm.similarity import standardize_components


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_mixture_integer_weight_is_exact(spark):
    d = _docs(spark)
    out = d.select(mixture_copies(F.col("doc_id"), F.lit(2.0)).alias("c")).collect()
    assert all(r.c == 2 for r in out)


def test_mixture_fractional_weight_bounds_and_rate(spark):
    d = _docs(spark, 2000)
    out = d.select(mixture_copies(F.col("doc_id"), F.lit(1.5)).alias("c")).collect()
    cs = [r.c for r in out]
    assert set(cs) <= {1, 2}
    # hash-Bernoulli at p=0.5 over 2000 keys: rate within a loose band
    rate = (sum(cs) - 2000) / 2000
    assert 0.45 < rate < 0.55


def test_mixture_is_deterministic(spark):
    d = _docs(spark, 500)
    a = d.select("doc_id", mixture_copies(F.col("doc_id"), F.lit(0.3)).alias("c"))
    b = d.select("doc_id", mixture_copies(F.col("doc_id"), F.lit(0.3)).alias("c"))
    assert a.collect() == b.collect()
    # different seed -> different membership (overwhelmingly likely)
    c = d.select(
        "doc_id", mixture_copies(F.col("doc_id"), F.lit(0.3), seed="other").alias("c")
    )
    assert a.collect() != c.collect()


def test_standardize_zero_mean_unit_variance(spark):
    rows = [(i, [float(i), 10.0 * i + 3.0, 7.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = (
        standardize_components(df, "embedding", "vec_id")
        .groupBy("dim")
        .agg(F.avg("z").alias("m"), F.stddev_samp("z").alias("s"))
        .collect()
    )
    for r in stats:
        assert abs(r.m) < 1e-9
        if r.dim < 2:
            assert abs(r.s - 1.0) < 1e-9
        else:
            # constant dimension: z = 0 everywhere, stddev 0 (not NaN/inf)
            assert r.s == 0.0


def test_standardize_keep_cols_passthrough(spark):
    rows = [(1, "a", [1.0, 2.0]), (2, "b", [3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = standardize_components(df, "embedding", "vec_id", keep_cols=("label",))
    assert set(out.columns) == {"vec_id", "label", "dim", "v", "z"}
    got = {(r.vec_id, r.dim): r.label for r in out.collect()}
    assert got[(1, 0)] == "a" and got[(2, 1)] == "b"
