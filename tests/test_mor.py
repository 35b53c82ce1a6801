"""Merge-on-read deletion vectors: position exactness, overlap
idempotence, accumulation across sidecars, purge equivalence."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from market_etl_spark import mor


def _base(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, k int, v double",
    ).repartition(3).write.parquet(path)
    return path


def test_reader_without_vectors_is_the_full_table(spark, tmp_path):
    path = _base(spark, tmp_path)
    assert mor.read_with_deletes(spark, path).count() == 30


def test_delete_is_positional_and_idempotent(spark, tmp_path):
    path = _base(spark, tmp_path)
    n = mor.write_deletion_vector(spark, path, F.col("k") == 0)
    assert n == 10
    # same predicate again: every position already deleted -> 0 new
    assert mor.write_deletion_vector(spark, path, F.col("k") == 0) == 0
    got = {r.id for r in mor.read_with_deletes(spark, path).collect()}
    assert got == {i for i in range(30) if i % 3 != 0}
    # data files untouched: two sidecars, three original parts
    root = pathlib.Path(path)
    assert len(list((root / "_deletes").glob("dv-*.parquet"))) == 2
    assert len(list(root.glob("part-*.parquet"))) == 3


def test_overlapping_batches_accumulate_without_double_count(spark, tmp_path):
    path = _base(spark, tmp_path)
    n1 = mor.write_deletion_vector(spark, path, F.col("id") < 10)
    n2 = mor.write_deletion_vector(spark, path, F.col("id") < 15)  # overlaps
    assert (n1, n2) == (10, 5)
    assert mor.read_with_deletes(spark, path).count() == 15


def test_purge_folds_vectors_into_a_clean_generation(spark, tmp_path):
    path = _base(spark, tmp_path)
    mor.write_deletion_vector(spark, path, F.col("v") >= 20.0)
    dest = str(tmp_path / "gen2")
    n = mor.purge_deletes(spark, path, dest)
    assert n == 20
    got = {r.id for r in spark.read.parquet(dest).collect()}
    assert got == set(range(20))
    assert not (pathlib.Path(dest) / "_deletes").exists()


def test_vectors_survive_a_table_move(spark, tmp_path):
    """Sidecar keys are table-relative: moving the table directory
    (the purge/swap workflow) must not invalidate the vectors — with
    absolute URIs every deleted row silently resurrected (review r9b)."""
    import shutil

    path = _base(spark, tmp_path)
    mor.write_deletion_vector(spark, path, F.col("k") == 1)
    moved = str(tmp_path / "t_moved")
    shutil.move(path, moved)
    got = {r.id for r in mor.read_with_deletes(spark, moved).collect()}
    assert got == {i for i in range(30) if i % 3 != 1}
