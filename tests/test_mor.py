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

def test_vectors_survive_a_root_with_space_and_percent(spark, tmp_path):
    """_metadata.file_path is URI-encoded ('a b' -> 'a%20b'): a
    prefix-strip against the raw resolved root silently degrades to
    absolute-URI keys for such roots (ADVICE r9).  Basename keys are
    root-independent, so deletes must survive both the funky root AND
    a move out of it."""
    import shutil

    path = str(tmp_path / "t space %41")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, k int, v double",
    ).repartition(3).write.parquet(path)
    mor.write_deletion_vector(spark, path, F.col("k") == 1)
    assert mor.read_with_deletes(spark, path).count() == 20
    moved = str(tmp_path / "plain")
    shutil.move(path, moved)
    got = {r.id for r in mor.read_with_deletes(spark, moved).collect()}
    assert got == {i for i in range(30) if i % 3 != 1}


def test_update_vector_rewrites_without_touching_base_files(spark, tmp_path):
    path = _base(spark, tmp_path)
    n = mor.write_update_vector(
        spark, path, F.col("k") == 0, {"v": F.col("v") + 1000.0}
    )
    assert n == 10
    rows = {r.id: r.v for r in mor.read_with_deletes(spark, path).collect()}
    assert len(rows) == 30  # update never changes cardinality
    for i in range(30):
        assert rows[i] == (float(i) + 1000.0 if i % 3 == 0 else float(i))
    root = pathlib.Path(path)
    assert len(list(root.glob("part-*.parquet"))) == 3  # base untouched
    assert len(list((root / "_updates").glob("upd-*.parquet"))) == 1
    assert len(list((root / "_deletes").glob("dv-upd-*.parquet"))) == 1


def test_update_overlapping_prior_delete_skips_dead_rows(spark, tmp_path):
    """The VERDICT r9 contract: an update whose predicate overlaps
    already-deleted rows touches only the still-live ones, and purge
    folds both away."""
    path = _base(spark, tmp_path)
    mor.write_deletion_vector(spark, path, F.col("id") < 6)  # kills 0..5
    n = mor.write_update_vector(
        spark, path, F.col("id") < 12, {"v": F.lit(-1.0)}
    )
    assert n == 6  # 6..11 only — 0..5 are dead and stay dead
    got = {(r.id, r.v) for r in mor.read_with_deletes(spark, path).collect()}
    assert got == {
        (i, -1.0 if i < 12 else float(i)) for i in range(6, 30)
    }
    dest = str(tmp_path / "gen2")
    assert mor.purge_deletes(spark, path, dest) == 24
    clean = {(r.id, r.v) for r in spark.read.parquet(dest).collect()}
    assert clean == got
    assert not (pathlib.Path(dest) / "_updates").exists()


def test_update_of_updated_row_composes(spark, tmp_path):
    """Reinserted rows get fresh addresses: a second update (and a
    delete) must land on the reinsert file's positions."""
    path = _base(spark, tmp_path)
    mor.write_update_vector(spark, path, F.col("id") == 7, {"v": F.lit(70.0)})
    mor.write_update_vector(spark, path, F.col("id") == 7, {"v": F.lit(700.0)})
    rows = {r.id: r.v for r in mor.read_with_deletes(spark, path).collect()}
    assert rows[7] == 700.0 and len(rows) == 30
    assert mor.write_deletion_vector(spark, path, F.col("id") == 7) == 1
    assert mor.read_with_deletes(spark, path).count() == 29


def test_orphan_reinsert_is_invisible(spark, tmp_path):
    """Crash simulation: a reinsert file WITHOUT its pairing sidecar
    (the only state a crash mid-update can leave) must not appear in
    reads — the sidecar rename is the commit point."""
    path = _base(spark, tmp_path)
    upd = pathlib.Path(path) / "_updates"
    upd.mkdir()
    spark.createDataFrame(
        [(99, 9, 9.9)], "id long, k int, v double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    (part,) = list((tmp_path / "stage").glob("part-*.parquet"))
    part.rename(upd / "upd-deadbeef.parquet")
    got = {r.id for r in mor.read_with_deletes(spark, path).collect()}
    assert got == set(range(30))


def test_dv_format_mismatch_fails_loudly(spark, tmp_path):
    """A v1-keyed (or unmarked) sidecar directory must ERROR, not
    silently resurrect deletes, when read by the basename-keyed
    reader (review r10)."""
    import pytest

    path = _base(spark, tmp_path)
    mor.write_deletion_vector(spark, path, F.col("k") == 0)
    marker = pathlib.Path(path) / "_deletes" / "_FORMAT"
    assert marker.read_text().startswith("dv-keys=basename,v2")
    marker.write_text("dv-keys=root-relative,v1\n")
    with pytest.raises(ValueError, match="format mismatch"):
        mor.read_with_deletes(spark, path).count()
    marker.unlink()
    with pytest.raises(ValueError, match="format mismatch"):
        mor.read_with_deletes(spark, path).count()


def test_dv_writer_refuses_to_stamp_over_unmarked_sidecars(spark, tmp_path):
    """A WRITE arriving before any read must not launder v1 sidecars
    by stamping the v2 marker over them (r10b)."""
    import pytest

    path = _base(spark, tmp_path)
    mor.write_deletion_vector(spark, path, F.col("k") == 0)
    # simulate a pre-v2 table: sidecars present, no marker
    (pathlib.Path(path) / "_deletes" / "_FORMAT").unlink()
    # the read inside the writer already fails loudly on the unmarked
    # sidecars; _mark_dv_format's refusal is defense-in-depth behind it
    with pytest.raises(ValueError, match="format mismatch|UNMARKED"):
        mor.write_deletion_vector(spark, path, F.col("k") == 1)
    from market_etl_spark.mor import _mark_dv_format

    with pytest.raises(ValueError, match="UNMARKED"):
        _mark_dv_format(pathlib.Path(path) / "_deletes")


def _manifested(spark, tmp_path, n=60):
    """A manifested generation (the compact_manifested input layout)
    clustered on v, plus the source frame."""
    from market_etl_spark.sinks import write_manifested

    src = str(tmp_path / "gen1")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(n)],
        "id long, k int, v double",
    )
    write_manifested(df, src, "v", n_files=6)
    return src


def test_compaction_carries_committed_updates(spark, tmp_path):
    """ADVICE r10 (medium): compact_manifested(apply_deletes=True)
    over a table with committed MOR updates must fold the REINSERT
    rows into the rewrite — the dv-upd sidecar subtracts the updated
    rows' base positions, so dropping the reinserts silently loses
    every updated row.  The update here also MOVES the cluster key
    (+1000) past every base file's range, exercising the open-ended
    last-bin routing."""
    from market_etl_spark.sinks import compact_manifested

    src = _manifested(spark, tmp_path)
    data = f"{src}/data"
    mor.write_deletion_vector(spark, data, F.col("k") == 0)
    assert (
        mor.write_update_vector(
            spark, data, F.col("k") == 1, {"v": F.col("v") + 1000.0}
        )
        == 20
    )
    logical = {
        (r.id, r.v) for r in mor.read_with_deletes(spark, data).collect()
    }
    dest = str(tmp_path / "gen2")
    compact_manifested(spark, src, dest, "v", n_bins=3, apply_deletes=True)
    got = {(r.id, r.v) for r in spark.read.parquet(f"{dest}/data").collect()}
    assert got == logical  # 20 updated rows present, 20 deleted gone


def test_compaction_applies_deletes_against_updated_rows(spark, tmp_path):
    """A delete AFTER an update targets the reinsert file's positions:
    compaction must subtract those DVs from the reinsert rows too,
    and in-range reinsert rows route to their value bin (not only the
    open-ended edges)."""
    from market_etl_spark.sinks import compact_manifested

    src = _manifested(spark, tmp_path)
    data = f"{src}/data"
    # in-range update (key unchanged), then a delete hitting a mix of
    # base and updated rows
    mor.write_update_vector(
        spark, data, F.col("k") == 1, {"id": F.col("id") + 100}
    )
    mor.write_deletion_vector(spark, data, F.col("v") >= 40.0)
    logical = {
        (r.id, r.v) for r in mor.read_with_deletes(spark, data).collect()
    }
    dest = str(tmp_path / "gen2")
    compact_manifested(spark, src, dest, "v", n_bins=3, apply_deletes=True)
    got = {(r.id, r.v) for r in spark.read.parquet(f"{dest}/data").collect()}
    assert got == logical


def test_compaction_without_apply_deletes_refuses_sidecars(spark, tmp_path):
    """apply_deletes=False over a source carrying sidecars would
    resurrect deletes and drop updates in the new generation — loud
    error instead (ADVICE r10)."""
    import pytest

    from market_etl_spark.sinks import compact_manifested

    src = _manifested(spark, tmp_path)
    mor.write_deletion_vector(spark, f"{src}/data", F.col("k") == 0)
    with pytest.raises(ValueError, match="apply_deletes"):
        compact_manifested(
            spark, src, str(tmp_path / "gen2"), "v", n_bins=3
        )
