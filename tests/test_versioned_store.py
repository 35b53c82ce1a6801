"""Versioned snapshot store: commit protocol, time travel, vacuum.

The correctness gate (q_time_travel_read / q_vacuum_retention) proves
the end-to-end data semantics; these tests pin the PROTOCOL edge
cases — torn writes, marker-gated visibility, retention boundaries —
that only fault injection exercises.
"""

from __future__ import annotations

import pathlib
import shutil

import pytest

from market_etl_spark.sinks import (
    latest_version,
    read_version,
    vacuum_versions,
    write_versioned,
)

SCRATCH = pathlib.Path(__file__).resolve().parent.parent / ".scratch" / "verstore"


@pytest.fixture()
def store(spark):
    path = SCRATCH / "s1"
    shutil.rmtree(path, ignore_errors=True)
    yield spark, str(path)
    shutil.rmtree(path, ignore_errors=True)


def test_versions_are_immutable_and_ordered(store):
    spark, path = store
    assert latest_version(path) == 0  # empty store
    v1 = write_versioned(spark.range(3), path)
    v2 = write_versioned(spark.range(5), path)
    assert (v1, v2) == (1, 2)
    assert latest_version(path) == 2
    # time travel: v1 unchanged by the v2 commit
    assert read_version(spark, path, 1).count() == 3
    assert read_version(spark, path, 2).count() == 5


def test_torn_write_is_invisible(store):
    """A data directory without its marker (crash between data write
    and marker rename) must not surface as a version."""
    spark, path = store
    write_versioned(spark.range(3), path)
    # simulate the crash: data dir appears, marker never does
    spark.range(7).write.parquet(f"{path}/v=2")
    assert latest_version(path) == 1  # marker directory is the truth
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, path, 2)
    # the next commit RECLAIMS the torn slot (it was never visible),
    # never spins on it, and never skips numbering
    v = write_versioned(spark.range(9), path)
    assert v == 2
    assert read_version(spark, path, 2).count() == 9


def test_vacuum_retains_newest_and_sweeps_orphans(store):
    spark, path = store
    for n in (2, 4, 6, 8):
        write_versioned(spark.range(n), path)
    spark.range(1).write.parquet(f"{path}/_tmp_v99")  # torn staging dir
    res = vacuum_versions(path, keep_last=2, min_orphan_age_sec=0.0)
    assert res["versions_before"] == 4
    assert res["removed"] == [1, 2]
    assert res["kept"] == [3, 4]
    assert res["orphans_removed"] == 1
    for gone in (1, 2):
        with pytest.raises(ValueError):
            read_version(spark, path, gone)
    assert read_version(spark, path, 3).count() == 6
    assert read_version(spark, path, 4).count() == 8
    assert latest_version(path) == 4  # numbering never rewinds


def test_vacuum_keep_zero_empties_the_store(store):
    spark, path = store
    write_versioned(spark.range(3), path)
    res = vacuum_versions(path, keep_last=0, min_orphan_age_sec=0.0)
    assert res["versions_after"] == 0 and res["removed"] == [1]
    assert latest_version(path) == 0
    # and the store is reusable: next commit restarts at 1
    assert write_versioned(spark.range(2), path) == 1


def test_vacuum_is_idempotent(store):
    spark, path = store
    for n in (2, 4, 6):
        write_versioned(spark.range(n), path)
    vacuum_versions(path, keep_last=1, min_orphan_age_sec=0.0)
    res = vacuum_versions(path, keep_last=1, min_orphan_age_sec=0.0)
    assert res["removed"] == [] and res["orphans_removed"] == 0
    assert res["kept"] == [3]


def test_vacuum_default_age_gate_spares_fresh_orphans(store):
    """The DEFAULT min_orphan_age_sec (300 s) must leave a
    freshly-staged unmarkered dir alone — it is indistinguishable from
    a live writer between its data rename and marker rename, and the
    immediate sweep is opt-in (ADVICE r8)."""
    spark, path = store
    write_versioned(spark.range(3), path)
    spark.range(1).write.parquet(f"{path}/_tmp_v99")  # looks in-flight
    spark.range(2).write.parquet(f"{path}/v=9")  # unmarkered data dir
    res = vacuum_versions(path, keep_last=5)
    assert res["orphans_removed"] == 0
    assert pathlib.Path(path, "_tmp_v99").exists()
    assert pathlib.Path(path, "v=9").exists()
    # explicit 0 (single-writer posture) sweeps both
    res = vacuum_versions(path, keep_last=5, min_orphan_age_sec=0.0)
    assert res["orphans_removed"] == 2
    assert not pathlib.Path(path, "_tmp_v99").exists()
    assert not pathlib.Path(path, "v=9").exists()


def test_vacuum_sweeps_stale_marker_tmp(store):
    """A crash between marker write and marker rename strands a
    ``.N.tmp`` file in _versions/ — vacuum sweeps it under the same
    age gate as data-dir orphans (ADVICE r8)."""
    spark, path = store
    write_versioned(spark.range(3), path)
    stale = pathlib.Path(path, "_versions", ".7.tmp")
    stale.write_text("7")
    res = vacuum_versions(path, keep_last=5)  # default gate: too fresh
    assert res["orphans_removed"] == 0 and stale.exists()
    res = vacuum_versions(path, keep_last=5, min_orphan_age_sec=0.0)
    assert res["orphans_removed"] == 1 and not stale.exists()
    assert latest_version(path) == 1  # committed marker untouched


def test_writer_slot_race_falls_through_to_next_slot(store):
    """TOCTOU between the exists() check and os.rename: simulate the
    loser by pre-creating a NON-EMPTY committed slot after staging
    would have chosen it — write_versioned must take the next slot,
    not crash with ENOTEMPTY (ADVICE r8)."""
    import os

    spark, path = store
    write_versioned(spark.range(3), path)  # v1
    # A concurrent writer commits v=2 (data + marker) "between" our
    # latest_version() read and the rename.  write_versioned's
    # pre-rename exists() check catches a committed slot, so to hit
    # the rename-level race we make the slot appear committed only
    # AFTER the check: an unmarkered non-empty dir is reclaimed by
    # rmtree, so instead patch os.rename to fail once with ENOTEMPTY.
    real_rename = os.rename
    fails = {"n": 0}

    def flaky_rename(src, dst):
        if "v=2" in str(dst) and fails["n"] == 0:
            fails["n"] += 1
            raise OSError(39, "Directory not empty", str(dst))
        return real_rename(src, dst)

    os.rename = flaky_rename
    try:
        v = write_versioned(spark.range(5), path)
    finally:
        os.rename = real_rename
    assert v == 3  # slot 2 lost to the race, slot 3 won
    assert read_version(spark, path, 3).count() == 5
