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
    res = vacuum_versions(path, keep_last=2)
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
    res = vacuum_versions(path, keep_last=0)
    assert res["versions_after"] == 0 and res["removed"] == [1]
    assert latest_version(path) == 0
    # and the store is reusable: next commit restarts at 1
    assert write_versioned(spark.range(2), path) == 1


def test_vacuum_is_idempotent(store):
    spark, path = store
    for n in (2, 4, 6):
        write_versioned(spark.range(n), path)
    vacuum_versions(path, keep_last=1)
    res = vacuum_versions(path, keep_last=1)
    assert res["removed"] == [] and res["orphans_removed"] == 0
    assert res["kept"] == [3]
