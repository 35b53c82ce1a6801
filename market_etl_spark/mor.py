"""Merge-on-read DELETES via position-based deletion vectors.

The modern lakehouse delete story (Delta deletion vectors / Iceberg v2
position deletes) on plain parquet: instead of rewriting every file a
delete touches (copy-on-write — :func:`merge.merge_into_partitioned`'s
model), a delete writes a tiny SIDECAR of (file_path, row_index)
positions and readers subtract it at scan time.  At 100 TB that is the
difference between rewriting terabytes to delete kilobytes and an
O(deleted rows) metadata append; the deferred cost is one broadcast
anti join per read, which a periodic PURGE (rewrite minus DVs — the
copy-on-write catch-up) folds away.

Positions come from the scan's own ``_metadata.file_path`` /
``_metadata.row_index`` columns, so the vectors are exact row
addresses, not key predicates — deletes compose with duplicate keys
and schema evolution for free.  Multiple delete batches accumulate as
separate sidecar files (one append each, no read-modify-write); the
reader unions them.

Reference parity note: the reference pipeline (jobs/*/*.py) is
append-only — no delete story at all; this is the engine extension a
GDPR/right-to-be-forgotten workload needs weekly (the batch sibling is
``q_tombstone_forget``'s key-based copy-on-write).
"""

from __future__ import annotations

import pathlib
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Sidecar directory name under the table root.  Underscore prefix:
#: Spark's file index ignores it when scanning the table's data files.
_DV_DIR = "_deletes"

#: Reinsert files for merge-on-read UPDATEs.  Also underscore-hidden:
#: an update's rewritten rows are INVISIBLE to the base scan until the
#: paired deletion vector commits (see :func:`write_update_vector`).
_UPD_DIR = "_updates"


def with_row_addresses(df: DataFrame) -> DataFrame:
    """THE single definition of the row-address projection every
    deletion-vector writer and reader shares: ``_dv_file`` = the part
    file's BASENAME (root-independent — survives moves/renames/
    URI-encoding quirks; unique within a table via the part-name
    UUID), ``_dv_pos`` = the scan row index.  One definition so the
    key format can never drift between a writer and a reader
    (callers: this module, :mod:`.lakehouse`, and the DV-applying
    compaction in :mod:`.sinks`)."""
    return df.select(
        "*",
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
    )


def write_deletion_vector(
    spark: SparkSession, table_path: str, predicate
) -> int:
    """DELETE WHERE ``predicate`` as a deletion-vector append: scan
    only (metadata cols + predicate cols), record the matching rows'
    (file_path, row_index) addresses as ONE new sidecar parquet under
    ``table/_deletes/``.  Never touches a data file.  Already-deleted
    rows are excluded (a delete of a deleted row is a no-op, so
    re-running a delete is idempotent).  Returns the number of
    positions written."""
    from .sinks import write_single_file

    hits = _live_with_positions(spark, table_path).filter(predicate).select(
        "_dv_file", "_dv_pos"
    )
    out = pathlib.Path(table_path) / _DV_DIR
    out.mkdir(parents=True, exist_ok=True)
    _mark_dv_format(out)
    dest = out / f"dv-{uuid.uuid4().hex[:8]}.parquet"
    write_single_file(hits, dest)
    return spark.read.parquet(str(dest)).count()


def write_update_vector(
    spark: SparkSession, table_path: str, predicate, set_exprs: dict
) -> int:
    """UPDATE ... SET ... WHERE ``predicate`` merge-on-read: the
    matched rows' positions are DELETED (a DV append, like
    :func:`write_deletion_vector`) and their rewritten images are
    APPENDED as one new reinsert file — Delta's DV-update / Iceberg's
    position-delete+insert model.  No base file is rewritten, so at
    100 TB an update of kilobytes costs kilobytes, and the read-side
    cost stays the same single broadcast anti join.

    Commit protocol (both sides flip atomically, one fs rename):
    the reinsert file lands FIRST under ``table/_updates/`` —
    underscore-hidden, so the base scan never sees it — and becomes
    visible only through its PAIRED sidecar ``_deletes/dv-upd-<id>``:
    readers union exactly the reinsert files whose pairing sidecar
    exists.  The sidecar's atomic rename is therefore the single
    commit point; a crash before it leaves an invisible orphan under
    ``_updates/`` (swept by purge), never a duplicate or a lost row.

    ``set_exprs`` maps column name -> Column expression evaluated on
    the matched row (``{"v": F.col("v") * 2}``).  Rows already
    deleted (or superseded by a prior update) are excluded — an
    update overlapping a prior delete touches only the still-live
    rows.  Updated rows get fresh addresses in the reinsert file, so
    later deletes/updates compose.  Returns the number of rows
    updated."""
    from .sinks import write_single_file

    hits = _live_with_positions(spark, table_path).filter(predicate)
    # one materialization feeds positions, reinsert rows and the
    # count (update batches are delta-sized — same bounded posture as
    # merge_into_partitioned's checkpoint)
    hits = hits.localCheckpoint()
    n = hits.count()
    if n == 0:
        return 0
    rewritten = hits
    for c, expr in set_exprs.items():
        rewritten = rewritten.withColumn(c, expr)
    rewritten = rewritten.drop("_dv_file", "_dv_pos")
    upd_id = uuid.uuid4().hex[:8]
    upd_dir = pathlib.Path(table_path) / _UPD_DIR
    upd_dir.mkdir(parents=True, exist_ok=True)
    write_single_file(rewritten, upd_dir / f"upd-{upd_id}.parquet")
    dv_dir = pathlib.Path(table_path) / _DV_DIR
    dv_dir.mkdir(parents=True, exist_ok=True)
    _mark_dv_format(dv_dir)
    write_single_file(  # THE commit point
        hits.select("_dv_file", "_dv_pos"),
        dv_dir / f"dv-upd-{upd_id}.parquet",
    )
    return n


def read_with_deletes(spark: SparkSession, table_path: str) -> DataFrame:
    """The LOGICAL table: (base files ∪ committed reinsert files)
    minus every accumulated deletion vector — one broadcast anti join
    on the exact row address (the merge-on-read cost, paid per query
    until a purge folds it away)."""
    return _live_with_positions(spark, table_path).drop("_dv_file", "_dv_pos")


def purge_deletes(spark: SparkSession, table_path: str, dest_path: str) -> int:
    """Fold the deletion vectors away: rewrite the LOGICAL table into a
    fresh generation at ``dest_path`` with no sidecars — the periodic
    copy-on-write catch-up that bounds read-side anti-join cost.
    Returns the surviving row count (also the generation's audit
    number).  The source generation is untouched (file-set
    discipline, same as :func:`sinks.compact_manifested`)."""
    import shutil

    dest = pathlib.Path(dest_path)
    shutil.rmtree(dest, ignore_errors=True)
    read_with_deletes(spark, table_path).write.mode("overwrite").parquet(
        str(dest)
    )
    return spark.read.parquet(str(dest)).count()


def _with_positions(spark: SparkSession, table_path: str) -> DataFrame:
    """Base scan with ROOT-INDEPENDENT row addresses: the sidecar key
    is the part file's BASENAME plus the row index, never any form of
    the table root.  Part-file names embed a per-job UUID (Spark's
    ``part-<task>-<uuid>...`` contract), so the basename is unique
    within a table; keying on it survives moves, renames, symlinked
    roots, and — unlike a prefix-strip against the resolved root —
    roots whose URI encoding differs from their raw path (space, '%',
    non-ASCII: ``_metadata.file_path`` is a URI-encoded string, so a
    root at ``/t/a b`` appears as ``file:/t/a%20b/...`` and a raw
    prefix match silently degrades to keying the full absolute URI,
    resurrecting every delete after a table move — review r10/ADVICE
    r9).  Appended reinsert files (:func:`write_update_vector`) use
    their own UUID names, so they can never collide with base files."""
    return with_row_addresses(spark.read.parquet(table_path))


def _live_with_positions(spark: SparkSession, table_path: str) -> DataFrame:
    """(base ∪ committed reinserts) with addresses, minus DVs — the
    shared live frame every read/delete/update builds on.  Committed =
    the ``_updates/upd-<id>.parquet`` files whose pairing
    ``dv-upd-<id>`` sidecar exists; an orphan reinsert (crash before
    its sidecar rename) is invisible here by construction."""
    live = _with_positions(spark, table_path)
    upd = _committed_update_files(table_path)
    if upd:
        live = live.unionByName(
            with_row_addresses(spark.read.parquet(*upd))
        )
    dvs = _read_dvs(spark, table_path)
    if dvs is not None:
        # broadcast only while the accumulated position count fits
        # the bound — a delete wave past it degrades to a shuffle
        # anti join instead of an executor OOM (VERDICT r11); the
        # count is footer metadata, KBs per sidecar
        from .lakehouse import _broadcast_cap, _dv_rowcount

        root = pathlib.Path(table_path)
        names = [
            p.relative_to(root).as_posix()
            for p in sorted((root / _DV_DIR).glob("dv-*.parquet"))
        ]
        if _dv_rowcount(root, names) <= _broadcast_cap(spark):
            dvs = F.broadcast(dvs)
        live = live.join(dvs, ["_dv_file", "_dv_pos"], "left_anti")
    return live


def _committed_update_files(table_path: str) -> list[str]:
    root = pathlib.Path(table_path)
    out = []
    for dv in sorted((root / _DV_DIR).glob("dv-upd-*.parquet")):
        upd_id = dv.name[len("dv-upd-"):-len(".parquet")]
        p = root / _UPD_DIR / f"upd-{upd_id}.parquet"
        if not p.exists():
            raise ValueError(
                f"corrupt table at {table_path}: sidecar {dv.name} has "
                f"no pairing reinsert file (the sidecar commits LAST — "
                f"this cannot be crash debris)"
            )
        out.append(str(p))
    return out


#: On-disk DV key format id.  v2 = (part-file basename, row_index);
#: v1 (rounds ≤9) keyed a root-relative path suffix.  The marker turns
#: a format mismatch into a LOUD error — without it, reading v1
#: sidecars through a v2 reader silently matches nothing and every
#: deleted row resurrects (review r10 finding 3).
_DV_FORMAT = "dv-keys=basename,v2"


def _mark_dv_format(dv_dir: pathlib.Path) -> None:
    """Stamp the key-format marker — but NEVER over a sidecar
    directory that already holds UNMARKED vectors: those are v1
    (pre-basename) keys, and stamping v2 over them would silence the
    exact mismatch the marker exists to catch the next time the
    table is read (review r10b: a write arriving before any read was
    the laundering path)."""
    marker = dv_dir / "_FORMAT"
    if marker.exists():
        return
    if any(dv_dir.glob("dv-*.parquet")):
        raise ValueError(
            f"refusing to write {_DV_FORMAT!r} sidecars into {dv_dir}: "
            f"it already holds UNMARKED (pre-v2) vectors — purge with "
            f"the release that wrote them, then re-apply deletes"
        )
    marker.write_text(_DV_FORMAT + "\n")


def _read_dvs(spark: SparkSession, table_path: str) -> DataFrame | None:
    dv_dir = pathlib.Path(table_path) / _DV_DIR
    if not any(dv_dir.glob("dv-*.parquet")):
        return None
    marker = dv_dir / "_FORMAT"
    found = marker.read_text().strip() if marker.exists() else "absent"
    if found != _DV_FORMAT:
        raise ValueError(
            f"deletion-vector format mismatch at {table_path}: sidecars "
            f"declare {found!r}, this reader expects {_DV_FORMAT!r} — "
            f"reading on would silently resurrect deleted rows; "
            f"re-key the sidecars (purge with the writing release, "
            f"then re-apply deletes) before reading with this one"
        )
    return spark.read.parquet(
        *[str(p) for p in sorted(dv_dir.glob("dv-*.parquet"))]
    ).select("_dv_file", "_dv_pos")
