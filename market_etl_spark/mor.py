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

Reference parity note: the reference pipeline (glue_jobs/*.py) is
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

    live = _with_positions(spark, table_path)
    dvs = _read_dvs(spark, table_path)
    hits = live.filter(predicate).select("_dv_file", "_dv_pos")
    if dvs is not None:
        hits = hits.join(F.broadcast(dvs), ["_dv_file", "_dv_pos"], "left_anti")
    out = pathlib.Path(table_path) / _DV_DIR
    out.mkdir(parents=True, exist_ok=True)
    dest = out / f"dv-{uuid.uuid4().hex[:8]}.parquet"
    write_single_file(hits, dest)
    return spark.read.parquet(str(dest)).count()


def read_with_deletes(spark: SparkSession, table_path: str) -> DataFrame:
    """The LOGICAL table: base files minus every accumulated deletion
    vector — one broadcast anti join on the exact row address (the
    merge-on-read cost, paid per query until a purge folds it away)."""
    live = _with_positions(spark, table_path)
    dvs = _read_dvs(spark, table_path)
    if dvs is not None:
        live = live.join(
            F.broadcast(dvs), ["_dv_file", "_dv_pos"], "left_anti"
        )
    return live.drop("_dv_file", "_dv_pos")


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
    """Base scan with TABLE-RELATIVE row addresses: the sidecar keys
    are the file path suffix after the resolved table root, not the
    absolute URI — a moved/renamed/symlinked table keeps its deletes
    (Delta/Iceberg store relative paths for exactly this reason;
    review r9b: absolute URIs silently resurrected every deleted row
    after the purge docstring's own directory-swap workflow)."""
    root = str(pathlib.Path(table_path).resolve())
    return spark.read.parquet(table_path).select(
        "*",
        F.substring_index(
            F.col("_metadata.file_path"), root, -1
        ).alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
    )


def _read_dvs(spark: SparkSession, table_path: str) -> DataFrame | None:
    dv_dir = pathlib.Path(table_path) / _DV_DIR
    if not any(dv_dir.glob("dv-*.parquet")):
        return None
    return spark.read.parquet(
        *[str(p) for p in sorted(dv_dir.glob("dv-*.parquet"))]
    ).select("_dv_file", "_dv_pos")
