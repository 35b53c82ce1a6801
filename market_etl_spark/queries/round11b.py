"""Round-11 part 2: DATA SKIPPING over the commit log, Z-ORDER
clustering, and the metadata-only DESCRIBE DETAIL.

The lakehouse trio completes the read-path scale story the log
started: every ``add`` action now carries per-column min/max/null
footer statistics (collected from the parquet footer the writer
already produced — no extra data pass), so

- ``q_lakehouse_data_skipping`` — a predicate read opens ONLY the
  files whose stats admit a match (Delta data skipping): at 100 TB
  the difference between reading 40 files and 40,000.  The prune is
  O(live files) driver-side metadata; results are proven identical
  to the unpruned filter.
- ``q_lakehouse_zorder`` — OPTIMIZE ZORDER BY (a, b): one
  space-filling-curve rewrite makes skipping effective on BOTH
  columns at once (a plain sort clusters only one) — quantile
  bucketing + bit interleaving, all codegen'd column arithmetic,
  no UDF.
- ``q_lakehouse_describe_detail`` — DESCRIBE DETAIL / metadata-only
  ``COUNT(*)`` served purely from the log's stats: exact with no
  live deletion vectors, honestly demoted to an upper bound while
  DVs are live, exact again once compaction settles them.

(Corpus-governance siblings — PII scrubbing, n-gram benchmark
decontamination — already exist as ``llm_pii_redaction`` and
``llm_decontamination`` in :mod:`.datasets_corpus`.)

Relation to the MANIFESTED-STORE siblings (``q_stats_pruned_scan``,
``q_zorder_pruned_scan`` in :mod:`.etl_pipeline`): those prove the
layout math over :func:`..sinks.write_manifested`'s single-writer
store with an explicit manifest file.  THIS trio puts the same
capability under the COMMIT LOG: stats live in the add actions
(footer-derived, checkpoint-carried), so skipping composes with
transactions, deletion vectors, restore, clone and version expiry —
the "one table" direction VERDICT r10 item 2 asked for.

Reference parity note: the reference (harshvardhanvn1/market-etl)
has no table format and no corpus governance; these extend SURVEY.md
§2's lakehouse/LLM extension families.  Partition layout in the
reference is year/month/day/symbol (infra/terraform/main.tf:455-478)
with pruning delegated to Athena; file-level stats skipping is the
engine-side generalization of the same idea.
"""

from __future__ import annotations

import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import _SCRATCH
from ..tables import load
from .registry import query


def _tag(sf_dir: str) -> str:
    return pathlib.Path(sf_dir.rstrip("/")).name.replace(".", "_")


def _micros(col):
    return F.round(col * 1e6, 0).cast("long")


def _seed_ranged_events(spark, sf_dir: str, path: str, n_files: int = 8):
    """Seed a commit-log table from events as ``n_files`` appends of
    CONTIGUOUS event_id ranges (one file each) — the natural layout of
    an id-ordered ingest, where per-file min/max are disjoint and
    skipping on the id is maximally effective."""
    from .. import lakehouse as lk

    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    bound = mx // n_files + 1
    for i in range(n_files):
        t = lk.Transaction(path)
        t.append(
            ev.filter(
                (F.col("event_id") >= i * bound)
                & (F.col("event_id") < (i + 1) * bound)
            ).coalesce(1)
        )
        t.commit()
    return ev, bound


@query(
    "q_lakehouse_data_skipping",
    oracle="""
    WITH bound AS (SELECT (MAX(event_id) // 8) + 1 AS b FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(8 AS INT) AS files_total,
           CAST(1 AS INT) AS files_scanned,
           TRUE AS pruned_equals_filtered,
           TRUE AS empty_prune_is_empty
    FROM events, bound
    WHERE event_id < b
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "data-skipping", "statistics", "extension"),
)
def q_lakehouse_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA SKIPPING from add-action footer stats — Delta's file
    pruning over the commit log (:func:`..lakehouse.prune_files`,
    :func:`..lakehouse.read_table` with ``predicate``): 8 appends of
    contiguous event_id ranges (one file each), then a range read
    ``event_id < max/8`` that provably needs only the FIRST file.

    Audits pinned by the oracle: ``files_total=8, files_scanned=1``
    (the prune is exact on this layout — pure metadata, no data file
    opened to decide); ``pruned_equals_filtered`` — the pruned read's
    per-type aggregate equals filtering the FULL table (skipping can
    change I/O, never results); ``empty_prune_is_empty`` — a
    predicate beyond the id domain prunes every file and yields a
    correct typed empty frame.  At 100 TB this read opens 1/8 of the
    table's files; the same mechanism serves any stats-expressible
    predicate."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_skip_{_tag(sf_dir)}")
    ev, bound = _seed_ranged_events(spark, sf_dir, path, n_files=8)

    _v, kept, total = lk.prune_files(path, [("event_id", "<", bound)])
    pruned = lk.read_table(spark, path, predicate=[("event_id", "<", bound)])
    agg = pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
    )
    # skipping is a superset guarantee: prove result-equality against
    # the unpruned full-table filter (order-insensitive digest)
    full = (
        lk.read_table(spark, path)
        .filter(F.col("event_id") < bound)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
    )
    rows = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    # bounded by event_type cardinality (5) — not a data collect
    pruned_equals_filtered = rows(agg) == rows(full)
    beyond = lk.read_table(
        spark, path, predicate=[("event_id", ">", 2 * 8 * bound)]
    )
    empty_prune_is_empty = (
        lk.prune_files(path, [("event_id", ">", 2 * 8 * bound)])[1] == []
        and beyond.count() == 0
    )
    return (
        agg.withColumn("files_total", F.lit(total).cast("int"))
        .withColumn("files_scanned", F.lit(len(kept)).cast("int"))
        .withColumn(
            "pruned_equals_filtered", F.lit(bool(pruned_equals_filtered))
        )
        .withColumn("empty_prune_is_empty", F.lit(bool(empty_prune_is_empty)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_zorder",
    oracle="""
    WITH ub AS (SELECT (MAX(user_id) // 4) + 1 AS u FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS pre_zorder_no_user_skip,
           TRUE AS post_zorder_user_skip,
           TRUE AS post_zorder_event_skip,
           TRUE AS zorder_preserves_rows
    FROM events, ub
    WHERE user_id < u
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "zorder", "data-skipping", "clustering", "extension"),
)
def q_lakehouse_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER BY (event_id, user_id) — multi-dimensional
    clustering (:meth:`..lakehouse.Transaction.optimize_zorder`): on
    the id-ranged ingest layout a ``user_id`` predicate prunes
    NOTHING (every file spans the whole user domain — the oracle pins
    ``pre_zorder_no_user_skip``); one z-order rewrite (quantile
    bucketing + bit interleaving, codegen'd arithmetic, one
    repartitionByRange job) makes file stats tight on BOTH columns,
    and the same user predicate — and an event_id predicate — now
    skip files (``post_zorder_user_skip`` / ``post_zorder_event_skip``
    pinned strict: scanned < total).  ``zorder_preserves_rows``: the
    rewrite is dataChange=false — row count identical before/after.
    The returned aggregate runs on the PRUNED post-zorder read and
    must equal the oracle's plain filter — clustering changes layout,
    never results."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_zorder_{_tag(sf_dir)}")
    ev, _bound = _seed_ranged_events(spark, sf_dir, path, n_files=8)
    # one job for both column maxima (emax is only consumed after the
    # rewrite, but ev is immutable — value identical)
    umax, emax = ev.agg(F.max("user_id"), F.max("event_id")).collect()[0]
    ub = umax // 4 + 1
    upred = [("user_id", "<", ub)]

    _v, pre_kept, pre_total = lk.prune_files(path, upred)
    pre_zorder_no_user_skip = len(pre_kept) == pre_total == 8
    n_before = lk.read_table(spark, path).count()

    t = lk.Transaction(path)
    t.optimize_zorder(spark, ["event_id", "user_id"], n_files=16)
    t.commit()

    n_after = lk.read_table(spark, path).count()
    _v, k_user, total = lk.prune_files(path, upred)
    _v, k_event, _ = lk.prune_files(
        path, [("event_id", "<", emax // 4 + 1)]
    )
    return (
        lk.read_table(spark, path, predicate=upred)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn(
            "pre_zorder_no_user_skip", F.lit(bool(pre_zorder_no_user_skip))
        )
        .withColumn("post_zorder_user_skip", F.lit(len(k_user) < total))
        .withColumn("post_zorder_event_skip", F.lit(len(k_event) < total))
        .withColumn("zorder_preserves_rows", F.lit(n_before == n_after))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_describe_detail",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE event_type <> 'click') AS BIGINT)
               AS n_rows_after_delete,
           TRUE AS exact_before,
           TRUE AS dv_demotes_to_bound,
           TRUE AS exact_after_compact,
           TRUE AS bytes_positive
    FROM events
    """,
    tags=("lakehouse", "statistics", "metadata-only", "extension"),
)
def q_lakehouse_describe_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE DETAIL / metadata-only COUNT(*) from the log's footer
    stats (:func:`..lakehouse.table_detail`) — Delta's trick of
    serving ``SELECT COUNT(*)`` without touching data: ``n_rows``
    comes purely from add-action stats (``rows_exact`` pinned) and
    must equal the oracle's real count.  The honesty ladder is the
    point: a live deletion vector DEMOTES the stat to an upper bound
    (``dv_demotes_to_bound`` — base positions still count until
    settled), and compaction restores exactness at the post-delete
    count (``exact_after_compact``, value pinned as
    ``n_rows_after_delete``).  No stage of this query counts by
    scanning — every number is O(log) metadata."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_detail_{_tag(sf_dir)}")
    _seed_ranged_events(spark, sf_dir, path, n_files=4)

    d0 = lk.table_detail(path)
    t = lk.Transaction(path)
    t.delete_where_mor(spark, F.col("event_type") == "click")
    t.commit()
    d1 = lk.table_detail(path)
    t = lk.Transaction(path)
    t.compact(spark, n_files=2)
    t.commit()
    d2 = lk.table_detail(path)

    return spark.createDataFrame(
        [
            (
                d0["n_rows"],
                d2["n_rows"],
                bool(d0["rows_exact"]),
                bool((not d1["rows_exact"]) and d1["n_rows"] == d0["n_rows"]),
                bool(d2["rows_exact"]),
                bool(d0["n_bytes"] > 0 and d2["n_bytes"] > 0),
            )
        ],
        "n_rows long, n_rows_after_delete long, exact_before boolean, "
        "dv_demotes_to_bound boolean, exact_after_compact boolean, "
        "bytes_positive boolean",
    )


@query(
    "q_lakehouse_optimize_incremental",
    oracle="""
    WITH extra AS (
      SELECT -event_id AS event_id, event_type, value * 3 AS value
      FROM events WHERE event_id BETWEEN 1 AND 12
    ),
    allrows AS (
      SELECT event_id, event_type, value FROM events
      UNION ALL SELECT event_id, event_type, value FROM extra
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(6 AS INT) AS files_rewritten,
           TRUE AS big_files_untouched,
           TRUE AS packed_fewer,
           TRUE AS commutes_with_big_file_write
    FROM allrows
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "optimize", "compaction", "extension"),
)
def q_lakehouse_optimize_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL OPTIMIZE — :meth:`..lakehouse.Transaction.
    compact_small`: two right-sized files (the halves of events) plus
    six tiny ingest files (2 negated-id rows each — the streaming
    small-file debt), then OPTIMIZE with the threshold at the
    smaller big file's size.  Exactly the SIX small files are
    rewritten (``files_rewritten`` pinned), the big files survive BY
    NAME (``big_files_untouched``) — at 100 TB this is the whole
    point: table maintenance pays for the debt, never the table —
    and the bin-pack shrinks the file count (``packed_fewer``).
    ``commutes_with_big_file_write``: only candidates enter the read
    set, so a concurrent MOR delete targeting a BIG file commits
    cleanly alongside (a full :meth:`compact` would conflict); the
    final aggregate (which the oracle recomputes relationally)
    includes that concurrent delete's effect to prove both commits
    landed."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_optinc_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    mid = mx // 2
    t = lk.Transaction(path)
    t.append(ev.filter(F.col("event_id") <= mid).coalesce(1))
    t.commit()
    t = lk.Transaction(path)
    t.append(ev.filter(F.col("event_id") > mid).coalesce(1))
    t.commit()
    small_src = ev.filter(F.col("event_id").between(1, 12)).select(
        (-F.col("event_id")).alias("event_id"),
        "event_type",
        (F.col("value") * 3).alias("value"),
    )
    for k in range(6):
        t = lk.Transaction(path)
        t.append(
            small_src.filter(
                (-F.col("event_id") - 1).cast("long") % 6 == k
            ).coalesce(1)
        )
        t.commit()
    root = pathlib.Path(path)
    _v, live = lk.snapshot(path)
    sizes = {f: (root / f).stat().st_size for f in live}
    big = sorted(sizes, key=sizes.get)[-2:]
    threshold = min(sizes[f] for f in big)

    # concurrent writer touching a BIG file only: must commute
    t_opt = lk.Transaction(path)
    rewritten, added = t_opt.compact_small(spark, target_bytes=threshold)
    t_other = lk.Transaction(path)
    n_del = t_other.delete_where_mor(
        spark, F.col("event_id") == mx
    )  # the max id always EXISTS (mid need not, in a gappy id space)
    # and lives in a big file — not a compaction candidate
    t_other.commit()
    commuted = True
    try:
        t_opt.commit()
    except lk.CommitConflict:
        commuted = False

    _v, live_after = lk.snapshot(path)
    big_files_untouched = set(big) <= set(live_after)
    return (
        lk.read_table(spark, path)
        .union(  # the concurrently deleted row, restored analytically so
            # the oracle stays a plain relational recompute
            ev.filter(F.col("event_id") == mx)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn("files_rewritten", F.lit(rewritten).cast("int"))
        .withColumn("big_files_untouched", F.lit(bool(big_files_untouched)))
        .withColumn("packed_fewer", F.lit(0 < added < rewritten))
        .withColumn(
            "commutes_with_big_file_write", F.lit(bool(commuted and n_del == 1))
        )
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_expire_versions",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(4 AS INT) AS data_files_deleted,
           TRUE AS latest_read_unchanged,
           TRUE AS expired_travel_raises,
           TRUE AS vacuum_respects_checkpoint,
           TRUE AS table_still_writable
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "retention", "expire-snapshots", "extension"),
)
def q_lakehouse_expire_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION EXPIRY — :func:`..lakehouse.expire_versions` (Iceberg
    ``expire_snapshots`` / Delta log retention): four ranged appends,
    one compaction (v5) that strands the four originals as
    history-only references, then expiry at keep_from=5.  Exactly the
    FOUR pre-compaction files are physically deleted
    (``data_files_deleted`` pinned — files any retained version
    references survive), the latest read is byte-identical
    (``latest_read_unchanged``, and the returned aggregate equals the
    oracle's plain recompute), time travel below the boundary raises
    loudly (``expired_travel_raises``), a zero-age vacuum removes
    NOTHING (``vacuum_respects_checkpoint`` — the retention
    checkpoint carries the references the deleted commits used to),
    and the table keeps accepting commits
    (``table_still_writable``).  This is the bounded-storage contract
    a 100 TB table needs — without expiry every rewrite's old
    generation lives forever."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_expire_{_tag(sf_dir)}")
    _seed_ranged_events(spark, sf_dir, path, n_files=4)
    t = lk.Transaction(path)
    t.compact(spark, n_files=2)
    t.commit()  # v5

    before = lk.read_table(spark, path).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_micros(F.col("value"))).alias("m"),
    ).collect()[0]
    res = lk.expire_versions(path, 5)
    after = lk.read_table(spark, path).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_micros(F.col("value"))).alias("m"),
    ).collect()[0]
    latest_read_unchanged = (before.n, before.m) == (after.n, after.m)
    try:
        lk.read_table(spark, path, version=2)
        expired_travel_raises = False
    except ValueError:
        expired_travel_raises = True
    vacuum_respects_checkpoint = (
        lk.vacuum_orphans(path, min_age_sec=0) == 0
        and lk.read_table(spark, path).count() == after.n
    )
    t4 = lk.Transaction(path)
    t4.compact(spark, n_files=2)
    table_still_writable = t4.commit() == 6  # snapshot replayed from
    # the retention checkpoint, next slot numbered past the expiry

    return (
        lk.read_table(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn(
            "data_files_deleted", F.lit(res["data_files_deleted"]).cast("int")
        )
        .withColumn(
            "latest_read_unchanged", F.lit(bool(latest_read_unchanged))
        )
        .withColumn(
            "expired_travel_raises", F.lit(bool(expired_travel_raises))
        )
        .withColumn(
            "vacuum_respects_checkpoint",
            F.lit(bool(vacuum_respects_checkpoint)),
        )
        .withColumn("table_still_writable", F.lit(bool(table_still_writable)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_time_travel_ts",
    oracle="""
    WITH v2 AS (SELECT * FROM events WHERE NOT (value < 100.0)),
    v3 AS (
      SELECT event_id, event_type, value FROM v2
      UNION ALL
      SELECT -event_id, event_type, value * 2
      FROM v2 WHERE event_id % 101 = 0
    ),
    probes AS (
      SELECT 'at_1500' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
                 AS value_micros
      FROM events
      UNION ALL
      SELECT 'at_2500', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
      FROM v2
      UNION ALL
      SELECT 'at_9999', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
      FROM v3
    )
    SELECT probe, n_rows, value_micros,
           TRUE AS monotonic_clocks,
           TRUE AS pre_first_raises
    FROM probes
    ORDER BY probe
    """,
    tags=("lakehouse", "time-travel", "in-commit-timestamps", "extension"),
)
def q_lakehouse_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF over IN-COMMIT TIMESTAMPS — Delta's
    inCommitTimestamp model (:func:`..lakehouse.version_at_timestamp`,
    ``read_table(timestamp=)``): the LOG is the clock of record, so
    history ordering survives file copies and clock-skewed writers.
    Three data commits at pinned logical clocks (1000 / 2000 /
    3000): seed append, copy-on-write DELETE of ``value < 100``,
    append of a negated-key doubled-value slice; then a
    metadata-only commit whose writer hands in a BACKWARD wall clock
    (500).  Probes at 1500 / 2500 / 9999 must resolve to exactly
    v1 / v2 / v4 (v4's data equals v3 — the skewed commit changed
    only metadata) — each probe's aggregate is recomputed
    relationally by the oracle.  ``monotonic_clocks``: the log
    clamps the backward clock strictly after commit 3, so history
    never reorders.  ``pre_first_raises``: a probe before the first
    commit is an error, not an empty table."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_ts_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    t = lk.Transaction(path, commit_ts=1000.0)
    t.append(ev.repartition(4))
    t.commit()
    t = lk.Transaction(path, commit_ts=2000.0)
    t.delete_where(spark, F.col("value") < 100.0)
    t.commit()
    t = lk.Transaction(path, commit_ts=3000.0)
    t.append(
        lk.read_table(spark, path)
        .filter(F.col("event_id") % 101 == 0)
        .select(
            (-F.col("event_id")).alias("event_id"),
            "event_type",
            (F.col("value") * 2).alias("value"),
        )
    )
    t.commit()
    # a writer with a BACKWARD wall clock (500 < every prior commit):
    # metadata-only, so the table's DATA at v4 equals v3 and the probe
    # at 9999 exercises the clamp without touching the oracle
    t = lk.Transaction(path, commit_ts=500.0)
    t.enable_cdf()
    t.commit()

    ts4 = lk._read_commit(path, 4)["ts"]
    monotonic_clocks = (
        ts4 > lk._read_commit(path, 3)["ts"] == 3000.0
        and lk.version_at_timestamp(path, 2500.0) == 2
        and lk.version_at_timestamp(path, 9999.0) == 4
    )
    try:
        lk.version_at_timestamp(path, 1.0)
        pre_first_raises = False
    except ValueError:
        pre_first_raises = True

    def probe(label: str, ts: float) -> DataFrame:
        return (
            lk.read_table(spark, path, timestamp=ts)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(_micros(F.col("value")))
                .cast("long")
                .alias("value_micros"),
            )
            .withColumn("probe", F.lit(label))
        )

    return (
        probe("at_1500", 1500.0)
        .union(probe("at_2500", 2500.0))
        .union(probe("at_9999", 9999.0))
        .select("probe", "n_rows", "value_micros")
        .withColumn("monotonic_clocks", F.lit(bool(monotonic_clocks)))
        .withColumn("pre_first_raises", F.lit(bool(pre_first_raises)))
        .orderBy("probe")
    )


@query(
    "q_lakehouse_rename_drop",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS balance
      FROM customer
    ),
    app AS (
      SELECT -k AS k, balance * 2 AS balance FROM base WHERE k % 13 = 0
    ),
    uni AS (
      SELECT k, balance, CAST(NULL AS VARCHAR) AS seg FROM base
      UNION ALL
      SELECT k, balance, CAST(NULL AS VARCHAR) FROM app
      UNION ALL
      SELECT -999999, 1000.0, 'REBORN'
    ),
    fin AS (SELECT * FROM uni WHERE NOT (balance < 100.0))
    SELECT COALESCE(seg, '_none') AS seg_group,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(balance * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS balance_micros,
           TRUE AS rename_metadata_only,
           TRUE AS travel_shows_old_name,
           TRUE AS no_resurrection,
           TRUE AS skipping_translates
    FROM fin
    GROUP BY seg_group
    ORDER BY seg_group
    """,
    tags=("lakehouse", "column-mapping", "alter-table", "extension"),
)
def q_lakehouse_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE RENAME/DROP COLUMN via COLUMN MAPPING — Delta's
    columnMapping.mode=name (:meth:`..lakehouse.Transaction.
    rename_column` / :meth:`drop_column`): both are ONE metadata
    action; at 100 TB a rename costs a KB of JSON, never a rewrite.
    Sequence on the customer dimension: seed (k, bal, seg); RENAME
    bal->balance (``rename_metadata_only`` — the live file set is
    byte-identical across the commit); append NEW-schema delta rows;
    DROP seg; re-ADD a logical ``seg`` (the new column gets an opaque
    physical name, so the dropped column's dead bytes in old files
    cannot resurrect — ``no_resurrection`` pins that the reborn
    column holds ONLY its own writes); copy-on-write delete
    (rewrites shed dropped bytes file-by-file).  Time travel below
    the rename still shows the OLD logical schema
    (``travel_shows_old_name``), and data skipping translates
    logical predicate names to the physical footer-stats keys
    (``skipping_translates`` — an impossible bound on the RENAMED
    name prunes every file).  The final aggregate is recomputed
    relationally by the oracle."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_colmap_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    t = lk.Transaction(path)
    t.append(base.repartition(4))
    t.commit()  # v1

    _v, files_before = lk.snapshot(path)
    t = lk.Transaction(path)
    t.rename_column("bal", "balance")
    t.commit()  # v2
    rename_metadata_only = lk.snapshot(path)[1] == files_before

    t = lk.Transaction(path)
    t.append(
        base.filter(F.col("k") % 13 == 0).select(
            (-F.col("k")).alias("k"),
            (F.col("bal") * 2).alias("balance"),
            F.col("seg"),
        )
    )
    t.commit()  # v3
    t = lk.Transaction(path)
    t.drop_column("seg")
    t.commit()  # v4
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(-999999, 1000.0, "REBORN")], "k long, balance double, seg string"
        ),
        evolve_schema=True,
    )
    t.commit()  # v5
    t = lk.Transaction(path)
    t.delete_where(spark, F.col("balance") < 100.0)
    t.commit()  # v6

    travel_shows_old_name = lk.read_table(spark, path, version=1).columns == [
        "k",
        "bal",
        "seg",
    ]
    seg_vals = {
        r.seg
        for r in lk.read_table(spark, path).select("seg").distinct().collect()
    }  # bounded: the reborn marker + NULL
    no_resurrection = seg_vals <= {None, "REBORN"}
    skipping_translates = (
        lk.prune_files(path, [("balance", "<", -100000.0)])[1] == []
    )

    return (
        lk.read_table(spark, path)
        .groupBy(F.coalesce(F.col("seg"), F.lit("_none")).alias("seg_group"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_micros(F.col("balance")))
            .cast("long")
            .alias("balance_micros"),
        )
        .withColumn(
            "rename_metadata_only", F.lit(bool(rename_metadata_only))
        )
        .withColumn(
            "travel_shows_old_name", F.lit(bool(travel_shows_old_name))
        )
        .withColumn("no_resurrection", F.lit(bool(no_resurrection)))
        .withColumn("skipping_translates", F.lit(bool(skipping_translates)))
        .orderBy("seg_group")
    )


@query(
    "q_lakehouse_replace_where",
    oracle="""
    WITH bound AS (SELECT (MAX(event_id) // 4) + 1 AS b FROM events),
    fin AS (
      SELECT event_type,
             CASE WHEN event_id < b THEN value * 10 ELSE value END AS value
      FROM events, bound
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS slice_pruned_to_one_file,
           TRUE AS smuggle_rejected,
           TRUE AS rerun_idempotent,
           TRUE AS metrics_recorded
    FROM fin
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "replace-where", "backfill", "extension"),
)
def q_lakehouse_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE ... replaceWhere — the idempotent BACKFILL
    (:meth:`..lakehouse.Transaction.replace_where`): re-run slice 0's
    pipeline (values ×10) and atomically swap that slice.  The
    canonical 100 TB operation: day D recomputes, days E..Z never
    move, and no reader sees a window with D missing.

    Audits pinned by the oracle: ``slice_pruned_to_one_file`` — the
    delete half consulted add-action stats FIRST, so only the one
    file covering the slice entered the transaction's read set (on a
    day-clustered table that is one day's files, not the table);
    ``smuggle_rejected`` — a backfill carrying an out-of-slice row
    raises before anything stages; ``rerun_idempotent`` — running the
    SAME backfill again lands the same table (the second run's
    aggregate equals the first's, which the oracle recomputes);
    ``metrics_recorded`` — the commit's operationMetrics carry the
    slice's row counts and DESCRIBE HISTORY names the operation
    ``replace_where``."""
    import json

    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_rw_{_tag(sf_dir)}")
    ev, bound = _seed_ranged_events(spark, sf_dir, path, n_files=4)
    corrected = ev.filter(F.col("event_id") < bound).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        (F.col("value") * 10).alias("value"),
    )
    pred = [("event_id", "<", bound)]
    t = lk.Transaction(path)
    t.replace_where(spark, pred, corrected.coalesce(1))
    slice_pruned_to_one_file = len(t.read_files) == 1
    t.commit()

    try:
        t_bad = lk.Transaction(path)
        t_bad.replace_where(
            spark,
            pred,
            corrected.limit(1).select(
                (F.col("event_id") + 10 * bound).alias("event_id"),
                "ts",
                "user_id",
                "event_type",
                "value",
            ),
        )
        smuggle_rejected = False
    except ValueError:
        smuggle_rejected = True

    agg_of = lambda df: df.groupBy("event_type").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
    )
    first = {tuple(r) for r in agg_of(lk.read_table(spark, path)).collect()}
    t = lk.Transaction(path)
    t.replace_where(spark, pred, corrected.coalesce(1))
    t.commit()
    final = agg_of(lk.read_table(spark, path))
    rerun_idempotent = {tuple(r) for r in final.collect()} == first

    hist = {
        r.operation: json.loads(r.metrics)
        for r in lk.describe_history(spark, path).collect()
        if r.metrics
    }
    m = hist.get("replace_where", {})
    metrics_recorded = (
        m.get("rows_deleted", -1) == m.get("rows_appended", -2) > 0
    )
    return (
        final.withColumn(
            "slice_pruned_to_one_file", F.lit(bool(slice_pruned_to_one_file))
        )
        .withColumn("smuggle_rejected", F.lit(bool(smuggle_rejected)))
        .withColumn("rerun_idempotent", F.lit(bool(rerun_idempotent)))
        .withColumn("metrics_recorded", F.lit(bool(metrics_recorded)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_generated_partition",
    oracle="""
    WITH lo AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
    fin AS (
      SELECT CAST(ts AS DATE) AS day, event_type, value
      FROM events, lo
      WHERE CAST(ts AS DATE) < d0 + 8
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(4 AS INT) AS files_total,
           CAST(1 AS INT) AS files_scanned,
           TRUE AS computed_on_append,
           TRUE AS smuggle_rejected
    FROM fin
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "generated-columns", "data-skipping", "extension"),
)
def q_lakehouse_generated_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GENERATED COLUMNS + data skipping = partition-pruning semantics
    without a partition layout (:meth:`..lakehouse.Transaction.
    set_generated_column`, Delta's GENERATED ALWAYS AS): declare
    ``day = CAST(ts AS DATE)`` on the EMPTY table, append four
    week-ranged event batches that each OMIT the column — the engine
    computes it on every append, the footer stats bound it per file,
    and a ``day < first+8`` read opens exactly ONE of the four files
    (``files_total=4, files_scanned=1`` pinned by the oracle; at
    100 TB this is the time-slice read every event table serves).

    ``computed_on_append``: zero rows violate the generation
    invariant across all four appends; ``smuggle_rejected``: an
    append that PROVIDES a wrong day value is rejected whole-batch
    before anything stages (cell-level null-safe-equality validation
    — Delta's contract).  The returned per-type aggregate of the
    pruned read is recomputed relationally by the oracle."""
    import datetime

    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_gen_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    d0 = ev.agg(F.min(F.col("ts").cast("date"))).collect()[0][0]

    t = lk.Transaction(path)
    t.set_generated_column(spark, "day", "CAST(ts AS DATE)", "date")
    t.commit()
    for i in range(4):
        lo = d0 + datetime.timedelta(days=8 * i)
        hi = d0 + datetime.timedelta(days=8 * (i + 1))
        t = lk.Transaction(path)
        t.append(
            ev.filter(
                (F.col("ts").cast("date") >= F.lit(lo))
                & (F.col("ts").cast("date") < F.lit(hi))
            ).coalesce(1)
        )
        t.commit()

    computed_on_append = (
        lk.read_table(spark, path)
        .filter("day <> CAST(ts AS DATE)")
        .count()
        == 0
    )
    try:
        t_bad = lk.Transaction(path)
        t_bad.append(
            ev.limit(1).withColumn(
                "day", F.lit(datetime.date(2035, 1, 1))
            )
        )
        smuggle_rejected = False
    except lk.ConstraintViolation:
        smuggle_rejected = True

    cut = d0 + datetime.timedelta(days=8)
    _v, kept, total = lk.prune_files(path, [("day", "<", cut)])
    return (
        lk.read_table(spark, path, predicate=[("day", "<", cut)])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("day").alias("n_days"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn("files_total", F.lit(total).cast("int"))
        .withColumn("files_scanned", F.lit(len(kept)).cast("int"))
        .withColumn("computed_on_append", F.lit(bool(computed_on_append)))
        .withColumn("smuggle_rejected", F.lit(bool(smuggle_rejected)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_identity",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS ids_unique,
           TRUE AS ids_on_lattice,
           TRUE AS cross_commit_monotonic,
           TRUE AS always_as_rejected
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "identity-columns", "extension"),
)
def q_lakehouse_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY COLUMNS — GENERATED ALWAYS AS IDENTITY
    (:meth:`..lakehouse.Transaction.set_identity_column`, Delta
    identity): the engine assigns the surrogate key ``row_id =
    1000 + 7·k``, fully DISTRIBUTED (per-partition offset blocks off
    ``monotonically_increasing_id`` — no global row-number shuffle,
    no driver loop; at 100 TB id assignment must not serialize the
    write path).  Three event-slice appends; the oracle pins:
    ``ids_unique`` (COUNT(DISTINCT) equals COUNT over all appends),
    ``ids_on_lattice`` (every value ≡ start mod step — gaps allowed,
    the documented contract; density is NOT promised),
    ``cross_commit_monotonic`` (everything in append N+1 outranks
    everything in append N — the metadata high-water advanced from
    the staged footer stats, no extra pass), and
    ``always_as_rejected`` (a batch supplying the column is refused).
    The returned per-type aggregate is recomputed relationally."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_idn_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    bound = mx // 3 + 1
    t = lk.Transaction(path)
    t.set_identity_column("row_id", start=1000, step=7)
    t.commit()
    commit_vs = []
    for i in range(3):
        t = lk.Transaction(path)
        t.append(
            ev.filter(
                (F.col("event_id") >= i * bound)
                & (F.col("event_id") < (i + 1) * bound)
            ).repartition(4)
        )
        commit_vs.append(t.commit())
    # the three per-commit (min,max) probes fold into ONE grouped job
    # after the loop (guide §7.3 — per-action driver planning cost): appends never rewrite rows and the
    # event_id slices are disjoint, so slice i of the FINAL table is
    # exactly commit i's rows — per-slice min/max identical to the
    # former post-commit probes.
    srows = {
        r.slice: (r.lo, r.hi)
        for r in (
            lk.read_table(spark, path)
            .groupBy(
                F.when(F.col("event_id") < bound, 0)
                .when(F.col("event_id") < 2 * bound, 1)
                .otherwise(2)
                .alias("slice")
            )
            .agg(F.min("row_id").alias("lo"), F.max("row_id").alias("hi"))
            .collect()
        )
    }
    edges = [srows.get(i, (None, None)) for i in range(3)]
    # invariant anchor (VERDICT r14): the fold above leans on the
    # append-only invariant it helps audit.  Check it against
    # evidence INDEPENDENT of the final-table scan — each commit's
    # add-action footer stats (row_id min/max recorded at write
    # time; driver-side JSON, zero Spark jobs) must reproduce the
    # table-derived slice edges exactly.
    log_edges = []
    for v in commit_vs:
        rid = [
            (a.get("stats") or {}).get("cols", {}).get("row_id")
            for a in lk._read_commit(path, v)["actions"]
            if a["op"] == "add"
        ]
        log_edges.append(
            (min(r["min"] for r in rid), max(r["max"] for r in rid))
            if rid and all(rid)
            else (None, None)
        )

    df = lk.read_table(spark, path)
    tot = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("row_id").alias("nd"),
        F.sum((((F.col("row_id") - 1000) % 7) != 0).cast("int")).alias("off"),
    ).collect()[0]
    ids_unique = tot.n == tot.nd
    ids_on_lattice = tot.off == 0
    cross_commit_monotonic = (
        all(edges[i][1] < edges[i + 1][0] for i in range(2))
        and edges == log_edges
    )
    try:
        t_bad = lk.Transaction(path)
        t_bad.append(
            ev.limit(1).withColumn("row_id", F.lit(5).cast("long"))
        )
        always_as_rejected = False
    except ValueError:
        always_as_rejected = True

    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn("ids_unique", F.lit(bool(ids_unique)))
        .withColumn("ids_on_lattice", F.lit(bool(ids_on_lattice)))
        .withColumn(
            "cross_commit_monotonic", F.lit(bool(cross_commit_monotonic))
        )
        .withColumn("always_as_rejected", F.lit(bool(always_as_rejected)))
        .orderBy("event_type")
    )
