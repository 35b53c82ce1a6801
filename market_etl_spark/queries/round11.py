"""Round-11 additions: the commit log as a SOURCE.

VERDICT r10 ranked the remaining lakehouse gap: the transactional
table could be written exactly-once (``q_streaming_lakehouse_sink``)
but not tailed — the change-data-feed ran over the separate versioned
snapshot store, not the log.  Round 11 closes the loop:

- ``q_lakehouse_change_feed`` — CDF derived from the commit log's own
  actions (:func:`..lakehouse.read_changes`, the Delta
  ``readChangeFeed`` shape): appends, MOR deletes, MOR updates,
  CDF-recorded copy-on-write deletes, a data-neutral compaction —
  each commit's records derived delta-sized, driving an IVM consumer
  that must equal the direct final aggregate.
- ``q_streaming_lakehouse_source`` — the read half of the
  exactly-once pair: a consumer TAILS the log commit-by-commit,
  folds each delta into a downstream aggregate table under its own
  txn identity, and a crash-rewound offset replays without
  double-applying.
- ``q_lakehouse_update_mor`` — UPDATE under the log: position-delete
  + reinsert in one commit, the update-vs-update conflict
  (reinserts cannot commute with concurrent DVs), and the retry
  serializing to the oracle's CASE-chain recompute.
- ``q_lakehouse_restore`` — RESTORE TO VERSION as one metadata-only
  commit: history preserved (time travel to the pre-restore state
  still works), DESCRIBE HISTORY names every operation, and the
  restore itself is change-feed-derivable.
- ``q_mor_compaction_updates`` — the ADVICE r10 fix proven:
  DV-aware compaction folds committed UPDATE reinserts into the
  rewrite bins (an update that moved the cluster key included)
  instead of silently dropping every updated row.
- ``q_lakehouse_merge`` — MERGE INTO as one transaction: Delta's
  find-touched-files probe + file-pruned copy-on-write rewrite +
  delta-sized insert append, CDC-recorded under CDF.
- ``q_lakehouse_clone`` — shallow clone: fork the table as one
  metadata commit (absolute file references, zero data copied),
  divergence isolated to the clone's own root.

Reference parity note: the reference pipeline (jobs/*/*.py) is
append-only with no version, update or subscription story; these are
the engine extensions a 100 TB multi-writer lakehouse feeds its
incremental consumers with.
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


@query(
    "q_lakehouse_change_feed",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer
    ),
    appended AS (
      SELECT -k AS k, 'NEWSEG' AS seg, bal * 2 AS bal
      FROM base WHERE k % 11 = 0
    ),
    v2_all AS (SELECT * FROM base UNION ALL SELECT * FROM appended),
    del3 AS (SELECT * FROM v2_all WHERE k % 7 = 0),
    live3 AS (SELECT * FROM v2_all WHERE k % 7 <> 0),
    upd4 AS (SELECT * FROM live3 WHERE seg = 'BUILDING'),
    live4 AS (
      SELECT k, seg,
             bal + CASE WHEN seg = 'BUILDING' THEN 100.0 ELSE 0.0 END AS bal
      FROM live3
    ),
    del6 AS (SELECT * FROM live4 WHERE bal < 1000.0),
    feed AS (
      SELECT 1 AS commit_version, 'insert' AS change_type, bal FROM base
      UNION ALL
      SELECT 2, 'insert', bal FROM appended
      UNION ALL
      SELECT 3, 'delete', bal FROM del3
      UNION ALL
      SELECT 4, 'update_preimage', bal FROM upd4
      UNION ALL
      SELECT 4, 'update_postimage', bal + 100.0 FROM upd4
      UNION ALL
      SELECT 6, 'delete', bal FROM del6
    )
    SELECT CAST(commit_version AS INT) AS commit_version,
           change_type,
           CAST(COUNT(*) AS BIGINT) AS n_changes,
           CAST(SUM(CAST(ROUND(bal * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS bal_micros,
           TRUE AS ivm_consistent,
           TRUE AS neutral_commits_silent
    FROM feed
    GROUP BY commit_version, change_type
    ORDER BY commit_version, change_type
    """,
    tags=("lakehouse", "cdf", "transactions", "ivm", "extension"),
)
def q_lakehouse_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over the COMMIT LOG — VERDICT r10 item 1:
    :func:`..lakehouse.read_changes` derives full-row change records
    from the log's own actions, delta-sized (only files an in-range
    commit references are read — never the table).  Seven commits on
    the customer dimension:

    v1 seed append; v2 append NEGATED-key NEWSEG rows (every 11th
    key — negation keeps the domain disjoint at every SF); v3 MOR
    DELETE every 7th key (positions derived back to preimages); v4
    MOR UPDATE (+100 to BUILDING balances; preimage from the logged
    DV, postimage from the logged reinsert file); v5 ``enable_cdf``
    (metadata only); v6 copy-on-write DELETE bal < 1000 (served from
    the CDF-recorded change-data sidecars — the commit a rewrite's
    add/remove actions alone cannot describe); v7 compaction (the
    dataChange=false analog — emits NOTHING).

    Audits the oracle pins TRUE: ``ivm_consistent`` — an incremental
    consumer replaying the signed feed from empty equals the direct
    final-table aggregate (count and exact micros);
    ``neutral_commits_silent`` — versions 5 and 7 contribute zero
    records.  The oracle recomputes every change set relationally
    from the same step definitions."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_cdf_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    t = lk.Transaction(path)
    t.append(base.repartition(4))
    t.commit()  # v1
    t = lk.Transaction(path)
    t.append(
        base.filter(F.col("k") % 11 == 0).select(
            (-F.col("k")).alias("k"),
            F.lit("NEWSEG").alias("seg"),
            (F.col("bal") * 2).alias("bal"),
        )
    )
    t.commit()  # v2
    t = lk.Transaction(path)
    t.delete_where_mor(spark, F.col("k") % 7 == 0)
    t.commit()  # v3
    t = lk.Transaction(path)
    t.update_where_mor(
        spark, F.col("seg") == "BUILDING", {"bal": F.col("bal") + 100.0}
    )
    t.commit()  # v4
    t = lk.Transaction(path)
    t.enable_cdf()
    t.commit()  # v5
    t = lk.Transaction(path)
    t.delete_where(spark, F.col("bal") < 1000.0)
    t.commit()  # v6
    t = lk.Transaction(path)
    t.compact(spark, n_files=2)
    t.commit()  # v7

    feed = lk.read_changes(spark, path, 0, 7)

    # incremental consumer: signed replay from EMPTY must land exactly
    # on the final table's aggregate.  THREE audit actions folded into
    # ONE job (guide §7.3 — per-action driver planning cost): feed delta, final-table baseline and the
    # neutral-commit probe are union-tagged with a per-row weight (feed
    # rows carry the change sign, the others weight 1); one grouped
    # (sum(w), sum(w*micros)) reduction reproduces the former collects
    # value-identically (count == sum of unit weights).
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    from functools import reduce as _reduce

    branches = [
        feed.select(
            F.lit(0).alias("s"), sign.alias("w"), _micros(F.col("bal")).alias("m")
        ),
        lk.read_table(spark, path).select(
            F.lit(1).alias("s"),
            F.lit(1).alias("w"),
            _micros(F.col("bal")).alias("m"),
        ),
        feed.filter(F.col("_commit_version").isin(5, 7)).select(
            F.lit(2).alias("s"),
            F.lit(1).alias("w"),
            _micros(F.col("bal")).alias("m"),
        ),
    ]
    rows = (
        _reduce(DataFrame.unionByName, branches)
        .groupBy("s")
        .agg(F.sum("w").alias("dn"), F.sum(F.col("w") * F.col("m")).alias("dm"))
        .collect()
    )
    g = {r.s: (r.dn, r.dm) for r in rows}
    # an empty union branch contributes no group row — default like
    # the other folds so an empty feed yields a False verdict, not a
    # KeyError (ADVICE r14)
    d, fin = g.get(0, (0, None)), g.get(1, (0, None))
    ivm_consistent = (d[0] == fin[0]) and (d[1] == fin[1])
    neutral_commits_silent = g.get(2, (0, None))[0] == 0

    return (
        feed.groupBy(
            F.col("_commit_version").cast("int").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(_micros(F.col("bal"))).cast("long").alias("bal_micros"),
        )
        .withColumn("ivm_consistent", F.lit(bool(ivm_consistent)))
        .withColumn(
            "neutral_commits_silent", F.lit(bool(neutral_commits_silent))
        )
        .orderBy("commit_version", "change_type")
    )


@query(
    "q_lakehouse_update_mor",
    oracle="""
    WITH after_a AS (
      SELECT event_type,
             value + CASE WHEN event_type = 'click' THEN 1000.0
                          ELSE 0.0 END AS value
      FROM events
    ),
    after_b AS (
      SELECT event_type,
             value * CASE WHEN value >= 300.0 THEN 2.0 ELSE 1.0 END AS value
      FROM after_a
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS conflict_detected,
           TRUE AS cardinality_preserved,
           TRUE AS no_base_rewrite
    FROM after_b
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "merge-on-read", "transactions", "extension"),
)
def q_lakehouse_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTIONAL MERGE-ON-READ UPDATE — ``update_where_mor``:
    position-delete + reinsert staged in ONE commit, no base file
    rewritten (the logged sibling of ``q_merge_on_read_updates``).
    Two writers race from the same snapshot:

    A: UPDATE clicks SET value += 1000; B: UPDATE value >= 300 SET
    value *= 2.  Both touch shared files; A commits first and B's
    commit raises ``CommitConflict`` — updates derive NEW row images
    from what they read, so unlike plain MOR deletes they cannot
    commute with a concurrent DV on the same files (B's reinserts,
    staged without A's vector, would resurrect A's preimages and
    double the rows).  B's retry re-runs on the fresh snapshot, so
    its predicate sees A's result (clicks pushed over 300 now double
    too) — the serial order the oracle's CASE chain recomputes.

    Audits the oracle pins TRUE: ``conflict_detected``;
    ``cardinality_preserved`` (updates never change the row count);
    ``no_base_rewrite`` (all original data files still live — the
    update wrote only sidecars and reinsert files)."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_upd_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    t0 = lk.Transaction(path)
    t0.append(e.repartition(8))
    t0.commit()
    n0 = lk.read_table(spark, path).count()
    base_files = set(lk.snapshot(path)[1])

    a = lk.Transaction(path)  # both begin at v1
    b = lk.Transaction(path)
    a.update_where_mor(
        spark, F.col("event_type") == "click", {"value": F.col("value") + 1000.0}
    )
    b.update_where_mor(
        spark, F.col("value") >= 300.0, {"value": F.col("value") * 2.0}
    )
    a.commit()
    conflict_detected = False
    try:
        b.commit()
    except lk.CommitConflict:
        conflict_detected = True
    b2 = lk.Transaction(path)  # the caller-side retry contract
    b2.update_where_mor(
        spark, F.col("value") >= 300.0, {"value": F.col("value") * 2.0}
    )
    b2.commit()

    final = lk.read_table(spark, path)
    cardinality_preserved = final.count() == n0
    no_base_rewrite = base_files <= set(lk.snapshot(path)[1])

    return (
        final.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn("conflict_detected", F.lit(bool(conflict_detected)))
        .withColumn(
            "cardinality_preserved", F.lit(bool(cardinality_preserved))
        )
        .withColumn("no_base_rewrite", F.lit(bool(no_base_rewrite)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_restore",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS bal_micros,
           TRUE AS history_preserved,
           TRUE AS history_named,
           TRUE AS restore_feed_consistent
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
    tags=("lakehouse", "time-travel", "restore", "extension"),
)
def q_lakehouse_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE ... TO VERSION — one metadata-only commit resets
    the live file/DV state to the target version (Delta RESTORE; no
    data movement, the historical files are still referenced), and
    HISTORY IS PRESERVED: the restore is itself version 4, so time
    travel to the pre-restore v3 still works.  Scenario on the
    supplier dimension: v1 seed; v2 MOR-deletes negative balances;
    v3 appends synthetic negated-key rows; v4 restores to v1 — the
    final table must equal the plain supplier aggregate (the oracle
    never sees v2/v3 at all, which IS the restore contract).

    Audits pinned TRUE: ``history_preserved`` — v3's count under
    time travel equals its pre-restore value and differs from v1's;
    ``history_named`` — DESCRIBE HISTORY reports the four operations
    (append, delete_where_mor, append, restore) in order;
    ``restore_feed_consistent`` — the restore commit is
    change-feed-derivable and its signed replay moves v3's aggregate
    exactly back to v1's (deleted-row resurrection via the dropped
    DV counted as inserts, the synthetic appends as deletes)."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_restore_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", F.col("s_acctbal").cast("double")
    )
    t = lk.Transaction(path)
    t.append(s.repartition(4))
    t.commit()  # v1
    t = lk.Transaction(path)
    # key-based predicate: non-empty at EVERY scale factor (a value
    # predicate like acctbal < 0 can match nothing in a 10-supplier
    # sf0.001 sample and an empty transaction refuses to commit)
    t.delete_where_mor(spark, F.col("s_suppkey") % 3 == 0)
    t.commit()  # v2
    t = lk.Transaction(path)
    t.append(
        s.filter(F.col("s_nationkey") % 5 == 0).select(
            (-F.col("s_suppkey")).alias("s_suppkey"),
            "s_nationkey",
            (F.col("s_acctbal") * 3).alias("s_acctbal"),
        )
    )
    t.commit()  # v3

    # Audit folds (guide §7.3 — per-action driver planning cost): the two PRE-restore baselines share one
    # job and the two POST-restore probes share another (5 actions → 3;
    # the history collect is metadata-tiny).  The v3 baseline must stay
    # a PRE-restore action — history_preserved proves post-restore time
    # travel reproduces a value measured before the restore existed.
    from functools import reduce as _reduce

    def _fold(branches):
        rows = (
            _reduce(DataFrame.unionByName, branches)
            .groupBy("s")
            .agg(
                F.sum("w").alias("n"),
                F.sum(F.col("w") * F.col("m")).alias("m"),
            )
            .collect()
        )
        d = {r.s: (r.n, r.m) for r in rows}
        # an empty side contributes no group row; mirror the former
        # global-agg result (count 0, null sum)
        return {s: d.get(s, (0, None)) for s in range(len(branches))}

    unit = lambda df, s: df.select(  # noqa: E731
        F.lit(s).alias("s"),
        F.lit(1).alias("w"),
        _micros(F.col("s_acctbal")).alias("m"),
    )
    g = _fold(
        [
            unit(lk.read_table(spark, path, version=1), 0),
            unit(lk.read_table(spark, path, version=3), 1),
        ]
    )
    at_v1, at_v3 = g[0], g[1]

    assert lk.restore_table(spark, path, 1) == 4

    final = lk.read_table(spark, path)
    feed = lk.read_changes(spark, path, 3, 4)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    g2 = _fold(
        [
            unit(lk.read_table(spark, path, version=3), 0),
            feed.select(
                F.lit(1).alias("s"),
                sign.alias("w"),
                _micros(F.col("s_acctbal")).alias("m"),
            ),
        ]
    )
    at_v3_after, d = g2[0], g2[1]
    history_preserved = at_v3_after == at_v3 and at_v3[0] != at_v1[0]
    ops = [
        r.operation
        for r in lk.describe_history(spark, path)
        .orderBy("version")
        .collect()
    ]
    history_named = ops == [
        "append", "delete_where_mor", "append", "restore"
    ]
    restore_feed_consistent = (
        at_v3[0] + d[0] == at_v1[0] and at_v3[1] + d[1] == at_v1[1]
    )

    return (
        final.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_micros(F.col("s_acctbal"))).cast("long").alias("bal_micros"),
        )
        .withColumn("history_preserved", F.lit(bool(history_preserved)))
        .withColumn("history_named", F.lit(bool(history_named)))
        .withColumn(
            "restore_feed_consistent", F.lit(bool(restore_feed_consistent))
        )
        .orderBy("s_nationkey")
    )


@query(
    "q_mor_compaction_updates",
    oracle="""
    WITH live AS (
      SELECT event_type, value, day(ts) AS day FROM events
      WHERE NOT (value BETWEEN 100 AND 400)
    ),
    updated AS (
      SELECT event_type,
             CASE WHEN day <= 10 THEN value + 1000.0 ELSE value END AS value
      FROM live
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS no_sidecars,
           TRUE AS updates_carried
    FROM updated
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("merge-on-read", "compaction", "maintenance", "extension"),
)
def q_mor_compaction_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-AWARE COMPACTION WITH COMMITTED UPDATES — the ADVICE r10
    medium fix proven end-to-end: a manifested generation takes a MOR
    delete (value in [100,400]) then a MOR UPDATE (+1000 to day ≤ 10
    rows — which MOVES the cluster key past most base ranges), and
    ``compact_manifested(apply_deletes=True)`` must fold the
    committed reinsert rows INTO the rewrite bins (routed by
    cluster-key range) while subtracting both sidecars' positions.
    Before the fix the updated rows' base positions were subtracted
    but the reinserts never added — every updated row silently lost.

    Audits the oracle pins TRUE: ``no_sidecars`` (the compacted
    generation carries no ``_deletes``/``_updates`` and a PLAIN read
    equals the pre-compaction logical view — count and exact micros);
    ``updates_carried`` (the compacted generation holds exactly the
    oracle's count of updated rows)."""
    from .. import mor
    from ..sinks import compact_manifested, write_manifested

    src = str(_SCRATCH / f"morupd_src_{_tag(sf_dir)}")
    dest = str(_SCRATCH / f"morupd_dest_{_tag(sf_dir)}")
    shutil.rmtree(src, ignore_errors=True)
    e = load(spark, sf_dir, "events").select(
        "event_type", "value", F.dayofmonth("ts").alias("day")
    )
    write_manifested(e, src, "value", n_files=16)
    data = f"{src}/data"
    mor.write_deletion_vector(spark, data, F.col("value").between(100, 400))
    n_upd = mor.write_update_vector(
        spark, data, F.col("day") <= 10, {"value": F.col("value") + 1000.0}
    )
    logical = mor.read_with_deletes(spark, data)

    compact_manifested(spark, src, dest, "value", n_bins=4, apply_deletes=True)

    # THREE audit actions folded into ONE job (guide §7.3: the drill
    # wall is per-action fixed cost): the pre-compaction logical view
    # (src + sidecars, untouched by the generation move), the compacted
    # plain read, and the reinsert-presence probe are union-tagged and
    # reduced by one grouped aggregate — value-identical per branch to
    # the former sequential collects.
    from functools import reduce as _reduce

    plain = spark.read.parquet(f"{dest}/data")
    branches = [
        logical.select(F.lit(0).alias("s"), "value"),
        plain.select(F.lit(1).alias("s"), "value"),
        plain.filter(F.col("value") >= 1000.0).select(
            F.lit(2).alias("s"), "value"
        ),
    ]
    rows = (
        _reduce(DataFrame.unionByName, branches)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_micros(F.col("value"))).alias("m"),
        )
        .collect()
    )
    d = {r.s: (r.n, r.m) for r in rows}
    no_sidecars = (
        not pathlib.Path(f"{dest}/data/_deletes").exists()
        and not pathlib.Path(f"{dest}/data/_updates").exists()
        and d.get(0, (0, None)) == d.get(1, (0, None))
    )
    updates_carried = (
        d.get(2, (0, None))[0]
        >= n_upd  # every reinsert row present (value+1000 ≥ 1000)
    )

    return (
        plain.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn("no_sidecars", F.lit(bool(no_sidecars)))
        .withColumn("updates_carried", F.lit(bool(updates_carried)))
        .orderBy("event_type")
    )


@query(
    "q_streaming_lakehouse_source",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS tailed_per_commit,
           TRUE AS replay_skipped
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "lakehouse", "cdf", "exactly-once", "ivm", "extension"),
)
def q_streaming_lakehouse_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SOURCE over the commit log — the READ half of the
    exactly-once pair (`q_streaming_lakehouse_sink` is the write
    half): a consumer TAILS the table's commits, turning each new
    version's change feed (:func:`..lakehouse.read_changes` — delta-
    sized, never the table) into a signed aggregate delta folded into
    a DOWNSTREAM commit-log table under the consumer's own txn
    identity ``(app="ivm", version=source_version)`` — the IVM-over-
    CDF pattern Delta serves with ``readStream`` + ``txnAppId``.

    The source is fed by a real Structured Streaming foreachBatch
    writer (4 micro-batches, exactly-once txn identities), and the
    consumer polls after every committed source version — writer and
    reader genuinely interleave.  Then the consumer CRASHES and
    rewinds its offset two versions: the replayed polls recompute
    their deltas but their downstream commits carry already-landed
    txn versions and SKIP — the downstream aggregate is unchanged
    (``replay_skipped``).  ``tailed_per_commit`` pins that the
    downstream table holds exactly one delta commit per source
    version.  The final rolled-up downstream aggregate must equal
    the oracle's plain full-table aggregate — the IVM consumer never
    read the source table directly, only its feed."""
    from .. import lakehouse as lk
    from ..streaming import read_events_stream_multibatch

    tag = _tag(sf_dir)
    src = str(_SCRATCH / f"lakehouse_src_{tag}")
    dst = str(_SCRATCH / f"lakehouse_ivm_{tag}")
    ck = str(_SCRATCH / f"lakehouse_src_ck_{tag}")
    for p in (src, dst, ck):
        shutil.rmtree(p, ignore_errors=True)

    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    state = {"offset": 0, "polls": 0}

    def poll() -> None:
        latest = lk.latest_commit(src)
        if latest <= state["offset"]:
            return
        feed = lk.read_changes(spark, src, state["offset"], latest)
        delta = feed.groupBy("event_type").agg(
            F.sum(sign).alias("n_delta"),
            F.sum(sign * _micros(F.col("value"))).alias("micros_delta"),
        )
        t = lk.Transaction(dst, txn_app="ivm", txn_version=latest)
        t.append(delta.coalesce(1))
        # None = this delta already landed (a replayed poll after a
        # crash) — the feed through `latest` is folded in either way,
        # so the offset always advances
        t.commit()
        state["offset"] = latest
        state["polls"] += 1

    def apply(batch_df, batch_id):
        t = lk.Transaction(src, txn_app="events_src", txn_version=batch_id)
        t.append(batch_df.select("event_id", "event_type", "value"))
        if t.commit() is not None:
            poll()  # the consumer tails each landed commit

    (
        read_events_stream_multibatch(spark, sf_dir, n_files=4)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    v_src = lk.latest_commit(src)
    v_dst = lk.latest_commit(dst)
    tailed_per_commit = v_dst == v_src and state["polls"] == v_src

    # the crash: the consumer loses its offset back two versions and
    # replays — the downstream txn identities already landed, so both
    # replayed commits SKIP and nothing double-applies
    state["offset"] = max(0, v_src - 2)
    poll()
    replay_skipped = (
        lk.latest_commit(dst) == v_dst
        and state["offset"] == v_src  # dedupe still advances the offset
    )

    return (
        lk.read_table(spark, dst)
        .groupBy("event_type")
        .agg(
            F.sum("n_delta").cast("long").alias("n_events"),
            F.sum("micros_delta").cast("long").alias("value_micros"),
        )
        .withColumn("tailed_per_commit", F.lit(bool(tailed_per_commit)))
        .withColumn("replay_skipped", F.lit(bool(replay_skipped)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_merge",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value FROM events
    ),
    merged AS (
      SELECT event_id, event_type,
             value + CASE WHEN event_id % 2 = 0 AND event_id < 200
                          THEN 500.0 ELSE 0.0 END AS value
      FROM base
      WHERE NOT (event_id % 2 = 1 AND event_id < 200)
      UNION ALL
      SELECT -(event_id + 1) AS event_id, 'merged' AS event_type,
             value * 3 AS value
      FROM base WHERE event_id % 5 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS merge_exact,
           TRUE AS file_pruned,
           TRUE AS merge_feed_consistent
    FROM merged
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "merge", "transactions", "cdf", "extension"),
)
def q_lakehouse_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO under the commit log — Delta's merge algorithm as
    ONE transaction (:meth:`..lakehouse.Transaction.merge_into`): a
    three-clause merge (matched+predicate DELETE, matched UPDATE
    ``value += 500`` referencing the target alias, NOT-MATCHED
    INSERT) against a range-clustered events table.

    The algorithm's scale shape: ONE find-touched-files probe scan
    (target inner-join broadcast source), then a copy-on-write
    rewrite of ONLY the files containing matches — the update/delete
    keys are confined to ``event_id < 200``, so on the
    ``repartitionByRange(8)`` seed most files are untouched
    (``file_pruned``: removed files < total files, pinned TRUE), and
    the inserts ride the plain append path.

    ``merge_exact`` pins the returned counts against direct
    recomputes; ``merge_feed_consistent`` pins that the CDF-recorded
    merge commit (update pre/post images + deletes in change-data
    sidecars, inserts derived from the append actions) replays the
    table from its pre-merge aggregate to the final one — the oracle
    recomputes the merged table relationally."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_merge_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    t = lk.Transaction(path)
    t.append(e.repartitionByRange(8, F.col("event_id")))
    t.commit()  # v1
    total_files = len(lk.snapshot(path)[1])  # actual seeded file count
    t = lk.Transaction(path)
    t.enable_cdf()
    t.commit()  # v2

    hot = F.col("event_id") < 200
    src = (
        e.filter((F.col("event_id") % 2 == 0) & hot)
        .withColumn("op", F.lit("u"))
        .unionByName(
            e.filter((F.col("event_id") % 2 == 1) & hot).withColumn(
                "op", F.lit("d")
            )
        )
        .unionByName(
            e.filter(F.col("event_id") % 5 == 0)
            .select(
                (-(F.col("event_id") + 1)).alias("event_id"),
                F.lit("merged").alias("event_type"),
                (F.col("value") * 3).alias("value"),
            )
            .withColumn("op", F.lit("i"))
        )
    )
    # FOUR pre-merge audit jobs folded into ONE (guide §7.3 — per-action driver planning cost): the
    # table at v2 holds exactly e's rows (single append), so the three
    # expectation counts are conditional aggregates over the same scan
    # as the pre-merge baseline — values identical to the former
    # separate e.filter(...).count() jobs.
    pre = lk.read_table(spark, path).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_micros(F.col("value"))).alias("m"),
        F.count_if((F.col("event_id") % 2 == 0) & hot).alias("nu"),
        F.count_if((F.col("event_id") % 2 == 1) & hot).alias("nd"),
        F.count_if(F.col("event_id") % 5 == 0).alias("ni"),
    ).collect()[0]
    n_upd, n_del, n_ins = pre.nu, pre.nd, pre.ni

    t = lk.Transaction(path)
    counts = t.merge_into(
        spark,
        src,
        ["event_id"],
        when_matched_update={"value": F.col("t.value") + 500.0},
        when_matched_delete=F.col("s.op") == "d",
        when_not_matched_insert=True,
    )
    v = t.commit()  # v3
    merge_exact = counts == {
        "updated": n_upd, "deleted": n_del, "inserted": n_ins
    }
    removed = [a for a in t.actions if a["op"] == "remove"]
    file_pruned = 0 < len(removed) < total_files

    final = lk.read_table(spark, path)
    # post-merge audit fold (guide §7.3 — per-action driver planning cost): final-table baseline and the
    # signed CDF delta union-tagged into ONE grouped job (feed rows
    # carry the change sign as weight, table rows weight 1) — the
    # established pattern of q_lakehouse_change_feed; per-branch
    # (sum(w), sum(w*micros)) equals the former two collects.
    feed = lk.read_changes(spark, path, v - 1, v)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    rows = (
        final.select(
            F.lit(0).alias("s"),
            F.lit(1).alias("w"),
            _micros(F.col("value")).alias("m"),
        )
        .unionByName(
            feed.select(
                F.lit(1).alias("s"),
                sign.alias("w"),
                _micros(F.col("value")).alias("m"),
            )
        )
        .groupBy("s")
        .agg(F.sum("w").alias("dn"), F.sum(F.col("w") * F.col("m")).alias("dm"))
        .collect()
    )
    g = {r.s: (r.dn, r.dm) for r in rows}
    # missing group row (empty branch) → False verdict, not KeyError
    # (ADVICE r14); a None sum cannot satisfy the arithmetic check
    fin, d = g.get(0, (0, None)), g.get(1, (0, None))
    merge_feed_consistent = (
        None not in (fin[1], d[1])
        and pre.n + d[0] == fin[0]
        and pre.m + d[1] == fin[1]
    )

    return (
        final.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn("merge_exact", F.lit(bool(merge_exact)))
        .withColumn("file_pruned", F.lit(bool(file_pruned)))
        .withColumn(
            "merge_feed_consistent", F.lit(bool(merge_feed_consistent))
        )
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_clone",
    oracle="""
    WITH live AS (
      SELECT o_orderkey AS k, o_custkey AS c,
             CAST(o_totalprice AS DOUBLE) AS p
      FROM orders WHERE o_orderkey % 4 <> 0
    ),
    forked AS (
      SELECT * FROM live WHERE NOT (c % 3 = 0)
      UNION ALL
      SELECT -k AS k, c, p * 2 AS p FROM live WHERE k % 7 = 0
    )
    SELECT CAST(c % 10 AS BIGINT) AS custgrp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(p * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS price_micros,
           TRUE AS zero_copy,
           TRUE AS source_unchanged,
           TRUE AS clone_feed_is_snapshot
    FROM forked
    GROUP BY custgrp
    ORDER BY custgrp
    """,
    tags=("lakehouse", "clone", "time-travel", "extension"),
)
def q_lakehouse_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE (:func:`..lakehouse.clone_table`) — fork a table
    as ONE metadata commit referencing the source's live files by
    absolute path, zero bytes copied (at 100 TB: a dev/test fork for
    the cost of O(files) JSON).  Scenario on orders: the source takes
    a MOR delete (every 4th key — so the clone must pin the LOGICAL
    snapshot, files minus vectors, not the raw files), the clone
    forks, then DIVERGES: a copy-on-write delete (every 3rd custkey)
    whose rewrites land under the clone's OWN root, plus an append of
    negated-key rows.  The final clone state must equal the oracle's
    relational recompute; the source must not observe any of it.

    Audits pinned TRUE: ``zero_copy`` — after cloning, the clone's
    data directory holds no parquet of its own (and after the
    divergence, exactly its own rewrites/appends);
    ``source_unchanged`` — the source's aggregate is bit-identical
    before and after the clone's writes; ``clone_feed_is_snapshot``
    — the clone's v1 change feed is pure inserts equal to the
    source's logical snapshot count (DV-subtracted)."""
    from .. import lakehouse as lk

    src = str(_SCRATCH / f"lakehouse_clsrc_{_tag(sf_dir)}")
    dst = str(_SCRATCH / f"lakehouse_clfork_{_tag(sf_dir)}")
    for p in (src, dst):
        shutil.rmtree(p, ignore_errors=True)
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.col("o_totalprice").cast("double").alias("p"),
    )
    t = lk.Transaction(src)
    t.append(o.repartition(4))
    t.commit()
    t = lk.Transaction(src)
    t.delete_where_mor(spark, F.col("k") % 4 == 0)
    t.commit()
    agg = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.sum(_micros(F.col("p"))).alias("m"),
    ).collect()[0]
    src_before = agg(lk.read_table(spark, src))

    assert lk.clone_table(src, dst) == 1
    data_dir = pathlib.Path(dst) / "data"
    zero_copy = (
        not data_dir.exists()
        or not any(data_dir.glob("*.parquet"))
    )
    # one conditional aggregate instead of two counts (guide §7.3 — per-action driver planning cost)
    feed = lk.read_changes(spark, dst, 0, 1)
    frow = feed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("_change_type") != "insert").alias("n_noins"),
    ).collect()[0]
    clone_feed_is_snapshot = frow.n_noins == 0 and frow.n == src_before.n

    # divergence: CoW delete + append, both under the clone's root
    t = lk.Transaction(dst)
    t.delete_where(spark, F.col("c") % 3 == 0)
    t.commit()
    t = lk.Transaction(dst)
    t.append(
        lk.read_table(spark, dst, version=1)
        .filter(F.col("k") % 7 == 0)
        .select((-F.col("k")).alias("k"), "c", (F.col("p") * 2).alias("p"))
    )
    t.commit()

    src_after = agg(lk.read_table(spark, src))
    source_unchanged = (src_before.n, src_before.m) == (
        src_after.n, src_after.m
    )

    return (
        lk.read_table(spark, dst)
        .groupBy((F.col("c") % 10).cast("long").alias("custgrp"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_micros(F.col("p"))).cast("long").alias("price_micros"),
        )
        .withColumn("zero_copy", F.lit(bool(zero_copy)))
        .withColumn("source_unchanged", F.lit(bool(source_unchanged)))
        .withColumn(
            "clone_feed_is_snapshot", F.lit(bool(clone_feed_is_snapshot))
        )
        .orderBy("custgrp")
    )
