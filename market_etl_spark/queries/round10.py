"""Round-10 additions: the lakehouse pieces COMPOSED.

VERDICT r9 ranked the residual gaps: every table-format primitive
existed as its own demo (versioned snapshots, deletion vectors,
compaction generations) but nothing tied them into one transactional
story.  Round 10 lands:

- ``q_lakehouse_txn`` — optimistic-concurrency commit log
  (:mod:`..lakehouse`): two writers race from the same snapshot; an
  append never conflicts with a delete, overlapping deletes raise
  ``CommitConflict`` and the retry on the fresh snapshot serializes;
  a blind commit demonstrably loses updates (the counterfactual the
  protocol exists for).
- ``q_merge_on_read_updates`` — DV updates (delete positions +
  reinsert append, the Delta DV-update / Iceberg
  position-delete+insert model), overlapping a prior delete.
- ``q_version_change_feed`` — change-data-feed between store versions
  in the Delta ``readChangeFeed`` shape, driving an incremental
  (IVM) aggregate refresh that must equal the direct recompute.
- ``q_mor_compaction_purge`` — DV-aware compaction: OPTIMIZE folds
  the deletion vectors away in the same generation move.
- ``q_lakehouse_mor_txn`` — deletion vectors, compaction and
  checkpoints UNDER the commit log: MOR deletes as logged ``add_dv``
  actions, the DV-vs-compaction conflict in both directions, the
  transactional OPTIMIZE settling the vectors, checkpoint-bounded
  replay.
- ``q_streaming_lakehouse_sink`` — exactly-once streaming appends via
  txn identities (Delta txnAppId/txnVersion): duplicate batch applies
  and full fresh-checkpoint reprocesses both dedupe.

Reference parity note: the reference pipeline (jobs/*/*.py) is
append-only, single-writer, with no version or delete story; all four
are the engine extensions a 100 TB multi-writer lakehouse needs.
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


@query(
    "q_lakehouse_txn",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value, day(ts) AS day FROM events
    ),
    appended AS (
      SELECT -(event_id + 1) AS event_id, event_type,
             value * 2 AS value, day
      FROM base WHERE day = 28
    ),
    final AS (
      SELECT * FROM base
      WHERE NOT (value >= 300)
        AND NOT (event_type = 'click' AND day <= 5)
        AND NOT (value < 10)
      UNION ALL
      SELECT * FROM appended
      WHERE NOT (event_type = 'click' AND day <= 5)
        AND NOT (value < 10)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(5 AS INT) AS final_version,
           TRUE AS conflict_detected,
           TRUE AS retry_serial_equal,
           TRUE AS blind_loses_updates
    FROM final
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "transactions", "optimistic-concurrency", "extension"),
)
def q_lakehouse_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMISTIC-CONCURRENCY transactions over the commit log
    (:mod:`..lakehouse`) — Delta/Iceberg's core transactional
    contract, the top-ranked VERDICT r9 residual.  Four writers:

    1. v1 seeds the table (8 hash-partitioned files).
    2. Writers A (DELETE value ≥ 300) and B (append the day-28 rows
       re-keyed, value × 2) both begin at v1.  B commits first; A's
       commit REVALIDATES against B's commit and lands without
       conflict (an append removes nothing — WriteSerializable).
       A's rewrites cover only v1's files, so appended rows with
       value ≥ 300 correctly survive (A is serialized BEFORE B).
    3. Writers C (DELETE day ≤ 5 clicks) and D (DELETE value < 10)
       both begin at v3.  Both predicates hit shared files; C commits
       first, D's commit raises ``CommitConflict``
       (ConcurrentDeleteDelete — D's copy-on-write rewrites would
       resurrect C's deletes), and the RETRY re-runs the delete on
       the fresh snapshot: the final table equals the serial
       application the oracle recomputes.

    In-query audits the oracle pins: ``final_version`` = 5 (exactly
    one conflict burned no version slot), ``conflict_detected``,
    ``retry_serial_equal`` (final state == direct serial recompute:
    multiset equality by count + order-insensitive xxhash64 digest,
    one aggregate pass per side), ``blind_loses_updates``
    — on a 30-row side table the same race committed BLINDLY
    resurrects deleted rows and duplicates survivors, the anomaly the
    validation exists to prevent."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_txn_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.dayofmonth("ts").alias("day")
    )
    t0 = lk.Transaction(path)
    t0.append(e.repartition(8))
    assert t0.commit() == 1

    a = lk.Transaction(path)  # both begin at v1
    b = lk.Transaction(path)
    a.delete_where(spark, F.col("value") >= 300)
    b.append(
        e.filter(F.col("day") == 28).select(
            (-(F.col("event_id") + 1)).alias("event_id"),
            "event_type",
            (F.col("value") * 2).alias("value"),
            "day",
        )
    )
    assert b.commit() == 2
    assert a.commit() == 3  # revalidates vs the append: no conflict

    c = lk.Transaction(path)  # both begin at v3
    d = lk.Transaction(path)
    p_c = (F.col("event_type") == "click") & (F.col("day") <= 5)
    p_d = F.col("value") < 10
    c.delete_where(spark, p_c)
    d.delete_where(spark, p_d)
    assert c.commit() == 4
    conflict_detected = False
    try:
        d.commit()
    except lk.CommitConflict:
        conflict_detected = True
    d2 = lk.Transaction(path)  # the caller-side retry contract
    d2.delete_where(spark, p_d)
    final_version = d2.commit()

    final = lk.read_table(spark, path)
    appended = e.filter(F.col("day") == 28).select(
        (-(F.col("event_id") + 1)).alias("event_id"),
        "event_type",
        (F.col("value") * 2).alias("value"),
        "day",
    )
    serial = (
        e.filter(~(F.col("value") >= 300) & ~p_c & ~p_d)
        .unionByName(appended.filter(~p_c & ~p_d))
    )
    # multiset equality via (count, order-insensitive hash digest),
    # both sides folded into ONE Spark action (union tagged by side +
    # one grouped (count, bit_xor(xxhash64)) aggregate — _audit helper;
    # the two-job form paid a second full analyze/AQE/schedule cycle
    # for no extra information)
    from ._audit import digest_pairs_equal, hashed

    def h(df: DataFrame) -> DataFrame:
        return hashed(df, *sorted(df.columns))

    [retry_serial_equal] = digest_pairs_equal([(h(final), h(serial))])

    # the counterfactual: same overlapping-delete race, committed blind
    side = str(_SCRATCH / f"lakehouse_blind_{_tag(sf_dir)}")
    shutil.rmtree(side, ignore_errors=True)
    s0 = lk.Transaction(side)
    s0.append(
        spark.range(30).select("id", (F.col("id") % 3).alias("k")).coalesce(1)
    )
    s0.commit()
    x = lk.Transaction(side)
    y = lk.Transaction(side)
    x.delete_where(spark, F.col("k") == 0)
    y.delete_where(spark, F.col("k") == 1)
    x.commit()
    y.commit(_unsafe_blind=True)
    # serial result would be the 10 k==2 rows; the blind commit's stale
    # rewrite resurrects x's deletes and duplicates survivors
    blind_loses_updates = lk.read_table(spark, side).count() != 10

    return (
        final.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .withColumn("final_version", F.lit(int(final_version)).cast("int"))
        .withColumn("conflict_detected", F.lit(bool(conflict_detected)))
        .withColumn("retry_serial_equal", F.lit(bool(retry_serial_equal)))
        .withColumn("blind_loses_updates", F.lit(bool(blind_loses_updates)))
        .orderBy("event_type")
    )


@query(
    "q_merge_on_read_updates",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(
               (value + CASE WHEN day(ts) <= 10 THEN 1000.0 ELSE 0.0 END)
               * 1e6, 0) AS BIGINT)) AS BIGINT) AS value_micros,
           TRUE AS update_exact,
           TRUE AS purge_matches
    FROM events
    WHERE NOT (value >= 300)
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("merge-on-read", "deletion-vectors", "lakehouse", "extension"),
)
def q_merge_on_read_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPDATES — the DV-update model (delete positions +
    reinsert append; Delta DV update / Iceberg position-delete+insert)
    completing ``q_merge_on_read_deletes``: UPDATE ... SET value =
    value + 1000 WHERE day ≤ 10 runs AFTER a DELETE WHERE value ≥ 300,
    and the predicates OVERLAP — the update must touch only the
    still-live rows (already-deleted day ≤ 10 rows stay dead).  No
    base file is rewritten; the reinsert file is invisible until its
    paired sidecar commits (one atomic rename — :func:`..mor.
    write_update_vector`); a PURGE folds vectors and reinserts into a
    clean generation.

    Audits the oracle pins TRUE: ``update_exact`` — rows updated ==
    the live match count (overlap excluded exactly); ``purge_matches``
    — the purged generation equals the logical view row-for-row
    (count + exact micros).  The returned per-type aggregates read
    from the PURGED generation, so the delete → update → read → purge
    chain must agree with the oracle's CASE recompute."""
    from .. import mor

    base = str(_SCRATCH / f"moru_base_{_tag(sf_dir)}")
    gen2 = str(_SCRATCH / f"moru_gen2_{_tag(sf_dir)}")
    shutil.rmtree(base, ignore_errors=True)
    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    e.repartition(8).write.parquet(base)

    mor.write_deletion_vector(spark, base, F.col("value") >= 300)
    n_upd = mor.write_update_vector(
        spark,
        base,
        F.col("day") <= 10,
        {"value": F.col("value") + 1000.0},
    )

    logical = mor.read_with_deletes(spark, base)
    n_purged = mor.purge_deletes(spark, base, gen2)
    # the three audit aggregates fold into ONE action after the purge:
    # the logical view reads base+sidecars (untouched by purge), the
    # purged side reads gen2, and the update-expectation count reads
    # only the immutable base files — all value-identical to the
    # former three sequential jobs, at a third of the action cost
    rows = (
        logical.select(F.lit(0).alias("s"), "value")
        .unionByName(
            spark.read.parquet(gen2).select(F.lit(1).alias("s"), "value")
        )
        .unionByName(
            spark.read.parquet(base)
            .filter((F.col("day") <= 10) & ~(F.col("value") >= 300))
            .select(F.lit(2).alias("s"), "value")
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("vm"),
        )
        .collect()
    )
    d = {r.s: (r.n, r.vm) for r in rows}
    update_exact = n_upd == d[2][0]
    purge_matches = d[0][0] == d[1][0] == n_purged and d[0][1] == d[1][1]

    return (
        spark.read.parquet(gen2)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .withColumn("update_exact", F.lit(bool(update_exact)))
        .withColumn("purge_matches", F.lit(bool(purge_matches)))
        .orderBy("event_type")
    )


@query(
    "q_version_change_feed",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer
    ),
    v2 AS (
      SELECT k, seg,
             bal + CASE WHEN seg = 'BUILDING' THEN 100.0 ELSE 0.0 END AS bal
      FROM v1 WHERE k % 7 <> 0
      UNION ALL
      SELECT -k AS k, 'NEWSEG' AS seg, bal * 2 AS bal
      FROM v1 WHERE k % 11 = 0
    ),
    v3 AS (
      SELECT k, seg,
             bal - CASE WHEN seg = 'AUTOMOBILE' THEN 50.0 ELSE 0.0 END AS bal
      FROM v2 WHERE k % 13 <> 0
    ),
    feed AS (
      SELECT 2 AS commit_version, 'delete' AS change_type, bal
      FROM v1 WHERE k NOT IN (SELECT k FROM v2)
      UNION ALL
      SELECT 2, 'insert', bal FROM v2 WHERE k NOT IN (SELECT k FROM v1)
      UNION ALL
      SELECT 2, 'update_preimage', o.bal
      FROM v1 o JOIN v2 n ON o.k = n.k
      WHERE o.seg <> n.seg OR o.bal <> n.bal
      UNION ALL
      SELECT 2, 'update_postimage', n.bal
      FROM v1 o JOIN v2 n ON o.k = n.k
      WHERE o.seg <> n.seg OR o.bal <> n.bal
      UNION ALL
      SELECT 3, 'delete', bal FROM v2 WHERE k NOT IN (SELECT k FROM v3)
      UNION ALL
      SELECT 3, 'insert', bal FROM v3 WHERE k NOT IN (SELECT k FROM v2)
      UNION ALL
      SELECT 3, 'update_preimage', o.bal
      FROM v2 o JOIN v3 n ON o.k = n.k
      WHERE o.seg <> n.seg OR o.bal <> n.bal
      UNION ALL
      SELECT 3, 'update_postimage', n.bal
      FROM v2 o JOIN v3 n ON o.k = n.k
      WHERE o.seg <> n.seg OR o.bal <> n.bal
    )
    SELECT CAST(commit_version AS INT) AS commit_version,
           change_type,
           CAST(COUNT(*) AS BIGINT) AS n_changes,
           CAST(SUM(CAST(ROUND(bal * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS bal_micros,
           TRUE AS ivm_consistent
    FROM feed
    GROUP BY commit_version, change_type
    ORDER BY commit_version, change_type
    """,
    tags=("lakehouse", "cdf", "time-travel", "ivm", "extension"),
)
def q_version_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED CHANGE DATA FEED between LOG versions — Delta's
    ``readChangeFeed`` shape derived by SNAPSHOT DIFF, closing VERDICT
    r9 item 3 (storage migrated from the round-8 snapshot store to the
    commit log in round 12 — VERDICT r11 item 5: the diff is an
    operator over version pairs; where versions live is storage
    policy, and one table abstraction remains): three snapshot
    versions of the customer dimension are published as whole-table
    ``replace_where([])`` commits (v2 deletes every 7th key, bumps
    BUILDING balances, inserts NEGATED-key rows for every 11th key —
    negation keeps the insert key domain disjoint from real custkeys
    at EVERY scale factor; v3 deletes every 13th surviving key and
    docks AUTOMOBILE balances), then :func:`..merge.read_changes`
    (1, 3] with ``reader=lakehouse.read_table`` emits full-row records
    tagged ``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` + ``commit_version`` — one shuffle per step
    (union + groupBy + explode, no full-outer join, no per-type
    re-join).  This keyed derivation COMPLEMENTS the log's
    action-derived feed (:func:`..lakehouse.read_changes`): full
    snapshot replacements carry no row-level actions to derive from,
    so the key diff is exactly the right feed for publish-style
    tables.

    The feed DRIVES AN INCREMENTAL CONSUMER in-query: a (count,
    balance-micros) aggregate of v1 refreshed purely from the
    delta-sized feed (postimages/inserts signed +, preimages/deletes
    signed −, exact integer micros) must equal the direct aggregate
    of v3 — ``ivm_consistent``, pinned TRUE by the oracle.  The
    oracle recomputes every change set relationally from the same
    three snapshot definitions."""
    from .. import lakehouse as lk
    from ..merge import read_changes

    path = str(_SCRATCH / f"cdf_store_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    v1 = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    v2 = (
        v1.filter(F.col("k") % 7 != 0)
        .select(
            "k",
            "seg",
            (
                F.col("bal")
                + F.when(F.col("seg") == "BUILDING", 100.0).otherwise(0.0)
            ).alias("bal"),
        )
        .unionByName(
            v1.filter(F.col("k") % 11 == 0).select(
                (-F.col("k")).alias("k"),
                F.lit("NEWSEG").alias("seg"),
                (F.col("bal") * 2).alias("bal"),
            )
        )
    )
    v3 = v2.filter(F.col("k") % 13 != 0).select(
        "k",
        "seg",
        (
            F.col("bal")
            - F.when(F.col("seg") == "AUTOMOBILE", 50.0).otherwise(0.0)
        ).alias("bal"),
    )
    for df in (v1, v2, v3):
        t = lk.Transaction(path)
        t.replace_where(spark, [], df)  # snapshot publish, one commit
        t.commit()

    feed = read_changes(
        spark, path, 1, 3, ["k"],
        reader=lambda s, p, v: lk.read_table(s, p, version=v),
    )

    # incremental consumer: refresh v1's aggregate from the feed only.
    # THREE audit aggregates folded into ONE job (guide §7.3 — per-action driver planning cost): the
    # signed feed delta and the two snapshot baselines are union-tagged
    # with a per-row weight (feed rows carry the change sign, snapshot
    # rows weight 1) so one grouped (sum(w), sum(w*micros)) reduction
    # reproduces the former three collects value-identically —
    # count == sum of unit weights, sum == unit-weighted sum.
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    from functools import reduce as _reduce

    micros = F.round(F.col("bal") * 1e6, 0).cast("long")
    branches = [
        feed.select(F.lit(0).alias("s"), sign.alias("w"), micros.alias("m")),
        v1.select(F.lit(1).alias("s"), F.lit(1).alias("w"), micros.alias("m")),
        v3.select(F.lit(2).alias("s"), F.lit(1).alias("w"), micros.alias("m")),
    ]
    rows = (
        _reduce(DataFrame.unionByName, branches)
        .groupBy("s")
        .agg(
            F.sum("w").alias("dn"),
            F.sum(F.col("w") * F.col("m")).alias("dm"),
        )
        .collect()
    )
    g = {r.s: (r.dn, r.dm) for r in rows}
    # missing group row (empty branch) → False verdict, not KeyError
    # (ADVICE r14); a None sum cannot satisfy the arithmetic check
    d, b1, b3 = (g.get(i, (0, None)) for i in range(3))
    ivm_consistent = (
        None not in (d[1], b1[1], b3[1])
        and b1[0] + d[0] == b3[0]
        and b1[1] + d[1] == b3[1]
    )

    return (
        feed.groupBy(
            F.col("_commit_version").cast("int").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(F.round(F.col("bal") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("bal_micros"),
        )
        .withColumn("ivm_consistent", F.lit(bool(ivm_consistent)))
        .orderBy("commit_version", "change_type")
    )


@query(
    "q_mor_compaction_purge",
    oracle="""
    WITH live AS (
      SELECT * FROM events
      WHERE NOT (value BETWEEN 100 AND 400 OR day(ts) <= 3)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST((SELECT COUNT(*) FROM live WHERE value BETWEEN 20 AND 50)
                AS BIGINT) AS band_rows,
           TRUE AS no_sidecars,
           TRUE AS clustered_ok,
           TRUE AS sorted_ok,
           TRUE AS pruning_ok
    FROM live
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("merge-on-read", "compaction", "maintenance", "lakehouse", "extension"),
)
def q_mor_compaction_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-AWARE COMPACTION — the real OPTIMIZE contract (VERDICT r9
    item 6): a value-clustered 16-file layout accumulates TWO
    overlapping deletion-vector batches (value 100–300, then day ≤ 3
    OR value 200–400), and ONE maintenance pass
    (:func:`..sinks.compact_manifested` with ``apply_deletes=True``)
    bin-packs the files into 4 sorted range-contiguous files while
    SUBTRACTING the vectors — the compacted generation carries no
    sidecars, so readers stop paying the per-query anti join and the
    merge-on-read debt is settled in the same generation move.

    Audits the oracle pins TRUE: ``no_sidecars`` (dest has no
    ``_deletes`` and a plain read equals the pre-compaction logical
    view — count and exact micros); ``clustered_ok`` (the fresh
    manifest's ranges stay disjoint); ``sorted_ok`` (every compacted
    file individually monotone on the cluster key — the lag probe
    added with the r9 sort-order fix); ``pruning_ok`` (a stats-pruned
    band scan over the compacted generation touches ≤ 3 of 4 files
    yet returns exactly the oracle's band count)."""
    from .. import mor
    from ..sinks import (
        compact_manifested,
        read_stats_pruned,
        write_manifested,
    )

    src = str(_SCRATCH / f"morcmp_src_{_tag(sf_dir)}")
    dest = str(_SCRATCH / f"morcmp_dest_{_tag(sf_dir)}")
    shutil.rmtree(src, ignore_errors=True)
    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    write_manifested(e, src, "value", n_files=16)

    data = f"{src}/data"
    mor.write_deletion_vector(spark, data, F.col("value").between(100, 300))
    mor.write_deletion_vector(
        spark, data, (F.col("day") <= 3) | (F.col("value").between(200, 400))
    )
    logical = mor.read_with_deletes(spark, data)

    compact_manifested(spark, src, dest, "value", n_bins=4, apply_deletes=True)

    # FOUR audit actions folded into ONE job (guide §7.3: drill wall is
    # per-action fixed cost, not data): the pre-compaction logical view
    # (src + sidecars, untouched by the generation move), the compacted
    # plain read, the stats-pruned band scan, and the per-file sort-order
    # violation probe are union-tagged and reduced by one grouped
    # aggregate — each branch's (n, vm) is value-identical to the
    # former sequential collects.
    from pyspark.sql import Window

    band, scanned, total_files = read_stats_pruned(
        spark, dest, "value", 20.0, 50.0
    )
    plain = spark.read.parquet(f"{dest}/data")
    w = Window.partitionBy("_f").orderBy("_i")
    violations = (
        plain.select(
            F.col("value").alias("_v"),
            F.col("_metadata.file_path").alias("_f"),
            F.col("_metadata.row_index").alias("_i"),
        )
        .withColumn("_prev", F.lag("_v").over(w))
        .filter(F.col("_prev") > F.col("_v"))
        .select(F.col("_v").alias("value"))
    )
    branches = [
        logical.select(F.lit(0).alias("s"), "value"),
        plain.select(F.lit(1).alias("s"), "value"),
        band.select(F.lit(2).alias("s"), "value"),
        violations.select(F.lit(3).alias("s"), "value"),
    ]
    from functools import reduce as _reduce

    rows = (
        _reduce(DataFrame.unionByName, branches)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("vm"),
        )
        .collect()
    )
    d = {r.s: (r.n, r.vm) for r in rows}
    before, after = d.get(0, (0, None)), d.get(1, (0, None))
    no_sidecars = (
        not pathlib.Path(f"{dest}/data/_deletes").exists()
        and before == after
    )
    man = spark.read.parquet(f"{dest}/manifest").orderBy("stat_min").collect()
    clustered_ok = all(
        man[i].stat_min >= man[i - 1].stat_max for i in range(1, len(man))
    ) and len(man) == 4
    sorted_ok = d.get(3, (0, None))[0] == 0
    band_rows = d.get(2, (0, None))[0]

    return (
        spark.read.parquet(f"{dest}/data")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .withColumn("band_rows", F.lit(int(band_rows)).cast("long"))
        .withColumn("no_sidecars", F.lit(bool(no_sidecars)))
        .withColumn("clustered_ok", F.lit(bool(clustered_ok)))
        .withColumn("sorted_ok", F.lit(bool(sorted_ok)))
        .withColumn(
            "pruning_ok", F.lit(bool(1 <= scanned <= 3 and total_files == 4))
        )
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_mor_txn",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value, day(ts) AS day FROM events
    ),
    appended AS (
      SELECT -(event_id + 1) AS event_id, event_type,
             value * 2 AS value, day
      FROM base WHERE day = 28
    ),
    final AS (
      SELECT * FROM base WHERE NOT (value >= 300) AND NOT (value < 10)
      UNION ALL
      SELECT * FROM appended WHERE NOT (value < 10)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(5 AS INT) AS final_version,
           TRUE AS mor_metadata_only,
           TRUE AS conflict_detected,
           TRUE AS compaction_settled,
           TRUE AS checkpoint_equivalent
    FROM final
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=(
        "lakehouse",
        "transactions",
        "deletion-vectors",
        "compaction",
        "extension",
    ),
)
def q_lakehouse_mor_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE LAKEHOUSE PIECES UNDER ONE COMMIT LOG — deletion vectors,
    compaction and checkpoints composed transactionally (the "one
    coherent table story" VERDICT r9 asked for, beyond
    ``q_lakehouse_txn``'s copy-on-write-only races):

    1. v1 seeds 8 files; writer A stages a MERGE-ON-READ delete
       (value ≥ 300) — ONE ``add_dv`` action, zero data files touched
       (``mor_metadata_only``); writer B appends the day-28 rows
       re-keyed.  Both commit without conflict (v2, v3): a DV against
       a file another writer merely read never conflicts.
    2. Writer C stages a DV-applying COMPACTION at v3; writer D lands
       a second MOR delete (value < 10) at v4 first.  C's commit
       RAISES: D's vector targets files C removes — C's staged
       output, derived without D's vector, would silently resurrect
       D's deletes (``conflict_detected``).  C's retry at v4 folds
       BOTH vectors into 4 clean files and removes the DV actions in
       the same commit v5 (``compaction_settled`` — the transactional
       OPTIMIZE: live DV set empty, exactly 4 files).
    3. A CHECKPOINT of v5 is written and the replayed state must
       equal the checkpoint-resolved state (``checkpoint_equivalent``
       — Delta's `_last_checkpoint` discipline keeping metadata reads
       O(commits since checkpoint)).

    The returned per-type aggregates read the FINAL table, so the
    whole DV → append → conflict → retry → compact → checkpoint chain
    must agree with the oracle's serial recompute (A logically before
    B: appended rows with value ≥ 300 correctly survive A's
    v1-snapshot vector)."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_mor_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.dayofmonth("ts").alias("day")
    )
    t0 = lk.Transaction(path)
    t0.append(e.repartition(8))
    assert t0.commit() == 1

    a = lk.Transaction(path)  # both begin at v1
    b = lk.Transaction(path)
    a.delete_where_mor(spark, F.col("value") >= 300)
    b.append(
        e.filter(F.col("day") == 28).select(
            (-(F.col("event_id") + 1)).alias("event_id"),
            "event_type",
            (F.col("value") * 2).alias("value"),
            "day",
        )
    )
    mor_metadata_only = {x["op"] for x in a.actions} == {"add_dv"}
    assert a.commit() == 2
    assert b.commit() == 3  # DV against files b never removed: no conflict

    c = lk.Transaction(path)  # both begin at v3
    d = lk.Transaction(path)
    c.compact(spark, n_files=4)
    d.delete_where_mor(spark, F.col("value") < 10)
    assert d.commit() == 4
    conflict_detected = False
    try:
        c.commit()
    except lk.CommitConflict:
        conflict_detected = True
    c2 = lk.Transaction(path)  # the retry folds BOTH vectors away
    c2.compact(spark, n_files=4)
    final_version = c2.commit()

    v, live, dvs = lk._state(path)
    compaction_settled = dvs == set() and len(live) == 4

    pre = lk._state(path)
    lk.write_checkpoint(path)
    checkpoint_equivalent = lk._state(path) == pre and (
        lk._latest_checkpoint(path, v) or {}
    ).get("version") == v

    return (
        lk.read_table(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .withColumn("final_version", F.lit(int(final_version)).cast("int"))
        .withColumn("mor_metadata_only", F.lit(bool(mor_metadata_only)))
        .withColumn("conflict_detected", F.lit(bool(conflict_detected)))
        .withColumn("compaction_settled", F.lit(bool(compaction_settled)))
        .withColumn(
            "checkpoint_equivalent", F.lit(bool(checkpoint_equivalent))
        )
        .orderBy("event_type")
    )


@query(
    "q_streaming_lakehouse_sink",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS replay_skipped,
           TRUE AS restart_idempotent
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "lakehouse", "exactly-once", "extension"),
)
def q_streaming_lakehouse_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE STREAMING SINK into the commit log — Delta's
    txnAppId/txnVersion idempotent-writes contract: a foreachBatch
    stream appends each micro-batch as a transaction carrying
    ``(app, batch_id)``; the log skips any commit whose identity
    already landed, so the two replay hazards a file-checkpoint sink
    cannot survive both become no-ops:

    1. ``replay_skipped`` — a duplicate apply of an already-committed
       batch id (the crash-between-sink-commit-and-checkpoint-ack
       case: Spark re-runs the batch on restart) stages its files but
       SKIPS the commit (returns None) — row counts, micros and the
       log version all unchanged; the staged orphans are exactly what
       :func:`..lakehouse.vacuum_orphans` sweeps.
    2. ``restart_idempotent`` — a full reprocess from a FRESH
       checkpoint (losing the source's progress state entirely)
       replays every batch; all four commits dedupe and the table is
       byte-identical.  Without the txn identity this doubles the
       table — exactly the silent corruption mode of plain
       append-to-parquet streaming sinks.

    The four micro-batches are the events table range-split on ts
    with pinned mtimes (the multibatch zone discipline), so the final
    table must equal the oracle's plain full-table aggregate."""
    from .. import lakehouse as lk
    from ..streaming import read_events_stream_multibatch

    tag = _tag(sf_dir)
    path = str(_SCRATCH / f"lakehouse_sink_{tag}")
    ck1 = str(_SCRATCH / f"lakehouse_sink_ck1_{tag}")
    ck2 = str(_SCRATCH / f"lakehouse_sink_ck2_{tag}")
    for p in (path, ck1, ck2):
        shutil.rmtree(p, ignore_errors=True)

    stream = read_events_stream_multibatch(spark, sf_dir, n_files=4)

    def apply(batch_df, batch_id):
        t = lk.Transaction(path, txn_app="events_sink", txn_version=batch_id)
        t.append(batch_df)
        t.commit()

    (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", ck1)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    v_after = lk.latest_commit(path)
    n_after = lk.read_table(spark, path).count()

    # hazard 1: duplicate apply of a committed batch id
    dup = lk.Transaction(path, txn_app="events_sink", txn_version=v_after - 1)
    dup.append(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("poison").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    replay_skipped = (
        dup.commit() is None
        and lk.latest_commit(path) == v_after
        and lk.read_table(spark, path).count() == n_after
    )

    # hazard 2: full reprocess from a fresh checkpoint
    (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    restart_idempotent = (
        lk.latest_commit(path) == v_after
        and lk.read_table(spark, path).count() == n_after
    )

    return (
        lk.read_table(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .withColumn("replay_skipped", F.lit(bool(replay_skipped)))
        .withColumn("restart_idempotent", F.lit(bool(restart_idempotent)))
        .orderBy("event_type")
    )


@query(
    "q_lakehouse_constraints",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value, day(ts) AS day FROM events
    ),
    clean AS (
      SELECT -(2 * event_id + 1) AS event_id, event_type,
             value * 3 AS value, day
      FROM base WHERE day = 28
    ),
    evolved AS (
      SELECT -(2 * event_id + 2) AS event_id, event_type, value, day
      FROM base WHERE day = 1
    ),
    final AS (
      SELECT event_id, event_type, value, CAST(NULL AS VARCHAR) AS src
      FROM base
      UNION ALL
      SELECT event_id, event_type, value, CAST(NULL AS VARCHAR) FROM clean
      UNION ALL
      SELECT event_id, event_type, value, 'evolved' FROM evolved
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           CAST(SUM(CASE WHEN src = 'evolved' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_evolved,
           TRUE AS violation_atomic,
           TRUE AS add_constraint_validates,
           TRUE AS schema_rejected,
           TRUE AS evolution_merged
    FROM final
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "constraints", "schema-enforcement", "extension"),
)
def q_lakehouse_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE TABLE CONTRACT under the commit log — Delta's CHECK
    constraints + schema enforcement/evolution:

    1. ``ADD CONSTRAINT value_nonneg CHECK (value >= 0)`` validates
       the EXISTING table first (one violation-count pass), commits
       as a metadata action; a later ``CHECK (value >= 100)`` attempt
       raises because existing rows violate it
       (``add_constraint_validates``).
    2. An append carrying one poison row (value = −5) is rejected
       WHOLE — nothing staged visible, log version unchanged
       (``violation_atomic`` — per-batch atomicity, not per-row
       filtering; NULL values pass, SQL CHECK semantics).
    3. Schema enforcement: an append missing table columns raises
       ``SchemaMismatch`` (``schema_rejected``); an append carrying a
       NEW ``src`` column lands only with ``evolve_schema=True``,
       widening the committed schema in the same transaction — old
       files footer-merge to typed NULLs on read
       (``evolution_merged``).

    Appended batches use parity-disjoint negated keys (odd negatives
    for the clean batch, even for the evolved one) so the key domain
    stays collision-free at every scale factor.  The final per-type
    aggregates read the evolved table, so contract enforcement,
    rejection atomicity and footer-merged evolution must all agree
    with the oracle's three-way union recompute."""
    from .. import lakehouse as lk

    path = str(_SCRATCH / f"lakehouse_cons_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.dayofmonth("ts").alias("day")
    )
    t0 = lk.Transaction(path)
    t0.append(e.repartition(8))
    t0.commit()

    ta = lk.Transaction(path)
    ta.set_check_constraint(spark, "value_nonneg", "value >= 0")
    ta.commit()
    add_constraint_validates = True
    try:
        lk.Transaction(path).set_check_constraint(
            spark, "value_big", "value >= 100"
        )
        add_constraint_validates = False  # should have raised
    except lk.ConstraintViolation:
        pass

    v_before = lk.latest_commit(path)
    n_before = lk.read_table(spark, path).count()
    clean = e.filter(F.col("day") == 28).select(
        (-(F.col("event_id") * 2 + 1)).alias("event_id"),
        "event_type",
        (F.col("value") * 3).alias("value"),
        "day",
    )
    violation_atomic = False
    try:
        lk.Transaction(path).append(
            clean.unionByName(
                spark.range(1).select(
                    F.lit(-999999999).cast("long").alias("event_id"),
                    F.lit("poison").alias("event_type"),
                    F.lit(-5.0).alias("value"),
                    F.lit(28).cast("int").alias("day"),
                )
            )
        )
    except lk.ConstraintViolation:
        violation_atomic = (
            lk.latest_commit(path) == v_before
            and lk.read_table(spark, path).count() == n_before
        )
    tc = lk.Transaction(path)
    tc.append(clean)
    tc.commit()

    schema_rejected = False
    try:
        lk.Transaction(path).append(
            spark.range(1).select(F.lit(1).cast("long").alias("event_id"))
        )
    except lk.SchemaMismatch:
        schema_rejected = True

    evolved = e.filter(F.col("day") == 1).select(
        (-(F.col("event_id") * 2 + 2)).alias("event_id"),
        "event_type",
        "value",
        "day",
        F.lit("evolved").alias("src"),
    )
    te = lk.Transaction(path)
    te.append(evolved, evolve_schema=True)
    te.commit()

    final = lk.read_table(spark, path)
    evolution_merged = "src" in final.columns

    return (
        final.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
            F.sum(
                F.when(F.col("src") == "evolved", 1).otherwise(0)
            ).cast("long").alias("n_evolved"),
        )
        .withColumn("violation_atomic", F.lit(bool(violation_atomic)))
        .withColumn(
            "add_constraint_validates", F.lit(bool(add_constraint_validates))
        )
        .withColumn("schema_rejected", F.lit(bool(schema_rejected)))
        .withColumn("evolution_merged", F.lit(bool(evolution_merged)))
        .orderBy("event_type")
    )
