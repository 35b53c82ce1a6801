"""Round-13 additions: the round-12 planes COMPOSED.

VERDICT r12's ranked residuals were all composition gaps between
features that individually worked: the registered source still
planned from the driver-side JSON replay even when a parquet
checkpoint existed, the streaming source materialized micro-batches
driver-side (the documented SimpleDataSourceStreamReader cost
profile), and the SQL router's grammar stopped short of the Delta
shapes users hit first.  Round 13 closes each:

- ``q_lakehouse_checkpoint_planning`` — planning FROM the parquet
  checkpoint, both routes: ``read_table`` past the file-count
  threshold plans via ``state_frame`` + ``mapInPandas`` prune (Spark
  jobs; driver JSON work O(tail)); the registered source — whose
  planning hooks run in Spark's SESSION-LESS worker — consumes the
  same checkpoint via pyarrow (columnar base, O(tail) JSON).  Commits
  auto-advance the checkpoint once the tail reaches the configured
  interval.  The drill pins partition-list equality between the
  checkpoint route and the JSON-replay route, decision for decision.
- ``q_lakehouse_sql_ddl`` — the widened grammar end to end: CREATE
  TABLE ... USING lakehouse LOCATION [AS SELECT] with a router-owned
  NAME registry (Spark 4.1 hands Python-source catalog scans empty
  options, so names cannot live in the real catalog), INSERT INTO
  (VALUES and SELECT, positional cast), WHEN MATCHED AND <cond> THEN
  UPDATE, OPTIMIZE ZORDER FULL, DROP TABLE.
- ``q_lakehouse_stream_backfill`` — the partition-based stream
  reader under a BACKFILL-SCALE commit: one InputPartition per FILE,
  rows derived on executors as Arrow record batches, replicated
  exactly-once into a downstream table through the registered sink.

Reference parity note: the reference pipeline (jobs/*/*.py) is
append-only loose parquet with no table format; every query here is
an engine extension over sql/athena_sample_queries.sql's data model.
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


def _micros(col: F.Column) -> F.Column:
    return F.round(col * 1e6, 0).cast("long")


@query(
    "q_lakehouse_checkpoint_planning",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS price_micros,
           TRUE AS auto_advanced,
           TRUE AS arrow_state_parity,
           TRUE AS source_plan_parity,
           TRUE AS routed_read_parity
    FROM orders
    WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("lakehouse", "checkpoint", "planning", "data-skipping",
          "extension"),
)
def q_lakehouse_checkpoint_planning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Planning composed WITH the parquet checkpoint (VERDICT r12 #1).

    Round 12 built two planes that did not touch: the registered
    source/``read_table`` planned every scan from driver-side JSON
    replay (O(live files) blob parse + admit loop), while the parquet
    checkpoint plane — built to remove exactly that bottleneck — was
    consumed only by its own drill.  This drill proves the
    composition:

    1. Seed the orders table (3 appends, 2 files each), bootstrap a
       parquet checkpoint, set the auto-advance interval to 2 and
       land a MOR delete + a copy-on-write delete: the SECOND commit
       must roll the checkpoint forward BY ITSELF
       (``auto_advanced`` — ``Transaction.commit`` calls
       ``advance_parquet_checkpoint`` once the JSON tail reaches the
       interval, Delta's checkpoint cadence).
    2. ``arrow_state_parity`` — the SESSION-LESS state composition
       the DataSource planning worker uses (pyarrow columnar read of
       the checkpoint + delta-sized JSON tail,
       :func:`..lakehouse_checkpoint.state_arrow`) equals the JSON
       replay: live set, DV set, meta, and every per-file stats dict.
    3. ``source_plan_parity`` — the registered source's PARTITION
       LIST under a pushed filter is identical file-for-file between
       ``planFromCheckpoint=true`` and the JSON route, and equals
       ``prune_files`` — plan decisions identical, only where they
       were computed differs.
    4. ``routed_read_parity`` — ``read_table`` past the plan
       threshold (``checkpointPlanMinFiles=1``) routes through
       ``state_frame`` + distributed ``mapInPandas`` prune and
       returns a digest identical to the JSON route, predicate and
       filterless both.

    Scale shape: past the threshold the driver parses only the JSON
    tail; the O(files) base state arrives as parquet (columnar in the
    session-less planner, a Spark job in ``read_table``), and admit
    decisions fan out with the data (SCALE.md round-13 row).

    Cites: sql/athena_repair_partitions.sql (the reference's whole
    metadata plane is MSCK re-crawl; checkpointed planning is the
    engine extension)."""
    from .. import lakehouse as lk
    from .. import lakehouse_checkpoint as ckpt
    from ..lakehouse_datasource import _LakehouseBatchReader, register

    register(spark)
    path = str(_SCRATCH / f"lakehouse_ckpt_plan_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    for third in range(3):
        t = lk.Transaction(path)
        t.append(orders.filter(F.col("k") % 3 == third).repartition(2))
        t.commit()  # v1-3
    ckpt.write_parquet_checkpoint(spark, path)  # bootstrap at v3

    # --- 1: commits roll the checkpoint forward by themselves
    spark.conf.set(ckpt.AUTO_ADVANCE_CONF, "2")
    try:
        t = lk.Transaction(path)
        t.delete_where_mor(spark, F.col("k") % 13 == 0)
        t.commit()  # v4: tail of 1 < interval — no advance yet
        before = ckpt.latest_parquet_checkpoint(path)
        t = lk.Transaction(path)
        t.delete_where(spark, F.col("k") % 17 == 0)
        t.commit()  # v5: tail hits the interval — auto-advance
        auto_advanced = (
            before == 3 and ckpt.latest_parquet_checkpoint(path) == 5
        )
    finally:
        spark.conf.unset(ckpt.AUTO_ADVANCE_CONF)

    # --- 2: session-less (pyarrow) state == JSON replay
    import json as _json

    av, alive, advs, ameta = ckpt.state_arrow(path)
    jv, jlive, jdvs, _txns, jmeta, jstats = lk._state_full(path)
    arrow_state_parity = (
        (av, set(alive), advs, ameta) == (jv, jlive, jdvs, jmeta)
        and all(
            (_json.loads(s) if s else None) == jstats[f]
            for f, s in alive.items()
        )
    )

    # --- 3: the SOURCE's partition list, checkpoint route vs JSON
    schema = spark.read.format("lakehouse").load(path).schema
    pred = [("k", "<", 1000)]
    planned = {}
    for route in ("false", "true"):
        r = _LakehouseBatchReader(
            {"path": path, "planFromCheckpoint": route}, schema
        )
        r._conj = list(pred)
        planned[route] = [(p.file, p.dv_files) for p in r.partitions()]
    _pv, kept, _total = lk.prune_files(path, pred)
    source_plan_parity = (
        planned["true"] == planned["false"]
        and [f for f, _dv in planned["true"]] == kept
    )

    # --- 4: read_table routed through the distributed plan.  The
    # route is chosen at DataFrame-construction time (plan_from_
    # checkpoint reads the conf then), so both routed frames are built
    # inside the conf window and all four digests fold into ONE
    # comparison action (_audit helper; was four .agg().collect() jobs)
    h = lambda df: df.select(  # noqa: E731
        F.expr(
            "xxhash64(k, status, CAST(ROUND(price*1e6,0) AS LONG))"
        ).alias("_h")
    )
    json_pred = lk.read_table(spark, path, predicate=pred)
    json_full = lk.read_table(spark, path)
    spark.conf.set(ckpt.PLAN_MIN_FILES_CONF, "1")
    try:
        routed_pred = lk.read_table(spark, path, predicate=pred)
        routed_full = lk.read_table(spark, path)
    finally:
        spark.conf.unset(ckpt.PLAN_MIN_FILES_CONF)
    from ._audit import digest_pairs_equal

    pred_ok, full_ok = digest_pairs_equal(
        [
            (h(routed_pred), h(json_pred)),
            (h(routed_full), h(json_full)),
        ]
    )
    routed_read_parity = pred_ok and full_ok

    return (
        lk.read_table(spark, path)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_micros(F.col("price"))).cast("long").alias("price_micros"),
        )
        .withColumn("auto_advanced", F.lit(bool(auto_advanced)))
        .withColumn("arrow_state_parity", F.lit(bool(arrow_state_parity)))
        .withColumn("source_plan_parity", F.lit(bool(source_plan_parity)))
        .withColumn("routed_read_parity", F.lit(bool(routed_read_parity)))
        .orderBy("status")
    )


@query(
    "q_lakehouse_sql_ddl",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer
    ),
    merged AS (
      SELECT k,
             CASE WHEN k % 9 = 0 AND bal > 0 THEN 'MERGED' ELSE seg END
                 AS seg,
             CASE WHEN k % 9 = 0 AND bal > 0 THEN bal * 3 ELSE bal END
                 AS bal
      FROM base
    ),
    final AS (
      SELECT * FROM merged
      UNION ALL SELECT 900000001, 'SYNTH', 1.5
      UNION ALL SELECT 900000002, 'SYNTH', 2.5
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(bal * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS bal_micros,
           TRUE AS counts_consistent,
           TRUE AS name_registry_roundtrip,
           TRUE AS zorder_full_data_neutral
    FROM final
    GROUP BY seg
    ORDER BY seg
    """,
    tags=("lakehouse", "sql", "ddl", "dml", "merge", "extension"),
)
def q_lakehouse_sql_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WIDENED SQL grammar end to end (VERDICT r12 #4/#7): the
    Delta statement shapes a user hits first, every one literal SQL
    text through :func:`..lakehouse_sql.run_sql`:

    1. ``CREATE TABLE cust13 USING lakehouse LOCATION p AS SELECT``
       — CTAS bootstraps the table AND registers the name (router-
       owned registry; Spark 4.1 hands Python-source catalog scans
       empty options, so real-catalog names cannot resolve yet);
    2. ``INSERT INTO lakehouse.cust13 SELECT ...`` — by NAME, the
       other half of the base frame;
    3. ``INSERT INTO lakehouse.cust13 VALUES (..), (..)`` —
       positional cast to the table schema (SQL INSERT semantics);
    4. ``MERGE ... WHEN MATCHED AND s.bal > 0 THEN UPDATE SET ...``
       — the CONDITIONED update clause (a real gate in
       ``merge_into``: matched rows failing it pass through and are
       NOT counted, Delta's first-match-wins);
    5. ``OPTIMIZE lakehouse.cust13 ZORDER BY (k) FULL`` — the
       whole-table clustering variant (default stays incremental);
    6. ``DROP TABLE cust13`` — unregisters, data stays (external-
       table semantics), then a plain ``CREATE TABLE ... LOCATION``
       re-registers the existing table.

    Audits the oracle pins TRUE: ``counts_consistent`` — every
    statement's returned count equals the relational expectation;
    ``name_registry_roundtrip`` — the by-name aggregate equals the
    by-path aggregate before AND after the drop/re-register cycle;
    ``zorder_full_data_neutral`` — the FULL rewrite touched every
    live file and changed no row (digest-identical).

    Cites: sql/athena_sample_queries.sql (read-only SELECT — the
    reference has no DML/DDL surface; this is the engine extension)."""
    from .. import lakehouse as lk
    from ..lakehouse_sql import _NAMES, run_sql

    tag = _tag(sf_dir)
    path = str(_SCRATCH / f"lakehouse_sql_ddl_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    _NAMES.pop("cust13", None)  # re-runnable drill
    base = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    ).localCheckpoint()
    view = f"sql_ddl_base_{tag}"
    base.createOrReplaceTempView(view)

    n_ctas = run_sql(
        spark,
        f"CREATE TABLE cust13 USING lakehouse LOCATION '{path}' AS "
        f"SELECT k, seg, bal FROM {view} WHERE k % 2 = 0",
    ).collect()[0].num_inserted_rows
    n_ins_sel = run_sql(
        spark,
        f"INSERT INTO lakehouse.cust13 "
        f"SELECT k, seg, bal FROM {view} WHERE k % 2 = 1",
    ).collect()[0].num_inserted_rows
    n_ins_val = run_sql(
        spark,
        "INSERT INTO lakehouse.cust13 VALUES "
        "(900000001, 'SYNTH', 1.5), (900000002, 'SYNTH', 2.5)",
    ).collect()[0].num_inserted_rows

    merge = run_sql(
        spark,
        f"""
        MERGE INTO lakehouse.cust13 AS t
        USING (SELECT k, 'MERGED' AS seg, bal * 3 AS bal
               FROM {view} WHERE k % 9 = 0) AS s
        ON t.k = s.k
        WHEN MATCHED AND s.bal > 0 THEN UPDATE SET seg = s.seg, bal = s.bal
        """,
    ).collect()[0]
    pre_v, live_before = lk.latest_commit(path), len(lk.snapshot(path)[1])
    opt = run_sql(
        spark, "OPTIMIZE lakehouse.cust13 ZORDER BY (k) FULL"
    ).collect()[0]
    # data-neutrality digest folded into ONE action: the pre-OPTIMIZE
    # state is exactly the committed snapshot at pre_v, so both sides
    # read AFTER the rewrite (one via time travel) — same per-side
    # (count, bit_xor(xxhash64)) digest, half the jobs (_audit helper).
    # DEPENDENCY (ADVICE r14): with no independent pre-OPTIMIZE
    # measurement this checks "time travel to pre_v reproduces the
    # pre-OPTIMIZE rows", so its soundness leans on version resolution
    # being correct — a property pinned independently by
    # q_time_travel_read / q_lakehouse_restore / q_version_change_feed
    from ._audit import digest_pairs_equal

    h = lambda df: df.select(  # noqa: E731
        F.expr(
            "xxhash64(k, seg, CAST(ROUND(bal*1e6,0) AS LONG))"
        ).alias("_h")
    )
    [z_neutral] = digest_pairs_equal(
        [
            (
                h(lk.read_table(spark, path, version=pre_v)),
                h(lk.read_table(spark, path)),
            )
        ]
    )
    zorder_full_data_neutral = opt.files_rewritten == live_before and z_neutral

    # the three relational expectations fold into ONE conditional
    # aggregate over the pinned seed (was three count() jobs)
    cb = base.agg(
        F.count_if(F.expr("k % 2 = 0")).alias("a"),
        F.count_if(F.expr("k % 2 = 1")).alias("b"),
        F.count_if(F.expr("k % 9 = 0 and bal > 0")).alias("c"),
    ).collect()[0]
    counts_consistent = (
        n_ctas == cb.a
        and n_ins_sel == cb.b
        and n_ins_val == 2
        and merge.num_updated_rows == cb.c
        and merge.num_deleted_rows == 0
        and merge.num_inserted_rows == 0
    )

    agg_sql = (
        "SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(SUM(CAST(ROUND(bal * 1e6, 0) AS BIGINT)) AS BIGINT) "
        "AS bal_micros FROM {tbl} GROUP BY seg ORDER BY seg"
    )
    by_name = run_sql(spark, agg_sql.format(tbl="lakehouse.cust13"))
    by_path = run_sql(spark, agg_sql.format(tbl=f"lakehouse.`{path}`"))
    rows_of = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    # pre-drop by-name and by-path aggregates union-tagged into ONE
    # collect (was two jobs); rows_of sorts, so union order is moot.
    # by_path itself stays the (lazy) returned frame — plan untouched.
    side = lambda df, s: df.select(F.lit(s).alias("_s"), "*")  # noqa: E731
    both = side(by_name, 0).unionAll(side(by_path, 1)).collect()
    split = lambda s: sorted(tuple(r)[1:] for r in both if r["_s"] == s)  # noqa: E731
    by_path_rows = split(1)  # collected ONCE, compared twice
    roundtrip = split(0) == by_path_rows
    run_sql(spark, "DROP TABLE cust13")
    try:
        run_sql(spark, "SELECT * FROM lakehouse.cust13")
        roundtrip = False  # dropped names must not resolve
    except ValueError:
        pass
    run_sql(
        spark, f"CREATE TABLE cust13 USING lakehouse LOCATION '{path}'"
    )  # plain re-register of the EXISTING table: data survived
    name_registry_roundtrip = roundtrip and (
        rows_of(run_sql(spark, agg_sql.format(tbl="lakehouse.cust13")))
        == by_path_rows
    )

    return (
        by_path
        .withColumn("counts_consistent", F.lit(bool(counts_consistent)))
        .withColumn(
            "name_registry_roundtrip", F.lit(bool(name_registry_roundtrip))
        )
        .withColumn(
            "zorder_full_data_neutral",
            F.lit(bool(zorder_full_data_neutral)),
        )
    )


@query(
    "q_lakehouse_stream_backfill",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS value_micros,
           TRUE AS per_file_partitions,
           TRUE AS arrow_batches,
           TRUE AS exactly_once
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("lakehouse", "streaming", "datasource", "backfill",
          "extension"),
)
def q_lakehouse_stream_backfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PARTITION-BASED streaming source under a backfill-scale
    commit (VERDICT r12 #2/#3).  Round 12's
    ``SimpleDataSourceStreamReader`` materialized every micro-batch
    as a Python list of tuples on the driver — delta-sized in steady
    state, but a stream started against a fully-seeded table (or one
    backfill commit) funneled the whole table through the driver
    row-at-a-time.  The round-13 reader is the partition-based
    ``DataSourceStreamReader``: ``partitions(start, end)`` plans one
    InputPartition PER FILE of each in-range commit (driver work =
    commit metadata only), and ``read(slice)`` derives rows ON
    EXECUTORS, yielding Arrow record batches with CDF tag columns
    appended as Arrow arrays — no per-row Python loop anywhere.

    Drill: the events table lands as ONE 8-file backfill commit plus
    a second small append.  Audits the oracle pins TRUE:

    - ``per_file_partitions`` — the reader plans 8 slices for the
      backfill commit and 1 for the tail commit (per FILE, never per
      commit, never one monolithic driver batch);
    - ``arrow_batches`` — ``read(slice)`` yields
      ``pyarrow.RecordBatch`` objects (the executor contract);
    - ``exactly_once`` — the full stream replicates into a
      downstream lakehouse table through the registered SINK under
      ``(txnAppId, epoch)`` identities, and a second availableNow
      run against the same checkpoint appends NOTHING (offsets in
      Spark's checkpoint + idempotent-writer dedupe).

    The returned aggregate reads the DOWNSTREAM table — the consumer
    never touched the source snapshot, only its feed.

    Cites: jobs/downloader/glue_binance_downloader.py (the closest
    reference shape is batch re-download; streaming is an engine
    extension)."""
    from .. import lakehouse as lk
    from ..lakehouse_datasource import _LakehouseStreamReader, register

    register(spark)
    tag = _tag(sf_dir)
    src = str(_SCRATCH / f"lakehouse_backfill_src_{tag}")
    dst = str(_SCRATCH / f"lakehouse_backfill_dst_{tag}")
    ck = str(_SCRATCH / f"lakehouse_backfill_ck_{tag}")
    for p in (src, dst, ck):
        shutil.rmtree(p, ignore_errors=True)

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    t = lk.Transaction(src)
    t.append(ev.filter(F.col("event_id") % 5 != 0).repartition(8))
    t.commit()  # v1: the 8-file backfill commit
    t = lk.Transaction(src)
    t.append(ev.filter(F.col("event_id") % 5 == 0).coalesce(1))
    t.commit()  # v2: the steady-state tail

    # structural pins, on the reader itself
    import pyarrow as pa

    schema = spark.read.format("lakehouse").load(src).schema
    r = _LakehouseStreamReader({"path": src}, schema)
    parts = r.partitions({"v": 0}, {"v": 2})
    per_file_partitions = (
        len(parts) == 9
        and sorted(p.version for p in parts) == [1] * 8 + [2]
    )
    batches = list(r.read(parts[0]))
    arrow_batches = bool(batches) and all(
        isinstance(b, pa.RecordBatch) for b in batches
    )

    def run() -> None:
        (
            spark.readStream.format("lakehouse")
            .load(src)
            .writeStream.format("lakehouse")
            .option("txnAppId", f"backfill_{tag}")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start(dst)
            .awaitTermination()
        )

    run()
    v_first = lk.latest_commit(dst)
    run()  # same checkpoint, no new source commits: nothing lands
    exactly_once = lk.latest_commit(dst) == v_first

    return (
        lk.read_table(spark, dst)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_micros(F.col("value"))).cast("long").alias("value_micros"),
        )
        .withColumn(
            "per_file_partitions", F.lit(bool(per_file_partitions))
        )
        .withColumn("arrow_batches", F.lit(bool(arrow_batches)))
        .withColumn("exactly_once", F.lit(bool(exactly_once)))
        .orderBy("event_type")
    )


@query(
    "llm_stream_ingest_dedup",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY text ORDER BY doc_id % 3, doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           TRUE AS cross_batch_rejected,
           TRUE AS exactly_once,
           TRUE AS probe_bounded
    FROM ranked
    WHERE rn = 1
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("llm", "dedup-exact", "streaming", "lakehouse", "extension"),
)
def llm_stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest dedup — the production shape of exact dedup
    for a training corpus that arrives continuously: each micro-batch
    deduplicates WITHIN itself (min doc_id per sha256 fingerprint)
    and then against EVERY fingerprint previously admitted, persisted
    in the output lakehouse table itself — no side state store, the
    fingerprints ride the same transactional commits as the documents
    they describe, so crash recovery cannot desynchronize them.

    Drill: the documents corpus arrives as 3 waves (``doc_id % 3``)
    committed to a source lakehouse table up front and drained by ONE
    stream start (``maxCommitsPerBatch=1`` under a processing-time
    trigger — each commit stays its own micro-batch, so cross-batch
    dedup is exercised wave by wave while stream-start fixed cost is
    paid once, not per wave; VERDICT r13 #2).  Waves 2 and 3 replay
    documents from STRICTLY EARLIER waves under new ids (+1,000,000 /
    +1,500,000; wave 3 replays WAVE-0 docs only — see probe audit),
    and wave 3 also carries a WITHIN-batch duplicate of one of its
    own documents (+2,000,000).  Every duplicate must lose to its
    original, so the admitted set is the corpus' FIRST-SEEN
    representative per distinct text — which is what the oracle
    recomputes relationally (row_number over (wave, doc_id); the
    sf0.1 corpus carries a few organic duplicate texts, smaller SFs
    none, and the same window covers both).

    Audits pinned TRUE: ``cross_batch_rejected`` — the planted
    replays are absent downstream while their originals survive;
    ``exactly_once`` — a second run against the same checkpoint with
    no new source commits appends nothing (offsets in Spark's
    checkpoint + ``(txnAppId, epoch)`` dedupe); ``probe_bounded`` —
    the seen-set probe reads a strict subset of the live files (see
    below).

    Scale posture: only ``(fp, doc_id, lang, n_chars)`` shuffles —
    64-byte digests, never document bodies.  The seen-set probe is
    BOUNDED (VERDICT r13 #4): each admitting commit writes a bloom
    sidecar over the fingerprints it admitted
    (:func:`..llm.dedup.write_fp_bloom_sidecar`); a batch tests its
    delta-sized digest list against the sidecars and reads ONLY the
    live files of commits whose bloom hit — probe I/O scales with
    candidate duplicates, not corpus size, and a bloom's
    no-false-negative contract keeps dedup correctness unconditional.

    Cites: sql/athena_sample_queries.sql (the reference's corpus is
    append-only with no dedup surface; this composes the engine's
    dedup pillar with its streaming source)."""
    from .. import lakehouse as lk
    from ..lakehouse_datasource import register

    register(spark)
    tag = _tag(sf_dir)
    src = str(_SCRATCH / f"stream_dedup_src_{tag}")
    dst = str(_SCRATCH / f"stream_dedup_dst_{tag}")
    ck = str(_SCRATCH / f"stream_dedup_ck_{tag}")
    for p in (src, dst, ck):
        shutil.rmtree(p, ignore_errors=True)

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    # replays must reference originals from STRICTLY EARLIER waves —
    # first-seen-wins is the operator's contract, so a replay arriving
    # before its original would legitimately win
    replay_of_w0 = (
        docs.filter((F.col("doc_id") < 15) & (F.col("doc_id") % 3 == 0))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    # wave 3 replays WAVE-0 documents only (not wave 1): its digests
    # then hit commit 1's bloom but MISS commit 2's, so the bounded
    # probe provably reads a strict subset of the live files — the
    # assertion the bloom sidecars exist for (VERDICT r13 #4)
    replay_of_w0b = (
        docs.filter(
            (F.col("doc_id") >= 15)
            & (F.col("doc_id") < 45)
            & (F.col("doc_id") % 3 == 0)
        )
        .withColumn("doc_id", F.col("doc_id") + 1_500_000)
    )
    wave3_dup = (
        waves[2].orderBy("doc_id").limit(1)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
    )
    commits = [
        waves[0],
        waves[1].unionAll(replay_of_w0),
        waves[2].unionAll(replay_of_w0b).unionAll(wave3_dup),
    ]

    # driver-side admitted-row counter: fold() already collects each
    # commit's fingerprint list for the bloom sidecar, so completion
    # polling can read this dict instead of running a read_table+count
    # Spark job every 200 ms (guide §7.3/§2.6 — the poll loop was ~25
    # redundant jobs per run, pure fixed cost)
    admitted_n = {"n": 0}

    def fold(batch: DataFrame, batch_id: int) -> None:
        from ..llm.dedup import probe_seen_files, write_fp_bloom_sidecar

        # no leading batch.isEmpty() guard: it cost one Spark job on
        # every NON-EMPTY batch, and the fresh-set emptiness check
        # below still short-circuits before any commit.  Empty
        # batches cannot occur with this source (ADVICE r14): the
        # lakehouse stream only advances its offset when the source
        # table's latest commit advances (latestOffset), every src
        # commit in this drill is a non-empty append, and Spark plans
        # no microbatch when the offset is unchanged — so the guard's
        # removal is one job fewer per batch with no empty-batch
        # regression to pay for it
        fps = batch.select(
            F.sha2(F.col("text"), 256).alias("fp"),
            "doc_id", "lang", "n_chars",
        )
        firsts = (
            fps.groupBy("fp")
            .agg(
                F.min_by(
                    F.struct("doc_id", "lang", "n_chars"), F.col("doc_id")
                ).alias("d")
            )
            .select("fp", "d.doc_id", "d.lang", "d.n_chars")
        ).localCheckpoint()
        # BOUNDED seen-set probe (VERDICT r13 #4): the batch's digest
        # list (delta-sized) tests against each prior commit's bloom
        # sidecar; only LIVE files of commits whose bloom hit are
        # read — probe I/O scales with candidate duplicates, not with
        # the corpus.  Blooms have no false negatives, so a missed
        # duplicate is impossible; a false positive costs one extra
        # file read.
        digests = [r.fp for r in firsts.select("fp").collect()]
        cand, _n_live, _bounded = probe_seen_files(dst, digests)
        if cand:
            seen = spark.read.parquet(
                *[f"{dst}/{f}" for f in cand]
            ).select("fp")
            fresh = firsts.join(seen, "fp", "left_anti").localCheckpoint()
            fp_list = [r.fp for r in fresh.select("fp").collect()]
        else:
            # no bloom hit: fresh IS firsts — already checkpointed and
            # its digest list already collected; re-checkpointing and
            # re-collecting were two redundant jobs (guide §7.3 — per-action driver planning cost)
            fresh = firsts
            fp_list = digests
        if not fp_list:
            return  # a fully-duplicate wave admits nothing — do not
            # burn a downstream version on an empty commit
        t = lk.Transaction(
            dst, txn_app=f"stream_dedup_{tag}", txn_version=batch_id
        )
        t.append(fresh.coalesce(1))
        staged = [a["file"] for a in t.actions if a["op"] == "add"]
        # sidecar BEFORE the commit: an orphan sidecar from a crashed
        # commit is harmless (probes intersect with the live set)
        write_fp_bloom_sidecar(dst, staged, fp_list)
        t.commit()  # None on epoch replay — identity dedupes
        admitted_n["n"] += len(fp_list)  # after the durable commit

    for wave in commits:  # three source commits, committed up front
        t = lk.Transaction(src)
        t.append(wave.coalesce(2))
        t.commit()
    # ONE stream start drains all three waves as SEPARATE micro-batches
    # (maxCommitsPerBatch=1 under a processing-time trigger), so the
    # cross-batch dedup property is exercised batch by batch while
    # paying stream-start fixed cost once, not per wave (VERDICT r13
    # #2: the old one-availableNow-run-per-wave shape made the bench
    # 2-5x sensitive to host load on exactly these rows)
    n_expect = docs.select("text").distinct().count()
    q = (
        spark.readStream.format("lakehouse")
        .option("maxCommitsPerBatch", "1")
        .load(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    import time as _time

    deadline = _time.monotonic() + 300
    while _time.monotonic() < deadline:
        # fold() bumps admitted_n after each durable commit, so this
        # poll costs zero Spark jobs (it used to run read_table+count
        # every 200 ms); admitted fps are disjoint across commits, so
        # the running sum hits n_expect exactly when every distinct
        # text has been admitted — the same condition as before
        if admitted_n["n"] >= n_expect:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    v_done = lk.latest_commit(dst)
    # nothing new: a fresh run on the same checkpoint must append
    # nothing (offsets in Spark's checkpoint + (txnAppId, epoch))
    (
        spark.readStream.format("lakehouse")
        .load(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    exactly_once = lk.latest_commit(dst) == v_done

    admitted = lk.read_table(spark, dst)
    # audit folds (guide §7.3 — per-action driver planning cost): the two planted-replay counts are one
    # conditional aggregate over docs (their filters are disjoint
    # doc_id ranges, so the union count equals the sum), the two
    # admitted-side counts are one aggregate, and the full-corpus
    # distinct-text count is n_expect — already computed above, by the
    # identical expression.  5 jobs -> 2, values unchanged.
    n_planted = (
        docs.filter(
            (F.col("doc_id") < 45) & (F.col("doc_id") % 3 == 0)
        ).count()
        + 1
    )
    arow = admitted.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("doc_id") >= 1_000_000).alias("n_replay"),
    ).collect()[0]
    cross_batch_rejected = (
        arow.n_replay == 0
        and arow.n == n_expect
        and n_planted > 1  # the drill really planted duplicates
    )
    # bounded-probe audit, controlled and deterministic: admitted
    # fingerprints are DISJOINT across commits (first-seen-wins), so
    # doc 0's digest can live only in commit 1 — probing it must read
    # a strict subset of the live files; a never-ingested digest must
    # read NOTHING (bloom fp rate ~3e-7).  On a one-commit table
    # boundedness is vacuous (the sf1 scratch corpus collapses waves
    # into one admitting commit).
    import hashlib

    from ..llm.dedup import probe_seen_files

    fp0 = (
        waves[0].orderBy("doc_id").limit(1)
        .select(F.sha2(F.col("text"), 256).alias("fp"))
        .collect()[0].fp
    )
    cand_a, live_a, _ = probe_seen_files(dst, [fp0])
    cand_b, _, _ = probe_seen_files(
        dst, [hashlib.sha256(b"__never_ingested__").hexdigest()]
    )
    probe_bounded = (
        len(cand_b) == 0
        and len(cand_a) > 0
        and (live_a < 2 or len(cand_a) < live_a)
    )

    return (
        admitted.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .withColumn(
            "cross_batch_rejected", F.lit(bool(cross_batch_rejected))
        )
        .withColumn("exactly_once", F.lit(bool(exactly_once)))
        .withColumn("probe_bounded", F.lit(bool(probe_bounded)))
        .orderBy("lang")
    )


@query(
    "q_lakehouse_convert_in_place",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 1e6, 0) AS BIGINT)) AS BIGINT)
               AS price_micros,
           TRUE AS bytes_untouched,
           TRUE AS skipping_immediate,
           TRUE AS time_travel_to_plain
    FROM orders
    WHERE o_orderkey % 11 <> 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("lakehouse", "convert", "migration", "extension"),
)
def q_lakehouse_convert_in_place(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONVERT TO LAKEHOUSE (Delta's ``CONVERT TO DELTA``) — the
    migration operator that makes an EXISTING plain-parquet directory
    transactional IN PLACE: one commit stamps an add action per file
    with footer stats; no byte of data moves.  At 100 TB this is the
    difference between adopting the table format and rewriting 100 TB.

    Drill: orders lands as a plain 4-file ``spark.write.parquet``
    directory; ``CONVERT TO LAKEHOUSE parquet.`dir``` runs through the
    SQL router; then the directory behaves as a full table — a MOR
    DELETE (every 11th key), a snapshot read, and time travel BACK TO
    the pre-DML converted state.  Audits the oracle pins TRUE:

    - ``bytes_untouched`` — the original part files still exist at
      their original paths with their original sizes (the log
      references them in place);
    - ``skipping_immediate`` — a contradictory predicate prunes every
      file using the stats the CONVERT commit carried (no separate
      ANALYZE pass);
    - ``time_travel_to_plain`` — ``VERSION AS OF 1`` (the convert
      commit) equals the original plain-parquet frame, digest for
      digest.

    The returned aggregate reads the post-DELETE table and must equal
    the oracle's relational recompute.

    Cites: jobs/etl/glue_spark_trades_etl.py (the reference lands
    exactly such plain parquet directories; CONVERT is the engine
    extension that upgrades them without a rewrite)."""
    from .. import lakehouse as lk
    from ..lakehouse_sql import run_sql

    path = str(_SCRATCH / f"lakehouse_convert_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    orders.repartition(4).write.parquet(path)
    before = {
        str(p.relative_to(path)): p.stat().st_size
        for p in pathlib.Path(path).rglob("part-*.parquet")
    }
    out = run_sql(spark, f"CONVERT TO LAKEHOUSE parquet.`{path}`")
    row = out.collect()[0]
    assert row.converted_version == 1 and row.n_files == 4

    run_sql(spark, f"DELETE FROM lakehouse.`{path}` WHERE k % 11 = 0")

    after = {
        str(p.relative_to(path)): p.stat().st_size
        for p in pathlib.Path(path).rglob("part-*.parquet")
    }
    bytes_untouched = all(
        after.get(f) == sz for f, sz in before.items()
    )
    _v, kept, total = lk.prune_files(path, [("k", "<", 0)])
    skipping_immediate = kept == [] and total >= 4

    # v1-vs-plain parity in ONE action (was two: a pre-CONVERT digest
    # job plus a post-DML one): the seed part files are immutable on
    # disk (bytes_untouched pins exactly that above), so the plain
    # side reads those pinned paths AFTER the DML and compares against
    # the v1 time travel in the same job (_audit helper)
    from ._audit import digest_pairs_equal

    h = lambda df: df.select(  # noqa: E731
        F.expr(
            "xxhash64(k, status, CAST(ROUND(price*1e6,0) AS LONG))"
        ).alias("_h")
    )
    plain = spark.read.parquet(
        *[str(pathlib.Path(path) / f) for f in sorted(before)]
    )
    [time_travel_to_plain] = digest_pairs_equal(
        [(h(lk.read_table(spark, path, version=1)), h(plain))]
    )

    return (
        lk.read_table(spark, path)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_micros(F.col("price"))).cast("long").alias("price_micros"),
        )
        .withColumn("bytes_untouched", F.lit(bool(bytes_untouched)))
        .withColumn(
            "skipping_immediate", F.lit(bool(skipping_immediate))
        )
        .withColumn(
            "time_travel_to_plain", F.lit(bool(time_travel_to_plain))
        )
        .orderBy("status")
    )
