"""Streaming queries registered with the driver contract.

``q_streaming_minute_candles`` runs a REAL Structured Streaming job
(file-source replay → watermarked tumbling windows → memory sink,
drained with trigger(availableNow)) and returns the sink as a batch
DataFrame — so the stream's output is hash-verified against a batch
SQL oracle. ``q_sessionize`` is the batch (window-function) rendering
of the custom stateful session operator; the streaming
``applyInPandasWithState`` twin is equivalence-tested in
tests/test_streaming.py (its flush-on-timeout tail makes it
rows-only-unfriendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import streaming
from ..tables import load
from .registry import query


@query(
    "q_streaming_minute_candles",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute,
           event_type,
           COUNT(*) AS num_trades,
           ROUND(SUM(CAST(event_id % 7 + 1 AS DOUBLE)), 6) AS total_volume,
           ROUND(SUM(value * CAST(event_id % 7 + 1 AS DOUBLE))
                 / NULLIF(SUM(CAST(event_id % 7 + 1 AS DOUBLE)), 0), 6) AS vwap_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY 1, 2
    ORDER BY minute, event_type
    """,
    tags=("streaming", "extension"),
)
def q_streaming_minute_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming replay of the events zone → 1-minute tumbling-window
    candles with a 2-minute watermark → memory sink. The returned
    DataFrame is the *stream's* output; the oracle recomputes the same
    candles in batch SQL, so the whole streaming path (source, window
    state, watermark, sink) is hash-checked."""
    stream = streaming.read_events_stream(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    )
    sink = streaming.run_to_memory(streaming.minute_candles(stream))
    return (
        spark.table(sink)
        .select(
            F.col("w.start").alias("minute"),
            "event_type",
            "num_trades",
            "total_volume",
            "vwap_value",
        )
        .orderBy("minute", "event_type")
    )


@query(
    "q_rollup_served_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           COUNT(*) AS num_trades,
           ROUND(SUM(CAST(event_id % 7 + 1 AS DOUBLE)), 6) AS total_volume,
           ROUND(SUM(value * CAST(event_id % 7 + 1 AS DOUBLE))
                 / NULLIF(SUM(CAST(event_id % 7 + 1 AS DOUBLE)), 0), 4) AS vwap_value,
           MIN(value) AS low,
           MAX(value) AS high
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    tags=("rollup", "continuous-aggregate", "extension"),
)
def q_rollup_served_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable continuous-aggregate pattern: daily candles
    answered FROM the minute rollup (1000× smaller than the fact table
    at scale), not from raw events. The oracle recomputes from raw —
    a hash match proves the re-aggregation semantics (sum-of-sums,
    min-of-mins, VWAP recombined from carried numerator/denominator —
    never avg-of-avgs) are exact."""
    from ..rollups import build_minute_rollup, serve_from_rollup

    e = load(spark, sf_dir, "events").withColumn(
        "qty", ((F.col("event_id") % 7) + 1).cast("double")
    )
    rollup = build_minute_rollup(e)
    served = serve_from_rollup(rollup, "day")
    # 4dp, not the usual 6: rollup-path and direct-path sums order
    # differently, and a VWAP landing exactly on a 1e-6 rounding
    # boundary (observed: 70.0490625) flips the last digit between
    # them. Coarser rounding shrinks the boundary-hit odds ~1e4x.
    return served.withColumn("vwap_value", F.round("vwap_value", 4)).orderBy(
        "day", "event_type"
    )


@query(
    "q_streaming_enriched_candles",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute,
           category,
           COUNT(*) AS n_events,
           ROUND(SUM(value * weight), 6) AS weighted_value
    FROM events
    JOIN (VALUES ('click', 1.0, 'engagement'),
                 ('view', 0.5, 'engagement'),
                 ('purchase', 5.0, 'conversion'),
                 ('signup', 3.0, 'conversion'),
                 ('error', 0.0, 'ops')) AS dim(event_type, weight, category)
      USING (event_type)
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY 1, 2
    ORDER BY minute, category
    """,
    tags=("streaming", "stream-static-join", "extension"),
)
def q_streaming_enriched_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the replayed event stream broadcast-
    joined to a weight/category dimension, then windowed into
    per-minute per-category weighted totals. Hash-checked against the
    equivalent batch join — verifying the stream-side join semantics,
    not just the window math."""
    stream = streaming.read_events_stream(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    )
    sink = streaming.run_to_memory(
        streaming.enriched_category_candles(spark, stream)
    )
    return (
        spark.table(sink)
        .select(
            F.col("w.start").alias("minute"),
            "category",
            "n_events",
            "weighted_value",
        )
        .orderBy("minute", "category")
    )


@query(
    "q_streaming_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "dedup", "extension"),
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: ``dropDuplicatesWithinWatermark`` on
    (user_id, event_type) over the replayed stream — watermark-bounded
    state, the scale contract for unbounded dedup. The surviving-row
    count per type equals the batch COUNT(DISTINCT user_id), which the
    oracle hash-checks (WHICH duplicate survives is arrival-order
    dependent, so the query verifies the deterministic projection of
    the dedup, not the arbitrary row payloads)."""
    stream = streaming.read_events_stream(spark, sf_dir)
    deduped = streaming.dedup_stream(stream)
    sink = streaming.run_to_memory_append_available_now(deduped)
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "q_streaming_late_data_audit",
    oracle="""
    WITH wm AS (
        SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM events
        WHERE ts >= TIMESTAMP '2024-01-30'
    ), fin AS (
        SELECT event_type, date_trunc('minute', ts) AS wstart
        FROM events, wm
        WHERE date_trunc('minute', ts) + INTERVAL 1 MINUTE <= wm.w
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT wstart) AS BIGINT) AS n_windows_finalized,
           CAST(COUNT(*) AS BIGINT) AS n_events_finalized,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
            WHERE ts >= TIMESTAMP '2024-01-30') AS n_ontime_arrivals,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
            WHERE ts < TIMESTAMP '2024-01-30') AS n_late_arrivals
    FROM fin GROUP BY event_type ORDER BY event_type
    """,
    tags=("streaming", "watermark", "late-data", "extension"),
)
def q_streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting + watermark finalization on a two-batch
    replay (VERDICT r6 item 7): batch 1 delivers the final day's
    events (driving the watermark to max(head) − 30 min), batch 2
    delivers every EARLIER event — hours-to-days late.  The
    watermarked 1-minute append aggregation then exhibits the 4.1.x
    semantics this build MEASURES (empirically pinned, see
    tests/test_streaming.py): late rows join their (long-expired)
    windows and those windows finalize immediately — emission is
    ``window.end <= watermark``, boundary-exact — while the head's
    last 30 minutes of windows stay open in state and never reach the
    append sink.  The result reports, per event type, the finalized
    window/event counts plus the arrival accounting a production
    stream alarms on (on-time vs late input rows, from per-batch
    progress).  The oracle reconstructs all four numbers from the
    cutoff definition and the ``end <= max(head) − 30min`` emission
    frontier in pure SQL, so the hash match pins watermark
    computation, the finalization boundary, and state eviction.

    Scale: windowed-agg state is watermark-bounded (the 100-TB
    contract for unbounded streams); the audit columns are progress
    metadata — zero extra data-plane cost."""
    stream = streaming.read_events_stream_late_replay(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink, metrics = streaming.run_to_memory_append_with_metrics(
        agg, partitions=4
    )
    ontime = metrics["batch_inputs"][0] if metrics["batch_inputs"] else 0
    late = metrics["input_rows"] - ontime
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_windows_finalized"),
            F.sum("n").cast("long").alias("n_events_finalized"),
        )
        .withColumn("n_ontime_arrivals", F.lit(ontime).cast("long"))
        .withColumn("n_late_arrivals", F.lit(late).cast("long"))
        .orderBy("event_type")
    )


_SESSIONIZE_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    WHERE user_id < 30
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
"""


@query(
    "q_streaming_sessionize",
    oracle=_SESSIONIZE_ORACLE,
    tags=("streaming", "stateful", "extension"),
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator end to end:
    ``applyInPandasWithState`` session windows over a replayed stream,
    drained to a memory sink — hash-verified against the batch SQL
    oracle.  The replay carries a per-user end-of-stream sentinel
    (:data:`market_etl_spark.streaming.FLUSH_SENTINEL_US`), so open
    sessions close in-band, state drains to zero inside the data batch,
    and ``trigger(availableNow)`` terminates deterministically — no
    processing-time-timeout wall-clock (was a hard 3s floor; the
    timeout path remains in the operator for live 24/7 streams and is
    equivalence-tested in tests/test_streaming.py)."""
    stream = streaming.read_events_stream_with_flush(spark, sf_dir).filter(
        F.col("user_id") < 30
    )
    sink = streaming.run_to_memory_append_available_now(
        streaming.sessionize_stream(stream, live=False)
    )
    return spark.table(sink).orderBy("user_id", "session_start")


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    WHERE user_id < 30
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "sessionization", "extension"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — batch rendering of
    the custom stateful operator via lag-gap flag + running sum. The
    streaming applyInPandasWithState twin
    (:func:`market_etl_spark.streaming.sessionize_stream`) must agree
    on every closed session (tests/test_streaming.py)."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return streaming.sessionize_batch(e).orderBy("user_id", "session_start")


@query(
    "q_rollup_incremental_refresh",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           COUNT(*) AS num_trades,
           ROUND(SUM(CAST(event_id % 7 + 1 AS DOUBLE)), 6) AS total_volume,
           ROUND(SUM(value * CAST(event_id % 7 + 1 AS DOUBLE))
                 / NULLIF(SUM(CAST(event_id % 7 + 1 AS DOUBLE)), 0), 4) AS vwap_value,
           MIN(value) AS low,
           MAX(value) AS high
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    tags=("rollup", "incremental-refresh", "extension"),
)
def q_rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate maintenance: the rollup is
    built from history (ts < 2024-01-15), then a late delta (the rest)
    is folded in via :func:`market_etl_spark.rollups.refresh_rollup` —
    only the delta's raw rows are aggregated; the rolled history
    contributes aggregate rows alone. Serving daily candles from the
    incrementally-maintained rollup must hash-match the oracle's
    from-scratch recompute over ALL raw events — the associativity
    proof that repeated merges never drift."""
    from ..rollups import build_minute_rollup, refresh_rollup, serve_from_rollup

    e = load(spark, sf_dir, "events").withColumn(
        "qty", ((F.col("event_id") % 7) + 1).cast("double")
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    history = build_minute_rollup(e.filter(F.col("ts") < cut))
    refreshed = refresh_rollup(history, e.filter(F.col("ts") >= cut))
    served = serve_from_rollup(refreshed, "day")
    # 4dp as in q_rollup_served_daily: rollup-path sums order differently
    return served.withColumn("vwap_value", F.round("vwap_value", 4)).orderBy(
        "day", "event_type"
    )


@query(
    "q_streaming_attribution",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts FROM events
        WHERE event_type = 'click' AND user_id < 40
    ), purchases AS (
        SELECT user_id, ts AS purchase_ts, value FROM events
        WHERE event_type = 'purchase' AND user_id < 40
    )
    SELECT c.user_id,
           COUNT(*) AS n_attributed,
           ROUND(SUM(p.value), 4) AS attributed_value,
           MIN(p.purchase_ts) AS first_purchase_ts,
           MAX(p.purchase_ts) AS last_purchase_ts
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts < c.click_ts + INTERVAL 2 HOUR
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
    tags=("streaming", "stream-stream-join", "extension"),
)
def q_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM watermarked interval join: purchases attributed to
    the same user's clicks within the preceding 2 hours, replayed
    through two watermarked stream sides whose join condition bounds
    the state Structured Streaming must hold (clicks past
    watermark + window are reclaimed). The drained (click, purchase)
    pairs aggregate per user and must hash-match the batch interval
    join the oracle runs — stream and batch semantics agree on a
    finite replay. The user_id < 40 cut keeps the pair fan-out
    result-sized."""
    stream = streaming.read_events_stream(spark, sf_dir).filter(
        F.col("user_id") < 40
    )
    pairs = streaming.attributed_purchases_stream(stream)
    # the user_id < 40 cut bounds keyed state to ≤40 join keys — 4
    # state partitions, not the session default, sizes checkpoint I/O
    sink = streaming.run_to_memory_append_available_now(pairs, partitions=4)
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.round(F.sum("purchase_value"), 4).alias("attributed_value"),
            F.min("purchase_ts").alias("first_purchase_ts"),
            F.max("purchase_ts").alias("last_purchase_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "q_streaming_attribution_outer",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts FROM events
        WHERE event_type = 'click' AND user_id >= 0 AND user_id < 40
    ), purchases AS (
        SELECT user_id, ts AS purchase_ts, value FROM events
        WHERE event_type = 'purchase' AND user_id >= 0 AND user_id < 40
    )
    SELECT c.user_id,
           COUNT(*) AS n_rows,
           COUNT(p.purchase_ts) AS n_matched,
           CAST(SUM(CASE WHEN p.purchase_ts IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched_clicks,
           ROUND(SUM(COALESCE(p.value, 0)), 4) AS attributed_value
    FROM clicks c LEFT JOIN purchases p
      ON c.user_id = p.user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts < c.click_ts + INTERVAL 2 HOUR
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
    tags=("streaming", "stream-stream-join", "outer-join", "extension"),
)
def q_streaming_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join, fully drained: clicks
    with no purchase in their 2-hour forward window emit null-extended
    rows — but ONLY in a batch whose watermark has passed
    click_ts + 2h, so the replay appends two far-future sentinel waves
    (user −1, both event types — the global watermark is the MIN of
    the two sides) that push the watermark months ahead and force the
    final eviction pass.  After the drain, the streamed LEFT OUTER
    result must equal the batch LEFT OUTER join exactly, which is
    what the oracle computes — no watermark term appears in the SQL,
    so the hash match proves the outer-join state machine (eager inner
    matches + watermark-certified null emission + state reclaim)
    converges to relational semantics on a finite replay.

    Scale: join state is bounded by watermark + window on both sides
    (the production contract for unbounded outer joins); the sentinel
    waves are O(1) rows."""
    stream = streaming.read_events_stream_outer_drain(spark, sf_dir).filter(
        F.col("user_id") < 40
    )
    pairs = streaming.attributed_clicks_outer_stream(stream)
    sink = streaming.run_to_memory_append_available_now(pairs, partitions=4)
    return (
        spark.table(sink)
        .filter(F.col("c_user") >= 0)  # drop the sentinel key
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("purchase_ts").alias("n_matched"),
            F.sum(F.when(F.col("purchase_ts").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unmatched_clicks"),
            F.round(F.sum(F.coalesce("purchase_value", F.lit(0.0))), 4).alias(
                "attributed_value"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "q_streaming_cdc_upsert",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value,
           COUNT(DISTINCT day(ts)) AS n_days
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "cdc", "merge", "extension"),
)
def q_streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE INTO (CDC apply): a multi-micro-batch replay is
    folded into a Hive-partitioned parquet target via foreachBatch →
    partition-scoped merge. The target is seeded with day ≤ 10 correct
    rows (must SURVIVE — the stream never touches them), day 11–20
    rows poisoned to value = -999 (must be UPDATED on key match), and
    nothing for day ≥ 21 (must be INSERTED, creating new partitions).
    The final on-disk state aggregates to the oracle's full-table
    recompute only if all three MERGE paths executed correctly across
    every micro-batch."""
    import pathlib as _pl

    from ..streaming import _SCRATCH

    tag = _pl.Path(sf_dir.rstrip("/")).name.replace(".", "_")
    path = str(_SCRATCH / f"cdc_target_{tag}")
    e = load(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    # one-scan seed: survive days (<=10) verbatim + poisoned days
    # (11-20) in a single projected pass (the prior unionByName form
    # scanned events twice for the same rows)
    seed = e.filter(F.col("day") <= 20).withColumn(
        "value",
        F.when(F.col("day") > 10, F.lit(-999.0)).otherwise(F.col("value")),
    )
    # no repartition before this write: the single-file source scan
    # runs in a handful of tasks, so fragmentation is bounded at
    # tasks x 20 dirs, and a day-clustering shuffle costs more than it
    # saves here (and would fan to shuffle.partitions empty tasks in a
    # vanilla 200-partition session)
    seed.write.mode("overwrite").partitionBy("day").parquet(path)
    # 2 time-ranged replay files (round-8 floor cuts: 5 → 3 → 2): the
    # day > 10 CDC cut still spans 2 non-empty micro-batches — the
    # first update-only (poisoned days 11-15), the second mixed
    # update+insert (16-20 updates, 21+ new partitions) — so all three
    # MERGE paths (survive / update / insert) still replay across
    # batch boundaries, at the minimum per-batch fixed cost (each
    # extra batch is a trigger + checkpoint commit + merge job round).
    stream = (
        streaming.read_events_stream_multibatch(spark, sf_dir, n_files=2)
        .withColumn("day", F.dayofmonth("ts"))
        .filter(F.col("day") > 10)
    )
    streaming.run_cdc_apply(stream, path, ["event_id"], ["day"])
    final = spark.read.parquet(path)
    return (
        final.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.countDistinct("day").alias("n_days"),
        )
        .orderBy("event_type")
    )


@query(
    "q_session_paths",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) > 1800000000
                    OR LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WHERE user_id < 20
    ), sess AS (
        SELECT *, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           string_agg(event_type, '→' ORDER BY ts, event_id) AS path
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    tags=("sessionize", "array-agg", "extension"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered ARRAY aggregation: each session's full event-type path
    as a list, ordered by (ts, event_id). Spark has no ORDER BY inside
    collect_list (collection order is partition-arbitrary), so the
    deterministic rendering is collect_list of (sort-key, value)
    structs → sort_array → field extraction — the struct sort carries
    the ordering through the unordered aggregate. Arrays stay
    session-sized (tens of elements); the extraction HOF runs over
    aggregated rows only.

    The path is rendered as ONE '→'-joined string, not a top-level
    array column: the driver's canonicalizer hashes pandas values and
    numpy arrays are unhashable (the round-2 q_value_quartiles /
    round-3 q_session_paths failure class — guarded fleet-wide by
    tests/test_registry_contract.py::test_no_complex_top_level_columns)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            prev_ts.isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sid = F.sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("sid", sid)
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(ts,"
                " event_id, event_type))), x -> x.event_type), '→')"
            ).alias("path"),
        )
        .drop("sid")
        .orderBy("user_id", "session_start")
    )


@query(
    "q_streaming_windowed_topk",
    oracle="""
    WITH agg AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
                   AS value_micros
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
        GROUP BY 1, 2
    )
    SELECT hour, event_type, n_events, value_micros
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY hour
            ORDER BY value_micros DESC, event_type) AS rn
        FROM agg
    ) WHERE rn <= 3
    ORDER BY hour, value_micros DESC, event_type
    """,
    tags=("streaming", "topk", "extension"),
)
def q_streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 'trending' top-k: the replayed stream aggregates into
    hourly per-event-type totals (watermarked tumbling windows, the
    streaming-state side), and the top-3-per-window rank runs OVER THE
    SINK — windows × types rows, never events — the standard
    two-layer serving shape for leaderboards (state in the stream,
    ranking at read time). Totals carried as exact integer micro-units
    so the cross-engine hash is FP-proof."""
    stream = streaming.read_events_stream(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
    )
    sink = streaming.run_to_memory(agg)
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("hour").orderBy(
            F.col("value_micros").desc(), "event_type"
        )
    )
    return (
        spark.table(sink)
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "value_micros",
        )
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= 3)
        .drop("_rn")
        .orderBy("hour", F.col("value_micros").desc(), "event_type")
    )
