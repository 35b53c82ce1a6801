"""Streaming extension tests: windowed replay and the custom stateful
sessionization operator (applyInPandasWithState vs batch equivalence)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from market_etl_spark import streaming
from market_etl_spark.tables import load

from conftest import SF_SMOKE


def test_streaming_candles_match_batch(spark):
    from market_etl_spark.functions import round6, vwap

    stream = streaming.read_events_stream(spark, SF_SMOKE)
    sink = streaming.run_to_memory(streaming.minute_candles(stream))
    got = {
        (r["w"]["start"], r["event_type"]): (r["num_trades"], r["total_volume"], r["vwap_value"])
        for r in spark.table(sink).collect()
    }
    e = load(spark, SF_SMOKE, "events").withColumn(
        "qty", ((F.col("event_id") % 7) + 1).cast("double")
    )
    batch = (
        e.groupBy(F.date_trunc("minute", "ts").alias("minute"), "event_type")
        .agg(
            F.count("*").alias("num_trades"),
            round6(F.sum("qty")).alias("total_volume"),
            round6(vwap(F.col("value"), F.col("qty"))).alias("vwap_value"),
        )
        .collect()
    )
    expect = {
        (r["minute"], r["event_type"]): (r["num_trades"], r["total_volume"], r["vwap_value"])
        for r in batch
    }
    assert got == expect and len(got) > 0


def test_stateful_sessionize_matches_batch(spark):
    """The streaming operator must emit exactly the sessions the batch
    window computation finds: closed sessions emit incrementally and
    each user's final open session flushes when its processing-time
    timeout fires during the availableNow drain."""
    events = load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 20)
    expect = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in streaming.sessionize_batch(events).collect()
    }

    stream = streaming.read_events_stream(spark, SF_SMOKE).filter(F.col("user_id") < 20)
    name = streaming.run_to_memory_append(streaming.sessionize_stream(stream))
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(name).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_stream_static_enrichment_matches_batch_join(spark):
    """The stream-static broadcast join must agree with the same join
    done in batch — per-minute per-category weighted totals."""
    from market_etl_spark.functions import round6

    stream = streaming.read_events_stream(spark, SF_SMOKE)
    name = streaming.run_to_memory(
        streaming.enriched_category_candles(spark, stream)
    )
    got = {
        (r["w"]["start"], r.category): (r.n_events, r.weighted_value)
        for r in spark.table(name).collect()
    }
    dim = spark.createDataFrame(
        streaming.EVENT_DIM_ROWS, "event_type string, weight double, category string"
    )
    batch = (
        load(spark, SF_SMOKE, "events")
        .join(dim, "event_type")
        .groupBy(F.date_trunc("minute", "ts").alias("minute"), "category")
        .agg(
            F.count("*").alias("n"),
            round6(F.sum(F.col("value") * F.col("weight"))).alias("wv"),
        )
        .collect()
    )
    expect = {(r.minute, r.category): (r.n, r.wv) for r in batch}
    assert got == expect and len(got) > 0


def test_streaming_dedup_first_arrival_per_key(spark):
    """Streaming dedup output: exactly one row per (user_id,
    event_type) pair present in the input."""
    stream = streaming.read_events_stream(spark, SF_SMOKE)
    name = streaming.run_to_memory_append_available_now(
        streaming.dedup_stream(stream)
    )
    out = spark.table(name)
    n = out.count()
    assert n == out.select("user_id", "event_type").distinct().count()
    expect = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert n == expect


def test_stream_stream_attribution_matches_batch_interval_join(spark):
    """Stream-stream watermarked interval join: the drained
    (click, purchase) pairs equal the batch interval join over the
    same finite replay."""
    stream = streaming.read_events_stream(spark, SF_SMOKE).filter(
        F.col("user_id") < 40
    )
    name = streaming.run_to_memory_append_available_now(
        streaming.attributed_purchases_stream(stream)
    )
    got = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in spark.table(name).collect()
    }
    e = load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 40)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts < click_ts + interval 2 hours"
        ),
    ).collect()
    expect = {
        (r.c_user, r.click_ts, r.purchase_ts, r.purchase_value) for r in batch
    }
    assert got == expect and len(got) > 0


def test_cdc_apply_multibatch_merges_all_paths(spark, tmp_path):
    """foreachBatch CDC apply: multiple micro-batches, and the final
    table reflects update/insert/survive paths with no poisoned rows."""
    from market_etl_spark.tables import load

    path = str(tmp_path / "cdc_target")
    e = load(spark, SF_SMOKE, "events").withColumn("day", F.dayofmonth("ts"))
    seed = e.filter(F.col("day") <= 10).unionByName(
        e.filter((F.col("day") > 10) & (F.col("day") <= 20)).withColumn(
            "value", F.lit(-999.0)
        )
    )
    seed.write.mode("overwrite").partitionBy("day").parquet(path)
    stream = (
        streaming.read_events_stream_multibatch(spark, SF_SMOKE)
        .withColumn("day", F.dayofmonth("ts"))
        .filter(F.col("day") > 10)
    )
    n_batches = streaming.run_cdc_apply(stream, path, ["event_id"], ["day"])
    assert n_batches >= 2, "replay must span multiple micro-batches"
    final = spark.read.parquet(path)
    assert final.filter(F.col("value") == -999.0).count() == 0
    assert final.count() == e.count()
    assert final.select("event_id").distinct().count() == e.count()


def test_rocksdb_state_store_provider_equivalent(spark):
    """The streaming candle aggregation produces identical results
    under the RocksDB state-store provider — the 100 TB state backend
    (state spills beyond executor heap; bounded memory per stateful
    partition). Proves the engine's streaming surface is
    provider-agnostic and the RocksDB JNI path works in this build."""
    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.streaming import minute_candles, read_events_stream, run_to_memory

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = read_events_stream(spark, SF_SMOKE).filter(
            (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        )
        sink = run_to_memory(minute_candles(stream))
        got = sorted(
            map(tuple, spark.table(sink).select(
                F.col("w.start"), "event_type", "num_trades",
                "total_volume", "vwap_value").collect())
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # Default-provider reference from the registered (oracle-green) query.
    want = sorted(
        map(tuple, REGISTRY["q_streaming_minute_candles"].fn(
            spark, SF_SMOKE).select(
            "minute", "event_type", "num_trades",
            "total_volume", "vwap_value").collect())
    )
    assert got == want


def test_watermark_finalization_semantics_pinned(spark, tmp_path):
    """Pin the 4.1.x behaviors q_streaming_late_data_audit depends on,
    measured on a two-batch file replay with an exact boundary case:

    1. append emission is ``window.end <= watermark`` (boundary
       INCLUSIVE — a window ending exactly at the watermark emits);
    2. rows arriving BEHIND the watermark are not dropped: they join
       their (long-expired) windows, which finalize immediately;
    3. windows past the frontier stay in state (never reach the sink).

    If a Spark upgrade changes any of these, this test fails before
    the driver's oracle compare does.
    """
    import os

    from pyspark.sql import functions as F

    zone = tmp_path / "zone"
    zone.mkdir()
    # head: max ts 10:00:15, delay 10s -> wm 10:00:05; the [10:00:00,
    # 10:00:05) window ends EXACTLY at the watermark.  Late file: one
    # row at 08:00:01, hours behind.
    head = spark.createDataFrame(
        [("2024-01-01 10:00:03",), ("2024-01-01 10:00:15",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    late = spark.createDataFrame(
        [("2024-01-01 08:00:01",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    for i, (df, nm) in enumerate(((head, "a"), (late, "b"))):
        tmp = zone / f"_t{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        (part,) = [p for p in tmp.glob("part-*.parquet")]
        part.rename(zone / f"{nm}.parquet")
        os.utime(zone / f"{nm}.parquet", (1_000_000 + i * 100,) * 2)
    schema = spark.read.parquet(str(zone / "a.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(zone))
    )
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from market_etl_spark.streaming import run_to_memory_append_with_metrics

    sink, metrics = run_to_memory_append_with_metrics(agg, partitions=2)
    rows = {
        (str(r["w"]["start"]), str(r["w"]["end"]), r["n"])
        for r in spark.table(sink).collect()
    }
    assert metrics["batch_inputs"] == [2, 1]  # head batch, then late batch
    # (1) boundary window end == wm emits; (2) the late 08:00 window
    # finalized despite arriving behind the watermark; (3) the
    # 10:00:15 window (beyond the frontier) is withheld.
    assert rows == {
        ("2024-01-01 10:00:00", "2024-01-01 10:00:05", 1),
        ("2024-01-01 08:00:00", "2024-01-01 08:00:05", 1),
    }
    assert metrics["dropped_by_watermark"] == 0


def test_transform_with_state_running_totals(spark):
    """Spark 4's transformWithState arbitrary-state API, gated on the
    environment: the state protocol is protobuf-based and
    ``google.protobuf`` is not installed in this sandbox (installs are
    disallowed), so the query crashes at driver-worker init with
    `ImportError: cannot import name 'descriptor'` (verified round 7).
    The operator below is complete and sentinel-drained; when the
    environment gains protobuf this test runs it end to end against
    the batch aggregate.  Until then the engine's arbitrary-state
    surface is applyInPandasWithState (fully oracle-verified)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf (absent here)",
    )
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from market_etl_spark import streaming
    from market_etl_spark.tables import load

    SENT = streaming.FLUSH_SENTINEL_US

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.state = handle.getValueState("agg", "n long, sum_micros long")

        def handleInputRows(self, key, rows, timer_values):
            n, s = 0, 0
            flush = False
            for pdf in rows:
                ts_us = pdf["ts"].astype("int64") // 1000
                sent = ts_us >= SENT
                flush = flush or bool(sent.any())
                data = pdf[~sent]
                n += len(data)
                if len(data):
                    s += int((data["value"] * 1e6 // 1).astype("int64").sum())
            if self.state.exists():
                pn, ps = self.state.get()
                n, s = n + pn, s + ps
            if flush:
                self.state.clear()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "sum_micros": [s]}
                )
            else:
                self.state.update((n, s))

        def close(self):
            pass

    stream = streaming.read_events_stream_with_flush(spark, SF_SMOKE).filter(
        F.col("user_id") < 30
    )
    out = (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            "user_id long, n_events long, sum_micros long",
            "append",
            "none",
        )
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sink = streaming.run_to_memory_append_available_now(out, partitions=4)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = sorted(
        (r.user_id, r.n_events, r.sum_micros)
        for r in spark.table(sink).collect()
    )
    want = sorted(
        (r.user_id, r.n_events, r.sum_micros)
        for r in load(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") < 30)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1e6).cast("long")).alias(
                "sum_micros"
            ),
        )
        .collect()
    )
    assert got == want


def test_crash_recovery_reuses_checkpointed_offsets(spark, tmp_path):
    """Kill a foreachBatch CDC stream AFTER batch 1's merge landed but
    BEFORE its commit, restart from the same checkpoint: the committed
    batch 0 must NOT be re-read (its offsets are in the commit log),
    the uncommitted batch 1 must be REPLAYED with the identical file
    set, and the double-applied merge must be idempotent (no dups, no
    loss)."""
    import os
    import shutil

    from market_etl_spark.streaming import run_cdc_apply_resumable

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 20.0)], "id long, day int, val double"
    ).write.partitionBy("day").parquet(path)

    zone = tmp_path / "feed"
    zone.mkdir()
    b0 = spark.createDataFrame(
        [(3, 1, 30.0, "I")], "id long, day int, val double, op string"
    )
    b1 = spark.createDataFrame(
        [(4, 2, 40.0, "I"), (1, 1, 0.0, "D")],
        "id long, day int, val double, op string",
    )
    for i, b in enumerate((b0, b1)):
        tmp = zone / f"_tmp_{i}"
        b.coalesce(1).write.parquet(str(tmp))
        (part,) = list(tmp.glob("part-*.parquet"))
        part.rename(zone / f"batch-{i}.parquet")
        shutil.rmtree(tmp)
        os.utime(zone / f"batch-{i}.parquet", (1_000_000_000 + i * 1000,) * 2)

    ckpt = str(tmp_path / "ckpt")

    def feed():
        return (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(zone))
        )

    run1: list[int] = []
    clean = run_cdc_apply_resumable(
        feed(), path, ["id"], ["day"], ckpt,
        op_col="op", crash_after_batch=1, applied_log=run1,
    )
    assert not clean and run1 == [0, 1]
    # batch 1's side effect landed before the crash (insert 4, delete 1)
    mid = {r.id for r in spark.read.parquet(path).collect()}
    assert mid == {2, 3, 4}

    run2: list[int] = []
    clean = run_cdc_apply_resumable(
        feed(), path, ["id"], ["day"], ckpt, op_col="op", applied_log=run2,
    )
    assert clean
    assert run2 == [1], "restart must replay ONLY the uncommitted batch"
    got = {r.id: (r.day, r.val) for r in spark.read.parquet(path).collect()}
    # idempotent replay: one copy of each insert, delete stays applied
    assert got == {2: (2, 20.0), 3: (1, 30.0), 4: (2, 40.0)}
