"""Decompose the fixed cost of one availableNow stream start through
the registered lakehouse Python data source (VERDICT r14 item 1: the
streaming family's per-start floor is the largest unharvested block).

Methodology (guide §1 measure-first, §7.3 driver-side attribution):

- K fresh-checkpoint availableNow runs over a tiny pre-built source
  table, foreachBatch(noop) so the data term is ~zero: wall clock per
  run, the trigger-internal durationMs map from the progress event
  (triggerExecution, queryPlanning, walCommit, commitOffsets,
  latestOffset, addBatch), and a PHASE split derived from the progress
  events' own epoch timestamps — time inside .start() (source
  resolution + runner spawn + query-start machinery), start()-return to
  first trigger, triggers, and after-last-trigger teardown.
- The same K runs through a JVM-native `rate` source: Spark's own
  floor with zero Python-data-source involvement.  lakehouse minus
  rate isolates what OUR source adds (planning-worker round trips,
  python offset calls).
- The same K runs writing through the registered lakehouse SINK
  (no foreachBatch) to split sink-side overhead out too.

Usage: python tools/stream_start_floor.py [K]
"""

from __future__ import annotations

import datetime as dt
import json
import pathlib
import shutil
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def percentiles(xs):
    xs = sorted(xs)
    return {
        "min": round(xs[0], 3),
        "med": round(xs[len(xs) // 2], 3),
        "max": round(xs[-1], 3),
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from market_etl_spark import lakehouse as lk
    from market_etl_spark.lakehouse_datasource import register
    from market_etl_spark.session import get_spark
    from market_etl_spark.streaming import mute_stop_noise

    spark = get_spark("stream_start_floor")
    spark.sparkContext.setLogLevel("ERROR")
    mute_stop_noise(spark)
    register(spark)

    scratch = pathlib.Path("/tmp/stream_floor")
    shutil.rmtree(scratch, ignore_errors=True)
    scratch.mkdir(parents=True)
    src = str(scratch / "src")
    for i in range(2):
        t = lk.Transaction(src)
        t.append(
            spark.range(10).select(
                (F.col("id") + i * 10).alias("id"),
                F.lit(float(i)).alias("v"),
            ).coalesce(1)
        )
        t.commit()

    # warm the session (codegen, first-job machinery)
    spark.range(100).groupBy((F.col("id") % 3)).count().collect()

    def noop(df, bid):
        df.isEmpty()

    def phases(t0: float, t_started: float, t_end: float, q) -> dict:
        """Wall split from the progress events' epoch timestamps:
        inside .start(), start-return -> first trigger, trigger time,
        after-last-trigger teardown."""
        prog = q.recentProgress
        mono_to_epoch = time.time() - time.monotonic()
        out = {
            "start_call": round(t_started - t0, 3),
            "n_batches": len(prog),
        }
        if prog:
            stamps = []
            for p in prog:
                ts = dt.datetime.fromisoformat(
                    p["timestamp"].replace("Z", "+00:00")
                ).timestamp()
                stamps.append((ts, p["durationMs"].get("triggerExecution", 0)))
            out["started_to_first_trigger"] = round(
                stamps[0][0] - (t_started + mono_to_epoch), 3
            )
            out["trigger_total"] = round(sum(d for _, d in stamps) / 1e3, 3)
            last_end = stamps[-1][0] + stamps[-1][1] / 1e3
            out["after_last_trigger"] = round(
                (t_end + mono_to_epoch) - last_end, 3
            )
        return out

    def timed(build):
        """build(ck) -> started StreamingQuery; returns wall, durs, ph."""
        ck = str(scratch / f"ck_{uuid.uuid4().hex}")
        t0 = time.monotonic()
        q = build(ck)
        t_started = time.monotonic()
        q.awaitTermination()
        t_end = time.monotonic()
        lp = q.lastProgress
        return (
            t_end - t0,
            dict(lp.get("durationMs", {}) if lp else {}),
            phases(t0, t_started, t_end, q),
        )

    def build_lakehouse(ck):
        return (
            spark.readStream.format("lakehouse")
            .load(src)
            .writeStream.foreachBatch(noop)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    # control: a MINIMAL partition-based Python streaming source (one
    # static batch of 20 rows, no table state, no pyarrow) — its floor
    # is the engine's Python-data-source stream cost with ~zero source
    # logic, so (lakehouse - toy) isolates OUR source's share and
    # (toy - rate) the engine's Python-source machinery.
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _ToyReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"v": 0}

        def latestOffset(self):
            return {"v": 1}

        def partitions(self, start, end):
            return [InputPartition(i) for i in range(2)]

        def read(self, p):
            return iter([(i, float(i)) for i in range(10)])

        def commit(self, end):
            pass

    class ToySource(DataSource):
        @classmethod
        def name(cls):
            return "toyfloor"

        def schema(self):
            return "id int, v double"

        def streamReader(self, schema):
            return _ToyReader()

    spark.dataSource.register(ToySource)

    def build_toy(ck):
        return (
            spark.readStream.format("toyfloor")
            .load()
            .writeStream.foreachBatch(noop)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    def build_rate(ck):
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .writeStream.foreachBatch(noop)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    def build_sink(ck):
        dst = str(scratch / f"dst_{uuid.uuid4().hex}")
        return (
            spark.readStream.format("lakehouse")
            .load(src)
            .writeStream.format("lakehouse")
            .option("txnAppId", "floor")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start(dst)
        )

    out: dict[str, dict] = {}
    for name, fn in (
        ("rate", build_rate),
        ("toy_python_source", build_toy),
        ("lakehouse_feb", build_lakehouse),
        ("lakehouse_sink", build_sink),
    ):
        walls, durs, phs = [], [], []
        for i in range(k):
            w, d, p = timed(fn)
            walls.append(w)
            durs.append(d)
            phs.append(p)
        keys = sorted({kk for d in durs for kk in d})
        pkeys = sorted({kk for p in phs for kk in p})
        out[name] = {
            "wall_sec": percentiles(walls),
            "durationMs_min": {
                kk: min(d.get(kk, 0) for d in durs) for kk in keys
            },
            "phases_min": {
                kk: min(p.get(kk, 0) for p in phs) for kk in pkeys
            },
            "phases_all": phs,
        }
        print(name, json.dumps({kk: out[name][kk] for kk in
                                ("wall_sec", "durationMs_min", "phases_min")}),
              flush=True)

    print("SUMMARY", json.dumps(out))


if __name__ == "__main__":
    main()
