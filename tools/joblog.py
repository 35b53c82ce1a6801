"""Job-level attribution via the Spark event log (guide §1.5/§7 with
the UI disabled): runs named queries with eventLog enabled and a
per-query job description, then summarizes per query: job count, job
wall, summed executor task time, scheduling gaps.

Usage:  python tools/joblog.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGDIR = "/tmp/spark-events-joblog"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args

    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from market_etl_spark.session import RUNTIME_CONF, default_parallelism
    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.streaming import mute_stop_noise

    cpus = default_parallelism()
    b = (
        SparkSession.builder.appName("joblog")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", LOGDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32).select(_warm("id")).count()
    mute_stop_noise(spark)

    walls = {}
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()  # warm pass
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        walls[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log
    jobs = {}  # jobId -> {desc, t0, t1, stages: set}
    stage_task_time = defaultdict(float)  # stageId -> summed task ms
    stage_tasks = defaultdict(int)
    cands = [p for p in os.listdir(LOGDIR) if app_id in p]
    path = os.path.join(LOGDIR, cands[0])
    if os.path.isdir(path):
        lines = []
        for part in sorted(os.listdir(path)):
            if part.startswith("events"):
                with open(os.path.join(path, part)) as f:
                    lines.extend(f.readlines())
    else:
        with open(path) as f:
            lines = f.readlines()
    if True:
        for line in lines:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                props = e.get("Properties") or {}
                jobs[e["Job ID"]] = {
                    "desc": props.get("spark.job.description", ""),
                    "t0": e["Submission Time"],
                    "t1": None,
                    "stages": {s["Stage ID"] for s in e["Stage Infos"]},
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerTaskEnd":
                info = e.get("Task Info") or {}
                sid = e.get("Stage ID")
                dur = (info.get("Finish Time", 0) or 0) - (
                    info.get("Launch Time", 0) or 0
                )
                if dur > 0:
                    stage_task_time[sid] += dur
                    stage_tasks[sid] += 1

    per = defaultdict(lambda: {"n_jobs": 0, "job_wall_ms": 0, "task_ms": 0,
                               "n_tasks": 0})
    for j in jobs.values():
        d = j["desc"]
        if not d.startswith("Q:"):
            continue
        q = d[2:]
        per[q]["n_jobs"] += 1
        if j["t1"]:
            per[q]["job_wall_ms"] += j["t1"] - j["t0"]
        for sid in j["stages"]:
            per[q]["task_ms"] += stage_task_time.get(sid, 0)
            per[q]["n_tasks"] += stage_tasks.get(sid, 0)

    for name in names:
        p = per.get(name)
        w = walls.get(name, 0)
        if not p:
            print(f"{name}: wall {w:.2f}s — no labelled jobs found")
            continue
        print(
            f"{name}: wall {w:.2f}s | jobs {p['n_jobs']} "
            f"(wall sum {p['job_wall_ms']/1e3:.2f}s) | tasks {p['n_tasks']} "
            f"(exec time sum {p['task_ms']/1e3:.2f}s) | "
            f"driver-gap {w - p['job_wall_ms']/1e3:.2f}s"
        )


if __name__ == "__main__":
    main()
