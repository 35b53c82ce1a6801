"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE compact JSON line (last on
stdout):

    {"metric": "corpus_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1_...": sec, ...}, "sf": 0.1, ...}

The `queries` dict in the stdout line carries only the headline corpus
queries so the line stays short enough for line-based log capture (the
round-2 full dict was truncated mid-line by the driver's tail capture →
`parsed: null`). The FULL per-query timing dict goes to
``bench_queries.json`` beside this script and, line-per-query, to stderr.

Timings are end-to-end per query (plan build + execute + collect), after
one untimed warm-up of the session (JVM + parquet footer caches), which is
how the reference's Athena numbers are reported (warm metastore).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: tiny actions so one-time session costs (JVM startup,
    # Python/Arrow worker pool spawn) aren't billed to whichever query
    # happens to run first — timings are per-query marginal cost, the
    # same warm-session basis as the reference's Athena numbers.
    spark.range(1).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32).select(_warm("id")).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, sf_dir).count()
        except Exception as e:  # a broken query must not kill the bench
            print(f"# {name} ERROR {type(e).__name__}: {e}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    ordered = sorted(timings.values())
    median = round(ordered[len(ordered) // 2], 3) if ordered else None

    # Full per-query dict → file (the driver's line capture truncates
    # multi-KB lines; stderr already has the per-query trace above).
    qfile = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_queries.json")
    with open(qfile, "w") as f:
        json.dump({"sf": sf, "total_sec": total, "queries": timings}, f, indent=1, sort_keys=True)

    # Compact stdout line: headline corpus queries only (~500 bytes).
    headline = {
        k: v
        for k, v in timings.items()
        if re.match(r"q[1-9]", k) and len(k.split("_", 1)[0]) <= 3
    }
    print(
        json.dumps(
            {
                "metric": "corpus_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "n_queries": len(timings),
                "median_sec": median,
                "queries_file": "bench_queries.json",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
