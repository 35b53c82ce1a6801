"""A/B config experiment runner (guide §1: measure first).

Runs a subset of registered queries exactly like bench.py (two passes,
pass 2 reported), with extra --conf k=v pairs applied to the session.
One process per configuration — run it twice and diff the JSON lines.

Usage:
  python tools/ab_bench.py [--sf DIR] [--conf k=v ...] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    confs: dict[str, str] = {}
    names: list[str] = []
    n_passes = 2
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            i += 1
            sf_dir = args[i]
        elif a == "--passes":
            i += 1
            n_passes = int(args[i])
        elif a == "--conf":
            i += 1
            k, _, v = args[i].partition("=")
            confs[k] = v
        else:
            names.append(a)
        i += 1

    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.session import get_spark
    from market_etl_spark.streaming import mute_stop_noise

    spark = get_spark("ab_bench")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.range(1).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32).select(_warm("id")).count()
    mute_stop_noise(spark)

    passes: list[dict[str, float]] = [{} for _ in range(n_passes)]
    for sink in passes:
        for name in names:
            t0 = time.perf_counter()
            try:
                REGISTRY[name].fn(spark, sf_dir).count()
            except Exception as e:
                print(f"# {name} ERROR {type(e).__name__}: {e}", file=sys.stderr)
                continue
            sink[name] = round(time.perf_counter() - t0, 3)
    # min over warm passes (2..N): robust to host-contention spikes
    warm = passes[1:] if n_passes > 1 else passes
    best = {
        name: min(p[name] for p in warm if name in p)
        for name in names
        if any(name in p for p in warm)
    }
    print(
        json.dumps(
            {
                "confs": confs,
                "total_min": round(sum(best.values()), 3),
                "total_p1": round(sum(passes[0].values()), 3),
                "queries": best,
            }
        )
    )


if __name__ == "__main__":
    main()
