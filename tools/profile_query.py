"""Per-query profiler for the optimization rounds (guide §1).

Runs the named registered queries twice (pass 1 warms codegen/worker
pools exactly like bench.py; pass 2 is the steady-state measurement),
with cProfile wrapped around pass 2 so driver-side time attributes to
the engine functions that block on Spark jobs (py4j socket reads roll
up to their callers' cumulative time).

Usage:  python tools/profile_query.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if not args:
        print("usage: profile_query.py [sf_dir] name [name ...]", file=sys.stderr)
        sys.exit(2)

    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.session import get_spark
    from market_etl_spark.streaming import mute_stop_noise

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    mute_stop_noise(spark)

    for name in args:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        cold = time.perf_counter() - t0

        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        n = spec.fn(spark, sf_dir).count()
        prof.disable()
        steady = time.perf_counter() - t0

        print(f"\n=== {name}: cold {cold:.3f}s steady {steady:.3f}s ({n} rows)")
        out = io.StringIO()
        st = pstats.Stats(prof, stream=out).sort_stats("cumulative")
        st.print_stats(r"market_etl_spark|__spark_entry__", 40)
        print(out.getvalue())
        out = io.StringIO()
        st = pstats.Stats(prof, stream=out).sort_stats("cumulative")
        st.print_stats(r"py4j|readinto|sock_recv", 12)
        print(out.getvalue())


if __name__ == "__main__":
    main()
