"""Dump `.explain("formatted")` of named registered queries to files.

Evidence artifacts for the optimization rounds: the returned frame's
physical plan, written to ``plans/<label>/<name>_<suffix>.txt``.  For
audit-fold optimizations the returned plan is expected to be IDENTICAL
before/after (the folds change driver-side audit actions, not the
registered result) — the pair of files is the proof of that.

Usage:  python tools/dump_plans.py <out_dir> <suffix> [sf_dir] name...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest.pop(0)
    os.makedirs(out_dir, exist_ok=True)

    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.session import get_spark
    from market_etl_spark.streaming import mute_stop_noise

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    mute_stop_noise(spark)

    for name in rest:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
