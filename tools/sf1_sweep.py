"""Single-pass sf1 timing sweep (VERDICT r6 item 5).

Runs every registered query against .scratch/sf1, appending one JSON
line per query to .scratch/sf1_times.jsonl — restartable: already-done
names are skipped, so a wall-clock-capped session can resume.

Usage: python tools/sf1_sweep.py [start_idx]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "sf1_times.jsonl",
)
SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)


def main() -> None:
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except ValueError:
                    pass

    from market_etl_spark.queries import REGISTRY
    from market_etl_spark.session import get_spark

    spark = get_spark("sf1sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    from market_etl_spark.streaming import mute_stop_noise

    mute_stop_noise(spark)

    for name, spec in sorted(REGISTRY.items()):
        if name in done:
            continue
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, SF_DIR).count()
            rec = {
                "name": name,
                "sec": round(time.perf_counter() - t0, 3),
                "rows": n,
            }
        except Exception as e:
            rec = {
                "name": name,
                "sec": round(time.perf_counter() - t0, 3),
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
