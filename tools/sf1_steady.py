"""Two-pass (cold + steady) sf1 timing for named queries (round-8,
VERDICT r7 item 6): the r7 sf1 sweep ran everything once cold; this
harness re-runs a name list with a second in-session pass so the
scaling ratios land on the same steady basis as bench_queries.json.

Appends one JSON line per query to .scratch/sf1_steady.jsonl
(restartable — done names skip).  Also records the sf0.1 steady time
in the same session so the 10× ratio is computed under one JVM.

Usage: python tools/sf1_steady.py [name ...]   (default: the round-7/8
additions listed in SURVEY.md §2.14–2.15)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, ".scratch", "sf1_steady.jsonl")
SF1 = os.path.join(ROOT, ".scratch", "sf1")
SF01 = "/root/testdata/sf0.1"

ROUND78 = [
    "llm_jpeg_decode_stats",
    "q_streaming_late_data_audit",
    "q_scd2_history_build",
    "q_streaming_attribution_outer",
    "q_scd2_point_in_time_join",
    "q_ddsketch_quantiles",
    "q_mann_whitney_u",
    "q_cohort_retention",
    "q_acf_ljung_box",
    "q_pareto_frontier",
    "llm_mutual_information",
    "q_lorenz_curve",
    "q_bloom_membership_audit",
    "q_kaplan_meier_retention",
    "q_bootstrap_ci_poisson",
    "q_reciprocal_rank_fusion",
    "q_ivm_join_maintenance",
    "q_position_attribution",
    "llm_blocking_quality",
    "q_k_anonymity_audit",
    "q_dp_noisy_counts",
    "q_slo_burn_rate",
    "llm_gif_decode_stats",
    "llm_gif_frames",
    "q_streaming_ivm",
    "llm_density_dedup",
    "q_rowgroup_stats_audit",
]


def main() -> None:
    names = sys.argv[1:] or ROUND78
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
    from market_etl_spark.streaming import mute_stop_noise

    spark = get_spark("sf1steady")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    mute_stop_noise(spark)

    for name in names:
        if name in done:
            continue
        spec = REGISTRY[name]
        rec: dict = {"name": name}
        try:
            t0 = time.perf_counter()
            rec["rows"] = spec.fn(spark, SF1).count()
            rec["sf1_cold"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            spec.fn(spark, SF1).count()
            rec["sf1_steady"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            spec.fn(spark, SF01).count()
            rec["sf01_steady"] = round(time.perf_counter() - t0, 3)
            rec["ratio"] = round(rec["sf1_steady"] / max(rec["sf01_steady"], 1e-9), 2)
        except Exception as e:  # noqa: BLE001 — recorded, sweep continues
            rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
