"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The driver only checks the FIRST 50 entries of ``queries()`` per round,
so ordering is part of the contract: :func:`queries` reads the
CORRECTNESS ledgers already on disk and puts every query that does not
yet have a green (or rows-only-by-design) row FIRST, in a priority
order that favors the operators SURVEY.md §2 names.  Queries verified
in an earlier round keep their recorded rows and sort last.  This makes
coverage self-maintaining: each round's 50-slot window drains the
unverified backlog automatically.

All real work lives in :mod:`market_etl_spark`; this module only
adapts the engine's query registry to the driver's shape.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_etl_spark.queries import REGISTRY

_REPO = os.path.dirname(os.path.abspath(__file__))

#: Re-check these first: round-3 red rows fixed this round (oracle
#: HUGEINT type leak; array-column harness crash → string path).  The
#: seven round-2 re-checks that previously lived here all went green in
#: CORRECTNESS_r03 and now sort with the verified tail.
_EARLY: tuple[str, ...] = (
    "q_variant_props",
    "q_session_paths",
)

#: Verified-by-pytest queries that can wait a round when the 50-slot
#: window is oversubscribed (the window favors §2-tagged and headline
#: extension queries: trades, windows, streaming, relational ext).
_LATER: tuple[str, ...] = (
    "llm_multimodal_features",
    "llm_multimodal_frames",
    "llm_embedding_quantization",
    "llm_embedding_standardize",
    "llm_incremental_dedup",
    # round-3 additions: pytest+locally-oracle-verified; deferred so they
    # don't displace the round-2 backlog from the 50-slot window.
    "llm_cosine_topk_batch",
    "llm_inverted_index",
    "q_value_histogram",
    "llm_text_normalize",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_salted_skew_join",
    "q_sequence_pattern",
    "q_expectations_report",
    "q_scd2_apply",
    # round-4 additions beyond the round's 50-slot budget (47 backlog +
    # bm25/semdedup/edecon fill it exactly): verified locally at three
    # SFs, deferred to round 5's window.
    "llm_lm_perplexity",
    "llm_dup_ngram_fraction",
    "llm_bpe_merges",
    "q_zorder_pruned_scan",
    "llm_importance_weights",
    "llm_logreg_quality",
    "llm_containment_pairs",
    "q_lateral_topn_suppliers",
    "q_recursive_tree_traversal",
    "llm_token_entropy",
    "llm_pq_topk",
    "llm_training_pipeline_e2e",
    "q_window_ewma",
    "q_window_drawdown",
    "q_streaming_windowed_topk",
    "q_histogram_2d",
    "q_time_to_convert",
    "q_skyline_pareto_users",
    "llm_prefix_dup_groups",
    "q_activity_islands",
    "llm_embedding_outliers",
)


def _verified_names() -> set[str]:
    """Names with a green row (or a successful rows-only check for a
    deliberately oracle-less query) in any CORRECTNESS_r*.json so far."""
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                verified.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # rows-only-by-design query that ran successfully; don't
                # let it hog a window slot forever.
                verified.add(name)
    return verified


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (minute VWAP candles — the reference's headline
    computation, sql/athena_sample_queries.sql:32-45) on sf0.001."""
    return REGISTRY["q2_minute_vwap"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, unverified
    queries first (see module docstring)."""
    verified = _verified_names()
    names = list(REGISTRY)
    pos = {n: i for i, n in enumerate(names)}

    def rank(n: str) -> tuple[int, int]:
        if n in _EARLY:
            return (0, _EARLY.index(n))
        if n in verified:
            return (3, pos[n])
        if n in _LATER:
            return (2, _LATER.index(n))
        return (1, pos[n])

    return {n: REGISTRY[n].fn for n in sorted(names, key=rank)}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB) for every hash-checkable query; queries
    without an oracle get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
