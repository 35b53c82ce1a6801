"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The driver only checks the FIRST 50 entries of ``queries()`` per round,
so ordering is part of the contract: :func:`queries` reads the
CORRECTNESS ledgers already on disk and puts every query that does not
yet have a green (or rows-only-by-design) row FIRST, in registration
order (oldest backlog first).  Queries verified in an earlier round
sort last.  This makes coverage self-maintaining: each round's 50-slot
window drains the unverified backlog automatically, and a red row is
re-checked the round after its fix lands.

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


def _verified_names() -> set[str]:
    """Names whose LATEST CORRECTNESS_r*.json row is green (or a
    successful rows-only check for a deliberately oracle-less query).

    Latest-row-wins (ADVICE r5): iterating the ledgers in round order
    and letting later rows overwrite earlier ones means a query that
    regresses green→red drops back out of the verified set and
    re-enters the front of the driver's 50-slot window, instead of
    staying "verified" forever on the strength of an old green row.
    """
    status: dict[str, bool] = {}
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
                status[name] = True
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # rows-only-by-design query that ran successfully; don't
                # let it hog a window slot forever.
                status[name] = True
            else:
                status[name] = False
    return {name for name, ok in status.items() if ok}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (minute VWAP candles — the reference's headline
    computation, sql/athena_sample_queries.sql:32-45) on sf0.001."""
    return REGISTRY["q2_minute_vwap"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, unverified
    queries first (see module docstring).

    The ordering is DERIVED from the CORRECTNESS ledgers on disk — no
    hand-maintained tuples (they drifted twice; VERDICT r4 item 6):
    every name without a green row sorts before every name with one,
    and within each class registration order is kept, so the
    longest-waiting backlog drains first and a red row from the
    previous round is automatically re-checked the next round.
    """
    verified = _verified_names()
    names = list(REGISTRY)
    pos = {n: i for i, n in enumerate(names)}
    return {
        n: REGISTRY[n].fn
        for n in sorted(names, key=lambda n: (n in verified, pos[n]))
    }


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB) for every hash-checkable query; queries
    without an oracle get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
