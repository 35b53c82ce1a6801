"""Data-quality metrics (SURVEY.md §2.11 / §5).

The reference computes its drop-rate report with two extra ``count()``
actions and three ``show()``s — five recomputations of the full
scan+filter lineage (jobs/etl/glue_spark_trades_etl.py:121-188). At
100 TB that is five full fact-table scans. Here the same metrics ride
the *one* pass the job already makes, via ``DataFrame.observe``:
accumulator-style aggregates collected as a side effect of the write.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from .functions import count_if, safe_div


@dataclass
class DqResult:
    """A filtered DataFrame plus a pending single-pass metrics observation.

    ``metrics()`` is valid only after an action has run on ``df``
    (the ETL's partitioned write is that action).
    """

    df: DataFrame
    observation: Observation

    def metrics(self) -> dict:
        m = dict(self.observation.get)
        m["removed_rows"] = m["initial_rows"] - m["kept_rows"]
        m["pct_removed"] = (
            100.0 * m["removed_rows"] / m["initial_rows"] if m["initial_rows"] else 0.0
        )
        return m


def filter_with_metrics(df: DataFrame, predicate: Column, name: str = "dq") -> DqResult:
    """Apply a DQ filter while observing initial/kept counts in the same
    pass (replaces the reference's before/after ``count()`` pair,
    glue_spark_trades_etl.py:121,174-176)."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("initial_rows"),
        count_if(predicate).cast("long").alias("kept_rows"),
    )
    return DqResult(df=observed.filter(predicate), observation=obs)


def drop_rate_report(df: DataFrame, predicate: Column) -> DataFrame:
    """A1 as a declarative single-pass aggregate: initial/kept/removed/pct.

    Unlike :func:`filter_with_metrics` (side-channel, zero extra scans
    when a write already runs) this returns the metrics AS a DataFrame —
    the form the correctness oracle can verify.
    """
    return df.agg(
        F.count(F.lit(1)).alias("initial_rows"),
        count_if(predicate).cast("long").alias("kept_rows"),
        (F.count(F.lit(1)) - count_if(predicate)).cast("long").alias("removed_rows"),
        F.round(
            safe_div(
                (F.count(F.lit(1)) - count_if(predicate)).cast("double"),
                F.count(F.lit(1)).cast("double"),
            )
            * 100,
            6,
        ).alias("pct_removed"),
    )


def dq_audit(df: DataFrame, group_cols: list[str], id_col: str, value_cols: list[str]) -> DataFrame:
    """The reference's per-partition audit (Q7,
    sql/athena_sample_queries.sql:162-178): row counts, duplicate
    detection via COUNT(*)-COUNT(DISTINCT id), and invalid-value counts
    per value column."""
    aggs = [
        F.count(F.lit(1)).alias("row_count"),
        F.countDistinct(id_col).alias(f"unique_{id_col}"),
        (F.count(F.lit(1)) - F.countDistinct(id_col)).alias("duplicate_count"),
    ]
    for c in value_cols:
        aggs.append(count_if(F.col(c) <= 0).cast("long").alias(f"invalid_{c}_count"))
    return df.groupBy(*group_cols).agg(*aggs)


def sanity_summary(df: DataFrame, group_col: str, ts_col: str) -> DataFrame:
    """Post-load sanity aggregate (sql/athena_create_trades_tales.sql:37-44):
    per-group row count + min/max timestamp."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
    )


# ---------------------------------------------------------------------------
# Declarative expectations (dbt-test / Deequ-style), one pass
# ---------------------------------------------------------------------------


def expect_not_null(col: str) -> tuple[str, Column]:
    return (f"not_null_{col}", F.count_if(F.col(col).isNull()).cast("long"))


def expect_unique(col: str) -> tuple[str, Column]:
    return (
        f"unique_{col}",
        (F.count(F.lit(1)) - F.countDistinct(col)).cast("long"),
    )


def expect_accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (
        f"accepted_values_{col}",
        F.count_if(~F.col(col).isin(values) | F.col(col).isNull()).cast("long"),
    )


def expect_in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"in_range_{col}",
        F.count_if(
            F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi)
        ).cast("long"),
    )


#: Expectation names are spliced into a ``stack()`` SQL expression, so
#: they must be plain identifiers — anything else (quotes, spaces,
#: hyphens) would produce a broken or injectable expression at runtime.
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _check_ident(name: str) -> str:
    if not _IDENT_RE.match(name):
        raise ValueError(
            f"expectation name {name!r} is not a valid identifier "
            "([A-Za-z_][A-Za-z0-9_]*) — it is interpolated into a SQL "
            "stack() expression"
        )
    return name


def expect_custom(name: str, violation: Column) -> tuple[str, Column]:
    """Arbitrary per-row violation predicate.  ``name`` must be a plain
    identifier (validated here for an early failure; re-validated in
    :func:`run_expectations` for suites built by hand)."""
    return (_check_ident(name), F.count_if(violation).cast("long"))


def run_expectations(df: DataFrame, expectations: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate a suite of expectations in ONE aggregate pass.

    Every expectation compiles to a conditional-count aggregate, so the
    whole suite — any number of checks — costs exactly one scan and one
    1-row exchange regardless of table size (Deequ's analyzer posture;
    the reference recomputed its lineage per metric). The long report
    shape (one row per expectation: name, violations, passed) feeds
    dashboards and CI gates without schema churn when checks are added.

    Names are validated as identifiers before being spliced into the
    ``stack()`` projection (suites can be hand-built tuples, not just
    the ``expect_*`` helpers).
    """
    for name, _ in expectations:
        _check_ident(name)
    wide = df.agg(
        F.count(F.lit(1)).alias("_rows"),
        *[expr.alias(name) for name, expr in expectations],
    )
    names = [name for name, _ in expectations]
    stacked = wide.select(
        F.expr(
            "stack("
            + str(len(names))
            + ", "
            + ", ".join(f"'{n}', {n}" for n in names)
            + ") as (expectation, violations)"
        ),
        F.col("_rows").alias("total_rows"),
    )
    return stacked.select(
        "expectation",
        "violations",
        "total_rows",
        (F.col("violations") == 0).alias("passed"),
    )
