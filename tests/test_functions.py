"""Unit tests for the scalar/aggregate vocabulary (market_etl_spark.functions)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from market_etl_spark.functions import (
    count_if,
    safe_div,
    string_true_to_bool,
    valid_calendar_date,
    vwap,
)


def _one_col(df):
    return [r[0] for r in df.collect()]


@pytest.mark.parametrize(
    ("y", "m", "d", "ok"),
    [
        (2000, 2, 29, True),  # div-400 leap year
        (1900, 2, 29, False),  # div-100 non-leap (the classic trap)
        (2024, 2, 29, True),  # div-4 leap
        (2023, 2, 28, True),
        (2023, 2, 29, False),
        (2023, 4, 31, False),  # 30-day month
        (2023, 4, 30, True),
        (2023, 1, 31, True),  # 31-day month
        (2023, 1, 0, False),  # day >= 1
        (2023, 12, 31, True),
    ],
)
def test_valid_calendar_date(spark, y, m, d, ok):
    df = spark.createDataFrame([(y, m, d)], "y int, m int, d int")
    got = _one_col(
        df.select(valid_calendar_date(F.col("y"), F.col("m"), F.col("d")))
    )
    assert got == [ok]


def test_valid_calendar_date_sql_parity(spark):
    """The SQL rendering used by oracles must agree with the Column form."""
    import duckdb

    from market_etl_spark.functions import VALID_CALENDAR_DATE_SQL

    cases = [
        (y, m, d)
        for y in (1900, 2000, 2023, 2024)
        for m in (1, 2, 4)
        for d in (0, 28, 29, 30, 31)
    ]
    df = spark.createDataFrame(cases, "y int, m int, d int")
    spark_rows = df.select(
        "y", "m", "d", valid_calendar_date(F.col("y"), F.col("m"), F.col("d")).alias("v")
    ).collect()
    con = duckdb.connect()
    for r in spark_rows:
        duck = con.execute(
            f"SELECT {VALID_CALENDAR_DATE_SQL.format(y=r['y'], m=r['m'], d=r['d'])}"
        ).fetchone()[0]
        assert bool(r["v"]) == bool(duck), (r["y"], r["m"], r["d"])


def test_string_true_to_bool(spark):
    df = spark.createDataFrame(
        [("True",), ("False",), ("true",), ("",), (None,)], "s string"
    )
    got = _one_col(df.select(string_true_to_bool(F.col("s"))))
    # exact-match semantics: only the literal "True" maps to true;
    # NULL and any other string (incl. "true") map to false, never NULL
    assert got == [True, False, False, False, False]


def test_safe_div(spark):
    df = spark.createDataFrame([(10.0, 2.0), (1.0, 0.0)], "n double, d double")
    got = _one_col(df.select(safe_div(F.col("n"), F.col("d"))))
    assert got == [5.0, None]


def test_vwap_is_ratio_of_sums(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0)], "k string, p double, q double"
    )
    got = _one_col(df.groupBy("k").agg(vwap(F.col("p"), F.col("q")).alias("v")).select("v"))
    assert got == [(10.0 * 1.0 + 20.0 * 3.0) / 4.0]  # 17.5, not avg(10,20)


def test_count_if(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x int")
    got = _one_col(df.agg(count_if(F.col("x") % 2 == 0)))
    assert got == [2]


def test_expectations_one_pass_and_counts(spark):
    from market_etl_spark.quality import (
        expect_accepted_values,
        expect_in_range,
        expect_not_null,
        expect_unique,
        run_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, None, 50.0), (3, "z", 5.0)],
        "id long, cat string, v double",
    )
    suite = [
        expect_not_null("cat"),
        expect_unique("id"),
        expect_accepted_values("cat", ["a", "b"]),
        expect_in_range("v", 0, 10),
    ]
    out = {r.expectation: (r.violations, r.passed) for r in run_expectations(df, suite).collect()}
    assert out["not_null_cat"] == (1, False)
    assert out["unique_id"] == (1, False)       # id=2 twice
    assert out["accepted_values_cat"] == (2, False)  # 'z' and NULL
    assert out["in_range_v"] == (2, False)      # -1 and 50
    assert all(r.total_rows == 4 for r in run_expectations(df, suite).collect())

    # one scan: the whole suite is a single aggregate -> plan has exactly
    # one scan of the local relation
    plan = run_expectations(df, suite)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_expectation_names_must_be_identifiers(spark):
    """Names are interpolated into a stack() SQL expression — anything
    but a plain identifier must be rejected up front, not produce a
    broken/injectable expression at runtime."""
    import pytest

    from pyspark.sql import functions as F

    from market_etl_spark.quality import expect_custom, run_expectations

    df = spark.createDataFrame([(1,)], "id long")
    for bad in ("has space", "quo'te", "da-sh", "1starts_digit", ""):
        with pytest.raises(ValueError, match="identifier"):
            expect_custom(bad, F.col("id") < 0)
        with pytest.raises(ValueError, match="identifier"):
            run_expectations(df, [(bad, F.count_if(F.col("id") < 0))])
    # a valid hand-built tuple still passes
    out = run_expectations(
        df, [("ok_name", F.count_if(F.col("id") < 0).cast("long"))]
    ).collect()
    assert out[0].passed
