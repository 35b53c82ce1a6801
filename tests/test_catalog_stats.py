"""ANALYZE TABLE statistics: rowCount/size land in the catalog and
per-column NDV is collected — the inputs the cost-based optimizer
joins-reorders from."""

from __future__ import annotations

from market_etl_spark.catalog import analyze_table, table_stats


def _make_table(spark, tmp_path, name="stats_fixture"):
    df = spark.range(1000).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS grp", "CAST(id AS DOUBLE) * 1.5 AS v"
    )
    loc = str(tmp_path / name)
    df.write.mode("overwrite").parquet(loc)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} (k BIGINT, grp INT, v DOUBLE) USING parquet "
        f"LOCATION '{loc}'"
    )
    return name


def test_analyze_populates_table_and_column_stats(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    try:
        analyze_table(spark, t)
        stats = table_stats(spark, t)
        assert "statistics" in stats
        assert "1000 rows" in stats["statistics"]

        col = {
            r.info_name: r.info_value
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t} grp").collect()
        }
        assert col["distinct_count"] == "7"
        assert col["min"] == "0"
        assert col["max"] == "6"
        assert col["num_nulls"] == "0"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cbo_uses_rowcount_estimate(spark, tmp_path):
    t = _make_table(spark, tmp_path, "stats_cbo_fixture")
    try:
        analyze_table(spark, t, columns=["k"])
        spark.conf.set("spark.sql.cbo.enabled", "true")
        # with CBO on, the optimized plan's row estimate comes from the
        # catalog rowCount (1000), not a raw size guess
        plan = (
            spark.table(t)
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .rowCount()
        )
        assert plan.isDefined()
        assert int(str(plan.get())) == 1000
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.sql(f"DROP TABLE IF EXISTS {t}")
