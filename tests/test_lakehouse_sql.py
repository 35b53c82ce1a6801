"""SQL-text DML router (round 12): every statement shape routed to
the transaction API, equivalence with the Python-API twin, and loud
rejection of anything outside the grammar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_etl_spark import lakehouse as lk
from market_etl_spark.lakehouse_sql import run_sql


def _table(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(j, float(j), f"s{j % 3}") for j in range(30)],
            "id long, v double, s string",
        ).coalesce(2)
    )
    t.commit()
    return path


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_delete_matches_python_twin(spark, tmp_path):
    sql_path = _table(spark, tmp_path, "a")
    py_path = _table(spark, tmp_path, "b")
    out = run_sql(
        spark, f"DELETE FROM lakehouse.`{sql_path}` WHERE id % 7 = 0"
    )
    assert out.collect()[0].num_affected_rows == 5
    t = lk.Transaction(py_path)
    t.delete_where(spark, F.expr("id % 7 = 0"))
    t.commit()
    assert _rows(lk.read_table(spark, sql_path)) == _rows(
        lk.read_table(spark, py_path)
    )


def test_update_matches_python_twin(spark, tmp_path):
    sql_path = _table(spark, tmp_path, "a")
    py_path = _table(spark, tmp_path, "b")
    out = run_sql(
        spark,
        f"UPDATE lakehouse.`{sql_path}` SET v = v * 2 + 1, s = upper(s) "
        f"WHERE id < 5",
    )
    assert out.collect()[0].num_affected_rows == 5
    t = lk.Transaction(py_path)
    t.update_where_mor(
        spark,
        F.expr("id < 5"),
        {"v": F.expr("v * 2 + 1"), "s": F.expr("upper(s)")},
    )
    t.commit()
    assert _rows(lk.read_table(spark, sql_path)) == _rows(
        lk.read_table(spark, py_path)
    )


def test_merge_full_clause_set(spark, tmp_path):
    path = _table(spark, tmp_path)
    spark.createDataFrame(
        [(3, -1.0, "x"), (5, 50.0, "y"), (99, 9.0, "z")],
        "id long, v double, s string",
    ).createOrReplaceTempView("updates")
    out = run_sql(
        spark,
        f"""
        MERGE INTO lakehouse.`{path}` AS tgt USING updates AS src
        ON tgt.id = src.id
        WHEN MATCHED AND src.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = src.v + tgt.v
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    r = out.collect()[0]
    assert (r.num_updated_rows, r.num_deleted_rows, r.num_inserted_rows) == (
        1, 1, 1,
    )
    got = lk.read_table(spark, path)
    assert got.filter("id = 3").count() == 0
    assert got.filter("id = 5").collect()[0].v == 55.0
    assert got.filter("id = 99").count() == 1


def test_merge_using_subquery(spark, tmp_path):
    path = _table(spark, tmp_path)
    out = run_sql(
        spark,
        f"""
        MERGE INTO lakehouse.`{path}` t
        USING (SELECT 1 AS id, 0.0 AS v, 'q' AS s) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        """,
    )
    assert out.collect()[0].num_updated_rows == 1
    assert lk.read_table(spark, path).filter("id = 1").collect()[0].v == 0.0


def test_select_time_travel_and_join(spark, tmp_path):
    path = _table(spark, tmp_path)
    run_sql(spark, f"DELETE FROM lakehouse.`{path}` WHERE id >= 10")
    now = run_sql(
        spark, f"SELECT count(*) AS n FROM lakehouse.`{path}`"
    ).collect()[0].n
    old = run_sql(
        spark,
        f"SELECT count(*) AS n FROM lakehouse.`{path}` VERSION AS OF 1",
    ).collect()[0].n
    assert (now, old) == (10, 30)
    # two references (time-traveled + current) in ONE statement
    diff = run_sql(
        spark,
        f"""
        SELECT count(*) AS gone FROM lakehouse.`{path}` VERSION AS OF 1 a
        LEFT ANTI JOIN lakehouse.`{path}` b ON a.id = b.id
        """,
    ).collect()[0].gone
    assert diff == 20


def test_describe_history_and_restore(spark, tmp_path):
    path = _table(spark, tmp_path)
    run_sql(spark, f"DELETE FROM lakehouse.`{path}` WHERE id >= 10")
    hist = run_sql(spark, f"DESCRIBE HISTORY lakehouse.`{path}`")
    assert hist.count() == 2 and "operation" in hist.columns
    out = run_sql(
        spark, f"RESTORE TABLE lakehouse.`{path}` TO VERSION AS OF 1"
    ).collect()[0]
    assert out.restored_to_version == 1 and out.new_version == 3
    assert lk.read_table(spark, path).count() == 30


def test_grammar_rejections_are_loud(spark, tmp_path):
    path = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="grammar"):
        run_sql(spark, f"TRUNCATE TABLE lakehouse.`{path}`")
    with pytest.raises(ValueError, match="names no lakehouse"):
        run_sql(spark, "SELECT 1 FROM somewhere")
    with pytest.raises(ValueError, match="equalities"):
        run_sql(
            spark,
            f"MERGE INTO lakehouse.`{path}` t USING (SELECT 1 AS id) s "
            f"ON t.id < s.id WHEN MATCHED THEN DELETE",
        )
    # DML errors come from the SAME methods as the Python API — the
    # identity-SET refusal fires through SQL too
    ident = str(tmp_path / "ident")
    t = lk.Transaction(ident)
    t.set_identity_column("rid")
    t.commit()
    t = lk.Transaction(ident)
    t.append(spark.createDataFrame([(1.0,)], "v double"))
    t.commit()
    with pytest.raises(ValueError, match="engine-assigned"):
        run_sql(spark, f"UPDATE lakehouse.`{ident}` SET rid = 9 WHERE v = 1.0")


def test_maintenance_statements(spark, tmp_path):
    path = _table(spark, tmp_path)
    d = run_sql(spark, f"DESCRIBE DETAIL lakehouse.`{path}`").collect()[0]
    assert d.n_files == 2 and d.n_rows == 30 and bool(d.rows_exact)
    # OPTIMIZE = compact_small: two small files bin-pack into one
    o = run_sql(spark, f"OPTIMIZE lakehouse.`{path}`").collect()[0]
    assert (o.files_rewritten, o.files_added) == (2, 1)
    assert lk.read_table(spark, path).count() == 30
    # idempotent: nothing small left -> no commit burned
    v = lk.latest_commit(path)
    o2 = run_sql(spark, f"OPTIMIZE lakehouse.`{path}`").collect()[0]
    assert o2.files_rewritten == 0 and lk.latest_commit(path) == v
    # OPTIMIZE ZORDER BY = incremental zorder over the small set
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(100 + j, float(j), "x") for j in range(5)],
            "id long, v double, s string",
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(200 + j, float(j), "y") for j in range(5)],
            "id long, v double, s string",
        ).coalesce(1)
    )
    t.commit()
    z = run_sql(
        spark, f"OPTIMIZE lakehouse.`{path}` ZORDER BY (id, v)"
    ).collect()[0]
    assert z.files_rewritten >= 2 and z.files_added >= 1
    assert lk.read_table(spark, path).count() == 40
    # VACUUM sweeps staged debris under an explicit zero retention
    import pathlib as pl

    debris = pl.Path(path) / ".stage-crashed"
    debris.mkdir()
    (debris / "junk.parquet").write_bytes(b"x")
    n = run_sql(
        spark, f"VACUUM lakehouse.`{path}` RETAIN 0 SECONDS"
    ).collect()[0].orphans_removed
    assert n >= 1 and not debris.exists()


def test_dml_edge_shapes(spark, tmp_path):
    path = _table(spark, tmp_path)
    # UPDATE without WHERE touches every row
    n = run_sql(
        spark, f"UPDATE lakehouse.`{path}` SET v = v + 1"
    ).collect()[0].num_affected_rows
    assert n == 30
    # MERGE with ONLY the insert clause = idempotent upsert-new
    out = run_sql(
        spark,
        f"MERGE INTO lakehouse.`{path}` t "
        f"USING (SELECT CAST(5 AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS v, "
        f"       'q' AS s UNION ALL SELECT 999, 1.0, 'q') s "
        f"ON t.id = s.id WHEN NOT MATCHED THEN INSERT *",
    ).collect()[0]
    assert (out.num_inserted_rows, out.num_updated_rows) == (1, 0)
    # DELETE everything: zero rows survive.  The file set stays
    # non-empty (the MOR update left base files fully DV-dead but
    # live), so the read returns an EMPTY frame, not the empty-table
    # error — the correct MOR posture
    n = run_sql(
        spark, f"DELETE FROM lakehouse.`{path}` WHERE true"
    ).collect()[0].num_affected_rows
    assert n == 31
    assert run_sql(spark, f"SELECT * FROM lakehouse.`{path}`").count() == 0
    # compound boolean predicates parse through F.expr untouched
    p2 = _table(spark, tmp_path, "b")
    n = run_sql(
        spark,
        f"DELETE FROM lakehouse.`{p2}` "
        f"WHERE (id % 2 = 0 AND v > 3.0) OR s = 's2'",
    ).collect()[0].num_affected_rows
    exp = 30 - lk.read_table(spark, p2).count()
    assert n == exp > 0
