"""ETL pipeline tests: transform semantics, single-pass DQ metrics,
partitioned write + catalog + pruning."""

from __future__ import annotations

import datetime as dt
import pathlib
import shutil

import pyspark.sql.functions as F
import pytest

from market_etl_spark.catalog import register_trades_table, show_partitions
from market_etl_spark.etl import run_trades_etl
from market_etl_spark.quality import dq_audit, drop_rate_report, filter_with_metrics, sanity_summary
from market_etl_spark.sources import read_trades_csv
from market_etl_spark.transforms import OUTPUT_COLUMNS, transform_trades

SCRATCH = pathlib.Path(__file__).resolve().parent.parent / ".scratch" / "tests"


@pytest.fixture(scope="module")
def raw_zone(spark):
    """A tiny Hive-layout CSV zone with one invalid row (quantity=0)."""
    zone = SCRATCH / "raw_zone"
    shutil.rmtree(zone, ignore_errors=True)
    rows = [
        # trade_id, price, quantity, quote_qty, epoch_ms, buyer, best
        (1, 100.0, 2.0, 200.0, 1705312800000, "True", "False"),  # 2024-01-15 10:00
        (2, 101.0, 1.0, 101.0, 1705316400000, "False", "True"),  # 2024-01-15 11:00
        (3, 102.0, 0.0, 0.0, 1705312800000, "True", "True"),  # invalid: qty=0
        (4, 103.0, 3.0, 309.0, 1705399200000, "x", None),  # 2024-01-16; odd bools
    ]
    import csv

    d = zone / "symbol=BTCUSDT" / "year=2024" / "month=1"
    d.mkdir(parents=True)
    with open(d / "part-0.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
    return str(zone)


def test_transform_semantics(spark, raw_zone):
    raw = read_trades_csv(spark, raw_zone)
    out = transform_trades(raw, load_dt=dt.date(2024, 2, 1)).orderBy("trade_id").collect()
    assert [r["trade_id"] for r in out] == [1, 2, 4]  # qty=0 row dropped
    assert list(out[0].asDict()) == list(OUTPUT_COLUMNS)
    r1 = out[0]
    assert r1["symbol"] == "BTCUSDT"
    assert (r1["year"], r1["month"], r1["day"]) == (2024, 1, 15)
    assert r1["trade_time"] == dt.datetime(2024, 1, 15, 10, 0)
    assert r1["load_dt"] == dt.date(2024, 2, 1)
    # exact-match string->bool: "x" and NULL both become False, never NULL
    r4 = out[2]
    assert r4["is_buyer_maker"] is False and r4["is_best_match"] is False


def test_etl_single_pass_metrics_and_catalog(spark, raw_zone):
    out_dir = SCRATCH / "processed"
    shutil.rmtree(out_dir, ignore_errors=True)
    res = run_trades_etl(
        spark, raw_zone, str(out_dir), table="trades_test", load_dt=dt.date(2024, 2, 1)
    )
    assert res.metrics["initial_rows"] == 4
    assert res.metrics["kept_rows"] == 3
    assert res.metrics["removed_rows"] == 1
    assert res.metrics["pct_removed"] == 25.0

    # catalog: partitions discovered, pruned read matches
    parts = [r[0] for r in show_partitions(spark, "trades_test").collect()]
    assert "year=2024/month=1/day=15/symbol=BTCUSDT" in parts
    t = spark.table("trades_test")
    day15 = t.filter((F.col("day") == 15) & (F.col("symbol") == "BTCUSDT"))
    assert day15.count() == 2
    plan = day15._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]


def test_partitioned_layout_on_disk(spark, raw_zone):
    out_dir = SCRATCH / "processed2"
    shutil.rmtree(out_dir, ignore_errors=True)
    run_trades_etl(spark, raw_zone, str(out_dir), load_dt=dt.date(2024, 2, 1))
    leafs = {p.parent.relative_to(out_dir).as_posix() for p in out_dir.rglob("*.parquet")}
    assert leafs == {
        "year=2024/month=1/day=15/symbol=BTCUSDT",
        "year=2024/month=1/day=16/symbol=BTCUSDT",
    }


def test_idempotent_rerun_dynamic_overwrite(spark, raw_zone):
    """Re-running the ETL must not duplicate rows (overwrite, not append)."""
    out_dir = SCRATCH / "processed3"
    shutil.rmtree(out_dir, ignore_errors=True)
    run_trades_etl(spark, raw_zone, str(out_dir), load_dt=dt.date(2024, 2, 1))
    run_trades_etl(spark, raw_zone, str(out_dir), load_dt=dt.date(2024, 2, 1))
    assert spark.read.parquet(str(out_dir)).count() == 3


def test_filter_with_metrics_is_single_action(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 10)
    res = filter_with_metrics(df, F.col("v") > 0)
    assert res.df.count() == 90  # the one action
    m = res.metrics()
    assert (m["initial_rows"], m["kept_rows"], m["removed_rows"]) == (100, 90, 10)


def test_drop_rate_report(spark):
    df = spark.range(8).withColumn("v", F.col("id") % 4)
    row = drop_rate_report(df, F.col("v") > 0).collect()[0]
    assert (row["initial_rows"], row["kept_rows"], row["removed_rows"]) == (8, 6, 2)
    assert row["pct_removed"] == 25.0


def test_dq_audit_and_sanity(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0, dt.datetime(2024, 1, 1)), (1, "a", -1.0, dt.datetime(2024, 1, 2)),
         (2, "a", 3.0, dt.datetime(2024, 1, 3))],
        "id long, sym string, price double, ts timestamp",
    )
    audit = dq_audit(df, ["sym"], "id", ["price"]).collect()[0]
    assert audit["row_count"] == 3
    assert audit["unique_id"] == 2
    assert audit["duplicate_count"] == 1
    assert audit["invalid_price_count"] == 1
    s = sanity_summary(df, "sym", "ts").collect()[0]
    assert s["min_ts"] == dt.datetime(2024, 1, 1) and s["max_ts"] == dt.datetime(2024, 1, 3)


def test_reference_padded_layout_roundtrip(spark):
    """The reference downloader writes zero-padded partition dirs
    (``month=07``, glue_binance_downloader.py:67-81) while this engine's
    own zones write unpadded values. Spark's partition discovery must
    recover INT-typed values from the padded layout and the full
    ETL + pruned read must agree with the unpadded result."""
    import csv

    zone = SCRATCH / "raw_zone_padded"
    shutil.rmtree(zone, ignore_errors=True)
    rows = [
        (10, 50.0, 2.0, 100.0, 1720000800000, "True", "False"),  # 2024-07-03
        (11, 51.0, 1.0, 51.0, 1720004400000, "False", "True"),
    ]
    d = zone / "symbol=ETHUSDT" / "year=2024" / "month=07"
    d.mkdir(parents=True)
    with open(d / "ETHUSDT-trades-2024-07.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        for r in rows:
            w.writerow(r)

    # The recursive CSV scan has no partition columns (recursiveFileLookup
    # disables discovery); partition values are recovered via the P2 regex
    # over input_file_name — padded "07" must cast to INT 7.
    from market_etl_spark.transforms import extract_path_partitions, with_lineage

    raw = extract_path_partitions(with_lineage(read_trades_csv(spark, str(zone))))
    assert dict(raw.dtypes)["month"] in ("int", "bigint")
    assert [r.month for r in raw.select("month").distinct().collect()] == [7]

    out_dir = SCRATCH / "processed_padded"
    shutil.rmtree(out_dir, ignore_errors=True)
    run_trades_etl(
        spark, str(zone), str(out_dir), table="trades_padded", load_dt=dt.date(2024, 8, 1)
    )
    t = spark.table("trades_padded")
    pruned = t.filter((F.col("month") == 7) & (F.col("symbol") == "ETHUSDT"))
    got = {r.trade_id for r in pruned.select("trade_id").collect()}
    assert got == {10, 11}
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


# ---------------------------------------------------------------------------
# Z-order layout (round 4)
# ---------------------------------------------------------------------------


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """The Morton layout must (a) return exactly the same rows as a
    direct filtered read for box AND single-dim predicates, (b) skip
    files for a selective box, and (c) skip files for a predicate on
    EITHER single column — the property a one-column clustering lacks."""
    from market_etl_spark.sinks import read_zorder_pruned, write_zorder_manifested

    src = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("int").alias("b"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z")
    write_zorder_manifested(src, path, "a", "b", n_files=16)

    # (a) correctness: box predicate
    df, scanned, total = read_zorder_pruned(spark, path, "a", (0, 7), "b", (0, 7))
    want = src.filter("a between 0 and 7 and b between 0 and 7")
    assert sorted(r.payload for r in df.collect()) == sorted(
        r.payload for r in want.collect()
    )
    # (b) the selective box skips most files
    assert total == 16 and scanned < total, (scanned, total)

    # (c) single-dimension predicates each prune too
    _, scanned_a, _ = read_zorder_pruned(spark, path, "a", (0, 7), "b", None)
    _, scanned_b, _ = read_zorder_pruned(spark, path, "a", None, "b", (0, 7))
    assert scanned_a < total, scanned_a
    assert scanned_b < total, scanned_b
    da, _, _ = read_zorder_pruned(spark, path, "a", (0, 7), "b", None)
    assert da.count() == src.filter("a between 0 and 7").count()


def test_zorder_empty_overlap_returns_empty(spark, tmp_path):
    from market_etl_spark.sinks import read_zorder_pruned, write_zorder_manifested

    src = spark.range(0, 256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") % 7).alias("b")
    )
    path = str(tmp_path / "z2")
    write_zorder_manifested(src, path, "a", "b", n_files=4)
    df, scanned, total = read_zorder_pruned(
        spark, path, "a", (1000, 2000), "b", None
    )
    assert scanned == 0 and df.count() == 0
