"""Parquet-checkpoint metadata plane (round 12): state parity with
JSON replay, incremental advance as a Spark job, distributed prune
decisions identical to the driver-side prune, distributed footer
stats, and the read path composed on distributed decisions."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from market_etl_spark import lakehouse as lk
from market_etl_spark import lakehouse_checkpoint as ck


def _busy_table(spark, tmp_path):
    """Appends + MOR delete + CoW rewrite + evolution + rename — every
    action class the state carries."""
    path = str(tmp_path / "t")
    for i in range(3):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, float(j)) for j in range(10)],
                "id long, v double",
            ).coalesce(1)
        )
        t.commit()
    t = lk.Transaction(path)
    t.delete_where_mor(spark, F.col("id") == 5)
    t.commit()
    t = lk.Transaction(path)
    t.delete_where(spark, F.col("id") == 12)
    t.commit()
    return path


def _state_sets(spark, path, version=None):
    v, df, meta = ck.state_frame(spark, path, version)
    return (
        v,
        {r.file for r in df.filter("kind='add'").collect()},
        {r.file for r in df.filter("kind='dv'").collect()},
        meta,
    )


def test_bootstrap_state_parity(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    v = ck.write_parquet_checkpoint(spark, path)
    assert v == lk.latest_commit(path)
    pv, live_pq, dv_pq, meta_pq = _state_sets(spark, path)
    _v, live, dvs, _txns, meta, _stats = lk._state_full(path)
    assert (pv, live_pq, dv_pq, meta_pq) == (v, live, dvs, meta)


def test_json_tail_applied_over_checkpoint(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path, version=3)
    # the tail (3, 5] holds a MOR delete + a CoW rewrite; state_frame
    # must fold them without a new checkpoint
    pv, live_pq, dv_pq, _meta = _state_sets(spark, path)
    _v, live, dvs, _txns, _m, _s = lk._state_full(path)
    assert pv == 5 and live_pq == live and dv_pq == dvs
    # add-then-remove INSIDE the tail cancels exactly
    t = lk.Transaction(path)
    t.append(spark.createDataFrame([(77, 0.0)], "id long, v double"))
    t.commit()
    t = lk.Transaction(path)
    t.delete_where(spark, F.col("id") == 77)
    t.commit()
    pv, live_pq, dv_pq, _meta = _state_sets(spark, path)
    _v, live, dvs, _txns, _m, _s = lk._state_full(path)
    assert pv == 7 and live_pq == live and dv_pq == dvs


def test_advance_is_incremental_and_equal_to_bootstrap(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path, version=2)
    v = ck.advance_parquet_checkpoint(spark, path)
    assert v == 5 and ck.latest_parquet_checkpoint(path) == 5
    # advanced state == a from-scratch bootstrap at the same version
    adv = spark.read.parquet(str(ck._ckpt_dir(path, 5)))
    v2, live, dvs, txns, meta, stats = lk._state_full(path, 5)
    rows = ck._rows_of_state(live, dvs, txns, meta, stats)
    boot = spark.createDataFrame(rows, ck._SCHEMA)
    assert sorted(map(tuple, adv.collect())) == sorted(map(tuple, boot.collect()))
    # idempotent when already at latest
    assert ck.advance_parquet_checkpoint(spark, path) == 5


def test_distributed_prune_matches_driver_prune(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path)
    for pred in (
        [("id", "<", 5)],
        [("id", ">=", 25)],
        [("id", "=", 12)],
        [("id", "in", (1, 21))],
        [("id", "<", 5), ("id", ">", 50)],
        [("id", "<", 0)],
        [("nope", "=", 1)],
    ):
        assert ck.prune_files_distributed(spark, path, pred) == lk.prune_files(
            path, pred
        ), pred


def test_distributed_prune_respects_column_mapping(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    t = lk.Transaction(path)
    t.rename_column("id", "ident")
    t.commit()
    ck.write_parquet_checkpoint(spark, path)
    pred = [("ident", "<", 5)]
    assert ck.prune_files_distributed(spark, path, pred) == lk.prune_files(
        path, pred
    )


def test_distributed_stats_match_serial(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    root = pathlib.Path(path)
    _v, live, _dvs, _t, _m, _s = lk._state_full(path)
    paths = [str(root / f) for f in sorted(live)]
    assert ck.stats_distributed(spark, paths) == {
        p: lk._file_stats(pathlib.Path(p)) for p in paths
    }
    assert ck.stats_distributed(spark, []) == {}
    # force_cols rides through to the executors
    wide = ck.stats_distributed(spark, paths, force_cols=("v",))
    assert all("v" in st["cols"] for st in wide.values())


def test_pruned_read_on_distributed_decisions(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path)
    for pred in ([("id", "<", 5)], [("id", ">", 7)], [("id", "<", 0)]):
        got = ck.read_table_distributed_prune(spark, path, pred)
        exp = lk.read_table(spark, path, predicate=pred)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        ), pred


def test_state_frame_requires_a_checkpoint(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    with pytest.raises(ValueError, match="no parquet checkpoint"):
        ck.state_frame(spark, path)


def test_time_travel_uses_older_checkpoint(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path, version=2)
    ck.write_parquet_checkpoint(spark, path, version=4)
    # version 3 must start from ckpt 2 + tail commit 3, not ckpt 4
    pv, live_pq, dv_pq, _meta = _state_sets(spark, path, version=3)
    _v, live, dvs, _txns, _m, _s = lk._state_full(path, 3)
    assert pv == 3 and live_pq == live and dv_pq == dvs


def test_staging_switches_to_distributed_stats(spark, tmp_path, monkeypatch):
    """Past the part-count threshold the staging paths compute footer
    stats as one Spark job — byte-identical stats dicts to the serial
    driver reads they replace."""
    monkeypatch.setattr(lk, "_STATS_DISTRIBUTED_MIN_FILES", 4)
    path = str(tmp_path / "t")
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(j, float(j)) for j in range(400)], "id long, v double"
        ).repartition(8)
    )
    t.commit()
    t = lk.Transaction(path)
    t.compact(spark, n_files=6)
    t.commit()
    root = pathlib.Path(path)
    for v in (1, 2):
        adds = [
            a for a in lk._read_commit(path, v)["actions"] if a["op"] == "add"
        ]
        assert len(adds) >= 4
        for a in adds:
            assert a["stats"] == lk._file_stats(root / a["file"])


def test_advance_retains_bounded_checkpoints(spark, tmp_path):
    """Every advance would otherwise strand a full O(files) metadata
    generation forever: only the `keep` newest survive (the new one
    plus its predecessor for readers racing the advance)."""
    path = _busy_table(spark, tmp_path)  # 5 commits
    ck.write_parquet_checkpoint(spark, path, version=1)
    for v in (2, 3, 4, 5):
        ck.advance_parquet_checkpoint(spark, path, version=v)
    log = pathlib.Path(path) / lk._LOG_DIR
    left = sorted(p.name for p in log.glob("ckptpq-*"))
    assert left == ["ckptpq-00000004", "ckptpq-00000005"]
    # the survivor still reconstructs the exact state
    pv, live_pq, dv_pq, _meta = _state_sets(spark, path)
    _v, live, dvs, _t, _m, _s = lk._state_full(path)
    assert pv == 5 and live_pq == live and dv_pq == dvs


def test_expiry_drops_stale_parquet_checkpoints(spark, tmp_path):
    """A parquet checkpoint below the retention boundary references
    deleted files and its replay tail's commit JSONs are gone —
    expire_versions must remove it so state_frame re-bootstraps
    cleanly instead of dying mid-tail."""
    path = _busy_table(spark, tmp_path)  # 5 commits
    ck.write_parquet_checkpoint(spark, path, version=2)
    lk.expire_versions(path, keep_from=4)
    log = pathlib.Path(path) / lk._LOG_DIR
    assert not list(log.glob("ckptpq-*"))
    with pytest.raises(ValueError, match="no parquet checkpoint"):
        ck.state_frame(spark, path)
    # re-bootstrap works and agrees with JSON replay
    ck.write_parquet_checkpoint(spark, path)
    pv, live_pq, dv_pq, _m = _state_sets(spark, path)
    _v, live, dvs, _t, _m2, _s = lk._state_full(path)
    assert pv == 5 and live_pq == live and dv_pq == dvs
    # ... and a checkpoint AT/above the boundary survives expiry
    path2 = _busy_table(spark, tmp_path.joinpath("b"))
    ck.write_parquet_checkpoint(spark, path2, version=4)
    lk.expire_versions(path2, keep_from=4)
    assert ck.latest_parquet_checkpoint(path2) == 4
    pv2 = ck.state_frame(spark, path2)[0]
    assert pv2 == 5


def test_orphan_sweep_removes_crashed_advance_staging(spark, tmp_path):
    path = _busy_table(spark, tmp_path)
    log = pathlib.Path(path) / lk._LOG_DIR
    debris = log / ".ckptpq-00000009-tmp-deadbeef"
    debris.mkdir()
    (debris / "part-0.parquet").write_bytes(b"x")
    removed = lk.vacuum_orphans(path, min_age_sec=0.0)
    assert removed >= 1 and not debris.exists()


def test_advance_across_rename_keeps_prune_parity(spark, tmp_path):
    """A rename landing in the advance TAIL: the checkpoint's meta row
    folds the new colmap, and distributed pruning keeps translating
    logical predicates to the immutable physical names."""
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path, version=3)
    t = lk.Transaction(path)
    t.rename_column("id", "ident")
    t.commit()
    ck.advance_parquet_checkpoint(spark, path)
    for pred in ([("ident", "<", 5)], [("ident", ">=", 25)]):
        assert ck.prune_files_distributed(spark, path, pred) == lk.prune_files(
            path, pred
        ), pred
    got = ck.read_table_distributed_prune(spark, path, [("ident", "<", 5)])
    exp = lk.read_table(spark, path, predicate=[("ident", "<", 5)])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )


def test_format_writer_commits_feed_the_checkpoint_plane(spark, tmp_path):
    """df.write.format('lakehouse') commits advance the parquet
    checkpoint like any other commit — the two round-12 planes
    compose."""
    from market_etl_spark.lakehouse_datasource import register

    register(spark)
    path = str(tmp_path / "w")
    src = spark.createDataFrame(
        [(j, float(j)) for j in range(20)], "id long, v double"
    )
    src.write.format("lakehouse").mode("append").save(path)
    ck.write_parquet_checkpoint(spark, path)
    src.write.format("lakehouse").mode("append").save(path)
    v = ck.advance_parquet_checkpoint(spark, path)
    assert v == 2
    pv, live_pq, dv_pq, _m = _state_sets(spark, path)
    _v, live, dvs, _t, _m2, _s = lk._state_full(path)
    assert pv == 2 and live_pq == live and dv_pq == dvs


def test_restore_in_tail_keeps_add_rows_distinct(spark, tmp_path):
    """ADVICE r12 (high): a checkpoint -> rewrite -> RESTORE sequence
    nets to a tail that RE-ADDS files the base checkpoint already
    carries — the base rows must drop, or the state frame holds
    duplicate add rows and every distributed-prune read doubles."""
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path)
    v0 = lk.latest_commit(path)
    t = lk.Transaction(path)
    t.compact(spark, n_files=1)
    t.commit()
    lk.restore_table(spark, path, v0)  # tail removes + re-adds base files
    v, df, _meta = ck.state_frame(spark, path)
    adds = df.filter("kind='add'").select("file")
    assert adds.count() == adds.distinct().count()
    # set-based parity (sets would HIDE the duplicate; counts can't)
    _v2, live, dvs, _t, _m, _s = lk._state_full(path)
    assert {r.file for r in adds.collect()} == live
    dv_rows = df.filter("kind='dv'").select("file")
    assert dv_rows.count() == dv_rows.distinct().count()
    assert {r.file for r in dv_rows.collect()} == dvs
    # the frame-composed READ returns the same rows as JSON replay
    got = ck.read_table_distributed_prune(spark, path, [("id", ">=", 0)])
    want = lk.read_table(spark, path, predicate=[("id", ">=", 0)])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # and the duplicates must not persist into the NEXT generation
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame([(900, 1.0)], "id long, v double").coalesce(1)
    )
    t.commit()
    ck.advance_parquet_checkpoint(spark, path)
    base = spark.read.parquet(
        str(ck._ckpt_dir(path, lk.latest_commit(path)))
    ).filter("kind='add'")
    assert base.count() == base.select("file").distinct().count()


def test_state_arrow_and_meta_arrow_match_json_replay(spark, tmp_path):
    """The session-less (pyarrow) state composition the DataSource
    planning process uses must equal JSON replay exactly — base from
    checkpoint parquet, tail applied, at the tip AND time-traveled."""
    import json as _json

    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path, version=3)
    # rename AFTER the checkpoint: the tail carries a set_meta fold
    t = lk.Transaction(path)
    t.rename_column("v", "val")
    t.commit()
    for ver in (3, 4, None):
        av, alive, advs, ameta = ck.state_arrow(path, ver)
        jv, jlive, jdvs, _txns, jmeta, jstats = lk._state_full(path, ver)
        assert (av, set(alive), advs, ameta) == (jv, jlive, jdvs, jmeta)
        for f, s in alive.items():
            assert (_json.loads(s) if s else None) == jstats[f]
        mv, mmeta = ck.meta_arrow(path, ver)
        assert (mv, mmeta) == (jv, jmeta)
    with pytest.raises(ValueError, match="no parquet checkpoint"):
        ck.state_arrow(path, 2)


def test_checkpoint_planned_read_table_parity(spark, tmp_path):
    """read_table past the plan threshold routes through
    state_frame + distributed prune — rows, schema and prune
    decisions must equal the JSON-replay route (VERDICT r12 #1)."""
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path)
    pred = [("id", ">=", 10)]
    want = lk.read_table(spark, path, predicate=pred)  # JSON route
    spark.conf.set(ck.PLAN_MIN_FILES_CONF, "1")
    try:
        got = lk.read_table(spark, path, predicate=pred)
        assert got.columns == want.columns
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # filterless + time-travel parity through the same route
        assert lk.read_table(spark, path).count() == lk.read_table(
            spark, path, version=lk.latest_commit(path)
        ).count()
        # empty-table error parity is preserved on the routed path
        empty = str(tmp_path / "empty13")
        t = lk.Transaction(empty)
        t.append(
            spark.createDataFrame([(1,)], "id long").coalesce(1)
        )
        t.commit()
        t = lk.Transaction(empty)
        t.delete_where(spark, F.lit(True))
        t.commit()
        ck.write_parquet_checkpoint(spark, empty)
        with pytest.raises(ValueError, match="is empty"):
            lk.read_table(spark, empty)
    finally:
        spark.conf.unset(ck.PLAN_MIN_FILES_CONF)


def test_datasource_plans_from_checkpoint_identically(spark, tmp_path):
    """The registered source's checkpoint route (pyarrow — the
    planning worker has no session) must produce the same rows AND
    the same pruned partition list as the JSON-replay route."""
    from market_etl_spark import lakehouse_datasource as lds

    lds.register(spark)
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path)
    via_json = spark.read.format("lakehouse") \
        .option("planFromCheckpoint", "false").load(path)
    via_ckpt = spark.read.format("lakehouse") \
        .option("planFromCheckpoint", "true").load(path)
    assert via_ckpt.schema == via_json.schema
    assert sorted(map(tuple, via_ckpt.collect())) == sorted(
        map(tuple, via_json.collect())
    )
    # partition-list equality, route by route, with a pushed filter
    schema = via_json.schema
    pred = [("id", ">=", 10)]
    planned = {}
    for route in ("false", "true"):
        r = lds._LakehouseBatchReader(
            {"path": path, "planFromCheckpoint": route}, schema
        )
        r._conj = list(pred)
        planned[route] = [
            (p.file, p.dv_files) for p in r.partitions()
        ]
    assert planned["true"] == planned["false"]
    _v, kept, _total = lk.prune_files(path, pred)
    assert [f for f, _dv in planned["true"]] == kept
    # auto mode: tiny table stays on the JSON route under the default
    # floor, and flips with the per-read floor option
    assert not lds._use_checkpoint_plan({}, path, None)
    assert lds._use_checkpoint_plan(
        {"checkpointPlanMinFiles": "1"}, path, None
    )
    # forcing the route on a checkpoint-less table fails loudly
    bare = str(tmp_path / "bare13")
    t = lk.Transaction(bare)
    t.append(spark.createDataFrame([(1,)], "id long").coalesce(1))
    t.commit()
    with pytest.raises(Exception, match="no parquet checkpoint"):
        spark.read.format("lakehouse") \
            .option("planFromCheckpoint", "true").load(bare).collect()


def test_commit_auto_advances_past_interval(spark, tmp_path):
    """Commits roll the parquet checkpoint forward once the JSON tail
    reaches the configured interval — opt-in (no bootstrap = no
    advance), and OFF at interval 0."""
    path = _busy_table(spark, tmp_path)  # 5 commits, no checkpoint

    def bump(i):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(9000 + i, 0.0)], "id long, v double"
            ).coalesce(1)
        )
        t.commit()

    bump(0)
    assert ck.latest_parquet_checkpoint(path) is None  # never bootstrapped
    v0 = ck.write_parquet_checkpoint(spark, path)
    spark.conf.set(ck.AUTO_ADVANCE_CONF, "2")
    try:
        bump(1)
        assert ck.latest_parquet_checkpoint(path) == v0  # tail of 1 < 2
        bump(2)
        v_adv = ck.latest_parquet_checkpoint(path)
        assert v_adv == lk.latest_commit(path)  # tail hit 2: advanced
        # advanced state equals JSON replay
        _pv, live_pq, dv_pq, meta_pq = _state_sets(spark, path)
        _v, live, dvs, _txns, meta, _stats = lk._state_full(path)
        assert (live_pq, dv_pq, meta_pq) == (live, dvs, meta)
        spark.conf.set(ck.AUTO_ADVANCE_CONF, "0")
        bump(3)
        bump(4)
        assert ck.latest_parquet_checkpoint(path) == v_adv  # disabled
    finally:
        spark.conf.unset(ck.AUTO_ADVANCE_CONF)


def test_checkpoint_routes_respect_column_mapping_and_evolution(
    spark, tmp_path
):
    """Adversarial round-13 composition: a RENAME (column mapping) and
    a schema EVOLUTION land in the JSON tail after the checkpoint —
    both plan routes must translate LOGICAL predicate names to the
    physical footer-stats names and align evolved columns, exactly
    like the JSON route."""
    from market_etl_spark import lakehouse_datasource as lds

    lds.register(spark)
    path = str(tmp_path / "cmap13")
    for i in range(2):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, float(j)) for j in range(10)],
                "id long, v double",
            ).coalesce(1)
        )
        t.commit()
    ck.write_parquet_checkpoint(spark, path)
    t = lk.Transaction(path)
    t.rename_column("v", "val")  # tail set_meta: colmap val->phys v
    t.commit()
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(100, 1.5, 7)], "id long, val double, extra long"
        ),
        evolve_schema=True,
    )
    t.commit()
    pred = [("val", ">=", 1.0)]  # LOGICAL name: needs the colmap
    want = lk.read_table(spark, path, predicate=pred)
    # session-less route: prune decisions + kept set
    _v, kept, _dvs, _meta, total = ck.prune_scan_arrow(path, pred)
    _jv, jkept, jtotal = lk.prune_files(path, pred)
    assert (kept, total) == (jkept, jtotal)
    # routed read_table parity (rows + evolved NULL alignment)
    spark.conf.set(ck.PLAN_MIN_FILES_CONF, "1")
    try:
        got = lk.read_table(spark, path, predicate=pred)
        assert got.columns == want.columns == ["id", "val", "extra"]
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.unset(ck.PLAN_MIN_FILES_CONF)
    # registered source, checkpoint route, same logical predicate
    df = (
        spark.read.format("lakehouse")
        .option("planFromCheckpoint", "true").load(path)
        .filter("val >= 1.0")
    )
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_auto_advance_survives_concurrent_commits(spark, tmp_path):
    """Two threads committing through the auto-advance window: the
    advance is derived state — whatever interleaving wins, the final
    checkpoint must compose to the same state as JSON replay and no
    commit may fail."""
    import threading

    path = str(tmp_path / "race13")
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(j, float(j)) for j in range(10)], "id long, v double"
        ).coalesce(1)
    )
    t.commit()
    ck.write_parquet_checkpoint(spark, path)
    spark.conf.set(ck.AUTO_ADVANCE_CONF, "1")  # advance every commit
    errors = []

    def worker(base):
        try:
            for i in range(3):
                t = lk.Transaction(path)
                t.append(
                    spark.createDataFrame(
                        [(base + i, 0.0)], "id long, v double"
                    ).coalesce(1)
                )
                t.commit()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    try:
        th = [threading.Thread(target=worker, args=(b,))
              for b in (1000, 2000)]
        for x in th:
            x.start()
        for x in th:
            x.join()
    finally:
        spark.conf.unset(ck.AUTO_ADVANCE_CONF)
    assert not errors
    ck.advance_parquet_checkpoint(spark, path)  # settle to the tip
    _pv, live_pq, dv_pq, meta_pq = _state_sets(spark, path)
    _v, live, dvs, _txns, meta, _stats = lk._state_full(path)
    assert (live_pq, dv_pq, meta_pq) == (live, dvs, meta)
    assert lk.read_table(spark, path).count() == 16


def test_arrow_advance_matches_spark_advance(spark, tmp_path):
    """The session-less (pyarrow) checkpoint advance — what the
    registered writer's commit hook runs — must land a checkpoint
    state-identical to the Spark-job advance over the same tail."""
    path = _busy_table(spark, tmp_path)
    ck.write_parquet_checkpoint(spark, path, version=3)
    v = ck.advance_parquet_checkpoint_arrow(path)
    assert v == 5 == ck.latest_parquet_checkpoint(path)
    adv = spark.read.parquet(str(ck._ckpt_dir(path, 5)))
    v2, live, dvs, txns, meta, stats = lk._state_full(path, 5)
    boot = spark.createDataFrame(
        ck._rows_of_state(live, dvs, txns, meta, stats), ck._SCHEMA
    )
    assert sorted(map(tuple, adv.collect())) == sorted(
        map(tuple, boot.collect())
    )
    # idempotent at the tip
    assert ck.advance_parquet_checkpoint_arrow(path) == 5


def test_format_writer_auto_advances_checkpoint(spark, tmp_path):
    """End to end through the REGISTERED WRITER (whose commit hook
    runs in Spark's session-less worker): once the table has a
    bootstrapped checkpoint, enough writer commits roll it forward
    without any session-side help."""
    from market_etl_spark import lakehouse_datasource as lds

    lds.register(spark)
    path = str(tmp_path / "wadv")
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame([(0, 0.0)], "id long, v double").coalesce(1)
    )
    t.commit()
    v0 = ck.write_parquet_checkpoint(spark, path)
    for i in range(ck.AUTO_ADVANCE_DEFAULT):
        spark.createDataFrame(
            [(i + 1, 1.0)], "id long, v double"
        ).coalesce(1).write.format("lakehouse").mode("append").save(path)
    v_adv = ck.latest_parquet_checkpoint(path)
    assert v_adv is not None and v_adv > v0
    # advanced state equals JSON replay at its version
    pv, live_pq, dv_pq, meta_pq = _state_sets(spark, path, v_adv)
    _v, live, dvs, _txns, meta, _stats = lk._state_full(path, v_adv)
    assert (live_pq, dv_pq, meta_pq) == (live, dvs, meta)


def test_delete_of_restored_file_stays_deleted(spark, tmp_path):
    """ADVICE r13 (high): checkpoint -> DELETE -> RESTORE -> DELETE.
    The final remove cancels the tail's re-add in ``_tail_net``, but
    the BASE checkpoint still carries the file's add row — unless the
    remove also lands in ``removed``, the deleted file resurrects in
    every checkpoint-composed route (state_frame / state_arrow /
    prune_scan_arrow) and the advance persists it permanently."""
    path = str(tmp_path / "t")
    for lo in (0, 10):
        t = lk.Transaction(path)
        t.append(
            spark.createDataFrame(
                [(lo + j, float(j)) for j in range(10)],
                "id long, v double",
            ).coalesce(1)
        )
        t.commit()
    ck.write_parquet_checkpoint(spark, path)
    v0 = lk.latest_commit(path)
    t = lk.Transaction(path)
    assert t.delete_where(spark, F.col("id") < 10) == 10
    t.commit()
    lk.restore_table(spark, path, v0)  # tail re-adds the deleted file
    t = lk.Transaction(path)
    assert t.delete_where(spark, F.col("id") < 10) == 10
    t.commit()
    # JSON replay is ground truth: ids 0-9 are gone
    _v, live, dvs, _t, _m, _s = lk._state_full(path)
    # every composed route must agree — file sets AND read rows
    pv, live_pq, dv_pq, _meta = _state_sets(spark, path)
    assert (pv, live_pq, dv_pq) == (lk.latest_commit(path), live, dvs)
    av, alive, advs, _am = ck.state_arrow(path)
    assert (av, set(alive), advs) == (pv, live, dvs)
    sv, kept, dvf, _m2, total = ck.prune_scan_arrow(path, [])
    assert (sv, set(kept), set(dvf), total) == (pv, live, dvs, len(live))
    got = ck.read_table_distributed_prune(spark, path, [("id", ">=", 0)])
    assert sorted(r.id for r in got.collect()) == list(range(10, 20))
    # the advance must not resurrect the file into the next generation
    ck.advance_parquet_checkpoint(spark, path)
    base = spark.read.parquet(
        str(ck._ckpt_dir(path, lk.latest_commit(path)))
    ).filter("kind='add'")
    assert {r.file for r in base.collect()} == live


def test_dv_removed_after_restore_readd_stays_removed(spark, tmp_path):
    """Symmetric DV case (ADVICE r13): checkpoint carries a DV row;
    the tail removes it (CoW rewrite), re-adds it (RESTORE), then
    removes it again — the final ``remove_dv`` must evict the BASE dv
    row, or a stale vector survives and wrongly hides rows."""
    path = str(tmp_path / "t")
    t = lk.Transaction(path)
    t.append(
        spark.createDataFrame(
            [(j, float(j)) for j in range(10)], "id long, v double"
        ).coalesce(1)
    )
    t.commit()
    t = lk.Transaction(path)
    t.delete_where_mor(spark, F.col("id") == 5)  # DV in the base
    t.commit()
    ck.write_parquet_checkpoint(spark, path)
    v0 = lk.latest_commit(path)
    t = lk.Transaction(path)
    t.delete_where(spark, F.col("id") == 6)  # CoW: remove file+DV
    t.commit()
    lk.restore_table(spark, path, v0)  # re-adds file AND its DV
    t = lk.Transaction(path)
    t.delete_where(spark, F.col("id") == 6)  # removes the DV again
    t.commit()
    _v, live, dvs, _t2, _m, _s = lk._state_full(path)
    pv, live_pq, dv_pq, _meta = _state_sets(spark, path)
    assert (pv, live_pq, dv_pq) == (lk.latest_commit(path), live, dvs)
    av, alive, advs, _am = ck.state_arrow(path)
    assert (av, set(alive), advs) == (pv, live, dvs)
    got = ck.read_table_distributed_prune(spark, path, [("id", ">=", 0)])
    want = lk.read_table(spark, path)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    ck.advance_parquet_checkpoint(spark, path)
    nxt = spark.read.parquet(
        str(ck._ckpt_dir(path, lk.latest_commit(path)))
    )
    assert {r.file for r in nxt.filter("kind='dv'").collect()} == dvs
    assert {r.file for r in nxt.filter("kind='add'").collect()} == live
