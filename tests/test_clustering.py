"""Cluster-sorted layout tests: parquet row-group footer stats must
become skip-eligible for predicates on the cluster key, directly
verifying WHY the layout prunes — no scan-metric indirection."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from market_etl_spark.sinks import write_clustered
from market_etl_spark.tables import load

from conftest import SF_SMOKE


def _rowgroup_ranges(path_glob: str, col: str):
    ranges = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            ranges.append((st.min, st.max))
    return ranges


def test_clustered_rowgroups_skip_range_predicates(spark, tmp_path):
    e = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    plain = str(tmp_path / "plain")
    clustered = str(tmp_path / "clustered")
    # Force several row groups even at smoke scale (hadoop conf — the
    # writer option() is silently ignored for this key).
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.setInt("parquet.block.size", 8192)
    try:
        e.repartition(1).write.parquet(plain)
    finally:
        hc.unset("parquet.block.size")
    write_clustered(e.repartition(1), clustered, ["value"], block_bytes=8192)

    lo, hi = e.agg(F.min("value"), F.max("value")).first()
    span = hi - lo
    plain_rg = _rowgroup_ranges(f"{plain}/*.parquet", "value")
    clus_rg = _rowgroup_ranges(f"{clustered}/*.parquet", "value")
    assert len(clus_rg) > 1, "need multiple row groups for the test to mean anything"

    # Clustered groups cover narrow, near-disjoint slices...
    clus_span = sum(mx - mn for mn, mx in clus_rg) / len(clus_rg)
    assert clus_span < 0.5 * span
    # ...so a narrow range predicate intersects few of them, while every
    # unsorted group straddles most of the key space.
    probe_lo, probe_hi = lo + 0.45 * span, lo + 0.55 * span
    hits = sum(1 for mn, mx in clus_rg if not (mx < probe_lo or mn > probe_hi))
    assert hits <= max(2, len(clus_rg) // 2)
    plain_hits = sum(
        1 for mn, mx in plain_rg if not (mx < probe_lo or mn > probe_hi)
    )
    assert plain_hits == len(plain_rg)

    # Layout change only — same rows.
    a = sorted(map(tuple, spark.read.parquet(clustered).collect()))
    b = sorted(map(tuple, e.collect()))
    assert a == b


def test_zorder_contracts_both_dimensions(spark, tmp_path):
    """Z-ordered row groups must cover narrow slices of BOTH keys —
    the property the single-key sort cannot give (its secondary key
    spans the full range in every group)."""
    from market_etl_spark.sinks import write_zordered

    e = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zordered")
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.setInt("parquet.block.size", 4096)
    try:
        e.repartition(1).write.parquet(plain)
    finally:
        hc.unset("parquet.block.size")
    write_zordered(e, zpath, "user_id", "value", block_bytes=4096)

    for col in ("user_id", "value"):
        lo, hi = e.agg(F.min(col), F.max(col)).first()
        span = hi - lo
        z_rg = _rowgroup_ranges(f"{zpath}/*.parquet", col)
        plain_rg = _rowgroup_ranges(f"{plain}/*.parquet", col)
        assert len(z_rg) > 3, "need several row groups"
        z_span = sum(mx - mn for mn, mx in z_rg) / len(z_rg)
        plain_span = sum(mx - mn for mn, mx in plain_rg) / len(plain_rg)
        # z-order groups cover compact rectangles — materially narrower
        # than the unsorted layout on BOTH dimensions simultaneously
        assert z_span < 0.6 * span, (col, z_span, span)
        assert plain_span > 1.5 * z_span, (col, plain_span, z_span)
    # and the data survives the reshuffle byte-for-byte
    assert spark.read.parquet(zpath).count() == e.count()
