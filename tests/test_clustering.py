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
