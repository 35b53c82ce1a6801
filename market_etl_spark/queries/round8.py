"""Round-8 additions (VERDICT r7 item 5's strongest absent candidates).

Three operators, each oracle-checked:

- ``q_streaming_ivm`` — the delta-join view-maintenance algebra of
  ``q_ivm_join_maintenance`` folded into a LIVE streaming refresh:
  foreachBatch maintains a stored aggregated-join view, work ∝ |Δ|
  per micro-batch.
- ``llm_density_dedup`` — HDBSCAN-style density clustering over the
  embedding pair graph: k-NN core distances → mutual-reachability
  metric → flat λ-cut → connected components (the existing hash-min
  CC operator).
- ``q_rowgroup_stats_audit`` — distributed parquet FOOTER
  introspection of the stats-manifested layout: per-file row-group
  stats read with pyarrow in executors, cross-checked against both
  the write-time manifest (``sinks.write_manifested``) and the data
  itself.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import query

#: Fixed slice for the exact density-clustering graph: the quadratic
#: pair recipe is bounded to a CONSTANT 400 vectors at every SF (same
#: convention as the other quadratic-oracle queries, whose brute-force
#: verification cannot scale) — the production-scale candidate path is
#: the LSH-bucketed llm_embedding_near_dup; this query pins the
#: density SEMANTICS exactly.
_DENSITY_SLICE = 400
_DENSITY_K = 4  # core distance = distance to the k-th nearest neighbor
_DENSITY_EPS = 0.68  # λ-cut on the mutual-reachability metric


@query(
    "q_streaming_ivm",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("streaming", "ivm", "materialized-view", "extension"),
)
def q_streaming_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental view maintenance (round-8: the batch
    delta algebra of ``q_ivm_join_maintenance`` run live): orders
    replay as 3 order-date-ranged micro-batches; every batch refreshes
    a STORED aggregated-join view via foreachBatch —

        M ← M ⊕ agg(Δorders ⋈ customer)

    a delta-sized broadcast join plus a segment-cardinality partial-agg
    merge, never a re-join or re-scan of the orders history.  The
    stored view (a tiny parquet table, localCheckpoint-severed from
    its own previous files before each overwrite) is the production
    shape of a continuously-maintained materialized view on plain
    parquet.  The oracle recomputes the view from the FINAL state in
    one shot, so the hash match proves per-batch maintenance converges
    to the from-scratch answer across every micro-batch boundary.

    Determinism: mergeable measures only (counts + exact
    cent-integers).  Scale: per-refresh work ∝ |Δ|; view size =
    segment cardinality; at 100 TB the delta broadcasts against a
    bucketed dimension and the view store is a single metadata-sized
    write per refresh."""
    import shutil

    from ..streaming import _SCRATCH, read_table_stream_multibatch

    tag = pathlib.Path(sf_dir.rstrip("/")).name.replace(".", "_")
    view_path = str(_SCRATCH / f"ivm_view_{tag}")
    shutil.rmtree(view_path, ignore_errors=True)

    dim = F.broadcast(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    stream = read_table_stream_multibatch(
        spark, sf_dir, "orders", "o_orderdate", n_files=3
    ).select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def refresh(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        delta = (
            batch_df.join(dim, batch_df["o_custkey"] == dim["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
        )
        if pathlib.Path(view_path).exists():
            merged = (
                s.read.parquet(view_path)
                .unionByName(delta)
                .groupBy("c_mktsegment")
                .agg(
                    F.sum("n_orders").cast("long").alias("n_orders"),
                    F.sum("revenue_cents").cast("long").alias("revenue_cents"),
                )
            )
        else:
            merged = delta
        # sever the plan from the view files it is about to replace
        merged.coalesce(1).localCheckpoint(eager=True).write.mode(
            "overwrite"
        ).parquet(view_path)

    import uuid

    ckpt = _SCRATCH / "checkpoints" / f"ivm_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # the view and every delta agg are segment-cardinality (5 keys)
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (
            stream.writeStream.foreachBatch(refresh)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(view_path).orderBy("c_mktsegment")


def _density_pair_sql() -> str:
    from ..llm.similarity import cosine_sql

    cos = cosine_sql("a.embedding", "b.embedding", 64)
    return f"""
    WITH pts AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_DENSITY_SLICE}
    ), pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               ROUND(1 - ({cos}), 6) AS d
        FROM pts a JOIN pts b ON a.vec_id < b.vec_id
    ), sym AS (
        SELECT ia AS node, ib AS other, d FROM pairs
        UNION ALL
        SELECT ib, ia, d FROM pairs
    ), cores AS (
        SELECT node, d AS core_d FROM (
            SELECT node, d, row_number() OVER (
                PARTITION BY node ORDER BY d, other
            ) AS rn FROM sym
        ) WHERE rn = {_DENSITY_K}
    ), edges AS (
        SELECT p.ia, p.ib
        FROM pairs p
        JOIN cores ca ON ca.node = p.ia
        JOIN cores cb ON cb.node = p.ib
        WHERE GREATEST(p.d, ca.core_d, cb.core_d) <= {_DENSITY_EPS}
    )
    """


@query(
    "llm_density_dedup",
    oracle=f"""
    WITH RECURSIVE {_density_pair_sql().strip().removeprefix("WITH")},
    bidir AS (
        SELECT ia AS src, ib AS dst FROM edges
        UNION
        SELECT ib, ia FROM edges
    ), r(node, lab) AS (
        SELECT src, src FROM bidir
        UNION
        SELECT e.dst, r.lab FROM r JOIN bidir e ON e.src = r.node
    ), cc AS (
        SELECT node, MIN(lab) AS cluster_id FROM r GROUP BY node
    )
    SELECT cluster_id AS cluster_rep,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(node) AS BIGINT) AS max_member
    FROM cc
    GROUP BY cluster_id
    ORDER BY cluster_rep
    """,
    tags=("llm", "dedup-clusters", "density", "extension"),
    max_verify_sf=0.1,
)
def llm_density_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDBSCAN-style density dedup clustering (round-8): over a fixed
    400-vector slice, compute each point's CORE DISTANCE (cosine
    distance to its 4th nearest neighbor), lift pair distances to the
    MUTUAL-REACHABILITY metric ``max(d(a,b), core(a), core(b))`` —
    HDBSCAN's density correction, which disconnects sparse points that
    merely pass near a cluster — then take the flat λ-cut at
    eps = 0.68 and label components with the engine's hash-min
    connected-components operator (``llm/dedup.py``).  This is exactly
    HDBSCAN's cluster extraction at one fixed density level λ = 1/eps;
    points whose core distance exceeds eps can form no edge and drop
    out as noise.  The oracle rebuilds the same graph in SQL and
    resolves components by recursive-CTE fixpoint.

    Determinism: distances are ROUND(1−cos, 6) with the fold-ordered
    dot product both engines share; core distances take the k-th
    smallest (distance, neighbor-id) pair, so boundary ties are
    ordered identically.

    Scale: the quadratic pair graph is pinned to a constant slice (the
    brute-force oracle cannot scale); the production candidate
    generator is the LSH-bucketed ``llm_embedding_near_dup`` path —
    swap it in as the ``pairs`` input and everything downstream (cores,
    mutual reachability, CC) is unchanged and linear in candidates."""
    from ..llm.dedup import connected_components
    from ..llm.similarity import cosine

    pts = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _DENSITY_SLICE)
        .select("vec_id", "embedding")
    )
    a = pts.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
    )
    b = pts.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(1 - cosine("ea", "eb"), 6).alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    sym = pairs.select(
        F.col("ia").alias("node"), F.col("ib").alias("other"), "d"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("node"), F.col("ia").alias("other"), "d"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("d", "other")
    cores = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _DENSITY_K)
        .select("node", F.col("d").alias("core_d"))
    )
    edges = (
        pairs.join(
            F.broadcast(cores.withColumnRenamed("node", "ia")).withColumnRenamed(
                "core_d", "core_a"
            ),
            "ia",
        )
        .join(
            F.broadcast(cores.withColumnRenamed("node", "ib")).withColumnRenamed(
                "core_d", "core_b"
            ),
            "ib",
        )
        .filter(
            F.greatest("d", "core_a", "core_b") <= F.lit(_DENSITY_EPS)
        )
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"))
    )
    cc = connected_components(edges)
    return (
        cc.groupBy(F.col("cluster_id").alias("cluster_rep"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("node").cast("long").alias("max_member"),
        )
        .orderBy("cluster_rep")
    )


@query(
    "q_rowgroup_stats_audit",
    oracle="""
    SELECT CAST(16 AS INT) AS n_files,
           CAST(16 AS INT) AS n_row_groups,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value,
           TRUE AS stats_present,
           TRUE AS manifest_consistent
    FROM events
    """,
    tags=("datalayout", "parquet-footer", "audit", "extension"),
)
def q_rowgroup_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet FOOTER / row-group statistics introspection (round-8):
    the stats-manifested events layout (16 value-clustered files +
    write-time manifest, :func:`..sinks.write_manifested`) is audited
    from its physical footers — executors open each file with pyarrow
    and read ``num_row_groups``, footer row counts, and per-row-group
    min/max statistics for the cluster column — then cross-checked
    three ways: footer row counts vs the manifest, footer min/max vs
    the manifest's write-time stats, and both vs the data itself (the
    oracle recomputes COUNT/MIN/MAX from the raw table).  A hash match
    certifies that the stats every pruning path trusts
    (``read_stats_pruned``, parquet row-group skipping) agree with the
    bytes on disk.

    Scale: footer reads are KB-sized metadata I/O fanned out one file
    per task — the planning-cost model of a manifest-driven table
    format; nothing data-sized moves."""
    import pandas as _pd

    from .etl_pipeline import ensure_manifested_events

    root = ensure_manifested_events(spark, sf_dir)
    data_dir = pathlib.Path(root) / "data"
    files = sorted(str(p) for p in data_dir.glob("part-*.parquet"))
    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))

    def footers(batches):
        import pyarrow.parquet as _pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = _pq.ParquetFile(p).metadata
                vidx = md.schema.names.index("value")
                mins, maxs = [], []
                ok = True
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(vidx)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        continue
                    mins.append(st.min)
                    maxs.append(st.max)
                rows.append(
                    (
                        pathlib.Path(p).name,
                        md.num_row_groups,
                        md.num_rows,
                        min(mins) if mins else None,
                        max(maxs) if maxs else None,
                        ok,
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "n_row_groups",
                    "footer_rows",
                    "footer_min",
                    "footer_max",
                    "stats_present",
                ],
            )

    footer_df = paths.mapInPandas(
        footers,
        schema=(
            "file_name string, n_row_groups int, footer_rows long,"
            " footer_min double, footer_max double, stats_present boolean"
        ),
    )
    manifest = spark.read.parquet(f"{root}/manifest").select(
        F.element_at(F.split("file_path", "/"), -1).alias("file_name"),
        F.col("stat_min").alias("man_min"),
        F.col("stat_max").alias("man_max"),
        F.col("n_rows").alias("man_rows"),
    )
    joined = footer_df.join(F.broadcast(manifest), "file_name", "inner")
    return joined.agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.sum("n_row_groups").cast("int").alias("n_row_groups"),
        F.sum("footer_rows").cast("long").alias("n_rows"),
        F.round(F.min("footer_min"), 6).alias("min_value"),
        F.round(F.max("footer_max"), 6).alias("max_value"),
        F.min("stats_present").alias("stats_present"),
        F.min(
            (F.col("footer_rows") == F.col("man_rows"))
            & (F.round(F.col("footer_min"), 6) == F.round(F.col("man_min"), 6))
            & (F.round(F.col("footer_max"), 6) == F.round(F.col("man_max"), 6))
        ).alias("manifest_consistent"),
    )
