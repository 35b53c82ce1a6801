"""Distributed Lloyd's k-means over an embedding column.

The missing piece between the one-shot IVF coarse quantizer
(:mod:`market_etl_spark.llm.similarity`, which runs a single
centroid-mean round) and a real clustering model: iterate
assign → recompute-means until the round budget is spent.

Execution model (the canonical distributed Lloyd's):

- Centroids are MODEL STATE — k·dim values, kilobytes at any k that
  makes sense — so they live on the driver between rounds and ship to
  executors via a broadcast join. The DATA never leaves the cluster.
- Assignment is one fan-out broadcast join: posexplode the vector to
  (id, dim, x) rows (plain ``Generate``, codegen downstream — see the
  row-wise rewrite notes in dedup.py), equi-join the k per-dim centroid
  rows on ``dim``, partial-aggregate ``SUM((x-c)^2)`` per (id, cid) —
  one shuffle of n·k accumulators, never n·k·dim rows.
- argmin is ``MIN(STRUCT(d2, cid))`` — deterministic tie-break on the
  lowest cid, stable across engines and partitionings.
- New means are one more partial-agg shuffle keyed (cid, dim).

Per round that is two shuffles over the fact side; at 100 TB the
assignment join stays broadcast (centroids are tiny) and both
aggregations combine map-side. Empty clusters simply disappear (no
rows to average), matching the SQL rendering the oracle runs.

All arithmetic is float→double cast BEFORE subtraction on both
engines, so distances agree to fp-sum noise (~1e-13 relative) and the
integer assignments agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seed_centroids", "assign_clusters", "recompute_centroids", "kmeans_fit"]


def seed_centroids(emb: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic seeding: the k lowest-id vectors become centroids
    0..k-1 (id order). Reproducible on any engine — no RNG to sync.
    Returns (cid, dim, cval double) rows, exploded for the assignment
    join."""
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .select(
            # k rows total after the LIMIT — the unpartitioned window
            # sorts k rows on one task, not the table
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cid"),
            F.col(vec_col).alias("c"),
        )
    )
    return seeds.select(
        "cid", F.posexplode("c").alias("dim", "cval")
    ).withColumn("cval", F.col("cval").cast("double"))


def assign_clusters(emb: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """One Lloyd assignment round: nearest centroid per vector by
    squared L2. ``centroids`` is (cid, dim, cval).

    The k·dim centroid rows are first rolled up into k (cid, array)
    rows (a k·dim-row aggregate — model-state sized) and BROADCAST;
    each vector then evaluates k in-row distance folds — pure map
    work. The distance is a left-to-right double fold over the zipped
    arrays, so NOTHING n·dims·k-sized ever materializes: the earlier
    posexplode-join shape shuffled n·k partial-agg accumulators built
    from an n·dims·k-row fan-out, which at 1e9 vectors × 64 dims ×
    1000 clusters is 6.4e13 intermediate rows — the difference between
    a map-side scan and an impossible job. Per-vector argmin is
    ``MIN(STRUCT(d2, cid))`` in the one (id-keyed) partial
    aggregation, deterministic ties to the lowest cid.

    Association note: the fold's fixed order differs from an unordered
    SUM only at fp-sum-noise magnitude (~1e-13 relative) — far below
    the argmin gaps, so assignments are stable (the module-docstring
    argument the oracle relies on)."""
    cent = centroids.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, cval))),"
            " s -> s.cval)"
        ).alias("_c")
    )
    d2 = F.expr(
        f"aggregate(zip_with({vec_col}, _c, (x, y) -> "
        "power(cast(x as double) - y, 2)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    best = (
        emb.select(id_col, vec_col)
        .crossJoin(F.broadcast(cent))
        .select(id_col, F.struct(d2.alias("d2"), "cid").alias("_m"))
        .groupBy(id_col)
        .agg(F.min("_m").alias("m"))
    )
    return best.select(id_col, F.col("m.d2").alias("d2"), F.col("m.cid").alias("cid")) \
               .select(id_col, "cid", "d2")


def recompute_centroids(emb: DataFrame, assigned: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """New centroids = per-(cid, dim) member means. Clusters that lost
    every member emit no rows and drop out (same as the SQL fixpoint).
    Returns (cid, dim, cval)."""
    e = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    return (
        e.join(assigned.select(id_col, "cid"), id_col)
        .groupBy("cid", "dim")
        .agg(F.avg("x").alias("cval"))
    )


def kmeans_fit(emb: DataFrame, k: int, rounds: int,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Iterative Lloyd's: seed on the k lowest ids, then ``rounds``
    assign/recompute cycles. Centroids are collected to the driver
    between rounds (k·dim doubles — model state, not data) and
    re-shipped as a broadcast literal, truncating the lineage so round
    R's plan does not replay rounds 1..R-1. Returns the FINAL
    assignment (id, cid, d2)."""
    spark = emb.sparkSession
    centroids = seed_centroids(emb, k, id_col, vec_col)
    assigned = None
    for r in range(rounds):
        assigned = assign_clusters(emb, centroids, id_col, vec_col)
        if r < rounds - 1:  # the last assignment IS the result
            new_rows = recompute_centroids(
                emb, assigned, id_col, vec_col
            ).collect()
            centroids = spark.createDataFrame(
                new_rows, "cid int, dim int, cval double"
            )
    return assigned
