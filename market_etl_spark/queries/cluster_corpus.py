"""K-means clustering queries over the embeddings table.

Iterative algorithms are the one shape a single SQL statement cannot
express naturally — but a FIXED round budget unrolls into chained
CTEs, so even the multi-round fit is fully oracle-checked: the DuckDB
side replays the identical seed → assign → recompute-means → assign
chain and must land on the exact same integer assignments (distance
fp-noise ~1e-13 relative is far below the argmin gaps; the tie-break
is the deterministic (d2, cid) order on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import cluster
from ..tables import load
from .registry import query

_K = 8
_DIMS = 64


def _kmeans_oracle(k: int, rounds: int) -> str:
    """Unroll ``rounds`` Lloyd iterations into chained CTEs."""
    ctes = [
        f"""cent0 AS (
        SELECT s.cid, i - 1 AS dim, CAST(s.c[i] AS DOUBLE) AS cval
        FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                     embedding AS c
              FROM embeddings ORDER BY vec_id LIMIT {k}) s,
             range(1, {_DIMS + 1}) rr(i)
    )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""dist{r} AS (
        SELECT e.vec_id, c.cid,
               SUM(POWER(CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.cval, 2))
                   AS d2
        FROM embeddings e, cent{r - 1} c
        GROUP BY e.vec_id, c.cid
    )"""
        )
        ctes.append(
            f"""best{r} AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM dist{r}
    )"""
        )
        if r < rounds:
            ctes.append(
                f"""cent{r} AS (
        SELECT b.cid, i - 1 AS dim, AVG(CAST(e.embedding[i] AS DOUBLE)) AS cval
        FROM best{r} b JOIN embeddings e USING (vec_id),
             range(1, {_DIMS + 1}) rr(i)
        WHERE b.rn = 1
        GROUP BY b.cid, i
    )"""
            )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {chain}
    SELECT cid,
           COUNT(*) AS n_members,
           ROUND(AVG(SQRT(d2)), 5) AS avg_dist,
           ROUND(SUM(d2), 4) AS inertia
    FROM best{rounds}
    WHERE rn = 1
    GROUP BY cid
    ORDER BY cid
    """


def _cluster_stats(assigned: DataFrame) -> DataFrame:
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg(F.sqrt("d2")), 5).alias("avg_dist"),
            F.round(F.sum("d2"), 4).alias("inertia"),
        )
        .orderBy("cid")
    )


@query(
    "llm_kmeans_assign",
    oracle=_kmeans_oracle(_K, 1),
    tags=("llm", "clustering", "extension"),
)
def llm_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single Lloyd assignment round against deterministic lowest-id
    seeds: per-cluster member counts, mean L2 distance, and inertia.
    The fan-out is a BROADCAST join of the k·dim centroid rows against
    the posexploded vectors — one shuffle of n·k partial-agg
    accumulators, argmin via MIN(STRUCT(d2, cid)). Integer counts
    hash-matching proves both engines assigned every vector to the
    same cluster."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = cluster.seed_centroids(emb, _K)
    return _cluster_stats(cluster.assign_clusters(emb, seeds))


@query(
    "llm_kmeans_fit",
    oracle=_kmeans_oracle(_K, 2),
    tags=("llm", "clustering", "iterative", "extension"),
)
def llm_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO Lloyd rounds (seed → assign → recompute means → reassign):
    the iterative loop lives in the driver, centroids collected between
    rounds as k·dim model state and re-broadcast, so each round's plan
    is flat (no lineage replay). The oracle unrolls the identical two
    rounds into chained CTEs — the hash match certifies the whole
    iteration, not just one step."""
    emb = load(spark, sf_dir, "embeddings")
    return _cluster_stats(cluster.kmeans_fit(emb, _K, rounds=2))
