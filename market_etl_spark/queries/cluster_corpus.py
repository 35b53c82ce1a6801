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


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic dedup (round 4)
# ---------------------------------------------------------------------------

_SEM_TAU = 0.4


def _semdedup_oracle(k: int, tau: float) -> str:
    """Nearest-seed assignment + within-cluster exact-cosine pair scan,
    with the keep-most-central drop rule — every float built from the
    same left-to-right folds the Spark side uses."""
    from ..llm.semdedup import d2_sql
    from ..llm.similarity import cosine_sql

    return f"""
    WITH seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS c
        FROM embeddings ORDER BY vec_id LIMIT {k}
    ), dist AS (
        SELECT e.vec_id, s.cid, {d2_sql('e.embedding', 's.c', _DIMS)} AS d2
        FROM embeddings e CROSS JOIN seeds s
    ), best AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM dist
    ), v AS (
        SELECT b.vec_id, b.cid, b.d2, e.embedding
        FROM best b JOIN embeddings e USING (vec_id) WHERE b.rn = 1
    ), pairs AS (
        SELECT a.cid,
               CASE WHEN a.d2 < b.d2 OR (a.d2 = b.d2 AND a.vec_id < b.vec_id)
                    THEN b.vec_id ELSE a.vec_id END AS dropped
        FROM v a JOIN v b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE {cosine_sql('a.embedding', 'b.embedding', _DIMS)} >= {tau}
    ), members AS (
        SELECT cid, COUNT(*) AS n_members FROM v GROUP BY cid
    ), dup AS (
        SELECT cid, COUNT(*) AS n_dup_pairs,
               COUNT(DISTINCT dropped) AS n_dropped
        FROM pairs GROUP BY cid
    )
    SELECT m.cid, m.n_members,
           COALESCE(d.n_dup_pairs, 0) AS n_dup_pairs,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           m.n_members - COALESCE(d.n_dropped, 0) AS n_kept
    FROM members m LEFT JOIN dup d USING (cid)
    ORDER BY m.cid
    """


@query(
    "llm_semdedup_centroid",
    oracle=_semdedup_oracle(_K, _SEM_TAU),
    tags=("llm", "dedup-semantic", "clustering", "extension"),
)
def llm_semdedup_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): partition the embedding space into
    k clusters, find cosine-duplicate pairs ONLY among cluster
    co-members, and keep each neighborhood's most-central
    representative. The per-cluster summary (members / dup pairs /
    dropped / kept) is the curation report, all integers.

    The cluster partition is what makes semantic dedup linear: the
    pair join shuffles on ``cid`` and its cost is k·(n/k)² — pick
    k ∝ n (paper: 50k clusters at web scale) and total work stays
    O(n·c) for bounded cluster size c. Assignment itself is a
    broadcast nearest-seed pass, no shuffle (see
    :mod:`..llm.semdedup`)."""
    from ..llm import semdedup

    emb = load(spark, sf_dir, "embeddings")
    return semdedup.semantic_dedup_summary(emb, _K, _SEM_TAU)
