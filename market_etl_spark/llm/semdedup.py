"""SemDeDup-style semantic deduplication: cluster-scoped embedding
near-dup removal (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540).

The published recipe: k-means the embedding space, then look for
near-duplicate pairs ONLY inside each cluster — the cluster partition
turns a hopeless O(n²) global pair search into k independent
O((n/k)²) searches, and k is an operator knob chosen so clusters stay
bounded (the paper runs k=50k over web-scale corpora; at 100 TB the
within-cluster pair join is a shuffle on ``cid`` whose per-partition
cost is (cluster size)² — pick k ∝ n and the total work stays linear
in n with a bounded constant).

This engine's rendering keeps every step deterministic and
oracle-checkable:

- **Seeding/assignment** — the k lowest-id vectors are the centroids
  (no RNG to sync across engines) and assignment is one broadcast
  nearest-seed pass. Distances are LEFT-TO-RIGHT double-precision
  folds over the array (same association as the oracle's explicit
  per-index sum), so the integer assignments are bit-reproducible.
  Callers that want fitted centroids can swap in
  :func:`..llm.cluster.kmeans_fit` — the dedup contract only needs
  *a* deterministic partition of the space.
- **Dup predicate** — exact cosine ≥ tau between cluster co-members,
  computed with the shared fold (:mod:`.similarity`), never an
  approximation: the LSH/ANN shortcuts live in their own operators;
  SemDeDup's candidate cut is the cluster itself.
- **Keep rule** — within each duplicate pair the vector CLOSER to its
  centroid survives (ties to the lower id). Dropping the redundant
  periphery of each semantic neighborhood is the paper's
  keep-one-representative policy made deterministic.

The plan: one broadcast nearest-seed pass (no shuffle), one shuffle on
``cid`` for the pair join, one partial-agg shuffle for the per-cluster
summary. State is ids + 8-byte distances; embeddings are dropped
immediately after the pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import similarity

__all__ = ["nearest_seed_assign", "semantic_dedup_summary"]

#: Left-to-right double fold of the squared L2 distance between two
#: float arrays — same association as the oracle's explicit
#: ``POWER(e[1]-c[1], 2) + ...`` sum, so distances agree bit-for-bit.
_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "power(cast(x as double) - cast(y as double), 2)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def d2_sql(a: str, b: str, dims: int) -> str:
    """Oracle rendering of the fold (1-based list indexing)."""
    return " + ".join(
        f"POWER({a}[{i}]::DOUBLE - {b}[{i}]::DOUBLE, 2)"
        for i in range(1, dims + 1)
    )


def nearest_seed_assign(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest of the k lowest-id seed
    vectors by squared L2 (ties to the lowest cid). Returns
    (id, vec, cid, d2) — the embedding rides along so the caller's
    pair join needs no second scan.

    The seeds are k whole rows (kilobytes), broadcast; the fan-out is
    a broadcast nested-loop of k fold evaluations per vector — pure
    map work, no shuffle, linear in n at any corpus size."""
    from pyspark.sql import Window

    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .select(
            # k rows after the LIMIT — the unpartitioned window sorts k
            # rows on one task, not the table (cluster.seed_centroids
            # precedent).
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cid"),
            F.col(vec_col).alias("_c"),
        )
    )
    fanout = emb.select(id_col, vec_col).crossJoin(F.broadcast(seeds))
    d2 = F.expr(_D2.format(a=vec_col, b="_c"))
    return (
        fanout.select(id_col, vec_col, "cid", d2.alias("_d2"))
        .groupBy(id_col)
        .agg(
            F.min(F.struct("_d2", "cid")).alias("_m"),
            F.first(vec_col).alias(vec_col),
        )
        .select(
            id_col,
            vec_col,
            F.col("_m.cid").alias("cid"),
            F.col("_m._d2").alias("d2"),
        )
    )


def semantic_dedup_summary(
    emb: DataFrame,
    k: int,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster SemDeDup audit: members, duplicate pairs at cosine
    ≥ ``tau``, vectors dropped by the keep-most-central rule, and
    vectors kept. One row per cluster, integers only — the summary a
    corpus curation run reports (and the hash-stable rendering; the
    drop SET itself is ids-only and available from the same lineage).
    """
    v = nearest_seed_assign(emb, k, id_col, vec_col)

    a = v.select(
        F.col(id_col).alias("id_a"),
        F.col("cid"),
        F.col("d2").alias("d2_a"),
        F.col(vec_col).alias("_ea"),
        similarity.norm(vec_col).alias("_na"),
    )
    b = v.select(
        F.col(id_col).alias("id_b"),
        F.col("cid"),
        F.col("d2").alias("d2_b"),
        F.col(vec_col).alias("_eb"),
        similarity.norm(vec_col).alias("_nb"),
    )
    # Norms hoisted out of the O(cluster²) loop (one fold per row, one
    # dot fold per pair — the llm_embedding_near_dup association).
    pair_cos = similarity.dot("_ea", "_eb") / (F.col("_na") * F.col("_nb"))
    pairs = (
        a.join(b, ["cid"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(pair_cos >= tau)
        .select(
            "cid",
            # Keep the more-central endpoint: the one with the SMALLER
            # (d2, id) — bit-deterministic because d2 is the shared
            # fold, not a shuffle-ordered SUM.
            F.when(
                (F.col("d2_a") < F.col("d2_b"))
                | (
                    (F.col("d2_a") == F.col("d2_b"))
                    & (F.col("id_a") < F.col("id_b"))
                ),
                F.col("id_b"),
            )
            .otherwise(F.col("id_a"))
            .alias("dropped"),
        )
    )
    members = v.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    dup = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.count_distinct("dropped").alias("n_dropped"),
    )
    return (
        members.join(dup, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (
                F.col("n_members") - F.coalesce("n_dropped", F.lit(0))
            ).alias("n_kept"),
        )
        .orderBy("cid")
    )
