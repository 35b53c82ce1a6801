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


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier (round 4)
# ---------------------------------------------------------------------------

_LR = 1.0
_LR_ROUNDS = 2


def _logreg_feats_sql() -> str:
    """Per-doc features + label: bias, English-stopword ratio, scaled
    mean chars/token; label = (lang = 'en')."""
    stops = ", ".join(f"'{w}'" for w in
                      ("the", "and", "of", "to", "a", "in", "is", "it",
                       "for", "on"))
    return f"""
    feats AS (
        SELECT doc_id,
               1.0 AS x0,
               len(list_filter(w, t -> t IN ({stops})))::DOUBLE
                   / len(w) AS x1,
               n_chars::DOUBLE / len(w) / 10.0 AS x2,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM (
            SELECT doc_id, lang, n_chars,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
            FROM documents
        ) WHERE len(w) > 0
    )"""


def _logreg_oracle() -> str:
    """Unroll the GD rounds into chained CTEs (the llm_kmeans_fit
    pattern): every weight update is rounded to 8 dp on BOTH engines,
    so cross-engine exp()/summation noise (~1e-13) can never compound
    across rounds."""
    ctes = [_logreg_feats_sql(),
            "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"]
    for r in range(1, _LR_ROUNDS + 1):
        p = len(ctes)  # noqa: F841 (clarity)
        ctes.append(f"""g{r} AS (
        SELECT AVG((1.0 / (1.0 + exp(-(w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2))) - f.y) * f.x0) AS g0,
               AVG((1.0 / (1.0 + exp(-(w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2))) - f.y) * f.x1) AS g1,
               AVG((1.0 / (1.0 + exp(-(w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2))) - f.y) * f.x2) AS g2
        FROM feats f CROSS JOIN w{r - 1} w
    )""")
        ctes.append(f"""w{r} AS (
        SELECT ROUND(w.w0 - {_LR} * g.g0, 8) AS w0,
               ROUND(w.w1 - {_LR} * g.g1, 8) AS w1,
               ROUND(w.w2 - {_LR} * g.g2, 8) AS w2
        FROM w{r - 1} w CROSS JOIN g{r} g
    )""")
    chain = ",\n    ".join(ctes)
    R = _LR_ROUNDS
    return f"""
    WITH {chain},
    acc AS (
        SELECT AVG(CASE WHEN (1.0 / (1.0 + exp(-(w.w0 * f.x0 + w.w1 * f.x1
                                               + w.w2 * f.x2))) >= 0.5)
                            = (f.y = 1.0)
                       THEN 1.0 ELSE 0.0 END) AS a
        FROM feats f CROSS JOIN w{R} w
    )
    SELECT 'bias' AS feature, ROUND(w0, 6) AS value FROM w{R}
    UNION ALL SELECT 'stop_ratio', ROUND(w1, 6) FROM w{R}
    UNION ALL SELECT 'scaled_len', ROUND(w2, 6) FROM w{R}
    UNION ALL SELECT 'train_acc', ROUND(a, 6) FROM acc
    ORDER BY feature
    """


@query(
    "llm_logreg_quality",
    oracle=_logreg_oracle(),
    tags=("llm", "classifier", "iterative", "extension"),
)
def llm_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quality-classifier training: TWO batch
    gradient-descent rounds of logistic regression (is-English from
    bias / stopword-ratio / chars-per-token), the fastText/quality-
    filter training pattern expressed as pure DataFrame aggregates.

    The model is THREE numbers: each round is one partial-agg pass
    computing the mean gradient (map-side combine; nothing but the
    1-row weight frame ever broadcasts back), so a round costs one
    corpus scan at any scale and the driver holds no data. Like
    llm_kmeans_fit/llm_bpe_merges, the whole iteration is certified:
    the oracle unrolls both rounds in chained CTEs, weights rounded to
    8 dp per round on both engines so fp noise cannot compound.
    Output: final weights + training accuracy."""
    docs = load(spark, sf_dir, "documents")
    stops = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
    in_list = ", ".join(f"'{w}'" for w in stops)
    feats = (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("_w"),
        )
        .filter(F.size("_w") > 0)
        .select(
            F.lit(1.0).alias("x0"),
            (
                F.size(F.expr(f"filter(_w, t -> t IN ({in_list}))")).cast(
                    "double"
                )
                / F.size("_w")
            ).alias("x1"),
            (F.col("n_chars").cast("double") / F.size("_w") / 10.0).alias("x2"),
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        )
    )
    w = spark.range(1).select(
        F.lit(0.0).alias("w0"), F.lit(0.0).alias("w1"), F.lit(0.0).alias("w2")
    )
    margin = F.col("w0") * F.col("x0") + F.col("w1") * F.col("x1") + F.col(
        "w2"
    ) * F.col("x2")
    resid = 1.0 / (1.0 + F.exp(-margin)) - F.col("y")
    for _ in range(_LR_ROUNDS):
        g = (
            feats.crossJoin(F.broadcast(w))
            .agg(
                F.avg(resid * F.col("x0")).alias("g0"),
                F.avg(resid * F.col("x1")).alias("g1"),
                F.avg(resid * F.col("x2")).alias("g2"),
            )
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                F.round(F.col("w0") - _LR * F.col("g0"), 8).alias("w0"),
                F.round(F.col("w1") - _LR * F.col("g1"), 8).alias("w1"),
                F.round(F.col("w2") - _LR * F.col("g2"), 8).alias("w2"),
            )
        )
    acc = (
        feats.crossJoin(F.broadcast(w))
        .agg(
            F.avg(
                F.when(
                    (1.0 / (1.0 + F.exp(-margin)) >= 0.5)
                    == (F.col("y") == 1.0),
                    1.0,
                ).otherwise(0.0)
            ).alias("a")
        )
    )
    out = (
        w.selectExpr("'bias' AS feature", "round(w0, 6) AS value")
        .unionAll(w.selectExpr("'stop_ratio'", "round(w1, 6)"))
        .unionAll(w.selectExpr("'scaled_len'", "round(w2, 6)"))
        .unionAll(acc.selectExpr("'train_acc'", "round(a, 6)"))
    )
    return out.orderBy("feature")


# ---------------------------------------------------------------------------
# Embedding outlier pruning (round 4)
# ---------------------------------------------------------------------------
from ..llm.semdedup import d2_sql as _semdedup_d2  # noqa: E402


@query(
    "llm_embedding_outliers",
    oracle=f"""
    WITH seeds AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS c
        FROM embeddings ORDER BY vec_id LIMIT {_K}
    ), dist AS (
        SELECT e.vec_id, s.cid,
               {{d2}} AS d2
        FROM embeddings e CROSS JOIN seeds s
    ), best AS (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM dist
    ), v AS (SELECT vec_id, cid, d2 FROM best WHERE rn = 1),
    thr AS (
        SELECT cid, ROUND(quantile_cont(d2, 0.9), 6) AS p90 FROM v GROUP BY cid
    )
    SELECT v.cid,
           COUNT(*) AS n_members,
           CAST(SUM(CASE WHEN v.d2 > thr.p90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           ROUND(thr.p90, 4) AS p90_d2
    FROM v JOIN thr USING (cid)
    GROUP BY v.cid, thr.p90
    ORDER BY v.cid
    """.format(d2=_semdedup_d2("e.embedding", "s.c", _DIMS)),
    tags=("llm", "outlier-pruning", "clustering", "extension"),
)
def llm_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding outlier pruning — the curation step that
    drops the farthest tail of each semantic neighborhood (points past
    the cluster's p90 distance-to-centroid; SemDeDup's companion:
    semdedup removes the redundant CORE, this flags the noisy FRINGE).
    Nearest-seed assignment is the shared broadcast fold pass; the
    threshold is one exact continuous-interpolation quantile per
    cluster, rounded to 6 dp before the compare so both engines cut on
    the identical value (k rows broadcast back); the audit is integers
    + one rounded threshold."""
    from ..llm import semdedup

    emb = load(spark, sf_dir, "embeddings")
    v = semdedup.nearest_seed_assign(emb, _K).select("vec_id", "cid", "d2")
    thr = v.groupBy("cid").agg(
        # round6 BEFORE the threshold compare: Spark percentile() and
        # DuckDB quantile_cont() interpolate independently; an ulp of
        # divergence next to a near-equal d2 would flip the integer
        # n_outliers (the cosine convention llm_embedding_decontamination
        # already uses).
        F.round(F.expr("percentile(d2, 0.9)"), 6).alias("p90")
    )
    return (
        v.join(F.broadcast(thr), "cid")
        .groupBy("cid", "p90")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(
                F.when(F.col("d2") > F.col("p90"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "cid",
            "n_members",
            "n_outliers",
            F.round("p90", 4).alias("p90_d2"),
        )
        .orderBy("cid")
    )
