"""Corpus statistics and governance queries: repetition-quality
filters, exact heavy hitters, embedding centroids, tombstone delete
propagation, and cross-series correlation.

These round out the analysis surface a training-data/market pipeline
needs around the core ETL: Gopher-style repetition scoring before a
training run, vocabulary heavy hitters for tokenizer work, per-class
embedding centroids for drift monitoring, right-to-be-forgotten delete
propagation, and cross-asset correlation for the serving tier. All are
pure built-in-function DataFrame plans, oracle-checked against DuckDB.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.datasets import shingle_rows
from ..llm.text import (
    build_vocab,
    build_vocab_sql,
    tfidf_top_terms,
    tfidf_top_terms_sql,
    words,
)
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# Repetition-quality filter (Gopher-style)
# ---------------------------------------------------------------------------
#: Flag thresholds, applied to the ROUNDED fractions so the boolean is
#: bit-stable across engines (an unrounded compare could flip on FP eps).
_TOP_BIGRAM_MAX = 0.08
_DUP_WORD_MAX = 0.65


@query(
    "llm_repetition_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ), b AS (
        SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bg
        FROM t
    ), c AS (
        SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY doc_id, bg
    ), s AS (
        SELECT doc_id,
               ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS top_bigram_frac
        FROM c GROUP BY doc_id
    ), w2 AS (
        SELECT doc_id,
               ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE), 6)
                   AS dup_word_frac
        FROM t
    )
    SELECT s.doc_id, top_bigram_frac, dup_word_frac,
           (top_bigram_frac > {_TOP_BIGRAM_MAX} OR dup_word_frac > {_DUP_WORD_MAX})
               AS repetitive
    FROM s JOIN w2 ON s.doc_id = w2.doc_id
    ORDER BY s.doc_id
    """,
    tags=("llm", "quality-repetition"),
)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition scoring: the fraction of all bigrams
    taken by the single most frequent bigram, and the duplicate-word
    fraction (1 − distinct/total), with a flag for documents above
    either threshold — the standard pre-training filter for
    boilerplate/looping text. Bigrams come from the codegen
    position-explode (:func:`..llm.datasets.shingle_rows`, NON-distinct
    — frequencies need every occurrence); two partial-agg shuffles on
    (doc, bigram) then doc. The flag compares the ROUNDED fractions so
    the boolean is reproducible cross-engine."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    bg = shingle_rows(d, "toks", 2, "doc_id", "doc_id")
    top = (
        bg.groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("n").cast("double") / F.sum("n").cast("double"), 6
            ).alias("top_bigram_frac")
        )
    )
    dup = d.select(
        "doc_id",
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("toks")).cast("double")
            / F.size("toks").cast("double"),
            6,
        ).alias("dup_word_frac"),
    )
    return (
        top.join(dup, "doc_id")
        .withColumn(
            "repetitive",
            (F.col("top_bigram_frac") > _TOP_BIGRAM_MAX)
            | (F.col("dup_word_frac") > _DUP_WORD_MAX),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters
# ---------------------------------------------------------------------------


@query(
    "q_heavy_hitters_words",
    oracle="""
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("llm", "heavy-hitters"),
)
def q_heavy_hitters_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global top-20 vocabulary heavy hitters. The scale shape is
    what matters: explode → hash aggregate with map-side partial
    counts (the shuffle carries one row per distinct word per
    partition, not per token) → TakeOrderedAndProject for the top-k.
    Deterministic tie-break on the word makes the LIMIT oracle-stable."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    return (
        # explode_outer + null filter: see planlint (inferred-guard trap)
        d.select(F.explode_outer("toks").alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Embedding centroids
# ---------------------------------------------------------------------------


@query(
    "llm_embedding_centroids",
    oracle="""
    SELECT label, i - 1 AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val,
           COUNT(*) AS n_vectors
    FROM embeddings, range(1, 65) AS r(i)
    GROUP BY label, i
    ORDER BY label, dim
    """,
    tags=("llm", "embedding-centroids"),
)
def llm_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids (the drift-monitoring /
    IVF-coarse-quantizer primitive): posexplode the vector to
    (dim, value) rows and average per (label, dim) — all partial-agg
    built-ins, one shuffle of 64·|labels| accumulators, never a
    collect. Values cast to double BEFORE averaging on both engines so
    the float sums agree to round6."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("mean_val"),
            F.count("*").alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# Tombstone delete propagation
# ---------------------------------------------------------------------------


@query(
    "q_tombstone_forget",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM events
    WHERE user_id % 97 <> 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("governance", "tombstone-delete"),
)
def q_tombstone_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation: a tombstone list of user ids
    (here: ids ≡ 0 mod 97, standing in for deletion requests) is
    **broadcast** into a LEFT ANTI join against the event log — the
    100 TB fact side streams through the join with no shuffle, which
    is the only viable shape when the forget list is small and the log
    is not. The id checksum pins the exact surviving row set. The
    oracle states the same predicate as a WHERE (provably equivalent
    here), so the anti-join's semantics are value-checked end to end."""
    ev = load(spark, sf_dir, "events")
    forget = ev.select("user_id").distinct().filter(F.col("user_id") % 97 == 0)
    kept = ev.join(F.broadcast(forget), "user_id", "left_anti")
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON parsing
# ---------------------------------------------------------------------------


@query(
    "q_semistructured_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max,
           CAST(COUNT(k) AS BIGINT) AS k_nonnull
    FROM (
        SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("semistructured", "json"),
)
def q_semistructured_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload parsing: the events' JSON ``props``
    column parsed with ``from_json`` under an EXPLICIT schema (never
    schema inference — at 100 TB that is a second full scan and a type
    guess), then aggregated per type. JSON parsing is a per-row
    codegen projection; malformed rows become NULLs that the
    ``k_nonnull`` audit column surfaces rather than hides."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.count("k").cast("long").alias("k_nonnull"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets
# ---------------------------------------------------------------------------


@query(
    "q_cube_hourly_volume",
    oracle="""
    SELECT GROUPING(event_type, h) AS gid,
           event_type,
           h AS hour,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS value_sum
    FROM (SELECT event_type, CAST(hour(ts) AS INT) AS h, value FROM events)
    GROUP BY CUBE(event_type, h)
    ORDER BY gid, event_type, hour
    """,
    tags=("aggregation", "grouping-sets"),
)
def q_cube_hourly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour): all four grouping sets — detail,
    per-type totals, per-hour totals, grand total — in ONE pass (Spark
    expands the sets map-side and partially aggregates each, exactly
    like the flat case; no 4× re-scan). ``grouping_id`` disambiguates
    real NULL keys from subtotal rows and is hash-matched against
    DuckDB's GROUPING bitmask (same bit order, verified)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hour"), "value"
    )
    return (
        ev.cube("event_type", "hour")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select("gid", "event_type", "hour", "n_events", "value_sum")
        .orderBy("gid", "event_type", "hour")
    )


# ---------------------------------------------------------------------------
# Cross-series correlation
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _corr_oracle() -> str:
    conds = ",\n               ".join(
        f"AVG(CASE WHEN event_type = '{t}' THEN value END) AS {t}"
        for t in _EVENT_TYPES
    )
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT '{a}' AS type_a, '{b}' AS type_b, ROUND(corr({a}, {b}), 6) AS corr_val FROM m"
        for a, b in combinations(_EVENT_TYPES, 2)
    )
    return f"""
    WITH m AS (
        SELECT date_trunc('minute', ts) AS minute,
               {conds}
        FROM events
        GROUP BY minute
    )
    {selects}
    ORDER BY type_a, type_b
    """


@query("q_event_type_correlation", oracle=_corr_oracle(), tags=("analytics", "correlation"))
def q_event_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between per-minute mean values of
    the five event series — the cross-asset correlation matrix a
    market serving tier keeps warm. One scan → minute×type pivot (hash
    aggregate) → a single global aggregate computing all 10 pairwise
    corrs at once (corr is a mergeable moment sketch: sums of x, y,
    xy, x², y² — partial-agg friendly, so the matrix costs one pass
    regardless of row count)."""
    ev = load(spark, sf_dir, "events")
    m = (
        ev.groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.avg("value"))
    )
    pairs = list(combinations(_EVENT_TYPES, 2))
    row = m.agg(
        *[F.round(F.corr(a, b), 6).alias(f"{a}__{b}") for a, b in pairs]
    )
    stack = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return row.selectExpr(
        f"stack({len(pairs)}, {stack}) as (type_a, type_b, corr_val)"
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction + vocabulary construction
# ---------------------------------------------------------------------------

_DOCS_W_SQL = """
    WITH docs_w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    )
"""


@query(
    "llm_tfidf_keywords",
    oracle=f"""
    {_DOCS_W_SQL}
    SELECT * FROM ({tfidf_top_terms_sql(3)})
    WHERE doc_id < 100
    ORDER BY doc_id, rank
    """,
    tags=("llm", "tfidf"),
)
def llm_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF —
    keyword extraction for corpus exploration/labeling. IDF statistics
    come from the FULL corpus (document frequencies + corpus size as a
    broadcast 1-row aggregate); the output is restricted to the first
    100 docs only to keep the verified result small. Ties break on the
    rounded score then the term string, so ranks are bit-stable across
    engines. Two narrow hash-agg shuffles ((doc,term) then term) and a
    per-doc window — nothing global."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    out = tfidf_top_terms(d, "toks", "doc_id", 3)
    return out.filter(F.col("doc_id") < 100).orderBy("doc_id", "rank")


@query(
    "llm_vocab_coverage",
    oracle=f"""
    {_DOCS_W_SQL}
    SELECT * FROM ({build_vocab_sql(1000)})
    ORDER BY token_id
    """,
    tags=("llm", "vocab"),
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (dense ids, deterministic
    freq-desc/token-asc order) with the cumulative coverage curve —
    the tokenizer-construction primitive: cum_coverage at id i is the
    fraction of all token occurrences a vocab of size i+1 captures.
    The corpus-wide count is one partial-agg shuffle; the top-V cut is
    TakeOrderedAndProject (no global sort), and the only
    single-partition window runs over ≤V rows — vocabulary-sized by
    construction, never corpus-sized."""
    d = load(spark, sf_dir, "documents").withColumn("toks", words("text"))
    return build_vocab(d, "toks", 1000).orderBy("token_id")


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (sequence mining)
# ---------------------------------------------------------------------------


@query(
    "q_event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n_transitions,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type),
                 6) AS p_next
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    tags=("analytics", "sequence-mining", "extension"),
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: LAG pairs consecutive events inside one
    (user_id, ts-ordered) window pass — the fact table is shuffled
    once on user_id, pairs aggregate map-side, and the row-conditional
    probabilities are a second window over the 25-row AGGREGATED
    matrix (never the fact side). The (ts, event_id) sort key makes
    simultaneous events order identically on both engines."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n_transitions"))
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ).alias("p_next"),
    ).orderBy("prev_type", "next_type")


# ---------------------------------------------------------------------------
# Semi join: activity of converting users
# ---------------------------------------------------------------------------


@query(
    "q_semi_join_big_purchasers",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events e
    WHERE EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = e.user_id
          AND p.event_type = 'purchase' AND p.value > 90
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("joins", "semi-join", "extension"),
)
def q_semi_join_big_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style cohort filter: all activity of users who ever made
    a >90-value purchase. LEFT SEMI join against the (small, filtered)
    qualifying-user side — Spark broadcasts it, so the fact side is
    filtered in place with no shuffle and no row duplication (semi
    joins emit each left row at most once, unlike an inner join
    against a deduplicated list). The anti-join complement is
    q_tombstone_forget."""
    e = load(spark, sf_dir, "events")
    qualifying = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    ).select("user_id")
    return (
        e.join(F.broadcast(qualifying), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# max_by / min_by scalar-aggregate breadth
# ---------------------------------------------------------------------------


@query(
    "q_daily_peak_events",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           arg_max(event_type,
                   CAST(ROUND(value * 100) AS BIGINT) * 100000000 + event_id)
               AS peak_type,
           arg_min(event_type,
                   CAST(ROUND(value * 100) AS BIGINT) * 100000000 + event_id)
               AS trough_type,
           ROUND(MAX(value), 6) AS peak_value,
           ROUND(MIN(value), 6) AS trough_value
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
    tags=("analytics", "max-by", "extension"),
)
def q_daily_peak_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY/MIN_BY: which event type carried each day's highest and
    lowest value — one pass, no self-join back to the fact table and
    no window sort (the classic pre-max_by renderings). The ordering
    key is exact integer arithmetic (value is 2-dp, so value·100
    rounds losslessly; event_id breaks ties) — the raw double is NOT a
    unique ordering and would be engine-arbitrary on the 158 duplicated
    (day, value) pairs at sf0.01."""
    e = load(spark, sf_dir, "events")
    ordk = (F.round(F.col("value") * 100, 0).cast("long") * F.lit(100000000)
            + F.col("event_id"))
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.max_by("event_type", ordk).alias("peak_type"),
            F.min_by("event_type", ordk).alias("trough_type"),
            F.round(F.max("value"), 6).alias("peak_value"),
            F.round(F.min("value"), 6).alias("trough_value"),
        )
        .orderBy("day")
    )


@query(
    "q_value_quartiles",
    oracle="""
    WITH agg AS (
        SELECT event_type,
               COUNT(*) AS n_events,
               quantile_cont(value, [0.25, 0.5, 0.75, 0.99]) AS qs
        FROM events
        GROUP BY event_type
    ), ex AS (
        SELECT event_type, n_events,
               unnest(CAST([0.25, 0.5, 0.75, 0.99] AS DOUBLE[])) AS q,
               unnest(qs) AS val
        FROM agg
    )
    SELECT event_type, n_events, q, ROUND(val, 6) AS q_value
    FROM ex
    ORDER BY event_type, q
    """,
    tags=("aggregates", "percentile", "extension"),
)
def q_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in ONE aggregate: ``percentile(value, array(...))``
    computes all four cut points in a single pass/shuffle instead of
    four separate percentile aggregates (the array form shares the
    per-group sorted sketch). Both engines use linear interpolation
    between order statistics, so the rounded values hash-match.

    The aggregated array is then exploded to one ``(event_type, q,
    q_value)`` row per cut point — scalar columns only, because the
    driver's canonicalizer (pandas ``sort_values`` → hash) cannot
    order array cells.  ``posexplode`` runs over the 5-row aggregate,
    not the fact table, so the explode is free."""
    e = load(spark, sf_dir, "events")
    cuts = (0.25, 0.5, 0.75, 0.99)
    agg = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "percentile(value, array(0.25D, 0.5D, 0.75D, 0.99D))"
        ).alias("qs"),
    )
    return (
        agg.select(
            "event_type", "n_events", F.posexplode("qs").alias("pos", "val")
        )
        .select(
            "event_type",
            "n_events",
            F.element_at(
                F.array(*[F.lit(c) for c in cuts]), F.col("pos") + 1
            ).alias("q"),
            F.round("val", 6).alias("q_value"),
        )
        .orderBy("event_type", "q")
    )


@query(
    "q_value_moments",
    oracle="""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               AVG(value) AS m1,
               AVG(value * value) AS m2,
               AVG(value * value * value) AS m3,
               AVG(value * value * value * value) AS m4
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(m1, 6) AS mean_value,
           ROUND(SQRT((m2 - m1 * m1) * n / (n - 1)), 6) AS stddev_value,
           ROUND((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                 / POWER(m2 - m1 * m1, 1.5), 6) AS skewness_pop,
           ROUND((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * POWER(m1, 4))
                 / POWER(m2 - m1 * m1, 2) - 3, 6) AS kurtosis_pop
    FROM m
    ORDER BY event_type
    """,
    tags=("aggregates", "moments", "extension"),
)
def q_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution moments per series in ONE pass: raw power sums
    (partial-agg-friendly AVGs of v..v⁴) with variance/skewness/excess
    kurtosis derived in the projection. Spark's native skewness()/
    kurtosis() use population formulas while DuckDB's apply sample
    corrections — they disagree in the 4th decimal — so BOTH engines
    here derive from identical raw-moment arithmetic, which also
    demonstrates the mergeable-components pattern (power sums combine
    across partitions; the fancy statistics are projection math)."""
    e = load(spark, sf_dir, "events")
    v = F.col("value")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg(v).alias("m1"),
        F.avg(v * v).alias("m2"),
        F.avg(v * v * v).alias("m3"),
        F.avg(v * v * v * v).alias("m4"),
    )
    m1, m2, m3, m4, n = (F.col(c) for c in ("m1", "m2", "m3", "m4", "n"))
    var_pop = m2 - m1 * m1
    return m.select(
        "event_type",
        "n",
        F.round(m1, 6).alias("mean_value"),
        F.round(F.sqrt(var_pop * n / (n - 1)), 6).alias("stddev_value"),
        F.round(
            (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_pop, 1.5), 6
        ).alias("skewness_pop"),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, 4))
            / F.pow(var_pop, 2)
            - 3,
            6,
        ).alias("kurtosis_pop"),
    ).orderBy("event_type")


@query(
    "q_value_histogram",
    oracle="""
    WITH b AS (
        SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
    ), h AS (
        SELECT LEAST(CAST(FLOOR((value - mn) / (mx - mn) * 20) AS INT), 19)
                   AS bucket,
               mn, mx
        FROM events, b
    )
    SELECT bucket,
           ROUND(mn + bucket * (mx - mn) / 20, 6) AS lo,
           ROUND(mn + (bucket + 1) * (mx - mn) / 20, 6) AS hi,
           COUNT(*) AS cnt
    FROM h
    GROUP BY bucket, mn, mx
    ORDER BY bucket
    """,
    tags=("aggregates", "histogram", "extension"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of ``events.value`` — the
    data-profiling primitive behind range-partition planning and
    outlier triage. Two passes by necessity (bounds, then bucketing);
    the 1-row bounds aggregate broadcasts back, so the second pass is a
    pure map-side bucket projection + a 20-group aggregate — no wide
    shuffle at any scale. The bucket expression keeps one explicit
    association order ``(value-mn)/(mx-mn)*20`` so both engines run the
    identical IEEE double sequence (boundary values land in the same
    bucket bit-for-bit); the top bound closes into the last bucket."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    h = e.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 20
            ).cast("int"),
            F.lit(19),
        ).alias("bucket"),
        "mn",
        "mx",
    )
    return (
        h.groupBy("bucket", "mn", "mx")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * (F.col("mx") - F.col("mn")) / 20, 6).alias("lo"),
            F.round(F.col("mn") + (F.col("bucket") + 1) * (F.col("mx") - F.col("mn")) / 20, 6).alias("hi"),
            "cnt",
        )
        .orderBy("bucket")
    )


@query(
    "q_expectations_report",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS total_rows,
               SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v1,
               COUNT(*) - COUNT(DISTINCT event_id) AS v2,
               SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
                   ('click','error','purchase','signup','view')
                   THEN 1 ELSE 0 END) AS v3,
               SUM(CASE WHEN value IS NULL OR value < 0
                   OR value > 1000000000 THEN 1 ELSE 0 END) AS v4,
               SUM(CASE WHEN props IS NULL OR NOT starts_with(props, '{')
                   THEN 1 ELSE 0 END) AS v5
        FROM events
    )
    SELECT * FROM (
        SELECT 'not_null_user_id' AS expectation,
               CAST(v1 AS BIGINT) AS violations, total_rows, v1 = 0 AS passed FROM m
        UNION ALL
        SELECT 'unique_event_id', CAST(v2 AS BIGINT), total_rows, v2 = 0 FROM m
        UNION ALL
        SELECT 'accepted_values_event_type', CAST(v3 AS BIGINT), total_rows, v3 = 0 FROM m
        UNION ALL
        SELECT 'in_range_value', CAST(v4 AS BIGINT), total_rows, v4 = 0 FROM m
        UNION ALL
        SELECT 'props_json_object', CAST(v5 AS BIGINT), total_rows, v5 = 0 FROM m
    )
    ORDER BY expectation
    """,
    tags=("quality", "expectations", "extension"),
)
def q_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (dbt-test/Deequ
    posture) evaluated in ONE aggregate pass: every check compiles to a
    conditional count, so five checks — or fifty — cost one scan and a
    1-row exchange at any table size, then ``stack`` reshapes the wide
    metrics row into the long (expectation, violations, passed) report
    a CI gate consumes. The reference recomputed its lineage once per
    DQ metric; this is the same posture as its
    single-pass observe() upgrade, generalized to a user-supplied
    suite."""
    from ..quality import (
        expect_accepted_values,
        expect_custom,
        expect_in_range,
        expect_not_null,
        expect_unique,
        run_expectations,
    )

    e = load(spark, sf_dir, "events")
    suite = [
        expect_not_null("user_id"),
        expect_unique("event_id"),
        expect_accepted_values(
            "event_type", ["click", "error", "purchase", "signup", "view"]
        ),
        expect_in_range("value", 0, 1_000_000_000),
        expect_custom(
            "props_json_object",
            F.col("props").isNull() | ~F.col("props").startswith("{"),
        ),
    ]
    return run_expectations(e, suite).orderBy("expectation")


# ---------------------------------------------------------------------------
# One-pass dataset profile (Deequ/dbt-profile posture)
# ---------------------------------------------------------------------------


@query(
    "q_data_profile",
    oracle="""
    SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(event_id) AS n_nulls,
           COUNT(DISTINCT event_id) AS n_distinct,
           ROUND(MIN(event_id), 6) AS num_min,
           ROUND(MAX(event_id), 6) AS num_max,
           CAST(NULL AS VARCHAR) AS str_min, CAST(NULL AS VARCHAR) AS str_max
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id),
           ROUND(MIN(user_id), 6), ROUND(MAX(user_id), 6), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
           COUNT(DISTINCT value),
           ROUND(MIN(value), 6), ROUND(MAX(value), 6), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type), NULL, NULL,
           MIN(event_type), MAX(event_type)
    FROM events
    UNION ALL
    SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
           COUNT(DISTINCT props), NULL, NULL, MIN(props), MAX(props)
    FROM events
    ORDER BY col_name
    """,
    tags=("profile", "quality", "extension"),
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling as ONE job: per column — row/null/exact-distinct
    counts, numeric min/max (rounded), string min/max — the
    Deequ-analyzer / dbt-profile surface. All 5 columns' metrics are
    aggregates of a single pass (the multi-COUNT(DISTINCT) plans as one
    Expand: 5× row replication, each tagged with its distinct key —
    linear, mergeable, no per-column rescans); the long output shape is
    a driver-side stack of the 1-row aggregate. Numeric extremes stay
    DOUBLE and strings stay strings — no lossy double→string casting,
    which is what makes the profile hash-comparable across engines."""
    e = load(spark, sf_dir, "events")
    num_cols = ["event_id", "user_id", "value"]
    str_cols = ["event_type", "props"]
    aggs = [F.count("*").alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
        ]
    for c in num_cols:
        aggs += [
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__smin"), F.max(c).alias(f"{c}__smax")]
    one = e.agg(*aggs)
    rows = []
    for c in num_cols:
        rows.append(
            f"named_struct('c', '{c}', 'r', n_rows, 'nl', n_rows - {c}__nn, "
            f"'nd', {c}__nd, 'mn', {c}__min, 'mx', {c}__max, "
            f"'smn', CAST(NULL AS STRING), 'smx', CAST(NULL AS STRING))"
        )
    for c in str_cols:
        rows.append(
            f"named_struct('c', '{c}', 'r', n_rows, 'nl', n_rows - {c}__nn, "
            f"'nd', {c}__nd, 'mn', CAST(NULL AS DOUBLE), 'mx', CAST(NULL AS DOUBLE), "
            f"'smn', {c}__smin, 'smx', {c}__smax)"
        )
    stacked = one.select(
        F.expr(
            "inline(array(" + ", ".join(rows) + "))"
        ).alias("col_name", "n_rows", "n_nulls", "n_distinct",
                "num_min", "num_max", "str_min", "str_max")
    )
    return stacked.orderBy("col_name")


# ---------------------------------------------------------------------------
# Chi-square feature association (training-signal screening)
# ---------------------------------------------------------------------------


@query(
    "q_chi_square_features",
    oracle="""
    WITH m AS (
        SELECT CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vmicro,
               event_type
        FROM events WHERE value IS NOT NULL
    ), g AS (
        SELECT SUM(vmicro) AS total, COUNT(*) AS n FROM m
    ), cells AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN m.vmicro * g.n > g.total THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               CAST(SUM(CASE WHEN m.vmicro * g.n <= g.total THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        FROM m CROSS JOIN g
        GROUP BY event_type
    ), tot AS (
        SELECT SUM(n_above) AS ta, SUM(n_below) AS tb,
               SUM(n_above + n_below) AS n FROM cells
    )
    SELECT c.event_type, c.n_above, c.n_below,
           ROUND(
             POW(c.n_above - (c.n_above + c.n_below) * t.ta / CAST(t.n AS DOUBLE), 2)
               / ((c.n_above + c.n_below) * t.ta / CAST(t.n AS DOUBLE))
             + POW(c.n_below - (c.n_above + c.n_below) * t.tb / CAST(t.n AS DOUBLE), 2)
               / ((c.n_above + c.n_below) * t.tb / CAST(t.n AS DOUBLE)),
             6) AS chi2_contrib
    FROM cells c CROSS JOIN tot t
    ORDER BY c.event_type
    """,
    tags=("stats", "feature-screening", "extension"),
)
def q_chi_square_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square screening of a candidate feature (event_type) against
    a binary label (value above/below the global mean) — the
    feature-selection pass a training pipeline runs before committing
    GPU time. The above-mean flag avoids FP flapping by comparing in
    exact integer micro-units (``v·n > Σv`` — no division); the only
    doubles are the final expected-count terms, built from exact
    integers with an identical expression tree on both engines. Two
    broadcast 1-row joins (global sum, marginals) — the fact table is
    scanned once and shuffled once on event_type."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = e.select(
        "event_type",
        F.round(F.col("value") * 1e6, 0).cast("long").alias("vmicro"),
    )
    g = m.agg(F.sum("vmicro").alias("_total"), F.count("*").alias("_n"))
    cells = (
        m.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("vmicro") * F.col("_n") > F.col("_total"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_above"),
            F.sum(
                F.when(F.col("vmicro") * F.col("_n") <= F.col("_total"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_below"),
        )
    )
    tot = cells.agg(
        F.sum("n_above").alias("_ta"),
        F.sum("n_below").alias("_tb"),
        F.sum(F.col("n_above") + F.col("n_below")).alias("_nn"),
    )
    ct = cells.crossJoin(F.broadcast(tot))
    row_t = (F.col("n_above") + F.col("n_below")).cast("double")
    ea = row_t * F.col("_ta") / F.col("_nn").cast("double")
    eb = row_t * F.col("_tb") / F.col("_nn").cast("double")
    contrib = (
        F.pow(F.col("n_above") - ea, 2) / ea + F.pow(F.col("n_below") - eb, 2) / eb
    )
    return ct.select(
        "event_type",
        "n_above",
        "n_below",
        F.round(contrib, 6).alias("chi2_contrib"),
    ).orderBy("event_type")


@query(
    "q_histogram_2d",
    oracle="""
    WITH b AS (
        SELECT MIN(value) AS mn, MAX(value) AS mx,
               MIN(user_id) AS umn, MAX(user_id) AS umx
        FROM events
    ), h AS (
        SELECT CASE WHEN umx = umn THEN 0 ELSE
                 LEAST(CAST(FLOOR((CAST(user_id AS DOUBLE) - umn)
                                  / (umx - umn) * 8) AS INT), 7) END AS ub,
               CASE WHEN mx = mn THEN 0 ELSE
                 LEAST(CAST(FLOOR((value - mn) / (mx - mn) * 8) AS INT), 7)
               END AS vb
        FROM events, b
    )
    SELECT ub, vb, COUNT(*) AS cnt
    FROM h GROUP BY ub, vb
    ORDER BY ub, vb
    """,
    tags=("aggregates", "histogram", "extension"),
)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional equi-width 8×8 heatmap of (user_id, value) —
    the density grid a profiling dashboard or a skew investigation
    draws. Same discipline as the 1-D histogram: a 1-row bounds
    aggregate broadcasts back, bucketing is map-side with one explicit
    association order per axis (identical IEEE sequence on both
    engines; top bounds close into the last bucket; a constant axis
    degenerates to a single defined bucket 0 instead of a 0-width
    division), and the output is at most 64 groups at any corpus
    size."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.min("user_id").alias("umn"),
        F.max("user_id").alias("umx"),
    )
    h = e.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("umx") == F.col("umn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("user_id").cast("double") - F.col("umn"))
                    / (F.col("umx") - F.col("umn"))
                    * 8
                ).cast("int"),
                F.lit(7),
            )
        )
        .alias("ub"),
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 8
                ).cast("int"),
                F.lit(7),
            )
        )
        .alias("vb"),
    )
    return (
        h.groupBy("ub", "vb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("ub", "vb")
    )


@query(
    "q_skyline_pareto_users",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)
                   AS value_micros
        FROM events GROUP BY user_id
    ), s AS (
        SELECT *, MAX(n_events) OVER (
            ORDER BY value_micros DESC, n_events DESC, user_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_n
        FROM per_user
    )
    SELECT user_id, n_events, value_micros
    FROM s WHERE best_n IS NULL OR n_events > best_n
    ORDER BY value_micros DESC, user_id
    """,
    tags=("analytics", "skyline", "extension"),
)
def q_skyline_pareto_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier, Börzsönyi et al. ICDE 2001): the
    users no other user dominates on (total value, event count). The
    two-dimensional case needs NO dominance join: sort by the first
    metric (ties broken by the second DESC, so an equal-value user
    with strictly more events eliminates its peers — true dominance,
    not just prefix-max), and a point survives iff its second metric
    beats the running max of everything sorted before it — one window
    over the per-user AGGREGATE (user cardinality, not events).
    Exactly-tied (value, count) pairs keep their lowest-id
    representative — the deterministic rendering both engines share.
    Totals in integer micro-units."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
        .cast("long")
        .alias("value_micros"),
    )
    w = (
        Window.orderBy(
            F.col("value_micros").desc(), F.col("n_events").desc(), "user_id"
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    s = per_user.withColumn("best_n", F.max("n_events").over(w))
    return (
        s.filter(F.col("best_n").isNull() | (F.col("n_events") > F.col("best_n")))
        .select("user_id", "n_events", "value_micros")
        .orderBy(F.col("value_micros").desc(), "user_id")
    )
