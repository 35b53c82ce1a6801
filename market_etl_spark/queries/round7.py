"""Round-7 capability extensions (beyond the reference surface).

Nine operators a production analytics / feature-store / curation team
reaches for that the corpus did not yet cover, each with a DuckDB
oracle and the repo's cross-engine discipline (integer micro-units
where ranking or sums must be exact, ``ROUND(x, 6)`` on doubles,
deterministic ORDER BY, BIGINT casts on DuckDB integer aggregates):

- point-in-time (as-of) join of facts against an SCD2 dimension —
  the feature-store correctness primitive;
- a base-2^(1/8) DDSketch-style mergeable quantile sketch whose
  buckets are PURE INTEGER math (bit width + top mantissa bits), so
  the sketch is bit-identical on both engines;
- Mann-Whitney U (nonparametric A/B) with tie-corrected normal
  approximation;
- cohort × day-offset retention triangle;
- autocorrelation function + Ljung-Box portmanteau on daily counts,
  assembled from exact integer power sums;
- Pareto frontier (skyline) of price/recency dominance;
- mutual information between document source and language;
- Lorenz curve deciles (the Gini query's distributional complement);
- Bloom-filter membership audit with measured false-positive rate
  from md5-derived bit positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import fanout_partitions, load
from .registry import query


# ---------------------------------------------------------------------------
# 1. Point-in-time join against an SCD2 dimension (feature-store as-of)
# ---------------------------------------------------------------------------
_SCD2_DIM_SQL = """
    WITH e AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type
        FROM events WHERE user_id < 20 AND ts < TIMESTAMP '2024-01-11'
    ), counts AS (
        SELECT user_id, day, event_type, COUNT(*) AS c
        FROM e GROUP BY user_id, day, event_type
    ), snap AS (
        SELECT user_id, day, event_type AS segment FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, day
                ORDER BY c DESC, event_type ASC) AS rn
            FROM counts
        ) WHERE rn = 1
    ), chg AS (
        SELECT user_id, day, segment,
               LAG(segment) OVER (PARTITION BY user_id ORDER BY day) AS prev
        FROM snap
    ), ver AS (
        SELECT user_id, day, segment FROM chg
        WHERE prev IS NULL OR segment <> prev
    )
    SELECT user_id, segment, day AS valid_from,
           LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS valid_to
    FROM ver
"""


@query(
    "q_scd2_point_in_time_join",
    oracle=f"""
    WITH dim AS ({_SCD2_DIM_SQL})
    SELECT f.user_id, d.segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(f.value), 4) AS sum_value
    FROM (SELECT user_id, ts, value FROM events
          WHERE user_id < 20 AND ts < TIMESTAMP '2024-01-11') f
    JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY f.user_id, d.segment
    ORDER BY f.user_id, d.segment
    """,
    tags=("merge", "scd2", "as-of-join", "feature-store", "extension"),
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join: every event joined to the dimension version
    that was valid AT ITS TIMESTAMP — the feature-store primitive that
    prevents label leakage (training rows must see yesterday's
    features, not today's).  The dimension is the SCD2 history of each
    user's daily dominant event type (closed-form window construction;
    the iterated-MERGE build of the same history is verified by
    ``q_scd2_history_build``).

    Plan shape: the dimension is key-bounded (open+closed versions of
    ≤20 users) so it BROADCASTS; the fact side streams through a
    broadcast hash join on ``user_id`` with the validity range as a
    residual filter — no shuffle of the fact table, the exact shape a
    100 TB feature backfill needs.  Every event falls in exactly one
    version interval by construction (versions start at the user's
    first observed day), so the join neither drops nor fans out."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20)
        & (F.col("ts") < F.lit("2024-01-11").cast("timestamp"))
    )
    counts = e.groupBy(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    snap = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "day", F.col("event_type").alias("segment"))
    )
    seq = Window.partitionBy("user_id").orderBy("day")
    ver = snap.withColumn("_prev", F.lag("segment").over(seq)).filter(
        F.col("_prev").isNull() | (F.col("segment") != F.col("_prev"))
    )
    dim = ver.select(
        "user_id",
        "segment",
        F.col("day").alias("valid_from"),
        F.lead("day").over(seq.orderBy("day")).alias("valid_to"),
    )
    facts = e.select("user_id", "ts", "value")
    joined = facts.join(
        F.broadcast(dim),
        on=[
            facts["user_id"] == dim["user_id"],
            facts["ts"] >= dim["valid_from"],
            dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"]),
        ],
    )
    return (
        joined.groupBy(facts["user_id"].alias("user_id"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "segment")
    )


# ---------------------------------------------------------------------------
# 2. DDSketch-style mergeable quantiles with INTEGER-EXACT buckets
# ---------------------------------------------------------------------------
@query(
    "q_ddsketch_quantiles",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(value * 1e6) AS BIGINT) AS n FROM events
        WHERE value >= 1e-6
    ), b AS (
        SELECT n,
               CASE WHEN length(printf('%b', n)) <= 4 THEN n
                    ELSE 8 * length(printf('%b', n))
                         + CAST((n >> (length(printf('%b', n)) - 4)) AS BIGINT) - 8
               END AS bucket,
               CASE WHEN length(printf('%b', n)) <= 4 THEN n
                    ELSE (8 + CAST((n >> (length(printf('%b', n)) - 4))
                                   AS BIGINT) - 8)
                         * CAST(POWER(2, length(printf('%b', n)) - 4) AS BIGINT)
               END AS rep
        FROM v
    ), counts AS (
        SELECT bucket, MIN(rep) AS rep, COUNT(*) AS c FROM b GROUP BY bucket
    ), cum AS (
        SELECT bucket, rep, c,
               SUM(c) OVER (ORDER BY bucket) AS cum_c,
               SUM(c) OVER () AS total
        FROM counts
    )
    SELECT q,
           CAST(MIN(rep) AS BIGINT) AS est_micros,
           CAST(MIN(bucket) AS BIGINT) AS bucket
    FROM cum, (SELECT UNNEST(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q) qs
    WHERE cum_c >= CAST(ceil(q * total) AS BIGINT)
    GROUP BY q ORDER BY q
    """,
    tags=("sketch", "quantile", "mergeable", "extension"),
)
def q_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-flavored mergeable quantile sketch whose buckets are
    PURE INTEGER math, so the sketch is bit-identical across engines
    (unlike log-γ bucketing, where a libm ULP at a boundary flips a
    bucket): values go to integer micro-units, and the bucket id is
    ``8·bitwidth + top-4-mantissa-bits − 8`` — i.e. base 2^(1/8)
    log-buckets read straight off the binary representation
    (relative-error bound 2^-3 per bucket).  Counts per bucket are
    sum-mergeable — the 100 TB pattern: map-side partial bucket
    counts, one tiny shuffle, quantile lookup by cumulative rank on
    the ~100-bucket frame.  The oracle rebuilds the identical sketch
    in SQL (bit width via ``printf('%b')`` there, ``bin()`` here) and
    must land on the same bucket and representative for p50/p90/p99."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value") >= 1e-6)
        .select(F.floor(F.col("value") * 1e6).cast("long").alias("n"))
    )
    width = F.length(F.conv(F.col("n"), 10, 2))
    # shiftright's Python signature wants a literal; the SQL form takes
    # a column shift amount
    top4 = F.expr(
        "cast(shiftright(n, cast(length(conv(n, 10, 2)) as int) - 4) as bigint)"
    )
    small = width <= 4
    b = v.select(
        F.when(small, F.col("n"))
        .otherwise(F.lit(8) * width + top4 - F.lit(8))
        .cast("long")
        .alias("bucket"),
        F.when(small, F.col("n"))
        .otherwise(
            (F.lit(8) + top4 - F.lit(8))
            * F.pow(F.lit(2.0), (width - F.lit(4)).cast("double")).cast("long")
        )
        .cast("long")
        .alias("rep"),
    )
    counts = b.groupBy("bucket").agg(
        F.min("rep").alias("rep"), F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql import Window

    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "bucket",
        "rep",
        F.sum("c").over(wcum).alias("cum_c"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    hit = cum.crossJoin(F.broadcast(qs)).filter(
        F.col("cum_c") >= F.ceil(F.col("q") * F.col("total")).cast("long")
    )
    return (
        hit.groupBy("q")
        .agg(
            F.min("rep").cast("long").alias("est_micros"),
            F.min("bucket").cast("long").alias("bucket"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# 3. Mann-Whitney U (nonparametric A/B: weekend vs weekday values)
# ---------------------------------------------------------------------------
@query(
    "q_mann_whitney_u",
    oracle="""
    WITH v AS (
        SELECT CAST(FLOOR(value * 1e6) AS BIGINT) AS x,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
        FROM events
    ), ranked AS (
        SELECT x, grp,
               (CAST(RANK() OVER (ORDER BY x) AS DOUBLE)
                + CAST(RANK() OVER (ORDER BY x) AS DOUBLE)
                  + COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS avg_rank
        FROM v
    ), ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum FROM (
            SELECT COUNT(*) AS t FROM v GROUP BY x
        )
    ), agg AS (
        SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               SUM(CASE WHEN grp = 1 THEN avg_rank ELSE 0 END) AS r1
        FROM ranked
    )
    SELECT n1, n2,
           ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u_stat,
           ROUND(
               (r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
               / SQRT(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                      - CAST(tie_sum AS DOUBLE)
                        / ((n1 + n2) * (n1 + n2 - 1.0)))),
               6) AS z_score
    FROM agg, ties
    """,
    tags=("monitoring", "stats", "nonparametric", "extension"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U: do weekend event values stochastically dominate
    weekday ones?  The nonparametric A/B primitive (no normality
    assumption — the complement of ``q_welch_ttest``).  Ranks use the
    midrank convention for ties, built from exact integer micro-units
    so the rank sums are identical across engines; the z score carries
    the standard tie-corrected variance.

    Scale: one global rank (sort-based window — at 100 TB this is the
    one shuffle), tie sizes from a value-grouped partial agg, then a
    1-row fold.  Weekend flag via dayofweek (Sunday=1 in Spark,
    Sunday=0 in DuckDB — both expressions pin Saturday/Sunday)."""
    from pyspark.sql import Window

    v = load(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 1e6).cast("long").alias("x"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("grp"),
    )
    rk = Window.orderBy("x")
    ranked = v.select(
        "x",
        "grp",
        (
            (
                F.rank().over(rk).cast("double") * 2
                + F.count(F.lit(1)).over(Window.partitionBy("x"))
                - 1
            )
            / 2.0
        ).alias("avg_rank"),
    )
    ties = (
        v.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie_sum")
        )
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("grp") == 1, F.col("avg_rank")).otherwise(0.0)).alias(
            "r1"
        ),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u = r1 - n1 * (n1 + 1) / 2.0
    z = (u - n1 * n2 / 2.0) / F.sqrt(
        n1 * n2 / 12.0
        * (
            (n1 + n2 + 1)
            - F.col("tie_sum").cast("double") / ((n1 + n2) * (n1 + n2 - 1.0))
        )
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# 4. Cohort retention triangle
# ---------------------------------------------------------------------------
@query(
    "q_cohort_retention",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    ), cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    ), sizes AS (
        SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts
        GROUP BY cohort_day
    ), joined AS (
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS offset_days,
               a.user_id
        FROM cohorts c JOIN activity a USING (user_id)
        WHERE date_diff('day', c.cohort_day, a.day) BETWEEN 0 AND 7
    )
    SELECT j.cohort_day,
           j.offset_days,
           CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           ROUND(COUNT(DISTINCT j.user_id)
                 / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM joined j JOIN sizes s USING (cohort_day)
    WHERE j.cohort_day < TIMESTAMP '2024-01-08'
    GROUP BY j.cohort_day, j.offset_days, s.cohort_size
    ORDER BY j.cohort_day, j.offset_days
    """,
    tags=("behavior", "cohort", "retention", "extension"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort × day-offset retention triangle: users grouped by first
    active day; for offsets 0..7, the fraction of the cohort active
    again that day — the canonical product-analytics table.

    Scale: distinct (user, day) first (partial-agg dedup), cohorts via
    min-day agg, both shuffles keyed on user_id and reusable; the
    cohort-size frame is day-cardinality and broadcasts into the
    ratio.  First week of cohorts only, so the triangle is
    fixed-size."""
    activity = (
        load(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = (
        cohorts.join(activity, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
            "user_id",
        )
        .filter(
            (F.col("offset_days") >= 0)
            & (F.col("offset_days") <= 7)
            & (F.col("cohort_day") < F.lit("2024-01-08").cast("timestamp"))
        )
    )
    return (
        joined.groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "offset_days",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_day", "offset_days")
    )


# ---------------------------------------------------------------------------
# 5. Autocorrelation + Ljung-Box over daily counts
# ---------------------------------------------------------------------------
@query(
    "q_acf_ljung_box",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY day
    ), idx AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
    ), base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM idx
    ), lags AS (
        SELECT k.k,
               CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
               CAST(SUM(a.x) AS BIGINT) AS sa,
               CAST(SUM(b.x) AS BIGINT) AS sb,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM idx a
        JOIN (SELECT UNNEST([1, 2, 3, 4, 5, 6, 7]) AS k) k ON TRUE
        JOIN idx b ON b.t = a.t + k.k
        GROUP BY k.k
    ), acfs AS (
        SELECT l.k AS lag, b.n,
               (l.sxy - (CAST(b.sx AS DOUBLE) / b.n) * (l.sa + l.sb)
                + l.m * (CAST(b.sx AS DOUBLE) / b.n)
                      * (CAST(b.sx AS DOUBLE) / b.n))
               / (b.sxx - CAST(b.sx AS DOUBLE) * b.sx / b.n) AS r
        FROM lags l, base b
    )
    SELECT lag,
           ROUND(r, 6) AS acf,
           ROUND(n * (n + 2.0) * SUM(r * r / (n - lag))
                 OVER (ORDER BY lag), 6) AS q_lb
    FROM acfs ORDER BY lag
    """,
    tags=("monitoring", "timeseries", "extension"),
)
def q_acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily event counts at lags 1..7 plus
    the cumulative Ljung-Box portmanteau Q — the standard "is there
    structure left in this series" audit (weekly seasonality shows as
    a lag-7 spike; Q vs χ²(k) rejects white noise).

    Cross-engine determinism: every sum entering r_k is an EXACT
    integer power sum (counts are integers; Σx, Σx², Σx_t·x_{t+k} and
    the head/tail partials are BIGINTs), so the double assembly
    ``r_k = (Σxy − x̄(sa+sb) + m·x̄²) / (Σx² − N·x̄²)`` is bit-identical
    regardless of aggregation order.

    Scale: the daily rollup is the only data-sized pass (partial-agg
    to ~30 rows); lag products are a self-join on the tiny frame."""
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    base = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    ks = spark.createDataFrame([(k,) for k in range(1, 8)], "k long")
    a = idx.alias("a")
    b = idx.alias("b")
    lags = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("b.t") == F.col("a.t") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("sxy"),
            F.sum("a.x").cast("long").alias("sa"),
            F.sum("b.x").cast("long").alias("sb"),
            F.count(F.lit(1)).cast("long").alias("m"),
        )
    )
    xbar = F.col("sx").cast("double") / F.col("n")
    r = (
        F.col("sxy") - xbar * (F.col("sa") + F.col("sb")) + F.col("m") * xbar * xbar
    ) / (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
    acfs = lags.crossJoin(F.broadcast(base)).select(
        F.col("k").alias("lag"), F.col("n"), r.alias("r")
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return acfs.select(
        "lag",
        F.round("r", 6).alias("acf"),
        F.round(
            F.col("n")
            * (F.col("n") + 2.0)
            * F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))).over(
                wq
            ),
            6,
        ).alias("q_lb"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# 6. Pareto frontier (skyline) of order price vs recency
# ---------------------------------------------------------------------------
@query(
    "q_pareto_frontier",
    oracle="""
    WITH pts AS (
        SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents,
               MAX(o_orderdate) AS best_date
        FROM orders GROUP BY price_cents
    ), flagged AS (
        SELECT price_cents, best_date,
               MAX(best_date) OVER (
                   ORDER BY price_cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS better_date
        FROM pts
    )
    SELECT price_cents, best_date
    FROM flagged
    WHERE better_date IS NULL OR best_date > better_date
    ORDER BY price_cents DESC
    """,
    tags=("relational", "skyline", "extension"),
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): orders not dominated on the
    (price, recency) plane — a point survives iff no other point has
    both ≥ price and ≥ date with one strict.  The classic
    multi-criteria shortlist operator (best-price-for-freshness).

    Shape: collapse to distinct price levels map-side (cents as exact
    BIGINTs; best date per price), then ONE descending-price window
    whose running MAX(date) over strictly-higher prices decides
    domination — an O(n log n) sort instead of the naive O(n²)
    dominance join, and the window input is already price-distinct so
    the sort is over a reduced frame.  Random 2-D data yields an
    O(log n)-sized frontier, so the result is report-sized at any
    scale."""
    from pyspark.sql import Window

    pts = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("price_cents")
        )
        .agg(F.max("o_orderdate").alias("best_date"))
    )
    w = Window.orderBy(F.col("price_cents").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = pts.withColumn("better_date", F.max("best_date").over(w))
    return (
        flagged.filter(
            F.col("better_date").isNull()
            | (F.col("best_date") > F.col("better_date"))
        )
        .select("price_cents", "best_date")
        .orderBy(F.col("price_cents").desc())
    )


# ---------------------------------------------------------------------------
# 7. Mutual information between document source and language
# ---------------------------------------------------------------------------
@query(
    "llm_mutual_information",
    oracle="""
    WITH joint AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_sl
        FROM documents GROUP BY source, lang
    ), m AS (
        SELECT CAST(SUM(n_sl) AS BIGINT) AS n FROM joint
    ), marg_s AS (
        SELECT source, CAST(SUM(n_sl) AS BIGINT) AS n_s FROM joint
        GROUP BY source
    ), marg_l AS (
        SELECT lang, CAST(SUM(n_sl) AS BIGINT) AS n_l FROM joint
        GROUP BY lang
    )
    SELECT ROUND(SUM((CAST(j.n_sl AS DOUBLE) / m.n)
                     * LN(CAST(j.n_sl AS DOUBLE) * m.n
                          / (CAST(s.n_s AS DOUBLE) * l.n_l))), 6) AS mi_nats,
           ROUND((SELECT -SUM((CAST(n_s AS DOUBLE) / m2.n)
                              * LN(CAST(n_s AS DOUBLE) / m2.n))
                  FROM marg_s, m m2), 6) AS h_source,
           ROUND((SELECT -SUM((CAST(n_l AS DOUBLE) / m3.n)
                              * LN(CAST(n_l AS DOUBLE) / m3.n))
                  FROM marg_l, m m3), 6) AS h_lang
    FROM joint j
    JOIN marg_s s USING (source)
    JOIN marg_l l USING (lang)
    CROSS JOIN m
    """,
    tags=("llm", "governance", "information-theory", "extension"),
)
def llm_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(source; lang) plus both marginal entropies
    — the governance number for "how much does knowing the crawl
    source tell you about language mix" (high MI = sources are
    language-siloed; the mixture sampler should stratify on both).

    Determinism: all probabilities come from exact integer counts;
    the ln/Σ assembly follows the PSI/KS convention (6-dp round on a
    |sources|×|langs|-sized frame, far from boundary sensitivity).

    Scale: one groupBy over (source, lang) with partial aggregation;
    marginals re-aggregate the joint frame (model-sized), never the
    corpus."""
    joint = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sl"))
    )
    total = joint.agg(F.sum("n_sl").cast("long").alias("n"))
    marg_s = joint.groupBy("source").agg(
        F.sum("n_sl").cast("long").alias("n_s")
    )
    marg_l = joint.groupBy("lang").agg(F.sum("n_sl").cast("long").alias("n_l"))
    n = F.col("n").cast("double")
    mi = (
        joint.join(marg_s, "source")
        .join(marg_l, "lang")
        .crossJoin(F.broadcast(total))
        .agg(
            F.round(
                F.sum(
                    (F.col("n_sl").cast("double") / n)
                    * F.log(
                        F.col("n_sl").cast("double")
                        * n
                        / (F.col("n_s").cast("double") * F.col("n_l"))
                    )
                ),
                6,
            ).alias("mi_nats")
        )
    )
    hs = (
        marg_s.crossJoin(F.broadcast(total))
        .agg(
            F.round(
                -F.sum(
                    (F.col("n_s").cast("double") / n)
                    * F.log(F.col("n_s").cast("double") / n)
                ),
                6,
            ).alias("h_source")
        )
    )
    hl = (
        marg_l.crossJoin(F.broadcast(total))
        .agg(
            F.round(
                -F.sum(
                    (F.col("n_l").cast("double") / n)
                    * F.log(F.col("n_l").cast("double") / n)
                ),
                6,
            ).alias("h_lang")
        )
    )
    return mi.crossJoin(F.broadcast(hs)).crossJoin(F.broadcast(hl))


# ---------------------------------------------------------------------------
# 8. Lorenz curve deciles (distributional complement of the Gini query)
# ---------------------------------------------------------------------------
@query(
    "q_lorenz_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT)
                   AS micros
        FROM events GROUP BY user_id
    ), tiled AS (
        SELECT micros,
               NTILE(10) OVER (ORDER BY micros ASC, user_id ASC) AS decile
        FROM per_user
    ), sums AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(micros) AS BIGINT) AS decile_micros
        FROM tiled GROUP BY decile
    )
    SELECT decile, n_users, decile_micros,
           ROUND(CAST(SUM(decile_micros) OVER (ORDER BY decile) AS DOUBLE)
                 / SUM(decile_micros) OVER (), 6) AS cum_share
    FROM sums ORDER BY decile
    """,
    tags=("analytics", "distribution", "extension"),
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve: users in ascending-value deciles with each
    decile's cumulative share of total value — the distribution curve
    the Gini query (``q_user_value_gini``) integrates; together they
    answer "how concentrated is usage" with both the scalar and the
    shape.

    Determinism: per-user totals in exact integer micro-units;
    NTILE's ordering carries the user_id tie-break so decile
    membership is identical across engines.

    Scale: per-user partial-agg rollup, then windows over the
    user-cardinality frame (the NTILE global sort is over users, not
    events)."""
    from pyspark.sql import Window

    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 1e6).cast("long"))
            .cast("long")
            .alias("micros")
        )
    )
    tiled = per_user.select(
        "micros",
        F.ntile(10)
        .over(Window.orderBy(F.col("micros").asc(), F.col("user_id").asc()))
        .alias("decile"),
    )
    sums = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("micros").cast("long").alias("decile_micros"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return sums.select(
        "decile",
        "n_users",
        "decile_micros",
        F.round(
            F.sum("decile_micros").over(wc).cast("double")
            / F.sum("decile_micros").over(wall),
            6,
        ).alias("cum_share"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# 10. Bloom-filter membership audit with measured FPR
# ---------------------------------------------------------------------------
_BLOOM_M = 1024  # bits
_BLOOM_K = 3  # hash functions


def _bloom_pos_spark(j: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{j}|"), F.col("c_custkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BLOOM_M
    )


def _bloom_pos_sql(j: int) -> str:
    return (
        f"CAST(('0x' || substring(md5('b{j}|' || CAST(c_custkey AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {_BLOOM_M}"
    )


@query(
    "q_bloom_membership_audit",
    oracle=f"""
    WITH members AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ), bits AS (
        SELECT DISTINCT pos FROM (
            {" UNION ALL ".join(f"SELECT {_bloom_pos_sql(j)} AS pos FROM members" for j in range(_BLOOM_K))}
        )
    ), tests AS (
        SELECT c.c_custkey,
               (c.c_mktsegment = 'BUILDING') AS is_member,
               {" AND ".join(f"({_bloom_pos_sql(j)}) IN (SELECT pos FROM bits)" for j in range(_BLOOM_K))}
                   AS bloom_hit
        FROM customer c
    )
    SELECT CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_members,
           CAST(SUM(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negatives,
           CAST(SUM(CASE WHEN NOT is_member AND bloom_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives,
           ROUND(SUM(CASE WHEN NOT is_member AND bloom_hit THEN 1.0
                          ELSE 0 END)
                 / SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END), 6)
               AS measured_fpr
    FROM tests
    """,
    tags=("sketch", "bloom", "membership", "extension"),
)
def q_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership end to end with the property that
    matters audited: build a {_BLOOM_M}-bit / k={_BLOOM_K} filter over
    the BUILDING-segment customers from md5-derived bit positions
    (engine-portable — the same primitive as the CMS/shard queries),
    probe EVERY customer, and report bits set, the false-positive rate
    measured against ground truth, and the false-negative count, which
    a correct Bloom filter must pin at ZERO — that's the guarantee the
    structure exists to provide.

    Scale: the filter is the mergeable pre-aggregation pattern — each
    partition ORs its bit positions (distinct pos), the ≤{_BLOOM_M}-row
    bit set broadcasts into the probe side, and the probe is map-side
    (this is exactly how a 100 TB anti-join prefilter deploys; Spark's
    own runtime bloom pruning is plan-asserted in
    tests/test_runtime_filters.py, this query makes the mechanics
    first-class and measurable)."""
    cust = load(spark, sf_dir, "customer")
    members = cust.filter(F.col("c_mktsegment") == "BUILDING")
    bits = None
    for j in range(_BLOOM_K):
        part = members.select(_bloom_pos_spark(j).alias("pos"))
        bits = part if bits is None else bits.unionByName(part)
    bits = bits.distinct()
    bits_ct = bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    probe = cust.select(
        "c_custkey",
        (F.col("c_mktsegment") == "BUILDING").alias("is_member"),
        *[_bloom_pos_spark(j).alias(f"p{j}") for j in range(_BLOOM_K)],
    )
    hit = probe
    for j in range(_BLOOM_K):
        hit = hit.join(
            F.broadcast(bits.withColumnRenamed("pos", f"b{j}")),
            F.col(f"p{j}") == F.col(f"b{j}"),
            "left",
        )
    bloom_hit = None
    for j in range(_BLOOM_K):
        c = F.col(f"b{j}").isNotNull()
        bloom_hit = c if bloom_hit is None else (bloom_hit & c)
    agg = hit.select("is_member", bloom_hit.alias("bloom_hit")).agg(
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_negatives"),
        F.sum(F.when(~F.col("is_member") & F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.round(
            F.sum(
                F.when(~F.col("is_member") & F.col("bloom_hit"), 1.0).otherwise(
                    0.0
                )
            )
            / F.sum(F.when(~F.col("is_member"), 1).otherwise(0)),
            6,
        ).alias("measured_fpr"),
    )
    return F.broadcast(bits_ct).crossJoin(agg).select(
        "bits_set",
        "n_members",
        "n_false_negatives",
        "n_false_positives",
        "measured_fpr",
    )


# ---------------------------------------------------------------------------
# 10. Kaplan-Meier retention survival
# ---------------------------------------------------------------------------
@query(
    "q_kaplan_meier_retention",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    ), sess AS (
        SELECT user_id, sid,
               (CAST(floor(epoch(MAX(ts))) AS BIGINT)
                - CAST(floor(epoch(MIN(ts))) AS BIGINT)) // 60 AS dur_min,
               MAX(ts) AS e
        FROM numbered GROUP BY user_id, sid
    ), spans AS (
        SELECT dur_min,
               e >= (SELECT MAX(ts) FROM events) - INTERVAL 30 MINUTE
                   AS censored
        FROM sess
    ), death_times AS (
        SELECT dur_min AS t,
               CAST(SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
                   AS d
        FROM spans GROUP BY dur_min
        HAVING SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) > 0
    ), at_risk AS (
        SELECT dt.t, dt.d,
               CAST((SELECT COUNT(*) FROM spans s WHERE s.dur_min >= dt.t)
                    AS BIGINT) AS n_risk
        FROM death_times dt
    )
    SELECT CAST(t AS BIGINT) AS t_min, n_risk, d AS n_deaths,
           CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY t) = 1
                THEN 0.0
                ELSE ROUND(EXP(SUM(
                         CASE WHEN d = n_risk THEN 0.0
                              ELSE LN(1.0 - CAST(d AS DOUBLE) / n_risk) END)
                     OVER (ORDER BY t)), 6) END AS survival
    FROM at_risk ORDER BY t_min
    """,
    tags=("analytics", "survival", "extension"),
)
def q_kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of SESSION duration (30-min-gap
    sessions, the engine's sessionizer): how long does an engagement
    session survive before ending?  Sessions still within one gap of
    the observation horizon are right-censored — they may be ongoing,
    and dropping or counting them as ended would bias the curve, which
    is the reason KM exists over a naive duration histogram.
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over death times, censored sessions in
    the at-risk denominator through their censor time.

    Determinism: durations are integer minutes from epoch seconds
    (the sessionize-oracle arithmetic); dᵢ/nᵢ are exact integer
    ratios; the product is exp(Σ ln(·)) over a window whose ORDER BY
    fixes summation order; 6-dp round.

    Scale: sessionization is the existing lag-gap window (one shuffle
    keyed on user); every KM step then runs on the ≤|distinct
    durations| frame (37 rows here).  The at-risk counts come from a
    duration-level inequality join on that tiny frame, not the
    session table."""
    from pyspark.sql import Window

    from .. import streaming

    e = load(spark, sf_dir, "events")
    sess = streaming.sessionize_batch(e)
    horizon = e.agg(
        (
            F.max("ts").cast("long") - F.lit(1800)
        ).alias("censor_floor")
    )
    spans = sess.crossJoin(F.broadcast(horizon)).select(
        (
            (
                F.col("session_end").cast("long")
                - F.col("session_start").cast("long")
            )
            / 60
        )
        .cast("long")
        .alias("dur_min"),
        (F.col("session_end").cast("long") >= F.col("censor_floor")).alias(
            "censored"
        ),
    )
    deaths = (
        spans.groupBy(F.col("dur_min").alias("t"))
        .agg(
            F.sum(F.when(~F.col("censored"), 1).otherwise(0))
            .cast("long")
            .alias("d")
        )
        .filter(F.col("d") > 0)
    )
    risk = (
        deaths.join(
            spans.select("dur_min"), deaths["t"] <= F.col("dur_min"), "left"
        )
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_risk"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # the final death time has d == n_risk (everyone still at risk
    # dies), where ln(1 - d/n) is -inf: mask those factors out of the
    # log-sum and pin survival to exactly 0.0 from that step on
    zero_hit = F.max(
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    ).over(w)
    log_term = F.when(F.col("d") == F.col("n_risk"), 0.0).otherwise(
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
    )
    return risk.select(
        F.col("t").cast("long").alias("t_min"),
        "n_risk",
        F.col("d").alias("n_deaths"),
        F.when(zero_hit == 1, 0.0)
        .otherwise(F.round(F.exp(F.sum(log_term).over(w)), 6))
        .alias("survival"),
    ).orderBy("t_min")


# ---------------------------------------------------------------------------
# 11. Poisson-bootstrap confidence interval for the mean
# ---------------------------------------------------------------------------
_POIS_C = (
    0.36787944117144233,  # P(X=0)
    0.7357588823428847,  # + P(1)
    0.9196986029286058,  # + P(2)
    0.9810118431238462,  # + P(3); else 4
)


@query(
    "q_bootstrap_ci_poisson",
    oracle=f"""
    WITH x AS (
        SELECT event_id, CAST(FLOOR(value * 1e6) AS BIGINT) AS v FROM events
    ), draws AS (
        SELECT b.b, x.v,
               (CAST(('0x' || substring(
                    md5(CAST(b.b AS VARCHAR) || '|'
                        || CAST(x.event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                + 1.0) / 4294967297.0 AS u
        FROM x, (SELECT UNNEST(range(1, 201)) AS b) b
    ), weighted AS (
        SELECT b,
               CASE WHEN u < {_POIS_C[0]} THEN 0
                    WHEN u < {_POIS_C[1]} THEN 1
                    WHEN u < {_POIS_C[2]} THEN 2
                    WHEN u < {_POIS_C[3]} THEN 3
                    ELSE 4 END AS w,
               v
        FROM draws
    ), means AS (
        SELECT b,
               CAST(SUM(CAST(w AS BIGINT) * v) AS DOUBLE)
                   / SUM(CAST(w AS BIGINT)) AS m
        FROM weighted GROUP BY b
    ), ranked AS (
        SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS r FROM means
    )
    SELECT CAST(200 AS BIGINT) AS n_replicates,
           ROUND((SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) FROM x), 6)
               AS point_est_micros,
           ROUND((SELECT m FROM ranked WHERE r = 5), 6) AS ci_lo_micros,
           ROUND((SELECT m FROM ranked WHERE r = 196), 6) AS ci_hi_micros
    """,
    tags=("analytics", "bootstrap", "extension"),
)
def q_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap: 200 deterministic resample replicates of the
    mean event value, each row weighted by a Poisson(1) draw derived
    from an md5 uniform (inverse-CDF on shared double constants), and
    the 95% percentile interval read off the ranked replicate means —
    THE distributed bootstrap (per-row independent weights, no
    resample shuffle, exactly how uncertainty is bootstrapped over
    data too big to multinomial-resample).

    Determinism: weights are integers from md5; Σw·x and Σw are exact
    BIGINTs, so every replicate mean is the same double on both
    engines; the CI picks ranked elements 5/196 of 200 — exact order
    statistics, no interpolation.

    Scale: the 200× fan-out is map-side (replicate id explodes before
    the partial agg); the shuffle carries 200 partial rows per
    partition, and everything after runs on a 200-row frame."""
    from pyspark.sql import Window

    # repartition before the 200× fan-out: the single-file testdata scan
    # would otherwise push all B·N md5 evaluations through ONE task
    # (measured 15.9s single-task vs ~1.3s spread at sf0.1); width tracks
    # the cluster (fanout_partitions), not a local core-count constant
    # the long→string casts are hoisted OUT of the 200× fan-out: there are
    # only 200 distinct b and N distinct event_id strings, so they are
    # materialized once per input row (not once per (b, event) pair); the
    # md5 input — and therefore every draw — is byte-identical
    x = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_id").cast("string").alias("eid"),
            F.floor(F.col("value") * 1e6).cast("long").alias("v"),
        )
        .repartition(fanout_partitions(spark))
    )
    bs = spark.range(1, 201).select(
        F.col("id").alias("b"), F.col("id").cast("string").alias("b_str")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("b_str"), F.col("eid"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        + 1.0
    ) / 4294967297.0
    w = (
        F.when(u < _POIS_C[0], 0)
        .when(u < _POIS_C[1], 1)
        .when(u < _POIS_C[2], 2)
        .when(u < _POIS_C[3], 3)
        .otherwise(4)
        .cast("long")
    )
    means = (
        x.crossJoin(F.broadcast(bs))
        .select("b", (w * F.col("v")).alias("wv"), w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum("wv").cast("double") / F.sum("w").cast("double")
            ).alias("m")
        )
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("r")
    )
    point = x.agg(
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias(
            "point_est_micros"
        )
    )
    # both CI bounds read off ONE ranked frame in ONE aggregate: the naive
    # two-filter form plants two full copies of the 200× md5 fan-out
    # subtree in the plan (scan→repartition→crossJoin→agg→window per
    # bound); min/max over the r∈{5,196} rows are exactly the same two
    # ranked values, so the result is byte-identical with half the plan
    ci = ranked.filter(F.col("r").isin(5, 196)).agg(
        F.round(F.min(F.when(F.col("r") == 5, F.col("m"))), 6).alias(
            "ci_lo_micros"
        ),
        F.round(F.max(F.when(F.col("r") == 196, F.col("m"))), 6).alias(
            "ci_hi_micros"
        ),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        F.lit(200).cast("long").alias("n_replicates"),
        "point_est_micros",
        "ci_lo_micros",
        "ci_hi_micros",
    )


# ---------------------------------------------------------------------------
# 12. Reciprocal-rank fusion of two keyword rankings
# ---------------------------------------------------------------------------
@query(
    "q_reciprocal_rank_fusion",
    oracle="""
    WITH tf AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    x -> x = 'join')) AS BIGINT) AS tf_a,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    x -> x = 'vector')) AS BIGINT) AS tf_b
        FROM documents
    ), ranked AS (
        SELECT doc_id, tf_a, tf_b,
               ROW_NUMBER() OVER (ORDER BY tf_a DESC, doc_id ASC) AS rank_a,
               ROW_NUMBER() OVER (ORDER BY tf_b DESC, doc_id ASC) AS rank_b
        FROM tf
    )
    SELECT doc_id, rank_a, rank_b,
           ROUND(1.0 / (60 + rank_a) + 1.0 / (60 + rank_b), 6) AS rrf
    FROM ranked
    ORDER BY rrf DESC, doc_id LIMIT 25
    """,
    tags=("llm", "retrieval", "rank-fusion", "extension"),
)
def q_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, k=60) of two retrieval rankings —
    term-frequency rankings for 'join' and 'vector' standing in for a
    lexical and a semantic ranker.  RRF is how hybrid search engines
    merge heterogeneous scorers without calibrating their score
    scales; only RANKS enter the fused score, so the fusion is
    bit-stable wherever the input rankings are (integer tf with
    doc_id tie-breaks here).

    Scale: tf columns are map-side array ops; each ranking is one
    sort (window) over the doc-cardinality frame; fusion is
    arithmetic on the already-ranked rows and a top-k."""
    from pyspark.sql import Window

    tf = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda x: x == "join")
        )
        .cast("long")
        .alias("tf_a"),
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda x: x == "vector")
        )
        .cast("long")
        .alias("tf_b"),
    )
    ranked = tf.select(
        "doc_id",
        "tf_a",
        "tf_b",
        F.row_number()
        .over(Window.orderBy(F.col("tf_a").desc(), F.col("doc_id").asc()))
        .alias("rank_a"),
        F.row_number()
        .over(Window.orderBy(F.col("tf_b").desc(), F.col("doc_id").asc()))
        .alias("rank_b"),
    )
    return (
        ranked.select(
            "doc_id",
            "rank_a",
            "rank_b",
            F.round(
                1.0 / (60 + F.col("rank_a")) + 1.0 / (60 + F.col("rank_b")), 6
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# 13. Incremental view maintenance of an aggregated JOIN
# ---------------------------------------------------------------------------
@query(
    "q_ivm_join_maintenance",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("warehouse", "ivm", "materialized-view", "extension"),
)
def q_ivm_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an aggregated JOIN view — the
    delta-join algebra behind every streaming materialized view:
    with base snapshots A₀ (orders before 1998) ⋈ B₀ (first 60% of
    customers) aggregated into M₀, the arrival of ΔA (remaining
    orders) and ΔB (remaining customers) folds in as

        ΔM = agg(ΔA ⋈ B₀) ⊕ agg(A₀ ⋈ ΔB) ⊕ agg(ΔA ⋈ ΔB)

    — three DELTA-sized joins, never a re-join of the full bases.  The
    oracle computes the view over the FINAL state directly, so the
    hash match proves the maintenance algebra (including the easy-to-
    drop ΔA⋈ΔB cross term) converges to the from-scratch answer.

    Determinism: the mergeable measures are counts and exact
    cent-integers.  Scale: this is the production IVM cost model —
    work ∝ |Δ| per refresh; M is segment-cardinality and the merge is
    a tiny partial agg.  At 100 TB the deltas would broadcast against
    bucketed bases."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cut_date = F.lit("1998-01-01").cast("timestamp")
    max_key = cust.agg(F.max("c_custkey")).collect()[0][0]
    key_cut = int(max_key * 6 // 10)

    a0 = orders.filter(F.col("o_orderdate") < cut_date)
    da = orders.filter(F.col("o_orderdate") >= cut_date)
    b0 = cust.filter(F.col("c_custkey") <= key_cut)
    db = cust.filter(F.col("c_custkey") > key_cut)

    def agg_join(a, b):
        return (
            a.join(b, a["o_custkey"] == b["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum("cents").cast("long").alias("revenue_cents"),
            )
        )

    m0 = agg_join(a0, b0).localCheckpoint(eager=True)  # the stored view
    deltas = (
        agg_join(da, b0)
        .unionByName(agg_join(a0, db))
        .unionByName(agg_join(da, db))
    )
    return (
        m0.unionByName(deltas)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# 14. Position-based (U-shaped) marketing attribution
# ---------------------------------------------------------------------------
@query(
    "q_position_attribution",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase' AND user_id < 40
    ), touches AS (
        SELECT p.p_id, p.v, e.event_type, e.ts, e.event_id,
               ROW_NUMBER() OVER (PARTITION BY p.p_id
                                  ORDER BY e.ts, e.event_id) AS pos,
               COUNT(*) OVER (PARTITION BY p.p_id) AS k
        FROM purchases p
        JOIN events e
          ON e.user_id = p.user_id
         AND e.event_type IN ('click', 'view')
         AND e.ts < p.p_ts
         AND e.ts >= p.p_ts - INTERVAL 2 HOUR
    ), credited AS (
        SELECT event_type,
               CASE WHEN k = 1 THEN v
                    WHEN k = 2 AND pos = 1 THEN v // 2
                    WHEN k = 2 AND pos = 2 THEN v - v // 2
                    WHEN pos = 1 THEN (v * 2) // 5
                    WHEN pos = k THEN
                        v - (v * 2) // 5
                          - (k - 2) * ((v // 5) // (k - 2))
                    ELSE (v // 5) // (k - 2) END AS credit
        FROM touches
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit) AS BIGINT) AS credited_micros
    FROM credited GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "attribution", "extension"),
)
def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) attribution: each purchase's
    value is credited across its preceding 2-hour click/view
    touchpoints — 40% to the first touch, 40% to the last, the middle
    20% split evenly — the standard multi-touch model between
    last-click and linear.

    Determinism: credit allocation is INTEGER micro-unit arithmetic
    with the remainder assigned to the last touch (the
    largest-remainder discipline from llm_mixture_temperature), so
    credits sum exactly to the purchase value and every engine-side
    double-summation hazard disappears.

    Scale: one interval join keyed on user (the attribution shuffle),
    windows partitioned per purchase, then a types-sized rollup."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 1e6).cast("long").alias("v"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("interval 2 hours")),
    )
    wp = Window.partitionBy("p_id")
    pos = F.row_number().over(wp.orderBy("ts", "event_id"))
    ranked = joined.select(
        "event_type",
        "v",
        pos.alias("pos"),
        F.count(F.lit(1)).over(wp).alias("k"),
    )
    v, k, p = F.col("v"), F.col("k"), F.col("pos")
    mid = (v.cast("long") / 5).cast("long")  # v // 5 (v >= 0)
    first40 = (v * 2 / 5).cast("long")
    mid_each = (mid / (k - 2)).cast("long")
    credit = (
        F.when(k == 1, v)
        .when((k == 2) & (p == 1), (v / 2).cast("long"))
        .when((k == 2) & (p == 2), v - (v / 2).cast("long"))
        .when(p == 1, first40)
        .when(p == k, v - first40 - (k - 2) * mid_each)
        .otherwise(mid_each)
    )
    return (
        ranked.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("credit").cast("long").alias("credited_micros"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 15. Blocking-quality audit (pair completeness / reduction ratio)
# ---------------------------------------------------------------------------
@query(
    "llm_blocking_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
                              FOR i IN range(1, greatest(len(w) - 1, 1))])
                   AS s,
               len(w) // 8 AS block
        FROM toks
    ), true_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.block = b.block AS blocked
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ), cand AS (
        SELECT CAST(SUM(cnt * (cnt - 1) / 2) AS BIGINT) AS n_candidates
        FROM (SELECT block, COUNT(*) AS cnt FROM sh GROUP BY block)
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sh)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM true_pairs) AS n_true_pairs,
           (SELECT CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
            FROM true_pairs) AS n_true_in_block,
           ROUND((SELECT SUM(CASE WHEN blocked THEN 1.0 ELSE 0 END)
                  FROM true_pairs)
                 / (SELECT COUNT(*) FROM true_pairs), 6)
               AS pair_completeness,
           (SELECT n_candidates FROM cand) AS n_candidates,
           ROUND(1.0 - (SELECT n_candidates FROM cand)
                 / (n.n_docs * (n.n_docs - 1) / 2.0), 6) AS reduction_ratio
    FROM n
    """,
    tags=("llm", "dedup", "blocking-audit", "extension"),
    max_verify_sf=0.01,
)
def llm_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit — the two numbers every entity-resolution
    / dedup pipeline tracks for its candidate generator: PAIR
    COMPLETENESS (what fraction of true near-dup pairs land in the
    same block) and REDUCTION RATIO (what fraction of the n² pair
    space the blocker prunes), here for a token-count blocker
    (length // 8) against ground-truth Jaccard ≥ 0.8 pairs.

    The Spark side reads true pairs from the MATERIALIZED pair graph
    (`.scratch/`, shared with clusters/canonical/sweep — zero
    recompute); the oracle brute-forces all pairs, hence the
    ``max_verify_sf=0.01`` cap shared by the other pair-graph
    oracles.  Scale: candidates count from per-block tallies (never
    enumerated), completeness from a pairs-sized broadcast join."""
    from .llm_corpus import _docs, _jaccard_pair_graph

    d = _docs(spark, sf_dir).select(
        "doc_id", (F.size("toks") / 8).cast("long").alias("block")
    )
    n_docs = d.count()
    pairs = _jaccard_pair_graph(spark, sf_dir).select("id_a", "id_b")
    blocked = (
        pairs.join(
            d.select(F.col("doc_id").alias("id_a"), F.col("block").alias("ba")),
            "id_a",
        )
        .join(
            d.select(F.col("doc_id").alias("id_b"), F.col("block").alias("bb")),
            "id_b",
        )
        .select((F.col("ba") == F.col("bb")).alias("blocked"))
    )
    tp = blocked.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs"),
        F.sum(F.when(F.col("blocked"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_in_block"),
        F.round(
            F.sum(F.when(F.col("blocked"), 1.0).otherwise(0.0))
            / F.count(F.lit(1)),
            6,
        ).alias("pair_completeness"),
    )
    cand = (
        d.groupBy("block")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2)
            .cast("long")
            .alias("n_candidates")
        )
    )
    return (
        tp.crossJoin(F.broadcast(cand))
        .select(
            "n_true_pairs",
            "n_true_in_block",
            "pair_completeness",
            "n_candidates",
            F.round(
                1.0
                - F.col("n_candidates")
                / F.lit(n_docs * (n_docs - 1) / 2.0),
                6,
            ).alias("reduction_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# 16. k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------
@query(
    "q_k_anonymity_audit",
    oracle="""
    WITH rows_q AS (
        SELECT user_id // 10 AS user_band,
               event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(FLOOR(value) AS BIGINT) AS sensitive
        FROM events
    ), classes AS (
        SELECT user_band, event_type, day,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
        FROM rows_q GROUP BY user_band, event_type, day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_classes,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           ROUND(SUM(CASE WHEN k < 5 THEN CAST(k AS DOUBLE) ELSE 0 END)
                 / SUM(k), 6) AS pct_rows_at_risk,
           CAST(SUM(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_diversity_classes,
           CAST(MIN(k) AS BIGINT) AS min_k
    FROM classes
    """,
    tags=("governance", "privacy", "k-anonymity", "extension"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate run before a
    dataset release: with quasi-identifiers (user band, event type,
    day), every equivalence class smaller than k = 5 is re-
    identifiable, and every class whose sensitive attribute (value
    bucket) takes a single value leaks it even at k ≥ 5 (that's what
    l-diversity adds).  Reports class counts, rows at risk, the
    at-risk fraction, low-diversity classes, and the dataset's actual
    min-k.

    Determinism: classes and k/l are exact integer counts over integer
    bucketings.  Scale: ONE groupBy over the quasi-identifier tuple
    with partial aggregation (count-distinct of the sensitive bucket
    inside the same shuffle); the audit fold runs on the class-
    cardinality frame."""
    rows_q = load(spark, sf_dir, "events").select(
        (F.col("user_id") / 10).cast("long").alias("user_band"),
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor("value").cast("long").alias("sensitive"),
    )
    classes = rows_q.groupBy("user_band", "event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("sensitive").cast("long").alias("l"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_classes"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(
                F.when(F.col("k") < 5, F.col("k").cast("double")).otherwise(0.0)
            )
            / F.sum("k"),
            6,
        ).alias("pct_rows_at_risk"),
        F.sum(F.when(F.col("l") < 2, 1).otherwise(0))
        .cast("long")
        .alias("n_low_diversity_classes"),
        F.min("k").cast("long").alias("min_k"),
    )


# ---------------------------------------------------------------------------
# 17. Differentially-private noisy counts (deterministic Laplace)
# ---------------------------------------------------------------------------
@query(
    "q_dp_noisy_counts",
    oracle="""
    WITH counts AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ), noised AS (
        SELECT event_type, n,
               (CAST(('0x' || substring(md5('dp|' || event_type), 1, 8))
                     AS BIGINT) + 1.0) / 4294967297.0 AS u
        FROM counts
    )
    SELECT event_type,
           ROUND(n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * LN(1.0 - 2.0 * ABS(u - 0.5)), 6) AS noisy_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM noised ORDER BY event_type
    """,
    tags=("governance", "privacy", "differential-privacy", "extension"),
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (ε = 1, sensitivity 1):
    each per-type count gets Laplace(1/ε) noise via the inverse CDF —
    ``−b·sgn(u−½)·ln(1−2|u−½|)`` — with ``u`` an md5-derived uniform
    keyed on the released cell, so the mechanism is DETERMINISTIC and
    auditable across engines/runs (a seeded release, the shape DP
    deployments use for reproducible pipelines; the privacy argument
    is about the mechanism's distribution, which the hash uniform
    realizes).

    Scale: the noise attaches AFTER the partial-aggregated counts —
    per released cell, not per row; map-side cost is the count
    itself."""
    counts = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp|"), F.col("event_type"))), 1, 8),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        + 1.0
    ) / 4294967297.0
    noise = F.when(u < 0.5, 1.0).otherwise(-1.0) * F.log(
        1.0 - 2.0 * F.abs(u - 0.5)
    )
    return counts.select(
        "event_type",
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
        F.lit(1.0).cast("double").alias("epsilon"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# 18. Multi-window SLO burn rate
# ---------------------------------------------------------------------------
@query(
    "q_slo_burn_rate",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_err
        FROM events GROUP BY hour
    ), windowed AS (
        SELECT hour, n_total, n_err,
               SUM(n_err) OVER (ORDER BY hour
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS err_6h,
               SUM(n_total) OVER (ORDER BY hour
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS tot_6h
        FROM hourly
    )
    SELECT hour,
           ROUND(CAST(n_err AS DOUBLE) / n_total / 0.2, 6) AS burn_1h,
           ROUND(CAST(err_6h AS DOUBLE) / tot_6h / 0.2, 6) AS burn_6h,
           (CAST(n_err AS DOUBLE) / n_total / 0.2 > 1.0
            AND CAST(err_6h AS DOUBLE) / tot_6h / 0.2 > 1.0) AS page_alert
    FROM windowed
    ORDER BY hour
    """,
    tags=("monitoring", "slo", "sre", "extension"),
)
def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn rate — the SRE alerting arithmetic (the
    Google SRE-workbook pattern): with a 20% error-budget SLO, the
    burn rate is observed-error-rate / budget over a short (1 h) AND a
    long (trailing 6 h) window, and the page fires only when BOTH
    exceed 1× — the short window gives fast detection, the long one
    suppresses blips.

    Determinism: hourly error/total counts are exact integers; both
    burn ratios are single double divisions, 6-dp rounded; the AND of
    two >1.0 comparisons is far from representational noise at this
    budget.

    Scale: the hourly rollup is the one corpus-sized pass
    (partial-agg); burn windows run on the ~720-row hour frame per
    month — this is exactly how a 100 TB event firehose serves SLO
    dashboards, never scanning raw events per evaluation."""
    from pyspark.sql import Window

    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_err"),
        )
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    windowed = hourly.select(
        "hour",
        "n_total",
        "n_err",
        F.sum("n_err").over(w6).alias("err_6h"),
        F.sum("n_total").over(w6).alias("tot_6h"),
    )
    burn1 = F.col("n_err").cast("double") / F.col("n_total") / 0.2
    burn6 = F.col("err_6h").cast("double") / F.col("tot_6h") / 0.2
    return windowed.select(
        "hour",
        F.round(burn1, 6).alias("burn_1h"),
        F.round(burn6, 6).alias("burn_6h"),
        ((burn1 > 1.0) & (burn6 > 1.0)).alias("page_alert"),
    ).orderBy("hour")
