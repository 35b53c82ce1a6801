"""Round-8 additions, fifth batch: the experimentation/statistics
surface the A/B family still lacked.

Eight operators, each oracle-checked with integer-exact cross-engine
arithmetic (BIGINT sums, float only in the final closed-form step,
identical literal constants and association on both engines):

- ``q_kruskal_wallis`` — rank-based one-way ANOVA (the distribution-
  free sibling of ``q_weekday_anova``), tie-corrected, exact even-df
  chi-square p-value.
- ``q_jarque_bera_normality`` — skewness/kurtosis normality test from
  shifted integer power sums (no catastrophic cancellation), exact
  chi2(2) survival ``exp(-JB/2)``.
- ``q_spearman_rank_corr`` — Spearman rank correlation via the
  doubled-average-rank trick (ties stay integers).
- ``q_theil_sen_slope`` — robust median-of-pairwise-slopes trend.
- ``q_mcnemar_test`` — paired-binary marginal-homogeneity test with
  continuity correction.
- ``q_srm_check`` — sample-ratio-mismatch guardrail per experiment
  exposure.
- ``q_power_analysis_mde`` — minimum-detectable-effect planning grid
  with the Acklam inverse-normal evaluated in-engine.
- ``q_difference_in_differences`` — 2x2 DiD estimator with pooled
  standard error from exact cell moments.

Reference parity note: the reference repo (harshvardhanvn1/market-etl)
has no statistics layer at all — this module extends SURVEY.md §2.15's
statistics family, which backs the experimentation workflows a market
data platform runs downstream of the ETL the reference ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import query
from .round8b import _AS_A, _AS_P

_DAY_US = 86_400_000_000  # one day in microseconds (integer)

# ---------------------------------------------------------------------------
# Kruskal-Wallis H: rank-based one-way ANOVA across weekday groups
# ---------------------------------------------------------------------------
_KW_USERS = 100  # bound keeps N <= 100 users x 31 days at every SF


@query(
    "q_kruskal_wallis",
    oracle=f"""
    WITH d AS (
        SELECT user_id, epoch_us(ts) // {_DAY_US} AS dd,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS v
        FROM events WHERE user_id < {_KW_USERS}
        GROUP BY user_id, dd
    ), r AS (
        SELECT dd % 7 AS wd, v,
               2 * RANK() OVER (ORDER BY v)
                   + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
        FROM d
    ), g AS (
        SELECT wd, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(r2) AS BIGINT) AS s2
        FROM r GROUP BY wd
    ), ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM r GROUP BY v)
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(s2 * s2 AS DOUBLE) / CAST(ng AS DOUBLE)) AS tsq
        FROM g
    ), h AS (
        SELECT n, k, tsum,
               3.0 * tsq / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1)
                   AS h_raw,
               1.0 - CAST(tsum AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n * n - n) AS c
        FROM tot, ties
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(k AS BIGINT) AS k_groups,
           CAST(tsum AS BIGINT) AS tie_sum,
           ROUND(h_raw, 6) AS h_stat,
           ROUND(h_raw / c, 6) AS h_tie_corrected,
           ROUND(EXP(-(h_raw / c) / 2)
                 * (1 + (h_raw / c) / 2
                    + ((h_raw / c) / 2) * ((h_raw / c) / 2) / 2), 6)
               AS p_value
    FROM h
    """,
    tags=("statistics", "nonparametric", "anova", "extension"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H test (round-8e — the distribution-free sibling
    of ``q_weekday_anova``: same "is there weekday seasonality"
    question, but on RANKS, so it holds under the heavy-tailed value
    distributions where the F test's normality assumption breaks):
    per-user daily value totals grouped by weekday (``epoch_day % 7``
    — engine-neutral, unlike dayofweek whose origin differs), ranked
    globally with the doubled-average-rank trick (``2*RANK() +
    ties - 1`` keeps tied average ranks INTEGER), H from exact integer
    rank sums, the standard tie correction ``1 - sum(t^3-t)/(N^3-N)``,
    and the chi-square(6) p-value via the EXACT even-df closed form
    ``exp(-x/2)*(1 + x/2 + (x/2)^2/2)`` — 7 weekday groups means df=6,
    and even df needs no incomplete-gamma approximation at all.

    Exactness: every sum that crosses the engines is BIGINT (rank sums
    <= 2*3100^2 ~ 2e7, squared ~ 4e14 < 2^53); float appears only in
    the 7-term S_g^2/n_g fold whose worst-case association error
    (~1e-3 absolute at magnitude 5e12) is scaled by 3/(N(N+1)) ~ 3e-7
    before the 6-dp round.

    Scale: the user bound caps the ranked frame at 3.1k rows at every
    SF — the global rank window is bounded by construction (same
    contract as q_slo_burn_rate's global window); the raw-event scan
    partial-aggregates per (user, day) before anything global."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < _KW_USERS)
    d = (
        e.groupBy(
            "user_id", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("dd")
        )
        .agg(F.sum(F.floor(F.col("value") * 1e6).cast("long")).cast("long").alias("v"))
    )
    # Bounded global window: <= _KW_USERS * 31 rows by construction.
    r = d.select(
        (F.col("dd") % 7).alias("wd"),
        "v",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count(F.lit(1)).over(Window.partitionBy("v"))
            - 1
        ).alias("r2"),
    )
    g = r.groupBy("wd").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("r2").cast("long").alias("s2"),
    )
    ties = (
        r.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tsum")
        )
    )
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            (F.col("s2") * F.col("s2")).cast("double") / F.col("ng").cast("double")
        ).alias("tsq"),
    )
    h = tot.crossJoin(F.broadcast(ties)).select(
        "n",
        "k",
        "tsum",
        (
            F.lit(3.0) * F.col("tsq") / (F.col("n").cast("double") * (F.col("n") + 1))
            - F.lit(3.0) * (F.col("n") + 1)
        ).alias("h_raw"),
        (
            F.lit(1.0)
            - F.col("tsum").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
        ).alias("c"),
    )
    hc = F.col("h_raw") / F.col("c")
    return h.select(
        F.col("n").cast("long").alias("n_obs"),
        F.col("k").cast("long").alias("k_groups"),
        F.col("tsum").cast("long").alias("tie_sum"),
        F.round("h_raw", 6).alias("h_stat"),
        F.round(hc, 6).alias("h_tie_corrected"),
        F.round(
            F.exp(-hc / 2) * (1 + hc / 2 + (hc / 2) * (hc / 2) / 2), 6
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test from shifted integer power sums
# ---------------------------------------------------------------------------
@query(
    "q_jarque_bera_normality",
    oracle="""
    WITH x AS (
        SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS x FROM events
    ), c AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s1
        FROM x GROUP BY event_type
    ), y AS (
        SELECT x.event_type, c.n, c.s1, x.x - c.s1 // c.n AS y
        FROM x JOIN c ON x.event_type = c.event_type
    ), m AS (
        SELECT event_type, MAX(n) AS n,
               CAST(MAX(s1 - (s1 // n) * n) AS DOUBLE) / MAX(n) AS delta,
               CAST(SUM(y * y) AS DOUBLE) / MAX(n) AS e2,
               CAST(SUM(y * y * y) AS DOUBLE) / MAX(n) AS e3,
               CAST(SUM(y * y * y * y) AS DOUBLE) / MAX(n) AS e4
        FROM y GROUP BY event_type
    ), mom AS (
        SELECT event_type, n, delta,
               e2 - delta * delta AS m2,
               e3 - 3 * delta * e2 + 2 * delta * delta * delta AS m3,
               e4 - 4 * delta * e3 + 6 * delta * delta * e2
                  - 3 * delta * delta * delta * delta AS m4
        FROM m
    ), stat AS (
        SELECT event_type, n,
               m3 / (m2 * SQRT(m2)) AS g1,
               m4 / (m2 * m2) - 3 AS g2
        FROM mom
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(g1, 6) AS skewness,
           ROUND(g2, 6) AS ex_kurtosis,
           ROUND(n * (g1 * g1 / 6 + g2 * g2 / 24), 6) AS jb_stat,
           ROUND(EXP(-(n * (g1 * g1 / 6 + g2 * g2 / 24)) / 2), 6) AS p_value
    FROM stat ORDER BY event_type
    """,
    tags=("statistics", "normality", "moments", "extension"),
)
def q_jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality test (round-8e — the screening step the
    moment family (q_value_moments) and every z/t-test implicitly
    assume but nothing verified: ARE the per-type value distributions
    normal?): skewness g1 and excess kurtosis g2 per event_type, JB =
    n*(g1^2/6 + g2^2/24), and the EXACT chi-square(2) survival
    ``exp(-JB/2)`` — df=2 is the one chi-square whose tail needs no
    approximation.

    Exactness recipe: raw power sums of unit-quantized values around a
    PER-GROUP INTEGER pseudo-mean ``c = S1 div n`` — the shift keeps
    |y| ~ spread (not magnitude), so sum(y^4) stays exact BIGINT
    (<= 600^4 * 1e7 rows ~ 1.3e18 < 2^63) and the central-moment
    corrections run in the small residual ``delta = mean - c in
    [0,1)`` — no catastrophic cancellation of the m^4-scale terms that
    the naive raw-moment expansion hits. Both engines then evaluate
    the identical float expression on identical integers.

    Scale: two passes of partial aggregation (one for (n, S1), one for
    the shifted power sums) joined through a 5-row broadcast — no
    window, no shuffle of the fact table beyond the 5-key agg."""
    e = load(spark, sf_dir, "events")
    x = e.select("event_type", F.floor("value").cast("long").alias("x"))
    c = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
    )
    y = x.join(F.broadcast(c), "event_type").select(
        "event_type",
        "n",
        "s1",
        (F.col("x") - F.expr("s1 div n")).alias("y"),
    )
    m = y.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (
            F.max(F.col("s1") - F.expr("s1 div n") * F.col("n")).cast("double")
            / F.max("n")
        ).alias("delta"),
        (F.sum(F.col("y") * F.col("y")).cast("double") / F.max("n")).alias("e2"),
        (
            F.sum(F.col("y") * F.col("y") * F.col("y")).cast("double")
            / F.max("n")
        ).alias("e3"),
        (
            F.sum(F.col("y") * F.col("y") * F.col("y") * F.col("y")).cast("double")
            / F.max("n")
        ).alias("e4"),
    )
    d = F.col("delta")
    mom = m.select(
        "event_type",
        "n",
        (F.col("e2") - d * d).alias("m2"),
        (F.col("e3") - 3 * d * F.col("e2") + 2 * d * d * d).alias("m3"),
        (
            F.col("e4")
            - 4 * d * F.col("e3")
            + 6 * d * d * F.col("e2")
            - 3 * d * d * d * d
        ).alias("m4"),
    )
    g1 = F.col("m3") / (F.col("m2") * F.sqrt("m2"))
    g2 = F.col("m4") / (F.col("m2") * F.col("m2")) - 3
    jb = F.col("n") * (g1 * g1 / 6 + g2 * g2 / 24)
    return (
        mom.select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(g1, 6).alias("skewness"),
            F.round(g2, 6).alias("ex_kurtosis"),
            F.round(jb, 6).alias("jb_stat"),
            F.round(F.exp(-jb / 2), 6).alias("p_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation: daily volume vs daily value, per type
# ---------------------------------------------------------------------------
@query(
    "q_spearman_rank_corr",
    oracle=f"""
    WITH d AS (
        SELECT event_type, epoch_us(ts) // {_DAY_US} AS dd,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, dd
    ), r AS (
        SELECT event_type,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
                   + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS ry
        FROM d
    ), s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
               CAST(SUM(rx * ry) AS BIGINT) AS sxy,
               CAST(SUM(rx * rx) AS BIGINT) AS sxx,
               CAST(SUM(ry * ry) AS BIGINT) AS syy
        FROM r GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
    FROM s ORDER BY event_type
    """,
    tags=("statistics", "correlation", "nonparametric", "extension"),
)
def q_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation (round-8e — the monotone-association
    member of the correlation family: q_event_type_correlation is
    Pearson on values; this asks "do busier days have higher value"
    robustly to outliers and nonlinearity): per event_type, the daily
    series (count, value total) is double-average-ranked (``2*RANK() +
    ties - 1`` — tied ranks stay INTEGER), then rho = Pearson on the
    integer rank pairs, computed from exact BIGINT sums (<= 62^2 * 31
    per group) with float entering only in the final ratio — both
    engines divide the identical integers.

    Scale: events fold to (type, day) cardinality in one partial agg;
    windows rank <= 31 rows per group; the correlation is a 5-row
    fold. The doubled-rank trick is the general recipe for tie-exact
    rank statistics on any engine pair."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("dd")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.floor(F.col("value") * 1e6).cast("long")).cast("long").alias("y"),
    )
    wt = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        (
            2 * F.rank().over(wt.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "x"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(wt.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "y"))
            - 1
        ).alias("ry"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(num / den, 6).alias("rho"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Theil-Sen slope: median of pairwise slopes, per type
# ---------------------------------------------------------------------------
@query(
    "q_theil_sen_slope",
    oracle=f"""
    WITH d AS (
        SELECT event_type, epoch_us(ts) // {_DAY_US} AS dd,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY event_type, dd
    ), p AS (
        SELECT a.event_type,
               CAST(b.v - a.v AS DOUBLE) / (b.dd - a.dd) AS slope,
               a.dd AS d1, b.dd AS d2
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.dd < b.dd
    ), r AS (
        SELECT event_type, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope, d1, d2) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM p
    )
    SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs,
           ROUND(slope, 6) AS ts_slope_micros_per_day
    FROM r WHERE rn = (cnt + 1) // 2
    ORDER BY event_type
    """,
    tags=("statistics", "robust-regression", "extension"),
)
def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend (round-8e — the outlier-proof sibling of
    q_regression_ols: OLS's slope moves arbitrarily far under one bad
    day, the median of pairwise slopes tolerates ~29% contamination):
    per event_type, every day pair's slope (exact BIGINT differences
    divided once — both engines produce the bit-identical double), and
    the lower-middle median by a deterministic (slope, d1, d2) order.

    Scale: the pair join is bounded by construction — the series is
    the DAILY aggregate (~31 rows/group at any SF), so the self-join
    is ~465 pairs per group regardless of event count; the raw scan
    partial-aggregates first. For longer series the same operator
    applies per bounded window (the estimator is O(T^2) by
    definition; production runs it on rollup-cardinality series)."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("dd")
    ).agg(
        F.sum(F.floor(F.col("value") * 1e6).cast("long")).cast("long").alias("v")
    )
    a, b = d.alias("a"), d.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.dd") < F.col("b.dd")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.v") - F.col("a.v")).cast("double")
            / (F.col("b.dd") - F.col("a.dd"))
        ).alias("slope"),
        F.col("a.dd").alias("d1"),
        F.col("b.dd").alias("d2"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    r = p.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("cnt"),
    )
    return (
        r.filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(
            "event_type",
            F.col("cnt").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("ts_slope_micros_per_day"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# McNemar paired-binary test: activity in first vs second half-month
# ---------------------------------------------------------------------------
def _erfc_terms(a: tuple[float, ...], p: float) -> tuple[str, str]:
    """SQL fragments (poly, t-def) for the A&S 7.1.26 erfc evaluated at
    ``z`` (column name), shared with the Spark side via identical
    literals.  erfc(z) = poly(t) * exp(-z*z), t = 1/(1 + p*z)."""
    a1, a2, a3, a4, a5 = a
    poly = (
        f"((((({a5} * t + {a4}) * t + {a3}) * t + {a2}) * t + {a1}) * t)"
    )
    return poly, f"1 / (1 + {p} * z)"


@query(
    "q_mcnemar_test",
    oracle=f"""
    WITH anchor AS (
        SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
        FROM events
    ), u AS (
        SELECT user_id,
               MAX(CASE WHEN epoch_us(ts) < a.mid THEN 1 ELSE 0 END) AS f,
               MAX(CASE WHEN epoch_us(ts) >= a.mid THEN 1 ELSE 0 END) AS s
        FROM events, anchor a GROUP BY user_id, a.mid
    ), cells AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(f * s) AS BIGINT) AS both_active,
               CAST(SUM(f * (1 - s)) AS BIGINT) AS first_only,
               CAST(SUM((1 - f) * s) AS BIGINT) AS second_only
        FROM u
    ), stat AS (
        SELECT *,
               CASE WHEN first_only + second_only = 0 THEN 0.0
                    ELSE CAST((ABS(first_only - second_only) - 1)
                              * (ABS(first_only - second_only) - 1) AS DOUBLE)
                         / (first_only + second_only) END AS chi2
        FROM cells
    ), z AS (
        SELECT *, SQRT(chi2 / 2) AS z FROM stat
    ), t AS (
        SELECT *, {_erfc_terms(_AS_A, _AS_P)[1]} AS t FROM z
    )
    SELECT n_users, both_active, first_only, second_only,
           ROUND(chi2, 6) AS chi2_cc,
           ROUND({_erfc_terms(_AS_A, _AS_P)[0]} * EXP(-z * z), 6) AS p_value
    FROM t
    """,
    tags=("statistics", "paired-test", "extension"),
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR marginal-homogeneity test (round-8e — the PAIRED member
    of the proportion-test family: Welch/SRM compare independent
    groups, but "did the same users stay active month-half over
    month-half" pairs each user with themself): per-user binary
    (active first half, active second half) from an integer micros
    midpoint, the discordant counts b (first-only) and c
    (second-only), the continuity-corrected chi-square
    ``(|b-c|-1)^2/(b+c)``, and the chi-square(1) survival via the
    shared Abramowitz-Stegun erfc (identical constants/association to
    q_benjamini_hochberg): ``P(X>x) = erfc(sqrt(x/2))``.

    Exactness: b, c are exact integers, chi2 is one integer ratio, the
    erfc polynomial runs on the identical double in both engines.

    Scale: one partial-aggregated pass to user cardinality, then a
    1-row fold; the midpoint anchor is a 1-row broadcast (allow-listed
    BNLJ, same contract as q_rfm_segments' max-day anchor)."""
    e = load(spark, sf_dir, "events")
    anchor = e.agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").alias("mid")
    )
    u = (
        e.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.expr("unix_micros(ts)") < F.col("mid"), 1).otherwise(0)
            ).alias("f"),
            F.max(
                F.when(F.expr("unix_micros(ts)") >= F.col("mid"), 1).otherwise(0)
            ).alias("s"),
        )
    )
    cells = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("f") * F.col("s")).cast("long").alias("both_active"),
        F.sum(F.col("f") * (1 - F.col("s"))).cast("long").alias("first_only"),
        F.sum((1 - F.col("f")) * F.col("s")).cast("long").alias("second_only"),
    )
    b, c = F.col("first_only"), F.col("second_only")
    chi2 = F.when(b + c == 0, F.lit(0.0)).otherwise(
        ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double") / (b + c)
    )
    stat = cells.withColumn("chi2", chi2)
    z = F.sqrt(F.col("chi2") / 2)
    a1, a2, a3, a4, a5 = _AS_A
    t = 1 / (1 + F.lit(_AS_P) * z)
    poly = (
        (((F.lit(a5) * t + F.lit(a4)) * t + F.lit(a3)) * t + F.lit(a2)) * t
        + F.lit(a1)
    ) * t
    return stat.select(
        "n_users",
        "both_active",
        "first_only",
        "second_only",
        F.round("chi2", 6).alias("chi2_cc"),
        F.round(poly * F.exp(-z * z), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch check per exposure
# ---------------------------------------------------------------------------
@query(
    "q_srm_check",
    oracle=f"""
    WITH e AS (
        SELECT DISTINCT event_type, user_id, user_id % 2 AS arm FROM events
    ), c AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM e GROUP BY event_type
    ), s AS (
        SELECT *, CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1) AS chi2
        FROM c
    ), z AS (
        SELECT *, SQRT(chi2 / 2) AS z FROM s
    ), t AS (
        SELECT *, {_erfc_terms(_AS_A, _AS_P)[1]} AS t FROM z
    ), p AS (
        SELECT event_type, n0, n1, chi2,
               {_erfc_terms(_AS_A, _AS_P)[0]} * EXP(-z * z) AS p
        FROM t
    )
    SELECT event_type, n0 AS exposed_control, n1 AS exposed_treatment,
           ROUND(chi2, 6) AS chi2_stat, ROUND(p, 6) AS p_value,
           (p < 0.001) AS srm_flag
    FROM p ORDER BY event_type
    """,
    tags=("statistics", "experimentation", "guardrail", "extension"),
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH guardrail (round-8e — the health check
    every experiment readout runs BEFORE the effect tests the registry
    already has (Welch/Mann-Whitney/CUPED/SPRT): if the 50/50
    assignment didn't land 50/50 among exposed users, the readout is
    invalid no matter what the metric says): per exposure surface
    (event_type), distinct exposed users per arm (user_id % 2 — the
    deterministic assignment used by the whole A/B family), the
    equal-split chi-square ``(n0-n1)^2/(n0+n1)`` (exact integer
    ratio), the chi-square(1) p-value via the shared A&S erfc, and the
    standard p < 0.001 SRM flag.

    Scale: distinct (type, user, arm) partial-aggregates then folds to
    5 rows; no global state at all."""
    e = load(spark, sf_dir, "events")
    d = e.select(
        "event_type", "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    c = d.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / (F.col("n0") + F.col("n1"))
    s = c.withColumn("chi2", chi2)
    z = F.sqrt(F.col("chi2") / 2)
    a1, a2, a3, a4, a5 = _AS_A
    t = 1 / (1 + F.lit(_AS_P) * z)
    poly = (
        (((F.lit(a5) * t + F.lit(a4)) * t + F.lit(a3)) * t + F.lit(a2)) * t
        + F.lit(a1)
    ) * t
    p = s.withColumn("p", poly * F.exp(-z * z))
    return p.select(
        "event_type",
        F.col("n0").alias("exposed_control"),
        F.col("n1").alias("exposed_treatment"),
        F.round("chi2", 6).alias("chi2_stat"),
        F.round("p", 6).alias("p_value"),
        (F.col("p") < 0.001).alias("srm_flag"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Power analysis: minimum detectable effect across a power grid
# ---------------------------------------------------------------------------
#: Acklam inverse-normal rational approximation, central branch
#: (valid for p in [0.02425, 0.97575] — every grid point below).  The
#: SAME literal constants are evaluated in both engines.
_ACK_A = (
    -3.969683028665376e01,
    2.209460984245205e02,
    -2.759285104469687e02,
    1.383577518672690e02,
    -3.066479806614716e01,
    2.506628277459239e00,
)
_ACK_B = (
    -5.447609879822406e01,
    1.615858368580409e02,
    -1.556989798598866e02,
    6.680131188771972e01,
    -1.328068155288572e01,
)
_ALPHA_TWO_SIDED = 0.975  # 1 - alpha/2 at alpha = 0.05


def _acklam_sql(p_expr: str) -> str:
    a1, a2, a3, a4, a5, a6 = _ACK_A
    b1, b2, b3, b4, b5 = _ACK_B
    # CAST to DOUBLE: DuckDB types bare decimal literals as DECIMAL and
    # the Horner products overflow scale 38 without it.
    q = f"(CAST({p_expr} AS DOUBLE) - 0.5)"
    r = f"({q} * {q})"
    num = f"((((({a1} * {r} + {a2}) * {r} + {a3}) * {r} + {a4}) * {r} + {a5}) * {r} + {a6})"
    den = f"((((({b1} * {r} + {b2}) * {r} + {b3}) * {r} + {b4}) * {r} + {b5}) * {r} + 1)"
    return f"({num} * {q} / {den})"


def _acklam_col(p: F.Column) -> F.Column:
    a1, a2, a3, a4, a5, a6 = _ACK_A
    b1, b2, b3, b4, b5 = _ACK_B
    q = p - 0.5
    r = q * q
    num = (
        ((((F.lit(a1) * r + a2) * r + a3) * r + a4) * r + a5) * r + a6
    )
    den = ((((F.lit(b1) * r + b2) * r + b3) * r + b4) * r + b5) * r + 1
    return num * q / den


@query(
    "q_power_analysis_mde",
    oracle=f"""
    WITH base AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
               CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                        THEN user_id END) AS BIGINT) AS conv
        FROM events
    ), grid AS (
        SELECT CAST(x AS BIGINT) AS power_pct FROM range(50, 100, 5) t(x)
    ), g AS (
        SELECT b.users, b.conv, grid.power_pct,
               CAST(b.conv AS DOUBLE) / b.users AS p0,
               b.users // 2 AS n_arm,
               {_acklam_sql(str(_ALPHA_TWO_SIDED))} AS za,
               {_acklam_sql("CAST(grid.power_pct AS DOUBLE) / 100")} AS zp
        FROM base b, grid
    )
    SELECT power_pct, n_arm AS n_per_arm,
           ROUND(p0, 6) AS baseline_rate,
           ROUND(za, 6) AS z_alpha, ROUND(zp, 6) AS z_power,
           ROUND((za + zp) * SQRT(2 * p0 * (1 - p0) / n_arm), 6) AS mde_abs,
           ROUND((za + zp) * SQRT(2 * p0 * (1 - p0) / n_arm) / p0, 6)
               AS mde_rel
    FROM g ORDER BY power_pct
    """,
    tags=("statistics", "experimentation", "planning", "extension"),
)
def q_power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER-ANALYSIS planning grid (round-8e — the question asked
    BEFORE any experiment the A/B family reads out: "with this traffic
    and baseline, what lift CAN we even detect?"): observed baseline
    conversion (distinct purchasing users / distinct users) and per-arm
    traffic feed the two-proportion MDE formula ``(z_{{1-a/2}} +
    z_{{power}}) * sqrt(2 p (1-p) / n)`` across a 50%..95% power grid,
    with BOTH normal quantiles evaluated in-engine by the Acklam
    rational approximation (central branch; identical literal
    constants and Horner association in both engines — the same
    contract as the A&S erf family, in the inverse direction).

    Exactness: grid points are exact literals (pct/100 parses to the
    identical double), the baseline is one integer ratio, and every
    downstream op is the same IEEE expression on both sides.

    Scale: one distinct-user partial agg to a 1-row frame, crossed
    with a 10-row literal grid (allow-listed 1-row broadcast)."""
    e = load(spark, sf_dir, "events")
    base = e.agg(
        F.countDistinct("user_id").cast("long").alias("users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("long")
        .alias("conv"),
    )
    grid = base.select(
        "users",
        "conv",
        F.explode(F.sequence(F.lit(50), F.lit(95), F.lit(5))).alias("power_pct"),
    ).withColumn("power_pct", F.col("power_pct").cast("long"))
    g = grid.select(
        "power_pct",
        (F.col("conv").cast("double") / F.col("users")).alias("p0"),
        F.expr("users div 2").alias("n_arm"),
        _acklam_col(F.lit(_ALPHA_TWO_SIDED)).alias("za"),
        _acklam_col(F.col("power_pct").cast("double") / 100).alias("zp"),
    )
    mde = (F.col("za") + F.col("zp")) * F.sqrt(
        2 * F.col("p0") * (1 - F.col("p0")) / F.col("n_arm")
    )
    return g.select(
        "power_pct",
        F.col("n_arm").alias("n_per_arm"),
        F.round("p0", 6).alias("baseline_rate"),
        F.round("za", 6).alias("z_alpha"),
        F.round("zp", 6).alias("z_power"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("p0"), 6).alias("mde_rel"),
    ).orderBy("power_pct")


# ---------------------------------------------------------------------------
# Difference-in-differences: 2x2 natural-experiment estimator
# ---------------------------------------------------------------------------
@query(
    "q_difference_in_differences",
    oracle=f"""
    WITH anchor AS (
        SELECT (MIN(epoch_us(ts) // {_DAY_US})
                + MAX(epoch_us(ts) // {_DAY_US}) + 1) // 2 AS midday
        FROM events
    ), y AS (
        SELECT user_id % 2 AS treat,
               CASE WHEN epoch_us(ts) // {_DAY_US} >= a.midday
                    THEN 1 ELSE 0 END AS post,
               user_id,
               CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS yv
        FROM events, anchor a
        GROUP BY 1, 2, user_id
    ), cell AS (
        SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yv) AS BIGINT) AS s,
               CAST(SUM(yv * yv) AS BIGINT) AS ss
        FROM y GROUP BY treat, post
    ), wide AS (
        SELECT
          MAX(CASE WHEN treat=0 AND post=0 THEN n END) AS n00,
          MAX(CASE WHEN treat=0 AND post=1 THEN n END) AS n01,
          MAX(CASE WHEN treat=1 AND post=0 THEN n END) AS n10,
          MAX(CASE WHEN treat=1 AND post=1 THEN n END) AS n11,
          MAX(CASE WHEN treat=0 AND post=0 THEN s END) AS s00,
          MAX(CASE WHEN treat=0 AND post=1 THEN s END) AS s01,
          MAX(CASE WHEN treat=1 AND post=0 THEN s END) AS s10,
          MAX(CASE WHEN treat=1 AND post=1 THEN s END) AS s11,
          MAX(CASE WHEN treat=0 AND post=0 THEN ss END) AS ss00,
          MAX(CASE WHEN treat=0 AND post=1 THEN ss END) AS ss01,
          MAX(CASE WHEN treat=1 AND post=0 THEN ss END) AS ss10,
          MAX(CASE WHEN treat=1 AND post=1 THEN ss END) AS ss11
        FROM cell
    ), est AS (
        SELECT *,
          CAST(s00 AS DOUBLE)/n00 AS m00, CAST(s01 AS DOUBLE)/n01 AS m01,
          CAST(s10 AS DOUBLE)/n10 AS m10, CAST(s11 AS DOUBLE)/n11 AS m11,
          CAST(n00*ss00 - s00*s00 AS DOUBLE)/(CAST(n00 AS DOUBLE)*n00*(n00-1)) AS vm00,
          CAST(n01*ss01 - s01*s01 AS DOUBLE)/(CAST(n01 AS DOUBLE)*n01*(n01-1)) AS vm01,
          CAST(n10*ss10 - s10*s10 AS DOUBLE)/(CAST(n10 AS DOUBLE)*n10*(n10-1)) AS vm10,
          CAST(n11*ss11 - s11*s11 AS DOUBLE)/(CAST(n11 AS DOUBLE)*n11*(n11-1)) AS vm11
        FROM wide
    )
    SELECT n00, n01, n10, n11,
           ROUND(m00, 6) AS mean_c_pre, ROUND(m01, 6) AS mean_c_post,
           ROUND(m10, 6) AS mean_t_pre, ROUND(m11, 6) AS mean_t_post,
           ROUND((m11 - m10) - (m01 - m00), 6) AS did_units,
           ROUND(SQRT(((vm00 + vm01) + vm10) + vm11), 6) AS se,
           ROUND(((m11 - m10) - (m01 - m00))
                 / SQRT(((vm00 + vm01) + vm10) + vm11), 6) AS t_stat
    FROM est
    """,
    tags=("statistics", "causal", "experimentation", "extension"),
)
def q_difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES (round-8e — the causal-inference
    member of the experimentation family: CUPED adjusts a randomized
    readout, DiD recovers an effect when assignment is NOT randomized
    but a pre-period exists): users split into cohorts (user_id % 2),
    periods split at the integer midpoint day, per-user period value
    totals (unit-quantized — exact BIGINT through the square sums),
    and the 2x2 estimator ``(T_post - T_pre) - (C_post - C_pre)`` with
    the pooled standard error from exact cell moments
    (``n*ss - s^2`` stays BIGINT through sf10; the docstringed bound).
    Cell terms combine with EXPLICIT left-to-right association so both
    engines hit identical doubles.

    Scale: one partial-agg to user-period cardinality, one to 4 cells,
    then a 1-row fold — the estimator itself never sees raw events."""
    e = load(spark, sf_dir, "events")
    anchor = e.agg(
        F.expr(
            f"(min(unix_micros(ts) div {_DAY_US})"
            f" + max(unix_micros(ts) div {_DAY_US}) + 1) div 2"
        ).alias("midday")
    )
    y = (
        e.crossJoin(F.broadcast(anchor))
        .groupBy(
            (F.col("user_id") % 2).alias("treat"),
            F.when(
                F.expr(f"unix_micros(ts) div {_DAY_US}") >= F.col("midday"), 1
            )
            .otherwise(0)
            .alias("post"),
            "user_id",
        )
        .agg(F.sum(F.floor("value").cast("long")).cast("long").alias("yv"))
    )
    cell = y.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yv").cast("long").alias("s"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("ss"),
    )

    def pick(col: str, tr: int, po: int) -> F.Column:
        return F.max(
            F.when((F.col("treat") == tr) & (F.col("post") == po), F.col(col))
        )

    wide = cell.agg(
        *[
            pick(c, tr, po).alias(f"{c}{tr}{po}")
            for c in ("n", "s", "ss")
            for tr in (0, 1)
            for po in (0, 1)
        ]
    )

    def m(tr: int, po: int) -> F.Column:
        return F.col(f"s{tr}{po}").cast("double") / F.col(f"n{tr}{po}")

    def vm(tr: int, po: int) -> F.Column:
        n = F.col(f"n{tr}{po}")
        s = F.col(f"s{tr}{po}")
        ss = F.col(f"ss{tr}{po}")
        return (n * ss - s * s).cast("double") / (
            n.cast("double") * n * (n - 1)
        )

    did = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
    se = F.sqrt(((vm(0, 0) + vm(0, 1)) + vm(1, 0)) + vm(1, 1))
    return wide.select(
        F.col("n00"),
        F.col("n01"),
        F.col("n10"),
        F.col("n11"),
        F.round(m(0, 0), 6).alias("mean_c_pre"),
        F.round(m(0, 1), 6).alias("mean_c_post"),
        F.round(m(1, 0), 6).alias("mean_t_pre"),
        F.round(m(1, 1), 6).alias("mean_t_post"),
        F.round(did, 6).alias("did_units"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
    )
