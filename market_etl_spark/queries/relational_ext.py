"""Relational extensions beyond the reference surface: as-of join,
rollup, set operations, and the spark.sql text entry point.

The as-of join is the canonical next market-data operator (SURVEY.md
§2.3 — absent from the reference, flagged as the natural extension):
"for each row of the left stream, the latest right-stream row at or
before its timestamp". Implemented as a union + partitioned-window
last-value carry-forward — ONE shuffle on the join key, no range
explosion, no per-row probe — and verified against DuckDB's *native*
``ASOF JOIN`` operator, which is a strong independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import round6
from ..tables import load, register_all
from .registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    tolerance_expr: str | None = None,
) -> DataFrame:
    """Generic as-of join: every ``left`` row gains the most recent
    ``right`` row (per ``on`` key) with ``right.ts <= left.ts``.

    Union the two sides with a side tag, then one window pass per key
    ordered by (ts, side): ``last(right_value, ignoreNulls)`` over the
    preceding frame carries the latest right value forward into each
    left row. Right rows sort before left rows at equal timestamps, so
    ties resolve to "at or before" semantics. Cost: one hash shuffle on
    the key + an in-partition sort — the same shape as any windowed
    aggregate, regardless of how asymmetric the two sides are.
    """
    lcols = [c for c in left.columns if c not in (on, ts)]
    tagged_left = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("_asof_ts"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col(on),
        F.col(ts),
        *[F.col(c) for c in lcols],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
        F.col("_asof_ts").alias("asof_ts"),
    )
    if tolerance_expr:
        keep = F.col("asof_ts").isNotNull() & (
            F.col(ts).cast("long") - F.col("asof_ts").cast("long")
            <= F.expr(tolerance_expr).cast("long")
        )
        out = out.withColumn("asof_ts", F.when(keep, F.col("asof_ts"))).withColumn(
            "asof_" + value_cols[0], F.when(keep, F.col("asof_" + value_cols[0]))
        )
    return out


@query(
    "q_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id,
           p.ts,
           ROUND(p.value, 6) AS purchase_value,
           ROUND(c.value, 6) AS asof_click_value,
           c.ts AS asof_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.user_id, p.ts
    """,
    tags=("extension", "asof-join"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before
    it. Our union+window composition vs DuckDB's NATIVE ASOF JOIN —
    two unrelated implementations of the operator must agree row for
    row."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", round6(F.col("value")).alias("purchase_value")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", round6(F.col("value")).alias("value")
    )
    return (
        asof_join(purchases, clicks, on="user_id", ts="ts", value_cols=("value",))
        .select(
            "user_id",
            "ts",
            "purchase_value",
            F.col("asof_value").alias("asof_click_value"),
            "asof_ts",
        )
        .orderBy("user_id", "ts")
    )


@query(
    "q_rollup_volume",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           COUNT(*) AS events,
           ROUND(SUM(value), 4) AS volume
    FROM events
    GROUP BY ROLLUP (CAST(year(ts) AS INT), CAST(month(ts) AS INT), CAST(day(ts) AS INT))
    ORDER BY y NULLS FIRST, m NULLS FIRST, d NULLS FIRST
    """,
    tags=("extension", "rollup"),
)
def q_rollup_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (day → month → year → grand) in ONE pass via
    ROLLUP — the OLAP operator a dashboard needs instead of issuing 4
    separate aggregations. Spark expands grouping sets inside a single
    hash aggregate; rounding at 4dp keeps double re-summation across
    grouping levels hash-stable cross-engine."""
    e = load(spark, sf_dir, "events")
    return (
        e.rollup(
            F.year("ts").cast("int").alias("y"),
            F.month("ts").cast("int").alias("m"),
            F.dayofmonth("ts").cast("int").alias("d"),
        )
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 4).alias("volume"))
        .orderBy(F.asc_nulls_first("y"), F.asc_nulls_first("m"), F.asc_nulls_first("d"))
    )


@query(
    "q_set_ops",
    oracle="""
    WITH big_spenders AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 200
    ), clickers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 200
    )
    SELECT 'both' AS cohort, COUNT(*) AS users FROM (
        SELECT user_id FROM big_spenders INTERSECT SELECT user_id FROM clickers)
    UNION ALL
    SELECT 'purchase_only', COUNT(*) FROM (
        SELECT user_id FROM big_spenders EXCEPT SELECT user_id FROM clickers)
    UNION ALL
    SELECT 'either', COUNT(*) FROM (
        SELECT user_id FROM big_spenders UNION SELECT user_id FROM clickers)
    ORDER BY cohort
    """,
    tags=("extension", "set-ops"),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION cohort arithmetic (§2.7 — absent from
    the reference, standard for audience analysis). Spark plans each as
    a hash-partitioned distinct join — no driver-side set logic."""
    e = load(spark, sf_dir, "events")
    spenders = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select("user_id")
        .distinct()
    )
    clickers = (
        e.filter((F.col("event_type") == "click") & (F.col("value") > 200))
        .select("user_id")
        .distinct()
    )
    rows = [
        spenders.intersect(clickers).agg(
            F.lit("both").alias("cohort"), F.count("*").alias("users")
        ),
        spenders.exceptAll(clickers).agg(
            F.lit("purchase_only").alias("cohort"), F.count("*").alias("users")
        ),
        spenders.union(clickers).distinct().agg(
            F.lit("either").alias("cohort"), F.count("*").alias("users")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("cohort")


@query(
    "q_salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS trades,
           ROUND(SUM(value), 4) AS volume,
           MIN(value) AS low,
           MAX(value) AS high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("extension", "skew-salting"),
)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage salted aggregation
    (:func:`market_etl_spark.functions.skew.salted_agg`): event_type has
    only 5 values, so an unsalted groupBy funnels 1/5 of 100 TB through
    5 reducers; salting scatters each key over 16 partial groups first.
    The oracle is the plain one-stage GROUP BY — results must be
    identical, only the shuffle shape differs."""
    from ..functions.skew import salted_agg

    e = load(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["event_type"],
        aggs={
            "trades": ("count", "value"),
            "volume": ("sum", "value"),
            "low": ("min", "value"),
            "high": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        "trades",
        F.round("volume", 4).alias("volume"),
        "low",
        "high",
    ).orderBy("event_type")


@query(
    "q_salted_skew_join",
    oracle="""
    WITH dim(event_type, category, weight) AS (
        VALUES ('click', 'engage', 1.0), ('view', 'engage', 0.5),
               ('purchase', 'revenue', 3.0), ('signup', 'growth', 2.0),
               ('error', 'ops', 0.1)
    )
    SELECT d.category AS category,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value * d.weight), 4) AS weighted_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.category
    ORDER BY category
    """,
    tags=("extension", "skew-salting", "joins"),
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted JOIN (:func:`..functions.skew.salted_join`):
    events' 5-value event_type key would funnel each hot key through
    one reducer in a shuffled join; salting spreads each key over 16
    lanes while the 5-row dim replicates 16×. A shuffle_hash hint
    forces the shuffled-join shape the salt exists for (with broadcast
    allowed, Spark would — correctly — just broadcast the dim; the
    pattern's target is the big-⋈-medium case where it can't). The
    oracle is the plain unsalted join — identical result, different
    shuffle shape."""
    from ..functions.skew import salted_join

    e = load(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [
            ("click", "engage", 1.0),
            ("view", "engage", 0.5),
            ("purchase", "revenue", 3.0),
            ("signup", "growth", 2.0),
            ("error", "ops", 0.1),
        ],
        "event_type string, category string, weight double",
    )
    joined = salted_join(e, dim.hint("shuffle_hash"), "event_type", salt_buckets=16)
    return (
        joined.groupBy("category")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias(
                "weighted_value"
            ),
        )
        .orderBy("category")
    )


_SQL_WHALES = """
    WITH percentiles AS (
        SELECT l_returnflag,
               percentile(l_extendedprice, 0.99) AS p99_trade_value
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           l.l_extendedprice AS trade_value
    FROM lineitem l
    JOIN percentiles p ON l.l_returnflag = p.l_returnflag
    WHERE l.l_extendedprice >= p.p99_trade_value
    ORDER BY trade_value DESC, l.l_orderkey, l.l_linenumber
    LIMIT 100
"""


@query(
    "q_sql_text_whales",
    oracle="""
    WITH percentiles AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.99) AS p99_trade_value
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           l.l_extendedprice AS trade_value
    FROM lineitem l
    JOIN percentiles p ON l.l_returnflag = p.l_returnflag
    WHERE l.l_extendedprice >= p.p99_trade_value
    ORDER BY trade_value DESC, l.l_orderkey, l.l_linenumber
    LIMIT 100
    """,
    tags=("extension", "sql-text"),
)
def q_sql_text_whales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's second entry point: raw SQL text through
    ``spark.sql`` over registered views (SURVEY.md §3.2 — parse →
    analyze → the same Catalyst plan as the DataFrame form). Verbatim
    CTE shape of the reference's Q5
    (sql/athena_sample_queries.sql:100-121)."""
    register_all(spark, sf_dir)
    return spark.sql(_SQL_WHALES)


# ---------------------------------------------------------------------------
# Interval join (no equi key) + banded range join
# ---------------------------------------------------------------------------
def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 60,
) -> DataFrame:
    """Join facts to half-open time intervals [start, end) with NO equi
    key — the case where a naive join degenerates to a broadcast
    nested loop over the whole fact table.

    Scale-safe shape: explode each interval to the coarse time bins it
    overlaps (fan-out = interval length / bin width, typically 1-2),
    bin each fact ONCE, equi-join on the bin, then apply the exact
    range predicate as a residual. Both sides shuffle hash-partitioned
    on the bin — co-located, no cross product; a fact falls in exactly
    one bin, so no post-join dedup is needed. Choose ``bin_seconds``
    near the typical interval length so neither side's fan-out
    explodes."""
    bin_us = bin_seconds * 1_000_000
    ivals = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bin_us).cast("long"),
                # end is exclusive: the bin of (end - 1µs)
                F.floor((F.unix_micros(F.col(end_col)) - 1) / bin_us).cast("long"),
            )
        ),
    )
    binned = facts.withColumn(
        "_bin", F.floor(F.unix_micros(F.col(ts_col)) / bin_us).cast("long")
    )
    return (
        binned.join(ivals, "_bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bin")
    )


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Banded range join: each fact row matches the band whose half-open
    range [lo, hi) contains its value (tiering, histogram buckets, tax
    brackets). The band table is dimension-sized by definition, so the
    right plan at ANY fact scale is an explicit broadcast with the
    range predicate evaluated fact-side (a broadcast nested-loop whose
    inner side is a handful of rows — effectively a per-row bin
    lookup, no shuffle of the facts). For band tables too large to
    broadcast, fall back to :func:`binned_interval_join` semantics on
    the value axis."""
    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
    )


@query(
    "q_interval_join",
    oracle="""
    WITH by_min AS (
        SELECT event_type, date_trunc('minute', ts) AS m, COUNT(*) AS cnt
        FROM events GROUP BY event_type, m
    ), wins AS (
        SELECT event_type AS win_type, m AS win_start,
               m + INTERVAL 1 MINUTE AS win_end
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY cnt DESC, m
            ) AS rn FROM by_min
        ) WHERE rn <= 3
    )
    SELECT w.win_type, w.win_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           ROUND(SUM(e.value), 2) AS total_value
    FROM wins w JOIN events e
      ON e.ts >= w.win_start AND e.ts < w.win_end
    GROUP BY w.win_type, w.win_start
    ORDER BY w.win_type, w.win_start
    """,
    tags=("extension", "interval-join"),
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-stream interval join: each event type's 3 busiest minutes
    define alert windows; count ALL traffic (any type) falling inside
    any window. There is no equi key — the oracle joins on the raw
    range predicate; the engine runs the binned equi-join + residual
    (:func:`binned_interval_join`), which hash-partitions both sides
    on the time bin instead of nested-looping the fact table."""
    e = load(spark, sf_dir, "events")
    by_min = e.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("m"))
    wins = (
        by_min.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("event_type").alias("win_type"),
            F.col("m").alias("win_start"),
            (F.col("m") + F.expr("INTERVAL 1 MINUTE")).alias("win_end"),
        )
    )
    joined = binned_interval_join(e, wins, "ts", "win_start", "win_end", 60)
    return (
        joined.groupBy("win_type", "win_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("win_type", "win_start")
    )


@query(
    "q_range_band_join",
    oracle="""
    WITH ps AS (
        SELECT quantile_cont(o_totalprice,
                   [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS p,
               MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        FROM orders
    ), bands AS (
        SELECT r.range AS band_id,
               CASE WHEN r.range = 0 THEN mn - 1
                    ELSE ROUND(p[CAST(r.range AS INT) + 1], 6) END AS lo,
               CASE WHEN r.range = 9 THEN mx + 1
                    ELSE ROUND(p[CAST(r.range AS INT) + 2], 6) END AS hi
        FROM ps CROSS JOIN range(0, 10) r
    )
    SELECT band_id, ROUND(lo, 6) AS lo, ROUND(hi, 6) AS hi,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_price
    FROM bands b JOIN orders o
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY band_id, lo, hi
    ORDER BY band_id
    """,
    tags=("extension", "range-band-join"),
)
def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding of order values: exact-percentile band edges
    (rounded to 6dp on BOTH engines so containment decisions are
    bit-identical), outer edges widened past min/max, then a broadcast
    banded range join (:func:`range_band_join`) classifying every
    order — the facts never shuffle; the 10-row band table rides along
    broadcast. Edges derive from a 1-row aggregate exploded into band
    rows, no driver collect."""
    o = load(spark, sf_dir, "orders")
    qlist = ",".join(str(i / 10) for i in range(11))
    ps = o.agg(
        F.expr(f"percentile(o_totalprice, array({qlist}))").alias("p"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    bands = (
        ps.select(
            "p", "mn", "mx", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_i")
        )
        .select(
            F.col("_i").cast("long").alias("band_id"),
            F.when(F.col("_i") == 0, F.col("mn") - 1)
            .otherwise(F.round(F.expr("element_at(p, _i + 1)"), 6))
            .alias("lo"),
            F.when(F.col("_i") == 9, F.col("mx") + 1)
            .otherwise(F.round(F.expr("element_at(p, _i + 2)"), 6))
            .alias("hi"),
        )
    )
    joined = range_band_join(o, bands, "o_totalprice")
    return (
        joined.groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            "band_id",
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
            "n_orders",
            "total_price",
        )
        .orderBy("band_id")
    )


@query(
    "q_unpivot_melt",
    oracle="""
    WITH wide AS (
        SELECT date_trunc('hour', ts) AS h,
               ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
               ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 6) AS view,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase
        FROM events GROUP BY h
    ), long AS (
        SELECT h, 'click' AS event_type, click AS hourly_value FROM wide
        UNION ALL SELECT h, 'view', view FROM wide
        UNION ALL SELECT h, 'purchase', purchase FROM wide
    )
    SELECT event_type,
           COUNT(hourly_value) AS n_hours,
           ROUND(SUM(hourly_value), 4) AS total_value
    FROM long
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("extension", "pivot-unpivot"),
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip: hourly values pivot WIDE by event
    type (one hash aggregate with conditional sums — no join), then
    ``unpivot`` melts the matrix back to long form and a final
    aggregate proves the reshape is lossless. Unpivot is a zero-shuffle
    row-local expansion (each wide row emits one row per measure —
    Spark's Expand node), so the reshape costs no exchange at any
    scale; NULL cells (hours with no such events) drop out of the melt
    exactly as the SQL form's COUNT/SUM ignore them."""
    e = load(spark, sf_dir, "events")
    wide = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.round(F.sum("value"), 6))
    )
    long = wide.unpivot(
        ["h"], ["click", "view", "purchase"], "event_type", "hourly_value"
    ).filter(F.col("hourly_value").isNotNull())
    return (
        long.groupBy("event_type")
        .agg(
            F.count("hourly_value").alias("n_hours"),
            F.round(F.sum("hourly_value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q_user_value_deciles",
    oracle="""
    WITH per_user AS (
        SELECT user_id, ROUND(SUM(value), 6) AS total_value
        FROM events GROUP BY user_id
    ), tiled AS (
        SELECT user_id, total_value,
               NTILE(10) OVER (ORDER BY total_value DESC, user_id) AS decile
        FROM per_user
    )
    SELECT decile,
           COUNT(*) AS n_users,
           ROUND(MIN(total_value), 6) AS floor_value,
           ROUND(MAX(total_value), 6) AS ceil_value,
           ROUND(SUM(total_value), 4) AS decile_value
    FROM tiled
    GROUP BY decile
    ORDER BY decile
    """,
    tags=("extension", "window-ntile"),
)
def q_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile segmentation: NTILE(10) over per-user
    lifetime value (ties broken on the rounded total then user id, so
    both engines tile identically). The global window runs on the
    AGGREGATED side — user cardinality, not event cardinality — which
    is the only safe place for an unpartitioned window; the event scan
    itself sees one hash aggregate. Per-decile min/max/sum give the
    segmentation report."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.round(F.sum("value"), 6).alias("total_value"))
    w = Window.orderBy(F.desc("total_value"), F.asc("user_id"))
    tiled = per_user.withColumn("decile", F.ntile(10).over(w).cast("long"))
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.min("total_value"), 6).alias("floor_value"),
            F.round(F.max("total_value"), 6).alias("ceil_value"),
            F.round(F.sum("total_value"), 4).alias("decile_value"),
        )
        .orderBy("decile")
    )


@query(
    "q_lateral_topn_suppliers",
    oracle="""
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n,
         LATERAL (
             SELECT s_name, s_acctbal
             FROM supplier
             WHERE s_nationkey = n.n_nationkey
             ORDER BY s_acctbal DESC, s_name
             LIMIT 2
         ) s
    ORDER BY n.n_name, s.s_acctbal DESC, s.s_name
    """,
    tags=("extension", "lateral-join", "sql-surface"),
)
def q_lateral_topn_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 suppliers by account balance
    per nation, written as the SQL-standard lateral join both engines
    parse natively. Catalyst DECORRELATES it into the same plan as the
    window rendering (DomainJoin → partitioned rank — no per-outer-row
    re-execution), so the n_topk-per-group idiom costs one shuffle on
    the correlation key at any scale; this query pins the SQL surface
    while `q_window_topn_per_group` pins the DataFrame rendering."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, s.s_name, s.s_acctbal
        FROM nation n,
             LATERAL (
                 SELECT s_name, s_acctbal
                 FROM supplier
                 WHERE s_nationkey = n.n_nationkey
                 ORDER BY s_acctbal DESC, s_name
                 LIMIT 2
             ) s
        ORDER BY n.n_name, s.s_acctbal DESC, s.s_name
        """
    )


_RECURSIVE_TREE_SQL = """
    WITH RECURSIVE tree(p_partkey, depth) AS (
        SELECT p_partkey, 0 AS depth FROM part WHERE p_partkey = 1
        UNION ALL
        SELECT c.p_partkey, t.depth + 1
        FROM part c JOIN tree t
          ON CAST(FLOOR(c.p_partkey / 2.0) AS BIGINT) = t.p_partkey
         AND c.p_partkey > 1
        WHERE t.depth < 10
    )
    SELECT depth,
           COUNT(*) AS n_nodes,
           MIN(p_partkey) AS min_key,
           MAX(p_partkey) AS max_key
    FROM tree
    GROUP BY depth
    ORDER BY depth
"""


@query(
    "q_recursive_tree_traversal",
    oracle=_RECURSIVE_TREE_SQL,
    tags=("extension", "recursive-cte", "sql-surface", "iterative"),
)
def q_recursive_tree_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard RECURSIVE CTE (new in Spark 4): breadth-first
    traversal of the implicit binary tree ``parent = ⌊key/2⌋`` over the
    part table, per-depth roll-up. Both engines execute the identical
    recursion (DuckDB has native WITH RECURSIVE), so the hash match
    certifies Spark's recursive-CTE execution end-to-end — the
    SQL-surface twin of the engine's driver-side iterative operators
    (connected components, k-means, BPE), which remain the 100 TB
    path: the recursive CTE re-joins the full child table per level,
    where the hand-rolled fixpoints checkpoint ids-only state per
    round and stop on convergence, not a depth literal."""
    register_all(spark, sf_dir)
    return spark.sql(_RECURSIVE_TREE_SQL)
