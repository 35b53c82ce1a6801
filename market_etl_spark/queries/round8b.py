"""Round-8 additions, second batch.

Five operators, each oracle-checked:

- ``q_linear_interp_resample`` — time-series resampling onto a regular
  grid with LINEAR interpolation (the two-sided complement to the
  LOCF gap-fill operator).
- ``q_benjamini_hochberg`` — multiple-testing FDR control: per-user
  mean-shift z-tests, closed-form normal p-values, BH step-up.
- ``q_bfs_shortest_paths`` — iterative frontier BFS over the user
  co-activity graph, oracle = DuckDB recursive CTE.
- ``q_try_cast_quarantine`` — error-tolerant typed ingestion: TRY_CAST
  with repair rules and a quarantine ledger.
- ``q_streaming_semi_join`` — stream-stream LEFT SEMI interval join
  (EXISTS semantics), completing the streaming join matrix.
"""

from __future__ import annotations

import math
import pathlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import query


@query(
    "q_linear_interp_resample",
    oracle="""
    WITH obs AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS t,
               ROUND(AVG(value), 6) AS y
        FROM events GROUP BY 1, 2
    ), rng AS (
        SELECT event_type, MIN(t) AS t0, MAX(t) AS t1 FROM obs GROUP BY 1
    ), grid AS (
        SELECT event_type, UNNEST(range(t0, t1 + 1, 6)) AS t FROM rng
    ), u AS (
        SELECT event_type, t, CAST(NULL AS DOUBLE) AS y, 1 AS is_grid
        FROM grid
        UNION ALL
        SELECT event_type, t, y, 0 AS is_grid FROM obs
    ), f AS (
        SELECT *,
               LAST_VALUE(y IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY t, is_grid
                   ROWS UNBOUNDED PRECEDING) AS py,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY t, is_grid
                         ROWS UNBOUNDED PRECEDING) AS pt,
               LAST_VALUE(y IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY t DESC, is_grid
                   ROWS UNBOUNDED PRECEDING) AS ny,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY t DESC, is_grid
                         ROWS UNBOUNDED PRECEDING) AS nt
        FROM u
    )
    SELECT event_type, t AS grid_hour,
           ROUND(CASE WHEN nt = pt THEN py
                      ELSE py + (ny - py) * (t - pt) / CAST(nt - pt AS DOUBLE)
                 END, 6) AS y_interp
    FROM f
    WHERE is_grid = 1 AND py IS NOT NULL AND ny IS NOT NULL
    ORDER BY event_type, grid_hour
    """,
    tags=("timeseries", "resample", "interpolation", "extension"),
)
def q_linear_interp_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-interpolation resampling onto a regular 6-hour grid
    (round-8 — the two-sided complement to ``q_gapfill_forward_vwap``'s
    LOCF: each grid point takes the line between its bracketing
    observations, not the last one carried forward).  The classic
    single-pass formulation: union grid markers with the hourly
    observations, one forward scan carries (prev_t, prev_y), one
    reverse scan carries (next_t, next_y) — both plain cumulative
    windows with IGNORE NULLS, no self-join, no per-grid-point probe.
    Observations sort BEFORE markers at the same hour on both scans,
    so a grid point that lands exactly on an observation interpolates
    to it exactly.  Hourly y is 6-dp-rounded first so both engines
    interpolate bit-identical inputs.

    Scale: two sort-once window scans per event type over
    (hours + grid points) rows — never the raw events; the grid
    explodes from a 1-row-per-type range, so the fan-out is bounded
    by the time span, not the data."""
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("t")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    rng = obs.groupBy("event_type").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    grid = (
        rng.select(
            "event_type",
            F.explode_outer(
                F.sequence(F.col("t0"), F.col("t1"), F.lit(6).cast("long"))
            ).alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .select(
            "event_type",
            "t",
            F.lit(None).cast("double").alias("y"),
            F.lit(1).alias("is_grid"),
        )
    )
    u = grid.unionByName(
        obs.select("event_type", "t", "y", F.lit(0).alias("is_grid"))
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("t"), F.asc("is_grid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rev = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("t"), F.asc("is_grid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ot = F.when(F.col("is_grid") == 0, F.col("t"))
    f = u.select(
        "event_type",
        "t",
        "is_grid",
        F.last("y", ignorenulls=True).over(fwd).alias("py"),
        F.last(ot, ignorenulls=True).over(fwd).alias("pt"),
        F.last("y", ignorenulls=True).over(rev).alias("ny"),
        F.last(ot, ignorenulls=True).over(rev).alias("nt"),
    )
    interp = F.when(F.col("nt") == F.col("pt"), F.col("py")).otherwise(
        F.col("py")
        + (F.col("ny") - F.col("py"))
        * (F.col("t") - F.col("pt"))
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return (
        f.filter(
            (F.col("is_grid") == 1)
            & F.col("py").isNotNull()
            & F.col("ny").isNotNull()
        )
        .select(
            "event_type",
            F.col("t").alias("grid_hour"),
            F.round(interp, 6).alias("y_interp"),
        )
        .orderBy("event_type", "grid_hour")
    )


#: Abramowitz & Stegun 7.1.26 erf constants — the same closed-form
#: approximation evaluated in BOTH engines, so p-values agree bitwise
#: under the 6-dp round.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_BH_M = 20  # hypotheses: users 0..19
_BH_Q = 0.10  # target false-discovery rate


def _bh_oracle() -> str:
    a1, a2, a3, a4, a5 = _AS_A
    return f"""
    WITH g AS (
        SELECT ROUND(AVG(value), 6) AS mu,
               ROUND(STDDEV_SAMP(value), 6) AS sd
        FROM events
    ), s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m
        FROM events WHERE user_id < {_BH_M} GROUP BY user_id
    ), z AS (
        SELECT user_id, n,
               ROUND((m - g.mu) / (g.sd / SQRT(n)), 6) AS z
        FROM s, g
    ), p AS (
        SELECT user_id, n, z,
               ROUND((((({a5} * tt + {a4}) * tt + {a3}) * tt + {a2}) * tt
                      + {a1}) * tt * EXP(-xx * xx), 6) AS p
        FROM (SELECT *, ABS(z) / SQRT(2.0) AS xx,
                     1 / (1 + {_AS_P} * (ABS(z) / SQRT(2.0))) AS tt
              FROM z)
    ), r AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p, user_id) AS BIGINT)
                      AS rank
        FROM p
    ), k AS (
        SELECT MAX(CASE WHEN p <= rank * {_BH_Q} / {_BH_M} THEN rank
                        ELSE 0 END) AS kstar
        FROM r
    )
    SELECT r.user_id, r.n, r.z, r.p, r.rank,
           (r.rank <= k.kstar) AS rejected
    FROM r, k ORDER BY r.user_id
    """


@query(
    "q_benjamini_hochberg",
    oracle=_bh_oracle(),
    tags=("statistics", "multiple-testing", "fdr", "extension"),
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI–HOCHBERG false-discovery-rate control (round-8 — the
    multiple-testing step missing from the per-test statistics family:
    Welch/Mann-Whitney/chi-square each report ONE test; a screening
    pipeline runs thousands and must correct for it): one mean-shift
    z-test per user (is this user's mean value different from the
    corpus mean?), two-sided p-values from the Abramowitz-Stegun
    7.1.26 closed-form normal CDF (evaluated with identical constants
    and association in both engines — neither ships erf in SQL), then
    the BH step-up: rank p ascending, find the largest k with
    p_(k) ≤ k·q/m, reject ranks ≤ k.  z is rounded to 6 dp before the
    CDF so both engines transform bit-identical inputs.

    Scale: per-user moments partial-aggregate; the BH step is a rank
    + running-max over m hypothesis rows (never the events), the
    textbook two-phase screen at any m."""
    a1, a2, a3, a4, a5 = _AS_A
    e = load(spark, sf_dir, "events")
    g = e.agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    s = (
        e.filter(F.col("user_id") < _BH_M)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.avg("value").alias("m"))
    )
    z = s.crossJoin(F.broadcast(g)).select(
        "user_id",
        "n",
        F.round(
            (F.col("m") - F.col("mu")) / (F.col("sd") / F.sqrt(F.col("n"))), 6
        ).alias("z"),
    )
    xx = F.abs(F.col("z")) / F.sqrt(F.lit(2.0))
    tt = F.lit(1) / (F.lit(1) + F.lit(_AS_P) * xx)
    poly = (
        (((F.lit(a5) * tt + F.lit(a4)) * tt + F.lit(a3)) * tt + F.lit(a2)) * tt
        + F.lit(a1)
    ) * tt
    p = z.select(
        "user_id", "n", "z", F.round(poly * F.exp(-xx * xx), 6).alias("p")
    )
    r = p.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.asc("p"), F.asc("user_id"))).cast("long"),
    )
    kstar = F.max(
        F.when(F.col("p") <= F.col("rank") * _BH_Q / _BH_M, F.col("rank")).otherwise(
            F.lit(0)
        )
    ).over(Window.partitionBy())
    return (
        r.withColumn("rejected", F.col("rank") <= kstar)
        .select("user_id", "n", "z", "p", "rank", "rejected")
        .orderBy("user_id")
    )


def coactivity_edges(e, bucket_micros: int, user_bound: int | None = None):
    """Symmetric co-activity edge list shared by the graph family
    (BFS here, Jaccard link prediction in round8c): users are adjacent
    when active in the same ``bucket_micros`` time bucket.  Returns
    the directed-both-ways (x, y) frame; callers bound/cache it."""
    if user_bound is not None:
        e = e.filter(F.col("user_id") < user_bound)
    h = e.select(
        F.col("user_id").alias("u"),
        F.expr(f"unix_micros(ts) div {bucket_micros}").alias("m"),
    ).distinct()
    co = (
        h.alias("p")
        .join(h.alias("q"), F.expr("p.m = q.m AND p.u < q.u"))
        .select(F.col("p.u").alias("x"), F.col("q.u").alias("y"))
        .distinct()
    )
    return co, co.unionByName(
        co.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )


_BFS_MAX_DEPTH = 6


@query(
    "q_bfs_shortest_paths",
    oracle=f"""
    WITH RECURSIVE h AS (
        SELECT DISTINCT user_id AS u, epoch_us(ts) // 60000000 AS m
        FROM events
    ), co AS (
        SELECT DISTINCT a.u AS x, b.u AS y
        FROM h a JOIN h b ON a.m = b.m AND a.u < b.u
    ), edges AS (
        SELECT x, y FROM co UNION ALL SELECT y AS x, x AS y FROM co
    ), src AS (
        SELECT MIN(user_id) AS s FROM events
    ), bfs AS (
        SELECT s AS node, 0 AS d FROM src
        UNION
        SELECT e.y AS node, b.d + 1 AS d
        FROM bfs b JOIN edges e ON e.x = b.node
        WHERE b.d < {_BFS_MAX_DEPTH}
    ), dist AS (
        SELECT node, MIN(d) AS dist FROM bfs GROUP BY node
    )
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS id_sum
    FROM dist GROUP BY dist ORDER BY dist
    """,
    tags=("graph", "bfs", "iterative", "extension"),
)
def q_bfs_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS SHORTEST PATHS over the user co-activity graph (round-8 —
    the frontier-expansion iterative-graph operator next to the
    fixpoint family: PageRank iterates mass, hash-min CC iterates
    labels, BFS iterates a FRONTIER): users are adjacent when active
    in the same minute; distances from the minimum user id expand one
    level per iteration, each level anti-joining the known set so a
    node's first discovery IS its shortest distance.  Depth is capped
    at {_BFS_MAX_DEPTH} on both sides; the oracle is DuckDB's
    recursive CTE with the same cap (UNION-dedup recursion — the
    relational fixpoint BFS).  Output is the distance histogram with
    an id-sum witness per level.

    Scale: the frontier join shuffles on node id, each level's
    frontier is coalesced and localCheckpoint-ed (plan stays
    iteration-bounded, lineage never stacks), and the edge list is
    cached once — the standard distributed BFS loop; the anti-join
    keeps per-level work ∝ newly reached nodes."""
    e = load(spark, sf_dir, "events")
    # the loop's relations are node-id-bounded (≤ |V| rows) — pin the
    # shuffle width for the iterated stages, 200-wide exchanges per
    # level are pure scheduling overhead (same pathology the SCD2
    # fold hit; etl_pipeline.py:609)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        _co, sym = coactivity_edges(e, 60000000)
        edges = sym.coalesce(8).localCheckpoint()
        src = e.agg(F.min("user_id").alias("node")).select(
            "node", F.lit(0).alias("d")
        )
        dist = src.coalesce(1).localCheckpoint()
        frontier = dist
        for depth in range(1, _BFS_MAX_DEPTH + 1):
            nxt = (
                frontier.join(edges, frontier["node"] == edges["x"])
                .select(F.col("y").alias("node"))
                .distinct()
                .join(dist.select("node"), "node", "left_anti")
                .select("node", F.lit(depth).alias("d"))
                .coalesce(8)
                .localCheckpoint()
            )
            if nxt.rdd.isEmpty():
                break
            # union of already-checkpointed frames: no re-materialize,
            # the anti-join scans ≤ depth checkpointed legs
            dist = dist.unionByName(nxt)
            frontier = nxt
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        dist.groupBy(F.col("d").cast("long").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("id_sum"),
        )
        .orderBy("dist")
    )


def _quarantine_oracle() -> str:
    from ..llm.datasets import hash_bucket_sql

    b = hash_bucket_sql("CAST(event_id AS VARCHAR)", "dirty-v1", 5)
    return f"""
    WITH raw AS (
        SELECT event_type,
               CASE {b}
                 WHEN 0 THEN s
                 WHEN 1 THEN '$' || s
                 WHEN 2 THEN ' ' || s || ' '
                 WHEN 3 THEN s || 'x'
                 ELSE 'N/A'
               END AS raw
        FROM (SELECT event_id, event_type,
                     CAST(CAST(FLOOR(value * 1e6) AS BIGINT) AS VARCHAR) AS s
              FROM events)
    ), parsed AS (
        SELECT event_type, raw,
               TRY_CAST(raw AS BIGINT) AS direct,
               TRY_CAST(regexp_replace(TRIM(raw), '^\\$', '') AS BIGINT)
                   AS repaired
        FROM raw
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(CASE WHEN direct IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_direct,
           CAST(SUM(CASE WHEN direct IS NULL AND repaired IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
           CAST(SUM(CASE WHEN repaired IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN repaired IS NOT NULL THEN repaired
                         ELSE 0 END) AS BIGINT) AS parsed_micros
    FROM parsed GROUP BY event_type ORDER BY event_type
    """


@query(
    "q_try_cast_quarantine",
    oracle=_quarantine_oracle(),
    tags=("etl", "ingestion", "error-handling", "extension"),
)
def q_try_cast_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant typed ingestion with a QUARANTINE ledger
    (round-8 — the dirty-input half of the DQ surface: the leap-year
    filter validates well-formed values, this operator survives
    MALFORMED ones): a deterministically dirtied string column (five
    md5-bucketed corruption classes — clean, '$'-prefixed, padded,
    junk-suffixed, sentinel) is parsed with ``TRY_CAST``, rows that
    fail get one repair pass (trim + strip currency prefix) and
    another ``TRY_CAST``, and what still fails lands in the
    quarantine counts — never an exception, the ANSI-mode-safe
    ingestion contract.  Values round-trip as BIGINT micros so the
    dirty strings are bit-identical in both engines (no float
    formatting in the fixture).

    Scale: pure map-side expression work + one partial aggregation;
    TRY_CAST is codegen'd JVM-side, no UDF, no driver involvement."""
    from ..llm.datasets import hash_bucket

    e = load(spark, sf_dir, "events")
    s = F.floor(F.col("value") * 1e6).cast("long").cast("string")
    b = hash_bucket(F.col("event_id").cast("string"), "dirty-v1", 5)
    raw = (
        F.when(b == 0, s)
        .when(b == 1, F.concat(F.lit("$"), s))
        .when(b == 2, F.concat(F.lit(" "), s, F.lit(" ")))
        .when(b == 3, F.concat(s, F.lit("x")))
        .otherwise(F.lit("N/A"))
    )
    parsed = e.select("event_type", raw.alias("raw")).select(
        "event_type",
        F.col("raw").try_cast("bigint").alias("direct"),
        F.regexp_replace(F.trim(F.col("raw")), r"^\$", "")
        .try_cast("bigint")
        .alias("repaired"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.sum(F.when(F.col("direct").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_direct"),
            F.sum(
                F.when(
                    F.col("direct").isNull() & F.col("repaired").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_repaired"),
            F.sum(F.when(F.col("repaired").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_quarantined"),
            F.sum(
                F.when(F.col("repaired").isNotNull(), F.col("repaired")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("parsed_micros"),
        )
        .orderBy("event_type")
    )


@query(
    "q_streaming_semi_join",
    oracle="""
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(SUM(p.value), 4) AS converted_value
    FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id < 40
      AND EXISTS (
          SELECT 1 FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id
            AND c.ts BETWEEN p.ts - INTERVAL 2 HOUR AND p.ts
      )
    GROUP BY p.user_id ORDER BY p.user_id
    """,
    tags=("streaming", "semi-join", "extension"),
)
def q_streaming_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI interval join (round-8 — EXISTS
    semantics, the fourth cell of the streaming join matrix next to
    inner / left outer / full outer): purchases that had AT LEAST ONE
    click from the same user in the preceding 2 hours, each emitted
    exactly once no matter how many clicks matched — the streaming
    form of a decorrelated EXISTS.  Both sides watermarked, the
    interval bound in the join condition reclaims click state past
    watermark + window; matched purchases emit eagerly, so the
    availableNow replay drains completely without sentinels.  The
    oracle is the batch EXISTS subquery — stream ≡ batch on a finite
    replay.

    Scale: state is keyed by user like the inner join's, but the left
    side stores only an emitted/not bit per purchase — semi-join
    state is strictly smaller than inner-join state at any rate."""
    from .. import streaming

    stream = streaming.read_events_stream(spark, sf_dir).filter(
        F.col("user_id") < 40
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    converted = purchases.join(
        clicks,
        F.expr(
            """
            user_id = c_user AND
            click_ts >= purchase_ts - INTERVAL 2 HOURS AND
            click_ts <= purchase_ts
            """
        ),
        "left_semi",
    )
    sink = streaming.run_to_memory_append_available_now(converted, partitions=4)
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.round(F.sum("purchase_value"), 4).alias("converted_value"),
        )
        .orderBy("user_id")
    )
