"""Round-8 additions, fourth batch.

Four operators, each oracle-checked:

- ``q_weighted_median`` — weighted quantiles by cumulative-weight
  crossing (exact integer weights; the quantile the unweighted
  percentile family cannot express).
- ``q_rolling_median_window`` — rolling-median outlier screen
  (Hampel-style) over the hourly series; Spark renders the holistic
  window via a sorted frame list (no framed MEDIAN in Catalyst).
- ``llm_preference_pairs`` — DPO/RLHF preference-pair mining: best
  vs worst document per (lang, source) group by the composite
  quality score, with the score margin.
- ``q_fk_integrity_audit`` — referential-integrity audit over the
  TPC-H-lite star: orphan counts per FK edge + fan-out stats.
"""

from __future__ import annotations

import pathlib  # noqa: F401  (parity with sibling modules)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import fanout_partitions, load
from .registry import query


@query(
    "q_weighted_median",
    oracle="""
    WITH w AS (
        SELECT event_type,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS v,
               CAST(event_id % 7 + 1 AS BIGINT) AS wt
        FROM events
    ), c AS (
        SELECT event_type, v, wt,
               SUM(wt) OVER (PARTITION BY event_type ORDER BY v, wt
                             ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(wt) OVER (PARTITION BY event_type) AS total
        FROM w
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN 2 * cumw >= total THEN v END) AS BIGINT)
               AS wmedian_micros,
           CAST(MIN(CASE WHEN 10 * cumw >= 9 * total THEN v END) AS BIGINT)
               AS wp90_micros,
           CAST(MAX(total) AS BIGINT) AS total_weight
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    tags=("aggregates", "weighted-quantile", "extension"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median / p90 (round-8 — the quantile the whole
    percentile family cannot express: every existing mode weights rows
    equally, but "median trade price weighted by quantity" is the
    production question): the lower weighted quantile — the smallest
    value whose cumulative weight reaches q·W — computed by a
    per-group cumulative-weight window and a conditional MIN.  Values
    are integer micros and weights integers, so the crossing
    comparisons (2·cumw ≥ W, 10·cumw ≥ 9·W) are exact on both
    engines — no float thresholds anywhere.

    Scale: one sort-once window per group + a partial-aggregated
    fold; same shuffle shape as any grouped percentile, and the
    integer-crossing trick ports to any weighted quantile."""
    e = load(spark, sf_dir, "events")
    w = e.select(
        "event_type",
        F.floor(F.col("value") * 1e6).cast("long").alias("v"),
        (F.col("event_id") % 7 + 1).cast("long").alias("wt"),
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("v"), F.asc("wt"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = w.select(
        "event_type",
        "v",
        F.sum("wt").over(win).alias("cumw"),
        F.sum("wt").over(Window.partitionBy("event_type")).alias("total"),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.min(F.when(2 * F.col("cumw") >= F.col("total"), F.col("v")))
            .cast("long")
            .alias("wmedian_micros"),
            F.min(F.when(10 * F.col("cumw") >= 9 * F.col("total"), F.col("v")))
            .cast("long")
            .alias("wp90_micros"),
            F.max("total").cast("long").alias("total_weight"),
        )
        .orderBy("event_type")
    )


_HAMPEL_K = 11  # frame: 11 preceding hours + current


@query(
    "q_rolling_median_window",
    oracle=f"""
    WITH h AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), fr AS (
        SELECT event_type, hour, v,
               list_sort(list(v) OVER (
                   PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN {_HAMPEL_K} PRECEDING AND CURRENT ROW
               )) AS frame
        FROM h
    ), med AS (
        SELECT event_type, hour, v,
               CAST(len(frame) AS BIGINT) AS n_frame,
               frame[(len(frame) + 1) // 2] AS rmed
        FROM fr
    )
    SELECT event_type, hour, v, n_frame,
           CAST(rmed AS BIGINT) AS rolling_median,
           (5 * ABS(v - rmed) > 2 * ABS(rmed)) AS is_outlier
    FROM med
    WHERE n_frame > {_HAMPEL_K}
    ORDER BY event_type, hour
    """,
    tags=("windows", "rolling-median", "outlier", "extension"),
)
def q_rolling_median_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING MEDIAN outlier screen (round-8 — the Hampel-style
    robust complement to the rolling-mean family: EWMA and Bollinger
    flag against moving AVERAGES, which an outlier itself drags; the
    moving median does not): per event type, the median of the last
    {_HAMPEL_K}+1 hourly value totals, flagging hours that deviate
    from their rolling median by more than 40% (compared in exact
    integers: 5·|v − med| > 2·|med|).  Catalyst has no framed MEDIAN
    window, so the engine renders the holistic aggregate honestly:
    ``collect_list`` over the ROWS frame → ``array_sort`` →
    lower-middle element — exact, and the frame is a constant 12
    values per row.  Warm-up rows (incomplete frames) are excluded
    on both sides.

    Scale: one sort-once window per series; per-row state is the
    O(k) frame, never the series — the standard bounded-memory
    rolling-holistic shape."""
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("hour")
    ).agg(F.sum(F.floor(F.col("value") * 1e6).cast("long")).cast("long").alias("v"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_HAMPEL_K, 0)
    )
    fr = h.select(
        "event_type",
        "hour",
        "v",
        F.array_sort(F.collect_list("v").over(win)).alias("frame"),
    )
    med = fr.select(
        "event_type",
        "hour",
        "v",
        F.size("frame").cast("long").alias("n_frame"),
        F.expr("frame[cast((size(frame) + 1) / 2 as int) - 1]").alias("rmed"),
    )
    return (
        med.filter(F.col("n_frame") > _HAMPEL_K)
        .select(
            "event_type",
            "hour",
            "v",
            "n_frame",
            F.col("rmed").cast("long").alias("rolling_median"),
            (
                5 * F.abs(F.col("v") - F.col("rmed"))
                > 2 * F.abs(F.col("rmed"))
            ).alias("is_outlier"),
        )
        .orderBy("event_type", "hour")
    )


def _pref_oracle() -> str:
    from ..llm.text import quality_score_sql

    q = quality_score_sql("text", "w")
    return f"""
    WITH d AS (
        SELECT doc_id, lang, source, {q} AS q
        FROM (SELECT *, string_split(lower(text), ' ') AS w FROM documents)
    ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY q DESC, doc_id) AS rb,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY q ASC, doc_id) AS rw,
               COUNT(*) OVER (PARTITION BY lang, source) AS grp_n
        FROM d
    ), best AS (
        SELECT lang, source, grp_n, doc_id AS chosen_id, q AS chosen_q
        FROM r WHERE rb = 1
    ), worst AS (
        SELECT lang, source, doc_id AS rejected_id, q AS rejected_q
        FROM r WHERE rw = 1
    )
    SELECT b.lang, b.source, CAST(b.grp_n AS BIGINT) AS grp_n,
           b.chosen_id, b.chosen_q, w.rejected_id, w.rejected_q,
           ROUND(b.chosen_q - w.rejected_q, 6) AS margin
    FROM best b JOIN worst w ON w.lang = b.lang AND w.source = b.source
    WHERE b.chosen_id <> w.rejected_id
    ORDER BY b.lang, b.source
    """


@query(
    "llm_preference_pairs",
    oracle=_pref_oracle(),
    tags=("llm", "preference-pairs", "rlhf", "extension"),
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFERENCE-PAIR mining (round-8 — the DPO/RLHF data step after
    quality scoring: alignment training consumes (chosen, rejected)
    pairs, and at corpus scale they are MINED, not hand-labeled): per
    (lang, source) group, the highest- and lowest-quality documents
    under the composite quality score become the chosen/rejected pair,
    with the score margin — exactly the margin a DPO loss trains
    against.  Ties break to the lowest doc_id (a total order);
    single-document groups cannot form a pair and are excluded on
    both sides.

    Scale: one scan computes (group, quality) per doc; the pair pick
    is two WindowGroupLimit top-1 scans over scored ids — never the
    text — and groups fan out trivially to any cardinality."""
    from ..llm.text import quality_score, words

    d = (
        load(spark, sf_dir, "documents")
        .withColumn("toks", words("text"))
        .select("doc_id", "lang", "source", quality_score().alias("q"))
    )
    wb = Window.partitionBy("lang", "source").orderBy(F.desc("q"), F.asc("doc_id"))
    ww = Window.partitionBy("lang", "source").orderBy(F.asc("q"), F.asc("doc_id"))
    wn = Window.partitionBy("lang", "source")
    r = d.select(
        "lang",
        "source",
        "doc_id",
        "q",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
        F.count(F.lit(1)).over(wn).cast("long").alias("grp_n"),
    )
    best = r.filter(F.col("rb") == 1).select(
        "lang",
        "source",
        "grp_n",
        F.col("doc_id").alias("chosen_id"),
        F.col("q").alias("chosen_q"),
    )
    worst = r.filter(F.col("rw") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("q").alias("rejected_q"),
    )
    return (
        best.join(worst, ["lang", "source"])
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "lang",
            "source",
            "grp_n",
            "chosen_id",
            "chosen_q",
            "rejected_id",
            "rejected_q",
            F.round(F.col("chosen_q") - F.col("rejected_q"), 6).alias("margin"),
        )
        .orderBy("lang", "source")
    )


@query(
    "q_fk_integrity_audit",
    oracle="""
    SELECT 'customer->nation' AS fk_edge,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(DISTINCT c_nationkey) FROM customer)
                AS BIGINT) AS n_parents_hit,
           CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
                 FROM customer GROUP BY c_nationkey)) AS BIGINT)
               AS max_fanout
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)
                AS BIGINT),
           CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
                 FROM lineitem GROUP BY l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem)
                AS BIGINT),
           CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
                 FROM lineitem GROUP BY l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT),
           CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
                 FROM orders GROUP BY o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'supplier->nation',
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
           CAST((SELECT COUNT(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = s.s_nationkey))
                AS BIGINT),
           CAST((SELECT COUNT(DISTINCT s_nationkey) FROM supplier)
                AS BIGINT),
           CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
                 FROM supplier GROUP BY s_nationkey)) AS BIGINT)
    ORDER BY fk_edge
    """,
    tags=("quality", "referential-integrity", "extension"),
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENTIAL-INTEGRITY audit over the TPC-H-lite star (round-8 —
    the relationship half of the DQ surface: the expectations suite
    checks columns, this checks EDGES): for five FK relationships,
    the child row count, the orphan count (children whose parent key
    does not exist — LEFT ANTI against the parent's key set), the
    number of distinct parents actually referenced, and the maximum
    fan-out.  Orphans are expected to be zero; the audit PROVES it
    per edge rather than assuming it, and the fan-out column is the
    join-explosion early warning a planner wants before running the
    star join.

    Scale: each edge is one anti-join on the FK (parent side reduced
    to its key column — broadcastable for dims) plus one key-grouped
    count; edges are independent and union at the end."""
    edges = [
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, child, fk, parent, pk in edges:
        cdf = load(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        pdf = load(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        orphans = cdf.join(
            F.broadcast(pdf) if parent in ("nation", "part", "customer") else pdf,
            cdf["fk"] == pdf["pk"],
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        fan = cdf.groupBy("fk").agg(F.count(F.lit(1)).alias("cnt"))
        stats = cdf.agg(
            F.count(F.lit(1)).cast("long").alias("n_child")
        ).crossJoin(
            F.broadcast(
                fan.agg(
                    F.count(F.lit(1)).cast("long").alias("n_parents_hit"),
                    F.max("cnt").cast("long").alias("max_fanout"),
                )
            )
        )
        row = stats.crossJoin(F.broadcast(orphans)).select(
            F.lit(name).alias("fk_edge"),
            "n_child",
            "n_orphans",
            "n_parents_hit",
            "max_fanout",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")



#: Perceptual-hash fixture: 32x32 grayscale images of 16 flat 8x8
#: blocks; 25 base patterns (doc_id % 25) with a small per-doc
#: perturbation on the last block ((doc_id // 25) % 5) producing
#: near-duplicate variants whose aHash lands 0-1 bits from the base.
_PH_GROUPS = 25
_PH_NOISE = 5
_PH_HAM = 2  # near-bucket radius in hash bits


@query(
    "llm_phash_near_dup",
    oracle=f"""
    WITH blk AS (
        SELECT d.doc_id, r.b,
               CASE WHEN r.b = 15
                    THEN ((d.doc_id % {_PH_GROUPS}) * 53 + 15 * 67
                          + (d.doc_id // {_PH_GROUPS}) % {_PH_NOISE}) % 256
                    ELSE ((d.doc_id % {_PH_GROUPS}) * 53 + r.b * 67) % 256
               END AS v
        FROM documents d, range(0, 16) r(b)
    ), dec AS (
        SELECT doc_id, b,
               LEAST(255, GREATEST(0,
                   128 + CAST(ROUND(ROUND(8 * (v - 128) / 16.0) * 16 / 8.0)
                              AS INT))) AS dec
        FROM blk
    ), tot AS (
        SELECT doc_id, SUM(dec) AS s FROM dec GROUP BY doc_id
    ), ph AS (
        SELECT d.doc_id,
               CAST(SUM(CASE WHEN 16 * d.dec > t.s THEN 1 << d.b
                             ELSE 0 END) AS BIGINT) AS phash
        FROM dec d JOIN tot t USING (doc_id) GROUP BY d.doc_id
    ), bucket AS (
        SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM ph GROUP BY phash
    ), near AS (
        SELECT a.phash, CAST(COUNT(b.phash) AS BIGINT) AS n_near_buckets
        FROM bucket a LEFT JOIN bucket b
          ON b.phash <> a.phash
         AND bit_count(xor(a.phash, b.phash)) <= {_PH_HAM}
        GROUP BY a.phash
    )
    SELECT bucket.phash, bucket.n_docs, bucket.min_doc, bucket.max_doc,
           near.n_near_buckets, TRUE AS all_flat
    FROM bucket JOIN near USING (phash) ORDER BY phash
    """,
    tags=("llm", "multimodal", "perceptual-hash", "dedup", "extension"),
)
def llm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH image dedup through the REAL JPEG codec
    (round-8 — the multimodal member of the near-dup family: MinHash
    buckets text shingles, SimHash buckets term vectors, this buckets
    PIXELS, and unlike both it survives lossy compression because the
    hash is computed from DECODED output): each doc renders a 32×32
    grayscale image of 16 flat 8×8 blocks (25 base patterns + a small
    per-doc perturbation on one block — near-duplicate variants),
    encodes it to an actual JFIF stream and decodes it back
    (``llm/jpeg.py``), then computes the aHash — each block's mean
    against the global mean, compared in exact integers
    (16·block > Σblocks), one bit per block.  Equal hashes form dedup
    buckets; a bucket-level self-join counts neighbors within
    Hamming ≤ {_PH_HAM} (``bit_count(xor)``) — the candidate edges a
    full perceptual clustering would union.  The oracle recomputes
    every decoded block from the flat-block closed form
    (clamp(128 + round(round(8(v−128)/16)·16/8)), q00 = 16 Annex K)
    and the same integer bit rule — no codec, pure SQL — so the hash
    match proves encode→decode→hash lands exactly where the DCT math
    says it must.

    Scale: codec + hash are per-row mapInPandas CPU (zero shuffle);
    dedup shuffles 8-byte hashes, never pixels; the Hamming probe is
    bucket-cardinality quadratic, not document-quadratic — the same
    collapse MinHash banding buys text."""
    import pandas as _pd

    from ..llm import jpeg as _jpeg

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                g = did % _PH_GROUPS
                vals = [(g * 53 + b * 67) % 256 for b in range(16)]
                vals[15] = (g * 53 + 15 * 67 + (did // _PH_GROUPS) % _PH_NOISE) % 256
                px = bytearray(32 * 32)
                for b in range(16):
                    bx, by = b % 4, b // 4
                    for y in range(8):
                        row = (by * 8 + y) * 32 + bx * 8
                        px[row : row + 8] = bytes([vals[b]]) * 8
                blob = _jpeg.encode_jpeg(bytes(px), 32, 32)
                _w, _h, dec = _jpeg.decode_jpeg(blob)
                blocks = []
                flat = True
                for b in range(16):
                    bx, by = b % 4, b // 4
                    got = {
                        dec[(by * 8 + y) * 32 + bx * 8 + x]
                        for y in range(8)
                        for x in range(8)
                    }
                    flat = flat and len(got) == 1
                    blocks.append(next(iter(got)))
                s = sum(blocks)
                phash = sum(1 << b for b in range(16) if 16 * blocks[b] > s)
                rows.append((did, phash, flat))
            yield _pd.DataFrame(rows, columns=["doc_id", "phash", "all_flat"])

    d = load(spark, sf_dir, "documents").select("doc_id").repartition(fanout_partitions(spark))
    ph = d.mapInPandas(run, schema="doc_id long, phash long, all_flat boolean")
    bucket = ph.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.min("all_flat").alias("all_flat"),
    )
    a = bucket.select(F.col("phash"))
    near = (
        a.alias("x")
        .join(
            a.alias("y"),
            F.expr(
                f"x.phash <> y.phash AND "
                f"bit_count(x.phash ^ y.phash) <= {_PH_HAM}"
            ),
            "left",
        )
        .groupBy(F.col("x.phash").alias("phash"))
        .agg(F.count(F.col("y.phash")).cast("long").alias("n_near_buckets"))
    )
    return (
        bucket.join(near, "phash")
        .select(
            "phash", "n_docs", "min_doc", "max_doc", "n_near_buckets", "all_flat"
        )
        .orderBy("phash")
    )


def _cuped_oracle() -> str:
    from ..llm.datasets import hash_bucket_sql

    arm = hash_bucket_sql("user_id", "ab-v1", 2)
    return f"""
    WITH u AS (
        SELECT user_id, {arm} AS arm,
               ROUND(SUM(CASE WHEN day(ts) <= 10 THEN value ELSE 0 END), 6)
                   AS x,
               ROUND(SUM(CASE WHEN day(ts) > 10 THEN value ELSE 0 END), 6)
                   AS y
        FROM events GROUP BY user_id
    ), th AS (
        SELECT ROUND(COVAR_SAMP(x, y) / VAR_SAMP(x), 6) AS theta,
               ROUND(AVG(x), 6) AS mx
        FROM u
    ), adj AS (
        SELECT u.arm, u.y, ROUND(u.y - th.theta * (u.x - th.mx), 6) AS yc
        FROM u, th
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(y), 6) AS mean_y,
           ROUND(AVG(yc), 6) AS mean_y_cuped,
           ROUND(VAR_SAMP(yc) / VAR_SAMP(y), 6) AS var_ratio
    FROM adj GROUP BY arm ORDER BY arm
    """


@query(
    "q_cuped_variance_reduction",
    oracle=_cuped_oracle(),
    tags=("experimentation", "cuped", "variance-reduction", "extension"),
)
def q_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (round-8 — the experimentation-
    platform op the test-statistics family feeds into: Welch/MW tell
    you IF arms differ, CUPED makes the experiment SENSITIVE enough
    to tell sooner by regressing out pre-experiment behavior): each
    user's pre-period value total (days ≤ 10) is the covariate x, the
    experiment-period total the metric y, arms assigned by the
    engine-portable md5 bucket; θ = cov(x,y)/var(x) over all users,
    and the adjusted metric y − θ·(x − x̄) keeps each arm's mean
    estimate unbiased while shrinking its variance by the covariate's
    explained share — var_ratio per arm is the measured payoff.
    x, y, θ and the adjusted values are 6-dp-rounded at each stage so
    both engines fold bit-identical inputs.

    Scale: one partial-aggregated scan to per-user rows, a 1-row
    (θ, x̄) broadcast, one more partial aggregation per arm — CUPED at
    a billion users is exactly these three exchanges."""
    from ..llm.datasets import hash_bucket

    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.dayofmonth("ts") <= 10, F.col("value")).otherwise(0.0)),
            6,
        ).alias("x"),
        F.round(
            F.sum(F.when(F.dayofmonth("ts") > 10, F.col("value")).otherwise(0.0)),
            6,
        ).alias("y"),
    ).select(
        hash_bucket(F.col("user_id"), "ab-v1", 2).alias("arm"), "x", "y"
    )
    th = u.agg(
        F.round(F.covar_samp("x", "y") / F.var_samp("x"), 6).alias("theta"),
        F.round(F.avg("x"), 6).alias("mx"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "arm",
        "y",
        F.round(
            F.col("y") - F.col("theta") * (F.col("x") - F.col("mx")), 6
        ).alias("yc"),
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("y"), 6).alias("mean_y"),
            F.round(F.avg("yc"), 6).alias("mean_y_cuped"),
            F.round(F.var_samp("yc") / F.var_samp("y"), 6).alias("var_ratio"),
        )
        .orderBy("arm")
    )


#: SPRT design constants in INTEGER micro-log-likelihood units:
#: H0: p = 0.18 vs H1: p = 0.22 purchase share, alpha = beta = 0.05.
#: A = round(ln(p1/p0)*1e6), B = round(ln((1-p1)/(1-p0))*1e6),
#: U/L = Wald boundaries ln((1-b)/a), ln(b/(1-a)) in the same units —
#: pinning the test to integers makes every crossing comparison exact
#: in both engines (the walk is A*k + B*(t-k) over BIGINTs).
_SPRT_A = 200671
_SPRT_B = -50010
_SPRT_U = 2944439
_SPRT_L = -2944439


@query(
    "q_sprt_sequential_test",
    oracle=f"""
    WITH x AS (
        SELECT ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
        FROM events
    ), c AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS t,
               SUM(x) OVER (ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS k
        FROM x
    ), l AS (
        SELECT t, k, {_SPRT_A} * k + {_SPRT_B} * (t - k) AS llr FROM c
    ), fin AS (
        SELECT *,
               CASE WHEN llr >= {_SPRT_U} THEN 'accept_h1'
                    WHEN llr <= {_SPRT_L} THEN 'accept_h0' END AS d
        FROM l
    ), first_cross AS (
        SELECT * FROM fin WHERE d IS NOT NULL ORDER BY t LIMIT 1
    ), fallback AS (
        SELECT t, k, llr, 'undecided' AS d FROM l ORDER BY t DESC LIMIT 1
    ), pick AS (
        SELECT t, k, llr, d FROM first_cross
        UNION ALL
        SELECT t, k, llr, d FROM fallback
        WHERE NOT EXISTS (SELECT 1 FROM first_cross)
    )
    SELECT d AS decision,
           CAST(t AS BIGINT) AS n_at_decision,
           CAST(k AS BIGINT) AS conversions,
           CAST(llr AS BIGINT) AS llr_micro,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM x) AS n_total
    FROM pick
    """,
    tags=("experimentation", "sequential-test", "sprt", "extension"),
)
def q_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential test (round-8 — the EARLY-STOPPING member
    of the experimentation family: fixed-horizon tests (Welch, MW)
    read the whole sample, CUPED shrinks its variance, the SPRT stops
    the moment the evidence crosses a boundary): the event stream in
    time order is a Bernoulli walk (purchase or not); the
    log-likelihood ratio for H1: p=0.22 vs H0: p=0.18 advances by a
    constant per step, and the test decides at the FIRST crossing of
    the Wald boundaries (α = β = 0.05) — here after n_at_decision
    events, a tiny fraction of the corpus.  The whole walk is carried
    in INTEGER micro-log-units (constants pre-rounded once, the walk
    is A·k + B·(t−k) over BIGINTs), so the crossing row is exact on
    both engines — no float boundary anywhere.

    Scale: the cumulative walk is one ordered window per experiment
    key (global here for the single corpus-wide test; a platform
    partitions by experiment id) and the first-crossing pick is a
    top-1 sort — the sequential decision costs one scan of the
    PREFIX the test actually needed, which is the point of SPRT."""
    e = load(spark, sf_dir, "events")
    x = e.select(
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
    )
    w = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    l = x.select(
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("t"),
        F.sum("x").over(w).alias("k"),
    ).select(
        "t",
        "k",
        (
            F.lit(_SPRT_A) * F.col("k")
            + F.lit(_SPRT_B) * (F.col("t") - F.col("k"))
        ).alias("llr"),
    )
    fin = l.withColumn(
        "d",
        F.when(F.col("llr") >= _SPRT_U, F.lit("accept_h1")).when(
            F.col("llr") <= _SPRT_L, F.lit("accept_h0")
        ),
    )
    first_cross = fin.filter(F.col("d").isNotNull()).orderBy("t").limit(1)
    fallback = (
        l.orderBy(F.desc("t")).limit(1).withColumn("d", F.lit("undecided"))
    )
    n_cross = first_cross.agg(F.count(F.lit(1)).alias("nc"))
    pick = first_cross.select("t", "k", "llr", "d").unionByName(
        fallback.select("t", "k", "llr", "d")
        .crossJoin(F.broadcast(n_cross))
        .filter(F.col("nc") == 0)
        .drop("nc")
    )
    total = x.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return pick.crossJoin(F.broadcast(total)).select(
        F.col("d").alias("decision"),
        F.col("t").cast("long").alias("n_at_decision"),
        F.col("k").cast("long").alias("conversions"),
        F.col("llr").cast("long").alias("llr_micro"),
        "n_total",
    )
