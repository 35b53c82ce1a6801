"""TPC-H-style analytical queries over the driver's TPC-H-lite tables.

The reference is a single-fact-table system (trades), so SURVEY.md §2
has no multi-way star joins — but a 100 TB analytics engine lives or
dies on them, and the driver testdata deliberately ships the TPC-H-ish
dimension/fact set (region/nation/customer/supplier/part/orders/
lineitem). This module adapts the canonical TPC-H queries to the
shipped columns (no partsupp, no commit/receipt dates, no shipmode)
and keeps the load-bearing physical properties:

- dimensions broadcast (region/nation/supplier/part/customer all fit
  an executor at any realistic SF; `F.broadcast` pins the build side
  so the fact tables NEVER shuffle for a dim join);
- fact-side filters (date ranges, flags) sit on base columns so they
  reach the parquet scan as PushedFilters;
- joins chain smallest-first so AQE's runtime stats keep each
  intermediate under the next broadcast threshold;
- money math is rounded (round6) on both engines for hash stability.

Every query carries a DuckDB oracle running the same SQL shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round6
from ..tables import load
from .registry import query


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           ROUND(SUM(l_extendedprice), 6) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
               AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "aggregates", "extension"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan-heavy aggregate.
    One pass over lineitem, date predicate pushed to the scan, 6-group
    partial aggregation (map-side combine does ~all the work — the
    exchange moves 6 rows per map partition at any scale)."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round6(F.sum("l_quantity")).alias("sum_qty"),
            round6(F.sum("l_extendedprice")).alias("sum_base_price"),
            round6(F.sum(disc_price)).alias("sum_disc_price"),
            round6(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            round6(F.avg("l_quantity")).alias("avg_qty"),
            round6(F.avg("l_extendedprice")).alias("avg_price"),
            round6(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           o.o_orderdate AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (adapted: o_orderpriority for the
    missing o_shippriority). Build side = customers filtered to one
    segment, broadcast into orders; the surviving orders broadcast into
    lineitem — the fact table is scanned once with its shipdate filter
    pushed down and never shuffled before aggregation. Top-10 is
    TakeOrderedAndProject on the aggregated rows."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(
            F.broadcast(
                o.join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name AS n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: the 6-way star join. Every
    dimension chain (region→nation→supplier, region→nation→customer→
    orders) collapses into broadcasts; lineitem — the only table that
    matters at 100 TB — is scanned once, never shuffled, and the final
    exchange carries 25 nation rows. The c_nationkey = s_nationkey
    residual ("local supplier") rides the same broadcast join."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    co = o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(s.select("s_suppkey", "s_nationkey", "n_name")),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(co.select("o_orderkey", "c_nationkey")),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            round6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "scan", "extension"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure scan + conjunctive pushdown +
    global aggregate. All four predicates reach the parquet reader
    (PushedFilters), so row groups outside the date/discount/quantity
    ranges never decompress — the query is I/O-bound on exactly the
    surviving fraction at any scale."""
    l = load(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        round6(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           ROUND(c.c_acctbal, 6) AS c_acctbal,
           n.n_name AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: lineitem filtered to returns
    joins the (quarter-filtered orders × customer × nation) broadcast;
    one wide scan, one 20-row TakeOrdered. The returnflag equality and
    both date bounds are scan-level filters."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    co = o.join(
        F.broadcast(c.select("c_custkey", "c_name", "c_acctbal", "n_name")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        l.join(F.broadcast(co), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            round6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            round6(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: month-sliced lineitem broadcast-joins
    the part dimension; the promo share is a conditional-aggregation
    ratio-of-sums (one pass, no second scan for the denominator)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
           ROUND(o.o_totalprice, 6) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 6) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "joins", "having", "extension"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: a HAVING subquery (orders whose
    line quantities sum past a threshold) semi-filters orders, then the
    detail re-joins for the report. The big-order key set is an
    aggregate of keys only (8 bytes/row shuffle state) and broadcasts
    back into both orders and lineitem — the classic
    aggregate-then-semijoin shape that avoids sorting the fact table."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
        .select(F.col("l_orderkey").alias("_big_key"))
    )
    o = load(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("_big_key")
    )
    c = load(spark, sf_dir, "customer")
    oc = o.join(
        F.broadcast(c.select("c_custkey", "c_name")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        l.join(
            F.broadcast(
                oc.select(
                    "o_orderkey", "o_orderdate", "o_totalprice", "c_custkey", "c_name"
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(round6(F.sum("l_quantity")).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            round6(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order distribution: LEFT OUTER join (zero-order
    customers must survive with count 0 — COUNT(col) vs COUNT(*)
    semantics), then a second aggregation over the per-customer counts.
    The first aggregate shuffles on c_custkey; the distribution
    aggregate's input is one row per customer, and its key domain
    (distinct order counts) is tiny — partial aggregation collapses it
    map-side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q19",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under DISJUNCTIVE brand/size/quantity
    bands — the classic test of OR-predicate handling across a join.
    The disjunction references both sides, so it can only evaluate after
    the join; what CAN push down does: Catalyst derives the common
    denominators (the quantity envelope [1, 30] on lineitem's scan and
    the brand/size envelope on part's) so each side prunes before the
    broadcast join, and the exact disjunction filters the joined rows."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load(spark, sf_dir, "lineitem")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            round6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_rev AS total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "joins", "subquery", "extension"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the revenue "view" aggregates lineitem
    once per supplier, then self-references for its maximum. The
    supplier-cardinality aggregate is localCheckpointed so the MAX
    subquery and the final filter both read the materialized 8-byte-key
    rows instead of re-scanning the fact table; the 1-row MAX broadcasts
    back. Rounding happens BEFORE the max/equality on both engines, so
    the float compare is on identical bit patterns."""
    l = load(spark, sf_dir, "lineitem")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            round6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("total_rev")
        )
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 6) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("tpch", "subquery", "extension"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity revenue: a correlated scalar aggregate
    subquery (per-part average quantity), decorrelated by hand into the
    aggregate-then-join shape Catalyst would produce: both the probe
    side and the average side pre-restrict to the brand's parts via the
    same broadcast, so the per-part AVG aggregate runs over the
    brand-sliced fraction of lineitem — never the whole fact table —
    and joins back on the part key. Quantities are integral doubles, so
    sum/count are exact and the 0.2·avg threshold compares identically
    in both engines."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    l = load(spark, sf_dir, "lineitem")
    branded = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    avgq = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("_qty_cut")
    )
    return (
        branded.join(F.broadcast(avgq), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 6) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("tpch", "anti-join", "subquery", "extension"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (every customer here has SOME order, so the
    dormancy window replaces the no-orders-ever test): high-balance
    customers with no orders since 2000 — the global-average scalar
    subquery broadcasts as a 1-row frame, the NOT EXISTS becomes a
    LEFT ANTI join against the date-filtered order keys (the filter is
    pushed to orders' scan, so the anti side ships only recent 8-byte
    keys), and the report groups the survivors by segment."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    return (
        rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            round6(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 6) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer cu ON cu.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON cu.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 bilateral trade volume: two nation roles (supplier's
    vs customer's) resolved through two broadcast copies of the same
    dimension, with the either-direction pair disjunction applied
    after both roles attach. The supplier and customer chains both
    collapse into broadcasts; lineitem joins orders on the one real
    (key, key) shuffle pair only if AQE doesn't broadcast the
    date-sliced orders first — at this SF it does, leaving the fact
    scan unshuffled."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("_snk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")
    cu = load(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("_cnk"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("_cnk"),
    ).select("c_custkey", "cust_nation")
    o = load(spark, sf_dir, "orders").join(
        F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    l = load(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            round6(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS nation
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer cu ON cu.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON cu.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 market share: one nation's share of a region's import
    volume per year — a conditional-aggregation ratio over a 7-way
    join. Region restricts the CUSTOMER's nation; the SUPPLIER's
    nation feeds the numerator condition; both roles ride broadcast
    dimension chains and the share is a single ratio-of-conditional-
    sums aggregate (no second pass for the denominator)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = n.join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("_cnk"))
    cu = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("_cnk")
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").join(
        F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation"))
        ),
        F.col("s_nationkey") == F.col("_snk"),
    ).select("s_suppkey", "nation")
    l = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
