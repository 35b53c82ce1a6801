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


# ---------------------------------------------------------------------------
# Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21 — the eight queries whose canonical forms
# need columns the driver testdata doesn't ship (partsupp, ps_supplycost/
# ps_availqty, l_commitdate/l_receiptdate, l_shipmode).  Each is adapted to
# the shipped columns while preserving the canonical PLAN SHAPE the query
# exists to exercise: Q2's correlated-min subquery, Q4's EXISTS semi-join,
# Q9's LIKE-filtered 5-way profit join, Q11's HAVING-vs-global-scalar,
# Q12's conditional mode split, Q16's NOT IN + COUNT(DISTINCT), Q20's
# nested-IN chain, Q21's EXISTS ∧ NOT EXISTS double correlation.  The
# partsupp relation is derived as DISTINCT (l_partkey, l_suppkey) from
# lineitem; "supply cost" is the pair's minimum observed unit price.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal AS s_acctbal, s.s_name AS s_name, n.n_name AS n_name,
           p.p_partkey AS p_partkey, p.p_name AS p_name,
           ROUND(ps.unit_cost, 6) AS min_cost
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_name LIKE '%ring'
      AND r.r_name = 'EUROPE'
      AND ps.unit_cost = (
          SELECT MIN(ps2.unit_cost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "joins", "subquery", "extension"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier.  partsupp is derived from the fact
    table (one groupBy over lineitem — the only full-fact shuffle here);
    supply cost is the pair's minimum unit price.  The correlated
    "= (SELECT MIN ...)" subquery is decorrelated into a window MIN over
    the region-eligible pairs partitioned by part — the same shape
    Catalyst rewrites the SQL form into — so the per-part minimum costs
    one extra exchange over the already-small eligible set, never a
    re-scan of lineitem.  Dimension chain (supplier→nation→region) and
    the size/name-filtered part list both ride broadcasts.  The ORDER BY
    carries (s_name, p_partkey) so the LIMIT boundary is total-ordered
    and deterministic across engines."""
    from pyspark.sql import Window

    l = load(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & F.col("p_name").like("%ring"))
        .select("p_partkey", "p_name")
    )
    eligible = (
        ps.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("_mn", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_mn"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            round6(F.col("unit_cost")).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "joins", "subquery", "extension"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority check.  The canonical late-lineitem EXISTS
    (l_commitdate < l_receiptdate — columns not shipped) becomes an
    EXISTS over returned lineitems (l_returnflag = 'R'): the load-bearing
    shape is the correlated EXISTS → LEFT SEMI join, which deduplicates
    order keys inside the join instead of a DISTINCT afterwards.  The
    quarter predicate prunes orders at its scan; the semi-join probe side
    carries only l_orderkey, so the exchange moves 8 bytes per matching
    line at any scale."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 6) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - p.p_retailprice * l.l_quantity / 100.0 AS amount
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%widget'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit.  Supply cost (ps_supplycost not
    shipped) is proxied as 1% of the part's retail price per unit, which
    keeps the canonical profit expression referencing THREE tables'
    columns post-join.  The LIKE-filtered part list and the
    supplier→nation chain broadcast, so lineitem reaches the orders join
    already sliced to the ~1/8 of rows matching the part filter; that
    orders join is the query's one real key-to-key exchange (orders
    carries only (orderkey, year)), and AQE is free to flip it to
    broadcast when the slice is small enough."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") / F.lit(100.0)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(round6(F.sum(amount)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey AS l_partkey,
               SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                   * CAST(l.l_quantity AS BIGINT)) AS value_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(value_cents AS BIGINT) AS part_value_cents
    FROM val
    WHERE value_cents * (SELECT COUNT(*) FROM val)
          > 2 * (SELECT CAST(SUM(value_cents) AS BIGINT) FROM val)
    ORDER BY part_value_cents DESC, p_partkey
    """,
    tags=("tpch", "subquery", "extension"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock.  Stock value (ps_supplycost ×
    ps_availqty not shipped) is the part's total extendedprice·quantity
    over one nation's suppliers, in EXACT integer cents — the repo's
    micro-unit discipline (queries/windows.py) — so the HAVING-vs-global
    -scalar comparison (value > 2× the mean part value, expressed as
    value·n_parts > 2·total so the fraction self-scales with SF like the
    canonical 0.0001/SF) is bit-deterministic across engines instead of
    hanging on float accumulation order.  Shape: one nation-sliced
    aggregate over the fact, a 1-row global sum broadcast back via
    crossJoin, and the threshold filter — the canonical
    aggregate/scalar-subquery plan with no second fact scan
    (localCheckpoint materializes the per-part aggregate for both
    consumers)."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    l = load(spark, sf_dir, "lineitem")
    cents = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.col("l_quantity").cast("long")
    )
    val = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
        .localCheckpoint()
    )
    total = val.agg(
        F.sum("value_cents").alias("_total"), F.count("*").alias("_nparts")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("_nparts") > 2 * F.col("_total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_cents").alias("part_value_cents"),
        )
        .orderBy(F.col("part_value_cents").desc(), "p_partkey")
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus AS l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("tpch", "joins", "extension"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority split.  l_shipmode isn't shipped,
    so the grouping dimension is l_linestatus — the load-bearing shape is
    unchanged: a year-sliced fact scan joining orders, with the
    URGENT/HIGH split computed as two conditional sums in ONE aggregate
    pass (no per-priority re-scan).  The ship-date range is a pushed scan
    predicate; the join moves only (orderkey, priority)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_name NOT LIKE 'blue%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "joins", "subquery", "extension"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship.  partsupp := DISTINCT
    (l_partkey, l_suppkey); the "customer complaints" exclusion becomes
    suppliers with negative account balance.  Shape preserved exactly:
    a NOT IN over a non-null key column compiles to a LEFT ANTI join
    (broadcast — the exclusion list is tiny), the brand/name/size
    predicates prune part before ITS broadcast, and COUNT(DISTINCT
    suppkey) per (brand, type, size) is the one exchange, keyed on the
    output grouping."""
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("_bad"))
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & ~F.col("p_name").like("blue%")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("_bad"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q20",
    oracle="""
    SELECT s.s_name AS s_name, ROUND(s.s_acctbal, 6) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'AFRICA'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey FROM lineitem l
          WHERE l.l_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'hot%')
            AND l.l_shipdate >= TIMESTAMP '1998-01-01'
            AND l.l_shipdate < TIMESTAMP '1999-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(l.l_quantity) > 30
      )
    ORDER BY s_name
    """,
    tags=("tpch", "joins", "subquery", "extension"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion.  The availqty threshold (not
    shipped) becomes a shipped-quantity threshold: suppliers who moved
    > 30 units of some 'hot%' part in 1998.  The canonical nested-IN
    chain is preserved as its decorrelated plan: part-name filter →
    broadcast semi onto the year-sliced fact, a (suppkey, partkey)
    HAVING aggregate, then a LEFT SEMI from supplier into the qualifying
    keys, with the nation→region chain broadcast.  Quantities are
    integral doubles, so the HAVING sum is exact on both engines."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("hot%"))
        .select("p_partkey")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    qualifying = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 30)
        .select("l_suppkey")
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", round6(F.col("s_acctbal")).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R' AND o.o_orderstatus = 'F'
    )
    SELECT s.s_name AS s_name, COUNT(*) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_4'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "joins", "subquery", "extension"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting.  The late-delivery
    predicate (receipt/commit dates not shipped) becomes l_returnflag =
    'R': count, per NATION_4 supplier, the returned lines in finished
    multi-supplier orders where THIS supplier was the only one with a
    return — the double correlation (EXISTS another-supplier line ∧ NOT
    EXISTS another-supplier returned line) compiles to a LEFT SEMI plus
    a LEFT ANTI join, each on the order key with the supplier-inequality
    residual evaluated inside the join.  Both probe sides project two
    8-byte keys; the anti side pre-filters to returned lines only."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l = load(spark, sf_dir, "lineitem")
    l1 = (
        l.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3"))
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("_ok2"))
            & (F.col("l_suppkey") != F.col("_sk2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("_ok3"))
            & (F.col("l_suppkey") != F.col("_sk3")),
            "left_anti",
        )
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
