"""Deeper TPC-H-style relational coverage (SURVEY §2C relational surface).

The remaining TPC-H query shapes directly expressible on the driver
testdata (Q2/Q9/Q11/Q16/Q20 — blocked here by the missing ``partsupp``
table — and a shipmode-free Q12 live in ``round7_ops.py`` over a derived
partsupp dimension, completing the 22-query surface; Q22 lives in
core_relational as ``q22_idle_customers``): Q6
forecast-revenue scan-agg, Q8 market-share with a dimension self-join, Q13
outer-join count distribution, Q14 promo share, Q15 view + max-equality
top supplier, Q18 HAVING-subquery large orders, and a Q21-style
"only late supplier on a multi-supplier order" double-correlation, done
with a single-shuffle window formulation instead of the textbook
EXISTS/NOT-EXISTS re-joins.

Reference parity: the reference has no relational query surface beyond
conjunctive SELECTs (grover-dev/rad-database-parse database.py:43-61);
this module is north-star analytics breadth on the same engine core.

Float parity follows registry/__init__.py policy: money in DECIMAL until
the final division/cast, tie-breaks on keys.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, disc_price, t
from .core_relational import DISC_SQL


# --------------------------------------------------------------------- Q6
@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
      AND CAST(l_quantity AS DECIMAL(12,2)) < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str):
    """Pure scan-side query: every predicate pushes to the parquet scan,
    aggregation is a single partial+final sum with no shuffle of note."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & dec("l_discount").between(0.05, 0.07)
        & (dec("l_quantity") < 24)
    )
    return l.agg(
        dbl(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------- Q8
@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
           CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             {DISC_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) shares
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str):
    """Market share of one supplier nation per order-year: 8-table join
    with a nation self-join (customer side vs supplier side). Dimension
    sides broadcast; the lineitem-orders join is the only big shuffle.
    Decimal sums, double division at the end (parity policy)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_n_key"), F.col("n_regionkey").alias("c_r_key")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_n_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_n_key"))
        .join(F.broadcast(r), F.col("c_r_key") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_n_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            disc_price().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                dbl(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3", F.col("volume")
                        ).otherwise(zero)
                    )
                )
                / dbl(F.sum("volume"))
            ).alias("mkt_share")
        )
    )


# -------------------------------------------------------------------- Q13
@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str):
    """Left-outer join with an extra join-side predicate, then a two-level
    aggregation (orders-per-customer, then customers-per-count). COUNT of
    the nullable key keeps the zero-order customers."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# -------------------------------------------------------------------- Q14
@register(
    "q14_promo_revenue_share",
    f"""
    SELECT CAST(100 AS DOUBLE) *
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_SQL}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
           CAST(SUM({DISC_SQL}) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str):
    """Conditional-aggregate ratio over a month of shipments; part side
    broadcasts, the shipdate range prunes the scan."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * dbl(
                    F.sum(
                        F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(
                            zero
                        )
                    )
                )
                / dbl(F.sum(disc_price()))
            ).alias("promo_share")
        )
    )


# -------------------------------------------------------------------- Q15
@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({DISC_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str):
    """The view-based max-equality top-1: revenue per supplier over a
    quarter, keep suppliers tied at the maximum. The max-equality compare
    happens in exact DECIMAL (bit-stable across engines); the scalar max
    comes back via a broadcast cross join, not a driver collect."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = t(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", dbl(F.col("total_rev")).alias("total_revenue"))
    )


# -------------------------------------------------------------------- Q18
@register(
    "q18_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS total_qty
    FROM orders JOIN big ON o_orderkey = l_orderkey
                JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str):
    """HAVING-subquery shape: pre-aggregate lineitem per order, keep the
    >300-unit orders, enrich with orders+customer. The aggregate IS the
    join input (no second lineitem pass), and the global top-20 becomes
    TakeOrderedAndProject."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            dbl(F.col("sum_qty")).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# -------------------------------------------------- Q21-style sole-late supplier
@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str):
    """Q21's double correlation (EXISTS another supplier / NOT EXISTS
    another LATE supplier) — no commit/receipt dates in this testdata, so
    "late" is shipping >60 days after the order date. Instead of the
    textbook two extra lineitem self-joins, per-order supplier sets come
    from ONE window over the already-joined rows (collect_set over the
    orderkey partition): a single shuffle, no re-scan — the formulation
    that survives a 100× lineitem."""
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    j = l.join(o, l.l_orderkey == o.o_orderkey).withColumn("is_late", late)
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w))).withColumn(
        "n_late",
        F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
    )
    return (
        j.filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )
