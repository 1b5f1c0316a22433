"""Core relational query inventory (SURVEY §2B/§2C relational surface).

Scan → filter → join → aggregate → window → set-op coverage over the
TPC-H-ish testdata, each with a DuckDB oracle. Plans are deliberately
Catalyst-friendly: filters sit on base tables (pushdown), dimension joins
broadcast, top-k goes through windows (partial top-k under AQE).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, disc_price, t

# DuckDB twin of _util.disc_price()
DISC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))"
)


# --------------------------------------------------------------------- Q1
@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({DISC_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({DISC_SQL} * (CAST(1 AS DECIMAL(8,2)) + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    charge = disc_price() * (F.lit(1).cast("decimal(8,2)") + dec("l_tax", 8, 2))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
        dbl(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
        dbl(F.sum(disc_price())).alias("sum_disc_price"),
        dbl(F.sum(charge)).alias("sum_charge"),
        (dbl(F.sum(dec("l_quantity"))) / F.count("*")).alias("avg_qty"),
        (dbl(F.sum(dec("l_extendedprice"))) / F.count("*")).alias("avg_price"),
        (dbl(F.sum(dec("l_discount"))) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------- Q3
@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({DISC_SQL}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------- Q5
@register(
    "q5_revenue_by_nation",
    f"""
    SELECT n_name, CAST(SUM({DISC_SQL}) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
    )


# ----------------------------------------------------------- distinct aggs
@register(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total"),
        )
    )


# ----------------------------------------------------------------- rollup
@register(
    "agg_rollup_region_nation",
    """
    SELECT r_name, n_name,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acctbal_total
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count("*").alias("n_customers"),
        dbl(F.sum(dec("c_acctbal"))).alias("acctbal_total"),
    ).select("r_name", "n_name", "g_region", "g_nation", "n_customers", "acctbal_total")


# ------------------------------------------------------------------- cube
@register(
    "agg_cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")
    )


# ---------------------------------------------------------- grouping sets
@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ------------------------------------------------------- window functions
@register(
    "window_running_total",
    """
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        dbl(F.sum(dec("o_totalprice")).over(wsum)).alias("running_total"),
    )


@register(
    "window_topk_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC,
                                         o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
    """,
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy(
        dec("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            dbl(dec("o_totalprice")).alias("totalprice"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "window_lag_order_gap",
    """
    SELECT o_custkey, o_orderkey,
           DATE_DIFF('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
)
def window_lag_order_gap(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    )


@register(
    "top1_customer_per_nation",
    """
    SELECT n_name, c_custkey, c_name,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
    FROM (
      SELECT n_name, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY CAST(c_acctbal AS DECIMAL(12,2)) DESC,
                                         c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    WHERE rn = 1
    """,
)
def top1_customer_per_nation(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(dec("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "c_custkey", "c_name", dbl(dec("c_acctbal")).alias("acctbal"))
    )


# ------------------------------------------------------- semi / anti joins
@register(
    "semi_join_urgent_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_unordered_parts",
    """
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def anti_join_unordered_parts(spark: SparkSession, sf_dir: str):
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem")
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


# ------------------------------------------------------------------ dedup
@register(
    "dedup_exact_projection",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem
    """,
)
def dedup_exact_projection(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_shipdate")
        .dropDuplicates()
    )


# ----------------------------------------------------------------- set ops
@register(
    "union_dedup_slices",
    """
    SELECT o_orderstatus, COUNT(*) AS n FROM (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      UNION
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    ) GROUP BY o_orderstatus
    """,
)
def union_dedup_slices(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderdate") < "1997-01-01").select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_orderdate") >= "1996-01-01").select("o_orderkey", "o_orderstatus")
    return (
        a.unionByName(b).dropDuplicates().groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    )


@register(
    "set_intersect_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect_customers(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except_customers(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT — set difference


# ------------------------------------------------------------- sort/limit
@register(
    "sort_limit_top_orders",
    """
    SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice
    FROM orders
    ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", dbl(dec("o_totalprice")).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ------------------------------------------------------------------ pivot
@register(
    "pivot_qty_by_status",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_final
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str):
    pivoted = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")))
    )
    return pivoted.select(
        "l_returnflag",
        dbl(F.col("O")).alias("qty_open"),
        dbl(F.col("F")).alias("qty_final"),
    )


# ----------------------------------------------------- Q4-style (EXISTS)
@register(
    "q4_priority_with_late_item",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_item(spark: SparkSession, sf_dir: str):
    """EXISTS-with-correlated-predicate → left-semi join (what Catalyst's
    RewritePredicateSubquery produces) — the decorrelated form of the
    reference's per-row existence probes (database.py:43-61) at TPC-H shape."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add("o_orderdate", 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# -------------------------------------------- Q7-style (two-dim volume)
@register(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(SUM({DISC_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str):
    """Fact-fact join chain with two broadcast dims; the nation pair filter
    lands on both dim sides BEFORE the join (pushdown), so the big join
    carries only the two nations' rows."""
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
    )


# ------------------------------------- Q17-style (correlated scalar agg)
@register(
    "q17_small_quantity_revenue",
    """
    WITH pavg AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / COUNT(*)) AS qty_cut
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem JOIN pavg USING (l_partkey)
    WHERE CAST(l_quantity AS DECIMAL(12,2)) < qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str):
    """Correlated scalar subquery decorrelated into an aggregate + self-join
    (Catalyst's own rewrite); the per-part average is exact-decimal so the
    0.2× cut is bit-identical across engines."""
    l = t(spark, sf_dir, "lineitem")
    pavg = l.groupBy("l_partkey").agg(
        (F.lit(0.2) * (dbl(F.sum(dec("l_quantity"))) / F.count("*"))).alias("qty_cut")
    )
    return (
        l.join(pavg, "l_partkey")
        .filter(dec("l_quantity") < F.col("qty_cut"))
        .agg((dbl(F.sum(dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"))
    )


# ------------------------------------- partition pruning (§1.4 mapping)
@register(
    "partitioned_scan_prune",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def partitioned_scan_prune(spark: SparkSession, sf_dir: str):
    """The reference's six per-category tables (database.py:244-278) become
    ONE table partitioned by the category column; the IN-filter then prunes
    partitions at planning time (PartitionFilters in the scan) instead of
    dispatching to separate tables."""
    import tempfile

    from ..catalog.io import write_partitioned

    path = tempfile.mkdtemp(prefix="part_prune_") + "/orders_by_priority"
    write_partitioned(
        t(spark, sf_dir, "orders"), path, partition_by=["o_orderpriority"]
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dbl(F.sum(dec("o_totalprice", 14, 2))).alias("total"),
        )
    )


# ------------------------------------------ bucketed co-located join


@register(
    "bucketed_join_no_shuffle",
    f"""
    SELECT o_orderpriority,
           CAST(SUM({DISC_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_no_shuffle(spark: SparkSession, sf_dir: str):
    """Fact-fact join with BOTH sides bucketed on the join key: the join
    runs with zero Exchange (verified by tests/test_plans) — at 100 TB this
    is the difference between re-shuffling the fact table per query and
    reading co-located buckets. Bucket count 8 stands in for the ~2k you'd
    use on a cluster."""
    import glob
    import shutil
    import uuid

    # sweep bucket tables left by previous processes (uuid names mean the
    # in-memory catalog of a fresh session doesn't know about their dirs)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
        "file:", ""
    )
    for old in glob.glob(f"{warehouse}/li_bkt_*") + glob.glob(f"{warehouse}/od_bkt_*"):
        shutil.rmtree(old, ignore_errors=True)
    tag = uuid.uuid4().hex[:8]
    li, od = f"li_bkt_{tag}", f"od_bkt_{tag}"
    for name in (li, od):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li)
    )
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(od)
    )
    return (
        spark.table(li)
        # hint("merge"): at test SF the orders side fits the broadcast
        # threshold and Catalyst would broadcast, hiding the property this
        # query demonstrates; at production SF sort-merge-on-buckets is the
        # strategy Catalyst picks anyway.
        .join(
            spark.table(od).hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            dbl(F.sum(disc_price())).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ------------------------------------------------------------- unpivot
@register(
    "unpivot_lineitem_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(12,2)) AS quantity,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
             CAST(l_tax AS DECIMAL(12,2)) AS tax
      FROM lineitem WHERE l_orderkey % 50 = 0)
    UNPIVOT (val FOR measure IN (quantity, price, tax))
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str):
    l = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            dec("l_quantity").alias("quantity"),
            dec("l_extendedprice").alias("price"),
            dec("l_tax").alias("tax"),
        )
    )
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "price", "tax"],
        "measure",
        "val",
    ).withColumn("val", dbl(F.col("val")))


# ----------------------------------------------------------- percentiles
@register(
    "agg_percentiles_by_flag",
    """
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS DECIMAL(12,2)), 0.5) AS p50_qty,
           quantile_cont(CAST(l_quantity AS DECIMAL(12,2)), 0.9) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles_by_flag(spark: SparkSession, sf_dir: str):
    """Exact percentiles (linear interpolation) — both engines sort exact
    decimals and interpolate in double, so the result hashes equal."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile(dec("l_quantity"), 0.5).alias("p50_qty"),
        F.percentile(dec("l_quantity"), 0.9).alias("p90_qty"),
    )


# -------------------------------------------------- multiset set ops
@register(
    "set_exceptall_lineitems",
    """
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_exceptall_lineitems(spark: SparkSession, sf_dir: str):
    """EXCEPT ALL — bag difference with multiplicity (each occurrence in the
    right side cancels one on the left), vs set_except's DISTINCT form."""
    l = t(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    b = l.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(b)


@register(
    "set_intersectall_lineitems",
    """
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersectall_lineitems(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    b = l.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(b)


# ---------------------------------------------------- map-type functions
@register(
    "map_type_entries",
    """
    SELECT o_orderkey, 'priority' AS key, o_orderpriority AS value
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey, 'status' AS key, o_orderstatus AS value
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def map_type_entries(spark: SparkSession, sf_dir: str):
    """MapType construction + element access + entry explosion — the map
    function family (create_map / element_at / explode over entries)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    m = o.select(
        "o_orderkey",
        F.create_map(
            F.lit("priority"), F.col("o_orderpriority"),
            F.lit("status"), F.col("o_orderstatus"),
        ).alias("props"),
    )
    return m.select("o_orderkey", F.explode("props").alias("key", "value"))


# --------------------------------------------------- string function suite
@register(
    "string_functions",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_pad,
           translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
           reverse(p_name) AS name_rev,
           substr(p_name, 3, 8) AS name_mid,
           replace(p_type, ' ', '_') AS type_us,
           split_part(p_type, ' ', 1) AS type_head,
           length(p_name) AS name_len,
           strpos(p_type, 'D') AS d_pos,
           upper(p_brand) || '-' || lower(p_type) AS combo
    FROM part WHERE p_partkey % 25 = 0
    """,
)
def string_functions(spark: SparkSession, sf_dir: str):
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_tr"),
        F.reverse("p_name").alias("name_rev"),
        F.substring("p_name", 3, 8).alias("name_mid"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_type"), "D").alias("d_pos"),
        F.concat(F.upper("p_brand"), F.lit("-"), F.lower("p_type")).alias("combo"),
    )


# ---------------------------------------- Q10-style returned-item report
@register(
    "q10_returned_item_revenue",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({DISC_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dbl(F.sum(disc_price())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# -------------------------------- Q19-style disjunctive predicate pushdown
@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT CAST(SUM({DISC_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND CAST(l_quantity AS DECIMAL(12,2)) >= 1
           AND CAST(l_quantity AS DECIMAL(12,2)) <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND CAST(l_quantity AS DECIMAL(12,2)) >= 5
           AND CAST(l_quantity AS DECIMAL(12,2)) <= 40)
       OR (p_type LIKE '%ECO%' AND p_size > 20)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str):
    """Disjunction of conjunctive branches across both join sides — Catalyst
    pushes the per-table residuals of the OR below the join where legal."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    qty = dec("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (qty >= 1)
            & (qty <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (qty >= 5)
            & (qty <= 40)
        )
        | (F.col("p_type").like("%ECO%") & (F.col("p_size") > 20))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dbl(F.sum(disc_price())).alias("revenue"), F.count("*").alias("n"))
    )


# ------------------------------------- Q22-style NOT EXISTS (anti join)
@register(
    "q22_idle_customers",
    """
    SELECT substr(c_name, 18, 1) AS name_digit,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > 0
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY name_digit
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str):
    """NOT EXISTS → left-anti join: positive-balance customers with no
    urgent order (the reference's idempotent source-skip A16 at TPC-H
    shape)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.withColumn("name_digit", F.substring("c_name", 18, 1))
        .groupBy("name_digit")
        .agg(
            F.count("*").alias("n_custs"),
            dbl(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
    )


# ----------------------------------------- analytic window function suite
@register(
    "window_analytic_suite",
    """
    SELECT o_orderkey, o_orderpriority,
           ntile(4)       OVER w AS price_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           nth_value(o_orderkey, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS third_key,
           first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS cheapest_key,
           last_value(o_orderkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_analytic_suite(spark: SparkSession, sf_dir: str):
    """The analytic-window battery missing from the ranking suite: ntile,
    percent_rank, cume_dist, nth_value, first/last over explicit frames.
    The (o_totalprice, o_orderkey) sort is tie-free, so every function is
    deterministic across engines."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 3).over(w_run).alias("third_key"),
        F.first("o_orderkey").over(w_full).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"),
    )


# ------------------------------------------------------- map HOF suite
@register(
    "map_hof_suite",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 100 = 0),
    ent AS (
      SELECT o_orderkey, t.k, t.v
      FROM base CROSS JOIN LATERAL
           (VALUES ('price', cents), ('key', o_orderkey), ('cust', o_custkey))
             AS t(k, v)),
    kept AS (SELECT o_orderkey, k, v * 2 AS v FROM ent WHERE v % 2 = 0)
    SELECT o_orderkey, k, v FROM kept
    UNION ALL
    SELECT o_orderkey, 'norig' AS k, 3 AS v FROM base
    """,
)
def map_hof_suite(spark: SparkSession, sf_dir: str):
    """Map higher-order functions composed end-to-end: create_map →
    map_filter (keep even values) → transform_values (double) → map_concat
    (append a cardinality entry) → explode back to rows. The oracle mirrors
    the semantics with plain relational ops over the entry set — exactly
    what the HOFs compute, minus the MapType container."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    cents = (dec("o_totalprice") * 100).cast("long")
    m = F.create_map(
        F.lit("price"), cents,
        F.lit("key"), F.col("o_orderkey"),
        F.lit("cust"), F.col("o_custkey"),
    )
    kept = F.map_filter(m, lambda k, v: v % 2 == 0)
    final = F.map_concat(
        F.transform_values(kept, lambda k, v: v * 2),
        F.create_map(F.lit("norig"), F.size(m).cast("long")),
    )
    return o.select("o_orderkey", F.explode(final).alias("k", "v"))


# ------------------------------------------------ SQL API surface parity
_SQL_SURFACE = """
    WITH rev AS (
      SELECT n_name, r_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                  AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY n_name, r_name)
    SELECT r_name, n_name, revenue,
           RANK() OVER (PARTITION BY r_name ORDER BY revenue DESC, n_name) AS rnk
    FROM rev
"""


@register("sql_api_rank_revenue", _SQL_SURFACE)
def sql_api_rank_revenue(spark: SparkSession, sf_dir: str):
    """The engine's SQL surface end-to-end: tables registered as temp views,
    the query text handed to spark.sql — CTE, 5-table join, windowed rank —
    and the ORACLE IS THE SAME STRING (both dialects parse it). Proves a
    reference user can bring plain ANSI SQL instead of the DataFrame API."""
    for name in ("lineitem", "orders", "customer", "nation", "region"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_SURFACE)


# -------------------------------------------------- min_by/max_by (A23)
@register(
    "agg_min_max_by",
    """
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str):
    """A23's argmin/argmax as AGGREGATES (max_by/min_by ↔ DuckDB
    arg_max/arg_min) — the no-window form of top-1-per-group: one partial
    agg, no sort, no row_number."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


# ------------------------------------------- grouping_id over rollup
@register(
    "agg_grouping_id",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str):
    """ROLLUP with GROUPING() flags — the bit that disambiguates 'NULL
    because subtotal' from 'NULL because the data was NULL', which any
    report consuming rollup output needs."""
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count("*").alias("n"),
    )


# -------------------------------------------- date spine gap detection
@register(
    "events_hour_gaps",
    """
    WITH bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS d0,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS d1
      FROM events),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS hour
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT hour, event_type FROM spine CROSS JOIN types),
    present AS (
      SELECT DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             event_type
      FROM events)
    SELECT g.hour, g.event_type
    FROM grid g LEFT JOIN present p
      ON g.hour = p.hour AND g.event_type = p.event_type
    WHERE p.hour IS NULL
    """,
)
def events_hour_gaps(spark: SparkSession, sf_dir: str):
    """Continuity audit on a time series: a generated hour spine × the
    event-type dimension, anti-joined against observed activity — the
    hours a monitoring pipeline would flag as silent. sequence() builds
    the spine from the aggregated bounds; no calendar table needed."""
    e = t(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("d0"),
        F.date_trunc("hour", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = e.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    present = e.select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).distinct()
    return grid.join(present, ["hour", "event_type"], "left_anti")


# ----------------------------------------------- pivot with multiple aggs
@register(
    "pivot_multi_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS o_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS o_n,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS f_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS f_n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str):
    """Pivot with MULTIPLE aggregates per pivot value (sum + count) —
    Spark names the output columns {value}_{alias}; the oracle is the
    equivalent conditional-aggregation spread."""
    pivoted = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.sum(dec("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # coalesce counts to 0: Spark's pivot yields NULL for an absent
    # (flag,status) cell where the conditional-aggregation oracle yields 0.
    return pivoted.select(
        "l_returnflag",
        dbl(F.col("O_qty")).alias("o_qty"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("o_n"),
        dbl(F.col("F_qty")).alias("f_qty"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("f_n"),
    )


# ----------------------------------- correlation from exact decimal sums
@register(
    "agg_corr_from_sums",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
           (sxy - sx * sy / n)
           / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
             AS corr_qty_price
    FROM s
    """,
)
def agg_corr_from_sums(spark: SparkSession, sf_dir: str):
    """Covariance/correlation the parity-safe way: built-in corr()/covar()
    accumulate in doubles whose summation order differs per engine and per
    partitioning; here the five moments accumulate in EXACT decimal (any
    order, same sums), and the covariance/correlation formulas run as a
    fixed IEEE expression on identical operands. Same pattern as the
    rolling variance, at aggregate granularity."""
    l = t(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dbl(F.sum(x)).alias("sx"),
        dbl(F.sum(y)).alias("sy"),
        dbl(F.sum(x * y)).alias("sxy"),
        dbl(F.sum(x * x)).alias("sxx"),
        dbl(F.sum(y * y)).alias("syy"),
    )
    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / n)
        * F.sqrt(F.col("syy") - F.col("sy") * F.col("sy") / n)
    )
    return s.select(
        "l_returnflag",
        "n",
        cov.alias("covar_qty_price"),
        corr.alias("corr_qty_price"),
    )
