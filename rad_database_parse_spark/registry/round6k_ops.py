"""Round-6k operators: acquisition analytics, chained price indexing,
and functional-dependency profiling — the three ops that complete the
round-8 driver window at exactly 50.

Same parity contract as the rest of the registry."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. customer_acquisition_pace — new customers per month
# ------------------------------------------------------------------


@register(
    "customer_acquisition_pace",
    """
    WITH first_m AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS ym
      FROM orders GROUP BY o_custkey),
    pace AS (
      SELECT ym, COUNT(*) AS new_customers
      FROM first_m GROUP BY ym)
    SELECT CAST(a.ym // 12 AS INT) AS year,
           CAST(1 + a.ym % 12 AS INT) AS month_in_year,
           CAST(a.new_customers AS BIGINT) AS new_customers,
           CAST(SUM(b.new_customers) AS BIGINT) AS cumulative_customers
    FROM pace a JOIN pace b ON b.ym <= a.ym
    GROUP BY a.ym, a.new_customers
    ORDER BY year, month_in_year
    """,
)
def customer_acquisition_pace(spark: SparkSession, sf_dir: str):
    """Customer acquisition pace — first-ever-order counts per month
    with the cumulative customer base alongside: the top line of every
    growth dashboard and the denominator behind CAC (the orders-side
    acquisition view, where events_growth_accounting tracks behavioral
    activity states). First-order month is one custkey groupBy (MIN of
    the zero-based integer month); the pace table is month grain, so
    the cumulative stage is a calendar-bounded band self-join, never a
    fact-row window. All integers end-to-end."""
    o = t(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.min(
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("ym")
    )
    pace = first_m.groupBy("ym").agg(
        F.count("*").alias("new_customers")
    )
    a = pace.select("ym", "new_customers")
    b = pace.select(
        F.col("ym").alias("ym_b"),
        F.col("new_customers").alias("nc_b"),
    )
    return (
        a.join(F.broadcast(b), F.col("ym_b") <= F.col("ym"))
        .groupBy("ym", "new_customers")
        .agg(
            F.sum("nc_b").cast("bigint").alias("cumulative_customers")
        )
        .select(
            F.expr("CAST(ym div 12 AS INT)").alias("year"),
            (1 + F.col("ym") % 12).cast("int").alias("month_in_year"),
            F.col("new_customers").cast("bigint"),
            "cumulative_customers",
        )
        .orderBy("year", "month_in_year")
    )


# ------------------------------------------------------------------
# 2. part_chained_price_index — chained monthly price index
# ------------------------------------------------------------------


@register(
    "part_chained_price_index",
    """
    WITH m AS (
      SELECT (year(l_shipdate) * 12 + month(l_shipdate) - 1) AS ym,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * 100)
                  AS BIGINT) AS rev_cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1),
    price AS (
      SELECT ym,
             CAST(round(CAST(rev_cents AS DOUBLE) / qty * 10000)
                  AS BIGINT) AS p_e4
      FROM m WHERE qty > 0),
    links AS (
      SELECT a.ym,
             CAST(round(ln(CAST(a.p_e4 AS DOUBLE) / b.p_e4) * 1000000)
                  AS BIGINT) AS lnlink_micro
      FROM price a JOIN price b ON b.ym = a.ym - 1),
    chained AS (
      SELECT a.ym, SUM(b.lnlink_micro) AS cum_ln_micro
      FROM links a JOIN links b ON b.ym <= a.ym
      GROUP BY a.ym)
    SELECT CAST(ym // 12 AS INT) AS year,
           CAST(1 + ym % 12 AS INT) AS month_in_year,
           CAST(cum_ln_micro AS BIGINT) AS cum_ln_micro,
           round(exp(cum_ln_micro / 1e6), 6) AS chained_index
    FROM chained ORDER BY year, month_in_year
    """,
)
def part_chained_price_index(spark: SparkSession, sf_dir: str):
    """Chained monthly unit-price index — the economics-bureau recipe
    (each month's link is the price relative to the PREVIOUS month;
    the index is the cumulative product of links) that tracks drifting
    baskets where a fixed-base index (part_laspeyres_price_index /
    part_fisher_price_index) goes stale. Unit prices are rounded
    ratios of exact integer revenue/quantity; each ln(link) quantizes
    to exact integer micro-units so the cumulative product becomes a
    cumulative SUM of integers (a calendar-bounded band self-join, no
    float running product, no window over fact rows); the single exp
    at the end acts on identical doubles in both engines and is
    rounded well inside its ulp. Month grain bounds every stage after
    the one fact groupBy."""
    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (
            F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
        ).alias("ym")
    ).agg(
        F.sum((dec("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    price = m.filter(F.col("qty") > 0).select(
        "ym",
        F.round(
            F.col("rev_cents").cast("double") / F.col("qty") * 10000
        )
        .cast("bigint")
        .alias("p_e4"),
    )
    pa = price.select("ym", F.col("p_e4").alias("pa"))
    pb = price.select(
        (F.col("ym") + 1).alias("ym"), F.col("p_e4").alias("pb")
    )
    links = pa.join(F.broadcast(pb), "ym").select(
        "ym",
        F.round(
            F.log(F.col("pa").cast("double") / F.col("pb")) * 1_000_000
        )
        .cast("bigint")
        .alias("lnlink_micro"),
    )
    la = links.select("ym")
    lb = links.select(
        F.col("ym").alias("ym_b"), F.col("lnlink_micro").alias("lm_b")
    )
    chained = (
        la.join(F.broadcast(lb), F.col("ym_b") <= F.col("ym"))
        .groupBy("ym")
        .agg(F.sum("lm_b").cast("bigint").alias("cum_ln_micro"))
    )
    return chained.select(
        F.expr("CAST(ym div 12 AS INT)").alias("year"),
        (1 + F.col("ym") % 12).cast("int").alias("month_in_year"),
        "cum_ln_micro",
        F.round(F.exp(F.col("cum_ln_micro") / 1e6), 6).alias(
            "chained_index"
        ),
    ).orderBy("year", "month_in_year")


# ------------------------------------------------------------------
# 3. orders_fd_discovery — functional-dependency profiling
# ------------------------------------------------------------------


@register(
    "orders_fd_discovery",
    """
    SELECT * FROM (
      SELECT 'o_orderkey->o_custkey' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_lhs_groups,
             CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT)
               AS violating_groups,
             CAST(CASE WHEN COUNT(CASE WHEN nd > 1 THEN 1 END) = 0
                       THEN 1 ELSE 0 END AS INT) AS holds
      FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS nd
            FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'o_custkey->o_orderpriority',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT),
             CAST(CASE WHEN COUNT(CASE WHEN nd > 1 THEN 1 END) = 0
                       THEN 1 ELSE 0 END AS INT)
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY o_custkey)
      UNION ALL
      SELECT 'o_custkey->o_orderstatus',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT),
             CAST(CASE WHEN COUNT(CASE WHEN nd > 1 THEN 1 END) = 0
                       THEN 1 ELSE 0 END AS INT)
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderstatus) AS nd
            FROM orders GROUP BY o_custkey))
    ORDER BY candidate
    """,
)
def orders_fd_discovery(spark: SparkSession, sf_dir: str):
    """Functional-dependency profiling (the Metanome/data-profiling
    primitive): for each candidate FD "LHS determines RHS", count the
    LHS groups whose RHS is NOT single-valued — zero violations means
    the dependency holds and the schema can rely on it (a key
    constraint, a denormalization opportunity, a join-cardinality
    guarantee); violations localize the dirty rows. Each candidate is
    one combinable (lhs → distinct-rhs) aggregate folded to a
    one-row verdict; candidates union into the report. At 100 TB
    each candidate is one keyed shuffle over its LHS — the profiler
    runs them as independent passes exactly as here (a single-pass
    multi-FD variant exists but trades shuffle volume for scan count;
    the docstring choice is deliberate)."""
    o = t(spark, sf_dir, "orders")

    def fd(name: str, lhs: str, rhs: str):
        g = o.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        return g.agg(
            F.lit(name).alias("candidate"),
            F.count("*").cast("bigint").alias("n_lhs_groups"),
            F.count(F.when(F.col("nd") > 1, 1))
            .cast("bigint")
            .alias("violating_groups"),
            F.when(
                F.count(F.when(F.col("nd") > 1, 1)) == 0, 1
            )
            .otherwise(0)
            .cast("int")
            .alias("holds"),
        )

    return (
        fd("o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionByName(
            fd(
                "o_custkey->o_orderpriority",
                "o_custkey",
                "o_orderpriority",
            )
        )
        .unionByName(
            fd("o_custkey->o_orderstatus", "o_custkey", "o_orderstatus")
        )
        .orderBy("candidate")
    )
