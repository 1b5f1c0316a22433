"""Round-7a operators: the six TPC-H shapes previously scoped out for
missing columns (``tpch_deep.py`` module docstring), completed here over a
DERIVED supplier-part dimension — the full 22-query TPC-H surface now runs.

The driver testdata has no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``l_receiptdate`` columns, so Q2/Q9/Q11/
Q16/Q20 reconstruct ``partsupp`` from lineitem facts (the real-world
missing-dimension pattern: the catalog you need exists only as fact-table
evidence) and Q12 classifies by ship latency instead of ship mode:

- ``ps(ps_partkey, ps_suppkey, ps_supplycost_cents, ps_availqty)`` :=
  one groupBy over lineitem — supply cost as the MINIMUM observed unit
  price in exact integer cents (floor division of exact decimal cents by
  the integral quantity), avail quantity as total shipped units. Exact
  integer arithmetic end to end, so both engines derive the identical
  dimension and every downstream comparison is bit-stable.

At 100 TB the derivation is a single map-side-combinable aggregate keyed
on (partkey, suppkey) — in production it would be computed once and
bucketed on ps_partkey so Q2/Q9/Q11/Q20 all reuse the co-location; here
each query derives it inline so the oracle sees the same plan inputs.

Float parity follows registry/__init__.py policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dbl, disc_price, t

# Derived partsupp — identical arithmetic in both engines (see module doc).
_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 // CAST(l_quantity AS BIGINT)) AS ps_supplycost_cents,
             SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reconstructed partsupp dimension (module docstring contract)."""
    l = t(spark, sf_dir, "lineitem")
    unit_cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " div CAST(l_quantity AS BIGINT)"
    )
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(unit_cents).alias("ps_supplycost_cents"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"),
    )


# --------------------------------------------------------------------- Q2
@register(
    "q2_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_SQL}),
    eps AS (
      SELECT ps_partkey, ps_supplycost_cents, s_name, s_acctbal, n_name
      FROM ps
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    mn AS (SELECT ps_partkey, MIN(ps_supplycost_cents) AS min_cost
           FROM eps GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, p_size,
           ps_supplycost_cents
    FROM eps
      JOIN mn USING (ps_partkey)
      JOIN part ON p_partkey = ps_partkey
    WHERE ps_supplycost_cents = min_cost
      AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str):
    """TPC-H Q2 on the derived dimension: per part, the EUROPE supplier(s)
    quoting the minimum supply cost. The per-part minimum rides ONE window
    over the region-filtered ps (partitioned by ps_partkey — no re-join,
    no second shuffle of the big side); supplier/nation/region/part all
    broadcast. Cost compare is exact integer cents, and the top-100
    becomes TakeOrderedAndProject with full-key tie-breaks."""
    ps = derived_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    eps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eps.withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "p_size",
            "ps_supplycost_cents",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------- Q9
@register(
    "q9_product_type_profit",
    f"""
    WITH ps AS ({_PS_SQL}),
    profit AS (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                  * 10000 AS BIGINT)
             - ps_supplycost_cents * CAST(l_quantity AS BIGINT) * 100
               AS amount_e4
      FROM lineitem
        JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%red%')
    SELECT nation, o_year,
           CAST(SUM(CAST(amount_e4 AS HUGEINT)) AS BIGINT) AS sum_profit_e4
    FROM profit GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str):
    """TPC-H Q9 (product-type profit) on the derived dimension: revenue
    minus reconstructed supply cost per supplier-nation per order-year,
    for 'red' parts. Profit is exact e4-dollar integers (decimal revenue
    scaled to integers minus integer cost-cents*qty*100), summed in
    decimal(38,0) — bit-stable. The lineitem→ps join co-partitions on
    (partkey, suppkey); part/supplier/nation broadcast; orders is the one
    other fact-side shuffle."""
    l = t(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    amount = (disc_price() * 10000).cast("bigint") - F.col(
        "ps_supplycost_cents"
    ) * F.col("l_quantity").cast("bigint") * 100
    return (
        l.join(
            ps,
            (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount_e4"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum(F.col("amount_e4").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("sum_profit_e4")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


# -------------------------------------------------------------------- Q11
@register(
    "q11_important_stock",
    f"""
    WITH ps AS ({_PS_SQL}),
    nps AS (
      SELECT ps_partkey,
             CAST(ps_supplycost_cents AS HUGEINT) * ps_availqty AS value_cents
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
      WHERE s_nationkey = 3),
    pv AS (SELECT ps_partkey, SUM(value_cents) AS part_value
           FROM nps GROUP BY 1),
    tot AS (SELECT SUM(part_value) AS total_value FROM pv)
    SELECT ps_partkey AS p_partkey,
           CAST(part_value AS BIGINT) AS part_value_cents
    FROM pv CROSS JOIN tot
    WHERE part_value * 1000 > total_value
    ORDER BY part_value_cents DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str):
    """TPC-H Q11 (important stock) on the derived dimension: parts whose
    reconstructed inventory value at nation-3 suppliers exceeds 1/1000 of
    the national total. Values stay exact integer cents (decimal(38,0)
    against HUGEINT); the scalar total comes back as a broadcast cross
    join — no driver collect — and the threshold compare is integer
    (value*1000 > total), so no ratio float ever forms."""
    ps = derived_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    big = "decimal(38,0)"
    pv = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost_cents").cast(big)
                * F.col("ps_availqty").cast(big)
            ).alias("value_cents"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("value_cents").cast(big)).alias("part_value"))
    )
    tot = pv.agg(F.sum("part_value").alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") * 1000 > F.col("total_value"))
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.col("part_value").cast("bigint").alias("part_value_cents"),
        )
        .orderBy(F.col("part_value_cents").desc(), "p_partkey")
    )


# -------------------------------------------------------------------- Q12
@register(
    "q12_latency_priority",
    """
    SELECT latency_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 7
                    THEN 'EXPRESS'
                  WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                    THEN 'REGULAR'
                  ELSE 'DEFERRED' END AS latency_class
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01') cls
    GROUP BY latency_class ORDER BY latency_class
    """,
)
def q12_latency_priority(spark: SparkSession, sf_dir: str):
    """TPC-H Q12 adapted for a testdata with no ship mode: lines shipped
    in 1996 classify by order→ship latency (≤7d EXPRESS, ≤30d REGULAR,
    else DEFERRED — the operational analogue of the mode column), and each
    class counts critical- vs normal-priority lines. One fact-fact join on
    orderkey, then a 3-row conditional aggregate; the shipdate range
    prunes the scan."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = t(spark, sf_dir, "orders")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = (
        F.when(lat <= 7, "EXPRESS")
        .when(lat <= 30, "REGULAR")
        .otherwise("DEFERRED")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(cls.alias("latency_class"), hi.alias("hi"))
        .groupBy("latency_class")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("hi"), 0).otherwise(1)).alias(
                "low_line_count"
            ),
        )
        .orderBy("latency_class")
    )


# -------------------------------------------------------------------- Q16
@register(
    "q16_supplier_part_count",
    f"""
    WITH ps AS ({_PS_SQL})
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str):
    """TPC-H Q16 (parts/supplier relationship) on the derived dimension:
    how many distinct suppliers can source each (brand, type, size) combo,
    excluding one brand, the PROMO type, and suppliers flagged by the
    complaint analogue this schema supports (negative account balance —
    there is no s_comment column). The exclusion list is a broadcast
    anti-join (NOT IN with no NULLs on either side ≡ anti join); part
    broadcasts; the only shuffle is the distinct-count aggregate."""
    ps = derived_partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        ps.join(
            F.broadcast(bad),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# -------------------------------------------------------------------- Q20
@register(
    "q20_surplus_stock_suppliers",
    f"""
    WITH ps AS ({_PS_SQL}),
    q96 AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    surplus AS (
      SELECT DISTINCT ps_suppkey
      FROM ps
        JOIN part ON p_partkey = ps_partkey
        JOIN q96 ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE p_name LIKE 'small%' AND ps_availqty > 2 * qty96)
    SELECT s_suppkey, s_name, n_name
    FROM supplier
      JOIN surplus ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_7', 'NATION_11')
    ORDER BY s_suppkey
    """,
)
def q20_surplus_stock_suppliers(spark: SparkSession, sf_dir: str):
    """TPC-H Q20 (potential promotion) on the derived dimension: suppliers
    in three nations holding 'small…' parts whose reconstructed stock
    exceeds twice what they shipped of that part in 1996 — surplus worth
    promoting. ps and the 1996 shipment aggregate both key on (partkey,
    suppkey), so the join co-partitions (at scale: one exchange reused);
    part broadcasts into the filter, the supplier set collapses via
    distinct BEFORE the dimension join, and the compare is exact
    integers."""
    ps = derived_partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l96 = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty96"))
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_7", "NATION_11")
    )
    surplus = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            l96,
            (ps.ps_partkey == l96.l_partkey)
            & (ps.ps_suppkey == l96.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty96"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(surplus, s.s_suppkey == surplus.ps_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )
