"""Round-7ao operators: NBD order-count fit and first-order-value vs
lifetime-value correlation.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. customer_order_count_nbd_fit — count-model selection for CRM
# ------------------------------------------------------------------


@register(
    "customer_order_count_nbd_fit",
    """
    WITH per_cust AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
      FROM orders GROUP BY 1),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS s,
             CAST(SUM(k * k) AS BIGINT) AS ss
      FROM per_cust),
    d AS (
      SELECT n,
             CAST(s AS DOUBLE) / n AS mean_k,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
               / (n - 1) AS var_k
      FROM m)
    SELECT n AS n_customers, mean_k, var_k,
           var_k / mean_k AS dispersion_ratio,
           CASE WHEN var_k > mean_k
             THEN mean_k * mean_k / (var_k - mean_k) END AS nbd_r,
           CASE WHEN var_k > mean_k
             THEN mean_k / var_k END AS nbd_p,
           CAST(CASE WHEN var_k > mean_k THEN 1 ELSE 0 END AS INT)
             AS is_overdispersed
    FROM d
    """,
)
def customer_order_count_nbd_fit(spark: SparkSession, sf_dir: str):
    """Negative-binomial (NBD) fit of per-customer order counts — the
    count-model selection every CRM / CLV model starts with: if
    order counts were Poisson (dispersion ratio = 1), everyone shares
    one rate and frequency-based targeting is noise-chasing; the
    overdispersion this op measures is the heterogeneity the NBD's
    gamma-mixed rates capture, and its method-of-moments parameters
    (r = m²/(v−m), p = m/v — the closed form, no iteration) are the
    Pareto/NBD 'buy-till-you-die' model's purchase-process half. Two
    exact BIGINT moment folds (customer grain then global); every
    output is a fixed double expression of those integers, with the
    Poisson-or-underdispersed edge surfacing NULL parameters
    identically in both engines (CASE-guarded — no negative-variance
    division). At 100 TB this is the cheapest model-selection test in
    the tier: one groupBy the workload already pays, then six
    numbers."""
    o = t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("k")
    )
    m = per_cust.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("ss"),
    )
    d = m.select(
        "n",
        F.expr("CAST(s AS DOUBLE) / n").alias("mean_k"),
        F.expr(
            "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
            " / (n - 1)"
        ).alias("var_k"),
    )
    return d.select(
        F.col("n").alias("n_customers"),
        "mean_k",
        "var_k",
        F.expr("var_k / mean_k").alias("dispersion_ratio"),
        F.expr(
            "CASE WHEN var_k > mean_k"
            " THEN mean_k * mean_k / (var_k - mean_k) END"
        ).alias("nbd_r"),
        F.expr(
            "CASE WHEN var_k > mean_k THEN mean_k / var_k END"
        ).alias("nbd_p"),
        F.expr(
            "CAST(CASE WHEN var_k > mean_k THEN 1 ELSE 0 END AS INT)"
        ).alias("is_overdispersed"),
    )


# ------------------------------------------------------------------
# 2. customer_first_order_ltv_corr — acquisition-quality signal
# ------------------------------------------------------------------


@register(
    "customer_first_order_ltv_corr",
    """
    WITH ranked AS (
      SELECT o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS price_c,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rk
      FROM orders),
    per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CASE WHEN rk = 1 THEN price_c ELSE 0 END)
               AS BIGINT) AS first_c,
             CAST(SUM(price_c) AS BIGINT) AS ltv_c,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM ranked GROUP BY 1),
    rep AS (SELECT * FROM per_cust WHERE n_orders >= 2),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(first_c) AS HUGEINT) AS sx,
             CAST(SUM(ltv_c - first_c) AS HUGEINT) AS sy,
             SUM(CAST(first_c AS HUGEINT) * first_c) AS sxx,
             SUM(CAST(ltv_c - first_c AS HUGEINT)
                 * (ltv_c - first_c)) AS syy,
             SUM(CAST(first_c AS HUGEINT) * (ltv_c - first_c)) AS sxy
      FROM rep)
    SELECT n AS n_repeat_customers,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS pearson_r,
           CAST(sx AS DOUBLE) / n / 100.0 AS mean_first_order_dollars,
           CAST(sy AS DOUBLE) / n / 100.0
             AS mean_future_value_dollars
    FROM m
    """,
)
def customer_first_order_ltv_corr(spark: SparkSession, sf_dir: str):
    """First-order value vs FUTURE lifetime value correlation — the
    acquisition-quality question ('does a big first basket predict a
    valuable customer, or just a one-off?') answered without leakage:
    the outcome is LTV MINUS the first order, so the correlation
    can't be inflated by the first order predicting itself — the
    specification mistake naive versions of this analysis make. The
    first order resolves deterministically (row_number over
    (orderdate, orderkey) PARTITIONED by customer — ties broken by
    key, the scale-safe window); repeat customers only (single-order
    customers have no future to predict). Moments widen through
    HUGEINT/decimal(38,0) — cents×cents sums pass int64 at sf1 (the
    Holm op's widening) — and Pearson r is one fixed double
    expression of them. Two folds + one window on the customer key
    at any scale."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    ranked = o.select(
        "o_custkey",
        (dec("o_totalprice") * 100).cast("bigint").alias("price_c"),
        F.row_number().over(w).alias("rk"),
    )
    per_cust = ranked.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("rk") == 1, F.col("price_c")).otherwise(0))
        .cast("bigint")
        .alias("first_c"),
        F.sum("price_c").cast("bigint").alias("ltv_c"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    rep = per_cust.filter(F.col("n_orders") >= 2)
    big = "decimal(38,0)"
    m = rep.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("first_c").cast(big).alias("sx"),
        F.sum(F.col("ltv_c") - F.col("first_c")).cast(big).alias("sy"),
        F.sum(F.col("first_c").cast(big) * F.col("first_c")).alias("sxx"),
        F.sum(
            (F.col("ltv_c") - F.col("first_c")).cast(big)
            * (F.col("ltv_c") - F.col("first_c"))
        ).alias("syy"),
        F.sum(
            F.col("first_c").cast(big)
            * (F.col("ltv_c") - F.col("first_c"))
        ).alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_repeat_customers"),
        F.expr(
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
        ).alias("pearson_r"),
        F.expr("CAST(sx AS DOUBLE) / n / 100.0").alias(
            "mean_first_order_dollars"
        ),
        F.expr("CAST(sy AS DOUBLE) / n / 100.0").alias(
            "mean_future_value_dollars"
        ),
    )
