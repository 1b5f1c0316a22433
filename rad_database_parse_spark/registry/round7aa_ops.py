"""Round-7aa operators (registry query #498-500): weekday-effect
ANOVA, embedding norm profiles, and export-mix entropy.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. orders_weekday_anova — is the day-of-week effect significant?
# ------------------------------------------------------------------


@register(
    "orders_weekday_anova",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             dayofweek(CAST(o_orderdate AS DATE)) AS dow_raw,
             CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))
               * 100 AS BIGINT)) AS BIGINT) // 100 AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2),
    grp AS (
      SELECT dow_raw AS dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS s,
             SUM(CAST(rev AS HUGEINT) * rev) AS ss
      FROM daily GROUP BY 1),
    means AS (
      SELECT dow, n, s, ss,
             CAST(s * 1000 // n AS BIGINT) AS m_milli
      FROM grp),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS HUGEINT) AS st,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM grp),
    gm AS (
      SELECT CAST(st * 1000 // nn AS BIGINT) AS g_milli FROM tot),
    parts AS (
      SELECT
        SUM(m.n * (CAST(m.m_milli AS HUGEINT) - g.g_milli)
              * (m.m_milli - g.g_milli)) AS ssb_milli2,
        SUM(m.ss * 1000000 - 2 * CAST(m.m_milli AS HUGEINT) * m.s
              * 1000 + m.n * CAST(m.m_milli AS HUGEINT) * m.m_milli)
          AS ssw_milli2
      FROM means m CROSS JOIN gm g)
    SELECT t.nn AS n_days, t.k AS n_groups,
           CAST(round(1e3
             * (CAST(p.ssb_milli2 AS DOUBLE) / (t.k - 1))
             / (CAST(p.ssw_milli2 AS DOUBLE) / (t.nn - t.k)))
             AS BIGINT) AS f_stat_milli,
           CAST(CASE WHEN (CAST(p.ssb_milli2 AS DOUBLE) / (t.k - 1))
             / (CAST(p.ssw_milli2 AS DOUBLE) / (t.nn - t.k)) > 2.1
             THEN 1 ELSE 0 END AS INT) AS weekday_effect_5pct
    FROM parts p CROSS JOIN tot t
    """,
)
def orders_weekday_anova(spark: SparkSession, sf_dir: str):
    """One-way ANOVA of daily revenue across the seven weekdays — the
    significance companion to orders_trading_day_adjustment: the
    adjustment op rescales by weekday counts assuming a day-of-week
    effect exists; this tests whether it actually does (F over 6 and
    ~n degrees of freedom, critical ~2.1 at 5%). Arithmetic shape
    (hard-won): the naive s^2/n fold SILENTLY WRAPS — Spark's
    IntegralDivide on decimals returns int64 and the quotient passes
    2^63 when groups are few and sums huge (7 weekdays x day-grain
    dollars) — so instead the group means quantize ONCE to exact
    milli-dollars and every sum-of-squares term is a pure decimal/
    HUGEINT PRODUCT (ssb = sum n(m - g)^2, ssw = sum[ss*1e6 -
    2 m s 1000 + n m^2]) with no integral division anywhere; doubles
    enter once in the final F ratio. Weekday keys use each engine's
    own dayofweek convention — the day partition is identical, F is
    label-invariant, and only aggregates are emitted."""
    o = t(spark, sf_dir, "orders")
    big = "decimal(38,0)"
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
    ).agg(
        F.expr(
            "CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))"
            " * 100 AS BIGINT)) AS BIGINT) div 100 AS BIGINT)"
        ).alias("rev")
    )
    grp = daily.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rev").cast(big).alias("s"),
        F.sum(F.col("rev").cast(big) * F.col("rev")).alias("ss"),
    )
    means = grp.select(
        "n",
        "s",
        "ss",
        F.expr("CAST(s * 1000 div n AS BIGINT)").alias("m_milli"),
    )
    tot = grp.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast(big).alias("st"),
        F.count("*").cast("bigint").alias("k"),
    )
    gm = tot.select(
        F.expr("CAST(st * 1000 div nn AS BIGINT)").alias("g_milli"),
        "nn",
        "k",
    )
    parts = means.crossJoin(F.broadcast(gm)).groupBy("nn", "k").agg(
        F.sum(
            F.col("n")
            * (F.col("m_milli").cast(big) - F.col("g_milli"))
            * (F.col("m_milli") - F.col("g_milli"))
        ).alias("ssb_milli2"),
        F.sum(
            F.col("ss") * 1000000
            - 2 * F.col("m_milli").cast(big) * F.col("s") * 1000
            + F.col("n") * F.col("m_milli").cast(big) * F.col("m_milli")
        ).alias("ssw_milli2"),
    )
    f = (
        "(CAST(ssb_milli2 AS DOUBLE) / (k - 1))"
        " / (CAST(ssw_milli2 AS DOUBLE) / (nn - k))"
    )
    return parts.select(
        F.col("nn").alias("n_days"),
        F.col("k").alias("n_groups"),
        F.expr(f"CAST(round(1e3 * {f}) AS BIGINT)").alias(
            "f_stat_milli"
        ),
        F.expr(
            f"CAST(CASE WHEN {f} > 2.1 THEN 1 ELSE 0 END AS INT)"
        ).alias("weekday_effect_5pct"),
    )


# ------------------------------------------------------------------
# 2. emb_norm_profile_by_label — vector-norm health audit
# ------------------------------------------------------------------

_NP_SCALE = 1_000_000
_EMB_DIM = 64
_NP_LOW_MILLI = 500  # norms below 0.5 read as degenerate vectors


@register(
    "emb_norm_profile_by_label",
    f"""
    WITH norms AS (
      SELECT label,
             CAST(round(sqrt(CAST(list_sum(list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * {_NP_SCALE} + 0.5)
                    AS BIGINT)
                    * CAST(floor(CAST(v AS DOUBLE) * {_NP_SCALE} + 0.5)
                      AS BIGINT))) AS DOUBLE)) / 1e3) AS BIGINT)
               AS norm_milli
      FROM embeddings)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(norm_milli) // COUNT(*) AS BIGINT)
             AS mean_norm_milli,
           CAST(MIN(norm_milli) AS BIGINT) AS min_norm_milli,
           CAST(MAX(norm_milli) AS BIGINT) AS max_norm_milli,
           CAST(SUM(CASE WHEN norm_milli < {_NP_LOW_MILLI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
    FROM norms GROUP BY 1 ORDER BY label
    """,
)
def emb_norm_profile_by_label(spark: SparkSession, sf_dir: str):
    """Vector-norm profile per label — the cheapest embedding health
    check and the one run FIRST (degenerate near-zero vectors poison
    every cosine downstream; a label whose mean norm drifts from the
    others signals an encoder or normalization bug long before the
    isotropy/silhouette audits can localize it). Each norm is one
    exact integer sum of squared fixed-point components with a
    single sqrt, milli-quantized before the per-label aggregation —
    both engines fold identical integers. One scan, label-grain
    output with a degenerate-vector count against the
    {_NP_LOW_MILLI}-milli floor."""
    e = t(spark, sf_dir, "embeddings")
    norms = e.select(
        "label",
        F.expr(
            "CAST(round(sqrt(CAST(aggregate(embedding,"
            " CAST(0 AS BIGINT), (acc, v) -> acc"
            f" + CAST(floor(CAST(v AS DOUBLE) * {_NP_SCALE} + 0.5)"
            " AS BIGINT)"
            f" * CAST(floor(CAST(v AS DOUBLE) * {_NP_SCALE} + 0.5)"
            " AS BIGINT)) AS DOUBLE)) / 1e3) AS BIGINT)"
        ).alias("norm_milli"),
    )
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.expr(
                "CAST(SUM(norm_milli) div COUNT(*) AS BIGINT)"
            ).alias("mean_norm_milli"),
            F.min("norm_milli").cast("bigint").alias(
                "min_norm_milli"
            ),
            F.max("norm_milli").cast("bigint").alias(
                "max_norm_milli"
            ),
            F.sum(
                F.when(
                    F.col("norm_milli") < _NP_LOW_MILLI, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_degenerate"),
        )
        .orderBy("label")
    )


# ------------------------------------------------------------------
# 3. nation_export_entropy — diversification of the export mix
# ------------------------------------------------------------------


@register(
    "nation_export_entropy",
    """
    WITH flows AS (
      SELECT s.s_nationkey AS nat, p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS x
      FROM lineitem
      JOIN supplier s ON s.s_suppkey = l_suppkey
      JOIN part p ON p.p_partkey = l_partkey
      GROUP BY 1, 2),
    tot AS (
      SELECT nat, CAST(SUM(x) AS BIGINT) AS xt,
             CAST(COUNT(*) AS BIGINT) AS n_brands
      FROM flows GROUP BY 1),
    ent AS (
      SELECT f.nat, t.n_brands,
             CAST(SUM(CAST(f.x AS HUGEINT)
               * CAST(round(1e6 * ln(CAST(t.xt AS DOUBLE)
                 / f.x)) AS BIGINT)) // MAX(t.xt) AS BIGINT)
               AS h_micronats
      FROM flows f JOIN tot t ON t.nat = f.nat
      GROUP BY 1, 2)
    SELECT e.nat AS nationkey, nm.n_name AS nation, e.n_brands,
           e.h_micronats,
           CAST(e.h_micronats * 1000000
             // GREATEST(CAST(round(1e6 * ln(CAST(e.n_brands
                AS DOUBLE))) AS BIGINT), 1) AS BIGINT) AS evenness_ppm
    FROM ent e JOIN nation nm ON nm.n_nationkey = e.nat
    ORDER BY nation
    """,
)
def nation_export_entropy(spark: SparkSession, sf_dir: str):
    """Shannon entropy of each nation's export brand mix — the
    diversification index (economic-complexity literature's first
    cut): low entropy = concentrated, shock-fragile export base;
    evenness (entropy over its log-k maximum) makes nations with
    different brand counts comparable. Complements RCA (which names
    the specializations) with a single per-nation concentration
    number, the export-side dual of the import-side HHI already in
    the tier. Per-term micro-quantized logs over the bounded 25x25
    flow matrix (one fact aggregate); exact integer weighting and
    normalization."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part")
    n = t(spark, sf_dir, "nation")
    flows = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("s_nationkey").alias("nat"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    tot = flows.groupBy("nat").agg(
        F.sum("x").cast("bigint").alias("xt"),
        F.count("*").cast("bigint").alias("n_brands"),
    )
    ent = (
        flows.join(tot, "nat")
        .groupBy("nat", "n_brands")
        .agg(
            F.expr(
                "CAST(SUM(CAST(x AS DECIMAL(38,0))"
                " * CAST(round(1e6 * ln(CAST(xt AS DOUBLE)"
                " / x)) AS BIGINT)) div MAX(xt) AS BIGINT)"
            ).alias("h_micronats")
        )
    )
    return (
        ent.join(F.broadcast(n), ent.nat == n.n_nationkey)
        .select(
            F.col("nat").alias("nationkey"),
            F.col("n_name").alias("nation"),
            "n_brands",
            "h_micronats",
            F.expr(
                "CAST(h_micronats * 1000000"
                " div GREATEST(CAST(round(1e6 * ln(CAST(n_brands"
                " AS DOUBLE))) AS BIGINT), 1) AS BIGINT)"
            ).alias("evenness_ppm"),
        )
        .orderBy("nation")
    )
