"""Round-7t operators: Benford second-digit forensics, two-half
profile drift detection, generalized-ESD outlier rounds, a 4-4-5
fiscal calendar rollup, beam-style subgroup discovery, and a
Kaplan-Meier curve with Greenwood confidence bands.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. orders_benford_second_digit — forensic digit test, 2nd digit
# ------------------------------------------------------------------

# expected second-digit probabilities (Benford): embedded as micro
# literals computed once here, so both engines compare against the
# IDENTICAL constant table.
_B2_EXP_PPM = {
    d2: round(
        1e6
        * sum(
            math.log10(1 + 1 / (10 * d1 + d2)) for d1 in range(1, 10)
        )
    )
    for d2 in range(10)
}


def _b2_exp_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = {d} THEN CAST({p} AS BIGINT)"
        for d, p in _B2_EXP_PPM.items()
    )
    return f"CASE {whens} END"


@register(
    "orders_benford_second_digit",
    f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(CAST(o_totalprice
               AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR), 2, 1)
             AS BIGINT) AS d2
      FROM orders
      WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
            >= 10),
    obs AS (
      SELECT d2, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(COUNT(*)) OVER () AS nn
      FROM digits GROUP BY 1)
    SELECT d2 AS second_digit, n AS n_obs,
           CAST(n * 1000000 // nn AS BIGINT) AS obs_ppm,
           {_b2_exp_case('d2')} AS exp_ppm,
           CAST((n * 1000000 // nn - {_b2_exp_case('d2')})
             * (n * 1000000 // nn - {_b2_exp_case('d2')})
             // GREATEST({_b2_exp_case('d2')}, 1) AS BIGINT)
             AS chi2_contrib_micro
    FROM obs ORDER BY d2
    """,
)
def orders_benford_second_digit(spark: SparkSession, sf_dir: str):
    """Benford SECOND-digit conformance of order totals — the
    forensic-accounting escalation of the first-digit test already
    in the tier: fabricated or rounded figures that survive the
    first-digit screen (people fake plausible leading digits) betray
    themselves in the flatter second-digit law P(d2) = sum over d1 of
    log10(1 + 1/(10 d1 + d2)). The expected table is computed ONCE
    at registration time and embedded as identical micro literals in
    both engines' query texts — no transcendental calls at run time
    at all. One fact scan to a 10-row digit histogram; per-digit
    chi-square contributions in exact integer arithmetic."""
    o = t(spark, sf_dir, "orders")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    digits = o.select(
        F.expr(
            f"CAST(substring(CAST({cents} AS STRING), 2, 1) AS BIGINT)"
        ).alias("d2")
    ).filter(F.expr(f"{cents} >= 10"))
    obs = digits.groupBy("d2").agg(
        F.count("*").cast("bigint").alias("n")
    )
    nn = obs.agg(F.sum("n").cast("bigint").alias("nn"))
    exp_case = _b2_exp_case("d2")
    return (
        obs.crossJoin(F.broadcast(nn))
        .select(
            F.col("d2").alias("second_digit"),
            F.col("n").alias("n_obs"),
            F.expr("CAST(n * 1000000 div nn AS BIGINT)").alias(
                "obs_ppm"
            ),
            F.expr(exp_case).alias("exp_ppm"),
            F.expr(
                f"CAST((n * 1000000 div nn - {exp_case})"
                f" * (n * 1000000 div nn - {exp_case})"
                f" div GREATEST({exp_case}, 1) AS BIGINT)"
            ).alias("chi2_contrib_micro"),
        )
        .orderBy("second_digit")
    )


# ------------------------------------------------------------------
# 2. dq_profile_drift_halves — column-profile drift, time halves
# ------------------------------------------------------------------


def _drift_col_duck(col: str) -> str:
    return f"""
      SELECT '{col}' AS column_name, half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
             CAST(MAX(cnt) * 1000000 // COUNT(*) AS BIGINT)
               AS top_share_ppm
      FROM (
        SELECT h.half, h.{col},
               COUNT(*) OVER (PARTITION BY h.half, h.{col}) AS cnt
        FROM halves h) GROUP BY 1, 2"""


@register(
    "dq_profile_drift_halves",
    f"""
    WITH bounds AS (
      SELECT (MIN(year(o_orderdate) * 12 + month(o_orderdate))
              + MAX(year(o_orderdate) * 12 + month(o_orderdate))) // 2
               AS mid
      FROM orders),
    halves AS (
      SELECT CASE WHEN year(o_orderdate) * 12 + month(o_orderdate)
                  < (SELECT mid FROM bounds) THEN 'a' ELSE 'b' END
               AS half,
             o_orderstatus, o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               // 1000000 AS price_band
      FROM orders),
    profiles AS (
      {_drift_col_duck('o_orderstatus')}
      UNION ALL {_drift_col_duck('o_orderpriority')}
      UNION ALL {_drift_col_duck('price_band')}
    ),
    wide AS (
      SELECT column_name,
             MAX(CASE WHEN half = 'a' THEN n END) AS n_a,
             MAX(CASE WHEN half = 'b' THEN n END) AS n_b,
             MAX(CASE WHEN half = 'a' THEN n_distinct END)
               AS distinct_a,
             MAX(CASE WHEN half = 'b' THEN n_distinct END)
               AS distinct_b,
             MAX(CASE WHEN half = 'a' THEN top_share_ppm END)
               AS top_share_a_ppm,
             MAX(CASE WHEN half = 'b' THEN top_share_ppm END)
               AS top_share_b_ppm
      FROM profiles GROUP BY 1)
    SELECT column_name, n_a, n_b, distinct_a, distinct_b,
           top_share_a_ppm, top_share_b_ppm,
           CAST(CASE WHEN top_share_a_ppm >= top_share_b_ppm
                THEN top_share_a_ppm - top_share_b_ppm
                ELSE top_share_b_ppm - top_share_a_ppm END AS BIGINT)
             AS top_share_shift_ppm,
           CAST(CASE WHEN (CASE WHEN top_share_a_ppm >= top_share_b_ppm
                THEN top_share_a_ppm - top_share_b_ppm
                ELSE top_share_b_ppm - top_share_a_ppm END) > 10000
                OR distinct_a * 110 < distinct_b * 100
                OR distinct_b * 110 < distinct_a * 100
                THEN 1 ELSE 0 END AS INT) AS drift_flag
    FROM wide ORDER BY column_name
    """,
)
def dq_profile_drift_halves(spark: SparkSession, sf_dir: str):
    """Column-profile drift detection between the chronological first
    and second halves of the data — the schema-level early-warning
    the PSI/chi-square drift tests (which watch ONE metric each)
    generalize into: per column, row counts, distinct cardinality,
    and the modal value's share, diffed across halves with a flag
    when the top share shifts > 1% or cardinality moves > 10%. The
    uniform profile (count / distinct / top-share) works for any
    column type, so adding a column to the audit is one more UNION
    branch — the shape a dq framework generates mechanically. Each
    column profile is one aggregate over a half-partitioned scan;
    the modal share comes from a per-(half, value) count window
    PARTITIONED by the profiled column."""
    o = t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.expr(
            "(MIN(year(o_orderdate) * 12 + month(o_orderdate))"
            " + MAX(year(o_orderdate) * 12 + month(o_orderdate)))"
            " div 2"
        ).alias("mid")
    )
    halves = o.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            "CASE WHEN year(o_orderdate) * 12 + month(o_orderdate)"
            " < mid THEN 'a' ELSE 'b' END"
        ).alias("half"),
        "o_orderstatus",
        "o_orderpriority",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " div 1000000"
        ).alias("price_band"),
    )

    def profile(col):
        counted = halves.groupBy("half", col).agg(
            F.count("*").cast("bigint").alias("cnt")
        )
        return counted.groupBy("half").agg(
            F.lit(col).alias("column_name"),
            F.sum("cnt").cast("bigint").alias("n"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.expr(
                "CAST(MAX(cnt) * 1000000 div SUM(cnt) AS BIGINT)"
            ).alias("top_share_ppm"),
        )

    profiles = (
        profile("o_orderstatus")
        .unionByName(profile("o_orderpriority"))
        .unionByName(profile("price_band"))
    )
    wide = profiles.groupBy("column_name").agg(
        F.max(F.when(F.col("half") == "a", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("half") == "b", F.col("n"))).alias("n_b"),
        F.max(
            F.when(F.col("half") == "a", F.col("n_distinct"))
        ).alias("distinct_a"),
        F.max(
            F.when(F.col("half") == "b", F.col("n_distinct"))
        ).alias("distinct_b"),
        F.max(
            F.when(F.col("half") == "a", F.col("top_share_ppm"))
        ).alias("top_share_a_ppm"),
        F.max(
            F.when(F.col("half") == "b", F.col("top_share_ppm"))
        ).alias("top_share_b_ppm"),
    )
    shift = (
        "CASE WHEN top_share_a_ppm >= top_share_b_ppm"
        " THEN top_share_a_ppm - top_share_b_ppm"
        " ELSE top_share_b_ppm - top_share_a_ppm END"
    )
    return wide.select(
        "column_name",
        "n_a",
        "n_b",
        "distinct_a",
        "distinct_b",
        "top_share_a_ppm",
        "top_share_b_ppm",
        F.expr(f"CAST({shift} AS BIGINT)").alias(
            "top_share_shift_ppm"
        ),
        F.expr(
            f"CAST(CASE WHEN ({shift}) > 10000"
            " OR distinct_a * 110 < distinct_b * 100"
            " OR distinct_b * 110 < distinct_a * 100"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("drift_flag"),
    ).orderBy("column_name")


# ------------------------------------------------------------------
# 3. orders_gesd_outlier_rounds — generalized ESD, 3 rounds
# ------------------------------------------------------------------

_GESD_ROUNDS = 3
_GESD_LAMBDA_MILLI = 3100  # ~critical value for n~80, alpha 0.05


def _gesd_oracle() -> str:
    steps = []
    prev = "rem0"
    picks = []
    for k in range(1, _GESD_ROUNDS + 1):
        steps.append(
            f"""
    mo{k} AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(y) AS HUGEINT) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS ss
      FROM {prev}),
    pk{k} AS (
      SELECT r.ym, r.y,
             CAST(round(1e3 * abs(CAST(r.y AS DOUBLE)
                 - CAST(m.s AS DOUBLE) / m.n)
               / sqrt((CAST(m.ss AS DOUBLE) * m.n - CAST(m.s AS DOUBLE)
                 * m.s) / (CAST(m.n AS DOUBLE) * m.n))) AS BIGINT)
               AS r_milli
      FROM {prev} r CROSS JOIN mo{k} m
      ORDER BY r_milli DESC, r.ym LIMIT 1),
    rem{k} AS (
      SELECT ym, y FROM {prev}
      WHERE ym != (SELECT ym FROM pk{k}))"""
        )
        picks.append(
            f"SELECT {k} AS round, ym, y, r_milli FROM pk{k}"
        )
        prev = f"rem{k}"
    return f"""
    WITH rem0 AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    {','.join(steps)}
    SELECT CAST(round AS BIGINT) AS round_no,
           CAST(ym AS BIGINT) AS outlier_ym,
           y AS value_cents, r_milli,
           CAST(CASE WHEN r_milli > {_GESD_LAMBDA_MILLI} THEN 1
                ELSE 0 END AS INT) AS outlier_5pct
    FROM ({' UNION ALL '.join(picks)})
    ORDER BY round_no
    """


@register("orders_gesd_outlier_rounds", _gesd_oracle())
def orders_gesd_outlier_rounds(spark: SparkSession, sf_dir: str):
    """Generalized extreme studentized deviate (Rosner's GESD) on
    monthly revenue — the MULTIPLE-outlier test that fixes masking:
    a single max-z test misses two adjacent outliers because each
    inflates the std that screens the other, so GESD removes the
    extremest point and RETESTS on the remainder, {_GESD_ROUNDS}
    rounds unrolled here (each = one exact-moment fold + a 1-row
    argmax + an anti-filter, all on the bounded month grain). The
    studentized R statistics milli-quantize from exact
    HUGEINT/decimal(38,0) moments; the critical value is a fixed
    literal for n~80 at 5% (documented approximation — exact
    lambda_i needs the t quantile). The MAD-based ops flag outliers
    against a static fence; GESD answers HOW MANY are defensible."""
    o = t(spark, sf_dir, "orders")
    big = "decimal(38,0)"
    rem = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "ym"
        )
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    out = None
    for k in range(1, _GESD_ROUNDS + 1):
        mo = rem.agg(
            F.count("*").cast(big).alias("n"),
            F.sum("y").cast(big).alias("s"),
            F.sum(F.col("y").cast(big) * F.col("y")).alias("ss"),
        )
        pk = (
            rem.crossJoin(F.broadcast(mo))
            .select(
                "ym",
                "y",
                F.expr(
                    "CAST(round(1e3 * abs(CAST(y AS DOUBLE)"
                    " - CAST(s AS DOUBLE) / n)"
                    " / sqrt((CAST(ss AS DOUBLE) * n"
                    " - CAST(s AS DOUBLE) * s)"
                    " / (CAST(n AS DOUBLE) * n))) AS BIGINT)"
                ).alias("r_milli"),
            )
            .orderBy(F.col("r_milli").desc(), "ym")
            .limit(1)
        )
        row = pk.select(
            F.lit(k).cast("bigint").alias("round_no"),
            F.col("ym").cast("bigint").alias("outlier_ym"),
            F.col("y").alias("value_cents"),
            "r_milli",
            F.expr(
                f"CAST(CASE WHEN r_milli > {_GESD_LAMBDA_MILLI}"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("outlier_5pct"),
        )
        out = row if out is None else out.unionByName(row)
        rem = rem.join(
            pk.select(F.col("ym").alias("ym_out")),
            F.col("ym") == F.col("ym_out"),
            "left_anti",
        )
    return out.orderBy("round_no")


# ------------------------------------------------------------------
# 4. orders_fiscal_445_calendar — retail calendar rollup
# ------------------------------------------------------------------


@register(
    "orders_fiscal_445_calendar",
    """
    WITH wk AS (
      SELECT isoyear(CAST(o_orderdate AS DATE)) AS fy,
             LEAST(weekofyear(CAST(o_orderdate AS DATE)), 52) AS wk,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders),
    mapped AS (
      SELECT fy,
             (wk - 1) // 13 + 1 AS fq,
             CASE WHEN (wk - 1) % 13 < 4 THEN 1
                  WHEN (wk - 1) % 13 < 8 THEN 2
                  ELSE 3 END AS fp,
             cents
      FROM wk)
    SELECT fy AS fiscal_year, CAST(fq AS BIGINT) AS fiscal_quarter,
           CAST(fp AS BIGINT) AS fiscal_period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM mapped
    GROUP BY 1, 2, 3
    ORDER BY fiscal_year, fiscal_quarter, fiscal_period
    """,
)
def orders_fiscal_445_calendar(spark: SparkSession, sf_dir: str):
    """Revenue rolled onto a 4-4-5 retail fiscal calendar — the
    week-based calendar merchandising actually plans against
    (every period has whole weeks and every quarter exactly 13, so
    period-over-period comparisons aren't distorted by month
    lengths): ISO week-year gives the fiscal year (Dec 29 can belong
    to next year's week 1 — handled by isoyear/YEAROFWEEK, verified
    identical in both engines), week 53 folds into the final 5-week
    period, and weeks map 4-4-5 inside each 13-week quarter by pure
    integer arithmetic. The calendar-engineering pattern every
    finance warehouse needs; one scan, bounded (year x 12) output."""
    o = t(spark, sf_dir, "orders")
    wk = o.select(
        F.expr(
            "extract(YEAROFWEEK FROM CAST(o_orderdate AS DATE))"
        ).alias("fy"),
        F.expr(
            "LEAST(weekofyear(CAST(o_orderdate AS DATE)), 52)"
        ).alias("wk"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    mapped = wk.select(
        "fy",
        F.expr("(wk - 1) div 13 + 1").alias("fq"),
        F.expr(
            "CASE WHEN (wk - 1) % 13 < 4 THEN 1"
            " WHEN (wk - 1) % 13 < 8 THEN 2 ELSE 3 END"
        ).alias("fp"),
        "cents",
    )
    return (
        mapped.groupBy(
            F.col("fy").alias("fiscal_year"),
            F.col("fq").cast("bigint").alias("fiscal_quarter"),
            F.col("fp").cast("bigint").alias("fiscal_period"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("fiscal_year", "fiscal_quarter", "fiscal_period")
    )


# ------------------------------------------------------------------
# 5. lineitem_subgroup_discovery_beam — WRAcc subgroup mining
# ------------------------------------------------------------------

_SG_TOPK = 8


@register(
    "lineitem_subgroup_discovery_beam",
    f"""
    WITH cells AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS d,
             CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) AS tx,
             (CAST(l_quantity AS BIGINT) - 1) // 10 AS qb,
             l_linestatus AS ls,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS pos
      FROM lineitem GROUP BY 1, 2, 3, 4),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(pos) AS BIGINT) AS pp
            FROM cells),
    subs AS (
      SELECT 'd=' || CAST(d AS VARCHAR) AS descr,
             CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT)
               AS pos
      FROM cells GROUP BY d
      UNION ALL
      SELECT 'tax=' || CAST(tx AS VARCHAR), CAST(SUM(n) AS BIGINT),
             CAST(SUM(pos) AS BIGINT) FROM cells GROUP BY tx
      UNION ALL
      SELECT 'qb=' || CAST(qb AS VARCHAR), CAST(SUM(n) AS BIGINT),
             CAST(SUM(pos) AS BIGINT) FROM cells GROUP BY qb
      UNION ALL
      SELECT 'ls=' || ls, CAST(SUM(n) AS BIGINT),
             CAST(SUM(pos) AS BIGINT) FROM cells GROUP BY ls
      UNION ALL
      SELECT 'd=' || CAST(d AS VARCHAR) || ' AND tax='
               || CAST(tx AS VARCHAR),
             CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT)
      FROM cells GROUP BY d, tx
      UNION ALL
      SELECT 'd=' || CAST(d AS VARCHAR) || ' AND qb='
               || CAST(qb AS VARCHAR),
             CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT)
      FROM cells GROUP BY d, qb
      UNION ALL
      SELECT 'd=' || CAST(d AS VARCHAR) || ' AND ls=' || ls,
             CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT)
      FROM cells GROUP BY d, ls
      UNION ALL
      SELECT 'tax=' || CAST(tx AS VARCHAR) || ' AND qb='
               || CAST(qb AS VARCHAR),
             CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT)
      FROM cells GROUP BY tx, qb
      UNION ALL
      SELECT 'tax=' || CAST(tx AS VARCHAR) || ' AND ls=' || ls,
             CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT)
      FROM cells GROUP BY tx, ls
      UNION ALL
      SELECT 'qb=' || CAST(qb AS VARCHAR) || ' AND ls=' || ls,
             CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT)
      FROM cells GROUP BY qb, ls),
    scored AS (
      SELECT s.descr, s.n,
             CAST(s.pos * 1000000 // s.n AS BIGINT) AS rate_ppm,
             CAST((s.n * 1000000 // t.nn)
               * (s.pos * 1000000 // s.n - t.pp * 1000000 // t.nn)
               // 1000000 AS BIGINT) AS wracc_micro
      FROM subs s CROSS JOIN tot t)
    SELECT descr AS subgroup, n AS n_rows, rate_ppm, wracc_micro
    FROM scored
    ORDER BY wracc_micro DESC, subgroup
    LIMIT {_SG_TOPK}
    """,
)
def lineitem_subgroup_discovery_beam(spark: SparkSession, sf_dir: str):
    """Subgroup discovery with weighted relative accuracy (WRAcc =
    coverage x rate lift) over the return-flag target: enumerate
    every single-attribute condition and every two-attribute
    conjunction on the bounded descriptors (discount, tax, quantity
    band, line status) and surface the subgroups whose return rate
    most exceeds the base rate weighted by their size — the
    explainable 'WHERE is the problem concentrated?' pass
    (exceptional-model-mining's entry point, and what a root-cause
    dashboard runs after a KPI dips). All candidates derive from ONE
    fact scan: the 11x9x5x2 descriptor cell table is aggregated ten
    ways (4 marginals + 6 pairs — a beam over a bounded condition
    lattice, not the fact table). Exact integer ppm/micro; the
    WRAcc truncations are engine-identical. Top-{_SG_TOPK} via
    orderBy+limit."""
    li = t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        (dec("l_discount") * 100).cast("bigint").alias("d"),
        (dec("l_tax") * 100).cast("bigint").alias("tx"),
        F.expr("(CAST(l_quantity AS BIGINT) - 1) div 10").alias("qb"),
        F.col("l_linestatus").alias("ls"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    cells = cells.persist()
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("pos").cast("bigint").alias("pp"),
    )

    def sub(descr_expr, *keys):
        return cells.groupBy(*keys).agg(
            F.expr(descr_expr).alias("descr"),
            F.sum("n").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("pos"),
        ).select("descr", "n", "pos")

    subs = (
        sub("'d=' || CAST(d AS STRING)", "d")
        .unionByName(sub("'tax=' || CAST(tx AS STRING)", "tx"))
        .unionByName(sub("'qb=' || CAST(qb AS STRING)", "qb"))
        .unionByName(sub("'ls=' || ls", "ls"))
        .unionByName(
            sub(
                "'d=' || CAST(d AS STRING) || ' AND tax='"
                " || CAST(tx AS STRING)",
                "d",
                "tx",
            )
        )
        .unionByName(
            sub(
                "'d=' || CAST(d AS STRING) || ' AND qb='"
                " || CAST(qb AS STRING)",
                "d",
                "qb",
            )
        )
        .unionByName(
            sub("'d=' || CAST(d AS STRING) || ' AND ls=' || ls", "d", "ls")
        )
        .unionByName(
            sub(
                "'tax=' || CAST(tx AS STRING) || ' AND qb='"
                " || CAST(qb AS STRING)",
                "tx",
                "qb",
            )
        )
        .unionByName(
            sub(
                "'tax=' || CAST(tx AS STRING) || ' AND ls=' || ls",
                "tx",
                "ls",
            )
        )
        .unionByName(
            sub(
                "'qb=' || CAST(qb AS STRING) || ' AND ls=' || ls",
                "qb",
                "ls",
            )
        )
    )
    scored = subs.crossJoin(F.broadcast(tot)).select(
        F.col("descr").alias("subgroup"),
        F.col("n").alias("n_rows"),
        F.expr("CAST(pos * 1000000 div n AS BIGINT)").alias(
            "rate_ppm"
        ),
        F.expr(
            "CAST((n * 1000000 div nn)"
            " * (pos * 1000000 div n - pp * 1000000 div nn)"
            " div 1000000 AS BIGINT)"
        ).alias("wracc_micro"),
    )
    return scored.orderBy(
        F.col("wracc_micro").desc(), "subgroup"
    ).limit(_SG_TOPK)


# ------------------------------------------------------------------
# 6. customer_survival_greenwood_ci — KM curve with variance bands
# ------------------------------------------------------------------

_KM_CHURN_GAP = 3  # months of silence before dataset end => churned
_KM_MAX_T = 24


@register(
    "customer_survival_greenwood_ci",
    f"""
    WITH cust AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS fm,
             MAX(year(o_orderdate) * 12 + month(o_orderdate)) AS lm
      FROM orders GROUP BY 1),
    gmax AS (SELECT MAX(lm) AS gm FROM cust),
    spans AS (
      SELECT c.lm - c.fm AS tt,
             CASE WHEN c.lm < g.gm - {_KM_CHURN_GAP} THEN 1 ELSE 0 END
               AS ev
      FROM cust c CROSS JOIN gmax g),
    evs AS (SELECT tt AS ti, CAST(COUNT(*) AS BIGINT) AS d
            FROM spans WHERE ev = 1 GROUP BY 1),
    cns AS (SELECT tt AS ti, CAST(COUNT(*) AS BIGINT) AS cns
            FROM spans WHERE ev = 0 GROUP BY 1),
    tgrid AS (SELECT ti FROM evs UNION SELECT ti FROM cns),
    risk AS (
      SELECT g.ti,
             CAST(COALESCE((SELECT SUM(e.d) FROM evs e
                            WHERE e.ti >= g.ti), 0)
               + COALESCE((SELECT SUM(c.cns) FROM cns c
                           WHERE c.ti >= g.ti), 0) AS BIGINT) AS n,
             CAST(COALESCE((SELECT d FROM evs e2 WHERE e2.ti = g.ti),
                           0) AS BIGINT) AS d
      FROM tgrid g),
    terms AS (
      SELECT ti, n, d,
             CAST(round(1e6 * ln((CAST(n AS DOUBLE) - d) / n))
               AS BIGINT) AS lns_micro,
             CAST(round(1e12 * CAST(d AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - d))) AS BIGINT) AS gw_pico
      FROM risk WHERE n > 0 AND d < n),
    curve AS (
      SELECT a.ti, a.n, a.d,
             CAST(SUM(b.lns_micro) AS BIGINT) AS cum_ln,
             CAST(SUM(b.gw_pico) AS BIGINT) AS cum_gw
      FROM terms a JOIN terms b ON b.ti <= a.ti
      GROUP BY 1, 2, 3)
    SELECT ti AS tenure_months, n AS n_at_risk, d AS n_churned,
           CAST(round(1e6 * exp(cum_ln / 1e6)) AS BIGINT) AS s_ppm,
           CAST(GREATEST(round(1e6 * (exp(cum_ln / 1e6)
             - 1.96 * exp(cum_ln / 1e6) * sqrt(cum_gw / 1e12))), 0)
             AS BIGINT) AS ci_lo_ppm,
           CAST(LEAST(round(1e6 * (exp(cum_ln / 1e6)
             + 1.96 * exp(cum_ln / 1e6) * sqrt(cum_gw / 1e12))),
             1000000) AS BIGINT) AS ci_hi_ppm
    FROM curve
    WHERE ti <= {_KM_MAX_T}
    ORDER BY ti
    """,
)
def customer_survival_greenwood_ci(spark: SparkSession, sf_dir: str):
    """Kaplan-Meier customer retention curve WITH Greenwood
    confidence bands — the variance the point-estimate survival
    curve already in the tier cannot give: S(t) as the product-limit
    over monthly tenure (churn = {_KM_CHURN_GAP}+ silent months
    before the dataset edge, later customers right-censor), and
    Var(S) via Greenwood's sum d/(n(n-d)), so the band widens
    exactly where the at-risk set thins — the difference between
    'retention is 62%' and '62% +/- 9%, stop reading beyond month
    18'. Per-step log-survival and Greenwood terms quantize
    (micro/pico) from exact integer d, n BEFORE the cumulative sums,
    so both engines accumulate identical integers; exp/sqrt run once
    per output row. Customer-grain collapse, then bounded
    tenure-grain tail-sum self-joins — no windows."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.min(
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("fm"),
        F.max(
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("lm"),
    )
    gmax = cust.agg(F.max("lm").alias("gm"))
    spans = cust.crossJoin(F.broadcast(gmax)).select(
        (F.col("lm") - F.col("fm")).alias("tt"),
        F.when(
            F.col("lm") < F.col("gm") - _KM_CHURN_GAP, 1
        )
        .otherwise(0)
        .alias("ev"),
    )
    evs = (
        spans.filter(F.col("ev") == 1)
        .groupBy(F.col("tt").alias("ti"))
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    cns = (
        spans.filter(F.col("ev") == 0)
        .groupBy(F.col("tt").alias("ti"))
        .agg(F.count("*").cast("bigint").alias("cns"))
    )
    tgrid = evs.select("ti").unionByName(cns.select("ti")).distinct()
    e2 = evs.select(F.col("ti").alias("te"), "d")
    c2 = cns.select(F.col("ti").alias("tc"), "cns")
    ev_tail = (
        tgrid.join(e2, F.col("te") >= F.col("ti"), "left")
        .groupBy("ti")
        .agg(F.coalesce(F.sum("d"), F.lit(0)).alias("tail_d"))
    )
    cn_tail = (
        tgrid.join(c2, F.col("tc") >= F.col("ti"), "left")
        .groupBy("ti")
        .agg(F.coalesce(F.sum("cns"), F.lit(0)).alias("tail_c"))
    )
    risk = (
        tgrid.join(ev_tail, "ti")
        .join(cn_tail, "ti")
        .join(evs, "ti", "left")
        .select(
            "ti",
            (F.col("tail_d") + F.col("tail_c"))
            .cast("bigint")
            .alias("n"),
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("d"),
        )
    )
    terms = risk.filter(
        (F.col("n") > 0) & (F.col("d") < F.col("n"))
    ).select(
        "ti",
        "n",
        "d",
        F.expr(
            "CAST(round(1e6 * ln((CAST(n AS DOUBLE) - d) / n))"
            " AS BIGINT)"
        ).alias("lns_micro"),
        F.expr(
            "CAST(round(1e12 * CAST(d AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * (n - d))) AS BIGINT)"
        ).alias("gw_pico"),
    )
    tb = terms.select(
        F.col("ti").alias("tb"),
        F.col("lns_micro").alias("l2"),
        F.col("gw_pico").alias("g2"),
    )
    curve = (
        terms.join(tb, F.col("tb") <= F.col("ti"))
        .groupBy("ti", "n", "d")
        .agg(
            F.sum("l2").cast("bigint").alias("cum_ln"),
            F.sum("g2").cast("bigint").alias("cum_gw"),
        )
    )
    s = "exp(cum_ln / 1e6)"
    return (
        curve.filter(F.col("ti") <= _KM_MAX_T)
        .select(
            F.col("ti").alias("tenure_months"),
            F.col("n").alias("n_at_risk"),
            F.col("d").alias("n_churned"),
            F.expr(f"CAST(round(1e6 * {s}) AS BIGINT)").alias(
                "s_ppm"
            ),
            F.expr(
                f"CAST(GREATEST(round(1e6 * ({s} - 1.96 * {s}"
                " * sqrt(cum_gw / 1e12))), 0) AS BIGINT)"
            ).alias("ci_lo_ppm"),
            F.expr(
                f"CAST(LEAST(round(1e6 * ({s} + 1.96 * {s}"
                " * sqrt(cum_gw / 1e12))), 1000000) AS BIGINT)"
            ).alias("ci_hi_ppm"),
        )
        .orderBy("tenure_months")
    )
