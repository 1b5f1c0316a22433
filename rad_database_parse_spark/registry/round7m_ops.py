"""Round-7m operators: isotonic (PAVA-equivalent minimax) calibration,
a Page-Hinkley sequential drift detector, discount x tax mutual
information, a stratified IPW treatment-effect estimate, a Cramer's V
categorical-association matrix, and a next-fit-decreasing bin-packing
plan.

Parity contract as everywhere (registry/__init__.py float policy):
aggregate in exact integers/decimals, quantize transcendental terms
(ln/sqrt) once from identically-reduced integers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. lineitem_isotonic_return_calibration — minimax isotonic fit
# ------------------------------------------------------------------


@register(
    "lineitem_isotonic_return_calibration",
    """
    WITH cells AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS r,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT d, r, n,
             SUM(r) OVER (ORDER BY d) AS cr,
             SUM(n) OVER (ORDER BY d) AS cn
      FROM cells),
    spans AS (
      SELECT i.d AS di, j.d AS dj,
             (j.cr - i.cr + i.r) * 1000000
               // (j.cn - i.cn + i.n) AS avg_ppm
      FROM cum i JOIN cum j ON j.d >= i.d),
    mins AS (
      SELECT di AS d, MIN(avg_ppm) AS m FROM spans GROUP BY 1),
    fit AS (
      SELECT c.d, c.r, c.n,
             c.r * 1000000 // c.n AS raw_ppm,
             MAX(m.m) OVER (ORDER BY c.d) AS iso_ppm
      FROM cells c JOIN mins m ON m.d = c.d)
    SELECT d AS discount_pct, n AS n_rows,
           CAST(raw_ppm AS BIGINT) AS raw_return_ppm,
           CAST(iso_ppm AS BIGINT) AS iso_return_ppm,
           CAST(CASE WHEN raw_ppm >= iso_ppm THEN raw_ppm - iso_ppm
                ELSE iso_ppm - raw_ppm END AS BIGINT) AS adjustment_ppm
    FROM fit ORDER BY d
    """,
)
def lineitem_isotonic_return_calibration(spark: SparkSession, sf_dir: str):
    """Isotonic regression of return rate on discount level via the
    minimax (max-min prefix-average) characterization — the closed form
    of pool-adjacent-violators: fit[k] = max_{i<=k} min_{j>=i}
    avg(y[i..j]), the standard monotone-calibration step for model
    scores (here: does a deeper discount monotonically raise the return
    rate?). One lineitem scan folds the 11 discount cells; span
    averages come from prefix sums so each (i,j) average is ONE exact
    ppm division (no truncation compounding), and the O(cells^2) span
    join is 121 rows — bounded by the discount domain, never by data
    volume. 100 TB shape: fact scan -> 11-row cell table -> constant
    work."""
    l = t(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        (dec("l_discount") * 100).cast("bigint").alias("d")
    ).agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("r"),
        F.count("*").cast("bigint").alias("n"),
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "d",
        "r",
        "n",
        F.sum("r").over(wc).alias("cr"),
        F.sum("n").over(wc).alias("cn"),
    )
    i = cum.select(
        F.col("d").alias("di"),
        F.col("r").alias("ri"),
        F.col("n").alias("ni"),
        F.col("cr").alias("cri"),
        F.col("cn").alias("cni"),
    )
    j = cum.select(
        F.col("d").alias("dj"),
        F.col("cr").alias("crj"),
        F.col("cn").alias("cnj"),
    )
    spans = (
        i.join(j, F.col("dj") >= F.col("di"))
        .select(
            "di",
            F.expr(
                "(crj - cri + ri) * 1000000 div (cnj - cni + ni)"
            ).alias("avg_ppm"),
        )
    )
    mins = spans.groupBy(F.col("di").alias("d")).agg(
        F.min("avg_ppm").alias("m")
    )
    wm = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    fit = cells.join(mins, "d").select(
        "d",
        "n",
        F.expr("r * 1000000 div n").alias("raw_ppm"),
        F.max("m").over(wm).alias("iso_ppm"),
    )
    return fit.select(
        F.col("d").alias("discount_pct"),
        F.col("n").alias("n_rows"),
        F.col("raw_ppm").alias("raw_return_ppm"),
        F.col("iso_ppm").alias("iso_return_ppm"),
        F.expr(
            "CAST(CASE WHEN raw_ppm >= iso_ppm THEN raw_ppm - iso_ppm"
            " ELSE iso_ppm - raw_ppm END AS BIGINT)"
        ).alias("adjustment_ppm"),
    ).orderBy("discount_pct")


# ------------------------------------------------------------------
# 2. events_page_hinkley_drift — sequential drift detector
# ------------------------------------------------------------------


@register(
    "events_page_hinkley_drift",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    pre AS (
      SELECT day, x,
             SUM(x) OVER (ORDER BY day) AS cx,
             ROW_NUMBER() OVER (ORDER BY day) AS tt
      FROM daily),
    dev AS (
      SELECT day, x, tt,
             x * 1000000 - (cx * 1000000 // tt) AS dev_micro
      FROM pre),
    cum AS (
      SELECT day, tt,
             SUM(dev_micro) OVER (ORDER BY day) AS cum_micro
      FROM dev),
    ph AS (
      SELECT day, tt, cum_micro,
             cum_micro - MIN(cum_micro) OVER (ORDER BY day) AS ph_micro
      FROM cum),
    lam AS (
      SELECT 3 * (SUM(x) * 1000000 // COUNT(*)) AS lambda_micro
      FROM daily)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(ph_micro) AS BIGINT) AS max_ph_micro,
           strftime(MIN(CASE WHEN ph_micro = (SELECT MAX(ph_micro)
               FROM ph) THEN day END), '%Y-%m-%d') AS peak_day,
           strftime(MIN(CASE WHEN ph_micro > (SELECT lambda_micro
               FROM lam) THEN day END), '%Y-%m-%d') AS first_alarm_day,
           CAST(SUM(CASE WHEN ph_micro > (SELECT lambda_micro FROM lam)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days
    FROM ph
    """,
)
def events_page_hinkley_drift(spark: SparkSession, sf_dir: str):
    """Page-Hinkley sequential drift detector on the daily event-count
    series — the streaming-native changepoint test (CUSUM's one-sided
    cousin, the standard drift monitor in river/MOA): deviation of each
    day from the RUNNING mean accumulates, and the gap between the
    cumulative sum and its running minimum alarms when it exceeds
    lambda (3x the global daily mean here). The running mean makes this
    look sequential, but prefix sums turn every term into window
    algebra: one day-grain aggregate then four cumulative windows over
    the bounded calendar axis — no fold, no iteration, exact micro
    fixed point. 100 TB: fact scan -> day grain -> window chain on
    ~thousands of rows."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        "x",
        F.sum("x").over(wd).alias("cx"),
        F.row_number().over(Window.orderBy("day")).alias("tt"),
    )
    dev = pre.select(
        "day",
        F.expr("x * 1000000 - (cx * 1000000 div tt)").alias("dev_micro"),
    )
    cum = dev.select(
        "day", F.sum("dev_micro").over(wd).alias("cum_micro")
    )
    ph = cum.select(
        "day",
        (F.col("cum_micro") - F.min("cum_micro").over(wd)).alias(
            "ph_micro"
        ),
    )
    lam = daily.agg(
        F.expr("3 * (SUM(x) * 1000000 div COUNT(*))").alias(
            "lambda_micro"
        )
    )
    mx = ph.agg(F.max("ph_micro").alias("mx"))
    return (
        ph.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(mx))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.max("ph_micro").cast("bigint").alias("max_ph_micro"),
            F.date_format(
                F.min(
                    F.when(
                        F.col("ph_micro") == F.col("mx"), F.col("day")
                    )
                ),
                "yyyy-MM-dd",
            ).alias("peak_day"),
            F.date_format(
                F.min(
                    F.when(
                        F.col("ph_micro") > F.col("lambda_micro"),
                        F.col("day"),
                    )
                ),
                "yyyy-MM-dd",
            ).alias("first_alarm_day"),
            F.sum(
                F.when(
                    F.col("ph_micro") > F.col("lambda_micro"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_alarm_days"),
        )
    )


# ------------------------------------------------------------------
# 3. lineitem_discount_tax_mutual_info — exact-cell MI
# ------------------------------------------------------------------


@register(
    "lineitem_discount_tax_mutual_info",
    """
    WITH cells AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d,
             CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) AS tx,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    marg AS (
      SELECT d, tx, c,
             SUM(c) OVER (PARTITION BY d) AS rc,
             SUM(c) OVER (PARTITION BY tx) AS cc,
             SUM(c) OVER () AS n
      FROM cells),
    terms AS (
      SELECT n,
             c * CAST(round(1e6 * ln((CAST(c AS DOUBLE) * n)
                 / (CAST(rc AS DOUBLE) * cc))) AS BIGINT) AS mi_t,
             c * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / rc))
                 AS BIGINT) AS hr_t,
             c * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / cc))
                 AS BIGINT) AS hc_t
      FROM marg),
    agg AS (
      SELECT MAX(n) AS n, SUM(mi_t) AS smi, SUM(hr_t) AS shr,
             SUM(hc_t) AS shc
      FROM terms GROUP BY n),
    hx AS (
      SELECT CAST(n AS BIGINT) AS n_rows,
             CAST(smi // n AS BIGINT) AS mi_micronats,
             CAST(shr // n AS BIGINT) AS h_discount_micronats,
             CAST(shc // n AS BIGINT) AS h_tax_micronats
      FROM agg)
    SELECT n_rows, mi_micronats, h_discount_micronats, h_tax_micronats,
           CAST(GREATEST(mi_micronats, 0) * 1000000
             // GREATEST(LEAST(h_discount_micronats, h_tax_micronats), 1)
             AS BIGINT) AS nmi_ppm
    FROM hx
    """,
)
def lineitem_discount_tax_mutual_info(spark: SparkSession, sf_dir: str):
    """Mutual information between discount and tax — the
    feature-dependence screen (are two columns redundant? does a
    pipeline need both?), computed exactly on the bounded 11 x 9 cell
    table: MI = sum p_ij ln(p_ij / p_i p_j) with every log term
    micro-quantized from identical integer ratios in both engines
    (the docs_nb_langid_eval / l-diversity parity pattern), plus the
    marginal entropies and the normalized-MI share. Independence
    rounds hr+hc-style terms to ~0 micro-nats; the TPC-H generator
    draws discount and tax independently so the expected reading IS
    the null — the op is the instrument, the registry's documents
    tables give it signal. One fact scan; everything after is
    99 bounded rows."""
    l = t(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        (dec("l_discount") * 100).cast("bigint").alias("d"),
        (dec("l_tax") * 100).cast("bigint").alias("tx"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    marg = cells.select(
        "d",
        "tx",
        "c",
        F.sum("c").over(Window.partitionBy("d")).alias("rc"),
        F.sum("c").over(Window.partitionBy("tx")).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    terms = marg.select(
        "n",
        F.expr(
            "c * CAST(round(1e6 * ln((CAST(c AS DOUBLE) * n)"
            " / (CAST(rc AS DOUBLE) * cc))) AS BIGINT)"
        ).alias("mi_t"),
        F.expr(
            "c * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / rc))"
            " AS BIGINT)"
        ).alias("hr_t"),
        F.expr(
            "c * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / cc))"
            " AS BIGINT)"
        ).alias("hc_t"),
    )
    agg = terms.groupBy("n").agg(
        F.sum("mi_t").alias("smi"),
        F.sum("hr_t").alias("shr"),
        F.sum("hc_t").alias("shc"),
    )
    hx = agg.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr("CAST(smi div n AS BIGINT)").alias("mi_micronats"),
        F.expr("CAST(shr div n AS BIGINT)").alias(
            "h_discount_micronats"
        ),
        F.expr("CAST(shc div n AS BIGINT)").alias("h_tax_micronats"),
    )
    return hx.select(
        "n_rows",
        "mi_micronats",
        "h_discount_micronats",
        "h_tax_micronats",
        F.expr(
            "CAST(GREATEST(mi_micronats, 0) * 1000000"
            " div GREATEST(LEAST(h_discount_micronats,"
            " h_tax_micronats), 1) AS BIGINT)"
        ).alias("nmi_ppm"),
    )


# ------------------------------------------------------------------
# 4. customer_ipw_segment_effect — stratified treatment effect
# ------------------------------------------------------------------


@register(
    "customer_ipw_segment_effect",
    """
    WITH y AS (
      SELECT c.c_custkey,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS tr,
             c.c_nationkey AS stratum,
             CAST(COALESCE(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2))
               * 100 AS BIGINT)), 0) AS BIGINT) AS spend
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    arms AS (
      SELECT stratum, tr, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(spend) AS BIGINT) AS s
      FROM y GROUP BY 1, 2),
    strata AS (
      SELECT t.stratum, t.n + c.n AS ns,
             t.s * 1000000 // t.n AS mt_micro,
             c.s * 1000000 // c.n AS mc_micro
      FROM (SELECT * FROM arms WHERE tr = 1) t
      JOIN (SELECT * FROM arms WHERE tr = 0) c ON c.stratum = t.stratum),
    naive AS (
      SELECT (SELECT s1.s * 1000000 // s1.n FROM
                (SELECT SUM(s) AS s, SUM(n) AS n FROM arms WHERE tr = 1)
                s1)
           - (SELECT s0.s * 1000000 // s0.n FROM
                (SELECT SUM(s) AS s, SUM(n) AS n FROM arms WHERE tr = 0)
                s0) AS naive_micro)
    SELECT CAST(SUM(ns) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_strata_used,
           CAST((SELECT naive_micro FROM naive) AS BIGINT)
             AS naive_diff_microcents,
           CAST(SUM(ns * (mt_micro - mc_micro)) // SUM(ns) AS BIGINT)
             AS stratified_ate_microcents
    FROM strata
    """,
)
def customer_ipw_segment_effect(spark: SparkSession, sf_dir: str):
    """Stratified treatment-effect estimate (the discrete-covariate
    form of inverse-propensity weighting, Cochran/Rosenbaum-Rubin):
    'treatment' = BUILDING market segment, outcome = lifetime spend,
    strata = nation — within each stratum the treatment share IS the
    propensity, so weighting treated by 1/e and control by 1/(1-e)
    collapses to the exact stratum-size-weighted mean difference
    computed here, next to the naive unadjusted difference so the
    confounding correction is visible. Exact micro-cents fixed point;
    strata missing an arm drop out (inner join) and are counted via
    n_strata_used. Scale: customer-grain aggregate -> 50-row arm
    table -> constant fold; the left join keeps zero-order customers
    in the control/treated means."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    y = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            "c_custkey",
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("tr"),
            F.col("c_nationkey").alias("stratum"),
        )
        .agg(
            F.coalesce(
                F.sum((dec("o_totalprice") * 100).cast("bigint")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("spend")
        )
    )
    arms = y.groupBy("stratum", "tr").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("spend").cast("bigint").alias("s"),
    )
    tarm = arms.filter(F.col("tr") == 1).select(
        "stratum",
        F.col("n").alias("nt"),
        F.expr("s * 1000000 div n").alias("mt_micro"),
    )
    carm = arms.filter(F.col("tr") == 0).select(
        "stratum",
        F.col("n").alias("nc"),
        F.expr("s * 1000000 div n").alias("mc_micro"),
    )
    strata = tarm.join(carm, "stratum").select(
        (F.col("nt") + F.col("nc")).alias("ns"),
        "mt_micro",
        "mc_micro",
    )
    naive = (
        arms.groupBy("tr")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .groupBy()
        .agg(
            F.expr(
                "SUM(CASE WHEN tr = 1 THEN s * 1000000 div n END)"
                " - SUM(CASE WHEN tr = 0 THEN s * 1000000 div n END)"
            ).alias("naive_micro")
        )
    )
    return (
        strata.crossJoin(F.broadcast(naive))
        .agg(
            F.sum("ns").cast("bigint").alias("n_customers"),
            F.count("*").cast("bigint").alias("n_strata_used"),
            F.max("naive_micro")
            .cast("bigint")
            .alias("naive_diff_microcents"),
            F.expr(
                "CAST(SUM(ns * (mt_micro - mc_micro)) div SUM(ns)"
                " AS BIGINT)"
            ).alias("stratified_ate_microcents"),
        )
    )


# ------------------------------------------------------------------
# 5. categorical_cramers_v_matrix — association strength per pair
# ------------------------------------------------------------------


def _cram_duck(tbl: str, a: str, b: str, label: str) -> str:
    return f"""
      SELECT '{label}' AS pair,
             CAST(MAX(n) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT av) AS BIGINT) AS card_a,
             CAST(COUNT(DISTINCT bv) AS BIGINT) AS card_b,
             CAST(SUM(((o * n - r * c) * (o * n - r * c))
                  // (CAST(r AS HUGEINT) * c)) * 1000000 // MAX(n)
                  // MAX(n) AS BIGINT) AS chi2_micro
      FROM (
        SELECT av, bv, CAST(COUNT(*) AS HUGEINT) AS o,
               SUM(COUNT(*)) OVER (PARTITION BY av) AS r,
               SUM(COUNT(*)) OVER (PARTITION BY bv) AS c,
               SUM(COUNT(*)) OVER () AS n
        FROM (SELECT {a} AS av, {b} AS bv FROM {tbl})
        GROUP BY 1, 2)"""


@register(
    "categorical_cramers_v_matrix",
    f"""
    WITH pairs AS (
      {_cram_duck('lineitem', 'l_returnflag', 'l_linestatus', 'returnflag_x_linestatus')}
      UNION ALL {_cram_duck('customer', 'c_mktsegment', 'c_nationkey', 'mktsegment_x_nation')}
      UNION ALL {_cram_duck('orders', 'o_orderpriority', 'o_orderstatus', 'orderpriority_x_orderstatus')}
    )
    SELECT pair, n_rows, card_a, card_b, chi2_micro,
           CAST(round(1e6 * sqrt((CAST(chi2_micro AS DOUBLE) / 1e6)
             / (CAST(n_rows AS DOUBLE)
                * LEAST(card_a - 1, card_b - 1)))) AS BIGINT)
             AS cramers_v_ppm
    FROM pairs ORDER BY pair
    """,
)
def categorical_cramers_v_matrix(spark: SparkSession, sf_dir: str):
    """Cramer's V association matrix over three categorical column
    pairs — the schema-profiling complement to the chi-square drift
    test already in the tier: V = sqrt(chi2 / (n min(r-1, c-1)))
    normalizes association onto [0,1] so pairs of different
    cardinality are comparable (which columns encode the same thing?
    which cross-features are worth materializing?). chi2 folds as
    SUM((o n - r c)^2 / (r c)) / n^2 in exact integer arithmetic
    (decimal(38,0) here, HUGEINT in the oracle — products reach
    ~1e34), with the single sqrt taken once from the identical
    reduced integer. Each pair is one fact scan collapsing to its
    bounded contingency table (<= 49 cells)."""

    def pair(tbl, a, b, label):
        cells = (
            tbl.groupBy(
                F.col(a).alias("av"), F.col(b).alias("bv")
            )
            .agg(F.count("*").cast("decimal(38,0)").alias("o"))
            .select(
                "av",
                "bv",
                "o",
                F.sum("o").over(Window.partitionBy("av")).alias("r"),
                F.sum("o").over(Window.partitionBy("bv")).alias("c"),
                F.sum("o").over(Window.partitionBy()).alias("n"),
            )
        )
        return (
            cells.groupBy()
            .agg(
                F.lit(label).alias("pair"),
                F.max("n").cast("bigint").alias("n_rows"),
                F.count_distinct("av").cast("bigint").alias("card_a"),
                F.count_distinct("bv").cast("bigint").alias("card_b"),
                F.expr(
                    "CAST(CAST(SUM(((o * n - r * c) * (o * n - r * c))"
                    " div (r * c)) AS DECIMAL(38,0)) * 1000000"
                    " div CAST(MAX(n) AS BIGINT)"
                    " div CAST(MAX(n) AS BIGINT) AS BIGINT)"
                ).alias("chi2_micro"),
            )
            .select("pair", "n_rows", "card_a", "card_b", "chi2_micro")
        )

    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    pairs = (
        pair(li, "l_returnflag", "l_linestatus", "returnflag_x_linestatus")
        .unionByName(
            pair(c, "c_mktsegment", "c_nationkey", "mktsegment_x_nation")
        )
        .unionByName(
            pair(
                o,
                "o_orderpriority",
                "o_orderstatus",
                "orderpriority_x_orderstatus",
            )
        )
    )
    return pairs.select(
        "pair",
        "n_rows",
        "card_a",
        "card_b",
        "chi2_micro",
        F.expr(
            "CAST(round(1e6 * sqrt((CAST(chi2_micro AS DOUBLE) / 1e6)"
            " / (CAST(n_rows AS DOUBLE)"
            " * LEAST(card_a - 1, card_b - 1)))) AS BIGINT)"
        ).alias("cramers_v_ppm"),
    ).orderBy("pair")


# ------------------------------------------------------------------
# 6. part_nfd_binpack_plan — next-fit-decreasing packing fold
# ------------------------------------------------------------------

_NFD_CAP = 100
_NFD_TOPK = 120


@register(
    "part_nfd_binpack_plan",
    f"""
    WITH ranked AS (
      SELECT p_brand, CAST(p_size AS BIGINT) AS sz,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_size DESC, p_partkey) AS rk
      FROM part),
    series AS (
      SELECT p_brand,
             list(sz ORDER BY sz DESC, rk) AS sizes,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(sz) AS BIGINT) AS total_size
      FROM ranked WHERE rk <= {_NFD_TOPK} GROUP BY 1),
    packed AS (
      SELECT p_brand, n_parts, total_size,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT)],
                            list_transform(sizes, x -> [x])),
               (acc, e) -> CASE
                 WHEN acc[-1] + e[1] <= {_NFD_CAP}
                 THEN list_append(acc[1:len(acc) - 1], acc[-1] + e[1])
                 ELSE list_append(acc, e[1]) END) AS bins
      FROM series)
    SELECT p_brand, n_parts, total_size,
           CAST(len(bins) AS BIGINT) AS n_bins,
           CAST((total_size + {_NFD_CAP} - 1) // {_NFD_CAP} AS BIGINT)
             AS lb_bins,
           CAST(len(bins) * {_NFD_CAP} - total_size AS BIGINT)
             AS total_slack,
           CAST(total_size * 1000000 // (len(bins) * {_NFD_CAP})
             AS BIGINT) AS utilization_ppm
    FROM packed ORDER BY p_brand
    """,
)
def part_nfd_binpack_plan(spark: SparkSession, sf_dir: str):
    """Next-fit-decreasing bin packing of each brand's largest part
    sizes into capacity-{_NFD_CAP} containers — the shipping/shelf
    consolidation planner (and the fifth per-key sequential-fold
    showcase after the (s,S) simulation): sizes sort descending and
    fold through the NFD recurrence (fits in the open bin -> add,
    else open a new bin) inside one array-HOF aggregate, 25
    independent folds in a single pass, with the LP lower bound
    ceil(total/cap) alongside so the heuristic's gap is visible (NFD
    is 2-approximate; first-fit needs per-item bin scans that
    SQL-engine HOF lambdas can't express loop-free — documented
    trade). The per-brand series is BOUNDED at the top-{_NFD_TOPK}
    largest parts (rank window) so the collected array never scales
    with the fact table. Exact integers throughout."""
    p = t(spark, sf_dir, "part")
    ranked = p.select(
        "p_brand",
        F.col("p_size").cast("bigint").alias("sz"),
        F.row_number()
        .over(
            Window.partitionBy("p_brand").orderBy(
                F.col("p_size").desc(), "p_partkey"
            )
        )
        .alias("rk"),
    ).filter(F.col("rk") <= _NFD_TOPK)
    series = ranked.groupBy("p_brand").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(-sz AS k, rk))),"
            " s -> -s.k)"
        ).alias("sizes"),
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("sz").cast("bigint").alias("total_size"),
    )
    packed = series.select(
        "p_brand",
        "n_parts",
        "total_size",
        F.expr(
            "aggregate(sizes, array(CAST(0 AS BIGINT)),"
            f" (acc, x) -> IF(element_at(acc, -1) + x <= {_NFD_CAP},"
            "  concat(slice(acc, 1, size(acc) - 1),"
            "         array(element_at(acc, -1) + x)),"
            "  concat(acc, array(x))))"
        ).alias("bins"),
    )
    return packed.select(
        "p_brand",
        "n_parts",
        "total_size",
        F.size("bins").cast("bigint").alias("n_bins"),
        F.expr(
            f"CAST((total_size + {_NFD_CAP} - 1) div {_NFD_CAP}"
            " AS BIGINT)"
        ).alias("lb_bins"),
        F.expr(
            f"CAST(size(bins) * {_NFD_CAP} - total_size AS BIGINT)"
        ).alias("total_slack"),
        F.expr(
            f"CAST(total_size * 1000000 div (size(bins) * {_NFD_CAP})"
            " AS BIGINT)"
        ).alias("utilization_ppm"),
    ).orderBy("p_brand")
