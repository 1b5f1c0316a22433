"""Round-7b operators: rank statistics, inequality profiles, and a
bipartite HITS ranking — the experiment-analysis tier extended past the
existing MWU/KS/ANOVA battery.

Parity contract as everywhere: exact integer/decimal arithmetic up to the
last step; ln/round only on values already quantized from identical exact
integers; big-magnitude reductions use truncating integral division on
NON-NEGATIVE operands (sign split first), so both engines truncate
identically before any double forms (the r6l hugeint→double lesson).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t
from ..operators.ranking import exact_ntile, exact_prefix_sum

# value-grain cents view of events.value (house quantization pattern)
_EV_CENTS_SQL = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"


def _ev_cents():
    return (dec("value") * 100).cast("bigint")


# ------------------------------------------------------------------
# 1. lineitem_spearman_rho — rank correlation with midrank ties
# ------------------------------------------------------------------


@register(
    "lineitem_spearman_rho",
    """
    WITH qp AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(CAST(l_discount AS DECIMAL(12,2)) * 1000000 AS BIGINT)
               AS p,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    qv AS (SELECT q, CAST(SUM(c) AS BIGINT) AS cnt FROM qp GROUP BY q),
    qr AS (
      SELECT q, cnt, 2 * COALESCE(SUM(cnt) OVER (ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS rq2
      FROM qv),
    pv AS (SELECT p, CAST(SUM(c) AS BIGINT) AS cnt FROM qp GROUP BY p),
    pr AS (
      SELECT p, cnt, 2 * COALESCE(SUM(cnt) OVER (ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS rp2
      FROM pv),
    mx AS (
      SELECT SUM(cnt::HUGEINT) AS n, SUM(cnt::HUGEINT * rq2) AS sx,
             SUM(cnt::HUGEINT * rq2 * rq2) AS sxx
      FROM qr),
    my AS (
      SELECT SUM(cnt::HUGEINT * rp2) AS sy,
             SUM(cnt::HUGEINT * rp2 * rp2) AS syy
      FROM pr),
    mxy AS (
      SELECT SUM(c::HUGEINT * rq2 * rp2) AS sxy
      FROM qp JOIN qr USING (q) JOIN pr USING (p)),
    m AS (SELECT n, sx, sy, sxx, syy, sxy
          FROM mx CROSS JOIN my CROSS JOIN mxy),
    red AS (
      SELECT CAST(n AS BIGINT) AS n_rows,
             CASE WHEN n * sxy - sx * sy < 0
                  THEN -CAST((-(n * sxy - sx * sy)) // 1000000 AS BIGINT)
                  ELSE CAST((n * sxy - sx * sy) // 1000000 AS BIGINT)
             END AS numr,
             CAST((n * sxx - sx * sx) // 1000000 AS BIGINT) AS vxr,
             CAST((n * syy - sy * sy) // 1000000 AS BIGINT) AS vyr
      FROM m)
    SELECT n_rows,
           CAST(numr AS DOUBLE)
           / sqrt(CAST(vxr AS DOUBLE) * CAST(vyr AS DOUBLE)) AS spearman_rho
    FROM red
    """,
)
def lineitem_spearman_rho(spark: SparkSession, sf_dir: str):
    """Spearman rank correlation between line quantity and discount —
    'do bigger lines get deeper discounts', asked the rank way (the
    Pearson sibling is lineitem_discount_qty_ols; Spearman survives
    outliers and nonlinearity, and with ~50 quantity values × ~11
    discount values the TIE handling is the whole computation, which
    is exactly what this op exercises). Midranks ×2 come from each
    variable's DISTINCT-VALUE histogram via
    operators/ranking.exact_prefix_sum (distributed prefix-sum — no
    unpartitioned window); both histograms AND the joint table are
    BOUNDED (≤50, ≤11, ≤550 rows at any corpus size), so after ONE
    map-side-combinable (q, p)-grain aggregate over the fact table,
    every Pearson moment — Σx/Σxx from the quantity histogram, Σy/Σyy
    from the discount histogram, Σxy from the joint table joined to
    both rank tables — is metadata-grain arithmetic. (First r7 form
    ranked near-unique extended prices: correct, but the rank machinery
    went fact-grain for no statistical gain — re-planned 8.7 → ~1s at
    sf0.1.) Moments accumulate in decimal(38,0)/HUGEINT, reduce by
    truncating division on sign-split non-negative operands, and only
    then does the one double division + sqrt happen — bit-stable
    across engines."""
    l = t(spark, sf_dir, "lineitem")
    big = "decimal(38,0)"
    qp = (
        l.select(
            F.col("l_quantity").cast("bigint").alias("q"),
            (dec("l_discount") * 1000000).cast("bigint").alias("p"),
        )
        .groupBy("q", "p")
        .agg(F.count("*").cast("bigint").alias("c"))
        .persist()
    )
    qv = qp.groupBy("q").agg(F.sum("c").cast("bigint").alias("cnt"))
    qr = exact_prefix_sum(qv, F.col("q"), [], "cnt", "cum_incl").select(
        "q",
        "cnt",
        (
            2 * (F.col("cum_incl") - F.col("cnt")) + F.col("cnt") + 1
        ).alias("rq2"),
    )
    pv = qp.groupBy("p").agg(F.sum("c").cast("bigint").alias("cnt"))
    pr = exact_prefix_sum(pv, F.col("p"), [], "cnt", "cum_incl").select(
        "p",
        "cnt",
        (
            2 * (F.col("cum_incl") - F.col("cnt")) + F.col("cnt") + 1
        ).alias("rp2"),
    )
    mx = qr.agg(
        F.sum(F.col("cnt").cast(big)).alias("n"),
        F.sum((F.col("cnt").cast(big) * F.col("rq2")).cast(big)).alias("sx"),
        F.sum(
            (F.col("cnt").cast(big) * F.col("rq2") * F.col("rq2")).cast(big)
        ).alias("sxx"),
    )
    my = pr.agg(
        F.sum((F.col("cnt").cast(big) * F.col("rp2")).cast(big)).alias("sy"),
        F.sum(
            (F.col("cnt").cast(big) * F.col("rp2") * F.col("rp2")).cast(big)
        ).alias("syy"),
    )
    mxy = (
        qp.join(F.broadcast(qr.select("q", "rq2")), "q")
        .join(F.broadcast(pr.select("p", "rp2")), "p")
        .agg(
            F.sum(
                (F.col("c").cast(big) * F.col("rq2") * F.col("rp2")).cast(
                    big
                )
            ).alias("sxy")
        )
    )
    m = mx.crossJoin(F.broadcast(my)).crossJoin(F.broadcast(mxy))
    red = m.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            "CASE WHEN n * sxy - sx * sy < 0"
            " THEN -CAST((-(n * sxy - sx * sy)) div 1000000 AS BIGINT)"
            " ELSE CAST((n * sxy - sx * sy) div 1000000 AS BIGINT) END"
        ).alias("numr"),
        F.expr("CAST((n * sxx - sx * sx) div 1000000 AS BIGINT)").alias(
            "vxr"
        ),
        F.expr("CAST((n * syy - sy * sy) div 1000000 AS BIGINT)").alias(
            "vyr"
        ),
    )
    return red.select(
        "n_rows",
        (
            F.col("numr").cast("double")
            / F.sqrt(F.col("vxr").cast("double") * F.col("vyr").cast("double"))
        ).alias("spearman_rho"),
    )


# ------------------------------------------------------------------
# 2. events_kruskal_wallis — k-sample rank test across event types
# ------------------------------------------------------------------


@register(
    "events_kruskal_wallis",
    f"""
    WITH rows_v AS (
      SELECT event_type, {_EV_CENTS_SQL} AS v FROM events),
    vals AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM rows_v GROUP BY v),
    ranked AS (
      SELECT v, cnt,
             2 * COALESCE(SUM(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS mid2
      FROM vals),
    gv AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt_g
           FROM rows_v GROUP BY 1, 2),
    groups AS (
      SELECT event_type, SUM(cnt_g) AS n_g,
             SUM(cnt_g::HUGEINT * mid2) AS r2_g
      FROM gv JOIN ranked USING (v) GROUP BY event_type),
    m AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(r2_g * r2_g // (4 * n_g)) AS BIGINT) AS s_term,
             (SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT)
              FROM vals) AS tie3
      FROM groups)
    SELECT n, k,
           12.0 * CAST(s_term AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1) AS h_stat,
           (12.0 * CAST(s_term AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
           / (1.0 - CAST(tie3 AS DOUBLE)
              / (CAST(n AS DOUBLE) * n * n - n)) AS h_tie_corrected
    FROM m
    """,
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str):
    """Kruskal-Wallis H — the k-sample extension of the repo's
    Mann-Whitney U (orders_mann_whitney_u): do the five event types draw
    their values from the same distribution? Same scale-safe rank
    machinery: midranks ×2 from the bounded distinct-cents histogram
    (≤~50k values at ANY corpus size — value grain, not row grain) via
    exact_prefix_sum, per-group rank sums from a (value, type)-grain
    aggregate joined to the histogram, so no fact-grain row is ever
    globally sorted. ΣR²/n stays exact (HUGEINT / decimal(38,0), one
    truncating division per group on non-negative operands); H and its
    tie correction form in double from identical reduced integers."""
    e = t(spark, sf_dir, "events")
    rows = e.select("event_type", _ev_cents().alias("v"))
    vals = rows.groupBy("v").agg(F.count("*").cast("bigint").alias("cnt"))
    ranked = exact_prefix_sum(vals, F.col("v"), [], "cnt", "cum_incl").select(
        "v",
        "cnt",
        (
            2 * (F.col("cum_incl") - F.col("cnt")) + F.col("cnt") + 1
        ).alias("mid2"),
    )
    gv = rows.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("cnt_g")
    )
    big = "decimal(38,0)"
    groups = (
        gv.join(ranked, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cnt_g").cast("bigint").alias("n_g"),
            F.sum((F.col("cnt_g").cast(big) * F.col("mid2")).cast(big)).alias(
                "r2_g"
            ),
        )
    )
    tie = vals.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("bigint")
        .alias("tie3")
    )
    m = (
        groups.select(
            "n_g",
            F.expr(
                f"CAST(r2_g * r2_g div (4 * CAST(n_g AS {big})) AS"
                f" {big})"
            ).alias("term"),
        )
        .agg(
            F.sum("n_g").cast("bigint").alias("n"),
            F.count("*").cast("bigint").alias("k"),
            F.sum("term").cast("bigint").alias("s_term"),
        )
        .crossJoin(F.broadcast(tie))
    )
    nd = F.col("n").cast("double")
    h = 12.0 * F.col("s_term").cast("double") / (nd * (nd + 1)) - 3.0 * (
        nd + 1
    )
    corr = 1.0 - F.col("tie3").cast("double") / (nd * nd * nd - nd)
    return m.select(
        "n", "k", h.alias("h_stat"), (h / corr).alias("h_tie_corrected")
    )


# ------------------------------------------------------------------
# 3. events_welch_ttest — unequal-variance two-sample t
# ------------------------------------------------------------------


@register(
    "events_welch_ttest",
    f"""
    WITH g AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS arm,
             {_EV_CENTS_SQL} AS v
      FROM events WHERE event_type IN ('purchase', 'view')),
    m AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v::HUGEINT * v) AS BIGINT) AS ss
      FROM g GROUP BY arm),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 1 THEN n END) AS n_a,
        MAX(CASE WHEN arm = 1 THEN s END) AS s_a,
        MAX(CASE WHEN arm = 1 THEN ss END) AS ss_a,
        MAX(CASE WHEN arm = 0 THEN n END) AS n_b,
        MAX(CASE WHEN arm = 0 THEN s END) AS s_b,
        MAX(CASE WHEN arm = 0 THEN ss END) AS ss_b
      FROM m)
    SELECT n_a, n_b,
           CAST(s_a AS DOUBLE) / n_a / 100 AS mean_a,
           CAST(s_b AS DOUBLE) / n_b / 100 AS mean_b,
           (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
           / sqrt((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
                    / (n_a - 1) / n_a
                  + (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
                    / (n_b - 1) / n_b) AS t_welch,
           power((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
                   / (n_a - 1) / n_a
                 + (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
                   / (n_b - 1) / n_b, 2)
           / (power((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
                      / (n_a - 1) / n_a, 2) / (n_a - 1)
              + power((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
                      / (n_b - 1) / n_b, 2) / (n_b - 1)) AS df_welch
    FROM wide
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str):
    """Welch's unequal-variance t-test between purchase and view values —
    the parametric cross-check of orders_mann_whitney_u's rank answer
    (and the Welch-Satterthwaite df the CUPED/sequential ops assume).
    One conditional-aggregate pass builds both arms' exact integer
    moments (cents, cents² in HUGEINT); the pivot to one row is a 2-row
    metadata MAX-CASE; t and df form in double from identical exact
    integers — mergeable partial aggregates, scale-free."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    g = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("arm"),
        _ev_cents().alias("v"),
    )
    big = "decimal(38,0)"
    m = g.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum((F.col("v").cast(big) * F.col("v")).cast(big))
        .cast("bigint")
        .alias("ss"),
    )

    def pick(arm: int, col: str):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = m.agg(
        pick(1, "n").alias("n_a"),
        pick(1, "s").alias("s_a"),
        pick(1, "ss").alias("ss_a"),
        pick(0, "n").alias("n_b"),
        pick(0, "s").alias("s_b"),
        pick(0, "ss").alias("ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    ssa, ssb = F.col("ss_a").cast("double"), F.col("ss_b").cast("double")
    se2_a = (ssa - sa * sa / na) / (na - 1) / na
    se2_b = (ssb - sb * sb / nb) / (nb - 1) / nb
    se2 = se2_a + se2_b
    return wide.select(
        "n_a",
        "n_b",
        (sa / na / 100).alias("mean_a"),
        (sb / nb / 100).alias("mean_b"),
        ((sa / na - sb / nb) / F.sqrt(se2)).alias("t_welch"),
        (
            F.pow(se2, 2)
            / (F.pow(se2_a, 2) / (na - 1) + F.pow(se2_b, 2) / (nb - 1))
        ).alias("df_welch"),
    )


# ------------------------------------------------------------------
# 4. customer_lorenz_deciles — spend concentration curve
# ------------------------------------------------------------------


@register(
    "customer_lorenz_deciles",
    """
    WITH spend AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS spend_c
      FROM orders GROUP BY 1),
    tiled AS (
      SELECT spend_c,
             NTILE(10) OVER (ORDER BY spend_c, custkey) AS decile
      FROM spend),
    per AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(spend_c) AS BIGINT) AS decile_spend_cents
      FROM tiled GROUP BY decile),
    cum AS (
      SELECT decile, n_customers, decile_spend_cents,
             SUM(decile_spend_cents::HUGEINT) OVER (ORDER BY decile)
               AS cum_spend,
             SUM(decile_spend_cents::HUGEINT) OVER () AS total_spend
      FROM per)
    SELECT decile, n_customers, decile_spend_cents,
           CAST(cum_spend * 1000000 // total_spend AS BIGINT)
             AS cum_share_ppm
    FROM cum ORDER BY decile
    """,
)
def customer_lorenz_deciles(spark: SparkSession, sf_dir: str):
    """Lorenz concentration curve of customer spend: exact spend deciles
    (operators/ranking.exact_ntile — range-bucketed distributed ranking,
    no fact-grain global window) and each decile's cumulative share of
    total spend in exact ppm. The pointwise view behind the repo's
    scalar inequality numbers (lineitem_gini_inequality,
    customer_theil_index): a curation/revenue team reads 'the top decile
    carries X%' straight off it. The only unpartitioned windows run on
    the 10-row decile grain — bounded at any corpus size
    (whitelisted in tests/test_plans.py)."""
    o = t(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_c")
    )
    tiled = exact_ntile(
        spend, 10, F.col("spend_c"), ["custkey"], "decile"
    )
    per = tiled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("spend_c").cast("bigint").alias("decile_spend_cents"),
    )
    from pyspark.sql import Window

    big = "decimal(38,0)"
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "decile",
        "n_customers",
        "decile_spend_cents",
        F.sum(F.col("decile_spend_cents").cast(big)).over(w_cum).alias(
            "cum_spend"
        ),
        F.sum(F.col("decile_spend_cents").cast(big)).over(w_all).alias(
            "total_spend"
        ),
    )
    return cum.select(
        "decile",
        "n_customers",
        "decile_spend_cents",
        F.expr(
            "CAST(cum_spend * 1000000 div total_spend AS BIGINT)"
        ).alias("cum_share_ppm"),
    ).orderBy("decile")


# ------------------------------------------------------------------
# 5. customer_theil_index — decomposable inequality scalar
# ------------------------------------------------------------------


@register(
    "customer_theil_index",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS spend_c
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(SUM(spend_c) AS HUGEINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n FROM spend),
    shares AS (
      SELECT CAST(spend_c::HUGEINT * 1000000000 // s AS BIGINT) AS p_ppb, n
      FROM spend CROSS JOIN tot),
    terms AS (
      SELECT n,
             CASE WHEN p_ppb > 0 THEN CAST(round(
               1e6 * (p_ppb / 1e9) * ln(p_ppb * CAST(n AS DOUBLE) / 1e9))
               AS BIGINT) ELSE 0 END AS term_micro,
             p_ppb
      FROM shares)
    SELECT MAX(n) AS n_customers,
           CAST(SUM(term_micro) AS BIGINT) AS theil_micro,
           CAST(MAX(p_ppb) AS BIGINT) AS max_share_ppb
    FROM terms
    """,
)
def customer_theil_index(spark: SparkSession, sf_dir: str):
    """Theil T index of customer spend — the decomposable inequality
    scalar (T = Σ (x/S)·ln(n·x/S)) that, unlike Gini, splits exactly
    into within-group + between-group terms, so a growth team can
    attribute concentration to segments. Same integer-quantization
    recipe as docs_js_divergence_sources: spend shares quantize to
    exact ppb against the one total (broadcast cross join, no collect),
    each customer contributes one ln on a ratio of exact integers
    micro-quantized before the sum — reproducible integer arithmetic,
    customer-grain all the way."""
    o = t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_c")
    )
    big = "decimal(38,0)"
    tot = spend.agg(
        F.sum(F.col("spend_c").cast(big)).alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    shares = spend.crossJoin(F.broadcast(tot)).select(
        F.expr(
            f"CAST(CAST(spend_c AS {big}) * 1000000000 div s AS BIGINT)"
        ).alias("p_ppb"),
        "n",
    )
    term = F.when(
        F.col("p_ppb") > 0,
        F.round(
            1e6
            * (F.col("p_ppb") / 1e9)
            * F.log(F.col("p_ppb") * F.col("n").cast("double") / 1e9)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return shares.select("n", term.alias("term_micro"), "p_ppb").agg(
        F.max("n").alias("n_customers"),
        F.sum("term_micro").cast("bigint").alias("theil_micro"),
        F.max("p_ppb").cast("bigint").alias("max_share_ppb"),
    )


# ------------------------------------------------------------------
# 6. graph_hits_bipartite — hubs & authorities on supplier→customer
# ------------------------------------------------------------------


@register(
    "graph_hits_bipartite",
    """
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    a1 AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY c),
    h1 AS (SELECT s, CAST(SUM(a) AS BIGINT) AS h
           FROM edges JOIN a1 USING (c) GROUP BY s),
    a2 AS (SELECT c, CAST(SUM(h) AS BIGINT) AS a
           FROM edges JOIN h1 USING (s) GROUP BY c),
    h2 AS (SELECT s, CAST(SUM(a) AS BIGINT) AS h
           FROM edges JOIN a2 USING (c) GROUP BY s)
    SELECT s_suppkey, s_name, h AS hub_score
    FROM h2 JOIN supplier ON s = s_suppkey
    ORDER BY hub_score DESC, s_suppkey LIMIT 10
    """,
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str):
    """HITS hubs-and-authorities on the supplier→customer shipment
    bipartite graph — two exact power-iteration steps (h ← Σ a ← Σ h,
    seeded h₀=1 so a₁ is the in-degree), the mutual-reinforcement
    ranking pagerank can't express: a supplier scores high for serving
    customers who are themselves served by strong suppliers. Scores
    stay exact unnormalized integers (counts of ≤3-step paths — both
    engines sum identical bigints; normalization would add a division
    per iteration with nothing to rank differently). The distinct edge
    list materializes once and is persisted across the three edge-grain
    joins; score tables are node-grain and broadcast. Top-10 with key
    tie-break."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .persist()
    )
    a1 = edges.groupBy("c").agg(F.count("*").cast("bigint").alias("a"))
    h1 = (
        edges.join(a1, "c")
        .groupBy("s")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    a2 = (
        edges.join(F.broadcast(h1), "s")
        .groupBy("c")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    h2 = (
        edges.join(a2, "c")
        .groupBy("s")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    return (
        h2.join(F.broadcast(s), F.col("s") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("h").alias("hub_score"))
        .orderBy(F.col("hub_score").desc(), "s_suppkey")
        .limit(10)
    )
