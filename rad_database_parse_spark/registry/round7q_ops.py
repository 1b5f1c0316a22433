"""Round-7q operators: split-conformal prediction intervals, greedy
submodular max-coverage, the Brown-Forsythe (Levene) variance test, a
Chow structural-break test, Yule's K lexical richness, and the LATERAL
join SQL surface.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. lineitem_conformal_interval_coverage — split conformal
# ------------------------------------------------------------------

_CONF_ALPHA_PCT = 10  # 90% target coverage


@register(
    "lineitem_conformal_interval_coverage",
    f"""
    WITH rows_ AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d,
             CAST(l_quantity AS BIGINT) AS q,
             l_orderkey % 2 AS half
      FROM lineitem),
    calcell AS (
      SELECT d, q, CAST(COUNT(*) AS BIGINT) AS c
      FROM rows_ WHERE half = 0 GROUP BY 1, 2),
    med AS (
      SELECT a.d, MIN(a.q) AS med_q
      FROM (
        SELECT i.d, i.q,
               SUM(j.c) AS cum,
               (SELECT SUM(c) FROM calcell k WHERE k.d = i.d) AS tot
        FROM calcell i JOIN calcell j ON j.d = i.d AND j.q <= i.q
        GROUP BY 1, 2) a
      WHERE a.cum * 2 >= a.tot GROUP BY 1),
    resid AS (
      SELECT CASE WHEN r.q >= m.med_q THEN r.q - m.med_q
             ELSE m.med_q - r.q END AS e
      FROM rows_ r JOIN med m ON m.d = r.d WHERE r.half = 0),
    rc AS (SELECT e, CAST(COUNT(*) AS BIGINT) AS c FROM resid GROUP BY 1),
    ntot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_cal FROM rc),
    qhat AS (
      SELECT MIN(cq.e) AS radius
      FROM (SELECT i.e, SUM(j.c) AS cum
            FROM rc i JOIN rc j ON j.e <= i.e GROUP BY 1) cq
      CROSS JOIN ntot
      WHERE cq.cum * 100 >= (ntot.n_cal + 1) * (100 - {_CONF_ALPHA_PCT})),
    ev AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN (CASE WHEN r.q >= m.med_q
                 THEN r.q - m.med_q ELSE m.med_q - r.q END)
                 <= (SELECT radius FROM qhat) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_covered
      FROM rows_ r JOIN med m ON m.d = r.d WHERE r.half = 1)
    SELECT (SELECT n_cal FROM ntot) AS n_cal,
           n_eval,
           (SELECT CAST(radius AS BIGINT) FROM qhat) AS radius_qty,
           CAST(n_covered * 1000000 // n_eval AS BIGINT)
             AS coverage_ppm
    FROM ev
    """,
)
def lineitem_conformal_interval_coverage(
    spark: SparkSession, sf_dir: str
):
    """Split-conformal prediction interval with its finite-sample
    coverage guarantee, checked empirically: the calibration half
    (even order keys) fits a per-discount median-quantity predictor
    and takes the ceil((n+1)(1-alpha))-quantile of its absolute
    residuals as the interval radius; the evaluation half then
    measures realized coverage, which conformal theory guarantees
    >= 90% regardless of the model's quality — the
    distribution-free uncertainty wrapper modern ML serving uses.
    Everything is EXACT: quantity's bounded domain means the
    per-cell medians and the residual quantile come from cumulative
    counts on <=550- and <=51-row grains (bounded self-joins, no
    global sort, no windows); coverage is one conditional aggregate
    per half. Two fact scans (one per half), constant-size joins
    broadcast back."""
    li = t(spark, sf_dir, "lineitem")
    rows_ = li.select(
        (dec("l_discount") * 100).cast("bigint").alias("d"),
        F.col("l_quantity").cast("bigint").alias("q"),
        (F.col("l_orderkey") % 2).alias("half"),
    )
    calcell = (
        rows_.filter(F.col("half") == 0)
        .groupBy("d", "q")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    cc2 = calcell.select(
        F.col("d").alias("d2"), F.col("q").alias("q2"), F.col("c").alias("c2")
    )
    dtot = calcell.groupBy("d").agg(F.sum("c").alias("tot"))
    med = (
        calcell.join(
            cc2,
            (F.col("d2") == F.col("d")) & (F.col("q2") <= F.col("q")),
        )
        .groupBy("d", "q")
        .agg(F.sum("c2").alias("cum"))
        .join(dtot, "d")
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("d")
        .agg(F.min("q").alias("med_q"))
    )
    resid = (
        rows_.filter(F.col("half") == 0)
        .join(F.broadcast(med), "d")
        .select(
            F.expr(
                "CASE WHEN q >= med_q THEN q - med_q"
                " ELSE med_q - q END"
            ).alias("e")
        )
    )
    rc = resid.groupBy("e").agg(
        F.count("*").cast("bigint").alias("c")
    )
    rc2 = rc.select(F.col("e").alias("e2"), F.col("c").alias("c2"))
    ntot = rc.agg(F.sum("c").cast("bigint").alias("n_cal"))
    qhat = (
        rc.join(rc2, F.col("e2") <= F.col("e"))
        .groupBy("e")
        .agg(F.sum("c2").alias("cum"))
        .crossJoin(F.broadcast(ntot))
        .filter(
            F.col("cum") * 100
            >= (F.col("n_cal") + 1) * (100 - _CONF_ALPHA_PCT)
        )
        .agg(F.min("e").alias("radius"))
    )
    ev = (
        rows_.filter(F.col("half") == 1)
        .join(F.broadcast(med), "d")
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.sum(
                F.when(
                    F.expr(
                        "(CASE WHEN q >= med_q THEN q - med_q"
                        " ELSE med_q - q END) <= radius"
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    rad = qhat.select(F.col("radius").cast("bigint").alias("radius_qty"))
    return (
        ev.crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(rad))
        .select(
            "n_cal",
            "n_eval",
            "radius_qty",
            F.expr(
                "CAST(n_covered * 1000000 div n_eval AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


# ------------------------------------------------------------------
# 2. customer_coverage_greedy_brands — submodular max-coverage
# ------------------------------------------------------------------

_COV_ROUNDS = 4


def _cov_oracle() -> str:
    steps = []
    prev_p = "p0"
    picks = []
    for k in range(1, _COV_ROUNDS + 1):
        steps.append(
            f"""
    gain{k} AS (
      SELECT bb.bit AS brand_bit, bb.brand,
             CAST(COALESCE(SUM(CASE WHEN (h.mask & (1 << bb.bit)) != 0
               AND (h.mask & pp.p) = 0 THEN h.cnt END), 0) AS BIGINT)
               AS gain
      FROM bits bb CROSS JOIN {prev_p} pp LEFT JOIN hist h ON TRUE
      GROUP BY 1, 2),
    pick{k} AS (
      SELECT brand_bit, brand, gain FROM gain{k}
      ORDER BY gain DESC, brand LIMIT 1),
    p{k} AS (
      SELECT pp.p | (1 << pk.brand_bit) AS p
      FROM {prev_p} pp CROSS JOIN pick{k} pk)"""
        )
        picks.append(
            f"""SELECT {k} AS pick_order, pk.brand, pk.gain,
             (SELECT CAST(SUM(h.cnt) AS BIGINT) FROM hist h, p{k} pp
              WHERE (h.mask & pp.p) != 0) AS cumulative_covered
           FROM pick{k} pk"""
        )
        prev_p = f"p{k}"
    return f"""
    WITH baskets AS (
      SELECT DISTINCT o_custkey AS cust, p.p_brand AS brand
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part p ON p.p_partkey = l_partkey),
    bits AS (
      SELECT brand, CAST(ROW_NUMBER() OVER (ORDER BY brand) - 1
        AS BIGINT) AS bit
      FROM (SELECT DISTINCT brand FROM baskets)),
    masks AS (
      SELECT b.cust, bit_or(1 << bb.bit) AS mask
      FROM baskets b JOIN bits bb ON bb.brand = b.brand
      GROUP BY 1),
    hist AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM masks GROUP BY 1),
    p0 AS (SELECT CAST(0 AS BIGINT) AS p),
    {','.join(steps)}
    SELECT CAST(pick_order AS BIGINT) AS pick_order, brand,
           gain AS marginal_new_customers, cumulative_covered
    FROM ({' UNION ALL '.join(picks)})
    ORDER BY pick_order
    """


@register("customer_coverage_greedy_brands", _cov_oracle())
def customer_coverage_greedy_brands(spark: SparkSession, sf_dir: str):
    """Greedy submodular max-coverage: pick {_COV_ROUNDS} brands that
    together reach the most distinct customers — assortment/campaign
    planning's canonical NP-hard problem, where the greedy
    marginal-gain algorithm carries the classic (1 - 1/e)
    approximation guarantee. Scale design (re-planned r7: the
    covered-set anti-join form measured 8.9s at sf0.1; this form
    ~1s): brands are bounded at 25, so each customer's assortment
    packs into ONE integer bitmask (bit_or aggregate), the mask
    HISTOGRAM is the only state the greedy rounds touch, and
    'covered' is a 1-row mask carried by cross join — after one
    fact-grain aggregate, each round is a bounded
    (masks x 25 brands) scan with bitwise tests, zero fact
    re-scans, zero per-round caching of customer sets. Diminishing
    marginal gains in the output are the submodularity made
    visible."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part")
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
        .persist()
    )
    bits = (
        baskets.select("brand")
        .distinct()
        .select(
            "brand",
            (
                F.row_number().over(Window.orderBy("brand")) - 1
            )
            .cast("bigint")
            .alias("bit"),
        )
    )
    # bits is 25 rows but its lineage is the fact-grain basket join —
    # persist so the per-round broadcast replays 25 cached rows
    # (unpersisted, the r7 bench measured 11.7s: four fact re-joins)
    bits = bits.persist()
    masks = (
        baskets.join(F.broadcast(bits), "brand")
        .groupBy("cust")
        .agg(F.expr("bit_or(1 << CAST(bit AS INT))").alias("mask"))
    )
    hist = masks.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # the greedy rounds iterate DRIVER-SIDE over the collected mask
    # histogram (VERDICT r6 item 5, the Markov-ops pattern): the
    # histogram is bounded in CORPUS size — at most 2^25 distinct
    # masks over the <=25 brand bits, in practice <= the number of
    # distinct assortments, concentrated far below the bound — while
    # each Spark-job round paid ~3 sequential broadcast-exchange
    # stages of pure scheduling latency (measured 11.6s at sf0.1;
    # this form ~1.5s).  Python big-int bit ops mirror the oracle's
    # mask algebra exactly.
    H = [(int(r["mask"]), int(r["cnt"])) for r in hist.collect()]
    brand_of = {int(r["bit"]): r["brand"] for r in bits.collect()}
    p = 0
    rows = []
    for k in range(1, _COV_ROUNDS + 1):
        gains = {b: 0 for b in brand_of}
        for mask, cnt in H:
            if mask & p:
                continue
            mm = mask
            while mm:
                low = mm & -mm
                gains[low.bit_length() - 1] += cnt
                mm ^= low
        # ORDER BY gain DESC, brand LIMIT 1
        best = min(gains, key=lambda b: (-gains[b], brand_of[b]))
        p |= 1 << best
        covered = sum(cnt for mask, cnt in H if mask & p)
        rows.append((k, brand_of[best], gains[best], covered))
    return spark.createDataFrame(
        rows,
        "pick_order bigint, brand string,"
        " marginal_new_customers bigint, cumulative_covered bigint",
    ).orderBy("pick_order")


# ------------------------------------------------------------------
# 3. lineitem_levene_variance_test — Brown-Forsythe
# ------------------------------------------------------------------


@register(
    "lineitem_levene_variance_test",
    """
    WITH cells AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    med AS (
      SELECT a.g, MIN(a.q) AS med_q
      FROM (
        SELECT i.g, i.q, SUM(j.c) AS cum,
               (SELECT SUM(c) FROM cells k WHERE k.g = i.g) AS tot
        FROM cells i JOIN cells j ON j.g = i.g AND j.q <= i.q
        GROUP BY 1, 2) a
      WHERE a.cum * 2 >= a.tot GROUP BY 1),
    z AS (
      SELECT c.g, c.c,
             CASE WHEN c.q >= m.med_q THEN c.q - m.med_q
             ELSE m.med_q - c.q END AS z
      FROM cells c JOIN med m ON m.g = c.g),
    grp AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * z) AS BIGINT) AS sz,
             CAST(SUM(c * z * z) AS BIGINT) AS szz
      FROM z GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(sz) AS BIGINT) AS szt,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(sz AS HUGEINT) * sz * 1000000 // n) AS btw_part,
             SUM(szz - CAST(sz AS HUGEINT) * sz // n) AS wthn
      FROM grp)
    SELECT nn AS n_rows, k AS n_groups,
           CAST(round(1e3
             * (CAST(btw_part - CAST(szt AS HUGEINT) * szt * 1000000
                     // nn AS DOUBLE) / 1e6 / (k - 1))
             / (CAST(wthn AS DOUBLE) / (nn - k))) AS BIGINT)
             AS bf_stat_milli,
           CAST(CASE WHEN (CAST(btw_part - CAST(szt AS HUGEINT) * szt
                     * 1000000 // nn AS DOUBLE) / 1e6 / (k - 1))
             / (CAST(wthn AS DOUBLE) / (nn - k)) > 3.0
             THEN 1 ELSE 0 END AS INT) AS heteroscedastic_5pct
    FROM tot
    """,
)
def lineitem_levene_variance_test(spark: SparkSession, sf_dir: str):
    """Brown-Forsythe test (Levene with median centers — the
    robust-to-skew variant) for equality of quantity VARIANCE across
    return-flag groups: ANOVA's F applied to the absolute deviations
    z = |q - median_g|, the assumption check that decides whether
    pooled-variance tests (segment ANOVA, t-tests already in the
    tier) are trustworthy. Quantity's bounded domain makes the whole
    test exact-by-construction: per-group medians from cumulative
    counts on the <=150-row (group, q) cell grain (bounded
    self-join, no sort), z-moments as integer cell folds widened
    through HUGEINT/decimal(38,0), one double division at the end.
    One fact scan; everything after is constant-size."""
    li = t(spark, sf_dir, "lineitem")
    big = "decimal(38,0)"
    cells = li.groupBy(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("bigint").alias("q"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    c2 = cells.select(
        F.col("g").alias("g2"), F.col("q").alias("q2"), F.col("c").alias("c2")
    )
    gtot = cells.groupBy("g").agg(F.sum("c").alias("tot"))
    med = (
        cells.join(
            c2, (F.col("g2") == F.col("g")) & (F.col("q2") <= F.col("q"))
        )
        .groupBy("g", "q")
        .agg(F.sum("c2").alias("cum"))
        .join(gtot, "g")
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("q").alias("med_q"))
    )
    z = cells.join(F.broadcast(med), "g").select(
        "g",
        "c",
        F.expr(
            "CASE WHEN q >= med_q THEN q - med_q"
            " ELSE med_q - q END"
        ).alias("z"),
    )
    grp = z.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("z")).cast("bigint").alias("sz"),
        F.sum(F.col("c") * F.col("z") * F.col("z"))
        .cast("bigint")
        .alias("szz"),
    )
    tot = grp.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("sz").cast("bigint").alias("szt"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(
            F.expr(
                "CAST(sz AS DECIMAL(38,0)) * sz * 1000000 div n"
            )
        ).alias("btw_part"),
        F.sum(
            F.expr("szz - CAST(sz AS DECIMAL(38,0)) * sz div n")
        ).alias("wthn"),
    )
    bf = (
        "(CAST(btw_part - CAST(szt AS DECIMAL(38,0)) * szt * 1000000"
        " div nn AS DOUBLE) / 1e6 / (k - 1))"
        " / (CAST(wthn AS DOUBLE) / (nn - k))"
    )
    return tot.select(
        F.col("nn").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.expr(f"CAST(round(1e3 * {bf}) AS BIGINT)").alias(
            "bf_stat_milli"
        ),
        F.expr(
            f"CAST(CASE WHEN {bf} > 3.0 THEN 1 ELSE 0 END AS INT)"
        ).alias("heteroscedastic_5pct"),
    )


# ------------------------------------------------------------------
# 4. orders_chow_break_test — structural break at midpoint
# ------------------------------------------------------------------


def _chow_regime(pred: str) -> str:
    # exact per-regime OLS RSS from conditional moments (micro RSS)
    return f"""
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM tt WHERE {pred}"""


@register(
    "orders_chow_break_test",
    f"""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    bounds AS (
      SELECT MIN(ym) AS lo, (MIN(ym) + MAX(ym)) // 2 AS mid FROM m),
    tt AS (
      SELECT m.ym - b.lo AS x, m.y, m.ym < b.mid AS pre
      FROM m CROSS JOIN bounds b),
    r1 AS ({_chow_regime('pre')}),
    r2 AS ({_chow_regime('NOT pre')}),
    rp AS ({_chow_regime('TRUE')}),
    rss AS (
      SELECT
        (SELECT CAST(syy * (n * sxx - sx * sx) - (n * sxy - sx * sy)
           * sxy - (sy * sxx - sx * sxy) * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) FROM r1) AS rss1,
        (SELECT CAST(syy * (n * sxx - sx * sx) - (n * sxy - sx * sy)
           * sxy - (sy * sxx - sx * sxy) * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) FROM r2) AS rss2,
        (SELECT CAST(syy * (n * sxx - sx * sx) - (n * sxy - sx * sy)
           * sxy - (sy * sxx - sx * sxy) * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) FROM rp) AS rssp,
        (SELECT CAST(n AS BIGINT) FROM rp) AS n,
        (SELECT CAST(mid AS BIGINT) FROM bounds) AS break_ym)
    SELECT n AS n_months, break_ym,
           CAST(round(1e3 * ((rssp - rss1 - rss2) / 2)
             / ((rss1 + rss2) / (n - 4))) AS BIGINT) AS f_stat_milli,
           CAST(CASE WHEN ((rssp - rss1 - rss2) / 2)
             / ((rss1 + rss2) / (n - 4)) > 3.0 THEN 1 ELSE 0 END
             AS INT) AS break_5pct
    FROM rss
    """,
)
def orders_chow_break_test(spark: SparkSession, sf_dir: str):
    """Chow test for a structural break in the monthly revenue trend
    at the calendar midpoint: fit the linear trend separately on each
    half and pooled, and F-test whether the two regimes' residual
    sums are small enough relative to the pooled fit to justify the
    extra parameters — the regime-change detector that says whether
    one global trend model is even admissible (the parametric
    complement to the nonparametric CUSUM/Page-Hinkley detectors in
    the tier). Each regime's RSS comes from one conditional-moment
    pass in HUGEINT/decimal(38,0) via the closed form RSS =
    [syy(n sxx - sx^2) - (n sxy - sx sy) sxy - (sy sxx - sx sxy) sy]
    / (n sxx - sx^2) — no residual materialization at all; doubles
    enter once per regime on identically-reduced integers. One fact
    scan to month grain, three 1-row folds."""
    o = t(spark, sf_dir, "orders")
    big = "decimal(38,0)"
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "ym"
        )
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    bounds = m.agg(
        F.min("ym").alias("lo"),
        F.expr("(MIN(ym) + MAX(ym)) div 2").alias("mid"),
    )
    tt = m.crossJoin(F.broadcast(bounds)).select(
        (F.col("ym") - F.col("lo")).alias("x"),
        "y",
        (F.col("ym") < F.col("mid")).alias("pre"),
    )

    def regime(pred):
        return tt.filter(F.expr(pred)).agg(
            F.count("*").cast(big).alias("n"),
            F.sum("x").cast(big).alias("sx"),
            F.sum("y").cast(big).alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast(big).alias("sxx"),
            F.sum(F.col("x").cast(big) * F.col("y")).alias("sxy"),
            F.sum(F.col("y").cast(big) * F.col("y")).alias("syy"),
        ).select(
            F.expr(
                "CAST(syy * (n * sxx - sx * sx) - (n * sxy - sx * sy)"
                " * sxy - (sy * sxx - sx * sxy) * sy AS DOUBLE)"
                " / CAST(n * sxx - sx * sx AS DOUBLE)"
            ).alias("rss"),
            F.expr("CAST(n AS BIGINT)").alias("n"),
        )

    r1 = regime("pre").select(F.col("rss").alias("rss1"))
    r2 = regime("NOT pre").select(F.col("rss").alias("rss2"))
    rp = regime("TRUE").select(
        F.col("rss").alias("rssp"), F.col("n").alias("n_months")
    )
    brk = bounds.select(
        F.col("mid").cast("bigint").alias("break_ym")
    )
    f = "((rssp - rss1 - rss2) / 2) / ((rss1 + rss2) / (n_months - 4))"
    return (
        rp.crossJoin(F.broadcast(r1))
        .crossJoin(F.broadcast(r2))
        .crossJoin(F.broadcast(brk))
        .select(
            "n_months",
            "break_ym",
            F.expr(f"CAST(round(1e3 * {f}) AS BIGINT)").alias(
                "f_stat_milli"
            ),
            F.expr(
                f"CAST(CASE WHEN {f} > 3.0 THEN 1 ELSE 0 END AS INT)"
            ).alias("break_5pct"),
        )
    )


# ------------------------------------------------------------------
# 5. docs_yule_k_richness — lexical richness profile
# ------------------------------------------------------------------


@register(
    "docs_yule_k_richness",
    """
    WITH toks AS (
      SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
    counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS r
      FROM toks WHERE w != '' GROUP BY 1),
    agg AS (
      SELECT CAST(SUM(r) AS HUGEINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS v,
             SUM(CAST(r AS HUGEINT) * r) AS s2,
             CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax
      FROM counts)
    SELECT CAST(n AS BIGINT) AS n_tokens, v AS n_types,
           CAST(v * 1000000 // n AS BIGINT) AS ttr_ppm,
           CAST(hapax * 1000000 // v AS BIGINT) AS hapax_share_ppm,
           CAST((s2 - n) * 10000000 // (n * n) AS BIGINT)
             AS yule_k_milli
    FROM agg
    """,
)
def docs_yule_k_richness(spark: SparkSession, sf_dir: str):
    """Lexical richness profile of the corpus: Yule's K
    (10^4 (sum r^2 N_r - N) / N^2 — repeat-rate based, famously
    length-invariant where raw type-token ratio is not), the TTR
    itself, and the hapax share — the trio a data-curation pipeline
    reads to judge vocabulary diversity and boilerplate load before
    tokenizer training (K complements docs_zipf_rank_freq's slope:
    same law, different sufficient statistic). Token explode is the
    only fact-grain work; everything else is one fold over the type
    counts with the r^2 sum widened through HUGEINT/decimal(38,0)
    (the square of a 1e8-count token passes 1e16). Exact
    milli/ppm integer output."""
    d = t(spark, sf_dir, "documents")
    big = "decimal(38,0)"
    toks = d.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w")
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(
        F.count("*").cast("bigint").alias("r")
    )
    agg = counts.agg(
        F.sum("r").cast(big).alias("n"),
        F.count("*").cast("bigint").alias("v"),
        F.sum(F.col("r").cast(big) * F.col("r")).alias("s2"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
    )
    return agg.select(
        F.expr("CAST(n AS BIGINT)").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.expr("CAST(v * 1000000 div n AS BIGINT)").alias("ttr_ppm"),
        F.expr("CAST(hapax * 1000000 div v AS BIGINT)").alias(
            "hapax_share_ppm"
        ),
        F.expr(
            "CAST((s2 - n) * 10000000 div (n * n) AS BIGINT)"
        ).alias("yule_k_milli"),
    )


# ------------------------------------------------------------------
# 6. sql_lateral_topn_per_nation — LATERAL join SQL surface
# ------------------------------------------------------------------


@register(
    "sql_lateral_topn_per_nation",
    """
    SELECT n.n_name AS nation, tc.c_name,
           tc.bal_cents
    FROM nation n,
    LATERAL (SELECT c_name,
                    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                      AS BIGINT) AS bal_cents
             FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) tc
    ORDER BY nation, bal_cents DESC, c_name
    """,
)
def sql_lateral_topn_per_nation(spark: SparkSession, sf_dir: str):
    """LATERAL (correlated table subquery) SQL-surface parity: top-2
    customers by balance per nation expressed as a per-row dependent
    subquery with ORDER BY + LIMIT — the third textual-SQL dialect
    check after pipe syntax and GROUP BY ALL, exercising Spark 4's
    LATERAL correlated decorrelation (Catalyst rewrites it to a
    ranked join; the result is plan-equivalent to the row_number
    form but the SOURCE is the standard SQL users actually port).
    Both engines run the identical statement text over registered
    views."""
    t(spark, sf_dir, "nation").createOrReplaceTempView(
        "sql_lat_nation"
    )
    t(spark, sf_dir, "customer").createOrReplaceTempView(
        "sql_lat_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name AS nation, tc.c_name, tc.bal_cents
        FROM sql_lat_nation n,
        LATERAL (SELECT c_name,
                        CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                          AS BIGINT) AS bal_cents
                 FROM sql_lat_customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) tc
        ORDER BY nation, bal_cents DESC, c_name
        """
    )
