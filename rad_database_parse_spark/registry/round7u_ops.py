"""Round-7u operators: chain-ladder cohort projection, disparate
impact and equalized-odds fairness audits, revealed comparative
advantage, lexicon-based content filtering, and a power-law tail MLE.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. orders_chain_ladder_projection — development-triangle reserve
# ------------------------------------------------------------------

_CL_MAX_DEV = 6


@register(
    "orders_chain_ladder_projection",
    f"""
    WITH first_m AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS cm
      FROM orders GROUP BY 1),
    tri AS (
      SELECT f.cm AS cohort,
             LEAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
               - f.cm, {_CL_MAX_DEV}) AS dev,
             CAST(COUNT(*) AS BIGINT) AS inc
      FROM orders o JOIN first_m f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2),
    gmax AS (SELECT MAX(cohort) AS gm FROM tri),
    cum AS (
      SELECT a.cohort, a.dev,
             CAST(SUM(b.inc) AS BIGINT) AS c
      FROM tri a JOIN tri b
        ON b.cohort = a.cohort AND b.dev <= a.dev
      GROUP BY 1, 2),
    factors AS (
      SELECT p.dev AS from_dev,
             CAST(SUM(n.c) * 1000000 // SUM(p.c) AS BIGINT)
               AS f_micro
      FROM cum p
      JOIN cum n ON n.cohort = p.cohort AND n.dev = p.dev + 1
      CROSS JOIN gmax g
      WHERE p.cohort + p.dev + 1 <= g.gm
      GROUP BY 1),
    latest AS (
      SELECT c.cohort, MAX(c.dev) AS dev
      FROM cum c CROSS JOIN gmax g
      WHERE c.cohort + c.dev <= g.gm
      GROUP BY 1),
    proj AS (
      SELECT l.cohort, l.dev AS observed_dev, c.c AS observed_cum,
             CAST(COALESCE(SUM(CAST(round(1e6
               * ln(f.f_micro / 1e6)) AS BIGINT)), 0) AS BIGINT)
               AS lnfac_micro
      FROM latest l
      JOIN cum c ON c.cohort = l.cohort AND c.dev = l.dev
      LEFT JOIN factors f ON f.from_dev >= l.dev
      GROUP BY 1, 2, 3)
    SELECT cohort AS cohort_ym, observed_dev, observed_cum,
           CAST(round(observed_cum * exp(lnfac_micro / 1e6))
             AS BIGINT) AS ultimate_orders,
           CAST(round(observed_cum * exp(lnfac_micro / 1e6))
             - observed_cum AS BIGINT) AS ibnr_orders
    FROM proj
    ORDER BY cohort
    """,
)
def orders_chain_ladder_projection(spark: SparkSession, sf_dir: str):
    """Chain-ladder projection of each customer cohort's ULTIMATE
    order count — the actuarial reserving method (development
    triangle -> age-to-age factors -> project the open diagonal)
    applied to cohort maturation: young cohorts' order counts are
    right-truncated, and the volume-weighted development factors
    from completed cohort pairs fill in the unseen tail (IBNR =
    'incurred but not reported' growth still coming). Triangle,
    factors, and diagonal all live on the bounded (cohort x dev)
    grain after one fact pass + a customer-grain first-order join;
    the remaining-factor PRODUCT accumulates as micro-quantized
    log-factors (Greenwood's parity pattern) with one exp per
    output row. Development capped at {_CL_MAX_DEV} periods."""
    o = t(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.min(
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("cm")
    )
    tri = (
        o.join(first_m, "o_custkey")
        .groupBy(
            F.col("cm").alias("cohort"),
            F.least(
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
                - F.col("cm"),
                F.lit(_CL_MAX_DEV),
            ).alias("dev"),
        )
        .agg(F.count("*").cast("bigint").alias("inc"))
    )
    tri = tri.persist()
    gmax = tri.agg(F.max("cohort").alias("gm"))
    b = tri.select(
        F.col("cohort").alias("c2"),
        F.col("dev").alias("d2"),
        F.col("inc").alias("i2"),
    )
    cum = (
        tri.join(
            b,
            (F.col("c2") == F.col("cohort"))
            & (F.col("d2") <= F.col("dev")),
        )
        .groupBy("cohort", "dev")
        .agg(F.sum("i2").cast("bigint").alias("c"))
    )
    cum = cum.persist()
    nxt = cum.select(
        F.col("cohort").alias("cn"),
        (F.col("dev") - 1).alias("dn"),
        F.col("c").alias("c_next"),
    )
    factors = (
        cum.join(
            nxt,
            (F.col("cn") == F.col("cohort"))
            & (F.col("dn") == F.col("dev")),
        )
        .crossJoin(F.broadcast(gmax))
        .filter(F.col("cohort") + F.col("dev") + 1 <= F.col("gm"))
        .groupBy(F.col("dev").alias("from_dev"))
        .agg(
            F.expr(
                "CAST(SUM(c_next) * 1000000 div SUM(c) AS BIGINT)"
            ).alias("f_micro")
        )
    )
    latest = (
        cum.crossJoin(F.broadcast(gmax))
        .filter(F.col("cohort") + F.col("dev") <= F.col("gm"))
        .groupBy("cohort")
        .agg(F.max("dev").alias("dev"))
    )
    proj = (
        latest.join(cum, ["cohort", "dev"])
        .join(
            F.broadcast(factors),
            F.col("from_dev") >= F.col("dev"),
            "left",
        )
        .groupBy(
            F.col("cohort").alias("cohort_ym"),
            F.col("dev").alias("observed_dev"),
            F.col("c").alias("observed_cum"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(round(1e6 * ln(f_micro / 1e6))"
                        " AS BIGINT)"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("lnfac_micro")
        )
    )
    return proj.select(
        "cohort_ym",
        "observed_dev",
        "observed_cum",
        F.expr(
            "CAST(round(observed_cum * exp(lnfac_micro / 1e6))"
            " AS BIGINT)"
        ).alias("ultimate_orders"),
        F.expr(
            "CAST(round(observed_cum * exp(lnfac_micro / 1e6))"
            " - observed_cum AS BIGINT)"
        ).alias("ibnr_orders"),
    ).orderBy("cohort_ym")


# ------------------------------------------------------------------
# 2. customer_disparate_impact_audit — four-fifths rule
# ------------------------------------------------------------------


@register(
    "customer_disparate_impact_audit",
    """
    WITH outc AS (
      SELECT c.c_custkey, c.c_mktsegment AS grp,
             CASE WHEN COUNT(CASE WHEN o.o_orderpriority = '1-URGENT'
                  THEN 1 END) > 0 THEN 1 ELSE 0 END AS favorable
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    rates AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(favorable) AS BIGINT) AS n_fav,
             CAST(SUM(favorable) * 1000000 // COUNT(*) AS BIGINT)
               AS rate_ppm
      FROM outc GROUP BY 1),
    ref AS (SELECT MAX(rate_ppm) AS ref_rate FROM rates)
    SELECT grp AS segment, n AS n_customers, n_fav AS n_favorable,
           rate_ppm AS selection_rate_ppm,
           CAST(rate_ppm * 1000000 // (SELECT ref_rate FROM ref)
             AS BIGINT) AS impact_ratio_ppm,
           CAST(CASE WHEN rate_ppm * 1000000
                 // (SELECT ref_rate FROM ref) < 800000
                THEN 1 ELSE 0 END AS INT) AS four_fifths_violation
    FROM rates ORDER BY segment
    """,
)
def customer_disparate_impact_audit(spark: SparkSession, sf_dir: str):
    """Disparate-impact audit with the four-fifths rule — the
    baseline fairness screen (EEOC's adverse-impact test, and the
    first number any responsible-ML review asks for): per group
    (market segment standing in for the protected attribute), the
    favorable-outcome selection rate (ever placed an URGENT order),
    the impact ratio against the highest-rate group, and a flag
    where the ratio falls below 80%. Customer-grain conditional
    aggregate -> bounded group table -> one 1-row reference join;
    zero-order customers stay in the denominators via the left
    join. Exact ppm; the ratio-of-ratios truncates identically in
    both engines."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    outc = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", F.col("c_mktsegment").alias("grp"))
        .agg(
            F.when(
                F.count(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT", 1
                    )
                )
                > 0,
                1,
            )
            .otherwise(0)
            .alias("favorable")
        )
    )
    rates = outc.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("favorable").cast("bigint").alias("n_fav"),
        F.expr(
            "CAST(SUM(favorable) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("rate_ppm"),
    )
    ref = rates.agg(F.max("rate_ppm").alias("ref_rate"))
    return (
        rates.crossJoin(F.broadcast(ref))
        .select(
            F.col("grp").alias("segment"),
            F.col("n").alias("n_customers"),
            F.col("n_fav").alias("n_favorable"),
            F.col("rate_ppm").alias("selection_rate_ppm"),
            F.expr(
                "CAST(rate_ppm * 1000000 div ref_rate AS BIGINT)"
            ).alias("impact_ratio_ppm"),
            F.expr(
                "CAST(CASE WHEN rate_ppm * 1000000 div ref_rate"
                " < 800000 THEN 1 ELSE 0 END AS INT)"
            ).alias("four_fifths_violation"),
        )
        .orderBy("segment")
    )


# ------------------------------------------------------------------
# 3. customer_equalized_odds_audit — TPR/FPR parity per group
# ------------------------------------------------------------------


@register(
    "customer_equalized_odds_audit",
    """
    WITH base AS (
      SELECT c.c_custkey, c.c_mktsegment AS grp,
             CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END AS pred,
             CASE WHEN COUNT(CASE WHEN o.o_orderpriority = '1-URGENT'
                  THEN 1 END) > 0 THEN 1 ELSE 0 END AS actual
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    conf AS (
      SELECT grp,
             CAST(SUM(pred * actual) AS BIGINT) AS tp,
             CAST(SUM(pred * (1 - actual)) AS BIGINT) AS fp,
             CAST(SUM((1 - pred) * actual) AS BIGINT) AS fn,
             CAST(SUM((1 - pred) * (1 - actual)) AS BIGINT) AS tn
      FROM base GROUP BY 1),
    r AS (
      SELECT grp,
             CAST(tp * 1000000 // GREATEST(tp + fn, 1) AS BIGINT)
               AS tpr_ppm,
             CAST(fp * 1000000 // GREATEST(fp + tn, 1) AS BIGINT)
               AS fpr_ppm,
             tp + fp + fn + tn AS n
      FROM conf),
    spread AS (
      SELECT MAX(tpr_ppm) - MIN(tpr_ppm) AS tpr_gap,
             MAX(fpr_ppm) - MIN(fpr_ppm) AS fpr_gap
      FROM r)
    SELECT grp AS segment, CAST(n AS BIGINT) AS n_customers,
           tpr_ppm, fpr_ppm,
           CAST((SELECT tpr_gap FROM spread) AS BIGINT)
             AS max_tpr_gap_ppm,
           CAST((SELECT fpr_gap FROM spread) AS BIGINT)
             AS max_fpr_gap_ppm,
           CAST(CASE WHEN (SELECT tpr_gap FROM spread) > 50000
                  OR (SELECT fpr_gap FROM spread) > 50000
                THEN 1 ELSE 0 END AS INT) AS odds_violation
    FROM r ORDER BY segment
    """,
)
def customer_equalized_odds_audit(spark: SparkSession, sf_dir: str):
    """Equalized-odds audit: does a simple screening rule (positive
    account balance predicts 'will place an urgent order') have the
    same TRUE-positive and FALSE-positive rates in every market
    segment? Disparate impact (the sibling op) only checks selection
    RATES; equalized odds is the stricter criterion that catches a
    rule which selects equally often but errs asymmetrically across
    groups. Per-group confusion matrices come from one customer-grain
    conditional aggregate; TPR/FPR are exact ppm, and the audit flag
    fires when either rate spreads more than 5 points across groups.
    The worst-case gaps repeat per row (dashboard shape: every group
    row carries the global verdict)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    base = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            "c_custkey",
            F.col("c_mktsegment").alias("grp"),
            F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias(
                "pred"
            ),
        )
        .agg(
            F.when(
                F.count(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT", 1
                    )
                )
                > 0,
                1,
            )
            .otherwise(0)
            .alias("actual")
        )
    )
    conf = base.groupBy("grp").agg(
        F.sum(F.col("pred") * F.col("actual"))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("actual")))
        .cast("bigint")
        .alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("actual"))
        .cast("bigint")
        .alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("actual")))
        .cast("bigint")
        .alias("tn"),
    )
    r = conf.select(
        "grp",
        F.expr(
            "CAST(tp * 1000000 div GREATEST(tp + fn, 1) AS BIGINT)"
        ).alias("tpr_ppm"),
        F.expr(
            "CAST(fp * 1000000 div GREATEST(fp + tn, 1) AS BIGINT)"
        ).alias("fpr_ppm"),
        (
            F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
        ).alias("n"),
    )
    spread = r.agg(
        (F.max("tpr_ppm") - F.min("tpr_ppm")).alias("tpr_gap"),
        (F.max("fpr_ppm") - F.min("fpr_ppm")).alias("fpr_gap"),
    )
    return (
        r.crossJoin(F.broadcast(spread))
        .select(
            F.col("grp").alias("segment"),
            F.col("n").cast("bigint").alias("n_customers"),
            "tpr_ppm",
            "fpr_ppm",
            F.col("tpr_gap").cast("bigint").alias("max_tpr_gap_ppm"),
            F.col("fpr_gap").cast("bigint").alias("max_fpr_gap_ppm"),
            F.expr(
                "CAST(CASE WHEN tpr_gap > 50000 OR fpr_gap > 50000"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("odds_violation"),
        )
        .orderBy("segment")
    )


# ------------------------------------------------------------------
# 4. nation_rca_specialization — revealed comparative advantage
# ------------------------------------------------------------------

_RCA_TOPK = 15


@register(
    "nation_rca_specialization",
    f"""
    WITH flows AS (
      SELECT s.s_nationkey AS nat, p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS x
      FROM lineitem
      JOIN supplier s ON s.s_suppkey = l_suppkey
      JOIN part p ON p.p_partkey = l_partkey
      GROUP BY 1, 2),
    natt AS (SELECT nat, CAST(SUM(x) AS BIGINT) AS xn
             FROM flows GROUP BY 1),
    brt AS (SELECT brand, CAST(SUM(x) AS BIGINT) AS xb
            FROM flows GROUP BY 1),
    tot AS (SELECT CAST(SUM(x) AS BIGINT) AS xt FROM flows),
    rca AS (
      SELECT f.nat, f.brand,
             CAST((f.x * 1000000 // n.xn) * 1000000
               // (b.xb * 1000000 // t.xt) AS BIGINT) AS rca_ppm
      FROM flows f
      JOIN natt n ON n.nat = f.nat
      JOIN brt b ON b.brand = f.brand
      CROSS JOIN tot t)
    SELECT r.nat AS nationkey, nm.n_name AS nation, r.brand,
           r.rca_ppm
    FROM rca r JOIN nation nm ON nm.n_nationkey = r.nat
    ORDER BY r.rca_ppm DESC, nationkey, brand
    LIMIT {_RCA_TOPK}
    """,
)
def nation_rca_specialization(spark: SparkSession, sf_dir: str):
    """Revealed comparative advantage (the Balassa index): a nation
    'specializes' in a brand when that brand's share of the nation's
    export value exceeds the brand's share of WORLD export value
    (RCA > 1, here 1e6 ppm) — trade economics' standard
    specialization detector, the supply-side complement to the
    gravity model's flow prediction. One fact aggregate builds the
    bounded 25 x 25 (nation, brand) export matrix; the two marginal
    share divisions are exact ppm with identical truncation order
    in both engines. Top-{_RCA_TOPK} strongest specializations via
    orderBy+limit."""
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
    flows = flows.persist()
    natt = flows.groupBy("nat").agg(
        F.sum("x").cast("bigint").alias("xn")
    )
    brt = flows.groupBy("brand").agg(
        F.sum("x").cast("bigint").alias("xb")
    )
    tot = flows.agg(F.sum("x").cast("bigint").alias("xt"))
    rca = (
        flows.join(natt, "nat")
        .join(brt, "brand")
        .crossJoin(F.broadcast(tot))
        .select(
            "nat",
            "brand",
            F.expr(
                "CAST((x * 1000000 div xn) * 1000000"
                " div (xb * 1000000 div xt) AS BIGINT)"
            ).alias("rca_ppm"),
        )
    )
    return (
        rca.join(F.broadcast(n), rca.nat == n.n_nationkey)
        .select(
            F.col("nat").alias("nationkey"),
            F.col("n_name").alias("nation"),
            "brand",
            "rca_ppm",
        )
        .orderBy(F.col("rca_ppm").desc(), "nationkey", "brand")
        .limit(_RCA_TOPK)
    )


# ------------------------------------------------------------------
# 5. docs_lexicon_filter_rates — blocklist screening rates
# ------------------------------------------------------------------

# placeholder lexicon: in production this is the toxicity/unsafe-term
# blocklist; the synthetic corpus has no unsafe content, so common
# corpus words stand in — the counting/thresholding plumbing is what
# is under test and is lexicon-agnostic.
_LEX_TERMS = ("error", "slow", "leak")
_LEX_DOC_THRESHOLD = 3


@register(
    "docs_lexicon_filter_rates",
    f"""
    WITH hits AS (
      SELECT d.lang, d.doc_id,
             CAST(len(list_filter(
               string_split_regex(trim(lower(d.text)), '\\s+'),
               w -> w IN ({', '.join(repr(x) for x in _LEX_TERMS)})))
               AS BIGINT) AS n_hits,
             CAST(len(string_split_regex(trim(lower(d.text)), '\\s+'))
               AS BIGINT) AS n_toks
      FROM documents d)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           CAST(SUM(n_hits) * 1000000 // SUM(n_toks) AS BIGINT)
             AS hit_density_ppm,
           CAST(SUM(CASE WHEN n_hits >= {_LEX_DOC_THRESHOLD}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN n_hits >= {_LEX_DOC_THRESHOLD}
                THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS flagged_ppm
    FROM hits GROUP BY 1 ORDER BY lang
    """,
)
def docs_lexicon_filter_rates(spark: SparkSession, sf_dir: str):
    """Lexicon-based content screening rates per language — the
    blocklist filter every curation pipeline runs (toxicity, unsafe
    terms, brand exclusions): per document, count lexicon hits with
    an array filter (no explode — the hit count folds inside the
    row), flag documents at >= {_LEX_DOC_THRESHOLD} hits, and report
    per-language hit density and flag rates so a skewed removal rate
    across languages is visible BEFORE filtering biases the corpus
    (the fairness tie-in: removal-rate parity is the doc-level
    analog of the customer fairness audits). The lexicon here is a
    placeholder of common corpus words (no organic unsafe content) —
    plumbing is lexicon-agnostic, documented. One scan, per-row
    array work, language-grain output."""
    d = t(spark, sf_dir, "documents")
    terms = ", ".join(repr(x) for x in _LEX_TERMS)
    hits = d.select(
        "lang",
        F.expr(
            "CAST(size(filter(split(trim(lower(text)), '\\\\s+'),"
            f" w -> w IN ({terms}))) AS BIGINT)"
        ).alias("n_hits"),
        F.expr(
            "CAST(size(split(trim(lower(text)), '\\\\s+')) AS BIGINT)"
        ).alias("n_toks"),
    )
    return (
        hits.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_hits").cast("bigint").alias("total_hits"),
            F.expr(
                "CAST(SUM(n_hits) * 1000000 div SUM(n_toks)"
                " AS BIGINT)"
            ).alias("hit_density_ppm"),
            F.sum(
                F.when(
                    F.col("n_hits") >= _LEX_DOC_THRESHOLD, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flagged"),
            F.expr(
                f"CAST(SUM(CASE WHEN n_hits >= {_LEX_DOC_THRESHOLD}"
                " THEN 1 ELSE 0 END) * 1000000 div COUNT(*)"
                " AS BIGINT)"
            ).alias("flagged_ppm"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------------------
# 6. events_powerlaw_alpha_mle — heavy-tail exponent estimate
# ------------------------------------------------------------------

_PL_XMIN = 5


@register(
    "events_powerlaw_alpha_mle",
    f"""
    WITH act AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
      FROM events GROUP BY 1),
    vals AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS m
      FROM act WHERE k >= {_PL_XMIN} GROUP BY 1),
    agg AS (
      SELECT CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * CAST(round(1e6 * ln(CAST(k AS DOUBLE)
               / ({_PL_XMIN} - 0.5))) AS BIGINT)) AS BIGINT) AS slog
      FROM vals),
    tail AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN k >= {_PL_XMIN} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tail
      FROM act)
    SELECT t.n_total AS n_users, t.n_tail AS n_tail_users,
           CAST(t.n_tail * 1000000 // t.n_total AS BIGINT)
             AS tail_share_ppm,
           CAST(1000000 + CAST(a.n AS HUGEINT) * 1000000000000
             // a.slog // 1000000 AS BIGINT) AS alpha_micro_floor,
           CAST(round(1e6 * (1 + CAST(a.n AS DOUBLE)
             / (a.slog / 1e6))) AS BIGINT) AS alpha_micro
    FROM agg a CROSS JOIN tail t
    """,
)
def events_powerlaw_alpha_mle(spark: SparkSession, sf_dir: str):
    """Power-law tail exponent of per-user activity via the
    discrete Clauset-Shalizi-Newman MLE, alpha = 1 + n / sum
    ln(k/(xmin - 1/2)) — the number that decides whether per-user
    capping/downsampling policies are even needed (alpha < 2 means
    the heaviest users dominate total volume; alpha > 3 means the
    tail is tame) and the distributional complement to the
    domain-capping op. The user-activity histogram collapses to the
    bounded distinct-count-value grain FIRST, so the log terms
    micro-quantize once per distinct k (not per user) and weight by
    multiplicity — both engines fold identical integers; the final
    division is exposed both as a pure-integer floor and the
    rounded double form. One fact aggregate, constant-size tail."""
    e = t(spark, sf_dir, "events")
    act = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("k")
    )
    vals = (
        act.filter(F.col("k") >= _PL_XMIN)
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("m"))
    )
    agg = vals.agg(
        F.sum("m").cast("bigint").alias("n"),
        F.sum(
            F.col("m")
            * F.expr(
                f"CAST(round(1e6 * ln(CAST(k AS DOUBLE)"
                f" / ({_PL_XMIN} - 0.5))) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("slog"),
    )
    tail = act.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("k") >= _PL_XMIN, 1).otherwise(0))
        .cast("bigint")
        .alias("n_tail"),
    )
    return agg.crossJoin(F.broadcast(tail)).select(
        F.col("n_total").alias("n_users"),
        F.col("n_tail").alias("n_tail_users"),
        F.expr(
            "CAST(n_tail * 1000000 div n_total AS BIGINT)"
        ).alias("tail_share_ppm"),
        F.expr(
            "CAST(1000000 + CAST(n AS DECIMAL(38,0)) * 1000000000000"
            " div slog div 1000000 AS BIGINT)"
        ).alias("alpha_micro_floor"),
        F.expr(
            "CAST(round(1e6 * (1 + CAST(n AS DOUBLE)"
            " / (slog / 1e6))) AS BIGINT)"
        ).alias("alpha_micro"),
    )
