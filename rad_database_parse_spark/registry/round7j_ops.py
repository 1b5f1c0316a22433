"""Round-7j operators: instrumental-variables (2SLS) demand estimation,
a McNemar paired-shift test, Kendall tau-b over bounded joint cells, an
AMS F2 sketch with its exact arm, cross-table inclusion-dependency
(foreign-key) profiling, and a Brier/reliability calibration audit.

Parity contract as everywhere (registry/__init__.py float policy):
aggregate in exact integers/decimals, divide in double at the end;
ln/sqrt run on identical doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. lineitem_iv_2sls_demand — instrumental-variables elasticity
# ------------------------------------------------------------------


@register(
    "lineitem_iv_2sls_demand",
    """
    WITH r AS (
      SELECT CAST(round(1e6 * ln(CAST(CAST(l_quantity AS BIGINT)
               AS DOUBLE))) AS BIGINT) AS y,
             CAST(round(1e6 * ln(CAST(
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               * 10 // CAST(l_quantity AS BIGINT) AS DOUBLE))) AS BIGINT)
               AS x,
             CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) * 1000000
               AS z
      FROM lineitem),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
             SUM(z::HUGEINT) AS sz,
             SUM(x::HUGEINT * x) AS sxx, SUM(x::HUGEINT * y) AS sxy,
             SUM(z::HUGEINT * x) AS szx, SUM(z::HUGEINT * y) AS szy,
             SUM(z::HUGEINT * z) AS szz
      FROM r),
    red AS (
      SELECT CAST(n AS BIGINT) AS n_obs,
             CAST((n * sxy - sx * sy) // 1000000000000 AS BIGINT) AS covxy,
             CAST((n * sxx - sx * sx) // 1000000000000 AS BIGINT) AS varx,
             CAST((n * szx - sz * sx) // 1000000000000 AS BIGINT) AS covzx,
             CAST((n * szy - sz * sy) // 1000000000000 AS BIGINT) AS covzy,
             CAST((n * szz - sz * sz) // 1000000000000 AS BIGINT) AS varz
      FROM m)
    SELECT n_obs,
           CAST(covxy AS DOUBLE) / varx AS elast_ols,
           CAST(covzy AS DOUBLE) / covzx AS elast_iv,
           CAST(covzx AS DOUBLE) / varz AS first_stage_slope
    FROM red
    """,
)
def lineitem_iv_2sls_demand(spark: SparkSession, sf_dir: str):
    """Instrumental-variables demand elasticity (two-stage least squares,
    just-identified single-instrument closed form): OLS of log-quantity
    on log-unit-price is biased when price and demand shocks are
    simultaneous, so the tax rate serves as the cost-side instrument —
    beta_IV = cov(z,y)/cov(z,x), with the first-stage slope
    cov(z,x)/var(z) reported as the instrument-strength diagnostic a
    weak-IV audit starts from. Fifth causal leg next to DiD / CUPED /
    RDD / synthetic control. One scan-local projection (micro-quantized
    ln terms, tax scaled to the same micro units so every reduced moment
    survives the shared 1e-12 truncation), ONE nine-moment aggregate,
    doubles only in the final three ratios. No shuffle beyond the single
    global aggregate."""
    l = t(spark, sf_dir, "lineitem")
    r = l.select(
        F.round(
            1e6 * F.log(F.col("l_quantity").cast("bigint").cast("double"))
        )
        .cast("bigint")
        .alias("y"),
        F.round(
            1e6
            * F.log(
                F.expr(
                    "CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100"
                    " AS BIGINT) * 10 div CAST(l_quantity AS BIGINT)"
                    " AS DOUBLE)"
                )
            )
        )
        .cast("bigint")
        .alias("x"),
        ((dec("l_tax") * 100).cast("bigint") * 1000000).alias("z"),
    )
    big = "decimal(38,0)"
    m = r.agg(
        F.count("*").cast(big).alias("n"),
        F.sum(F.col("x").cast(big)).alias("sx"),
        F.sum(F.col("y").cast(big)).alias("sy"),
        F.sum(F.col("z").cast(big)).alias("sz"),
        F.sum((F.col("x").cast(big) * F.col("x")).cast(big)).alias("sxx"),
        F.sum((F.col("x").cast(big) * F.col("y")).cast(big)).alias("sxy"),
        F.sum((F.col("z").cast(big) * F.col("x")).cast(big)).alias("szx"),
        F.sum((F.col("z").cast(big) * F.col("y")).cast(big)).alias("szy"),
        F.sum((F.col("z").cast(big) * F.col("z")).cast(big)).alias("szz"),
    )
    red = m.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.expr(
            "CAST((n * sxy - sx * sy) div 1000000000000 AS BIGINT)"
        ).alias("covxy"),
        F.expr(
            "CAST((n * sxx - sx * sx) div 1000000000000 AS BIGINT)"
        ).alias("varx"),
        F.expr(
            "CAST((n * szx - sz * sx) div 1000000000000 AS BIGINT)"
        ).alias("covzx"),
        F.expr(
            "CAST((n * szy - sz * sy) div 1000000000000 AS BIGINT)"
        ).alias("covzy"),
        F.expr(
            "CAST((n * szz - sz * sz) div 1000000000000 AS BIGINT)"
        ).alias("varz"),
    )
    return red.select(
        "n_obs",
        (F.col("covxy").cast("double") / F.col("varx")).alias("elast_ols"),
        (F.col("covzy").cast("double") / F.col("covzx")).alias("elast_iv"),
        (F.col("covzx").cast("double") / F.col("varz")).alias(
            "first_stage_slope"
        ),
    )


# ------------------------------------------------------------------
# 2. customer_mcnemar_urgency_shift — paired-proportions test
# ------------------------------------------------------------------


@register(
    "customer_mcnemar_urgency_shift",
    """
    WITH f AS (
      SELECT o_custkey,
             max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
               AS p95,
             max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
               AS p96,
             max(CASE WHEN year(o_orderdate) = 1995 AND o_orderpriority IN
               ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS u95,
             max(CASE WHEN year(o_orderdate) = 1996 AND o_orderpriority IN
               ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS u96
      FROM orders GROUP BY o_custkey),
    p AS (SELECT * FROM f WHERE p95 = 1 AND p96 = 1),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_paired,
             CAST(SUM(u95 * u96) AS BIGINT) AS both_urgent,
             CAST(SUM(u95 * (1 - u96)) AS BIGINT) AS dropped,
             CAST(SUM((1 - u95) * u96) AS BIGINT) AS gained,
             CAST(SUM((1 - u95) * (1 - u96)) AS BIGINT) AS neither
      FROM p)
    SELECT n_paired, both_urgent, dropped, gained, neither,
           (dropped - gained) * (dropped - gained) * 1000000
             // GREATEST(dropped + gained, 1) AS mcnemar_chi2_micro,
           (ABS(dropped - gained) - 1) * (ABS(dropped - gained) - 1)
             * 1000000 // GREATEST(dropped + gained, 1)
             AS mcnemar_cc_chi2_micro
    FROM c
    """,
)
def customer_mcnemar_urgency_shift(spark: SparkSession, sf_dir: str):
    """McNemar's test for paired binary proportions: did customers who
    ordered in BOTH 1995 and 1996 shift their urgent-ordering behavior
    (any 1-URGENT/2-HIGH order) between the years? Unlike the
    independent-samples chi-square (orders_priority_drift_chi2), McNemar
    conditions on the discordant pairs only — chi2 = (b-c)^2/(b+c) over
    the dropped/gained cells, with the Edwards continuity-corrected
    variant alongside. The within-subject member of the hypothesis-test
    tier. One customer-grain aggregate (4 conditional max flags), pair
    filter, one global 2x2 fold — exact integer chi2 in micro units."""
    o = t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    f = o.groupBy("o_custkey").agg(
        F.max(F.when(yr == 1995, 1).otherwise(0)).alias("p95"),
        F.max(F.when(yr == 1996, 1).otherwise(0)).alias("p96"),
        F.max(F.when((yr == 1995) & urgent, 1).otherwise(0)).alias("u95"),
        F.max(F.when((yr == 1996) & urgent, 1).otherwise(0)).alias("u96"),
    )
    p = f.filter((F.col("p95") == 1) & (F.col("p96") == 1))
    c = p.agg(
        F.count("*").cast("bigint").alias("n_paired"),
        F.sum(F.col("u95") * F.col("u96")).cast("bigint").alias(
            "both_urgent"
        ),
        F.sum(F.col("u95") * (1 - F.col("u96"))).cast("bigint").alias(
            "dropped"
        ),
        F.sum((1 - F.col("u95")) * F.col("u96")).cast("bigint").alias(
            "gained"
        ),
        F.sum((1 - F.col("u95")) * (1 - F.col("u96")))
        .cast("bigint")
        .alias("neither"),
    )
    return c.select(
        "n_paired",
        "both_urgent",
        "dropped",
        "gained",
        "neither",
        F.expr(
            "(dropped - gained) * (dropped - gained) * 1000000"
            " div GREATEST(dropped + gained, 1)"
        ).alias("mcnemar_chi2_micro"),
        F.expr(
            "(ABS(dropped - gained) - 1) * (ABS(dropped - gained) - 1)"
            " * 1000000 div GREATEST(dropped + gained, 1)"
        ).alias("mcnemar_cc_chi2_micro"),
    )


# ------------------------------------------------------------------
# 3. lineitem_kendall_tau_b — rank correlation with tie correction
# ------------------------------------------------------------------


@register(
    "lineitem_kendall_tau_b",
    """
    WITH cells AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS INT) AS d,
             CAST(l_quantity AS INT) AS q,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2),
    cd AS (
      SELECT CAST(SUM(CASE WHEN b.q > a.q THEN a.cnt::HUGEINT * b.cnt
                           ELSE 0 END) AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN b.q < a.q THEN a.cnt::HUGEINT * b.cnt
                           ELSE 0 END) AS BIGINT) AS discordant
      FROM cells a JOIN cells b ON b.d > a.d),
    tx AS (
      SELECT CAST(SUM(nd::HUGEINT * (nd - 1) // 2) AS BIGINT) AS n1
      FROM (SELECT SUM(cnt) AS nd FROM cells GROUP BY d)),
    ty AS (
      SELECT CAST(SUM(nq::HUGEINT * (nq - 1) // 2) AS BIGINT) AS n2
      FROM (SELECT SUM(cnt) AS nq FROM cells GROUP BY q)),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt)::HUGEINT * (SUM(cnt) - 1) // 2 AS BIGINT) AS n0
      FROM cells)
    SELECT n AS n_rows, concordant, discordant,
           n1 AS tied_x_pairs, n2 AS tied_y_pairs,
           CAST(concordant - discordant AS DOUBLE)
             / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
             AS tau_b
    FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN tot
    """,
)
def lineitem_kendall_tau_b(spark: SparkSession, sf_dir: str):
    """Kendall tau-b rank correlation between discount and quantity —
    the concordant/discordant-pair sibling of lineitem_spearman_rho,
    with the tie correction both variables need (11 discount values x
    50 quantities). The O(n^2) pair sum collapses onto the 550-cell
    joint frequency table first (the same bounded-cardinality re-plan
    Spearman got): concordant/discordant come from a 550x550
    nested-loop join over cells with count products, tie terms from the
    two marginals, so the fact table is touched exactly once. sqrt runs
    on identical exact-integer-derived doubles in both engines."""
    l = t(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        (dec("l_discount") * 100).cast("int").alias("d"),
        F.col("l_quantity").cast("int").alias("q"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    big = "decimal(38,0)"
    b = cells.select(
        F.col("d").alias("bd"),
        F.col("q").alias("bq"),
        F.col("cnt").alias("bcnt"),
    )
    cd = (
        cells.join(F.broadcast(b), F.col("bd") > F.col("d"))
        .agg(
            F.sum(
                F.when(
                    F.col("bq") > F.col("q"),
                    (F.col("cnt").cast(big) * F.col("bcnt")).cast(big),
                ).otherwise(F.lit(0).cast(big))
            )
            .cast("bigint")
            .alias("concordant"),
            F.sum(
                F.when(
                    F.col("bq") < F.col("q"),
                    (F.col("cnt").cast(big) * F.col("bcnt")).cast(big),
                ).otherwise(F.lit(0).cast(big))
            )
            .cast("bigint")
            .alias("discordant"),
        )
    )
    tx = (
        cells.groupBy("d")
        .agg(F.sum("cnt").alias("nd"))
        .agg(
            F.expr(
                f"CAST(SUM(CAST(nd AS {big}) * (nd - 1) div 2) AS BIGINT)"
            ).alias("n1")
        )
    )
    ty = (
        cells.groupBy("q")
        .agg(F.sum("cnt").alias("nq"))
        .agg(
            F.expr(
                f"CAST(SUM(CAST(nq AS {big}) * (nq - 1) div 2) AS BIGINT)"
            ).alias("n2")
        )
    )
    tot = cells.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr(
            f"CAST(CAST(SUM(cnt) AS {big}) * (SUM(cnt) - 1) div 2"
            " AS BIGINT)"
        ).alias("n0"),
    )
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_rows"),
            "concordant",
            "discordant",
            F.col("n1").alias("tied_x_pairs"),
            F.col("n2").alias("tied_y_pairs"),
            (
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(
                    (F.col("n0") - F.col("n1")).cast("double")
                    * (F.col("n0") - F.col("n2")).cast("double")
                )
            ).alias("tau_b"),
        )
    )


# ------------------------------------------------------------------
# 4. events_ams_f2_sketch — second-frequency-moment sketch
# ------------------------------------------------------------------

_AMS_K = 16  # estimators: 4 groups x 4 for median-of-means


@register(
    "events_ams_f2_sketch",
    f"""
    WITH signed AS (
      SELECT k,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
               || '#ams' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 2 = 0
               THEN 1 ELSE -1 END AS s
      FROM events CROSS JOIN (SELECT unnest(range({_AMS_K})) AS k)),
    x AS (SELECT k, CAST(SUM(s) AS BIGINT) AS xk FROM signed GROUP BY k),
    means AS (
      SELECT k // 4 AS g,
             CAST(SUM(xk::HUGEINT * xk) // 4 AS BIGINT) AS m
      FROM x GROUP BY 1),
    med AS (
      SELECT CAST((SUM(m) - MIN(m) - MAX(m)) // 2 AS BIGINT) AS est_f2
      FROM means),
    exact AS (
      SELECT CAST(SUM(f::HUGEINT * f) AS BIGINT) AS exact_f2,
             CAST(SUM(f) AS BIGINT) AS n_events
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS f FROM events
            GROUP BY user_id))
    SELECT n_events, exact_f2, est_f2,
           CAST(ABS(est_f2::HUGEINT - exact_f2) * 1000000 // exact_f2
             AS BIGINT) AS rel_error_ppm
    FROM exact CROSS JOIN med
    """,
)
def events_ams_f2_sketch(spark: SparkSession, sf_dir: str):
    """AMS (Alon-Matias-Szegedy) sketch of the second frequency moment
    F2 = sum_u f_u^2 of the event-stream user distribution — the
    classic join-size / self-join-size estimator, next to the HLL (F0)
    and CMS (point-frequency) members of the sketch tier. 16 estimators
    X_k = sum over EVENTS of a deterministic md5-derived +/-1 sign of
    (user, k) — purely scan-local, no user-grain state, which is the
    whole point of AMS at 100 TB — then median-of-means (4 groups of 4;
    the middle-two median of 4 group means is the exact integer
    (sum - min - max)/2). The exact arm pays the user groupBy for the
    audit column. Explode factor 16 is the sketch width; map-side
    partial agg collapses it to 16 rows per partition."""
    e = t(spark, sf_dir, "events")
    signed = e.select(
        F.explode(F.expr(f"sequence(0, {_AMS_K - 1})")).alias("k"),
        F.col("user_id"),
    ).select(
        "k",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit("#ams"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    x = signed.groupBy("k").agg(F.sum("s").cast("bigint").alias("xk"))
    big = "decimal(38,0)"
    means = x.groupBy(F.expr("k div 4").alias("g")).agg(
        F.expr(f"CAST(SUM(CAST(xk AS {big}) * xk) div 4 AS BIGINT)").alias(
            "m"
        )
    )
    med = means.agg(
        F.expr("CAST((SUM(m) - MIN(m) - MAX(m)) div 2 AS BIGINT)").alias(
            "est_f2"
        )
    )
    exact = (
        e.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("f"))
        .agg(
            F.expr(f"CAST(SUM(CAST(f AS {big}) * f) AS BIGINT)").alias(
                "exact_f2"
            ),
            F.sum("f").cast("bigint").alias("n_events"),
        )
    )
    return exact.crossJoin(F.broadcast(med)).select(
        "n_events",
        "exact_f2",
        "est_f2",
        F.expr(
            f"CAST(ABS(CAST(est_f2 AS {big}) - exact_f2) * 1000000"
            " div exact_f2 AS BIGINT)"
        ).alias("rel_error_ppm"),
    )


# ------------------------------------------------------------------
# 5. dq_inclusion_dependency_profile — FK discovery across tables
# ------------------------------------------------------------------

_IND_CANDIDATES = (
    # (name, lhs table, lhs col, rhs table, rhs col, rhs is dimension)
    ("customer_nationkey_in_nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("lineitem_partkey_in_part", "lineitem", "l_partkey", "part", "p_partkey", False),
    ("nation_regionkey_in_region", "nation", "n_regionkey", "region", "r_regionkey", True),
    ("orders_custkey_in_customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("part_size_in_nation", "part", "p_size", "nation", "n_nationkey", True),
    ("supplier_nationkey_in_nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
)


def _ind_oracle() -> str:
    parts = []
    for name, lt, lc, rt, rc, _ in _IND_CANDIDATES:
        parts.append(
            f"""
    SELECT '{name}' AS candidate,
           (SELECT CAST(COUNT(DISTINCT {lc}) AS BIGINT) FROM {lt})
             AS lhs_distinct,
           (SELECT CAST(COUNT(DISTINCT {lc}) AS BIGINT) FROM {lt}
            WHERE {lc} IN (SELECT {rc} FROM {rt})) AS contained_distinct,
           (SELECT CAST(COUNT(DISTINCT {lc}) AS BIGINT) FROM {lt}
            WHERE {lc} IN (SELECT {rc} FROM {rt})) * 1000000
             // (SELECT COUNT(DISTINCT {lc}) FROM {lt}) AS containment_ppm,
           CAST((SELECT COUNT(DISTINCT {lc}) FROM {lt}
                 WHERE {lc} IN (SELECT {rc} FROM {rt}))
                = (SELECT COUNT(DISTINCT {lc}) FROM {lt}) AS INT)
             AS is_full_ind"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY candidate"


@register("dq_inclusion_dependency_profile", _ind_oracle())
def dq_inclusion_dependency_profile(spark: SparkSession, sf_dir: str):
    """Inclusion-dependency (foreign-key) discovery across the catalog —
    the data-profiling pass that finds joinable columns before anyone
    declares constraints (Bell/Brockhausen-style unary IND checks): for
    each candidate column pair, the distinct value count of the LHS,
    how many of those values exist in the RHS, the containment ratio in
    exact ppm, and a full-IND flag. Five true FK edges of the schema
    plus one deliberate near-miss control (part sizes 1..50 vs nation
    keys 0..24 — 48% containment, the false-positive shape a threshold
    profiler must reject). Each pair distinct-collapses BEFORE joining
    (value-grain shuffle, never fact-grain); dimension RHS sides
    broadcast, the two fact-fact pairs sort-merge on the collapsed
    sets."""
    rows = []
    for name, lt, lc, rt, rc, dim in _IND_CANDIDATES:
        lhs = (
            t(spark, sf_dir, lt)
            .select(F.col(lc).cast("bigint").alias("v"))
            .distinct()
        )
        rhs = (
            t(spark, sf_dir, rt)
            .select(F.col(rc).cast("bigint").alias("v"))
            .distinct()
        )
        contained = lhs.join(
            F.broadcast(rhs) if dim else rhs, "v", "left_semi"
        )
        row = (
            lhs.agg(F.count("*").cast("bigint").alias("lhs_distinct"))
            .crossJoin(
                contained.agg(
                    F.count("*").cast("bigint").alias("contained_distinct")
                )
            )
            .select(
                F.lit(name).alias("candidate"),
                "lhs_distinct",
                "contained_distinct",
                F.expr(
                    "contained_distinct * 1000000 div lhs_distinct"
                ).alias("containment_ppm"),
                (F.col("contained_distinct") == F.col("lhs_distinct"))
                .cast("int")
                .alias("is_full_ind"),
            )
        )
        rows.append(row)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("candidate")


# ------------------------------------------------------------------
# 6. orders_brier_calibration — probability-calibration audit
# ------------------------------------------------------------------


@register(
    "orders_brier_calibration",
    """
    WITH train AS (
      SELECT o_orderpriority AS priority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) * 1000000 // COUNT(*) AS pred_ppm
      FROM orders WHERE year(o_orderdate) < 1996 GROUP BY 1),
    ev AS (
      SELECT o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) * 1000000 // COUNT(*) AS obs_ppm
      FROM orders WHERE year(o_orderdate) >= 1996 GROUP BY 1),
    base AS (
      SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) * 1000000 // COUNT(*) AS base_ppm
      FROM orders WHERE year(o_orderdate) >= 1996)
    SELECT ev.priority, ev.n_eval, train.pred_ppm, ev.obs_ppm,
           train.pred_ppm - ev.obs_ppm AS gap_ppm,
           (train.pred_ppm - ev.obs_ppm) * (train.pred_ppm - ev.obs_ppm)
             // 1000000 AS reliability_micro,
           (ev.obs_ppm - base.base_ppm) * (ev.obs_ppm - base.base_ppm)
             // 1000000 AS resolution_micro,
           base.base_ppm * (1000000 - base.base_ppm) // 1000000
             AS uncertainty_micro
    FROM ev JOIN train USING (priority) CROSS JOIN base
    ORDER BY ev.priority
    """,
)
def orders_brier_calibration(spark: SparkSession, sf_dir: str):
    """Probability-calibration audit with the Murphy decomposition of
    the Brier score: the 'model' predicts P(status = 'F') per priority
    from the pre-1996 training window, and each priority bin of the
    1996+ evaluation window reports predicted vs observed rate, the
    calibration gap, and the per-bin reliability / resolution /
    uncertainty terms (Brier = reliability - resolution + uncertainty
    under binning) — the ML-evaluation tier's calibration member next
    to the lift/gain curve and the decision stump. Two pruned-year
    fact aggregates to the 5-row priority grain, one broadcast base
    rate, exact ppm/micro integer arithmetic throughout."""
    o = t(spark, sf_dir, "orders")
    train = (
        o.filter(F.year("o_orderdate") < 1996)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
                " AS BIGINT) * 1000000 div COUNT(*)"
            ).alias("pred_ppm")
        )
    )
    ev = (
        o.filter(F.year("o_orderdate") >= 1996)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.expr(
                "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
                " AS BIGINT) * 1000000 div COUNT(*)"
            ).alias("obs_ppm"),
        )
    )
    base = o.filter(F.year("o_orderdate") >= 1996).agg(
        F.expr(
            "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
            " AS BIGINT) * 1000000 div COUNT(*)"
        ).alias("base_ppm")
    )
    return (
        ev.join(F.broadcast(train), "priority")
        .crossJoin(F.broadcast(base))
        .select(
            "priority",
            "n_eval",
            "pred_ppm",
            "obs_ppm",
            (F.col("pred_ppm") - F.col("obs_ppm")).alias("gap_ppm"),
            F.expr(
                "(pred_ppm - obs_ppm) * (pred_ppm - obs_ppm) div 1000000"
            ).alias("reliability_micro"),
            F.expr(
                "(obs_ppm - base_ppm) * (obs_ppm - base_ppm) div 1000000"
            ).alias("resolution_micro"),
            F.expr(
                "base_ppm * (1000000 - base_ppm) div 1000000"
            ).alias("uncertainty_micro"),
        )
        .orderBy("priority")
    )
