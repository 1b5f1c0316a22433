"""Round-6e operators: ML-evaluation, feature engineering, and
governance extensions.

Six more platform operators: a decile lift/gain curve on the scale-safe
cut-point path (no global NTILE), a per-customer feature matrix (the
feature-engineering pass feeding any churn/LTV model), per-brand OLS
regression with r² from exact sums, a GDPR subject-access extract
across every table holding the subject's rows, an XmR (individuals /
moving-range) control chart over the monthly revenue series, and a
text-normalization collapse audit for dedup-key design.

Same parity contract as the rest of the registry (exact integer/decimal
aggregation, double division of exact operands last, fixed cut points
compared scan-locally)."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, disc_price, t

# ------------------------------------------------------------------
# 1. orders_lift_gain_curve — decile lift on the cut-point path
# ------------------------------------------------------------------

_LIFT_QS = [k / 10 for k in range(1, 10)]  # 0.1 .. 0.9


@register(
    "orders_lift_gain_curve",
    f"""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS pos
      FROM orders),
    cuts AS (
      SELECT quantile_cont(cents, {_LIFT_QS}) AS qs FROM c),
    bucketed AS (
      -- descending-score label: bucket 1 = top decile (10 - asc_offset)
      SELECT 10 - list_sum(list_transform(cuts.qs,
               q -> CASE WHEN c.cents > q THEN 1 ELSE 0 END)) AS bucket,
             pos
      FROM c, cuts),
    per AS (
      SELECT bucket, COUNT(*) AS n, SUM(pos) AS n_pos
      FROM bucketed GROUP BY bucket),
    tot AS (SELECT SUM(n) AS tn, SUM(n_pos) AS tp FROM per)
    SELECT CAST(a.bucket AS INT) AS bucket,
           CAST(a.n AS BIGINT) AS n_orders,
           CAST(a.n_pos AS BIGINT) AS n_positives,
           CAST(SUM(b.n) AS BIGINT) AS cum_n,
           CAST(SUM(b.n_pos) AS BIGINT) AS cum_positives,
           CAST(SUM(b.n_pos)::HUGEINT * 1000000 // MAX(tot.tp) AS BIGINT)
             AS cum_gain_ppm,
           CAST((SUM(b.n_pos)::HUGEINT * MAX(tot.tn) * 1000000)
                // (SUM(b.n)::HUGEINT * MAX(tot.tp)) AS BIGINT)
             AS cum_lift_ppm
    FROM per a JOIN per b ON b.bucket <= a.bucket, tot
    GROUP BY a.bucket, a.n, a.n_pos
    ORDER BY a.bucket
    """,
)
def orders_lift_gain_curve(spark: SparkSession, sf_dir: str):
    """Decile lift and cumulative-gain curve — the model-evaluation
    readout every targeting/ranking model ships with (how concentrated
    are the positives in the top-scored deciles?), scored here by order
    value against the urgent-priority label. Deciles come from the
    SCALE-SAFE path this repo standardized after the NTILE audit: nine
    exact percentile cut points (a per-group sort today, the documented
    approx_percentile swap at 100 TB), broadcast back for a SCAN-LOCAL
    bucket assignment — no global-order window ever touches fact rows.
    Cut points are identical doubles in both engines (same interpolation
    formula on exact integer cents), so bucket membership is
    deterministic; cumulative sums ride a 10×10 bucket-grain self-join
    (not a window), and gains/lifts are exact integer ppm. Buckets are
    descending-score: bucket 1 = the top decile."""
    o = t(spark, sf_dir, "orders")
    c = o.select(
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("pos"),
    )
    cuts = c.agg(
        F.expr(
            f"percentile(cents, array({', '.join(str(q) for q in _LIFT_QS)}))"
        ).alias("qs")
    )
    bucketed = c.crossJoin(F.broadcast(cuts)).select(
        F.expr(
            "1 + aggregate(qs, 0, (acc, q) ->"
            " acc + CASE WHEN cents > q THEN 1 ELSE 0 END)"
        ).alias("bucket"),
        "pos",
    )
    # descending score: bucket 10 holds the largest cents → relabel so
    # bucket 1 = top decile
    per = (
        bucketed.select(
            (11 - F.col("bucket")).alias("bucket"), "pos"
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("n_pos").alias("tp")
    )
    a = per.select(
        F.col("bucket"), F.col("n"), F.col("n_pos")
    )
    b = per.select(
        F.col("bucket").alias("bucket_b"),
        F.col("n").alias("n_b"),
        F.col("n_pos").alias("n_pos_b"),
    )
    return (
        a.join(F.broadcast(b), F.col("bucket_b") <= F.col("bucket"))
        .crossJoin(F.broadcast(tot))
        .groupBy("bucket", "n", "n_pos")
        .agg(
            F.sum("n_b").cast("bigint").alias("cum_n"),
            F.sum("n_pos_b").cast("bigint").alias("cum_positives"),
            F.expr(
                "CAST(SUM(n_pos_b) * 1000000 div MAX(tp) AS BIGINT)"
            ).alias("cum_gain_ppm"),
            F.expr(
                "CAST((SUM(n_pos_b) * MAX(tn) * 1000000)"
                " div (SUM(n_b) * MAX(tp)) AS BIGINT)"
            ).alias("cum_lift_ppm"),
        )
        .select(
            F.col("bucket").cast("int"),
            F.col("n").alias("n_orders"),
            F.col("n_pos").alias("n_positives"),
            "cum_n",
            "cum_positives",
            "cum_gain_ppm",
            "cum_lift_ppm",
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------------
# 2. customer_feature_matrix — churn/LTV feature engineering pass
# ------------------------------------------------------------------


@register(
    "customer_feature_matrix",
    """
    WITH per AS (
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS spend_cents,
             MIN(CAST(o_orderdate AS DATE)) AS first_day,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS n_urgent
      FROM orders GROUP BY o_custkey),
    anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders)
    SELECT CAST(c.c_custkey AS BIGINT) AS custkey,
           c.c_mktsegment AS segment,
           CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(p.spend_cents, 0) AS BIGINT) AS spend_cents,
           CAST(CASE WHEN p.n_orders > 0
                     THEN p.spend_cents // p.n_orders END AS BIGINT)
             AS avg_order_cents,
           CAST(CASE WHEN p.o_custkey IS NOT NULL
                     THEN anchor.maxd - p.last_day END AS BIGINT)
             AS recency_days,
           CAST(CASE WHEN p.o_custkey IS NOT NULL
                     THEN p.last_day - p.first_day END AS BIGINT)
             AS tenure_days,
           CAST(CASE WHEN p.n_orders > 1
                     THEN (p.last_day - p.first_day) // (p.n_orders - 1)
                END AS BIGINT) AS avg_gap_days,
           CAST(CASE WHEN p.n_orders > 0
                     THEN p.n_urgent * 1000000 // p.n_orders
                     ELSE 0 END AS BIGINT) AS urgent_ppm
    FROM customer c
    LEFT JOIN per p ON c.c_custkey = p.o_custkey
    CROSS JOIN anchor
    ORDER BY custkey
    """,
)
def customer_feature_matrix(spark: SparkSession, sf_dir: str):
    """Per-customer feature matrix — the feature-engineering pass every
    churn/LTV/segmentation model starts from: order count, exact spend,
    average order value, recency vs the corpus anchor date, tenure,
    average inter-order gap, and urgent-share, with left-join semantics
    so never-ordered customers surface with zero/NULL features (the
    silent-drop bug this op exists to prevent). ONE map-side-combinable
    groupBy over the fact table, one broadcast anchor row, one join back
    to the dimension — at 100 TB the fact aggregation is the only real
    shuffle and it is keyed by the same custkey the join needs, so AQE
    coalesces the pipeline. All features exact integers (day arithmetic
    on DATE, floor-div averages); no window, no collect."""
    o = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    per = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum((dec("o_totalprice") * 100).cast("bigint")).alias(
            "spend_cents"
        ),
        F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("n_urgent"),
    )
    anchor = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("maxd")
    )
    return (
        cust.join(per, cust.c_custkey == per.o_custkey, "left")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("c_custkey").cast("bigint").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.coalesce(F.col("n_orders"), F.lit(0))
            .cast("bigint")
            .alias("n_orders"),
            F.coalesce(F.col("spend_cents"), F.lit(0))
            .cast("bigint")
            .alias("spend_cents"),
            F.when(
                F.col("n_orders") > 0,
                F.expr("CAST(spend_cents div n_orders AS BIGINT)"),
            ).alias("avg_order_cents"),
            F.when(
                F.col("o_custkey").isNotNull(),
                F.datediff(F.col("maxd"), F.col("last_day")),
            )
            .cast("bigint")
            .alias("recency_days"),
            F.when(
                F.col("o_custkey").isNotNull(),
                F.datediff(F.col("last_day"), F.col("first_day")),
            )
            .cast("bigint")
            .alias("tenure_days"),
            F.when(
                F.col("n_orders") > 1,
                F.expr(
                    "CAST(datediff(last_day, first_day)"
                    " div (n_orders - 1) AS BIGINT)"
                ),
            ).alias("avg_gap_days"),
            F.when(
                F.col("n_orders") > 0,
                F.expr("CAST(n_urgent * 1000000 div n_orders AS BIGINT)"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("urgent_ppm"),
        )
        .orderBy("custkey")
    )


# ------------------------------------------------------------------
# 3. lineitem_discount_qty_ols — per-brand OLS with r² from sums
# ------------------------------------------------------------------


@register(
    "lineitem_discount_qty_ols",
    """
    WITH j AS (
      SELECT p.p_brand AS brand,
             CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    s AS (
      SELECT brand, COUNT(*) AS n,
             SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
             SUM(x::HUGEINT * y) AS sxy,
             SUM(x::HUGEINT * x) AS sxx,
             SUM(y::HUGEINT * y) AS syy
      FROM j GROUP BY brand)
    SELECT brand,
           CAST(n AS BIGINT) AS n_rows,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM s ORDER BY brand
    """,
)
def lineitem_discount_qty_ols(spark: SparkSession, sf_dir: str):
    """Per-brand ordinary-least-squares fit of quantity against discount
    — the elasticity screen a pricing team runs before any causal
    analysis (does a deeper discount move volume, and how much of the
    variance does it explain?). The whole regression reduces to five
    exact integer sums per brand (n, Σx, Σy, Σxy, Σx², Σy²) carried in
    HUGEINT/decimal(38,0) through ONE map-side-combinable groupBy after
    the lineitem×part key join; slope, intercept and r² are double
    ratios of exact operands (the agg_corr_from_sums contract extended
    to the full OLS readout). At 100 TB the partkey join is the only
    shuffle and AQE handles its skew; the brand grain output is
    dimension-bounded."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        (dec("l_discount") * 100).cast("bigint").alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    big = "decimal(38,0)"
    s = j.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(big)).alias("sx"),
        F.sum(F.col("y").cast(big)).alias("sy"),
        F.sum((F.col("x").cast(big) * F.col("y")).cast(big)).alias("sxy"),
        F.sum((F.col("x").cast(big) * F.col("x")).cast(big)).alias("sxx"),
        F.sum((F.col("y").cast(big) * F.col("y")).cast(big)).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        "brand",
        F.col("n").alias("n_rows"),
        F.round(num / denx, 6).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double")
                - num / denx * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    ).orderBy("brand")


# ------------------------------------------------------------------
# 4. gdpr_subject_access_extract — cross-table data-subject report
# ------------------------------------------------------------------

_SAR_EVERY = 97  # subjects: c_custkey % 97 == 0


@register(
    "gdpr_subject_access_extract",
    f"""
    WITH subj AS (
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer WHERE c_custkey % {_SAR_EVERY} = 0),
    o AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS spend_cents
      FROM orders WHERE o_custkey % {_SAR_EVERY} = 0 GROUP BY o_custkey),
    li AS (
      SELECT o.o_custkey, COUNT(*) AS n_lineitems
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % {_SAR_EVERY} = 0 GROUP BY o.o_custkey),
    ev AS (
      SELECT user_id, COUNT(*) AS n_events
      FROM events WHERE user_id % {_SAR_EVERY} = 0 GROUP BY user_id)
    SELECT CAST(s.c_custkey AS BIGINT) AS custkey,
           sha256(s.c_name) AS subject_pseudonym,
           s.c_mktsegment AS segment,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(o.spend_cents, 0) AS BIGINT) AS spend_cents,
           CAST(COALESCE(li.n_lineitems, 0) AS BIGINT) AS n_lineitems,
           CAST(COALESCE(ev.n_events, 0) AS BIGINT) AS n_events
    FROM subj s
    LEFT JOIN o ON s.c_custkey = o.o_custkey
    LEFT JOIN li ON s.c_custkey = li.o_custkey
    LEFT JOIN ev ON s.c_custkey = ev.user_id
    ORDER BY custkey
    """,
)
def gdpr_subject_access_extract(spark: SparkSession, sf_dir: str):
    """GDPR Article-15 subject-access report: for each data subject in
    the request batch, every table holding their rows summarized into
    one extract (order count, exact spend, line items via the order
    bridge, behavioral events) — the access-side sibling of
    gdpr_erasure_cascade (A19 delete semantics, reference
    `database.py:66-71`), with the name pseudonymized on the way out.
    The subject predicate pushes into EVERY fact scan (modulus on the
    key column — at 100 TB these are partition-prunable scans, not full
    reads), each fact collapses to subject grain map-side, and the
    final assembly is left-joins on the tiny subject dimension so
    subjects with no rows still appear (the compliance requirement).
    The lineitem path crosses the order bridge with the same pushed
    predicate before its groupBy."""
    cust = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ev = t(spark, sf_dir, "events")
    subj = cust.filter(F.col("c_custkey") % _SAR_EVERY == 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    op = (
        o.filter(F.col("o_custkey") % _SAR_EVERY == 0)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum((dec("o_totalprice") * 100).cast("bigint")).alias(
                "spend_cents"
            ),
        )
    )
    lp = (
        li.join(
            o.filter(F.col("o_custkey") % _SAR_EVERY == 0).select(
                "o_orderkey", "o_custkey"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_lineitems"))
        .withColumnRenamed("o_custkey", "li_custkey")
    )
    ep = (
        ev.filter(F.col("user_id") % _SAR_EVERY == 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        subj.join(op, subj.c_custkey == op.o_custkey, "left")
        .join(lp, subj.c_custkey == lp.li_custkey, "left")
        .join(ep, subj.c_custkey == ep.user_id, "left")
        .select(
            F.col("c_custkey").cast("bigint").alias("custkey"),
            F.sha2(F.col("c_name"), 256).alias("subject_pseudonym"),
            F.col("c_mktsegment").alias("segment"),
            F.coalesce("n_orders", F.lit(0))
            .cast("bigint")
            .alias("n_orders"),
            F.coalesce("spend_cents", F.lit(0))
            .cast("bigint")
            .alias("spend_cents"),
            F.coalesce("n_lineitems", F.lit(0))
            .cast("bigint")
            .alias("n_lineitems"),
            F.coalesce("n_events", F.lit(0))
            .cast("bigint")
            .alias("n_events"),
        )
        .orderBy("custkey")
    )


# ------------------------------------------------------------------
# 5. orders_xmr_control_chart — individuals / moving-range SPC
# ------------------------------------------------------------------

_XMR_C = 2.66  # d2-derived constant for n=2 moving ranges


@register(
    "orders_xmr_control_chart",
    f"""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1),
    idx AS (
      SELECT month, rev, row_number() OVER (ORDER BY month) AS i
      FROM monthly),
    mr AS (
      SELECT a.month, a.rev, abs(a.rev - b.rev) AS mrange
      FROM idx a LEFT JOIN idx b ON b.i = a.i - 1),
    lim AS (
      SELECT SUM(rev) // COUNT(*) AS cl,
             SUM(mrange) // COUNT(mrange) AS mrbar
      FROM mr)
    SELECT mr.month AS month,
           CAST(mr.rev AS BIGINT) AS rev_cents,
           CAST(mr.mrange AS BIGINT) AS moving_range,
           CAST(lim.cl AS BIGINT) AS center_cents,
           round(lim.cl + {_XMR_C} * lim.mrbar, 6) AS ucl_cents,
           round(GREATEST(lim.cl - {_XMR_C} * lim.mrbar, 0), 6)
             AS lcl_cents,
           CAST(CASE WHEN mr.rev > lim.cl + {_XMR_C} * lim.mrbar
                       OR mr.rev < GREATEST(lim.cl
                                            - {_XMR_C} * lim.mrbar, 0)
                     THEN 1 ELSE 0 END AS INT) AS out_of_control
    FROM mr, lim ORDER BY month
    """,
)
def orders_xmr_control_chart(spark: SparkSession, sf_dir: str):
    """XmR (individuals + moving-range) control chart over monthly
    revenue — the Shewhart chart for unit-frequency business series
    (one observation per period, no subgroups), complementing the EWMA
    (events_ewma_smoothing) and CUSUM (events_cusum_changepoint)
    detectors with the classical 2.66·mR̄ limits. The fact scan
    collapses to calendar-month grain in one combinable groupBy; the
    moving range is an offset self-join on the month index (bounded
    grain — whitelisted with the other calendar windows), the limits
    are one integer-mean row broadcast back, and out-of-control flags
    compare exact integer cents against identical IEEE doubles."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    w = Window.orderBy("month")
    idx = monthly.select(
        "month", "rev", F.row_number().over(w).alias("i")
    )
    a = idx.select("month", "rev", "i")
    b = idx.select(
        F.col("i").alias("ib"), F.col("rev").alias("rev_prev")
    )
    mr = a.join(
        F.broadcast(b), F.col("ib") == F.col("i") - 1, "left"
    ).select(
        "month",
        "rev",
        F.abs(F.col("rev") - F.col("rev_prev")).alias("mrange"),
    )
    lim = mr.agg(
        F.expr("CAST(SUM(rev) div COUNT(*) AS BIGINT)").alias("cl"),
        F.expr("CAST(SUM(mrange) div COUNT(mrange) AS BIGINT)").alias(
            "mrbar"
        ),
    )
    return (
        mr.crossJoin(F.broadcast(lim))
        .select(
            "month",
            F.col("rev").cast("bigint").alias("rev_cents"),
            F.col("mrange").cast("bigint").alias("moving_range"),
            F.col("cl").cast("bigint").alias("center_cents"),
            F.round(
                F.col("cl") + _XMR_C * F.col("mrbar"), 6
            ).alias("ucl_cents"),
            F.round(
                F.greatest(
                    F.col("cl") - _XMR_C * F.col("mrbar"), F.lit(0)
                ),
                6,
            ).alias("lcl_cents"),
            F.when(
                (F.col("rev") > F.col("cl") + _XMR_C * F.col("mrbar"))
                | (
                    F.col("rev")
                    < F.greatest(
                        F.col("cl") - _XMR_C * F.col("mrbar"), F.lit(0)
                    )
                ),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("out_of_control"),
        )
        .orderBy("month")
    )


# ------------------------------------------------------------------
# 6. docs_normalization_collapse — dedup-key normalization audit
# ------------------------------------------------------------------


@register(
    "docs_normalization_collapse",
    """
    WITH k AS (
      SELECT lang,
             md5(text) AS raw_key,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
               AS norm_key
      FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_key) AS BIGINT) AS n_raw_distinct,
           CAST(COUNT(DISTINCT norm_key) AS BIGINT) AS n_norm_distinct,
           CAST((COUNT(DISTINCT raw_key) - COUNT(DISTINCT norm_key))
                ::HUGEINT * 1000000 // COUNT(DISTINCT raw_key) AS BIGINT)
             AS collapse_ppm
    FROM k GROUP BY lang ORDER BY lang
    """,
)
def docs_normalization_collapse(spark: SparkSession, sf_dir: str):
    """Normalization-collapse audit for dedup-key design: how many
    additional duplicate groups appear when the dedup key moves from
    raw bytes to a normalized form (lowercase, punctuation stripped,
    trimmed) — the measurement a curator runs before choosing the
    exact-dedup key (A13 normalization feeding A14 exact-dedup,
    reference `database.py:35-41`), because over-aggressive
    normalization silently merges distinct documents. Keys are md5
    hashes computed scan-locally (the full text never shuffles — only
    16-byte keys reach the distinct aggregation), the regex class is
    engine-portable, and the collapse rate is exact integer ppm at
    language grain. Plan shape (re-planned r11): two countDistinct on
    different columns in one aggregate would Expand every key row ×3
    (RewriteDistinctAggregates); raw_key functionally DETERMINES
    norm_key (both are hashes of the same text), so a two-level
    aggregation — dedup on (lang, raw_key) carrying first(norm_key),
    then one single-distinct agg per lang — computes all three counts
    with ONE text scan and zero row replication (verified Expand-free;
    values identical at sf0.1)."""
    d = t(spark, sf_dir, "documents")
    k = d.select(
        "lang",
        F.md5(F.col("text")).alias("raw_key"),
        F.md5(
            F.trim(
                F.regexp_replace(
                    F.lower(F.col("text")), "[^a-z0-9 ]", ""
                )
            )
        ).alias("norm_key"),
    )
    lvl1 = k.groupBy("lang", "raw_key").agg(
        F.count("*").alias("n"),
        F.first("norm_key").alias("norm_key"),
    )
    return (
        lvl1.groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_raw_distinct"),
            F.countDistinct("norm_key").cast("bigint").alias(
                "n_norm_distinct"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "n_raw_distinct",
            "n_norm_distinct",
            F.expr(
                "CAST((n_raw_distinct - n_norm_distinct) * 1000000"
                " div n_raw_distinct AS BIGINT)"
            ).alias("collapse_ppm"),
        )
        .orderBy("lang")
    )
