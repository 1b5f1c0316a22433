"""Round-6i operators: inventory planning, growth analytics, supply
locality, and supervised embedding diagnostics.

Six more platform operators: EOQ (economic order quantity) planning per
part type, year-over-year revenue growth, a supply-chain locality KPI
(locally-fulfilled share per region), weekly growth accounting
(new/retained/resurrected/churned), the Fisher discriminant ratio per
embedding dimension (the supervised sibling of the isotropy audit), and
per-user behavioral entropy histograms.

Same parity contract as the rest of the registry."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, disc_price, t

# ------------------------------------------------------------------
# 1. part_type_eoq_plan — economic order quantity per part type
# ------------------------------------------------------------------

_EOQ_ORDER_COST = 500  # S: fixed cost per replenishment order
_EOQ_HOLD_COST = 2  # H: holding cost per unit per period


@register(
    "part_type_eoq_plan",
    f"""
    WITH d AS (
      SELECT p.p_type AS part_type,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS demand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type)
    SELECT part_type,
           demand,
           CAST(round(sqrt(2.0 * demand * {_EOQ_ORDER_COST}
                           / {_EOQ_HOLD_COST}) * 1000) AS BIGINT)
             AS eoq_milli,
           CAST(round(demand
                      / (sqrt(2.0 * demand * {_EOQ_ORDER_COST}
                              / {_EOQ_HOLD_COST}))
                      * 1000) AS BIGINT) AS orders_per_period_milli
    FROM d ORDER BY part_type
    """,
)
def part_type_eoq_plan(spark: SparkSession, sf_dir: str):
    """Economic-order-quantity plan per part type — the classical
    Wilson EOQ (√(2DS/H)) that turns observed demand into a
    replenishment policy (batch size and order frequency), the
    inventory-planning op that belongs next to the demand data. Demand
    aggregates exactly (one partkey join + one combinable groupBy to
    the type grain); the EOQ itself is one sqrt over an exact-integer
    argument, milli-quantized — identical IEEE in both engines, and the
    cost constants are hard-coded literals. Output is bounded by the
    part-type dimension at any corpus scale."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    d = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("part_type"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("demand")
        )
    )
    eoq = F.sqrt(
        2.0 * F.col("demand") * _EOQ_ORDER_COST / _EOQ_HOLD_COST
    )
    return d.select(
        "part_type",
        "demand",
        F.round(eoq * 1000).cast("bigint").alias("eoq_milli"),
        F.round(F.col("demand") / eoq * 1000)
        .cast("bigint")
        .alias("orders_per_period_milli"),
    ).orderBy("part_type")


# ------------------------------------------------------------------
# 2. orders_yoy_growth — year-over-year monthly revenue growth
# ------------------------------------------------------------------


@register(
    "orders_yoy_growth",
    """
    WITH m AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1)
    SELECT CAST(a.ym // 12 AS INT) AS year,
           CAST(1 + a.ym % 12 AS INT) AS month_in_year,
           CAST(a.rev AS BIGINT) AS rev_cents,
           CAST(b.rev AS BIGINT) AS rev_cents_prev_year,
           CAST(CASE WHEN a.rev >= b.rev
                     THEN (a.rev - b.rev)::HUGEINT * 1000000 // b.rev
                     ELSE -(((b.rev - a.rev)::HUGEINT * 1000000) // b.rev)
                END AS BIGINT) AS yoy_growth_ppm
    FROM m a JOIN m b ON b.ym = a.ym - 12
    ORDER BY year, month_in_year
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str):
    """Year-over-year monthly revenue growth — the BI staple that
    removes seasonality by comparing each month against the SAME month
    a year earlier (the fastest honest growth readout, complementing
    lineitem_seasonal_decompose which models the seasonality
    explicitly). Months encode as exact integers (y·12+m) so the
    12-month offset is an integer equi-join on the calendar-bounded
    month table; revenue is exact cents and the growth rate is exact
    integer ppm with sign-aware division (floor-vs-truncate divergence
    on negative growth is the cross-engine trap). One combinable fact
    groupBy; everything after is metadata-sized."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("ym")
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    a = m.select("ym", "rev")
    b = m.select(
        (F.col("ym") + 12).alias("ym"), F.col("rev").alias("rev_prev")
    )
    return (
        a.join(F.broadcast(b), "ym")
        .select(
            F.expr("CAST(ym div 12 AS INT)").alias("year"),
            (1 + F.col("ym") % 12).cast("int").alias("month_in_year"),
            F.col("rev").cast("bigint").alias("rev_cents"),
            F.col("rev_prev")
            .cast("bigint")
            .alias("rev_cents_prev_year"),
            F.expr(
                "CAST(CASE WHEN rev >= rev_prev"
                " THEN (rev - rev_prev) * 1000000 div rev_prev"
                " ELSE -(((rev_prev - rev) * 1000000) div rev_prev)"
                " END AS BIGINT)"
            ).alias("yoy_growth_ppm"),
        )
        .orderBy("year", "month_in_year")
    )


# ------------------------------------------------------------------
# 3. region_supply_locality — locally-fulfilled share per region
# ------------------------------------------------------------------


@register(
    "region_supply_locality",
    """
    WITH flow AS (
      SELECT cr.r_name AS customer_region,
             CASE WHEN cn.n_nationkey = sn.n_nationkey THEN 1 ELSE 0 END
               AS same_nation,
             CASE WHEN cn.n_regionkey = sn.n_regionkey THEN 1 ELSE 0 END
               AS same_region,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                  * 10000 AS BIGINT) AS rev_e4
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
    SELECT customer_region,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4,
           CAST(SUM(same_nation)::HUGEINT * 1000000 // COUNT(*) AS BIGINT)
             AS local_nation_ppm,
           CAST(SUM(same_region)::HUGEINT * 1000000 // COUNT(*) AS BIGINT)
             AS local_region_ppm,
           CAST(SUM(CASE WHEN same_region = 1 THEN rev_e4 ELSE 0 END)
                ::HUGEINT * 1000000 // SUM(rev_e4) AS BIGINT)
             AS local_region_rev_ppm
    FROM flow GROUP BY customer_region ORDER BY customer_region
    """,
)
def region_supply_locality(spark: SparkSession, sf_dir: str):
    """Supply-chain locality KPI per customer region: what share of
    line items (and of revenue) is fulfilled by a supplier from the
    customer's own nation or region — the sourcing-footprint readout
    behind nearshoring decisions and logistics-cost models (the
    locality complement of TPC-H Q7's bilateral flows and Q8's market
    share). The join chain is the classic star: fact → orders →
    customer and fact → supplier, each dimension hop a broadcast,
    the orderkey join the one real shuffle; locality flags compute
    row-locally and the region-grain output is a 5-row report with
    exact ppm shares of exact decimal revenue."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    s = t(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_regionkey").alias("s_rkey"),
    )
    flow = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            F.broadcast(r.select(
                F.col("r_regionkey").alias("c_rkey2"),
                F.col("r_name").alias("customer_region"),
            )),
            F.col("c_rkey") == F.col("c_rkey2"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            "customer_region",
            F.when(F.col("c_nkey") == F.col("s_nkey"), 1)
            .otherwise(0)
            .alias("same_nation"),
            F.when(F.col("c_rkey") == F.col("s_rkey"), 1)
            .otherwise(0)
            .alias("same_region"),
            (
                (
                    dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
                ).cast("decimal(18,4)")
                * 10000
            )
            .cast("bigint")
            .alias("rev_e4"),
        )
    )
    return (
        flow.groupBy("customer_region")
        .agg(
            F.count("*").cast("bigint").alias("n_lineitems"),
            F.sum("rev_e4").cast("bigint").alias("revenue_e4"),
            F.expr(
                "CAST(SUM(same_nation) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("local_nation_ppm"),
            F.expr(
                "CAST(SUM(same_region) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("local_region_ppm"),
            F.expr(
                "CAST(CAST(SUM(CASE WHEN same_region = 1 THEN rev_e4"
                " ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
                " div SUM(rev_e4) AS BIGINT)"
            ).alias("local_region_rev_ppm"),
        )
        .orderBy("customer_region")
    )


# ------------------------------------------------------------------
# 4. events_growth_accounting — new/retained/resurrected/churned
# ------------------------------------------------------------------

_GA_EPOCH = "2024-01-01"


@register(
    "events_growth_accounting",
    f"""
    WITH act AS (
      SELECT DISTINCT user_id,
             (CAST(ts AS DATE) - DATE '{_GA_EPOCH}') // 7 AS wk
      FROM events),
    first_wk AS (
      SELECT user_id, MIN(wk) AS fw FROM act GROUP BY user_id),
    weeks AS (SELECT DISTINCT wk FROM act),
    states AS (
      SELECT w.wk,
             cur.user_id AS cur_id,
             prev.user_id AS prev_id,
             f.fw
      FROM weeks w
      LEFT JOIN act cur ON cur.wk = w.wk
      LEFT JOIN act prev ON prev.wk = w.wk - 1
                        AND prev.user_id = cur.user_id
      LEFT JOIN first_wk f ON f.user_id = cur.user_id),
    churn AS (
      SELECT w.wk, COUNT(*) AS churned
      FROM weeks w
      JOIN act prev ON prev.wk = w.wk - 1
      LEFT JOIN act cur ON cur.wk = w.wk AND cur.user_id = prev.user_id
      WHERE cur.user_id IS NULL
      GROUP BY w.wk)
    SELECT CAST(s.wk AS INT) AS week,
           CAST(COUNT(CASE WHEN s.fw = s.wk THEN 1 END) AS BIGINT)
             AS new_users,
           CAST(COUNT(CASE WHEN s.prev_id IS NOT NULL THEN 1 END)
                AS BIGINT) AS retained,
           CAST(COUNT(CASE WHEN s.prev_id IS NULL AND s.fw < s.wk
                           THEN 1 END) AS BIGINT) AS resurrected,
           CAST(COALESCE(MAX(churn.churned), 0) AS BIGINT) AS churned,
           CAST(COUNT(s.cur_id) AS BIGINT) AS active_users
    FROM states s LEFT JOIN churn ON churn.wk = s.wk
    GROUP BY s.wk ORDER BY week
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str):
    """Weekly growth accounting — the MAU/WAU decomposition every
    growth team lives by: each week's active users split into NEW
    (first-ever week), RETAINED (also active last week) and
    RESURRECTED (returning after a gap), with CHURNED (active last
    week, absent this week) alongside — the identity
    active(w) = new + retained + resurrected and
    active(w) − active(w−1) = new + resurrected − churned is the
    auditable version of "are we growing". Weekly actives are one
    distinct over (user, week) — combinable; the week-over-week
    alignment is a user-keyed self-join of the active set (the
    dimension-sized table, not events), and first-week is one more
    user groupBy. Weeks index from a fixed epoch so both engines bin
    identically. At 100 TB the active set is users × weeks, orders of
    magnitude below the event log."""
    ev = t(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.expr(
            f"CAST(datediff(CAST(ts AS DATE), DATE '{_GA_EPOCH}')"
            " div 7 AS BIGINT)"
        ).alias("wk"),
    ).distinct()
    first_wk = act.groupBy("user_id").agg(F.min("wk").alias("fw"))
    weeks = act.select("wk").distinct()
    cur = act.select(F.col("user_id").alias("cur_id"), "wk")
    prev = act.select(
        F.col("user_id").alias("prev_id"),
        (F.col("wk") + 1).alias("pwk"),
    )
    fwd = first_wk.select(
        F.col("user_id").alias("fw_id"), "fw"
    )
    states = (
        weeks.join(cur, "wk", "left")
        .join(
            prev,
            (F.col("pwk") == F.col("wk"))
            & (F.col("prev_id") == F.col("cur_id")),
            "left",
        )
        .join(fwd, F.col("fw_id") == F.col("cur_id"), "left")
        .select("wk", "cur_id", "prev_id", "fw")
    )
    churn_prev = act.select(
        F.col("user_id").alias("p_id"), (F.col("wk") + 1).alias("wk")
    )
    churn_cur = act.select(
        F.col("user_id").alias("c_id"), F.col("wk").alias("cwk")
    )
    churn = (
        weeks.join(churn_prev, "wk")
        .join(
            churn_cur,
            (F.col("cwk") == F.col("wk"))
            & (F.col("c_id") == F.col("p_id")),
            "left",
        )
        .filter(F.col("c_id").isNull())
        .groupBy("wk")
        .agg(F.count("*").alias("churned"))
    )
    return (
        states.join(churn, "wk", "left")
        .groupBy("wk")
        .agg(
            F.count(F.when(F.col("fw") == F.col("wk"), 1))
            .cast("bigint")
            .alias("new_users"),
            F.count(F.when(F.col("prev_id").isNotNull(), 1))
            .cast("bigint")
            .alias("retained"),
            F.count(
                F.when(
                    F.col("prev_id").isNull()
                    & (F.col("fw") < F.col("wk")),
                    1,
                )
            )
            .cast("bigint")
            .alias("resurrected"),
            F.coalesce(F.max("churned"), F.lit(0))
            .cast("bigint")
            .alias("churned"),
            F.count("cur_id").cast("bigint").alias("active_users"),
        )
        .select(
            F.col("wk").cast("int").alias("week"),
            "new_users",
            "retained",
            "resurrected",
            "churned",
            "active_users",
        )
        .orderBy("week")
    )


# ------------------------------------------------------------------
# 5. emb_fisher_discriminant_ratio — supervised per-dim separation
# ------------------------------------------------------------------

_FDR_DIMS = 64


@register(
    "emb_fisher_discriminant_ratio",
    f"""
    WITH el AS (
      SELECT d, label,
             CAST(round(CAST(embedding AS DOUBLE[])[d] * 1000000)
                  AS BIGINT) AS x
      FROM embeddings,
           (SELECT unnest(range(1, {_FDR_DIMS} + 1)) AS d)),
    per AS (
      SELECT d, label, COUNT(*) AS n,
             SUM(x::HUGEINT) AS sx, SUM(x::HUGEINT * x) AS sxx
      FROM el GROUP BY d, label),
    agg AS (
      SELECT d,
             SUM(n) AS n_tot,
             SUM(sx) AS sx_tot,
             SUM(sxx - CAST(round(CAST(sx * sx AS DOUBLE) / n) AS HUGEINT))
               AS within_q,
             SUM(CAST(round(CAST(sx * sx AS DOUBLE) / n) AS HUGEINT))
               AS between_raw
      FROM per GROUP BY d)
    SELECT CAST(d AS INT) AS dim,
           CAST(n_tot AS BIGINT) AS n_vecs,
           CAST(within_q AS BIGINT) AS within_q_micro2,
           CAST(between_raw
                - CAST(round(CAST(sx_tot * sx_tot AS DOUBLE) / n_tot)
                       AS HUGEINT) AS BIGINT) AS between_q_micro2,
           round(CAST(between_raw
                      - CAST(round(CAST(sx_tot * sx_tot AS DOUBLE) / n_tot)
                             AS HUGEINT) AS DOUBLE)
                 / CAST(within_q AS DOUBLE), 6) AS fisher_ratio
    FROM agg ORDER BY dim
    """,
)
def emb_fisher_discriminant_ratio(spark: SparkSession, sf_dir: str):
    """Fisher discriminant ratio per embedding dimension — the
    supervised sibling of emb_dimension_isotropy_audit: between-class
    vs within-class scatter per coordinate, the screen for which
    dimensions actually carry the label signal (feature selection for
    a linear probe, and the sanity check before trusting a cheap
    per-dim quantizer not to destroy class structure). Coordinates
    quantize to exact integer micro-units at the scan; per-(dim, label)
    moment sums are exact HUGEINT partials, and each class's
    sx²/n correction is ONE double division of exact operands rounded
    to the nearest integer before the cross-class sums — so the scatter
    decomposition is exact integer arithmetic with the classic identity
    total = within + between holding to quantization. One ×{_FDR_DIMS}
    explode, one combinable groupBy, dim-grain output."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 1_000_000).cast(
                    "bigint"
                ),
            )
        ).alias("d0", "x"),
    ).select((F.col("d0") + 1).alias("d"), "label", "x")
    big = "decimal(38,0)"
    per = el.groupBy("d", "label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(big)).alias("sx"),
        F.sum((F.col("x").cast(big) * F.col("x")).cast(big)).alias(
            "sxx"
        ),
    )
    corr = F.round(
        (F.col("sx") * F.col("sx")).cast("double") / F.col("n")
    ).cast(big)
    agg = per.select(
        "d", "n", "sx", "sxx", corr.alias("corr")
    ).groupBy("d").agg(
        F.sum("n").alias("n_tot"),
        F.sum("sx").alias("sx_tot"),
        F.sum(F.col("sxx") - F.col("corr")).alias("within_q"),
        F.sum("corr").alias("between_raw"),
    )
    tot_corr = F.round(
        (F.col("sx_tot") * F.col("sx_tot")).cast("double")
        / F.col("n_tot")
    ).cast(big)
    between = (F.col("between_raw") - tot_corr).alias("between_q")
    return agg.select(
        F.col("d").cast("int").alias("dim"),
        F.col("n_tot").cast("bigint").alias("n_vecs"),
        F.col("within_q").cast("bigint").alias("within_q_micro2"),
        between.cast("bigint").alias("between_q_micro2"),
        F.round(
            (F.col("between_raw") - tot_corr).cast("double")
            / F.col("within_q").cast("double"),
            6,
        ).alias("fisher_ratio"),
    ).orderBy("dim")


# ------------------------------------------------------------------
# 6. events_user_behavior_entropy — behavioral diversity histogram
# ------------------------------------------------------------------

_UBE_BUCKET = 200  # millinats per histogram bucket


@register(
    "events_user_behavior_entropy",
    f"""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type),
    u AS (
      SELECT user_id,
             SUM(cnt) AS n,
             SUM(CAST(round(cnt * ln(CAST(cnt AS DOUBLE)) * 1000)
                      AS BIGINT)) AS s_milli
      FROM c GROUP BY user_id),
    h AS (
      SELECT user_id,
             GREATEST(CAST(round(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT)
                      * n - s_milli, 0) // n AS h_milli
      FROM u WHERE n > 0)
    SELECT CAST(h_milli // {_UBE_BUCKET} AS BIGINT) AS entropy_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(h_milli) AS BIGINT) AS min_millinats,
           CAST(MAX(h_milli) AS BIGINT) AS max_millinats
    FROM h GROUP BY entropy_bucket ORDER BY entropy_bucket
    """,
)
def events_user_behavior_entropy(spark: SparkSession, sf_dir: str):
    """Per-user behavioral entropy histogram — Shannon entropy of each
    user's event-type distribution, bucketed into the corpus-level
    histogram a segmentation model reads (H≈0: single-action bots or
    dormant accounts; high H: engaged multi-feature users). The same
    exact-integer entropy contract as docs_char_entropy: per-(user,
    type) counts are one combinable groupBy, each c·ln(c) term
    quantizes to millinats immediately, and H = ln(n) − S/n is pure
    integer arithmetic — so the bucket histogram matches across
    engines exactly. Two combinable aggregations end-to-end, user
    grain never leaves the executors, histogram grain is bounded by
    ln(|event types|)/quantum."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    u = c.groupBy("user_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(
            F.round(
                F.col("cnt")
                * F.log(F.col("cnt").cast("double"))
                * 1000
            ).cast("bigint")
        ).alias("s_milli"),
    )
    h = u.filter(F.col("n") > 0).select(
        F.expr(
            "CAST(GREATEST(CAST(round(ln(CAST(n AS DOUBLE)) * 1000)"
            " AS BIGINT) * n - s_milli, 0) div n AS BIGINT)"
        ).alias("h_milli")
    )
    return (
        h.groupBy(
            F.expr(
                f"CAST(h_milli div {_UBE_BUCKET} AS BIGINT)"
            ).alias("entropy_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("h_milli").cast("bigint").alias("min_millinats"),
            F.max("h_milli").cast("bigint").alias("max_millinats"),
        )
        .orderBy("entropy_bucket")
    )
