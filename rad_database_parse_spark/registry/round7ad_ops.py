"""Round-7ad operators: closed-form logistic Newton step, rich-club
coefficient, sort-key pruning advisor, uplift/Qini readout,
ADI/CV² demand classification, and a tokenizer fertility audit.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. lineitem_logistic_newton_step — closed-form GLM iteration
# ------------------------------------------------------------------


@register(
    "lineitem_logistic_newton_step",
    """
    WITH base AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS x
      FROM lineitem),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * x) AS BIGINT) AS sxy
      FROM base),
    g AS (
      SELECT n, sx, sxx,
             sy - n / 2.0 AS g0,
             sxy - sx / 2.0 AS g1,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS det
      FROM m)
    SELECT n,
           4.0 * (sxx * g0 - sx * g1) / det AS logit_intercept,
           4.0 * (n * g1 - sx * g0) / det AS logit_slope_per_pct,
           4.0 * (sxx * g0 - sx * g1) / det
             AS linear_predictor_at_0pct,
           4.0 * (sxx * g0 - sx * g1) / det
             + 10.0 * (4.0 * (n * g1 - sx * g0) / det)
             AS linear_predictor_at_10pct
    FROM g
    """,
)
def lineitem_logistic_newton_step(spark: SparkSession, sf_dir: str):
    """One closed-form Newton step of logistic regression (return
    probability ~ discount) from β = 0 — the GLM member of the
    regression family (OLS, Theil-Sen, 2SLS, isotonic in the tier are
    all linear/ordinal): at β = 0 the IRLS weights are exactly ¼, so
    the step is β₁ = 4·(XᵀX)⁻¹ Xᵀ(y − ½), a 2×2 solve with an explicit
    determinant — no iteration, no driver loop. Five exact BIGINT
    moments from ONE scan (x ∈ {0..10} discount points keeps n·sxx
    within int64 far past sf100); intercept, slope, and the linear
    predictors at the discount extremes are fixed double expressions
    of those integers — engine-identical (no exp() in the output: libm
    exp differs across engines in the last ulp, so the logits are
    reported on the linear scale). At 100 TB this is one map-side
    partial aggregate; further Newton steps would each be one more
    scan with the same closed form re-weighted."""
    li = t(spark, sf_dir, "lineitem")
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (dec("l_discount") * 100).cast("bigint").alias("x"),
    )
    m = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("x")).cast("bigint").alias("sxy"),
    )
    g = m.select(
        "n",
        "sx",
        "sxx",
        F.expr("sy - n / 2.0").alias("g0"),
        F.expr("sxy - sx / 2.0").alias("g1"),
        F.expr(
            "CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"
        ).alias("det"),
    )
    return g.select(
        "n",
        F.expr("4.0 * (sxx * g0 - sx * g1) / det").alias(
            "logit_intercept"
        ),
        F.expr("4.0 * (n * g1 - sx * g0) / det").alias(
            "logit_slope_per_pct"
        ),
        F.expr("4.0 * (sxx * g0 - sx * g1) / det").alias(
            "linear_predictor_at_0pct"
        ),
        F.expr(
            "4.0 * (sxx * g0 - sx * g1) / det"
            " + 10.0 * (4.0 * (n * g1 - sx * g0) / det)"
        ).alias("linear_predictor_at_10pct"),
    )


# ------------------------------------------------------------------
# 2. graph_rich_club_coefficient — hub interconnection density
# ------------------------------------------------------------------

_RC_MIN_COOCCUR = 2
_RC_THRESHOLDS = [2, 4, 6, 8]


def _rich_club_oracle() -> str:
    ks = ", ".join(f"({k})" for k in _RC_THRESHOLDS)
    return f"""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS ord, l_suppkey AS supp
      FROM lineitem),
    pairs AS (
      SELECT a.supp AS u, b.supp AS v
      FROM base a JOIN base b ON b.ord = a.ord AND a.supp < b.supp
      GROUP BY 1, 2 HAVING COUNT(*) >= {_RC_MIN_COOCCUR}),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs
        UNION ALL SELECT v FROM pairs)
      GROUP BY 1),
    ks (k) AS (VALUES {ks}),
    nk AS (
      SELECT k.k, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM ks k JOIN deg d ON d.d > k.k GROUP BY 1),
    ek AS (
      SELECT k.k, CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM ks k
      JOIN pairs p ON TRUE
      JOIN deg du ON du.node = p.u AND du.d > k.k
      JOIN deg dv ON dv.node = p.v AND dv.d > k.k
      GROUP BY 1)
    SELECT CAST(n.k AS BIGINT) AS degree_gt, n.n_nodes,
           CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
           CAST(COALESCE(e.n_edges, 0) * 2000000
                // NULLIF(n.n_nodes * (n.n_nodes - 1), 0) AS BIGINT)
             AS density_ppm
    FROM nk n LEFT JOIN ek e ON e.k = n.k
    ORDER BY degree_gt
    """


@register("graph_rich_club_coefficient", _rich_club_oracle())
def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str):
    """Rich-club coefficient φ(k): the edge density among nodes of
    degree > k on the supplier co-supply graph (edge = co-fulfilled
    ≥{_RC_MIN_COOCCUR} orders) — rising φ(k) with k is the 'rich club'
    signature (hubs preferentially interconnect; supply networks and
    interbank networks show it, road networks don't), and it is the
    topology number behind cascading-failure risk in the procurement
    base. One fact-grain distinct + one bounded self-join per order
    builds the weighted pair list; degrees are one groupBy over it;
    each threshold is then a broadcast-joined filter-count over the
    SAME pair list — no per-k rescans of the fact table. All counts
    exact BIGINT; density quantizes to ppm by integer division. At
    100 TB the pair list (bounded by order-local supplier fan-out,
    not by n²) is the only shuffled state."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = li.select(
        F.col("l_orderkey").alias("ord"),
        F.col("l_suppkey").alias("supp"),
    ).distinct()
    b2 = base.select(
        F.col("ord").alias("ord2"), F.col("supp").alias("supp2")
    )
    pairs = (
        base.join(
            b2,
            (F.col("ord2") == F.col("ord"))
            & (F.col("supp") < F.col("supp2")),
        )
        .groupBy(F.col("supp").alias("u"), F.col("supp2").alias("v"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= _RC_MIN_COOCCUR)
        .select("u", "v")
        .persist()
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .union(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    ks = spark.createDataFrame(
        [(k,) for k in _RC_THRESHOLDS], "k INT"
    )
    nk = (
        ks.join(deg, deg.d > ks.k)
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
    )
    du = deg.select(F.col("node").alias("nu"), F.col("d").alias("d_u"))
    dv = deg.select(F.col("node").alias("nv"), F.col("d").alias("d_v"))
    ek = (
        pairs.join(F.broadcast(du), pairs.u == F.col("nu"))
        .join(F.broadcast(dv), pairs.v == F.col("nv"))
        .crossJoin(F.broadcast(ks))
        .filter((F.col("d_u") > F.col("k")) & (F.col("d_v") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            F.col("k").cast("bigint").alias("degree_gt"),
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0))
            .cast("bigint")
            .alias("n_edges"),
            F.expr(
                "CAST(COALESCE(n_edges, 0) * 2000000"
                " div NULLIF(n_nodes * (n_nodes - 1), 0) AS BIGINT)"
            ).alias("density_ppm"),
        )
        .orderBy("degree_gt")
    )


# ------------------------------------------------------------------
# 3. orders_sort_key_pruning_advisor — hypothetical-layout zone maps
# ------------------------------------------------------------------

# fixed probe constants + fixed bucket widths (documented: widths
# approximate equal-size files under the near-uniform TPC-H keys; the
# advisor compares LAYOUTS, so only relative prune rates matter)
_SKA_CUST_W = 1000
_SKA_PRICE_W_CENTS = 2_000_000  # $20k
_SKA_PROBE_CUST = 500
_SKA_PROBE_PRICE_CENTS = 15_000_000  # $150k
_SKA_PROBE_DATE = "1995-06-15"


def _ska_oracle() -> str:
    probes = f"""
      probes (probe_col, pc, pp, pd) AS (VALUES
        ('o_custkey', 1, 0, 0),
        ('o_totalprice', 0, 1, 0),
        ('o_orderdate', 0, 0, 1))"""
    selects = []
    for key, bexpr in [
        ("o_custkey", f"o_custkey // {_SKA_CUST_W}"),
        (
            "o_totalprice",
            f"CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            f" // {_SKA_PRICE_W_CENTS}",
        ),
        (
            "o_orderdate",
            "year(o_orderdate) * 12 + month(o_orderdate) - 1",
        ),
    ]:
        selects.append(
            f"""
      SELECT '{key}' AS sort_key, {bexpr} AS bucket,
             CAST(MIN(o_custkey) AS BIGINT) AS min_c,
             CAST(MAX(o_custkey) AS BIGINT) AS max_c,
             CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS min_p,
             CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS max_p,
             CAST(MIN(datediff('day', DATE '1992-01-01',
               CAST(o_orderdate AS DATE))) AS BIGINT) AS min_d,
             CAST(MAX(datediff('day', DATE '1992-01-01',
               CAST(o_orderdate AS DATE))) AS BIGINT) AS max_d
      FROM orders GROUP BY 2"""
        )
    zones = "\n      UNION ALL\n      ".join(selects)
    return f"""
    WITH zones AS ({zones}),
    {probes}
    SELECT z.sort_key, p.probe_col,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE
             WHEN p.pc = 1 AND ({_SKA_PROBE_CUST} < z.min_c
               OR {_SKA_PROBE_CUST} > z.max_c) THEN 1
             WHEN p.pp = 1 AND ({_SKA_PROBE_PRICE_CENTS} < z.min_p
               OR {_SKA_PROBE_PRICE_CENTS} > z.max_p) THEN 1
             WHEN p.pd = 1 AND (datediff('day', DATE '1992-01-01',
                 DATE '{_SKA_PROBE_DATE}') < z.min_d
               OR datediff('day', DATE '1992-01-01',
                 DATE '{_SKA_PROBE_DATE}') > z.max_d) THEN 1
             ELSE 0 END) AS BIGINT) AS n_pruned,
           CAST(SUM(CASE
             WHEN p.pc = 1 AND ({_SKA_PROBE_CUST} < z.min_c
               OR {_SKA_PROBE_CUST} > z.max_c) THEN 1
             WHEN p.pp = 1 AND ({_SKA_PROBE_PRICE_CENTS} < z.min_p
               OR {_SKA_PROBE_PRICE_CENTS} > z.max_p) THEN 1
             WHEN p.pd = 1 AND (datediff('day', DATE '1992-01-01',
                 DATE '{_SKA_PROBE_DATE}') < z.min_d
               OR datediff('day', DATE '1992-01-01',
                 DATE '{_SKA_PROBE_DATE}') > z.max_d) THEN 1
             ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS prune_ppm
    FROM zones z CROSS JOIN probes p
    GROUP BY 1, 2
    ORDER BY sort_key, probe_col
    """


@register("orders_sort_key_pruning_advisor", _ska_oracle())
def orders_sort_key_pruning_advisor(spark: SparkSession, sf_dir: str):
    """Sort-key advisor via HYPOTHETICAL zone maps — the layout
    decision the zorder/compaction ops execute, made quantitative
    before rewriting anything: for each candidate sort key, bucket the
    table as if files were clustered by that key, collect per-bucket
    min/max (exactly what parquet row-group stats would hold), and
    measure what fraction of buckets a fixed point probe on EACH
    column could skip. The diagonal (sort by X, probe X) shows near-
    total pruning; the off-diagonal shows the cost a layout imposes on
    the OTHER access paths — the number that settles sort-key debates.
    One scan per candidate key (3 bounded groupBys that AQE runs off
    one exchange-reused projection), all zone stats exact integers
    (cents / epoch-days), prune rates integer ppm. At 100 TB buckets
    map to files: the same query against real file stats is the
    files_zone_map_prune_stats op; this one evaluates layouts you
    haven't written yet."""
    o = t(spark, sf_dir, "orders")
    proj = o.select(
        "o_custkey",
        (dec("o_totalprice") * 100).cast("bigint").alias("price_c"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day_d"),
        F.expr(
            "year(o_orderdate) * 12 + month(o_orderdate) - 1"
        ).alias("ym"),
    ).persist()
    zones = None
    for key, bcol in [
        ("o_custkey", F.expr(f"o_custkey div {_SKA_CUST_W}")),
        ("o_totalprice", F.expr(f"price_c div {_SKA_PRICE_W_CENTS}")),
        ("o_orderdate", F.col("ym")),
    ]:
        z = proj.groupBy(bcol.alias("bucket")).agg(
            F.min("o_custkey").cast("bigint").alias("min_c"),
            F.max("o_custkey").cast("bigint").alias("max_c"),
            F.min("price_c").cast("bigint").alias("min_p"),
            F.max("price_c").cast("bigint").alias("max_p"),
            F.min("day_d").cast("bigint").alias("min_d"),
            F.max("day_d").cast("bigint").alias("max_d"),
        ).select(F.lit(key).alias("sort_key"), "*")
        zones = z if zones is None else zones.union(z)
    probes = spark.createDataFrame(
        [
            ("o_custkey", 1, 0, 0),
            ("o_totalprice", 0, 1, 0),
            ("o_orderdate", 0, 0, 1),
        ],
        "probe_col STRING, pc INT, pp INT, pd INT",
    )
    probe_day = F.datediff(
        F.lit(_SKA_PROBE_DATE).cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("bigint")
    pruned = F.when(
        (F.col("pc") == 1)
        & (
            (F.lit(_SKA_PROBE_CUST) < F.col("min_c"))
            | (F.lit(_SKA_PROBE_CUST) > F.col("max_c"))
        ),
        1,
    ).when(
        (F.col("pp") == 1)
        & (
            (F.lit(_SKA_PROBE_PRICE_CENTS) < F.col("min_p"))
            | (F.lit(_SKA_PROBE_PRICE_CENTS) > F.col("max_p"))
        ),
        1,
    ).when(
        (F.col("pd") == 1)
        & ((probe_day < F.col("min_d")) | (probe_day > F.col("max_d"))),
        1,
    ).otherwise(0)
    return (
        zones.crossJoin(F.broadcast(probes))
        .groupBy("sort_key", "probe_col")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(pruned).cast("bigint").alias("n_pruned"),
        )
        .select(
            "sort_key",
            "probe_col",
            "n_buckets",
            "n_pruned",
            F.expr(
                "CAST(n_pruned * 1000000 div n_buckets AS BIGINT)"
            ).alias("prune_ppm"),
        )
        .orderBy("sort_key", "probe_col")
    )


# ------------------------------------------------------------------
# 4. events_uplift_qini_by_segment — incremental-value readout
# ------------------------------------------------------------------

_QINI_BUCKETS = 5


@register(
    "events_uplift_qini_by_segment",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 = 0 AS INT) AS treated,
             LEAST(CAST(SUM(CASE WHEN event_type = 'view' THEN 1
               ELSE 0 END) AS BIGINT) // 5, {_QINI_BUCKETS - 1})
               AS bucket,
             CAST(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
               ELSE 0 END) AS BIGINT) AS purch_cents
      FROM events GROUP BY 1),
    cells AS (
      SELECT bucket,
             CAST(SUM(treated) AS BIGINT) AS n_t,
             CAST(SUM(1 - treated) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN treated = 1 THEN purch_cents
               ELSE 0 END) AS BIGINT) AS v_t,
             CAST(SUM(CASE WHEN treated = 0 THEN purch_cents
               ELSE 0 END) AS BIGINT) AS v_c
      FROM per_user GROUP BY 1),
    scored AS (
      SELECT bucket, n_t, n_c, v_t, v_c,
             CAST(v_t AS DOUBLE) / NULLIF(n_t, 0)
               - CAST(v_c AS DOUBLE) / NULLIF(n_c, 0) AS uplift_cents
      FROM cells)
    SELECT bucket, n_t AS n_treated, n_c AS n_control, uplift_cents,
           CAST(SUM(CAST(CASE WHEN v_t * n_c - v_c * n_t < 0
                         THEN -1 ELSE 1 END
                         * (ABS(v_t * n_c - v_c * n_t)
                            // NULLIF(n_c, 0)) AS BIGINT))
             OVER (ORDER BY uplift_cents DESC, bucket
                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS qini_cum_cents
    FROM scored
    ORDER BY uplift_cents DESC, bucket
    """,
)
def events_uplift_qini_by_segment(spark: SparkSession, sf_dir: str):
    """Uplift / Qini readout — the experiment-analysis sibling of the
    lift-gain curve that answers a DIFFERENT question: not 'who
    responds' but 'who responds BECAUSE of the treatment'. Users split
    by the deterministic assignment hash (parity, as the DiD op);
    engagement buckets (capped view-count quintiles — a stand-in for a
    model-score decile) order the Qini curve; per-bucket uplift is the
    treated-minus-control mean purchase value, and the Qini cumulative
    is Σ(v_t − v_c·n_t/n_c) in uplift order — the area under it is the
    targeting headroom. Cells fold to exact BIGINT (counts, cents) in
    two hash aggregates; uplift is a fixed double expression of those
    integers, and each Qini term quantizes to whole cents via
    SIGN-SYMMETRIC truncation ((v_t·n_c − v_c·n_t)/n_c — floor vs
    truncate differ across engines on negatives, so abs-then-divide)
    BEFORE the cumulative sum, keeping the running total pure BIGINT
    (v_t·n_c stays in int64 through sf1, documented bound). The final window runs over {_QINI_BUCKETS} rows
    — bounded by construction, never fact-grain. At 100 TB a real
    model score replaces the engagement proxy; the two-aggregate shape
    is unchanged."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "LEAST(CAST(SUM(CASE WHEN event_type = 'view' THEN 1"
            f" ELSE 0 END) AS BIGINT) div 5, {_QINI_BUCKETS - 1})"
        ).alias("bucket"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                (dec("value") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("purch_cents"),
    ).select(
        F.expr("CAST(user_id % 2 = 0 AS INT)").alias("treated"),
        "bucket",
        "purch_cents",
    )
    cells = per_user.groupBy("bucket").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("purch_cents")).otherwise(0))
        .cast("bigint")
        .alias("v_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("purch_cents")).otherwise(0))
        .cast("bigint")
        .alias("v_c"),
    )
    scored = cells.select(
        "bucket",
        "n_t",
        "n_c",
        "v_t",
        "v_c",
        F.expr(
            "CAST(v_t AS DOUBLE) / NULLIF(n_t, 0)"
            " - CAST(v_c AS DOUBLE) / NULLIF(n_c, 0)"
        ).alias("uplift_cents"),
    )
    w = (
        Window.orderBy(F.col("uplift_cents").desc(), "bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return scored.select(
        "bucket",
        F.col("n_t").alias("n_treated"),
        F.col("n_c").alias("n_control"),
        "uplift_cents",
        F.sum(
            F.expr(
                "CAST(CASE WHEN v_t * n_c - v_c * n_t < 0"
                " THEN -1 ELSE 1 END"
                " * (ABS(v_t * n_c - v_c * n_t)"
                " div NULLIF(n_c, 0)) AS BIGINT)"
            )
        )
        .over(w)
        .cast("bigint")
        .alias("qini_cum_cents"),
    ).orderBy(F.col("uplift_cents").desc(), "bucket")


# ------------------------------------------------------------------
# 5. part_demand_adi_cv2_classes — Syntetos-Boylan classification
# ------------------------------------------------------------------

_ADI_CUT_MILLI = 1320  # ADI 1.32
_CV2_CUT_MILLI = 490   # CV² 0.49


@register(
    "part_demand_adi_cv2_classes",
    f"""
    WITH horizon AS (
      SELECT CAST(COUNT(DISTINCT year(l_shipdate) * 12
        + month(l_shipdate)) AS BIGINT) AS h
      FROM lineitem),
    pm AS (
      SELECT l_partkey AS part,
             year(l_shipdate) * 12 + month(l_shipdate) AS ym,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    stats AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS sqq
      FROM pm GROUP BY 1),
    cls AS (
      SELECT part,
             CAST((SELECT h FROM horizon) * 1000 // k AS BIGINT)
               AS adi_milli,
             CAST((k * sqq - s * s) * 1000 // (s * s) AS BIGINT)
               AS cv2_milli
      FROM stats),
    labeled AS (
      SELECT CASE
               WHEN adi_milli < {_ADI_CUT_MILLI}
                 AND cv2_milli < {_CV2_CUT_MILLI} THEN 'smooth'
               WHEN adi_milli >= {_ADI_CUT_MILLI}
                 AND cv2_milli < {_CV2_CUT_MILLI} THEN 'intermittent'
               WHEN adi_milli < {_ADI_CUT_MILLI} THEN 'erratic'
               ELSE 'lumpy' END AS demand_class
      FROM cls)
    SELECT demand_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER ()
             AS BIGINT) AS share_ppm
    FROM labeled GROUP BY 1 ORDER BY demand_class
    """,
)
def part_demand_adi_cv2_classes(spark: SparkSession, sf_dir: str):
    """Syntetos-Boylan demand classification (ADI × CV² quadrants:
    smooth / intermittent / erratic / lumpy) — the router that decides
    WHICH forecast model each part gets (smooth → exponential
    smoothing, intermittent → the tier's Croston op, lumpy → the
    newsvendor quantile): ADI = demand-horizon months over months WITH
    demand, CV² = variance/mean² of the nonzero monthly quantities.
    Month grain folds from one fact scan; per-part moments (k, Σq,
    Σq²) are exact BIGINT, and both ratios quantize to milli by
    integer division BEFORE the fixed literature cut-points (1.32,
    0.49) — no float compares near the boundary. The horizon is one
    global distinct-month count broadcast everywhere. Output is the
    4-row class census; at 100 TB everything past the first groupBy is
    part-grain."""
    li = t(spark, sf_dir, "lineitem")
    ym = F.expr("year(l_shipdate) * 12 + month(l_shipdate)")
    horizon = li.agg(
        F.count_distinct(ym).cast("bigint").alias("h")
    )
    pm = li.groupBy(
        F.col("l_partkey").alias("part"), ym.alias("ym")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    stats = pm.groupBy("part").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sqq"),
    )
    cls = stats.crossJoin(F.broadcast(horizon)).select(
        "part",
        F.expr("CAST(h * 1000 div k AS BIGINT)").alias("adi_milli"),
        F.expr(
            "CAST((k * sqq - s * s) * 1000 div (s * s) AS BIGINT)"
        ).alias("cv2_milli"),
    )
    labeled = cls.select(
        F.when(
            (F.col("adi_milli") < _ADI_CUT_MILLI)
            & (F.col("cv2_milli") < _CV2_CUT_MILLI),
            "smooth",
        )
        .when(
            (F.col("adi_milli") >= _ADI_CUT_MILLI)
            & (F.col("cv2_milli") < _CV2_CUT_MILLI),
            "intermittent",
        )
        .when(F.col("adi_milli") < _ADI_CUT_MILLI, "erratic")
        .otherwise("lumpy")
        .alias("demand_class")
    )
    counted = labeled.groupBy("demand_class").agg(
        F.count("*").cast("bigint").alias("n_parts")
    )
    counted = counted.withColumn(
        "share_ppm",
        F.expr(
            "CAST(n_parts * 1000000 div SUM(n_parts) OVER ()"
            " AS BIGINT)"
        ),
    )
    return counted.orderBy("demand_class")


# ------------------------------------------------------------------
# 6. docs_tokenizer_fertility_by_lang — tokenizer efficiency audit
# ------------------------------------------------------------------


@register(
    "docs_tokenizer_fertility_by_lang",
    r"""
    WITH m AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(length(text)) AS BIGINT) AS chars,
             CAST(SUM(strlen(text)) AS BIGINT) AS bytes,
             CAST(SUM(len(regexp_extract_all(text, '\S+')))
               AS BIGINT) AS words,
             CAST(SUM(len(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS toks
      FROM documents GROUP BY 1)
    SELECT lang, n_docs, toks AS n_tokens_bpe,
           CAST(toks * 1000 // NULLIF(words, 0) AS BIGINT)
             AS fertility_milli,
           CAST(chars * 1000 // NULLIF(toks, 0) AS BIGINT)
             AS chars_per_token_milli,
           CAST(bytes * 1000 // NULLIF(toks, 0) AS BIGINT)
             AS bytes_per_token_milli,
           CAST(bytes * 1000 // NULLIF(chars, 0) AS BIGINT)
             AS bytes_per_char_milli
    FROM m ORDER BY lang
    """,
)
def docs_tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str):
    """Tokenizer fertility audit by language — the compute-budget
    number every multilingual training plan starts from: fertility
    (sub-word tokens per word) is where low-resource languages quietly
    cost 2-4× more context per sentence, and bytes/token is the
    storage-to-context exchange rate. Uses the tier's BPE-ish token
    regex (letter runs / digit runs / single punctuation — the same
    expression docs_token_stats gates) plus whitespace words, chars,
    and bytes (octet_length ≠ length exactly where multibyte text
    appears — bytes_per_char_milli > 1000 flags it). One scan, one
    groupBy over the bounded language set, all sums exact BIGINT and
    every rate milli-quantized by integer division. At 100 TB this is
    a pure map-side partial aggregate — the cheapest audit in the
    curation tier."""
    d = t(spark, sf_dir, "documents")
    m = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("chars"),
        F.sum(F.octet_length("text")).cast("bigint").alias("bytes"),
        F.sum(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0)))
        )
        .cast("bigint")
        .alias("words"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")),
                    F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"),
                    F.lit(0),
                )
            )
        )
        .cast("bigint")
        .alias("toks"),
    )
    return m.select(
        "lang",
        "n_docs",
        F.col("toks").alias("n_tokens_bpe"),
        F.expr("CAST(toks * 1000 div NULLIF(words, 0) AS BIGINT)").alias(
            "fertility_milli"
        ),
        F.expr("CAST(chars * 1000 div NULLIF(toks, 0) AS BIGINT)").alias(
            "chars_per_token_milli"
        ),
        F.expr("CAST(bytes * 1000 div NULLIF(toks, 0) AS BIGINT)").alias(
            "bytes_per_token_milli"
        ),
        F.expr("CAST(bytes * 1000 div NULLIF(chars, 0) AS BIGINT)").alias(
            "bytes_per_char_milli"
        ),
    ).orderBy("lang")
