"""Round-7ac operators: delta-method ratio-metric inference, CRPS
ensemble-forecast scoring, t-closeness privacy audit, Bloom-filter
sizing planner, Huber M-estimator, and the exact graph neighborhood
function (the quantity HyperANF approximates).

Parity contract as everywhere (registry/__init__.py float policy):
exact BIGINT partials from one scan; any double is a fixed expression
of those integers, written with identical text in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. events_ratio_metric_delta_method — ratio-of-means inference
# ------------------------------------------------------------------

_Z95 = 1.96


@register(
    "events_ratio_metric_delta_method",
    f"""
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(n) AS BIGINT) AS sn,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(n * n) AS BIGINT) AS snn,
             CAST(SUM(x * n) AS BIGINT) AS sxn
      FROM per_user GROUP BY 1),
    d AS (
      SELECT event_type, n_users,
             CAST(sx AS DOUBLE) / sn AS r,
             CAST(sn AS DOUBLE) / n_users AS mn,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_users)
               / NULLIF(n_users - 1, 0) AS vx,
             (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n_users)
               / NULLIF(n_users - 1, 0) AS vn,
             (CAST(sxn AS DOUBLE) - CAST(sx AS DOUBLE) * sn / n_users)
               / NULLIF(n_users - 1, 0) AS cxn
      FROM m),
    s AS (
      SELECT event_type, n_users, r,
             sqrt(GREATEST(0.0, vx - 2.0 * r * cxn + r * r * vn)
                  / n_users) / mn AS se
      FROM d)
    SELECT event_type, n_users,
           r AS ratio_cents_per_event,
           se AS se_delta_cents,
           r - {_Z95} * se AS ci_lo_cents,
           r + {_Z95} * se AS ci_hi_cents
    FROM s ORDER BY event_type
    """,
)
def events_ratio_metric_delta_method(spark: SparkSession, sf_dir: str):
    """Delta-method inference for a RATIO metric (value per event,
    user-randomized): the standard experiment-analysis correction when
    the metric's denominator is itself random — naive per-event SE is
    wrong because events within a user correlate; the delta method
    expands var(X̄/N̄) ≈ (varX − 2R·cov + R²·varN)/(n·μN²) over USER-level
    aggregates. One fact scan builds per-user (sum_cents, n) pairs;
    one more groupBy folds the five exact BIGINT moment sums per
    event_type (x ≲ 1e7 cents/user keeps x² sums within BIGINT through
    sf1, documented bound); ratio, SE, and the 95% CI are fixed double
    expressions of those integers — engine-identical. At 100 TB both
    aggregates are hash partials; nothing is row-granular past the
    first groupBy. GREATEST(0,·) guards the tiny-variance negative
    rounding; a 1-user group surfaces NULL SE in both engines."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum((dec("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x"),
        F.count("*").cast("bigint").alias("n"),
    )
    m = per_user.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("n").cast("bigint").alias("sn"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("snn"),
        F.sum(F.col("x") * F.col("n")).cast("bigint").alias("sxn"),
    )
    d = m.select(
        "event_type",
        "n_users",
        F.expr("CAST(sx AS DOUBLE) / sn").alias("r"),
        F.expr("CAST(sn AS DOUBLE) / n_users").alias("mn"),
        F.expr(
            "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_users)"
            " / NULLIF(n_users - 1, 0)"
        ).alias("vx"),
        F.expr(
            "(CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n_users)"
            " / NULLIF(n_users - 1, 0)"
        ).alias("vn"),
        F.expr(
            "(CAST(sxn AS DOUBLE) - CAST(sx AS DOUBLE) * sn / n_users)"
            " / NULLIF(n_users - 1, 0)"
        ).alias("cxn"),
    )
    s = d.select(
        "event_type",
        "n_users",
        "r",
        F.expr(
            "sqrt(GREATEST(0.0, vx - 2.0 * r * cxn + r * r * vn)"
            " / n_users) / mn"
        ).alias("se"),
    )
    return s.select(
        "event_type",
        "n_users",
        F.col("r").alias("ratio_cents_per_event"),
        F.col("se").alias("se_delta_cents"),
        (F.col("r") - _Z95 * F.col("se")).alias("ci_lo_cents"),
        (F.col("r") + _Z95 * F.col("se")).alias("ci_hi_cents"),
    ).orderBy("event_type")


# ------------------------------------------------------------------
# 2. orders_crps_ensemble_eval — proper scoring of ensemble forecasts
# ------------------------------------------------------------------


@register(
    "orders_crps_ensemble_eval",
    """
    WITH monthly AS (
      SELECT year(o_orderdate) AS y, month(o_orderdate) AS mo,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2),
    latest AS (SELECT MAX(y) AS ty FROM monthly),
    obs AS (
      SELECT m.mo, m.rev AS obs_rev
      FROM monthly m, latest WHERE m.y = latest.ty),
    ens AS (
      SELECT m.mo, m.y, m.rev
      FROM monthly m, latest WHERE m.y < latest.ty),
    a AS (
      SELECT e.mo, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(ABS(e.rev - o.obs_rev)) AS BIGINT) AS asum
      FROM ens e JOIN obs o ON o.mo = e.mo GROUP BY 1),
    b AS (
      SELECT e1.mo,
             CAST(SUM(ABS(e1.rev - e2.rev)) AS BIGINT) AS bsum
      FROM ens e1 JOIN ens e2 ON e2.mo = e1.mo AND e1.y < e2.y
      GROUP BY 1)
    SELECT a.mo AS month, a.n_members, o.obs_rev AS obs_revenue_cents,
           CAST(a.asum * 1000 // a.n_members AS BIGINT)
             AS mae_milli_cents,
           CAST((a.asum * a.n_members - COALESCE(b.bsum, 0)) * 1000
                // (a.n_members * a.n_members) AS BIGINT)
             AS crps_milli_cents
    FROM a JOIN obs o ON o.mo = a.mo
    LEFT JOIN b ON b.mo = a.mo
    ORDER BY month
    """,
)
def orders_crps_ensemble_eval(spark: SparkSession, sf_dir: str):
    """CRPS (continuous ranked probability score) for an empirical
    ensemble forecast — the PROPER scoring rule for distributional
    forecasts, which MAE cannot replace: CRPS = E|X−obs| − ½E|X−X'|
    rewards calibrated spread, so an ensemble that hedges correctly
    beats a sharp-but-wrong one. The ensemble for each month of the
    latest year is that month's revenue from every earlier year
    (seasonal climatology — the standard no-skill reference forecast).
    Monthly revenue folds to exact cents; with ensemble size E ≤ 6 the
    E² pairwise term is a bounded month-grain self-join (≤ months×E²
    rows, never fact-grain), and CRPS·E² = A·E − Σ_{i<j}|xi−xj| stays
    in exact integer cents until one final milli-cent integer division
    — engines add identical integers. At 100 TB the fact scan is the
    only big stage; everything after is dozens of rows. The CRPS < MAE
    gap in the output is the hedging value of the ensemble spread."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    monthly = monthly.persist()
    latest = monthly.agg(F.max("y").alias("ty"))
    obs = (
        monthly.crossJoin(F.broadcast(latest))
        .filter(F.col("y") == F.col("ty"))
        .select("mo", F.col("rev").alias("obs_rev"))
    )
    ens = (
        monthly.crossJoin(F.broadcast(latest))
        .filter(F.col("y") < F.col("ty"))
        .select("mo", "y", "rev")
    )
    a = (
        ens.join(F.broadcast(obs), "mo")
        .groupBy("mo")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum(F.abs(F.col("rev") - F.col("obs_rev")))
            .cast("bigint")
            .alias("asum"),
        )
    )
    e2 = ens.select(
        F.col("mo").alias("mo2"),
        F.col("y").alias("y2"),
        F.col("rev").alias("rev2"),
    )
    b = (
        ens.join(
            e2,
            (F.col("mo2") == F.col("mo")) & (F.col("y") < F.col("y2")),
        )
        .groupBy("mo")
        .agg(
            F.sum(F.abs(F.col("rev") - F.col("rev2")))
            .cast("bigint")
            .alias("bsum")
        )
    )
    return (
        a.join(F.broadcast(obs), "mo")
        .join(F.broadcast(b), "mo", "left")
        .select(
            F.col("mo").alias("month"),
            "n_members",
            F.col("obs_rev").alias("obs_revenue_cents"),
            F.expr(
                "CAST(asum * 1000 div n_members AS BIGINT)"
            ).alias("mae_milli_cents"),
            F.expr(
                "CAST((asum * n_members - COALESCE(bsum, 0)) * 1000"
                " div (n_members * n_members) AS BIGINT)"
            ).alias("crps_milli_cents"),
        )
        .orderBy("month")
    )


# ------------------------------------------------------------------
# 3. customer_t_closeness_audit — ordered-EMD privacy audit
# ------------------------------------------------------------------

_TCLOSE_TOPK = 10


@register(
    "customer_t_closeness_audit",
    f"""
    WITH binned AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
              + 100000) // 100000 AS bin
      FROM customer),
    gdist AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS c,
             SUM(COUNT(*)) OVER () AS tot
      FROM binned GROUP BY 1),
    gp AS (
      SELECT bin, CAST(c * 1000000 // tot AS BIGINT) AS p_ppm
      FROM gdist),
    nbins AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM gp),
    cls AS (
      SELECT nation, segment, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM binned GROUP BY 1, 2, 3),
    csize AS (
      SELECT nation, segment, CAST(SUM(c) AS BIGINT) AS n_members
      FROM cls GROUP BY 1, 2),
    grid AS (
      SELECT s.nation, s.segment, s.n_members, g.bin, g.p_ppm,
             CAST(COALESCE(c.c, 0) * 1000000 // s.n_members AS BIGINT)
               AS q_ppm
      FROM csize s CROSS JOIN gp g
      LEFT JOIN cls c ON c.nation = s.nation
        AND c.segment = s.segment AND c.bin = g.bin),
    cum AS (
      SELECT nation, segment, n_members,
             SUM(q_ppm - p_ppm) OVER (PARTITION BY nation, segment
               ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cd
      FROM grid),
    emd AS (
      SELECT nation, segment, n_members,
             CAST(SUM(ABS(cd)) // (SELECT k - 1 FROM nbins) AS BIGINT)
               AS emd_ppm
      FROM cum GROUP BY 1, 2, 3)
    SELECT CAST(nation AS INT) AS nation, segment, n_members, emd_ppm
    FROM emd
    ORDER BY emd_ppm DESC, nation, segment
    LIMIT {_TCLOSE_TOPK}
    """,
)
def customer_t_closeness_audit(spark: SparkSession, sf_dir: str):
    """t-closeness audit — the member of the privacy triad (with the
    k-anonymity and l-diversity audits already in the tier) that
    catches SKEW attacks both miss: a QI class can be k-anonymous and
    l-diverse yet still leak if its sensitive-value DISTRIBUTION sits
    far from the table's. For the ordered sensitive attribute
    (account-balance band, 11 fixed $1000 bins via pure integer
    arithmetic on cents), the Earth Mover's Distance reduces to the
    mean |cumulative difference| — one window over the bounded
    class×bin grid (125×11, built by cross join so empty bins count).
    Distributions quantize to exact integer ppm BEFORE differencing,
    so the cumsum and EMD are pure BIGINT in both engines. The top-10
    classes by EMD are the re-identification review queue. At 100 TB
    the only fact-grain stage is the first groupBy; the grid and
    window never leave a few thousand rows."""
    c = t(spark, sf_dir, "customer")
    binned = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " + 100000) div 100000"
        ).alias("bin"),
    )
    glob = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("c")
    )
    glob = glob.withColumn(
        "tot", F.sum("c").over(Window.partitionBy())
    )
    gp = glob.select(
        "bin", F.expr("CAST(c * 1000000 div tot AS BIGINT)").alias("p_ppm")
    )
    nbins = gp.agg(F.count("*").cast("bigint").alias("k"))
    cls = binned.groupBy("nation", "segment", "bin").agg(
        F.count("*").cast("bigint").alias("c")
    )
    csize = cls.groupBy("nation", "segment").agg(
        F.sum("c").cast("bigint").alias("n_members")
    )
    grid = (
        csize.crossJoin(F.broadcast(gp))
        .join(
            cls.withColumnRenamed("c", "cc"),
            ["nation", "segment", "bin"],
            "left",
        )
        .select(
            "nation",
            "segment",
            "n_members",
            "bin",
            "p_ppm",
            F.expr(
                "CAST(COALESCE(cc, 0) * 1000000 div n_members"
                " AS BIGINT)"
            ).alias("q_ppm"),
        )
    )
    w = (
        Window.partitionBy("nation", "segment")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "nation",
        "segment",
        "n_members",
        F.sum(F.col("q_ppm") - F.col("p_ppm")).over(w).alias("cd"),
    )
    emd = (
        cum.groupBy("nation", "segment", "n_members")
        .agg(F.sum(F.abs("cd")).cast("bigint").alias("sabs"))
        .crossJoin(F.broadcast(nbins))
        .select(
            "nation",
            "segment",
            "n_members",
            F.expr("CAST(sabs div (k - 1) AS BIGINT)").alias("emd_ppm"),
        )
    )
    return (
        emd.select(
            F.col("nation").cast("int").alias("nation"),
            "segment",
            "n_members",
            "emd_ppm",
        )
        .orderBy(F.col("emd_ppm").desc(), "nation", "segment")
        .limit(_TCLOSE_TOPK)
    )


# ------------------------------------------------------------------
# 4. orders_bloom_fpp_planner — Bloom-filter sizing from exact NDV
# ------------------------------------------------------------------

# bits/key = -ln(p) / ln(2)^2, precomputed so both engines multiply by
# ONE double literal (no cross-engine ln() in the query text).
_BLOOM_TARGETS = [
    (10_000, -math.log(0.01) / (math.log(2) ** 2)),   # 1% fpp
    (1_000, -math.log(0.001) / (math.log(2) ** 2)),   # 0.1% fpp
]
_LN2 = math.log(2)


def _bloom_oracle() -> str:
    rows = ",\n        ".join(
        f"({ppm}, {factor!r})" for ppm, factor in _BLOOM_TARGETS
    )
    return f"""
    WITH ndv AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_order
      FROM orders),
    cols AS (
      SELECT 'o_custkey' AS column_name, nd_cust AS ndv FROM ndv
      UNION ALL
      SELECT 'o_orderkey', nd_order FROM ndv),
    targets (target_fpp_ppm, factor) AS (VALUES
        {rows}),
    plan AS (
      SELECT c.column_name,
             CAST(t.target_fpp_ppm AS BIGINT) AS target_fpp_ppm, c.ndv,
             CAST(ceil(c.ndv * t.factor) AS BIGINT) AS bloom_bits,
             CAST(round(t.factor * {_LN2!r}) AS BIGINT) AS n_hashes
      FROM cols c CROSS JOIN targets t)
    SELECT column_name, target_fpp_ppm, ndv, bloom_bits,
           CAST((bloom_bits + 7) // 8 AS BIGINT) AS bloom_bytes,
           n_hashes,
           CAST(bloom_bits * 1000 // ndv AS BIGINT) AS bits_per_key_milli
    FROM plan ORDER BY column_name, target_fpp_ppm DESC
    """


@register("orders_bloom_fpp_planner", _bloom_oracle())
def orders_bloom_fpp_planner(spark: SparkSession, sf_dir: str):
    """Bloom-filter sizing planner — the optimizer-side arithmetic
    under every runtime-filter decision (Spark's own
    InjectRuntimeFilter, Parquet column bloom filters, the tier's
    bloom_prune_semijoin): given exact column NDV and a target false-
    positive rate, the optimal filter is m = ⌈n·(−ln p)/ln²2⌉ bits and
    k = round(m/n·ln 2) hashes. The −ln(p)/ln²2 factor is precomputed
    into ONE double literal shared by both query texts, so neither
    engine evaluates ln() — ceil/round over identical products are
    engine-identical, and everything after is integer. One exact
    distinct-count scan (at 100 TB you'd swap HLL ndv in, same shape —
    the planner tolerates ±2% ndv error by design); the plan grid is
    columns × targets, a handful of rows. bits_per_key_milli is the
    memory-budget number a reviewer checks against the classic
    9.6 bits/key @ 1% landmark."""
    o = t(spark, sf_dir, "orders")
    ndv = o.agg(
        F.count_distinct("o_custkey").cast("bigint").alias("nd_cust"),
        F.count_distinct("o_orderkey").cast("bigint").alias("nd_order"),
    )
    cols = ndv.selectExpr(
        "stack(2, 'o_custkey', nd_cust, 'o_orderkey', nd_order)"
        " AS (column_name, ndv)"
    )
    targets = spark.createDataFrame(
        [(ppm, factor) for ppm, factor in _BLOOM_TARGETS],
        "target_fpp_ppm BIGINT, factor DOUBLE",
    )
    plan = cols.crossJoin(F.broadcast(targets)).select(
        "column_name",
        "target_fpp_ppm",
        "ndv",
        F.expr("CAST(ceil(ndv * factor) AS BIGINT)").alias("bloom_bits"),
        F.expr(f"CAST(round(factor * {_LN2!r}) AS BIGINT)").alias(
            "n_hashes"
        ),
    )
    return plan.select(
        "column_name",
        "target_fpp_ppm",
        "ndv",
        "bloom_bits",
        F.expr("CAST((bloom_bits + 7) div 8 AS BIGINT)").alias(
            "bloom_bytes"
        ),
        "n_hashes",
        F.expr("CAST(bloom_bits * 1000 div ndv AS BIGINT)").alias(
            "bits_per_key_milli"
        ),
    ).orderBy("column_name", F.col("target_fpp_ppm").desc())


# ------------------------------------------------------------------
# 5. lineitem_huber_m_estimator — iterative robust location
# ------------------------------------------------------------------

_HUBER_K_MILLI = 1345  # k = 1.345 — 95% efficiency at the Gaussian


@register(
    "lineitem_huber_m_estimator",
    f"""
    WITH base AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT) AS x
      FROM lineitem),
    med AS (SELECT quantile_cont(x, 0.5) AS m FROM base),
    mad AS (
      SELECT quantile_cont(ABS(x - (SELECT m FROM med)), 0.5) AS s
      FROM base),
    c0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(x) // COUNT(*) AS BIGINT) AS c,
             CAST(round({_HUBER_K_MILLI} * (SELECT s FROM mad)
               / 1000.0) AS BIGINT) AS b
      FROM base),
    it1 AS (
      SELECT CAST(SUM(LEAST(GREATEST(x, c0.c - c0.b), c0.c + c0.b))
               // COUNT(*) AS BIGINT) AS c, c0.b AS b
      FROM base, c0 GROUP BY c0.b),
    it2 AS (
      SELECT CAST(SUM(LEAST(GREATEST(x, it1.c - it1.b), it1.c + it1.b))
               // COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN x < it1.c - it1.b
                        OR x > it1.c + it1.b THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clipped
      FROM base, it1 GROUP BY it1.b)
    SELECT c0.n_rows, c0.c AS mean_cents,
           CAST(round((SELECT m FROM med) * 1000) AS BIGINT)
             AS median_milli_cents,
           CAST(round((SELECT s FROM mad) * 1000) AS BIGINT)
             AS mad_milli_cents,
           c0.b AS clip_halfwidth_cents,
           it1.c AS huber_center1_cents,
           it2.c AS huber_center2_cents,
           it2.n_clipped AS n_clipped_final
    FROM c0, it1, it2
    """,
)
def lineitem_huber_m_estimator(spark: SparkSession, sf_dir: str):
    """Huber M-estimator of location — the ITERATIVE member of the
    robust-statistics family (MAD and winsorized moments in the tier
    are one-shot): two unrolled IRLS rounds re-center the clip window
    at the previous estimate, converging to the ψ-function fixpoint
    that down-weights tails without discarding them. Everything is
    exact integer cents: the start is the floor mean, the scale is the
    MAD (exact interpolated percentile — midpoints land on .5/.25
    binary-exact doubles, identical in both engines), the clip
    half-width k·MAD rounds once to integer cents, and each round is
    SUM(clip(x))//COUNT over ints. Four scans of the cents column
    (median, MAD, 2 rounds) — at 100 TB you'd persist the single-column
    projection once (~8 bytes/row) and/or swap approx_percentile into
    the scale step; the per-round aggregate is a map-side partial
    either way. A (x, n) value-histogram form (frequency-weighted
    percentile + n-weighted clips — sufficient stats, the
    quantile-grid r9 recipe) was A/B-measured at sf0.1 and REJECTED
    for now: values identical, but ~480k of 600k rows are distinct so
    the extra groupBy costs ~15% here. It becomes the right plan when
    rows ≫ |parts|×50 (the histogram's bound) — i.e., exactly at
    100 TB — so the swap is recorded as the scale path, conditional on
    that ratio, not applied at bench scale. n_clipped_final reports
    how much tail the estimator is actually resisting."""
    li = t(spark, sf_dir, "lineitem")
    base = li.select(
        (dec("l_extendedprice") * 100).cast("bigint").alias("x")
    )
    base = base.persist()
    med = base.agg(F.expr("percentile(x, 0.5)").alias("m"))
    mad = (
        base.crossJoin(F.broadcast(med))
        .agg(F.expr("percentile(ABS(x - m), 0.5)").alias("s"))
    )
    c0 = (
        base.crossJoin(F.broadcast(mad))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.expr("CAST(SUM(x) div COUNT(*) AS BIGINT)").alias("c"),
            F.expr(
                f"CAST(round({_HUBER_K_MILLI} * first(s) / 1000.0)"
                " AS BIGINT)"
            ).alias("b"),
        )
    )
    it1 = (
        base.crossJoin(F.broadcast(c0.select("c", "b")))
        .agg(
            F.expr(
                "CAST(SUM(LEAST(GREATEST(x, c - b),"
                " c + b)) div COUNT(*) AS BIGINT)"
            ).alias("c1"),
            F.expr("first(b)").cast("bigint").alias("b1"),
        )
    )
    it2 = (
        base.crossJoin(F.broadcast(it1))
        .agg(
            F.expr(
                "CAST(SUM(LEAST(GREATEST(x, c1 - b1),"
                " c1 + b1)) div COUNT(*) AS BIGINT)"
            ).alias("c2"),
            F.sum(
                F.expr(
                    "CASE WHEN x < c1 - b1 OR x > c1 + b1"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_clipped"),
        )
    )
    out = (
        c0.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(it1))
        .crossJoin(F.broadcast(it2))
        .select(
            "n_rows",
            F.col("c").alias("mean_cents"),
            F.expr("CAST(round(m * 1000) AS BIGINT)").alias(
                "median_milli_cents"
            ),
            F.expr("CAST(round(s * 1000) AS BIGINT)").alias(
                "mad_milli_cents"
            ),
            F.col("b").alias("clip_halfwidth_cents"),
            F.col("c1").alias("huber_center1_cents"),
            F.col("c2").alias("huber_center2_cents"),
            F.col("n_clipped").alias("n_clipped_final"),
        )
    )
    return out


# ------------------------------------------------------------------
# 6. graph_neighborhood_function_exact — what HyperANF approximates
# ------------------------------------------------------------------

_ANF_TOPK = 5  # kNN similarity graph: top-5 co-suppliers per node
_ANF_ROUNDS = 3


def _anf_oracle() -> str:
    steps = []
    for r in range(2, _ANF_ROUNDS + 1):
        steps.append(
            f"""
    d{r} AS (
      SELECT u, v, CAST(MIN(d) AS BIGINT) AS d FROM (
        SELECT u, v, d FROM d{r - 1}
        UNION ALL
        SELECT p.u, e.v, p.d + 1 AS d
        FROM d{r - 1} p JOIN edges e ON e.u = p.v
        WHERE p.u != e.v)
      GROUP BY 1, 2)"""
        )
    counts = ",\n           ".join(
        f"CAST(COUNT(*) FILTER (WHERE d <= {r}) // 2 AS BIGINT)"
        f" AS n{r}"
        for r in range(1, _ANF_ROUNDS + 1)
    )
    stack = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({r} AS BIGINT) AS radius, n{r} AS pairs_reached"
        " FROM cnts"
        for r in range(1, _ANF_ROUNDS + 1)
    )
    return f"""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS ord, l_suppkey AS supp
      FROM lineitem),
    shared AS (
      SELECT a.supp AS u, b.supp AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base a JOIN base b ON b.ord = a.ord AND a.supp != b.supp
      GROUP BY 1, 2),
    knn AS (
      SELECT u, v FROM (
        SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u
          ORDER BY cnt DESC, v) AS rk
        FROM shared)
      WHERE rk <= {_ANF_TOPK}),
    edges AS (
      SELECT u, v FROM knn UNION SELECT v, u FROM knn),
    nodes AS (
      SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM edges),
    d1 AS (SELECT u, v, CAST(1 AS BIGINT) AS d FROM edges),
    {','.join(steps)},
    cnts AS (
      SELECT {counts}
      FROM d{_ANF_ROUNDS}),
    reach AS (
      {stack})
    SELECT r.radius, r.pairs_reached,
           CAST(r.pairs_reached * 1000000
                // (n.n * (n.n - 1) // 2) AS BIGINT) AS reach_ppm
    FROM reach r CROSS JOIN nodes n
    ORDER BY radius
    """


@register("graph_neighborhood_function_exact", _anf_oracle())
def graph_neighborhood_function_exact(spark: SparkSession, sf_dir: str):
    """Exact neighborhood function N(r) — the number of node pairs
    within distance r — on the supplier top-{_ANF_TOPK} co-supply
    similarity graph (edge weight = orders the two suppliers jointly
    fulfilled; order-level co-occurrence keeps the pair input ~10x
    smaller than the customer-level projection, which measured as a
    complete 999,000-pair graph at sf0.1). N(r) is THE quantity behind
    effective-diameter
    and average-distance estimates; HyperANF (Boldi–Rosa–Vigna)
    computes it at web scale by replacing each node's reachable SET
    with a mergeable HLL register and iterating B(v,r) = B(v,r−1) ∪
    ⋃_edges B(u,r−1). This op computes the exact form with the
    identical iteration shape — the reachable-pair set is the state,
    each round is one pair×edge join + UNION-distinct — so the HLL
    swap (exact set → approx_count_distinct registers) is a drop-in at
    100 TB, documented here as the scale path: exact pair state on a
    kNN graph is O(n·k^r)-bounded (the top-k cap makes the graph
    sparse BY CONSTRUCTION — the raw ≥2-shared-customers co-purchase
    projection densifies to near-complete and would square the state;
    the cap is the same move part_knn_graph_stats makes), while
    HyperANF's O(n·log n) registers cover web graphs. reach_ppm
    against all n·(n−1)/2 pairs makes the small-world saturation
    rate visible round by round. Window top-k prunes map-side on
    Spark 4 (InferWindowGroupLimit)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = li.select(
        F.col("l_orderkey").alias("ord"),
        F.col("l_suppkey").alias("supp"),
    ).distinct()
    b2 = base.select(
        F.col("ord").alias("ord2"), F.col("supp").alias("supp2")
    )
    shared = (
        base.join(
            b2,
            (F.col("ord2") == F.col("ord"))
            & (F.col("supp") != F.col("supp2")),
        )
        .groupBy(F.col("supp").alias("u"), F.col("supp2").alias("v"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wk = Window.partitionBy("u").orderBy(F.col("cnt").desc(), "v")
    knn = (
        shared.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _ANF_TOPK)
        .select("u", "v")
    )
    edges = (
        knn.union(knn.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    nodes = edges.agg(
        F.count_distinct("u").cast("bigint").alias("n")
    )
    e2 = edges.select(F.col("u").alias("pu"), F.col("v").alias("pv"))
    d = edges.withColumn("d", F.lit(1).cast("bigint"))
    for _ in range(2, _ANF_ROUNDS + 1):
        expanded = (
            d.join(e2, d.v == F.col("pu"))
            .filter(F.col("u") != F.col("pv"))
            .select("u", F.col("pv").alias("v"), (F.col("d") + 1).alias("d"))
        )
        d = (
            d.union(expanded)
            .groupBy("u", "v")
            .agg(F.min("d").cast("bigint").alias("d"))
        )
    cnts = d.agg(
        *[
            F.expr(
                f"CAST(COUNT(*) FILTER (WHERE d <= {r}) div 2"
                " AS BIGINT)"
            ).alias(f"n{r}")
            for r in range(1, _ANF_ROUNDS + 1)
        ]
    )
    stack_args = ", ".join(
        f"CAST({r} AS BIGINT), n{r}" for r in range(1, _ANF_ROUNDS + 1)
    )
    reach = cnts.selectExpr(
        f"stack({_ANF_ROUNDS}, {stack_args})"
        " AS (radius, pairs_reached)"
    )
    return (
        reach.crossJoin(F.broadcast(nodes))
        .select(
            "radius",
            "pairs_reached",
            F.expr(
                "CAST(pairs_reached * 1000000"
                " div (n * (n - 1) div 2) AS BIGINT)"
            ).alias("reach_ppm"),
        )
        .orderBy("radius")
    )
