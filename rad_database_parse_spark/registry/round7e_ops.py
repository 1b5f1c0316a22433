"""Round-7e operators: Törnqvist index (completing the index-number
family), extreme-value tail estimation, degree assortativity, a fully
distributed Croston intermittent-demand recursion (array-HOF fold — no
driver loop), IQR price-band outlier audit, and a lognormal fit.

Parity contract as everywhere; ln/exp run only on identical exact
integers (or identical doubles derived from them) and quantize before
cross-row sums; percentile/quantile_cont interpolation parity is the
pinned agg_approx_quantile_check contract.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, t

# ------------------------------------------------------------------
# 1. part_tornqvist_price_index — share-weighted geometric index
# ------------------------------------------------------------------


@register(
    "part_tornqvist_price_index",
    """
    WITH p0 AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS ext0,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty0
      FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
    p1 AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS ext1,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty1
      FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
    j AS (
      SELECT p.p_brand, p0.l_partkey, ext0, qty0, ext1, qty1
      FROM p0 JOIN p1 USING (l_partkey)
      JOIN part p ON p.p_partkey = p0.l_partkey),
    btot AS (
      SELECT p_brand, SUM(ext0) AS bext0, SUM(ext1) AS bext1,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM j GROUP BY p_brand),
    terms AS (
      SELECT j.p_brand, btot.n_parts,
             CAST(round(
               ((ext0::HUGEINT * 1000000000 // bext0
                 + ext1::HUGEINT * 1000000000 // bext1) // 2) / 1e9
               * 1e6
               * ln(CAST(ext1 * 1000 // qty1 AS DOUBLE)
                    / CAST(ext0 * 1000 // qty0 AS DOUBLE)))
               AS BIGINT) AS term_micro
      FROM j JOIN btot USING (p_brand)),
    s AS (
      SELECT p_brand, MAX(n_parts) AS n_parts,
             CAST(SUM(term_micro) AS BIGINT) AS log_index_micro
      FROM terms GROUP BY p_brand)
    SELECT p_brand, n_parts, log_index_micro,
           CAST(round(1e6 * exp(log_index_micro / 1e6)) AS BIGINT)
             AS tornqvist_ppm
    FROM s ORDER BY p_brand
    """,
)
def part_tornqvist_price_index(spark: SparkSession, sf_dir: str):
    """Törnqvist price index per brand (1996→1997) — the superlative
    geometric index that completes the repo's index-number family
    (Laspeyres base-basket, Paasche/Fisher, chained): each part's
    log-price relative is weighted by the AVERAGE of its two periods'
    expenditure shares, so basket drift between the periods biases
    neither way. Same plan shape as part_fisher_price_index (two
    pruned-year partial aggregates, one part-keyed join, broadcast part
    dim): shares quantize to exact ppb against brand totals, unit
    prices are exact milli-cents quotients, one ln per part on the
    ratio of identical exact integers, micro-quantized before the brand
    sum; exp runs once per brand on the identical micro integer."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")

    def per_part(yr: int, ext: str, qty: str):
        return (
            li.filter(F.year("l_shipdate") == yr)
            .groupBy("l_partkey")
            .agg(
                F.sum((dec("l_extendedprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias(ext),
                F.sum(F.col("l_quantity").cast("bigint"))
                .cast("bigint")
                .alias(qty),
            )
        )

    j = (
        per_part(1996, "ext0", "qty0")
        .join(per_part(1997, "ext1", "qty1"), "l_partkey")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    big = "decimal(38,0)"
    btot = j.groupBy(F.col("p_brand").alias("bb")).agg(
        F.sum(F.col("ext0").cast(big)).alias("bext0"),
        F.sum(F.col("ext1").cast(big)).alias("bext1"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    terms = j.join(F.broadcast(btot), j.p_brand == F.col("bb")).select(
        "p_brand",
        "n_parts",
        F.round(
            F.expr(
                f"((CAST(ext0 AS {big}) * 1000000000 div bext0"
                f" + CAST(ext1 AS {big}) * 1000000000 div bext1) div 2)"
            )
            / 1e9
            * 1e6
            * F.log(
                F.expr("CAST(ext1 * 1000 div qty1 AS DOUBLE)")
                / F.expr("CAST(ext0 * 1000 div qty0 AS DOUBLE)")
            )
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    s = terms.groupBy("p_brand").agg(
        F.max("n_parts").alias("n_parts"),
        F.sum("term_micro").cast("bigint").alias("log_index_micro"),
    )
    return s.select(
        "p_brand",
        "n_parts",
        "log_index_micro",
        F.round(1e6 * F.exp(F.col("log_index_micro") / 1e6))
        .cast("bigint")
        .alias("tornqvist_ppm"),
    ).orderBy("p_brand")


# ------------------------------------------------------------------
# 2. events_peak_over_threshold_tail — EVT Hill estimator
# ------------------------------------------------------------------


@register(
    "events_peak_over_threshold_tail",
    """
    WITH v AS (
      SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM events),
    u AS (SELECT quantile_cont(CAST(c AS DOUBLE), 0.99) AS thresh FROM v),
    exc AS (
      SELECT CAST(round(1e6 * ln(CAST(c AS DOUBLE) / thresh)) AS BIGINT)
               AS lr_micro
      FROM v CROSS JOIN u WHERE CAST(c AS DOUBLE) > thresh)
    SELECT (SELECT thresh FROM u) AS threshold_cents,
           CAST(COUNT(*) AS BIGINT) AS n_exceed,
           CAST(SUM(lr_micro) // COUNT(*) AS BIGINT) AS hill_mean_micro,
           1e6 / (CAST(SUM(lr_micro) AS DOUBLE) / COUNT(*))
             AS tail_index_alpha
    FROM exc
    """,
)
def events_peak_over_threshold_tail(spark: SparkSession, sf_dir: str):
    """Peaks-over-threshold extreme-value analysis of event values: the
    Hill estimator of the tail index over exceedances of the exact p99
    threshold — the SRE/risk question the z-score and MAD screens can't
    answer ('how heavy is the tail?' decides whether p99.9 capacity
    planning extrapolates or explodes; α ≤ 2 means variance doesn't
    even exist). The threshold is one quantile_cont/percentile
    (interpolation-parity pinned); each exceedance takes one ln on the
    identical (exact-cents / identical-double) ratio, micro-quantized
    before the mean; α forms from the same integers. One scan + one
    bounded exceedance aggregate — mergeable partials throughout."""
    e = t(spark, sf_dir, "events")
    v = e.select((dec("value") * 100).cast("bigint").alias("c"))
    u = v.agg(F.percentile(dbl(F.col("c")), 0.99).alias("thresh"))
    exc = (
        v.crossJoin(F.broadcast(u))
        .filter(dbl(F.col("c")) > F.col("thresh"))
        .select(
            "thresh",
            F.round(1e6 * F.log(dbl(F.col("c")) / F.col("thresh")))
            .cast("bigint")
            .alias("lr_micro"),
        )
    )
    return exc.agg(
        F.max("thresh").alias("threshold_cents"),
        F.count("*").cast("bigint").alias("n_exceed"),
        F.expr("CAST(SUM(lr_micro) div COUNT(*) AS BIGINT)").alias(
            "hill_mean_micro"
        ),
        (
            F.lit(1e6)
            / (F.sum("lr_micro").cast("double") / F.count("*"))
        ).alias("tail_index_alpha"),
    )


# ------------------------------------------------------------------
# 3. graph_degree_assortativity — degree mixing of the co-purchase graph
# ------------------------------------------------------------------


@register(
    "graph_degree_assortativity",
    """
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS (SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
    ed AS (
      SELECT du.d::HUGEINT AS x, dv.d::HUGEINT AS y
      FROM und JOIN deg du ON und.u = du.u JOIN deg dv ON und.v = dv.u),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM ed)
    SELECT CAST(n AS BIGINT) AS n_edge_ends,
           CAST(sx * 1000 // n AS BIGINT) AS mean_degree_milli,
           CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS assortativity
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str):
    """Degree assortativity of the part co-purchase graph — the Pearson
    correlation of endpoint degrees over the symmetric edge list
    (Newman's r): positive means hub parts co-sell with other hubs
    (one dense club — salting/skew planning territory), negative means
    hub-and-spoke baskets. Exact integer degree moments in
    HUGEINT/decimal(38,0) over edge grain (magnitudes stay well inside
    the safe double-conversion range at any realistic degree
    distribution — max Σxy ≈ E·d_max² — so the one double division +
    sqrt is parity-safe); the same support-pruned edge construction as
    the label-propagation family."""
    li = t(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
    )
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    du = deg.select(F.col("u").alias("uu"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("vv"), F.col("d").alias("y"))
    big = "decimal(38,0)"
    ed = (
        und.join(du, und.u == F.col("uu"))
        .join(dv, und.v == F.col("vv"))
        .select(F.col("x").cast(big).alias("x"), F.col("y").cast(big).alias("y"))
    )
    m = ed.agg(
        F.count("*").cast(big).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(big)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(big)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(big)).alias("sxy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_edge_ends"),
        F.expr("CAST(sx * 1000 div n AS BIGINT)").alias(
            "mean_degree_milli"
        ),
        (
            F.expr(f"CAST(n * sxy - sx * sy AS DOUBLE)")
            / F.sqrt(
                F.expr("CAST(n * sxx - sx * sx AS DOUBLE)")
                * F.expr("CAST(n * syy - sy * sy AS DOUBLE)")
            )
        ).alias("assortativity"),
    )


# ------------------------------------------------------------------
# 4. part_croston_intermittent_demand — distributed per-key recursion
# ------------------------------------------------------------------

# Croston step, shared contract (alpha = 1/5, truncating integer
# smoothing, state = [z_milli, p_milli, gap, seen]):
#   demand d > 0, first:  [d*1000, (gap+1)*1000, 0, 1]
#   demand d > 0, later:  [z + (d*1000 - z) div 5,
#                          p + ((gap+1)*1000 - p) div 5, 0, 1]
#   demand d = 0:         [z, p, gap+1, seen]


@register(
    "part_croston_intermittent_demand",
    """
    WITH months AS (
      SELECT DISTINCT year(l_shipdate) * 12 + month(l_shipdate) - 1 AS ym
      FROM lineitem),
    dem AS (
      SELECT l_partkey, year(l_shipdate) * 12 + month(l_shipdate) - 1 AS ym,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
      FROM lineitem GROUP BY 1, 2),
    grid AS (
      SELECT p.p_partkey, p.p_brand, m.ym, COALESCE(dem.d, 0) AS d
      FROM part p CROSS JOIN months m
      LEFT JOIN dem ON dem.l_partkey = p.p_partkey AND dem.ym = m.ym),
    series AS (
      SELECT p_partkey, p_brand,
             list(d ORDER BY ym) AS ds,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM grid GROUP BY p_partkey, p_brand),
    folded AS (
      SELECT p_partkey, p_brand, n_hit, n_months,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), 0, 0, 0],
                            list_transform(ds, d -> [d, 0, 0, 0])),
               (acc, e) -> CASE
                 WHEN e[1] > 0 AND acc[4] = 0
                   THEN [e[1] * 1000, (acc[3] + 1) * 1000,
                         CAST(0 AS BIGINT), CAST(1 AS BIGINT)]
                 WHEN e[1] > 0
                   THEN [acc[1] + (e[1] * 1000 - acc[1]) // 5,
                         acc[2] + ((acc[3] + 1) * 1000 - acc[2]) // 5,
                         CAST(0 AS BIGINT), CAST(1 AS BIGINT)]
                 ELSE [acc[1], acc[2], acc[3] + 1, acc[4]] END) AS st
      FROM series),
    per_part AS (
      SELECT p_brand,
             st[1] * 1000 // GREATEST(st[2], 1) AS forecast_milli,
             n_hit * 1000000 // n_months AS occupancy_ppm
      FROM folded
      WHERE st[4] = 1 AND n_hit * 2 <= n_months)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_intermittent_parts,
           CAST(SUM(forecast_milli) // COUNT(*) AS BIGINT)
             AS avg_croston_forecast_milli,
           CAST(SUM(occupancy_ppm) // COUNT(*) AS BIGINT)
             AS avg_occupancy_ppm
    FROM per_part GROUP BY p_brand ORDER BY p_brand
    """,
)
def part_croston_intermittent_demand(spark: SparkSession, sf_dir: str):
    """Croston's method for intermittent demand, run as a DISTRIBUTED
    per-key recursion: each part's dense monthly series folds through
    the exponential-smoothing recurrence INSIDE an array-HOF aggregate
    (bounded by the calendar, ~84 elements), so unlike the Holt op's
    single-series driver recurrence this forecasts every part in one
    shuffle-free pass over part-grain rows — the shape that scales to
    millions of SKUs. Smoothing is truncating integer fixed-point
    (alpha=1/5, milli units; both engines fold LEFT over the
    identically-ordered list), separate size (z) and interval (p)
    estimates per Croston, forecast = z/p. DuckDB's list_reduce has no
    initial-accumulator parameter, so the state seeds as a prepended
    zero-state element and demands wrap as [d,0,0,0] (the CASE ignores
    the padding); Spark's aggregate() uses the same seed explicitly.
    Intermittent filter: ≤ half the months see demand. Brand-grain
    output."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    ym = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("ym")
    months = li.select(ym).distinct()
    dem = li.groupBy(F.col("l_partkey"), ym).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("d")
    )
    grid = (
        p.select("p_partkey", "p_brand")
        .crossJoin(F.broadcast(months))
        .join(
            dem.withColumnRenamed("ym", "dym"),
            (F.col("p_partkey") == F.col("l_partkey"))
            & (F.col("ym") == F.col("dym")),
            "left",
        )
        .select(
            "p_partkey",
            "p_brand",
            "ym",
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("d"),
        )
    )
    series = grid.groupBy("p_partkey", "p_brand").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ym, d))), s -> s.d)"
        ).alias("ds"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit"),
        F.count("*").cast("bigint").alias("n_months"),
    )
    fold = (
        "aggregate(ds, array(CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
        " CAST(0 AS BIGINT), CAST(0 AS BIGINT)), (acc, d) -> CASE"
        " WHEN d > 0 AND acc[3] = 0 THEN array(d * 1000,"
        "   (acc[2] + 1) * 1000, CAST(0 AS BIGINT), CAST(1 AS BIGINT))"
        " WHEN d > 0 THEN array(acc[0] + (d * 1000 - acc[0]) div 5,"
        "   acc[1] + ((acc[2] + 1) * 1000 - acc[1]) div 5,"
        "   CAST(0 AS BIGINT), CAST(1 AS BIGINT))"
        " ELSE array(acc[0], acc[1], acc[2] + 1, acc[3]) END)"
    )
    folded = series.select(
        "p_brand",
        "n_hit",
        "n_months",
        F.expr(fold).alias("st"),
    )
    per_part = folded.filter(
        (F.expr("st[3]") == 1) & (F.col("n_hit") * 2 <= F.col("n_months"))
    ).select(
        "p_brand",
        F.expr("st[0] * 1000 div GREATEST(st[1], 1)").alias(
            "forecast_milli"
        ),
        F.expr("n_hit * 1000000 div n_months").alias("occupancy_ppm"),
    )
    return (
        per_part.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_intermittent_parts"),
            F.expr(
                "CAST(SUM(forecast_milli) div COUNT(*) AS BIGINT)"
            ).alias("avg_croston_forecast_milli"),
            F.expr(
                "CAST(SUM(occupancy_ppm) div COUNT(*) AS BIGINT)"
            ).alias("avg_occupancy_ppm"),
        )
        .orderBy("p_brand")
    )


# ------------------------------------------------------------------
# 5. lineitem_price_band_outliers — IQR fence pricing audit
# ------------------------------------------------------------------


@register(
    "lineitem_price_band_outliers",
    """
    WITH up AS (
      SELECT l_partkey,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               // CAST(l_quantity AS BIGINT) AS unit_c
      FROM lineitem),
    bands AS (
      SELECT l_partkey,
             quantile_cont(CAST(unit_c AS DOUBLE), 0.25) AS q1,
             quantile_cont(CAST(unit_c AS DOUBLE), 0.75) AS q3
      FROM up GROUP BY l_partkey),
    flagged AS (
      SELECT p.p_brand,
             CASE WHEN CAST(unit_c AS DOUBLE)
                       < q1 - 1.5 * (q3 - q1)
                    OR CAST(unit_c AS DOUBLE)
                       > q3 + 1.5 * (q3 - q1)
                  THEN 1 ELSE 0 END AS is_out
      FROM up JOIN bands USING (l_partkey)
      JOIN part p ON p.p_partkey = up.l_partkey)
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(is_out) AS BIGINT) AS n_outliers,
           CAST(SUM(is_out) * 1000000 // COUNT(*) AS BIGINT)
             AS outlier_ppm
    FROM flagged GROUP BY p_brand ORDER BY p_brand
    """,
)
def lineitem_price_band_outliers(spark: SparkSession, sf_dir: str):
    """Price-book integrity audit: lines whose exact unit price falls
    outside the Tukey fence (Q1−1.5·IQR, Q3+1.5·IQR) of their OWN
    part's unit-price distribution — mispriced lines that global
    screens (z-score, MAD — corpus-wide by design) structurally miss
    because each part's band is different. Per-part quartiles use the
    pinned percentile/quantile_cont interpolation parity on exact
    integer cents; the fence compare is double arithmetic on identical
    operands. Part grain is dimension-bounded, so the quartile state
    is small at any fact scale; one join back and a brand rollup."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    up = l.select(
        "l_partkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("unit_c"),
    )
    bands = up.groupBy("l_partkey").agg(
        F.percentile(dbl(F.col("unit_c")), 0.25).alias("q1"),
        F.percentile(dbl(F.col("unit_c")), 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (
        (dbl(F.col("unit_c")) < F.col("q1") - 1.5 * iqr)
        | (dbl(F.col("unit_c")) > F.col("q3") + 1.5 * iqr)
    )
    flagged = (
        up.join(bands.withColumnRenamed("l_partkey", "bk"), F.col("l_partkey") == F.col("bk"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("p_brand", F.when(is_out, 1).otherwise(0).alias("is_out"))
    )
    return (
        flagged.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("is_out").cast("bigint").alias("n_outliers"),
            F.expr(
                "CAST(SUM(is_out) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("outlier_ppm"),
        )
        .orderBy("p_brand")
    )


# ------------------------------------------------------------------
# 6. orders_totalprice_lognormal_fit — method-of-moments fit
# ------------------------------------------------------------------


@register(
    "orders_totalprice_lognormal_fit",
    """
    WITH lx AS (
      SELECT CAST(round(1e6 * ln(
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)))
               AS BIGINT) AS l_micro
      FROM orders),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(l_micro) AS BIGINT) AS s,
             SUM(l_micro::HUGEINT * l_micro) AS ss
      FROM lx)
    SELECT n AS n_orders,
           CAST(s // n AS BIGINT) AS mu_micro,
           CAST((ss - s::HUGEINT * s // n) // n // 1000 AS BIGINT)
             AS sigma2_nano_x1e3,
           exp(CAST(s // n AS BIGINT) / 1e6) / 100 AS implied_median,
           exp(CAST(s // n AS BIGINT) / 1e6
               + CAST((ss - s::HUGEINT * s // n) // n // 1000 AS BIGINT)
                 / 1e9 / 2) / 100 AS implied_mean
    FROM m
    """,
)
def orders_totalprice_lognormal_fit(spark: SparkSession, sf_dir: str):
    """Method-of-moments lognormal fit of order values — the
    distributional model behind revenue simulation and the sanity check
    on every 'mean order value' KPI (lognormal mean exp(μ+σ²/2) runs
    well above the median exp(μ); if the two implied values straddle
    the observed ones, the model holds). One ln per order on exact
    integer cents, micro-quantized before the moment sums
    (HUGEINT/decimal(38,0)); μ and σ² reduce by truncating division to
    exact integers, and the two exp's run on identical reduced values.
    Single-pass mergeable aggregate."""
    o = t(spark, sf_dir, "orders")
    lx = o.select(
        F.round(
            1e6
            * F.log(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100"
                    " AS BIGINT)"
                )
            )
        )
        .cast("bigint")
        .alias("l_micro")
    )
    big = "decimal(38,0)"
    m = lx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("l_micro").cast("bigint").alias("s"),
        F.sum((F.col("l_micro").cast(big) * F.col("l_micro")).cast(big)).alias(
            "ss"
        ),
    )
    mu = F.expr("CAST(s div n AS BIGINT)")
    s2 = F.expr(
        f"CAST((ss - CAST(s AS {big}) * s div n) div n div 1000 AS BIGINT)"
    )
    return m.select(
        F.col("n").alias("n_orders"),
        mu.alias("mu_micro"),
        s2.alias("sigma2_nano_x1e3"),
        (F.exp(mu / 1e6) / 100).alias("implied_median"),
        (F.exp(mu / 1e6 + s2 / 1e9 / 2) / 100).alias("implied_mean"),
    )
