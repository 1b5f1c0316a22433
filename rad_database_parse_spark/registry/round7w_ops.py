"""Round-7w operators: greedy max-weight assignment with optimality
audit, an energy-distance two-sample test on embeddings, chi-square
cell residuals, experience-curve slopes, binary-segmentation
changepoints, and Markov expected time-to-absorption.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. supplier_nation_greedy_assignment — matching + bound audit
# ------------------------------------------------------------------

_GA_ROUNDS = 8


def _ga_oracle() -> str:
    steps = []
    prev = "rem0"
    picks = []
    for k in range(1, _GA_ROUNDS + 1):
        steps.append(
            f"""
    pk{k} AS MATERIALIZED (
      SELECT s, n, v FROM {prev}
      ORDER BY v DESC, s, n LIMIT 1),
    rem{k} AS MATERIALIZED (
      SELECT r.s, r.n, r.v FROM {prev} r
      WHERE r.s != (SELECT s FROM pk{k})
        AND r.n != (SELECT n FROM pk{k}))"""
        )
        picks.append(
            f"SELECT {k} AS pick_order, s, n, v FROM pk{k}"
        )
        prev = f"rem{k}"
    return f"""
    WITH vol AS (
      SELECT l_suppkey AS s, c.c_nationkey AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
      FROM lineitem
      JOIN orders o ON o.o_orderkey = l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    rem0 AS MATERIALIZED (
      SELECT s, n, v FROM vol
      WHERE s IN (SELECT s FROM (
        SELECT s, SUM(v) AS tv FROM vol GROUP BY 1
        ORDER BY tv DESC, s LIMIT {_GA_ROUNDS}))),
    {','.join(steps)},
    ub AS (
      SELECT CAST(SUM(mx) AS BIGINT) AS upper_bound
      FROM (SELECT s, MAX(v) AS mx FROM rem0 GROUP BY 1)),
    allp AS ({' UNION ALL '.join(picks)})
    SELECT CAST(pick_order AS BIGINT) AS pick_order,
           CAST(s AS BIGINT) AS suppkey, CAST(n AS BIGINT) AS nationkey,
           v AS volume,
           CAST(SUM(v) OVER () AS BIGINT) AS total_matched,
           (SELECT upper_bound FROM ub) AS row_max_upper_bound,
           CAST(SUM(v) OVER () * 1000000
             // (SELECT upper_bound FROM ub) AS BIGINT)
             AS optimality_ppm
    FROM allp ORDER BY pick_order
    """


@register("supplier_nation_greedy_assignment", _ga_oracle())
def supplier_nation_greedy_assignment(spark: SparkSession, sf_dir: str):
    """Greedy maximum-weight bipartite assignment of the top
    {_GA_ROUNDS} suppliers to customer nations (weight = delivered
    quantity): repeatedly take the globally heaviest remaining
    (supplier, nation) edge and retire both endpoints — the
    1/2-approximation that territory-assignment and load-balancing
    planners run when the Hungarian algorithm's O(n^3) serial core
    won't distribute — AND audit the gap in-engine: total matched
    weight against the row-max LP relaxation bound (sum of each
    supplier's best edge), reported as optimality_ppm so the
    heuristic's quality is measured, not assumed. The edge table is
    bounded ({_GA_ROUNDS} x 25 after the top-supplier cut), so after
    ONE fact aggregate it collect()s and the greedy rounds run
    driver-side in exact Python ints (the markov-fold pattern; the
    unrolled-DataFrame form measured 114s of plan-nesting overhead
    at sf0.01 for identical output). The oracle replays the same
    greedy as unrolled MATERIALIZED CTE rounds."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_suppkey").alias("s"),
            F.col("c_nationkey").alias("n"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    # the edge table is bounded (<= _GA_ROUNDS x 25 after the
    # top-supplier cut): collect it and run the greedy matching
    # driver-side in exact Python ints (the markov-fold pattern —
    # the unrolled-DataFrame form measured 114s of plan-nesting
    # overhead at sf0.01 for identical output)
    edges = [
        (r["s"], r["n"], r["v"]) for r in vol.collect()
    ]
    tot_by_s: dict[int, int] = {}
    for sK, nK, vK in edges:
        tot_by_s[sK] = tot_by_s.get(sK, 0) + vK
    top = {
        sK
        for sK, _ in sorted(
            tot_by_s.items(), key=lambda kv: (-kv[1], kv[0])
        )[:_GA_ROUNDS]
    }
    rem = [(sK, nK, vK) for sK, nK, vK in edges if sK in top]
    ub = sum(
        max(vK for sK2, _, vK in rem if sK2 == sK) for sK in top
    )
    picks = []
    used_s: set[int] = set()
    used_n: set[int] = set()
    for k in range(1, _GA_ROUNDS + 1):
        cand = [
            (sK, nK, vK)
            for sK, nK, vK in rem
            if sK not in used_s and nK not in used_n
        ]
        if not cand:
            break
        sK, nK, vK = min(cand, key=lambda e: (-e[2], e[0], e[1]))
        picks.append((k, sK, nK, vK))
        used_s.add(sK)
        used_n.add(nK)
    tm = sum(vK for _, _, _, vK in picks)

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = [
        (k, sK, nK, vK, tm, ub, tdiv(tm * 1_000_000, ub))
        for k, sK, nK, vK in picks
    ]
    return spark.createDataFrame(
        rows,
        "pick_order bigint, suppkey bigint, nationkey bigint,"
        " volume bigint, total_matched bigint,"
        " row_max_upper_bound bigint, optimality_ppm bigint",
    )


# ------------------------------------------------------------------
# 2. emb_energy_distance_sample — two-sample test for vectors
# ------------------------------------------------------------------

_ED_SAMPLE = 50
_ED_SCALE = 1_000_000
_EMB_DIM = 64


@register(
    "emb_energy_distance_sample",
    f"""
    WITH q0 AS (
      SELECT vec_id, label,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * {_ED_SCALE} + 0.5)
                    AS BIGINT)) AS qe,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id)
               AS rk
      FROM embeddings WHERE label IN (0, 1)),
    s AS (SELECT * FROM q0 WHERE rk <= {_ED_SAMPLE}),
    xy AS (
      SELECT CAST(SUM(CAST(round(sqrt(CAST(list_sum(
               list_transform(range(1, {_EMB_DIM + 1}),
                 k -> (a.qe[k] - b.qe[k]) * (a.qe[k] - b.qe[k])))
               AS DOUBLE))) AS BIGINT)) AS BIGINT) AS sd,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM s a JOIN s b ON a.label = 0 AND b.label = 1),
    xx AS (
      SELECT CAST(SUM(CAST(round(sqrt(CAST(list_sum(
               list_transform(range(1, {_EMB_DIM + 1}),
                 k -> (a.qe[k] - b.qe[k]) * (a.qe[k] - b.qe[k])))
               AS DOUBLE))) AS BIGINT)) AS BIGINT) AS sd,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM s a JOIN s b
        ON a.label = 0 AND b.label = 0 AND a.vec_id < b.vec_id),
    yy AS (
      SELECT CAST(SUM(CAST(round(sqrt(CAST(list_sum(
               list_transform(range(1, {_EMB_DIM + 1}),
                 k -> (a.qe[k] - b.qe[k]) * (a.qe[k] - b.qe[k])))
               AS DOUBLE))) AS BIGINT)) AS BIGINT) AS sd,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM s a JOIN s b
        ON a.label = 1 AND b.label = 1 AND a.vec_id < b.vec_id)
    SELECT (SELECT np FROM xy) AS n_cross_pairs,
           CAST((SELECT sd FROM xy) // (SELECT np FROM xy) AS BIGINT)
             AS mean_cross_dist,
           CAST((SELECT sd FROM xx) // (SELECT np FROM xx) AS BIGINT)
             AS mean_within_x,
           CAST((SELECT sd FROM yy) // (SELECT np FROM yy) AS BIGINT)
             AS mean_within_y,
           CAST(2 * ((SELECT sd FROM xy) // (SELECT np FROM xy))
             - (SELECT sd FROM xx) // (SELECT np FROM xx)
             - (SELECT sd FROM yy) // (SELECT np FROM yy) AS BIGINT)
             AS energy_distance
    """,
)
def emb_energy_distance_sample(spark: SparkSession, sf_dir: str):
    """Energy-distance two-sample test between label-0 and label-1
    embeddings: E = 2 E|X-Y| - E|X-X'| - E|Y-Y'|, zero iff the
    distributions coincide — the multivariate two-sample test that
    needs no binning (where KS/PSI flatten vectors to one dimension,
    energy distance sees the full geometry; the distribution-level
    complement to the per-vector triplet audit). Pairwise distances
    are O(n^2), so each label contributes its first {_ED_SAMPLE}
    vectors by vec_id — a deterministic subsample (documented: at
    100 TB the subsample IS the algorithm; the statistic's sample
    complexity is what makes it usable). Vectors quantize via the
    centroid fixed-point pattern; each pairwise distance takes ONE
    sqrt of an exact integer and rounds back to an integer before
    summation, so both engines sum identical values."""
    e = t(spark, sf_dir, "embeddings")
    q0 = e.filter(F.col("label").isin(0, 1)).select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {_ED_SCALE} + 0.5) AS BIGINT))"
        ).alias("qe"),
        F.row_number()
        .over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("label")
            .orderBy("vec_id")
        )
        .alias("rk"),
    )
    s = q0.filter(F.col("rk") <= _ED_SAMPLE).select(
        "vec_id", "label", "qe"
    )
    s = s.persist()
    dist = (
        f"CAST(round(sqrt(CAST(aggregate(sequence(1, {_EMB_DIM}),"
        " CAST(0 AS BIGINT), (acc, k) ->"
        " acc + (element_at(qe, k) - element_at(qe2, k))"
        " * (element_at(qe, k) - element_at(qe2, k)))"
        " AS DOUBLE))) AS BIGINT)"
    )
    b = s.select(
        F.col("vec_id").alias("vid2"),
        F.col("label").alias("label2"),
        F.col("qe").alias("qe2"),
    )

    def mean_dist(cond):
        return (
            s.join(b, F.expr(cond))
            .agg(
                F.expr(f"CAST(SUM({dist}) AS BIGINT)").alias("sd"),
                F.count("*").cast("bigint").alias("np"),
            )
        )

    xy = mean_dist("label = 0 AND label2 = 1")
    xx = mean_dist("label = 0 AND label2 = 0 AND vec_id < vid2")
    yy = mean_dist("label = 1 AND label2 = 1 AND vec_id < vid2")
    return (
        xy.select(
            F.col("np").alias("n_cross_pairs"),
            F.expr("CAST(sd div np AS BIGINT)").alias(
                "mean_cross_dist"
            ),
        )
        .crossJoin(
            F.broadcast(
                xx.select(
                    F.expr("CAST(sd div np AS BIGINT)").alias(
                        "mean_within_x"
                    )
                )
            )
        )
        .crossJoin(
            F.broadcast(
                yy.select(
                    F.expr("CAST(sd div np AS BIGINT)").alias(
                        "mean_within_y"
                    )
                )
            )
        )
        .select(
            "n_cross_pairs",
            "mean_cross_dist",
            "mean_within_x",
            "mean_within_y",
            F.expr(
                "CAST(2 * mean_cross_dist - mean_within_x"
                " - mean_within_y AS BIGINT)"
            ).alias("energy_distance"),
        )
    )


# ------------------------------------------------------------------
# 3. orders_chi2_cell_residuals — which cells drive the chi-square
# ------------------------------------------------------------------


@register(
    "orders_chi2_cell_residuals",
    """
    WITH cells AS (
      SELECT o_orderpriority AS pr, o_orderstatus AS st,
             CAST(COUNT(*) AS HUGEINT) AS o,
             SUM(COUNT(*)) OVER (PARTITION BY o_orderpriority) AS r,
             SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus) AS c,
             SUM(COUNT(*)) OVER () AS n
      FROM orders GROUP BY 1, 2)
    SELECT pr AS priority, st AS status,
           CAST(o AS BIGINT) AS n_obs,
           CAST(r * c // n AS BIGINT) AS n_expected,
           CAST(round(1e3 * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE)
               * c / n)
             / sqrt(CAST(r AS DOUBLE) * c / n
               * (1 - CAST(r AS DOUBLE) / n)
               * (1 - CAST(c AS DOUBLE) / n))) AS BIGINT)
             AS std_residual_milli,
           CAST(CASE WHEN abs((CAST(o AS DOUBLE) - CAST(r AS DOUBLE)
               * c / n)
             / sqrt(CAST(r AS DOUBLE) * c / n
               * (1 - CAST(r AS DOUBLE) / n)
               * (1 - CAST(c AS DOUBLE) / n))) > 2.0
             THEN 1 ELSE 0 END AS INT) AS significant_cell
    FROM cells
    ORDER BY priority, status
    """,
)
def orders_chi2_cell_residuals(spark: SparkSession, sf_dir: str):
    """Standardized Pearson residuals of the priority x status
    contingency table — the post-hoc that turns an omnibus
    chi-square verdict ('the table is not independent') into the
    actionable WHICH CELLS: each cell's (observed - expected)
    standardized by its exact variance (1-r/n)(1-c/n) correction, so
    |residual| > 2 reads as a significant cell at ~5%. The
    diagnostic layer the chi-square drift test and Cramer's V
    summaries deliberately collapse away. One scan to the bounded
    15-cell table (marginals via partitioned windows over it);
    doubles enter once per cell from identically-reduced integers."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("pr"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count("*").cast("decimal(38,0)").alias("o"))
        .select(
            "pr",
            "st",
            "o",
            F.sum("o").over(W.partitionBy("pr")).alias("r"),
            F.sum("o").over(W.partitionBy("st")).alias("c"),
            F.sum("o").over(W.partitionBy()).alias("n"),
        )
    )
    resid = (
        "(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)"
        " / sqrt(CAST(r AS DOUBLE) * c / n"
        " * (1 - CAST(r AS DOUBLE) / n)"
        " * (1 - CAST(c AS DOUBLE) / n))"
    )
    return cells.select(
        F.col("pr").alias("priority"),
        F.col("st").alias("status"),
        F.expr("CAST(o AS BIGINT)").alias("n_obs"),
        F.expr("CAST(r * c div n AS BIGINT)").alias("n_expected"),
        F.expr(f"CAST(round(1e3 * {resid}) AS BIGINT)").alias(
            "std_residual_milli"
        ),
        F.expr(
            f"CAST(CASE WHEN abs({resid}) > 2.0 THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("significant_cell"),
    ).orderBy("priority", "status")


# ------------------------------------------------------------------
# 4. part_experience_curve_slopes — learning-curve economics
# ------------------------------------------------------------------


@register(
    "part_experience_curve_slopes",
    """
    WITH bm AS (
      SELECT p.p_brand AS brand,
             year(l_shipdate) * 12 + month(l_shipdate) - 1 AS ym,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS r
      FROM lineitem JOIN part p ON p.p_partkey = l_partkey
      GROUP BY 1, 2),
    cumq AS (
      SELECT a.brand, a.ym,
             a.r * 1000000 // a.q AS price_micro,
             CAST(SUM(b.q) AS BIGINT) AS cum_q
      FROM bm a JOIN bm b ON b.brand = a.brand AND b.ym <= a.ym
      GROUP BY 1, 2, 3),
    pts AS (
      SELECT brand,
             CAST(round(1e6 * ln(CAST(cum_q AS DOUBLE))) AS BIGINT)
               AS x,
             CAST(round(1e6 * ln(CAST(price_micro AS DOUBLE) / 1e6))
               AS BIGINT) AS y
      FROM cumq),
    fit AS (
      SELECT brand, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pts GROUP BY 1)
    SELECT brand, CAST(n AS BIGINT) AS n_months,
           CAST((n * sxy - sx * sy) * 1000000
             // (n * sxx - sx * sx) AS BIGINT) AS learning_slope_micro
    FROM fit ORDER BY brand
    """,
)
def part_experience_curve_slopes(spark: SparkSession, sf_dir: str):
    """Experience-curve (Wright's law / BCG learning curve) slope per
    brand: regress log unit price on log CUMULATIVE volume — the
    strategy-economics primitive (a slope of -0.15 means each
    doubling of cumulative output cuts unit price ~10%; slope ~ 0
    here is itself the finding, since TPC-H prices are drawn
    static). Monthly (brand, price, cumulative-quantity) points come
    from one fact aggregate + a bounded prefix self-join; both logs
    micro-quantize from exact integers so the 25 per-brand OLS fits
    fold identical values; slope from HUGEINT/decimal(38,0) moments.
    All post-scan work is (brand x month) bounded."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    big = "decimal(38,0)"
    bm = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias(
                "ym"
            ),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q"),
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("r"),
        )
    )
    bm = bm.persist()
    b2 = bm.select(
        F.col("brand").alias("b2"),
        F.col("ym").alias("y2"),
        F.col("q").alias("q2"),
    )
    cumq = (
        bm.join(
            b2,
            (F.col("b2") == F.col("brand"))
            & (F.col("y2") <= F.col("ym")),
        )
        .groupBy(
            "brand",
            "ym",
            F.expr("r * 1000000 div q").alias("price_micro"),
        )
        .agg(F.sum("q2").cast("bigint").alias("cum_q"))
    )
    pts = cumq.select(
        "brand",
        F.expr(
            "CAST(round(1e6 * ln(CAST(cum_q AS DOUBLE))) AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(round(1e6 * ln(CAST(price_micro AS DOUBLE) / 1e6))"
            " AS BIGINT)"
        ).alias("y"),
    )
    fit = pts.groupBy("brand").agg(
        F.count("*").cast(big).alias("n"),
        F.sum("x").cast(big).alias("sx"),
        F.sum("y").cast(big).alias("sy"),
        F.sum(F.col("x").cast(big) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(big) * F.col("y")).alias("sxy"),
    )
    return fit.select(
        "brand",
        F.expr("CAST(n AS BIGINT)").alias("n_months"),
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000000"
            " div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("learning_slope_micro"),
    ).orderBy("brand")


# ------------------------------------------------------------------
# 5. orders_binary_segmentation_breaks — changepoint search
# ------------------------------------------------------------------


@register(
    "orders_binary_segmentation_breaks",
    """
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    pre AS (
      SELECT a.ym,
             CAST(SUM(b.y) AS HUGEINT) AS cs,
             CAST(SUM(CAST(b.y AS HUGEINT) * b.y) AS HUGEINT) AS css,
             CAST(COUNT(*) AS HUGEINT) AS k
      FROM m a JOIN m b ON b.ym <= a.ym
      GROUP BY 1),
    tot AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(y) AS HUGEINT) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS ss
      FROM m),
    gains AS (
      SELECT p.ym, p.k,
             CAST((p.cs * t.n - t.s * p.k)
               * ((p.cs * t.n - t.s * p.k) // 1000000)
               // (p.k * (t.n - p.k)) // t.n AS HUGEINT) AS gain_sc
      FROM pre p CROSS JOIN tot t
      WHERE p.k < t.n),
    b1 AS (
      SELECT ym, gain_sc FROM gains
      ORDER BY gain_sc DESC, ym LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS split_rank,
           CAST(b.ym AS BIGINT) AS break_after_ym,
           CAST(b.gain_sc AS BIGINT) AS sse_reduction_scaled,
           CAST((SELECT COUNT(*) FROM m WHERE ym <= b.ym) AS BIGINT)
             AS n_left,
           CAST((SELECT COUNT(*) FROM m WHERE ym > b.ym) AS BIGINT)
             AS n_right
    FROM b1 b
    """,
)
def orders_binary_segmentation_breaks(spark: SparkSession, sf_dir: str):
    """Binary-segmentation changepoint search on monthly revenue: the
    split that maximizes the between-segment SSE reduction
    k(n-k)/n * (mean_left - mean_right)^2 — the FINDER that
    complements the tier's testers (CUSUM/Page-Hinkley monitor a
    stream, the Chow test checks a KNOWN break; binseg locates the
    best unknown one, and PELT/forests iterate exactly this
    primitive). Every candidate split's gain comes from prefix sums
    (one bounded self-join), evaluated in exact scaled integer form
    (cs*n - s*k)^2 / (k(n-k) n) with a 1e6 downscale keeping the
    square inside HUGEINT/decimal(38,0) past sf100 — truncation
    identical in both engines, so the argmax is exact. Output: the
    best split with its gain and the resulting segment sizes."""
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
    m = m.persist()
    b = m.select(
        F.col("ym").alias("y2"), F.col("y").alias("yv")
    )
    pre = (
        m.join(b, F.col("y2") <= F.col("ym"))
        .groupBy("ym")
        .agg(
            F.sum("yv").cast(big).alias("cs"),
            F.sum(F.col("yv").cast(big) * F.col("yv")).alias("css"),
            F.count("*").cast(big).alias("k"),
        )
    )
    tot = m.agg(
        F.count("*").cast(big).alias("n"),
        F.sum("y").cast(big).alias("s"),
        F.sum(F.col("y").cast(big) * F.col("y")).alias("ss"),
    )
    gains = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("k") < F.col("n"))
        .select(
            "ym",
            "k",
            "n",
            F.expr(
                "CAST((cs * n - s * k)"
                " * ((cs * n - s * k) div 1000000)"
                " div (k * (n - k)) div n AS DECIMAL(38,0))"
            ).alias("gain_sc"),
        )
    )
    b1 = gains.orderBy(F.col("gain_sc").desc(), "ym").limit(1)
    nl = b1.crossJoin(m.select(F.col("ym").alias("m_ym"))).agg(
        F.sum(
            F.when(F.col("m_ym") <= F.col("ym"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_left"),
        F.sum(
            F.when(F.col("m_ym") > F.col("ym"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_right"),
    )
    return (
        b1.crossJoin(F.broadcast(nl))
        .select(
            F.lit(1).cast("bigint").alias("split_rank"),
            F.col("ym").cast("bigint").alias("break_after_ym"),
            F.col("gain_sc").cast("bigint").alias(
                "sse_reduction_scaled"
            ),
            "n_left",
            "n_right",
        )
    )


# ------------------------------------------------------------------
# 6. events_absorbing_expected_steps — time-to-absorption fold
# ------------------------------------------------------------------

_AES_ITERS = 12


def _aes_oracle() -> str:
    steps = []
    for k in range(1, _AES_ITERS + 1):
        steps.append(
            f"""
    e{k} AS MATERIALIZED (
      SELECT t.f AS state,
             CAST(1000000 + SUM(t.prob_ppb * e.v) // 1000000000
               AS BIGINT) AS v
      FROM strans t JOIN e{k - 1} e ON e.state = t.t2
      GROUP BY 1
      UNION ALL SELECT 'purchase', CAST(0 AS BIGINT)
      UNION ALL SELECT 'end', CAST(0 AS BIGINT))"""
        )
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    raw AS (
      SELECT event_type AS f, COALESCE(nxt, 'end') AS t2,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE event_type != 'purchase' GROUP BY 1, 2),
    strans AS MATERIALIZED (
      SELECT f, t2,
             cnt * 1000000000
               // SUM(cnt) OVER (PARTITION BY f) AS prob_ppb
      FROM raw),
    e0 AS (
      SELECT DISTINCT f AS state, CAST(0 AS BIGINT) AS v FROM strans
      UNION ALL SELECT 'purchase', CAST(0 AS BIGINT)
      UNION ALL SELECT 'end', CAST(0 AS BIGINT)),
    {','.join(steps)}
    SELECT state, v AS expected_steps_micro
    FROM e{_AES_ITERS}
    WHERE state NOT IN ('purchase', 'end')
    ORDER BY state
    """


@register("events_absorbing_expected_steps", _aes_oracle())
def events_absorbing_expected_steps(spark: SparkSession, sf_dir: str):
    """Expected number of further interactions before a user journey
    ABSORBS (purchase or session end), per current state — the
    fundamental-matrix quantity N = (I-Q)^-1 1 that completes the
    Markov family (removal effects answer WHICH channel matters,
    the stationary op answers long-run shares; this answers HOW
    LONG until resolution, the number a UX funnel review reads as
    'users in state X are Y interactions from done'). Computed by
    {_AES_ITERS} value-iteration rounds E <- 1 + Q E in exact
    truncating micro/ppb fixed point. Same 100 TB shape as the
    removal op: the ONLY fact-grain work is the sequence window +
    transition aggregate, which collapses to the bounded
    |event_types|^2 grid, collect()ed and folded driver-side in
    exact Python ints — one shuffle + an O(1) collect."""
    e = t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
    )
    raw = (
        seq.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("f"),
            F.coalesce("nxt", F.lit("end")).alias("t2"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    rows = [(r["f"], r["t2"], r["cnt"]) for r in raw.collect()]  # bounded: type pairs

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    tot: dict[str, int] = {}
    for f, _, cnt in rows:
        tot[f] = tot.get(f, 0) + cnt
    prob = {
        (f, t2): tdiv(cnt * 1_000_000_000, tot[f])
        for f, t2, cnt in rows
    }
    ev = {f: 0 for f in tot}
    ev["purchase"], ev["end"] = 0, 0
    for _ in range(_AES_ITERS):
        nxt_v = {
            f: 1_000_000
            + tdiv(
                sum(
                    p * ev[t2]
                    for (ff, t2), p in prob.items()
                    if ff == f and t2 in ev
                ),
                1_000_000_000,
            )
            for f in tot
        }
        ev = {**nxt_v, "purchase": 0, "end": 0}
    out = sorted((f, v) for f, v in ev.items() if f in tot)
    return spark.createDataFrame(
        out, "state string, expected_steps_micro bigint"
    )
