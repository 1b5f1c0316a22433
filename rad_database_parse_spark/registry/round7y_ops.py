"""Round-7y operators: nearest-centroid classifier evaluation, gravity
model residual pairs, ABC class migration, and a priority-preemption
queue simulation.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. emb_nearest_centroid_confusion — classifier eval
# ------------------------------------------------------------------

_NC_SCALE = 1_000_000
_EMB_DIM = 64


@register(
    "emb_nearest_centroid_confusion",
    f"""
    WITH q AS (
      SELECT vec_id, label,
             vec_id % 2 AS half,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * {_NC_SCALE} + 0.5)
                    AS BIGINT)) AS qe
      FROM embeddings),
    expl AS (
      SELECT label, r.pos,
             CAST(floor(CAST(embedding[CAST(r.pos AS INT) + 1]
               AS DOUBLE) * {_NC_SCALE} + 0.5) AS BIGINT) AS v_fp
      FROM embeddings CROSS JOIN range({_EMB_DIM}) r(pos)
      WHERE vec_id % 2 = 0),
    cent AS (
      SELECT label AS clabel,
             list(CAST(floor(s * 1.0 / n + 0.5) AS BIGINT)
                  ORDER BY pos) AS ce
      FROM (SELECT label, pos, SUM(v_fp) AS s, COUNT(*) AS n
            FROM expl GROUP BY 1, 2)
      GROUP BY 1),
    dists AS (
      SELECT q.vec_id, q.label, c.clabel,
             list_sum(list_transform(range(1, {_EMB_DIM + 1}),
               k -> (q.qe[k] - c.ce[k]) * (q.qe[k] - c.ce[k]))) AS d2
      FROM q CROSS JOIN cent c WHERE q.half = 1),
    pred AS (
      SELECT vec_id, label, clabel AS predicted
      FROM (SELECT vec_id, label, clabel,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, clabel) AS rn
            FROM dists)
      WHERE rn = 1),
    conf AS (
      SELECT label AS true_label, predicted,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2)
    SELECT true_label, predicted, n,
           CAST(SUM(CASE WHEN true_label = predicted THEN n END)
             OVER () * 1000000 // SUM(n) OVER () AS BIGINT)
             AS overall_accuracy_ppm
    FROM conf
    ORDER BY true_label, predicted
    """,
)
def emb_nearest_centroid_confusion(spark: SparkSession, sf_dir: str):
    """Nearest-centroid classifier evaluated on a held-out half: train
    prototypes on even vec_ids, classify odd vec_ids by nearest
    centroid, and emit the CONFUSION MATRIX plus overall accuracy —
    the end-to-end eval that turns the embedding-quality audits
    (silhouette, triplet margins) into the number a model card
    reports, with the off-diagonal cells naming exactly which label
    pairs the space confuses. Same fixed-point quantization and
    N x 10 broadcast-centroid join as the triplet audit; the argmin
    is exact-integer with label tiebreak (Spark min_by over a
    struct, DuckDB a vec-partitioned rank — same total order). One
    pass per half."""
    e = t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.expr(
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {_NC_SCALE} + 0.5) AS BIGINT))"
        ).alias("qe"),
    )
    expl = (
        e.filter(F.col("vec_id") % 2 == 0)
        .select(
            "label",
            F.posexplode(
                F.expr(
                    "transform(embedding, v -> CAST(floor("
                    f"CAST(v AS DOUBLE) * {_NC_SCALE} + 0.5)"
                    " AS BIGINT))"
                )
            ).alias("pos", "v_fp"),
        )
    )
    cent = (
        expl.groupBy("label", "pos")
        .agg(F.sum("v_fp").alias("s"), F.count("*").alias("n"))
        .groupBy(F.col("label").alias("clabel"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos,"
                " CAST(floor(s * 1.0 / n + 0.5) AS BIGINT) AS cv))),"
                " z -> z.cv)"
            ).alias("ce")
        )
    )
    dists = (
        q.filter(F.col("half") == 1)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "clabel",
            F.expr(
                f"aggregate(sequence(1, {_EMB_DIM}),"
                " CAST(0 AS BIGINT), (acc, k) ->"
                " acc + (element_at(qe, k) - element_at(ce, k))"
                " * (element_at(qe, k) - element_at(ce, k)))"
            ).alias("d2"),
        )
    )
    pred = dists.groupBy("vec_id", "label").agg(
        F.expr("min_by(clabel, struct(d2, clabel))").alias(
            "predicted"
        )
    )
    conf = pred.groupBy(
        F.col("label").alias("true_label"), "predicted"
    ).agg(F.count("*").cast("bigint").alias("n"))
    return conf.select(
        "true_label",
        "predicted",
        "n",
        F.expr(
            "CAST(SUM(CASE WHEN true_label = predicted THEN n END)"
            " OVER () * 1000000 div SUM(n) OVER () AS BIGINT)"
        ).alias("overall_accuracy_ppm"),
    ).orderBy("true_label", "predicted")


# ------------------------------------------------------------------
# 2. nation_gravity_residual_pairs — who over/under-trades
# ------------------------------------------------------------------

_GR_TOPK = 10


@register(
    "nation_gravity_residual_pairs",
    f"""
    WITH flows AS (
      SELECT sn.n_nationkey AS i, c.c_nationkey AS j,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS f
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer c ON c.c_custkey = o_custkey
      JOIN supplier s ON s.s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    mass AS (SELECT i, CAST(SUM(f) AS BIGINT) AS outv
             FROM flows GROUP BY 1),
    dem AS (SELECT j, CAST(SUM(f) AS BIGINT) AS inv
            FROM flows GROUP BY 1),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS ft FROM flows),
    pred AS (
      SELECT fl.i, fl.j, fl.f,
             CAST(CAST(m.outv AS HUGEINT) * d.inv // t.ft AS BIGINT)
               AS f_hat
      FROM flows fl
      JOIN mass m ON m.i = fl.i
      JOIN dem d ON d.j = fl.j
      CROSS JOIN tot t
      WHERE fl.f > 0)
    SELECT i AS supplier_nation, j AS customer_nation,
           f AS actual_cents, f_hat AS gravity_pred_cents,
           CAST(round(1e3 * ln(CAST(f AS DOUBLE) / f_hat)) AS BIGINT)
             AS log_residual_milli
    FROM pred
    WHERE f_hat > 0
    ORDER BY abs(round(1e3 * ln(CAST(f AS DOUBLE) / f_hat))) DESC,
             i, j
    LIMIT {_GR_TOPK}
    """,
)
def nation_gravity_residual_pairs(spark: SparkSession, sf_dir: str):
    """Gravity-model residuals: which nation pairs trade most ABOVE
    or BELOW the frictionless prediction f_hat = (exports_i x
    imports_j) / world_total — the residual analysis that turns the
    gravity FIT (which estimates elasticities) into named findings
    (persistent over-traders read as preferential relationships,
    under-traders as frictions). The unit-elasticity prediction is
    exact integer arithmetic (HUGEINT/decimal(38,0) — outv x inv
    reaches ~1e26 at sf100); the log residual quantizes once per
    pair from identically-derived doubles. One fact aggregate to
    the 25x25 matrix; top-{_GR_TOPK} by |residual|."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("i"),
            F.col("c_nationkey").alias("j"),
        )
        .agg(
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("f")
        )
    )
    flows = flows.persist()
    mass = flows.groupBy("i").agg(
        F.sum("f").cast("bigint").alias("outv")
    )
    demd = flows.groupBy("j").agg(
        F.sum("f").cast("bigint").alias("inv")
    )
    tot = flows.agg(F.sum("f").cast("bigint").alias("ft"))
    pred = (
        flows.filter(F.col("f") > 0)
        .join(mass, "i")
        .join(demd, "j")
        .crossJoin(F.broadcast(tot))
        .select(
            "i",
            "j",
            "f",
            F.expr(
                "CAST(CAST(outv AS DECIMAL(38,0)) * inv div ft"
                " AS BIGINT)"
            ).alias("f_hat"),
        )
        .filter(F.col("f_hat") > 0)
    )
    return (
        pred.select(
            F.col("i").alias("supplier_nation"),
            F.col("j").alias("customer_nation"),
            F.col("f").alias("actual_cents"),
            F.col("f_hat").alias("gravity_pred_cents"),
            F.expr(
                "CAST(round(1e3 * ln(CAST(f AS DOUBLE) / f_hat))"
                " AS BIGINT)"
            ).alias("log_residual_milli"),
        )
        .orderBy(
            F.abs(F.col("log_residual_milli")).desc(),
            "supplier_nation",
            "customer_nation",
        )
        .limit(_GR_TOPK)
    )


# ------------------------------------------------------------------
# 3. part_abc_class_migration — importance-class churn
# ------------------------------------------------------------------


@register(
    "part_abc_class_migration",
    """
    WITH yr AS (SELECT MAX(year(l_shipdate)) AS y2 FROM lineitem),
    rev AS (
      SELECT l_partkey AS pk, year(l_shipdate) AS yy,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS r
      FROM lineitem CROSS JOIN yr
      WHERE year(l_shipdate) IN (yr.y2 - 1, yr.y2)
      GROUP BY 1, 2),
    ranked AS (
      SELECT pk, yy, r,
             SUM(r) OVER (PARTITION BY yy ORDER BY r DESC, pk) AS cum,
             SUM(r) OVER (PARTITION BY yy) AS tot
      FROM rev),
    classed AS (
      SELECT pk, yy,
             CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                  WHEN cum * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS cls
      FROM ranked),
    wide AS (
      SELECT c1.pk, c1.cls AS cls_y1, c2.cls AS cls_y2
      FROM classed c1
      JOIN classed c2 ON c2.pk = c1.pk
      CROSS JOIN yr
      WHERE c1.yy = yr.y2 - 1 AND c2.yy = yr.y2)
    SELECT cls_y1 AS class_from, cls_y2 AS class_to,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*))
             OVER (PARTITION BY cls_y1) AS BIGINT) AS row_share_ppm
    FROM wide
    GROUP BY 1, 2
    ORDER BY class_from, class_to
    """,
)
def part_abc_class_migration(spark: SparkSession, sf_dir: str):
    """ABC importance-class migration between the two latest years:
    parts classify A/B/C by cumulative revenue share (80/95 cuts,
    the supplier_abc_classification rule applied per year) and the
    transition matrix counts who moved — the category-management
    churn view (a stable business shows a heavy diagonal; A->C
    rows are delistings in progress, C->A rows are breakouts the
    static snapshot misses). Year-PARTITIONED cumulative windows
    build both classifications in one pass over the two-year fact
    cut; the migration join is part-grain; output is the bounded
    3x3 matrix with row-normalized shares."""
    li = t(spark, sf_dir, "lineitem")
    yr = li.agg(F.max(F.year("l_shipdate")).alias("y2"))
    rev = (
        li.crossJoin(F.broadcast(yr))
        .filter(
            (F.year("l_shipdate") == F.col("y2"))
            | (F.year("l_shipdate") == F.col("y2") - 1)
        )
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").alias("yy"),
        )
        .agg(
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )
    wcum = (
        Window.partitionBy("yy")
        .orderBy(F.col("r").desc(), "pk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("yy")
    classed = (
        rev.select(
            "pk",
            "yy",
            F.sum("r").over(wcum).alias("cum"),
            F.sum("r").over(wtot).alias("tot"),
        ).select(
            "pk",
            "yy",
            F.expr(
                "CASE WHEN cum * 100 <= tot * 80 THEN 'A'"
                " WHEN cum * 100 <= tot * 95 THEN 'B'"
                " ELSE 'C' END"
            ).alias("cls"),
        )
    )
    c2 = classed.select(
        F.col("pk").alias("pk2"),
        F.col("yy").alias("yy2"),
        F.col("cls").alias("cls_y2"),
    )
    wide = (
        classed.crossJoin(F.broadcast(yr))
        .filter(F.col("yy") == F.col("y2") - 1)
        .join(
            c2,
            (F.col("pk2") == F.col("pk"))
            & (F.col("yy2") == F.col("yy") + 1),
        )
        .select(F.col("cls").alias("cls_y1"), "cls_y2")
    )
    mig = wide.groupBy(
        F.col("cls_y1").alias("class_from"),
        F.col("cls_y2").alias("class_to"),
    ).agg(F.count("*").cast("bigint").alias("n_parts"))
    return mig.select(
        "class_from",
        "class_to",
        "n_parts",
        F.expr(
            "CAST(n_parts * 1000000 div SUM(n_parts)"
            " OVER (PARTITION BY class_from) AS BIGINT)"
        ).alias("row_share_ppm"),
    ).orderBy("class_from", "class_to")


# ------------------------------------------------------------------
# 4. orders_priority_preemption_sim — starvation audit fold
# ------------------------------------------------------------------

_PQ_PRIORITIES = 5


@register(
    "orders_priority_preemption_sim",
    f"""
    WITH arr AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS pr,
             CAST(COUNT(*) AS BIGINT) AS a
      FROM orders GROUP BY 1, 2),
    months AS (
      SELECT ym,
             list(COALESCE(a, 0) ORDER BY pr) AS arrivals
      FROM (
        SELECT m.ym, p.pr, arr.a
        FROM (SELECT DISTINCT ym FROM arr) m
        CROSS JOIN (SELECT UNNEST(range(1, {_PQ_PRIORITIES + 1}))
                    AS pr) p
        LEFT JOIN arr ON arr.ym = m.ym AND arr.pr = p.pr)
      GROUP BY 1),
    cap AS (
      SELECT CAST(SUM(a) // COUNT(DISTINCT ym) AS BIGINT) AS c
      FROM arr),
    series AS (
      SELECT (SELECT list(arrivals ORDER BY ym) FROM months) AS ms,
             (SELECT c FROM cap) AS c),
    folded AS (
      SELECT c,
             list_reduce(
               list_prepend(
                 [CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                  CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                  CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                 ms),
               (acc, e) -> [
                 GREATEST(acc[1] + e[1] - c, 0),
                 GREATEST(acc[2] + e[2]
                   - GREATEST(c - acc[1] - e[1], 0), 0),
                 GREATEST(acc[3] + e[3]
                   - GREATEST(c - acc[1] - e[1]
                     - acc[2] - e[2], 0), 0),
                 GREATEST(acc[4] + e[4]
                   - GREATEST(c - acc[1] - e[1]
                     - acc[2] - e[2] - acc[3] - e[3], 0), 0),
                 GREATEST(acc[5] + e[5]
                   - GREATEST(c - acc[1] - e[1]
                     - acc[2] - e[2] - acc[3] - e[3] - acc[4] - e[4],
                     0), 0),
                 acc[6] + CASE WHEN acc[5] + e[5]
                   - GREATEST(c - acc[1] - e[1]
                     - acc[2] - e[2] - acc[3] - e[3] - acc[4] - e[4],
                     0) > 0 THEN 1 ELSE 0 END]) AS st
      FROM series)
    SELECT c AS monthly_capacity,
           CAST(st[1] AS BIGINT) AS backlog_p1,
           CAST(st[2] AS BIGINT) AS backlog_p2,
           CAST(st[3] AS BIGINT) AS backlog_p3,
           CAST(st[4] AS BIGINT) AS backlog_p4,
           CAST(st[5] AS BIGINT) AS backlog_p5,
           CAST(st[6] AS BIGINT) AS months_p5_starved
    FROM folded
    """,
)
def orders_priority_preemption_sim(spark: SparkSession, sf_dir: str):
    """Strict-priority queue simulation over the monthly order
    arrivals: a fixed monthly service capacity (the observed mean
    arrival rate, so the system runs at utilization ~1) serves
    priority 1 first, cascading leftover capacity downward, and the
    fold tracks per-class backlogs plus how many months the lowest
    class STARVED (ended with backlog) — the head-of-line-blocking
    audit that Little's-law averages hide, and the standard argument
    for weighted-fair queueing over strict priority. The entire
    simulation is one array fold over the calendar-bounded month
    axis with a 6-slot integer state (5 backlogs + starvation
    counter); arrivals densify onto a (month x priority) spine so
    missing cells are true zeros. Exact integers throughout."""
    o = t(spark, sf_dir, "orders")
    arr = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "ym"
        ),
        F.expr(
            "CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"
        ).alias("pr"),
    ).agg(F.count("*").cast("bigint").alias("a"))
    arr = arr.persist()
    mspine = arr.select("ym").distinct()
    pspine = spark.range(1, _PQ_PRIORITIES + 1).select(
        F.col("id").alias("pr")
    )
    months = (
        mspine.crossJoin(F.broadcast(pspine))
        .join(arr, ["ym", "pr"], "left")
        .groupBy("ym")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pr,"
                " COALESCE(a, CAST(0 AS BIGINT)) AS av))),"
                " z -> z.av)"
            ).alias("arrivals")
        )
    )
    cap = arr.agg(
        F.expr(
            "CAST(SUM(a) div COUNT(DISTINCT ym) AS BIGINT)"
        ).alias("c")
    )
    series = months.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ym, arrivals))),"
            " z -> z.arrivals)"
        ).alias("ms")
    )
    leftover = (
        lambda upto: "(c - "
        + " - ".join(
            f"acc[{i}] - e[{i}]" for i in range(upto)
        )
        + ")"
    )
    upd = []
    for i in range(_PQ_PRIORITIES):
        if i == 0:
            upd.append("GREATEST(acc[0] + e[0] - c, 0)")
        else:
            upd.append(
                f"GREATEST(acc[{i}] + e[{i}]"
                f" - GREATEST({leftover(i)}, 0), 0)"
            )
    starv = (
        f"acc[5] + IF(acc[4] + e[4]"
        f" - GREATEST({leftover(4)}, 0) > 0, 1, 0)"
    )
    folded = series.crossJoin(F.broadcast(cap)).select(
        "c",
        F.expr(
            "aggregate(ms,"
            " array(CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
            "  CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
            "  CAST(0 AS BIGINT), CAST(0 AS BIGINT)),"
            f" (acc, e) -> array({', '.join(upd)}, {starv}))"
        ).alias("st"),
    )
    return folded.select(
        F.col("c").alias("monthly_capacity"),
        *[
            F.expr(f"CAST(st[{i}] AS BIGINT)").alias(
                f"backlog_p{i + 1}"
            )
            for i in range(_PQ_PRIORITIES)
        ],
        F.expr("CAST(st[5] AS BIGINT)").alias("months_p5_starved"),
    )
