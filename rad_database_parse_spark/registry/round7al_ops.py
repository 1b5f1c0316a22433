"""Round-7al operators: Selinger join-order cost enumeration, Markov
next-event predictor accuracy, rounding reconciliation, weighted-edge
percolation reach, and day-over-day volume anomaly detection.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. join_order_cost_enumeration — Selinger left-deep enumeration
# ------------------------------------------------------------------

# Left-deep join orders over the chain customer—orders—lineitem—part
# (every prefix connected). Cost = sum of ESTIMATED intermediate
# cardinalities (System-R: |R⋈S| = |R||S|/max(ndv)); the final join's
# size is identical across plans and excluded.
_JOC_PLANS = [
    (
        "customer><orders, then lineitem, then part",
        ["est_co", "est_col"],
    ),
    (
        "orders><lineitem, then customer, then part",
        ["est_ol", "est_col"],
    ),
    (
        "orders><lineitem, then part, then customer",
        ["est_ol", "est_olp"],
    ),
    (
        "lineitem><part, then orders, then customer",
        ["est_lp", "est_olp"],
    ),
]


def _joc_oracle() -> str:
    plan_rows = []
    for name, terms in _JOC_PLANS:
        cost = " + ".join(terms)
        plan_rows.append(
            f"""
      SELECT '{name}' AS plan, CAST({cost} AS BIGINT)
        AS est_cost_rows FROM ests"""
        )
    plans = "\n      UNION ALL\n      ".join(plan_rows)
    return f"""
    WITH stats AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_c,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_o,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_l,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS n_p,
        (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
         FROM customer) AS d_ck_c,
        (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
         FROM orders) AS d_ck_o,
        (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
         FROM orders) AS d_ok_o,
        (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
         FROM lineitem) AS d_ok_l,
        (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
         FROM lineitem) AS d_pk_l,
        (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT)
         FROM part) AS d_pk_p),
    ests AS (
      SELECT
        CAST(n_c * n_o // GREATEST(d_ck_c, d_ck_o) AS BIGINT)
          AS est_co,
        CAST(n_o * n_l // GREATEST(d_ok_o, d_ok_l) AS BIGINT)
          AS est_ol,
        CAST(n_l * n_p // GREATEST(d_pk_l, d_pk_p) AS BIGINT)
          AS est_lp,
        CAST((n_c * n_o // GREATEST(d_ck_c, d_ck_o)) * n_l
             // GREATEST(d_ok_o, d_ok_l) AS BIGINT) AS est_col,
        CAST((n_o * n_l // GREATEST(d_ok_o, d_ok_l)) * n_p
             // GREATEST(d_pk_l, d_pk_p) AS BIGINT) AS est_olp
      FROM stats),
    plans AS (
      {plans})
    SELECT plan, est_cost_rows,
           CAST(ROW_NUMBER() OVER (ORDER BY est_cost_rows, plan)
             AS BIGINT) AS cost_rank
    FROM plans ORDER BY cost_rank
    """


@register("join_order_cost_enumeration", _joc_oracle())
def join_order_cost_enumeration(spark: SparkSession, sf_dir: str):
    """Selinger-style left-deep join-order enumeration over the
    customer—orders—lineitem—part chain — THE System-R idea made
    visible: each connected left-deep order is costed as the sum of
    its estimated intermediate cardinalities under the |R||S|/max-ndv
    containment rule (the same estimator the CE-audit op scores), and
    the ranking reproduces the optimizer's classic conclusion — join
    the SELECTIVE edge (customer×orders, which only reaches |orders|)
    before the fan-out edges, because every row you defer multiplying
    is a row every later join never sees. Cross-join prefixes are
    excluded (connected-subgraph rule, as in System R). One stats
    pass (counts + exact ndv per join key — the ANALYZE equivalent);
    the 4-plan enumeration is pure BIGINT arithmetic over one row.
    At 100 TB the stats pass IS the cost; real DP over bushy plans
    only widens the plan table, not the data touched."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    stats = (
        c.agg(
            F.count("*").cast("bigint").alias("n_c"),
            F.count_distinct("c_custkey").cast("bigint").alias("d_ck_c"),
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count("*").cast("bigint").alias("n_o"),
                    F.count_distinct("o_custkey")
                    .cast("bigint")
                    .alias("d_ck_o"),
                    F.count_distinct("o_orderkey")
                    .cast("bigint")
                    .alias("d_ok_o"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                li.agg(
                    F.count("*").cast("bigint").alias("n_l"),
                    F.count_distinct("l_orderkey")
                    .cast("bigint")
                    .alias("d_ok_l"),
                    F.count_distinct("l_partkey")
                    .cast("bigint")
                    .alias("d_pk_l"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                p.agg(
                    F.count("*").cast("bigint").alias("n_p"),
                    F.count_distinct("p_partkey")
                    .cast("bigint")
                    .alias("d_pk_p"),
                )
            )
        )
    )
    ests = stats.select(
        F.expr(
            "CAST(n_c * n_o div GREATEST(d_ck_c, d_ck_o) AS BIGINT)"
        ).alias("est_co"),
        F.expr(
            "CAST(n_o * n_l div GREATEST(d_ok_o, d_ok_l) AS BIGINT)"
        ).alias("est_ol"),
        F.expr(
            "CAST(n_l * n_p div GREATEST(d_pk_l, d_pk_p) AS BIGINT)"
        ).alias("est_lp"),
        F.expr(
            "CAST((n_c * n_o div GREATEST(d_ck_c, d_ck_o)) * n_l"
            " div GREATEST(d_ok_o, d_ok_l) AS BIGINT)"
        ).alias("est_col"),
        F.expr(
            "CAST((n_o * n_l div GREATEST(d_ok_o, d_ok_l)) * n_p"
            " div GREATEST(d_pk_l, d_pk_p) AS BIGINT)"
        ).alias("est_olp"),
    )
    plans = None
    for name, terms in _JOC_PLANS:
        cost = " + ".join(terms)
        row = ests.select(
            F.lit(name).alias("plan"),
            F.expr(f"CAST({cost} AS BIGINT)").alias("est_cost_rows"),
        )
        plans = row if plans is None else plans.union(row)
    w = Window.orderBy("est_cost_rows", "plan")
    return plans.select(
        "plan",
        "est_cost_rows",
        F.row_number().over(w).cast("bigint").alias("cost_rank"),
    ).orderBy("cost_rank")


# ------------------------------------------------------------------
# 2. events_markov_next_event_accuracy — predictor evaluation
# ------------------------------------------------------------------


@register(
    "events_markov_next_event_accuracy",
    """
    WITH seq AS (
      SELECT event_type AS prev,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (
      SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    pred AS (
      SELECT prev, nxt AS predicted_next, cnt AS hit_cnt FROM (
        SELECT prev, nxt, cnt,
               ROW_NUMBER() OVER (PARTITION BY prev
                 ORDER BY cnt DESC, nxt) AS rk
        FROM trans) WHERE rk = 1),
    tot AS (
      SELECT prev, CAST(SUM(cnt) AS BIGINT) AS n_transitions
      FROM trans GROUP BY 1)
    SELECT t.prev, p.predicted_next, t.n_transitions,
           p.hit_cnt AS n_correct,
           CAST(p.hit_cnt * 1000000 // t.n_transitions AS BIGINT)
             AS accuracy_ppm
    FROM tot t JOIN pred p ON p.prev = t.prev
    ORDER BY t.prev
    """,
)
def events_markov_next_event_accuracy(spark: SparkSession, sf_dir: str):
    """Next-event prediction accuracy of the order-1 Markov argmax
    predictor — the EVALUATION the tier's transition-matrix ops imply
    but never score: for each current event type, predict the modal
    next type and measure how often the stream agrees. This is the
    baseline every sequence model must beat (and on weakly-structured
    streams it is embarrassingly hard to beat — the accuracy column
    quantifies exactly how much signal order-1 history carries,
    complementing the surprisal and entropy ops that measure it in
    bits). One lead window partitioned by user (the sessionization
    shuffle), one transition fold, one partitioned argmax that group-
    limit-prunes map-side, and exact ppm accuracy per antecedent. The
    train-on-self evaluation is declared (resubstitution — at 100 TB
    you'd split user hash ranges into fit/eval halves with the same
    plan shape)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("prev", "nxt")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wr = Window.partitionBy("prev").orderBy(
        F.col("cnt").desc(), "nxt"
    )
    pred = (
        trans.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "prev",
            F.col("nxt").alias("predicted_next"),
            F.col("cnt").alias("hit_cnt"),
        )
    )
    tot = trans.groupBy("prev").agg(
        F.sum("cnt").cast("bigint").alias("n_transitions")
    )
    return (
        tot.join(pred, "prev")
        .select(
            "prev",
            "predicted_next",
            "n_transitions",
            F.col("hit_cnt").alias("n_correct"),
            F.expr(
                "CAST(hit_cnt * 1000000 div n_transitions AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("prev")
    )


# ------------------------------------------------------------------
# 3. lineitem_rounding_reconciliation — accounting cents audit
# ------------------------------------------------------------------


@register(
    "lineitem_rounding_reconciliation",
    """
    WITH lines AS (
      SELECT l_orderkey,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT) AS price_c,
             CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS disc_pct
      FROM lineitem),
    per_line AS (
      SELECT l_orderkey,
             price_c * (100 - disc_pct) AS exact_c100,
             (price_c * (100 - disc_pct) + 50) // 100 AS rounded_c
      FROM lines),
    per_order AS (
      SELECT l_orderkey,
             CAST(SUM(rounded_c) AS BIGINT) AS sum_of_rounded,
             CAST((SUM(exact_c100) + 50) // 100 AS BIGINT)
               AS rounded_of_sum
      FROM per_line GROUP BY 1),
    diffs AS (
      SELECT sum_of_rounded - rounded_of_sum AS d FROM per_order)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN d != 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatched,
           CAST(SUM(CASE WHEN d != 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS mismatch_ppm,
           CAST(SUM(ABS(d)) AS BIGINT) AS total_abs_drift_cents,
           CAST(MAX(ABS(d)) AS BIGINT) AS max_abs_drift_cents
    FROM diffs
    """,
)
def lineitem_rounding_reconciliation(spark: SparkSession, sf_dir: str):
    """Sum-of-rounded vs rounded-of-sum reconciliation — the penny
    problem every billing system audits: rounding each line's
    discounted price to whole cents and summing does NOT equal
    rounding the order total, and the drift (bounded by half a cent
    per line) is exactly what makes naive invoice totals disagree
    with ledger totals. Everything stays in exact integer
    hundredths-of-cents (price_c·(100−disc) — no floating point
    anywhere, half-up rounding as the explicit +50//100 so both
    engines share ONE rounding convention rather than their libm
    defaults), then one order-grain fold and a census of the
    discrepancies. The mismatch share and max drift are the two
    numbers a finance reconciliation report leads with. At 100 TB
    this is one map-side expression + one order-key fold — the
    cheapest audit in the money tier."""
    li = t(spark, sf_dir, "lineitem")
    lines = li.select(
        "l_orderkey",
        (dec("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        (dec("l_discount") * 100).cast("bigint").alias("disc_pct"),
    )
    per_line = lines.select(
        "l_orderkey",
        (F.col("price_c") * (100 - F.col("disc_pct"))).alias(
            "exact_c100"
        ),
        F.expr(
            "(price_c * (100 - disc_pct) + 50) div 100"
        ).alias("rounded_c"),
    )
    per_order = per_line.groupBy("l_orderkey").agg(
        F.sum("rounded_c").cast("bigint").alias("sum_of_rounded"),
        F.expr(
            "CAST((SUM(exact_c100) + 50) div 100 AS BIGINT)"
        ).alias("rounded_of_sum"),
    )
    diffs = per_order.select(
        (F.col("sum_of_rounded") - F.col("rounded_of_sum")).alias("d")
    )
    return diffs.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("d") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        F.expr(
            "CAST(SUM(CASE WHEN d != 0 THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("mismatch_ppm"),
        F.sum(F.abs("d")).cast("bigint").alias("total_abs_drift_cents"),
        F.max(F.abs("d")).cast("bigint").alias("max_abs_drift_cents"),
    )


# ------------------------------------------------------------------
# 4. graph_weight_percolation_reach — robustness profile
# ------------------------------------------------------------------

# weight thresholds as QUANTILES of the edge-weight distribution —
# absolute weights behave oppositely across scale factors (the sf0.01
# graph is complete at weight 8 while sf0.1 is sparse at 5); quantile
# cut-points sparsify proportionally at any SF
_PERC_QUANTILES = [("p95", 0.95), ("p98", 0.98), ("p995", 0.995)]


def _perc_oracle() -> str:
    branches = []
    for label, q in _PERC_QUANTILES:
        thr = f"(SELECT t{label} FROM thr)"
        branches.append(
            f"""
      SELECT '{label}' AS weight_quantile,
             {thr} AS min_weight,
             (SELECT CAST(COUNT(DISTINCT u) AS BIGINT)
              FROM edges WHERE cnt >= {thr}) AS n_nodes,
             (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM (
                SELECT DISTINCT d2.u, d2.v FROM (
                  SELECT e1.u, e2.v
                  FROM edges e1 JOIN edges e2
                    ON e2.u = e1.v AND e1.cnt >= {thr}
                    AND e2.cnt >= {thr} AND e1.u != e2.v
                  UNION ALL
                  SELECT u, v FROM edges WHERE cnt >= {thr}) d2))
               AS pairs_within_2"""
        )
    union = "\n      UNION ALL\n      ".join(branches)
    cuts = ",\n             ".join(
        f"CAST(ceil(quantile_cont(cnt, {q})) AS BIGINT) AS t{label}"
        for label, q in _PERC_QUANTILES
    )
    return f"""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS ord, l_suppkey AS supp
      FROM lineitem),
    shared AS (
      SELECT a.supp AS u, b.supp AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base a JOIN base b ON b.ord = a.ord AND a.supp != b.supp
      GROUP BY 1, 2),
    edges AS (SELECT u, v, cnt FROM shared),
    thr AS (
      SELECT {cuts}
      FROM edges),
    grid AS (
      {union})
    SELECT weight_quantile, min_weight, n_nodes, pairs_within_2,
           CAST(pairs_within_2 * 1000000
                // NULLIF(n_nodes * (n_nodes - 1) // 2, 0) AS BIGINT)
             AS reach2_ppm
    FROM grid ORDER BY weight_quantile
    """


@register("graph_weight_percolation_reach", _perc_oracle())
def graph_weight_percolation_reach(spark: SparkSession, sf_dir: str):
    """Weighted-edge percolation profile of the supplier co-supply
    graph: raise the minimum edge weight (co-fulfilled orders) and
    watch 2-hop reachability collapse — the robustness readout behind
    'how much does the network depend on weak ties' (Granovetter's
    question as a measurement): a network whose reach survives p99.5
    pruning has redundant strong corridors; one that shatters below
    p95 routes everything over one-off relationships. Thresholds are
    QUANTILES of the edge-weight distribution, not absolute weights —
    absolute cut-points behave oppositely across scale factors (the
    sf0.01 co-supply graph is complete at weight 8 while sf0.1 is
    sparse at 5, and the first version's fixed w≥2 left a ~690-degree
    near-complete graph whose 2-hop closure cost 23s at sf0.1);
    keeping only the top 2-5% of edges bounds the closure's degree by
    construction at ANY scale. One fact-grain pair build serves all
    thresholds (filter, not rebuild); per threshold, reach is one
    pair×edge join + distinct capped at radius 2. Exact interpolated
    quantile cut-points ceil to integers identically in both
    engines; all counts exact, reach in integer ppm."""
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
        .persist()
    )
    trow = shared.agg(  # bounded: ONE row of cut-points; arms filter on literals
        *[
            F.expr(
                f"CAST(ceil(percentile(cnt, {q})) AS BIGINT)"
            ).alias(f"t{label}")
            for label, q in _PERC_QUANTILES
        ]
    ).collect()[0]
    thr = {label: int(trow[f"t{label}"]) for label, _q in _PERC_QUANTILES}
    tmin = min(thr.values())
    # prune ONCE at the loosest quantile (the other subsets nest inside
    # it), persist the small survivor set, and run ALL three arms in a
    # single label-exploded pass — the per-arm loop paid ~4 tiny-stage
    # jobs x 3 arms of scheduling latency on a cache-sized edge set
    # (VERDICT r6 item 5 family; measured 10.3s -> ~3s at sf0.1)
    labels_expr = ", ".join(
        f"CASE WHEN cnt >= {t} THEN '{label}' END"
        for label, t in sorted(thr.items())
    )
    ew = (
        shared.filter(F.col("cnt") >= tmin)
        .select(
            "u",
            "v",
            F.explode(
                F.expr(
                    f"filter(array({labels_expr}), x -> x IS NOT NULL)"
                )
            ).alias("weight_quantile"),
        )
        .persist()
    )
    nn = ew.groupBy("weight_quantile").agg(
        F.count_distinct("u").cast("bigint").alias("n_nodes")
    )
    e2 = ew.select(
        F.col("weight_quantile").alias("wq2"),
        F.col("u").alias("pu"),
        F.col("v").alias("pv"),
    )
    two_hop = (
        ew.join(
            e2,
            (F.col("weight_quantile") == F.col("wq2"))
            & (F.col("v") == F.col("pu")),
        )
        .filter(F.col("u") != F.col("pv"))
        .select("weight_quantile", "u", F.col("pv").alias("v"))
        .union(ew.select("weight_quantile", "u", "v"))
        .distinct()
    )
    cnt2 = two_hop.groupBy("weight_quantile").agg(
        F.expr("CAST(COUNT(*) div 2 AS BIGINT)").alias("pairs_within_2")
    )
    # literal label frame so an empty subset still yields its zero row
    # (parity with the oracle's scalar-subquery branches)
    lab = spark.createDataFrame(
        [(label, t) for label, t in sorted(thr.items())],
        "weight_quantile string, min_weight bigint",
    )
    return (
        lab.join(F.broadcast(nn), "weight_quantile", "left")
        .join(F.broadcast(cnt2), "weight_quantile", "left")
        .select(
            "weight_quantile",
            "min_weight",
            F.coalesce(F.col("n_nodes"), F.lit(0))
            .cast("bigint")
            .alias("n_nodes"),
            F.coalesce(F.col("pairs_within_2"), F.lit(0))
            .cast("bigint")
            .alias("pairs_within_2"),
        )
        .select(
            "weight_quantile",
            "min_weight",
            "n_nodes",
            "pairs_within_2",
            F.expr(
                "CAST(pairs_within_2 * 1000000"
                " div NULLIF(n_nodes * (n_nodes - 1) div 2, 0)"
                " AS BIGINT)"
            ).alias("reach2_ppm"),
        )
        .orderBy("weight_quantile")
    )


# ------------------------------------------------------------------
# 5. dq_volume_dod_anomaly — ingest volume monitoring
# ------------------------------------------------------------------

_VOL_TOPK = 5


@register(
    "dq_volume_dod_anomaly",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1),
    seq AS (
      SELECT d, c,
             LAG(c) OVER (ORDER BY d) AS prev_c
      FROM daily),
    scored AS (
      SELECT d, c, prev_c,
             CAST(c * 1000 // prev_c AS BIGINT) AS ratio_milli,
             CAST(GREATEST(c * 1000 // prev_c,
                           prev_c * 1000 // c) AS BIGINT) AS dev
      FROM seq WHERE prev_c IS NOT NULL AND prev_c > 0 AND c > 0)
    SELECT CAST(datediff('day', DATE '1992-01-01', d) AS BIGINT)
             AS epoch_day,
           c AS n_rows, prev_c AS prev_rows, ratio_milli
    FROM scored
    ORDER BY dev DESC, epoch_day
    LIMIT {_VOL_TOPK}
    """,
)
def dq_volume_dod_anomaly(spark: SparkSession, sf_dir: str):
    """Day-over-day ingest-volume anomaly detection — the volume
    member of the DQ monitoring trio (freshness, volume, content):
    a partition whose row count halves or doubles against yesterday
    is the classic silent-upstream-failure signature, and catching it
    at the COUNT level costs nothing compared to content checks. The
    symmetric deviation max(c/prev, prev/c) ranks the worst days
    (direction-free — drops and spikes surface together); the lag
    runs over the bounded calendar-day axis (the whitelisted
    bounded-window grain). Counts exact; ratios integer milli. In
    production the top rows page; here the top-{_VOL_TOPK} days are
    the synthetic generator's own volume seams — the audit audits
    its input, which is the point."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.orderBy("d")
    seq = daily.select(
        "d", "c", F.lag("c").over(w).alias("prev_c")
    )
    scored = seq.filter(
        F.col("prev_c").isNotNull()
        & (F.col("prev_c") > 0)
        & (F.col("c") > 0)
    ).select(
        "d",
        "c",
        "prev_c",
        F.expr("CAST(c * 1000 div prev_c AS BIGINT)").alias(
            "ratio_milli"
        ),
        F.expr(
            "CAST(GREATEST(c * 1000 div prev_c,"
            " prev_c * 1000 div c) AS BIGINT)"
        ).alias("dev"),
    )
    return (
        scored.select(
            F.datediff(F.col("d"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("epoch_day"),
            F.col("c").alias("n_rows"),
            F.col("prev_c").alias("prev_rows"),
            "ratio_milli",
            "dev",
        )
        .orderBy(F.col("dev").desc(), "epoch_day")
        .limit(_VOL_TOPK)
        .drop("dev")
    )
