"""Round-7o operators: Adamic-Adar link prediction, exact 5-player
Shapley cost allocation, Newey-West HAC standard errors, per-user
sequence surprisal, two-way fixed effects via alternating projections,
and an Oaxaca-Blinder gap decomposition.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. graph_adamic_adar_suppliers — weighted link prediction
# ------------------------------------------------------------------

_AA_K = 20
# Hub cap (VERDICT r7 item 3): a customer contributes at most this many
# suppliers to pair generation, so one hub key can emit at most
# cap²/2 ≈ 8k pairs instead of deg²/2 (5·10⁷ at deg 10⁴). The cap is in
# BOTH engines' plans (oracle in lockstep) and is deliberately above the
# corpus maximum at test scales (max distinct suppliers per customer:
# 67 @ sf0.01, 102 @ sf0.1 — measured via DuckDB over the testdata
# parquet, round-8 session; SCALE.md "Re-plans recorded in round 8"),
# so it binds only at the 100× skew it exists for. NOT silent: the cap
# constant, the measured headroom, and the binding condition are
# documented here and in SCALE.md.
_AA_HUB_CAP = 128


@register(
    "graph_adamic_adar_suppliers",
    """
    WITH sc AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    deg AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM sc GROUP BY 1),
    wsc AS (
      SELECT sc.s, sc.c,
             CAST(round(1e6 / ln(CAST(deg.d AS DOUBLE))) AS BIGINT) AS w
      FROM sc JOIN deg ON deg.c = sc.c WHERE deg.d >= 2),
    wcap AS (
      SELECT s, c, w FROM (
        SELECT s, c, w,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY s) AS rn
        FROM wsc) WHERE rn <= {cap}),
    pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b,
             CAST(SUM(a.w) AS BIGINT) AS aa_score_micro,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM wcap a JOIN wcap b ON b.c = a.c AND a.s < b.s
      GROUP BY 1, 2)
    SELECT supp_a, supp_b, n_shared, aa_score_micro
    FROM pairs
    ORDER BY aa_score_micro DESC, supp_a, supp_b
    LIMIT {k}
    """.replace("{k}", str(_AA_K)).replace("{cap}", str(_AA_HUB_CAP)),
)
def graph_adamic_adar_suppliers(spark: SparkSession, sf_dir: str):
    """Adamic-Adar link prediction on the supplier co-purchase graph:
    two suppliers' affinity is the sum over shared customers of
    1/ln(customer degree) — rare shared customers count more than
    promiscuous hubs, which is why AA beats raw common-neighbor
    counts (supplier_shared_customer_graph) at predicting future
    links. Same codegen equi-key self-join shape as that op (measured
    6x faster than the array-collapse form, r5); the degree weight is
    one bounded aggregate joined back before pair generation, and
    degree-1 customers drop early (they produce no pairs and ln 1
    would divide by zero). Hub cap (VERDICT r7): each customer
    contributes only its first {_AA_HUB_CAP} suppliers (deterministic
    key order; the AA weight keeps the TRUE degree) so join OUTPUT per
    key is bounded at cap²/2 — output skew is the one kind AQE cannot
    split. The cap exceeds the corpus max degree at test scales
    (102 @ sf0.1), binding only at the 100× hubs it guards against.
    Micro-quantized weights sum exactly in both engines; top-{_AA_K}
    via orderBy+limit."""
    li = t(spark, sf_dir, "lineitem")
    # broadcast the 2-column orderkey->custkey map (16 B/row; ~2.4 MB
    # at sf0.1 — measured 5.5s -> 4.9s warm). The hint holds while
    # orders stays under ~10^8 rows; past that, drop it and the same
    # plan runs as a shuffle join — a size-tuning knob, not a
    # correctness dependence.
    o = F.broadcast(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    )
    sc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c")
        )
        .distinct()
    )
    # degree + hub-cap rank in ONE window pass (one shuffle on c; the
    # pair self-join below reuses the same hash(c) exchange) — replaces
    # the groupBy(c) aggregate + join-back, measured 6.3s -> see
    # SCALE.md round-8 re-plan note
    wc = Window.partitionBy("c")
    wcap = (
        sc.withColumn("d", F.count("*").over(wc).cast("bigint"))
        .withColumn("rn", F.row_number().over(wc.orderBy("s")))
        .filter((F.col("d") >= 2) & (F.col("rn") <= _AA_HUB_CAP))
        .select(
            "s",
            "c",
            F.expr(
                "CAST(round(1e6 / ln(CAST(d AS DOUBLE))) AS BIGINT)"
            ).alias("w"),
        )
    )
    a = wcap.select(F.col("s").alias("supp_a"), "c", F.col("w"))
    b = wcap.select(F.col("s").alias("supp_b"), F.col("c").alias("c2"))
    pairs = (
        a.join(b, (F.col("c") == F.col("c2")) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(
            F.sum("w").cast("bigint").alias("aa_score_micro"),
            F.count("*").cast("bigint").alias("n_shared"),
        )
    )
    return (
        pairs.select("supp_a", "supp_b", "n_shared", "aa_score_micro")
        .orderBy(
            F.col("aa_score_micro").desc(), "supp_a", "supp_b"
        )
        .limit(_AA_K)
    )


# ------------------------------------------------------------------
# 2. region_shapley_cost_allocation — exact coalition enumeration
# ------------------------------------------------------------------

_SHAP_FIXED = 50_000_000  # shared fixed cost, cents
# |S|!(4-|S|)! for |S| = 0..4 (n = 5); divide by 5! = 120 at the end.
_SHAP_W = (24, 6, 4, 6, 24)


def _shap_wcase(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = {k} THEN {w}" for k, w in enumerate(_SHAP_W)
    )
    return f"CASE {whens} END"


@register(
    "region_shapley_cost_allocation",
    f"""
    WITH vol AS (
      SELECT n_regionkey AS rk,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS v
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1),
    masks AS (SELECT UNNEST(range(0, 32)) AS m),
    coal AS (
      SELECT m.m,
             CAST({_SHAP_FIXED}
               + floor(sqrt(CAST(COALESCE(SUM(CASE
                   WHEN (m.m >> vol.rk) & 1 = 1 THEN vol.v END), 0)
                 AS DOUBLE))) AS BIGINT) AS cost
      FROM masks m CROSS JOIN vol GROUP BY m.m),
    marg AS (
      SELECT p.rk,
             CAST(SUM({_shap_wcase('bit_count(s.m)')}
               * (si.cost - s.cost)) AS BIGINT) AS phi120
      FROM vol p
      JOIN coal s ON (s.m >> p.rk) & 1 = 0
      JOIN coal si ON si.m = s.m + (1 << p.rk)
      GROUP BY 1)
    SELECT r.r_name AS region, v.v AS volume_cents,
           CAST({_SHAP_FIXED}
             + floor(sqrt(CAST(v.v AS DOUBLE))) AS BIGINT)
             AS standalone_cost_cents,
           CAST(mg.phi120 // 120 AS BIGINT) AS shapley_cost_cents,
           CAST(({_SHAP_FIXED} + CAST(floor(sqrt(CAST(v.v AS DOUBLE)))
               AS BIGINT) - mg.phi120 // 120) * 1000000
             // ({_SHAP_FIXED} + CAST(floor(sqrt(CAST(v.v AS DOUBLE)))
               AS BIGINT)) AS BIGINT) AS saving_ppm
    FROM vol v
    JOIN marg mg ON mg.rk = v.rk
    JOIN region r ON r.r_regionkey = v.rk
    ORDER BY region
    """,
)
def region_shapley_cost_allocation(spark: SparkSession, sf_dir: str):
    """Exact Shapley-value cost allocation among the five regions
    sharing a concave logistics cost c(S) = FIXED + floor(sqrt(total
    volume of S)) — the game-theoretic fair split (unlike the
    heuristic touchpoint version in events_shapley_channel_attribution
    this is the EXACT value, 2^5 coalitions enumerated): each region
    pays its average marginal cost over all join orders, weighted
    |S|!(n-|S|-1)!/n!, kept integer by working in 120ths. One fact
    aggregate produces 5 regional volumes; everything after is the
    32-row coalition lattice (bit-mask membership, bit_count weights)
    — constant work at any data size. The saving vs standalone cost
    shows the concavity dividend each region captures."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    vol = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("rk"))
        .agg(
            F.sum((dec("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    # 5 regional totals feed a 32-row coalition lattice; persist so the
    # three downstream joins replay 5 cached rows, not 3 fact aggregates
    vol = vol.persist()
    masks = spark.range(0, 32).select(F.col("id").alias("m"))
    coal = (
        masks.crossJoin(vol)
        .groupBy("m")
        .agg(
            F.expr(
                f"CAST({_SHAP_FIXED}"
                " + floor(sqrt(CAST(COALESCE(SUM(CASE"
                " WHEN (m >> CAST(rk AS INT)) & 1 = 1 THEN v END), 0)"
                " AS DOUBLE))) AS BIGINT)"
            ).alias("cost")
        )
    )
    s = coal.select(F.col("m").alias("sm"), F.col("cost").alias("sc"))
    si = coal.select(
        F.col("m").alias("sim"), F.col("cost").alias("sic")
    )
    marg = (
        vol.select("rk")
        .join(s, F.expr("(sm >> CAST(rk AS INT)) & 1 = 0"))
        .join(si, F.expr("sim = sm + (1 << CAST(rk AS INT))"))
        .groupBy("rk")
        .agg(
            F.expr(
                f"CAST(SUM({_shap_wcase('bit_count(sm)')}"
                " * (sic - sc)) AS BIGINT)"
            ).alias("phi120")
        )
    )
    alone = (
        f"CAST({_SHAP_FIXED} + floor(sqrt(CAST(v AS DOUBLE)))"
        " AS BIGINT)"
    )
    return (
        vol.join(marg, "rk")
        .join(F.broadcast(r), vol.rk == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("v").alias("volume_cents"),
            F.expr(alone).alias("standalone_cost_cents"),
            F.expr("CAST(phi120 div 120 AS BIGINT)").alias(
                "shapley_cost_cents"
            ),
            F.expr(
                f"CAST(({alone} - phi120 div 120) * 1000000"
                f" div {alone} AS BIGINT)"
            ).alias("saving_ppm"),
        )
        .orderBy("region")
    )


# ------------------------------------------------------------------
# 3. orders_trend_newey_west_se — HAC-robust trend inference
# ------------------------------------------------------------------


@register(
    "orders_trend_newey_west_se",
    """
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    tt AS (
      SELECT ym - (SELECT MIN(ym) FROM m) AS x, y FROM m),
    g AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM tt),
    ab AS (
      SELECT n, sx,
             (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
               AS b_micro,
             (sy * 1000000 - ((n * sxy - sx * sy) * 1000000
               // (n * sxx - sx * sx)) * sx) // n AS a_micro
      FROM g),
    res AS (
      SELECT tt.x,
             tt.x * (SELECT CAST(n AS BIGINT) FROM ab)
               - (SELECT CAST(sx AS BIGINT) FROM ab) AS xc,
             (CAST(tt.y AS HUGEINT) * 1000000 - (SELECT a_micro FROM ab)
               - (SELECT b_micro FROM ab) * tt.x) // 1000000 AS e
      FROM tt),
    lagd AS (
      SELECT a.xc, a.e, b.xc AS xc1, b.e AS e1
      FROM res a LEFT JOIN res b ON b.x = a.x - 1),
    acc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
             SUM(CAST(xc AS HUGEINT) * xc) AS sxx_c,
             SUM(CAST(e AS HUGEINT) * e) AS see,
             SUM(CAST(xc AS HUGEINT) * e * xc * e) AS s_he,
             SUM(CASE WHEN xc1 IS NOT NULL
                 THEN CAST(xc AS HUGEINT) * e * xc1 * e1 END) AS s_lag
      FROM lagd)
    SELECT n_months,
           (SELECT CAST(b_micro AS BIGINT) FROM ab) AS slope_micro,
           CAST(round(1e6 * sqrt(CAST(see AS DOUBLE)
             / (n_months - 2) / CAST(sxx_c AS DOUBLE)
             * n_months * n_months)) AS BIGINT) AS se_ols_micro,
           CAST(round(1e6 * sqrt((CAST(s_he AS DOUBLE)
             + 2 * 0.5 * CAST(s_lag AS DOUBLE))
             * n_months * n_months
             / (CAST(sxx_c AS DOUBLE) * CAST(sxx_c AS DOUBLE))))
             AS BIGINT) AS se_nw_micro
    FROM acc
    """,
)
def orders_trend_newey_west_se(spark: SparkSession, sf_dir: str):
    """Newey-West HAC standard error for the monthly revenue trend
    slope — the inference companion to lineitem_breusch_pagan_test:
    where BP flags heteroskedasticity, NW(1) produces standard errors
    robust to BOTH heteroskedasticity and lag-1 autocorrelation
    (Bartlett weight w1 = 1/2), reported next to the classical OLS
    SE so the correction is visible. Slope/intercept come from exact
    integer moments; residuals and centered regressors stay integer
    on the bounded month grain (centering by n*x - sx avoids a
    mean division); the meat terms sum in HUGEINT/decimal(38,0),
    and doubles enter once in the final two sqrt expressions from
    identically-reduced integers. One fact scan; the lag join is
    calendar-bounded. Note the centered-x scaling: xc = n*x - sx,
    so SEs rescale by n*n inside the sqrt — exact in both engines."""
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
    mn = m.agg(F.min("ym").alias("m0"))
    tt = m.crossJoin(F.broadcast(mn)).select(
        (F.col("ym") - F.col("m0")).alias("x"), "y"
    )
    g = tt.agg(
        F.count("*").cast(big).alias("n"),
        F.sum("x").cast(big).alias("sx"),
        F.sum("y").cast(big).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(big).alias("sxx"),
        F.sum(F.col("x").cast(big) * F.col("y")).alias("sxy"),
    )
    ab = g.select(
        "n",
        "sx",
        F.expr(
            "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
        ).alias("b_micro"),
        F.expr(
            "(sy * 1000000 - ((n * sxy - sx * sy) * 1000000"
            " div (n * sxx - sx * sx)) * sx) div n"
        ).alias("a_micro"),
    )
    res = tt.crossJoin(F.broadcast(ab)).select(
        "x",
        F.expr(
            "x * CAST(n AS BIGINT) - CAST(sx AS BIGINT)"
        ).alias("xc"),
        F.expr(
            "(CAST(y AS DECIMAL(38,0)) * 1000000 - a_micro"
            " - b_micro * x) div 1000000"
        ).alias("e"),
    )
    lag = res.select(
        (F.col("x") + 1).alias("x"),
        F.col("xc").alias("xc1"),
        F.col("e").alias("e1"),
    )
    lagd = res.join(lag, "x", "left")
    acc = lagd.agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.sum(F.col("xc").cast(big) * F.col("xc")).alias("sxx_c"),
        F.sum(F.col("e").cast(big) * F.col("e")).alias("see"),
        F.sum(
            F.col("xc").cast(big)
            * F.col("e")
            * F.col("xc")
            * F.col("e")
        ).alias("s_he"),
        F.sum(
            F.when(
                F.col("xc1").isNotNull(),
                F.col("xc").cast(big)
                * F.col("e")
                * F.col("xc1")
                * F.col("e1"),
            )
        ).alias("s_lag"),
    )
    slope = ab.select(
        F.expr("CAST(b_micro AS BIGINT)").alias("slope_micro")
    )
    return acc.crossJoin(F.broadcast(slope)).select(
        "n_months",
        "slope_micro",
        F.expr(
            "CAST(round(1e6 * sqrt(CAST(see AS DOUBLE)"
            " / (n_months - 2) / CAST(sxx_c AS DOUBLE)"
            " * n_months * n_months)) AS BIGINT)"
        ).alias("se_ols_micro"),
        F.expr(
            "CAST(round(1e6 * sqrt((CAST(s_he AS DOUBLE)"
            " + 2 * 0.5 * CAST(s_lag AS DOUBLE))"
            " * n_months * n_months"
            " / (CAST(sxx_c AS DOUBLE) * CAST(sxx_c AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("se_nw_micro"),
    )


# ------------------------------------------------------------------
# 4. events_user_sequence_surprisal — behavioral anomaly score
# ------------------------------------------------------------------

_SURP_MIN_TRANS = 5
_SURP_K = 20


@register(
    "events_user_sequence_surprisal",
    f"""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t2
      FROM events),
    trans AS (SELECT user_id, t1, t2 FROM seq WHERE t2 IS NOT NULL),
    grid AS (
      SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c,
             SUM(COUNT(*)) OVER (PARTITION BY t1) AS tot
      FROM trans GROUP BY 1, 2),
    w AS (
      SELECT t1, t2,
             CAST(round(1e6 * ln(CAST(tot AS DOUBLE) / c)) AS BIGINT)
               AS surp
      FROM grid),
    peruser AS (
      SELECT tr.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_transitions,
             CAST(SUM(w.surp) // COUNT(*) AS BIGINT)
               AS mean_surprisal_micro
      FROM trans tr JOIN w ON w.t1 = tr.t1 AND w.t2 = tr.t2
      GROUP BY 1
      HAVING COUNT(*) >= {_SURP_MIN_TRANS})
    SELECT user_id, n_transitions, mean_surprisal_micro
    FROM peruser
    ORDER BY mean_surprisal_micro DESC, user_id
    LIMIT {_SURP_K}
    """,
)
def events_user_sequence_surprisal(spark: SparkSession, sf_dir: str):
    """Behavioral anomaly scoring by sequence surprisal: each user's
    event transitions are scored against the GLOBAL first-order
    transition model (-ln P(next|cur), micro-quantized), and users
    with the highest mean surprisal — paths the population model
    finds most improbable — surface for review (bot/fraud triage;
    the sequence-level complement to the Viterbi decoder's latent
    state). One fact-grain sequence window feeds both the bounded
    |event_types|^2 model grid and the per-user join; the grid
    BROADCASTS back, the per-user mean is one hash aggregate, and
    users below {_SURP_MIN_TRANS} transitions drop (mean of a
    near-empty sequence is noise). Top-{_SURP_K} via orderBy+limit."""
    e = t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "user_id",
            F.col("event_type").alias("t1"),
            F.lead("event_type").over(wseq).alias("t2"),
        )
        .filter(F.col("t2").isNotNull())
    )
    grid = trans.groupBy("t1", "t2").agg(
        F.count("*").cast("bigint").alias("c")
    )
    grid = grid.select(
        "t1",
        "t2",
        "c",
        F.sum("c").over(Window.partitionBy("t1")).alias("tot"),
    )
    w = grid.select(
        "t1",
        "t2",
        F.expr(
            "CAST(round(1e6 * ln(CAST(tot AS DOUBLE) / c)) AS BIGINT)"
        ).alias("surp"),
    )
    peruser = (
        trans.join(F.broadcast(w), ["t1", "t2"])
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.expr(
                "CAST(SUM(surp) div COUNT(*) AS BIGINT)"
            ).alias("mean_surprisal_micro"),
        )
        .filter(F.col("n_transitions") >= _SURP_MIN_TRANS)
    )
    return peruser.orderBy(
        F.col("mean_surprisal_micro").desc(), "user_id"
    ).limit(_SURP_K)


# ------------------------------------------------------------------
# 5. lineitem_twfe_discount_effect — two-way fixed effects
# ------------------------------------------------------------------

_TWFE_ROUNDS = 6


def _twfe_oracle() -> str:
    steps = []
    for k in range(1, _TWFE_ROUNDS + 1):
        steps.append(
            f"""
    al{k} AS (
      SELECT c.b,
             CAST((SUM(c.sx) * 1000000 - SUM(c.n * g.g))
               // SUM(c.n) AS BIGINT) AS a
      FROM cells c JOIN gm{k - 1} g ON g.m = c.m GROUP BY 1),
    gm{k} AS (
      SELECT c.m,
             CAST((SUM(c.sx) * 1000000 - SUM(c.n * a.a))
               // SUM(c.n) AS BIGINT) AS g
      FROM cells c JOIN al{k} a ON a.b = c.b GROUP BY 1)"""
        )
    return f"""
    WITH cells AS (
      SELECT p.p_brand AS b,
             year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
                 AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS sxy,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
                 AS BIGINT) * CAST(CAST(l_discount AS DECIMAL(12,2))
                 * 100 AS BIGINT)) AS BIGINT) AS sxx
      FROM lineitem JOIN part p ON p.p_partkey = l_partkey
      GROUP BY 1, 2),
    gm0 AS (SELECT DISTINCT m, CAST(0 AS BIGINT) AS g FROM cells),
    {','.join(steps)},
    fin AS (
      SELECT SUM(CAST(c.sxy AS HUGEINT) * 1000000
               - CAST(a.a + g.g AS HUGEINT) * c.sy) AS num,
             SUM(CAST(c.sxx AS HUGEINT) * 1000000
               - CAST(a.a + g.g AS HUGEINT) * c.sx) AS den,
             SUM(CAST(c.n AS HUGEINT)) AS n,
             SUM(CAST(c.sx AS HUGEINT)) AS sxt,
             SUM(CAST(c.sy AS HUGEINT)) AS syt,
             SUM(CAST(c.sxy AS HUGEINT)) AS sxyt,
             SUM(CAST(c.sxx AS HUGEINT)) AS sxxt,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM cells c
      JOIN al{_TWFE_ROUNDS} a ON a.b = c.b
      JOIN gm{_TWFE_ROUNDS} g ON g.m = c.m)
    SELECT CAST(n AS BIGINT) AS n_rows, n_cells,
           CAST(num * 1000000 // den AS BIGINT) AS beta_twfe_micro,
           CAST((n * sxyt - sxt * syt) * 1000000
             // (n * sxxt - sxt * sxt) AS BIGINT) AS beta_pooled_micro
    FROM fin
    """


@register("lineitem_twfe_discount_effect", _twfe_oracle())
def lineitem_twfe_discount_effect(spark: SparkSession, sf_dir: str):
    """Two-way fixed effects (brand + ship-month) estimate of the
    discount->quantity effect — the workhorse panel regression, made
    scale-feasible by two structural moves: (1) the regression runs
    entirely on (brand, month) CELL sufficient statistics (one fact
    scan, ~2k bounded cells), and (2) the two-way projection that has
    no closed form on unbalanced panels is computed by
    {_TWFE_ROUNDS} unrolled ALTERNATING-PROJECTION rounds (Gauss-
    Seidel on the brand/month mean equations, the method of
    alternating projections / 'demeaning ping-pong' used by fixest &
    friends) in exact truncating micro fixed point — identical in
    both engines regardless of convergence distance. The pooled OLS
    slope is emitted alongside: the gap IS the fixed-effects
    confounding correction. The cell table persists so the rounds
    replay a 2k-row cache, not {_TWFE_ROUNDS * 2} fact aggregates."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    d100 = (dec("l_discount") * 100).cast("bigint")
    q = F.col("l_quantity").cast("bigint")
    cells = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("b"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias(
                "m"
            ),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(d100).cast("bigint").alias("sx"),
            F.sum(q).cast("bigint").alias("sy"),
            F.sum(d100 * q).cast("bigint").alias("sxy"),
            F.sum(d100 * d100).cast("bigint").alias("sxx"),
        )
    )
    cells = cells.persist()
    gm = cells.select("m").distinct().withColumn(
        "g", F.lit(0).cast("bigint")
    )
    for _ in range(_TWFE_ROUNDS):
        al = (
            cells.join(gm, "m")
            .groupBy("b")
            .agg(
                F.expr(
                    "CAST((SUM(sx) * 1000000 - SUM(n * g))"
                    " div SUM(n) AS BIGINT)"
                ).alias("a")
            )
        )
        gm = (
            cells.join(al, "b")
            .groupBy("m")
            .agg(
                F.expr(
                    "CAST((SUM(sx) * 1000000 - SUM(n * a))"
                    " div SUM(n) AS BIGINT)"
                ).alias("g")
            )
        )
    big = "decimal(38,0)"
    fin = (
        cells.join(al, "b")
        .join(gm, "m")
        .agg(
            F.sum(
                F.col("sxy").cast(big) * 1000000
                - (F.col("a") + F.col("g")).cast(big) * F.col("sy")
            ).alias("num"),
            F.sum(
                F.col("sxx").cast(big) * 1000000
                - (F.col("a") + F.col("g")).cast(big) * F.col("sx")
            ).alias("den"),
            F.sum(F.col("n").cast(big)).alias("n"),
            F.sum(F.col("sx").cast(big)).alias("sxt"),
            F.sum(F.col("sy").cast(big)).alias("syt"),
            F.sum(F.col("sxy").cast(big)).alias("sxyt"),
            F.sum(F.col("sxx").cast(big)).alias("sxxt"),
            F.count("*").cast("bigint").alias("n_cells"),
        )
    )
    return fin.select(
        F.expr("CAST(n AS BIGINT)").alias("n_rows"),
        "n_cells",
        F.expr("CAST(num * 1000000 div den AS BIGINT)").alias(
            "beta_twfe_micro"
        ),
        F.expr(
            "CAST((n * sxyt - sxt * syt) * 1000000"
            " div (n * sxxt - sxt * sxt) AS BIGINT)"
        ).alias("beta_pooled_micro"),
    )


# ------------------------------------------------------------------
# 6. lineitem_oaxaca_blinder_gap — outcome-gap decomposition
# ------------------------------------------------------------------


@register(
    "lineitem_oaxaca_blinder_gap",
    """
    WITH g AS (
      SELECT l_returnflag AS grp,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sy,
             SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
                 AS HUGEINT) * CAST(l_quantity AS BIGINT)) AS sxy,
             SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
                 AS HUGEINT) * CAST(CAST(l_discount AS DECIMAL(12,2))
                 * 100 AS BIGINT)) AS sxx
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
    fit AS (
      SELECT grp,
             CAST(n AS BIGINT) AS n_rows,
             sy * 1000000 // n AS ybar_micro,
             sx * 1000000 // n AS xbar_micro,
             (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
               AS b_micro,
             (sy * 1000000 - ((n * sxy - sx * sy) * 1000000
               // (n * sxx - sx * sx)) * sx) // n AS a_micro
      FROM g),
    wide AS (
      SELECT MAX(CASE WHEN grp = 'R' THEN n_rows END) AS n_r,
             MAX(CASE WHEN grp = 'N' THEN n_rows END) AS n_n,
             MAX(CASE WHEN grp = 'R' THEN ybar_micro END) AS ybar_r,
             MAX(CASE WHEN grp = 'N' THEN ybar_micro END) AS ybar_n,
             MAX(CASE WHEN grp = 'R' THEN xbar_micro END) AS xbar_r,
             MAX(CASE WHEN grp = 'N' THEN xbar_micro END) AS xbar_n,
             MAX(CASE WHEN grp = 'R' THEN b_micro END) AS b_r,
             MAX(CASE WHEN grp = 'N' THEN b_micro END) AS b_n
      FROM fit)
    SELECT CAST(n_r AS BIGINT) AS n_returned,
           CAST(n_n AS BIGINT) AS n_kept,
           CAST(ybar_r - ybar_n AS BIGINT) AS gap_micro,
           CAST((xbar_r - xbar_n) * b_n // 1000000 AS BIGINT)
             AS explained_micro,
           CAST((ybar_r - ybar_n)
             - ((xbar_r - xbar_n) * b_n // 1000000) AS BIGINT)
             AS unexplained_micro
    FROM wide
    """,
)
def lineitem_oaxaca_blinder_gap(spark: SparkSession, sf_dir: str):
    """Oaxaca-Blinder decomposition of the quantity gap between
    returned (R) and kept (N) line items: how much of the mean
    difference is EXPLAINED by the groups' different discount
    exposure (endowments, priced at the N-group coefficient) versus
    UNEXPLAINED (different response structure) — the canonical
    audit for 'is this outcome gap composition or behavior?'. Both
    group regressions run on one conditional-aggregation pass (the
    lineitem_anova_two_way single-row pivot pattern, so an empty
    group surfaces as NULL identically in both engines); exact
    integer micro fixed point with the unexplained term computed as
    gap - explained, so the decomposition identity holds EXACTLY by
    construction. One fact scan, then constant work."""
    li = t(spark, sf_dir, "lineitem")
    big = "decimal(38,0)"
    d100 = (dec("l_discount") * 100).cast("bigint")
    q = F.col("l_quantity").cast("bigint")
    g = (
        li.filter(F.col("l_returnflag").isin("R", "N"))
        .groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.count("*").cast(big).alias("n"),
            F.sum(d100).cast(big).alias("sx"),
            F.sum(q).cast(big).alias("sy"),
            F.sum(d100.cast(big) * q).alias("sxy"),
            F.sum(d100.cast(big) * d100).alias("sxx"),
        )
    )
    fit = g.select(
        "grp",
        F.expr("CAST(n AS BIGINT)").alias("n_rows"),
        F.expr("sy * 1000000 div n").alias("ybar_micro"),
        F.expr("sx * 1000000 div n").alias("xbar_micro"),
        F.expr(
            "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
        ).alias("b_micro"),
        F.expr(
            "(sy * 1000000 - ((n * sxy - sx * sy) * 1000000"
            " div (n * sxx - sx * sx)) * sx) div n"
        ).alias("a_micro"),
    )
    wide = fit.agg(
        F.max(F.when(F.col("grp") == "R", F.col("n_rows"))).alias(
            "n_r"
        ),
        F.max(F.when(F.col("grp") == "N", F.col("n_rows"))).alias(
            "n_n"
        ),
        F.max(F.when(F.col("grp") == "R", F.col("ybar_micro"))).alias(
            "ybar_r"
        ),
        F.max(F.when(F.col("grp") == "N", F.col("ybar_micro"))).alias(
            "ybar_n"
        ),
        F.max(F.when(F.col("grp") == "R", F.col("xbar_micro"))).alias(
            "xbar_r"
        ),
        F.max(F.when(F.col("grp") == "N", F.col("xbar_micro"))).alias(
            "xbar_n"
        ),
        F.max(F.when(F.col("grp") == "R", F.col("b_micro"))).alias(
            "b_r"
        ),
        F.max(F.when(F.col("grp") == "N", F.col("b_micro"))).alias(
            "b_n"
        ),
    )
    return wide.select(
        F.expr("CAST(n_r AS BIGINT)").alias("n_returned"),
        F.expr("CAST(n_n AS BIGINT)").alias("n_kept"),
        F.expr("CAST(ybar_r - ybar_n AS BIGINT)").alias("gap_micro"),
        F.expr(
            "CAST((xbar_r - xbar_n) * b_n div 1000000 AS BIGINT)"
        ).alias("explained_micro"),
        F.expr(
            "CAST((ybar_r - ybar_n)"
            " - ((xbar_r - xbar_n) * b_n div 1000000) AS BIGINT)"
        ).alias("unexplained_micro"),
    )
