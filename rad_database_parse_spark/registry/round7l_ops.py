"""Round-7l operators: Markov removal-effect attribution, a
Breusch-Pagan heteroskedasticity test, an (s,S) inventory-policy
simulation fold, pinball-loss quantile-forecast evaluation, a Leontief
input-requirement cascade, and a GROUP BY ALL SQL-surface check.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. events_markov_removal_attribution — absorbing-chain attribution
# ------------------------------------------------------------------

_MRK_CHANNELS = ("click", "error", "signup", "view")
_MRK_ITERS = 12


def _mrk_oracle() -> str:
    scen_vals = ", ".join(
        f"('{s}')" for s in ("base",) + _MRK_CHANNELS
    )
    steps = []
    for k in range(1, _MRK_ITERS + 1):
        steps.append(
            f"""
    p{k} AS (
      SELECT t.scenario, t.f AS state,
             CAST(SUM(t.prob_ppb * p.p) // 1000000000 AS BIGINT) AS p
      FROM strans t JOIN p{k - 1} p
        ON p.scenario = t.scenario AND p.state = t.t2
      GROUP BY 1, 2
      UNION ALL SELECT name, 'purchase', CAST(1000000 AS BIGINT) FROM scen
      UNION ALL SELECT name, 'end', CAST(0 AS BIGINT) FROM scen)"""
        )
    return f"""
    WITH scen(name) AS (VALUES {scen_vals}),
    seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    raw AS (
      SELECT event_type AS f, COALESCE(nxt, 'end') AS t,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE event_type != 'purchase' GROUP BY 1, 2),
    strans AS (
      SELECT scenario, f, t2,
             cnt * 1000000000
               // SUM(cnt) OVER (PARTITION BY scenario, f) AS prob_ppb
      FROM (
        SELECT s.name AS scenario, r.f,
               CASE WHEN r.t = s.name THEN 'end' ELSE r.t END AS t2,
               SUM(r.cnt) AS cnt
        FROM raw r CROSS JOIN scen s GROUP BY 1, 2, 3)),
    firsts AS (
      SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE rn = 1 GROUP BY 1),
    sstart AS (
      SELECT scenario, t2,
             cnt * 1000000000
               // SUM(cnt) OVER (PARTITION BY scenario) AS prob_ppb
      FROM (
        SELECT s.name AS scenario,
               CASE WHEN fi.t = s.name THEN 'end' ELSE fi.t END AS t2,
               SUM(fi.cnt) AS cnt
        FROM firsts fi CROSS JOIN scen s GROUP BY 1, 2)),
    p0 AS (
      SELECT DISTINCT scenario, f AS state, CAST(0 AS BIGINT) AS p
      FROM strans
      UNION ALL SELECT name, 'purchase', CAST(1000000 AS BIGINT) FROM scen
      UNION ALL SELECT name, 'end', CAST(0 AS BIGINT) FROM scen),
    {','.join(steps)},
    conv AS (
      SELECT s.scenario,
             CAST(SUM(s.prob_ppb * p.p) // 1000000000 AS BIGINT)
               AS conv_micro
      FROM sstart s JOIN p{_MRK_ITERS} p
        ON p.scenario = s.scenario AND p.state = s.t2
      GROUP BY 1),
    eff AS (
      SELECT c.scenario AS channel,
             b.conv_micro AS conv_base_micro,
             c.conv_micro AS conv_removed_micro,
             b.conv_micro - c.conv_micro AS removal_effect_micro
      FROM conv c CROSS JOIN (SELECT conv_micro FROM conv
                              WHERE scenario = 'base') b
      WHERE c.scenario != 'base')
    SELECT channel, conv_base_micro, conv_removed_micro,
           removal_effect_micro,
           CAST(removal_effect_micro * 1000000
             // GREATEST(SUM(removal_effect_micro) OVER (), 1)
             AS BIGINT) AS attribution_share_ppm
    FROM eff ORDER BY channel
    """


@register("events_markov_removal_attribution", _mrk_oracle())
def events_markov_removal_attribution(spark: SparkSession, sf_dir: str):
    """Markov removal-effect channel attribution (Anderl et al.'s
    data-driven alternative to last-touch / Shapley, both already in
    the tier): build the first-order transition graph of user event
    sequences with 'purchase' absorbing and 'end' the null sink, then
    for each channel ask what the conversion probability becomes when
    every path through that channel dies (edges INTO the channel
    redirect to 'end') — the drop is the channel's removal effect, and
    normalized effects are the attribution shares. Absorption
    probabilities come from value-iteration rounds in exact truncating
    ppb/micro fixed point, identical in both engines regardless of
    convergence. Scale shape: the ONLY fact-grain work is the user
    sequence window + the transition/first-touch aggregates; those
    collapse to at most |event_types|^2 + |event_types| rows (a few
    dozen — bounded by the event vocabulary, independent of data
    volume), which are collect()ed and folded through the
    {_MRK_ITERS} iterations driver-side in exact Python ints. At
    100 TB this is one shuffle + an O(1) collect — the distributed
    alternative (12 unrolled joins over a 30-row table) re-plans the
    fact lineage per iteration for zero parallelism gain (measured
    214s vs ~4s at sf0.01)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    raw = (
        seq.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("f"),
            F.coalesce("nxt", F.lit("end")).alias("to"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    firsts = (
        seq.filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("to"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # Bounded collects: |event_types|^2 and |event_types| rows.
    raw_rows = [(r["f"], r["to"], r["cnt"]) for r in raw.collect()]
    first_rows = [(r["to"], r["cnt"]) for r in firsts.collect()]

    def tdiv(a: int, b: int) -> int:
        # truncate-toward-zero, matching Spark `div` / DuckDB `//`
        # on the nonnegative operands this chain produces
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    out = []
    for scenario in ("base",) + _MRK_CHANNELS:
        # redirect edges INTO the removed channel to 'end', regroup
        trans: dict[tuple[str, str], int] = {}
        for f, to, cnt in raw_rows:
            t2 = "end" if to == scenario else to
            trans[(f, t2)] = trans.get((f, t2), 0) + cnt
        tot: dict[str, int] = {}
        for (f, _), cnt in trans.items():
            tot[f] = tot.get(f, 0) + cnt
        prob = {
            k: tdiv(cnt * 1_000_000_000, tot[k[0]])
            for k, cnt in trans.items()
        }
        start: dict[str, int] = {}
        for to, cnt in first_rows:
            t2 = "end" if to == scenario else to
            start[t2] = start.get(t2, 0) + cnt
        stot = sum(start.values())
        sprob = {
            t2: tdiv(cnt * 1_000_000_000, stot)
            for t2, cnt in start.items()
        }
        p = {f: 0 for f in tot}
        p["purchase"], p["end"] = 1_000_000, 0
        for _ in range(_MRK_ITERS):
            pn = {
                f: tdiv(
                    sum(
                        pr * p[t2]
                        for (ff, t2), pr in prob.items()
                        if ff == f and t2 in p
                    ),
                    1_000_000_000,
                )
                for f in tot
            }
            p = {**pn, "purchase": 1_000_000, "end": 0}
        conv = tdiv(
            sum(pr * p[t2] for t2, pr in sprob.items() if t2 in p),
            1_000_000_000,
        )
        out.append((scenario, conv))

    base = next(c for s, c in out if s == "base")
    effs = [(s, base, c, base - c) for s, c in out if s != "base"]
    denom = max(sum(e for _, _, _, e in effs), 1)
    rows = [
        (ch, b, c, e, tdiv(e * 1_000_000, denom))
        for ch, b, c, e in sorted(effs)
    ]
    return spark.createDataFrame(
        rows,
        "channel string, conv_base_micro bigint,"
        " conv_removed_micro bigint, removal_effect_micro bigint,"
        " attribution_share_ppm bigint",
    )


# ------------------------------------------------------------------
# 2. lineitem_breusch_pagan_test — heteroskedasticity check
# ------------------------------------------------------------------


@register(
    "lineitem_breusch_pagan_test",
    """
    WITH cells AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d,
             CAST(COUNT(*) AS HUGEINT) AS nd,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sy2,
             SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS sy3,
             SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS sy4
      FROM lineitem GROUP BY 1),
    g AS (
      SELECT SUM(nd) AS n, SUM(nd * d) AS sx, SUM(sy) AS syt,
             SUM(nd * d * d) AS sxx, SUM(d * sy) AS sxy
      FROM cells),
    ab AS (
      SELECT n, sx, sxx,
             (n * sxy - sx * syt) * 1000000 // (n * sxx - sx * sx)
               AS b_micro,
             (syt * 1000000 - ((n * sxy - sx * syt) * 1000000
               // (n * sxx - sx * sx)) * sx) // n AS a_micro
      FROM g),
    z AS (
      SELECT c.d, c.nd,
             (c.sy2 * 1000000000000
              - 2 * (ab.a_micro + ab.b_micro * c.d) * c.sy * 1000000
              + c.nd * (ab.a_micro + ab.b_micro * c.d)
                     * (ab.a_micro + ab.b_micro * c.d)) // 1000000
               AS zd,
             (c.sy4 * 1000000000000000000
              - 4 * c.sy3 * (ab.a_micro + ab.b_micro * c.d)
                  * 1000000000000
              + 6 * c.sy2 * (ab.a_micro + ab.b_micro * c.d)
                  * (ab.a_micro + ab.b_micro * c.d) * 1000000
              + c.sy * (-4) * (ab.a_micro + ab.b_micro * c.d)
                  * (ab.a_micro + ab.b_micro * c.d)
                  * (ab.a_micro + ab.b_micro * c.d)
              + c.nd * ((ab.a_micro + ab.b_micro * c.d)
                        * (ab.a_micro + ab.b_micro * c.d) // 1000000)
                     * ((ab.a_micro + ab.b_micro * c.d)
                        * (ab.a_micro + ab.b_micro * c.d) // 1000000))
               // 1000000000000 AS zzd
      FROM cells c CROSS JOIN ab),
    aux AS (
      SELECT ab.n, ab.sx, ab.sxx,
             SUM(z.zd) AS sz, SUM(z.d * z.zd) AS sxz, SUM(z.zzd) AS szz
      FROM z CROSS JOIN ab GROUP BY 1, 2, 3),
    red AS (
      SELECT CAST(n AS BIGINT) AS n_obs,
             CAST((n * sxz - sx * sz) // 1000000 AS BIGINT) AS covxz,
             CAST(n * sxx - sx * sx AS BIGINT) AS varx,
             CAST((n * szz - sz * sz) // 1000000000000 AS BIGINT)
               AS varz
      FROM aux)
    SELECT n_obs,
           CAST(round(1e9 * CAST(covxz AS DOUBLE) * covxz
                / (CAST(varx AS DOUBLE) * varz)) AS BIGINT) AS aux_r2_ppb,
           CAST(round(n_obs * 1e6 * CAST(covxz AS DOUBLE) * covxz
                / (CAST(varx AS DOUBLE) * varz)) AS BIGINT)
             AS bp_lm_micro,
           CAST(CASE WHEN n_obs * CAST(covxz AS DOUBLE) * covxz
                / (CAST(varx AS DOUBLE) * varz) > 3.841 THEN 1 ELSE 0 END
             AS INT) AS heteroskedastic_5pct
    FROM red
    """,
)
def lineitem_breusch_pagan_test(spark: SparkSession, sf_dir: str):
    """Breusch-Pagan heteroskedasticity test on the discount->quantity
    regression (lineitem_discount_qty_ols's error structure): squared
    residuals are regressed back on the regressor and LM = n * R^2 is
    chi-square(1) under homoskedasticity — the diagnostic that says
    whether the OLS tier's standard errors can be trusted. The whole
    test runs on CELL-LEVEL sufficient statistics: discount has 11
    values, so per-cell moments of quantity up to the FOURTH power
    (needed for the residual-squared variance) reconstruct every
    row-level sum exactly — the fact table is scanned once, the test
    is an 11-row fold. Fixed-point micro slope/intercept, staged
    integer reductions keep every intermediate inside decimal(38,0)/
    HUGEINT (documented bound: holds beyond sf100), doubles only in
    the final R^2 ratio on identically-reduced integers."""
    l = t(spark, sf_dir, "lineitem")
    big = "decimal(38,0)"
    q = F.col("l_quantity").cast("bigint")
    cells = l.groupBy(
        (dec("l_discount") * 100).cast("bigint").alias("d")
    ).agg(
        F.count("*").cast(big).alias("nd"),
        F.sum(q).cast(big).alias("sy"),
        F.sum((q * q).cast(big)).alias("sy2"),
        F.sum((q.cast(big) * q * q).cast(big)).alias("sy3"),
        F.sum((q.cast(big) * q * q * q).cast(big)).alias("sy4"),
    )
    g = cells.agg(
        F.sum("nd").alias("n"),
        F.sum(F.col("nd") * F.col("d")).alias("sx"),
        F.sum("sy").alias("syt"),
        F.sum(F.col("nd") * F.col("d") * F.col("d")).alias("sxx"),
        F.sum(F.col("d") * F.col("sy")).alias("sxy"),
    )
    ab = g.select(
        "n",
        "sx",
        "sxx",
        F.expr(
            "(n * sxy - sx * syt) * 1000000 div (n * sxx - sx * sx)"
        ).alias("b_micro"),
        F.expr(
            "(syt * 1000000 - ((n * sxy - sx * syt) * 1000000"
            " div (n * sxx - sx * sx)) * sx) div n"
        ).alias("a_micro"),
    )
    fit = "(a_micro + b_micro * d)"
    z = cells.crossJoin(F.broadcast(ab)).select(
        "d",
        "nd",
        F.expr(
            f"(sy2 * 1000000000000 - 2 * {fit} * sy * 1000000"
            f" + nd * {fit} * {fit}) div 1000000"
        ).alias("zd"),
        F.expr(
            f"(sy4 * 1000000000000000000"
            f" - 4 * sy3 * {fit} * 1000000000000"
            f" + 6 * sy2 * {fit} * {fit} * 1000000"
            f" + sy * (-4) * {fit} * {fit} * {fit}"
            f" + nd * ({fit} * {fit} div 1000000)"
            f"      * ({fit} * {fit} div 1000000)) div 1000000000000"
        ).alias("zzd"),
    )
    # zd/zzd land as BIGINT (div output); sum them into decimal(38,0)
    # so the n*szz - sz*sz style cross terms below stay exact where
    # int64 would overflow (DuckDB's SUM(BIGINT) widens to HUGEINT —
    # this is the Spark mirror of that widening).
    aux = z.crossJoin(F.broadcast(ab)).groupBy("n", "sx", "sxx").agg(
        F.sum(F.col("zd").cast(big)).alias("sz"),
        F.sum(F.col("d") * F.col("zd").cast(big)).alias("sxz"),
        F.sum(F.col("zzd").cast(big)).alias("szz"),
    )
    red = aux.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.expr("CAST((n * sxz - sx * sz) div 1000000 AS BIGINT)").alias(
            "covxz"
        ),
        F.expr("CAST(n * sxx - sx * sx AS BIGINT)").alias("varx"),
        F.expr(
            "CAST((n * szz - sz * sz) div 1000000000000 AS BIGINT)"
        ).alias("varz"),
    )
    r2 = (
        "CAST(covxz AS DOUBLE) * covxz"
        " / (CAST(varx AS DOUBLE) * varz)"
    )
    return red.select(
        "n_obs",
        F.expr(f"CAST(round(1e9 * {r2}) AS BIGINT)").alias(
            "aux_r2_ppb"
        ),
        F.expr(f"CAST(round(n_obs * 1e6 * {r2}) AS BIGINT)").alias(
            "bp_lm_micro"
        ),
        F.expr(
            f"CAST(CASE WHEN n_obs * {r2} > 3.841 THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("heteroskedastic_5pct"),
    )


# ------------------------------------------------------------------
# 3. part_ss_inventory_policy_sim — (s,S) policy fold per brand
# ------------------------------------------------------------------


def _ss_step_spark() -> str:
    # acc = [on_hand, n_repl, stockouts, total_ordered]; x = demand
    oh = "(acc[0] - x)"
    return (
        "aggregate(ms, array(cap_s, CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
        " CAST(0 AS BIGINT)), "
        f"(acc, x) -> IF({oh} <= lvl_s, "
        f" array(cap_s, acc[1] + 1,"
        f"  acc[2] + IF({oh} < 0, 1, 0),"
        f"  acc[3] + (cap_s - {oh})), "
        f" array({oh}, acc[1],"
        f"  acc[2] + IF({oh} < 0, 1, 0), acc[3])))"
    )


def _ss_step_duck() -> str:
    # duckdb 1-based; init prepended as first element
    oh = "(acc[1] - e[1])"
    return (
        "list_reduce(list_prepend([cap_s, 0, 0, 0],"
        " list_transform(ms, x -> [x, CAST(0 AS BIGINT), 0, 0])), "
        f"(acc, e) -> CASE WHEN {oh} <= lvl_s THEN "
        f" [cap_s, acc[2] + 1,"
        f"  acc[3] + CASE WHEN {oh} < 0 THEN 1 ELSE 0 END,"
        f"  acc[4] + (cap_s - {oh})] "
        f"ELSE [{oh}, acc[2],"
        f"  acc[3] + CASE WHEN {oh} < 0 THEN 1 ELSE 0 END, acc[4]]"
        " END)"
    )


@register(
    "part_ss_inventory_policy_sim",
    f"""
    WITH m AS (
      SELECT p.p_brand,
             year(l_shipdate) * 12 + month(l_shipdate) - 1 AS ym,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dem
      FROM lineitem JOIN part p ON p.p_partkey = l_partkey
      GROUP BY 1, 2),
    series AS (
      SELECT p_brand, list(dem ORDER BY ym) AS ms,
             CAST(SUM(dem) // COUNT(*) AS BIGINT) AS avg_dem,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM m GROUP BY p_brand),
    lv AS (
      SELECT p_brand, ms, n_months, avg_dem AS lvl_s,
             2 * avg_dem AS cap_s
      FROM series),
    folded AS (SELECT p_brand, n_months, lvl_s, cap_s,
                      {_ss_step_duck()} AS st
               FROM lv)
    SELECT p_brand, n_months, lvl_s AS s_level, cap_s AS cap_level,
           CAST(st[1] AS BIGINT) AS final_on_hand,
           CAST(st[2] AS BIGINT) AS n_replenishments,
           CAST(st[3] AS BIGINT) AS stockout_months,
           CAST(st[4] AS BIGINT) AS total_ordered
    FROM folded ORDER BY p_brand
    """,
)
def part_ss_inventory_policy_sim(spark: SparkSession, sf_dir: str):
    """(s,S) inventory-policy simulation per brand — the FOURTH
    distributed-recursion showcase, and the first PER-KEY one: every
    brand's monthly demand series folds through the reorder recurrence
    (draw down, count stockouts, replenish to S when at-or-below s)
    inside one array-HOF aggregate, 25 independent folds in a single
    shuffle-free pass over the brand-grain series table — exactly how
    a 100 TB fleet simulates every SKU's policy at once (the scale
    story orders_holtwinters_additive_fold promises, delivered
    per-key). Policy levels derive from each brand's own mean demand
    (s = mean, S = 2*mean, exact integer division); zero lead time,
    full backorder fill. State and outputs are exact integers — no
    parity concern. Reference cost model: part_type_eoq_plan /
    part_newsvendor_stock_quantile give the static order size; this
    gives the dynamic policy's realized service behavior."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    m = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias(
                "ym"
            ),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("dem")
        )
    )
    series = m.groupBy("p_brand").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ym, dem))),"
            " s -> s.dem)"
        ).alias("ms"),
        F.expr("CAST(SUM(dem) div COUNT(*) AS BIGINT)").alias("avg_dem"),
        F.count("*").cast("bigint").alias("n_months"),
    )
    lv = series.select(
        "p_brand",
        "ms",
        "n_months",
        F.col("avg_dem").alias("lvl_s"),
        (2 * F.col("avg_dem")).alias("cap_s"),
    )
    folded = lv.select(
        "p_brand",
        "n_months",
        "lvl_s",
        "cap_s",
        F.expr(_ss_step_spark()).alias("st"),
    )
    return folded.select(
        "p_brand",
        "n_months",
        F.col("lvl_s").alias("s_level"),
        F.col("cap_s").alias("cap_level"),
        F.expr("CAST(st[0] AS BIGINT)").alias("final_on_hand"),
        F.expr("CAST(st[1] AS BIGINT)").alias("n_replenishments"),
        F.expr("CAST(st[2] AS BIGINT)").alias("stockout_months"),
        F.expr("CAST(st[3] AS BIGINT)").alias("total_ordered"),
    ).orderBy("p_brand")


# ------------------------------------------------------------------
# 4. orders_pinball_loss_eval — quantile-forecast scoring
# ------------------------------------------------------------------


@register(
    "orders_pinball_loss_eval",
    """
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
               AS BIGINT) AS rev
      FROM orders GROUP BY 1),
    j AS (
      SELECT a.ym, a.rev AS y, b.rev AS f50,
             b.rev * 12 // 10 AS f90
      FROM m a JOIN m b ON b.ym = a.ym - 12
      WHERE a.ym >= 1997 * 12),
    l AS (
      SELECT ym, y, f50, f90,
             CASE WHEN y >= f50 THEN 50 * (y - f50) // 100
                  ELSE 50 * (f50 - y) // 100 END AS pb50,
             CASE WHEN y >= f90 THEN 90 * (y - f90) // 100
                  ELSE 10 * (f90 - y) // 100 END AS pb90,
             CASE WHEN y <= f50 THEN 1 ELSE 0 END AS c50,
             CASE WHEN y <= f90 THEN 1 ELSE 0 END AS c90
      FROM j)
    SELECT q_pct, CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(SUM(pb) AS BIGINT) AS total_pinball_cents,
           CAST(SUM(pb) // COUNT(*) AS BIGINT) AS mean_pinball_cents,
           CAST(SUM(cov) AS BIGINT) * 1000000 // COUNT(*)
             AS coverage_ppm
    FROM (
      SELECT 50 AS q_pct, pb50 AS pb, c50 AS cov FROM l
      UNION ALL SELECT 90, pb90, c90 FROM l)
    GROUP BY q_pct ORDER BY q_pct
    """,
)
def orders_pinball_loss_eval(spark: SparkSession, sf_dir: str):
    """Pinball (quantile) loss evaluation of a seasonal-naive monthly
    revenue forecast: the median forecast is last year's month, the
    q90 forecast its 1.2x markup, and each is scored with the
    asymmetric pinball loss — the proper scoring rule for quantile
    forecasts, which orders_forecast_scoreboard_mape's point metrics
    cannot rank (a q90 band should LOSE on MAPE and WIN on pinball@90).
    Empirical coverage sits alongside so the calibration story
    (coverage ~ q) is visible. Month-grain self-join on the 12-month
    lag (calendar-bounded), exact integer cents/ppm arithmetic
    throughout."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "ym"
        )
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    b = m.select(
        (F.col("ym") + 12).alias("ym"), F.col("rev").alias("frev")
    )
    j = (
        m.join(b, "ym")
        .filter(F.col("ym") >= 1997 * 12)
        .select(
            "ym",
            F.col("rev").alias("y"),
            F.col("frev").alias("f50"),
            F.expr("frev * 12 div 10").alias("f90"),
        )
    )
    l50 = j.select(
        F.lit(50).alias("q_pct"),
        F.expr(
            "CASE WHEN y >= f50 THEN 50 * (y - f50) div 100"
            " ELSE 50 * (f50 - y) div 100 END"
        ).alias("pb"),
        F.expr("CASE WHEN y <= f50 THEN 1 ELSE 0 END").alias("cov"),
    )
    l90 = j.select(
        F.lit(90).alias("q_pct"),
        F.expr(
            "CASE WHEN y >= f90 THEN 90 * (y - f90) div 100"
            " ELSE 10 * (f90 - y) div 100 END"
        ).alias("pb"),
        F.expr("CASE WHEN y <= f90 THEN 1 ELSE 0 END").alias("cov"),
    )
    return (
        l50.unionByName(l90)
        .groupBy("q_pct")
        .agg(
            F.count("*").cast("bigint").alias("n_months"),
            F.sum("pb").cast("bigint").alias("total_pinball_cents"),
            F.expr("CAST(SUM(pb) div COUNT(*) AS BIGINT)").alias(
                "mean_pinball_cents"
            ),
            F.expr(
                "CAST(SUM(cov) AS BIGINT) * 1000000 div COUNT(*)"
            ).alias("coverage_ppm"),
        )
        .orderBy("q_pct")
    )


# ------------------------------------------------------------------
# 5. nation_leontief_requirements — input-requirement cascade
# ------------------------------------------------------------------

_LEO_ROUNDS = 4
_LEO_SHARE_DEN = 2  # input share = flow/(2*output): value-added ratio 0.5


def _leo_oracle() -> str:
    steps = []
    for k in range(1, _LEO_ROUNDS + 1):
        steps.append(
            f"""
    v{k} AS (
      SELECT a.i AS j,
             CAST(SUM(CAST(a.a_ppb AS HUGEINT) * v.val)
               // 1000000000 AS BIGINT) AS val
      FROM a JOIN v{k - 1} v ON v.j = a.j GROUP BY 1)"""
        )
    sum_terms = " + ".join(
        f"COALESCE(t{k}.val, 0)" for k in range(1, _LEO_ROUNDS + 1)
    )
    joins = " ".join(
        f"LEFT JOIN v{k} t{k} ON t{k}.j = d.j"
        for k in range(1, _LEO_ROUNDS + 1)
    )
    return f"""
    WITH flows AS (
      SELECT sn.n_nationkey AS i, cn.n_nationkey AS j,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS flow
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      GROUP BY 1, 2),
    outp AS (SELECT j, CAST(SUM(flow) AS BIGINT) AS output
             FROM flows GROUP BY 1),
    a AS (
      SELECT f.i, f.j,
             CAST(CAST(f.flow AS HUGEINT) * 1000000000
               // ({_LEO_SHARE_DEN} * o.output) AS BIGINT) AS a_ppb
      FROM flows f JOIN outp o ON o.j = f.j),
    v0 AS (SELECT j, output AS val FROM outp),
    {','.join(steps)}
    SELECT n.n_name AS nation,
           d.val AS demand_cents,
           d.val + {sum_terms} AS requirement_cents,
           CAST(CAST(d.val + {sum_terms} AS HUGEINT) * 1000000
             // d.val AS BIGINT) AS amplification_ppm
    FROM v0 d {joins}
    JOIN nation n ON n.n_nationkey = d.j
    ORDER BY nation
    """


@register("nation_leontief_requirements", _leo_oracle())
def nation_leontief_requirements(spark: SparkSession, sf_dir: str):
    """Leontief input-requirement cascade over the inter-nation trade
    matrix: technical coefficients a_ij = (supplier-nation-i share of
    customer-nation-j's inbound spend) x 0.5 value-added ratio, and the
    total requirement vector is the truncated Neumann series
    (I + A + ... + A^4) d — how much upstream activity each nation's
    final demand ultimately pulls through the network, the
    input-output-economics member of the graph tier next to pagerank
    (which normalizes the other way). One fact aggregate builds the
    25 x 25 flow matrix; the 4 matrix-vector rounds run on that
    bounded table in exact truncating ppb fixed point — identical in
    both engines, never touching the fact table again. Demand = each
    nation's observed inbound spend, so amplification_ppm reads
    directly as the network multiplier."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
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
            .alias("flow")
        )
    )
    # the nation x nation flow matrix is bounded at 25 x 25 rows but
    # its lineage is the full fact join — persist so the 4 Neumann
    # rounds + demand/output branches replay ~10 tiny joins, not ~10
    # fact-grain aggregates
    flows = flows.persist()
    outp = flows.groupBy("j").agg(
        F.sum("flow").cast("bigint").alias("output")
    )
    a = flows.join(outp, "j").select(
        "i",
        "j",
        F.expr(
            "CAST(CAST(flow AS DECIMAL(38,0)) * 1000000000"
            f" div ({_LEO_SHARE_DEN} * output) AS BIGINT)"
        ).alias("a_ppb"),
    )
    v = outp.select("j", F.col("output").alias("val"))
    d = v
    terms = []
    for _ in range(_LEO_ROUNDS):
        v = (
            a.join(v, "j")
            .groupBy(F.col("i").alias("jj"))
            .agg(
                F.expr(
                    "CAST(SUM(CAST(a_ppb AS DECIMAL(38,0)) * val)"
                    " div 1000000000 AS BIGINT)"
                ).alias("val")
            )
            .withColumnRenamed("jj", "j")
        )
        terms.append(v)
    req = d.select("j", F.col("val").alias("demand_cents"))
    for k, term in enumerate(terms):
        req = req.join(
            term.withColumnRenamed("val", f"t{k}"), "j", "left"
        )
    sum_expr = " + ".join(
        f"COALESCE(t{k}, 0)" for k in range(_LEO_ROUNDS)
    )
    return (
        req.join(F.broadcast(n), req.j == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "demand_cents",
            F.expr(f"demand_cents + {sum_expr}").alias(
                "requirement_cents"
            ),
            F.expr(
                f"CAST(CAST(demand_cents + {sum_expr} AS DECIMAL(38,0))"
                " * 1000000 div demand_cents AS BIGINT)"
            ).alias("amplification_ppm"),
        )
        .orderBy("nation")
    )


# ------------------------------------------------------------------
# 6. sql_group_by_all_revenue — GROUP BY ALL / ORDER BY ALL surface
# ------------------------------------------------------------------


@register(
    "sql_group_by_all_revenue",
    """
    SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
             AS BIGINT) AS revenue_cents
    FROM orders
    WHERE o_orderstatus != 'P'
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def sql_group_by_all_revenue(spark: SparkSession, sf_dir: str):
    """GROUP BY ALL / ORDER BY ALL surface parity: the modern SQL
    shorthand (pioneered by DuckDB, adopted by Spark 3.4+/4) where the
    grouping keys are inferred as every non-aggregate select item and
    the ordering as the full select list — exercised through
    spark.sql() against a registered view, like sql_pipe_syntax_revenue
    exercises the pipe dialect, so the registry covers the TEXTUAL SQL
    surface and not just the DataFrame DSL. Catalyst resolves it to the
    identical year x priority hash aggregate (plan-equivalent to the
    explicit form); both engines infer the same keys."""
    t(spark, sf_dir, "orders").createOrReplaceTempView(
        "sql_gball_orders"
    )
    return spark.sql(
        """
        SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                 AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM sql_gball_orders
        WHERE o_orderstatus != 'P'
        GROUP BY ALL
        ORDER BY ALL
        """
    )
