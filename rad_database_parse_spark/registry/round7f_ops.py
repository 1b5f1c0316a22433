"""Round-7f operators: optimistic-concurrency conflict/retry on the txn
table (the VERDICT-r5 'concurrent-writer semantics untested' gap), UCB1
bandit allocation, binned 1-D Wasserstein drift, a naive-model forecast
scoreboard, one-way ANOVA across customer segments, and a newsvendor
stock quantile.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, t

# ------------------------------------------------------------------
# 1. txn_concurrent_conflict_retry — optimistic concurrency exercised
# ------------------------------------------------------------------


@register(
    "txn_concurrent_conflict_retry",
    """
    SELECT year(o_orderdate) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
             AS rev_cents
    FROM orders WHERE year(o_orderdate) IN (1996, 1997, 1998)
    GROUP BY 1 ORDER BY o_year
    """,
)
def txn_concurrent_conflict_retry(spark: SparkSession, sf_dir: str):
    """Optimistic-concurrency conflict and retry on the manifest-log txn
    table — the two-writer race the snapshot/time-travel/CDF ops never
    exercised: writer A and writer B both derive from v0 (the 1996
    rollup); A publishes v1 (+1997) first; B's stale commit at
    expected_version=0 must raise CommitConflict WITHOUT corrupting the
    log (its staged data dir is unreachable — no manifest points at
    it), after which B REBASES: re-reads the new head snapshot, re-
    applies its delta (+1998) on top, and commits v2. The final read
    must contain all three years exactly once — lost-update-free. The
    conflict path is asserted (a silent second v1 would be the bug);
    the oracle recomputes the merged result relationally. Same
    copy-on-write scale story as the txn family: commits move
    manifests, not data."""
    from ..catalog.txn import CommitConflict, commit, read_snapshot

    o = t(spark, sf_dir, "orders")

    def rollup(years: list[int]):
        return (
            o.filter(F.year("o_orderdate").isin(years))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum((dec("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("rev_cents"),
            )
        )

    scratch = tempfile.mkdtemp(prefix="txn_conflict_")
    try:
        commit(spark, scratch, rollup([1996]), "create", expected_version=None)
        # writer A: derived from v0, lands first
        a_df = read_snapshot(spark, scratch, 0).unionByName(rollup([1997]))
        commit(spark, scratch, a_df, "writer_a", expected_version=0)
        # writer B: ALSO derived from v0 — stale commit must conflict
        b_delta = rollup([1998])
        b_df = read_snapshot(spark, scratch, 0).unionByName(b_delta)
        try:
            commit(spark, scratch, b_df, "writer_b", expected_version=0)
            raise AssertionError(
                "stale commit succeeded — optimistic concurrency broken"
            )
        except CommitConflict:
            pass
        # rebase: re-derive from the new head, retry once
        head = read_snapshot(spark, scratch)  # v1
        commit(
            spark,
            scratch,
            head.unionByName(b_delta),
            "writer_b_rebased",
            expected_version=1,
        )
        out = read_snapshot(spark, scratch).orderBy("o_year")
        rows = out.collect()  # bounded: 3 year-grain rows
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# ------------------------------------------------------------------
# 2. events_ucb_arm_allocation — deterministic bandit planning
# ------------------------------------------------------------------


@register(
    "events_ucb_arm_allocation",
    """
    WITH med AS (
      SELECT quantile_cont(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                AS BIGINT)::DOUBLE, 0.5) AS m
      FROM events),
    arms AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_plays,
             CAST(SUM(CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100
                                     AS BIGINT)::DOUBLE >= m
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_rewards
      FROM events CROSS JOIN med GROUP BY event_type),
    tot AS (SELECT SUM(n_plays) AS n FROM arms),
    scored AS (
      SELECT event_type, n_plays, n_rewards,
             n_rewards * 1000000 // n_plays AS reward_ppm,
             CAST(round(1e6 * (CAST(n_rewards AS DOUBLE) / n_plays
                  + sqrt(2.0 * ln(CAST(n AS DOUBLE)) / n_plays)))
               AS BIGINT) AS ucb_micro
      FROM arms CROSS JOIN tot)
    SELECT event_type, n_plays, n_rewards, reward_ppm, ucb_micro,
           CASE WHEN ucb_micro = (SELECT MAX(ucb_micro) FROM scored)
                THEN 1 ELSE 0 END AS next_allocation
    FROM scored ORDER BY event_type
    """,
)
def events_ucb_arm_allocation(spark: SparkSession, sf_dir: str):
    """UCB1 bandit allocation over event-type arms — the deterministic
    (PRNG-free, unlike Thompson) explore/exploit planner that closes
    the experimentation tier: reward = value at-or-above the corpus
    median (pinned quantile parity), UCB = rate + √(2·ln N / n), and
    the arm holding the max upper bound gets the next traffic slice.
    Under-explored arms win on the bonus term even with lower observed
    rates — exactly the property the report surfaces. One conditional
    aggregate per arm; ln/sqrt on identical exact integers,
    micro-quantized before the argmax (integer compare)."""
    e = t(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    med = e.agg(F.percentile(dbl(cents), 0.5).alias("m"))
    arms = (
        e.crossJoin(F.broadcast(med))
        .select(
            "event_type",
            F.when(dbl(cents) >= F.col("m"), 1).otherwise(0).alias("rw"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_plays"),
            F.sum("rw").cast("bigint").alias("n_rewards"),
        )
    )
    tot = arms.agg(F.sum("n_plays").alias("n"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_plays",
        "n_rewards",
        F.expr("n_rewards * 1000000 div n_plays").alias("reward_ppm"),
        F.round(
            1e6
            * (
                F.col("n_rewards").cast("double") / F.col("n_plays")
                + F.sqrt(
                    2.0
                    * F.log(F.col("n").cast("double"))
                    / F.col("n_plays")
                )
            )
        )
        .cast("bigint")
        .alias("ucb_micro"),
    )
    mx = scored.agg(F.max("ucb_micro").alias("mx"))
    return (
        scored.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            "n_plays",
            "n_rewards",
            "reward_ppm",
            "ucb_micro",
            F.when(F.col("ucb_micro") == F.col("mx"), 1)
            .otherwise(0)
            .alias("next_allocation"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------------------
# 3. orders_wasserstein_year_drift — earth-mover distribution drift
# ------------------------------------------------------------------

_W1_BIN = 2000  # cents per bin ($20) — fixed, so the grid is bounded


@register(
    "orders_wasserstein_year_drift",
    f"""
    WITH b AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               // {_W1_BIN} AS bin,
             CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END AS y96,
             CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END AS y97
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
    per_bin AS (
      SELECT bin, CAST(SUM(y96) AS BIGINT) AS c96,
             CAST(SUM(y97) AS BIGINT) AS c97
      FROM b GROUP BY bin),
    cum AS (
      SELECT bin,
             SUM(c96) OVER (ORDER BY bin) AS k96,
             SUM(c97) OVER (ORDER BY bin) AS k97,
             SUM(c96) OVER () AS n96, SUM(c97) OVER () AS n97
      FROM per_bin),
    diffs AS (
      SELECT ABS(k96 * 1000000000 // n96 - k97 * 1000000000 // n97)
               AS cdf_diff_ppb
      FROM cum)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(cdf_diff_ppb) AS BIGINT) AS l1_cdf_ppb,
           CAST(SUM(cdf_diff_ppb) * {_W1_BIN} // 1000000000 AS BIGINT)
             AS w1_cents
    FROM diffs
    """,
)
def orders_wasserstein_year_drift(spark: SparkSession, sf_dir: str):
    """1-D Wasserstein (earth-mover) distance between two years' order-
    value distributions — the drift metric with UNITS: unlike PSI
    (orders_psi_drift, dimensionless) and KS (max deviation only), W1 =
    ∫|F₁−F₂| reads directly as 'average dollars each order moved'. The
    value axis quantizes to fixed $20 bins, so the grid is bounded at
    any corpus size (the windows run on bin grain — whitelisted like
    the histogram family); CDFs are exact ppb integers from one
    conditional aggregate, and W1 = Σ|ΔCDF|·binwidth stays integer to
    the end. At 100 TB: one scan, one bounded-grid aggregate, bounded
    windows."""
    o = t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    b = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            f" div {_W1_BIN}"
        ).alias("bin"),
        F.when(F.year("o_orderdate") == 1996, 1).otherwise(0).alias("y96"),
        F.when(F.year("o_orderdate") == 1997, 1).otherwise(0).alias("y97"),
    )
    per_bin = b.groupBy("bin").agg(
        F.sum("y96").cast("bigint").alias("c96"),
        F.sum("y97").cast("bigint").alias("c97"),
    )
    from pyspark.sql import Window

    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_bin.select(
        "bin",
        F.sum("c96").over(w_cum).alias("k96"),
        F.sum("c97").over(w_cum).alias("k97"),
        F.sum("c96").over(w_all).alias("n96"),
        F.sum("c97").over(w_all).alias("n97"),
    )
    diffs = cum.select(
        F.abs(
            F.expr("k96 * 1000000000 div n96 - k97 * 1000000000 div n97")
        ).alias("cdf_diff_ppb")
    )
    return diffs.agg(
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum("cdf_diff_ppb").cast("bigint").alias("l1_cdf_ppb"),
        F.expr(
            f"CAST(SUM(cdf_diff_ppb) * {_W1_BIN} div 1000000000 AS BIGINT)"
        ).alias("w1_cents"),
    )


# ------------------------------------------------------------------
# 4. orders_forecast_scoreboard_mape — model-selection backtest
# ------------------------------------------------------------------


@register(
    "orders_forecast_scoreboard_mape",
    """
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1),
    feats AS (
      SELECT ym, rev,
             LAG(rev, 1) OVER (ORDER BY ym) AS prev1,
             LAG(rev, 12) OVER (ORDER BY ym) AS prev12,
             LAG(rev, 1) OVER (ORDER BY ym)
               + COALESCE((LAG(rev, 1) OVER (ORDER BY ym)
                           - LAG(rev, 13) OVER (ORDER BY ym)) // 12, 0)
               AS drift_fc
      FROM m),
    scored AS (
      SELECT * FROM feats
      WHERE ym >= 1997 * 12 AND prev1 IS NOT NULL AND prev12 IS NOT NULL),
    err AS (
      SELECT 'A_naive_last' AS model,
             ABS(rev - prev1) * 1000000 // rev AS ape_ppm FROM scored
      UNION ALL
      SELECT 'B_seasonal_naive', ABS(rev - prev12) * 1000000 // rev
      FROM scored
      UNION ALL
      SELECT 'C_drift', ABS(rev - drift_fc) * 1000000 // rev FROM scored)
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(SUM(ape_ppm) // COUNT(*) AS BIGINT) AS mape_ppm
    FROM err GROUP BY model ORDER BY model
    """,
)
def orders_forecast_scoreboard_mape(spark: SparkSession, sf_dir: str):
    """Forecast model-selection scoreboard: three zero-parameter
    baselines (naive last-month, seasonal-naive t−12, drift) backtested
    over the same held-out months with MAPE in exact ppm — the
    scoreboard a forecasting team consults BEFORE fitting anything
    (orders_seasonal_naive_backtest evaluates one model; model choice
    needs the comparison, and a fitted model that can't beat
    seasonal-naive here isn't worth its maintenance). Calendar-month
    grain throughout: the lags run on the bounded month series
    (whitelisted family), errors are integer cents, MAPE is truncating
    integer division."""
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
    from pyspark.sql import Window

    w = Window.orderBy("ym")
    feats = m.select(
        "ym",
        "rev",
        F.lag("rev", 1).over(w).alias("prev1"),
        F.lag("rev", 12).over(w).alias("prev12"),
        (
            F.lag("rev", 1).over(w)
            + F.coalesce(
                F.expr(
                    "(LAG(rev, 1) OVER (ORDER BY ym)"
                    " - LAG(rev, 13) OVER (ORDER BY ym)) div 12"
                ),
                F.lit(0),
            )
        ).alias("drift_fc"),
    )
    scored = feats.filter(
        (F.col("ym") >= 1997 * 12)
        & F.col("prev1").isNotNull()
        & F.col("prev12").isNotNull()
    )

    def arm(name: str, fc: str):
        return scored.select(
            F.lit(name).alias("model"),
            F.expr(f"ABS(rev - {fc}) * 1000000 div rev").alias("ape_ppm"),
        )

    err = (
        arm("A_naive_last", "prev1")
        .unionByName(arm("B_seasonal_naive", "prev12"))
        .unionByName(arm("C_drift", "drift_fc"))
    )
    return (
        err.groupBy("model")
        .agg(
            F.count("*").cast("bigint").alias("n_months"),
            F.expr("CAST(SUM(ape_ppm) div COUNT(*) AS BIGINT)").alias(
                "mape_ppm"
            ),
        )
        .orderBy("model")
    )


# ------------------------------------------------------------------
# 5. customer_segment_value_anova — one-way ANOVA + effect size
# ------------------------------------------------------------------


@register(
    "customer_segment_value_anova",
    """
    WITH v AS (
      SELECT c_mktsegment AS seg,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM customer),
    g AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             CAST(SUM(c::HUGEINT * c) AS HUGEINT) AS ss
      FROM v GROUP BY seg),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS k,
             SUM(s) AS st, SUM(ss) AS sst,
             SUM((s * s + n // 2) // n) AS between_raw
      FROM g)
    SELECT nt AS n_customers, k AS n_segments,
           CAST(GREATEST(between_raw - (st * st + nt // 2) // nt, 0)
                // 1000 AS BIGINT) AS ss_between_e3,
           CAST(GREATEST(sst - (st * st + nt // 2) // nt, 0) // 1000
             AS BIGINT) AS ss_total_e3,
           (CAST(GREATEST(between_raw - (st * st + nt // 2) // nt, 0)
                 // 1000 AS DOUBLE) / (k - 1))
           / (CAST(GREATEST(sst - between_raw, 1) // 1000 AS DOUBLE)
              / (nt - k)) AS f_stat,
           CAST(GREATEST(between_raw - (st * st + nt // 2) // nt, 0)
                * 1000000
                // GREATEST(sst - (st * st + nt // 2) // nt, 1) AS BIGINT)
             AS eta2_ppm
    FROM tot
    """,
)
def customer_segment_value_anova(spark: SparkSession, sf_dir: str):
    """One-way ANOVA of customer account balance across the five market
    segments — the single-factor sibling of lineitem_anova_two_way and
    the parametric cross-check of events_kruskal_wallis's rank answer:
    F for the hypothesis test, eta² (exact ppm) for whether the effect
    matters. Exact integer moments per segment (cents, cents² in
    HUGEINT/decimal(38,0)); s²/n corrections use exact rounding
    division (the pmod-safe magnitudes lesson — here e17, within `div`
    range); F forms in double from identical e3-reduced integers.
    Segment grain: 5 rows after one scan."""
    c = t(spark, sf_dir, "customer")
    big = "decimal(38,0)"
    v = c.select(
        F.col("c_mktsegment").alias("seg"),
        (dec("c_acctbal") * 100).cast("bigint").alias("c"),
    )
    g = v.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("c").cast(big)).alias("s"),
        F.sum((F.col("c").cast(big) * F.col("c")).cast(big)).alias("ss"),
    )
    tot = g.select(
        "n",
        "s",
        "ss",
        F.expr("(s * s + n div 2) div n").alias("corr"),
    ).agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum("corr").alias("between_raw"),
    )
    tc = "(st * st + nt div 2) div nt"
    ssb = f"GREATEST(between_raw - {tc}, 0)"
    sstot = f"GREATEST(sst - {tc}, 0)"
    return tot.select(
        F.col("nt").alias("n_customers"),
        F.col("k").alias("n_segments"),
        F.expr(f"CAST({ssb} div 1000 AS BIGINT)").alias("ss_between_e3"),
        F.expr(f"CAST({sstot} div 1000 AS BIGINT)").alias("ss_total_e3"),
        (
            F.expr(f"CAST({ssb} div 1000 AS DOUBLE)")
            / (F.col("k") - 1)
            / (
                F.expr(
                    "CAST(GREATEST(sst - between_raw, 1) div 1000"
                    " AS DOUBLE)"
                )
                / (F.col("nt") - F.col("k"))
            )
        ).alias("f_stat"),
        F.expr(
            f"CAST({ssb} * 1000000 div GREATEST({sstot}, 1) AS BIGINT)"
        ).alias("eta2_ppm"),
    )


# ------------------------------------------------------------------
# 6. part_newsvendor_stock_quantile — critical-ratio stocking
# ------------------------------------------------------------------


@register(
    "part_newsvendor_stock_quantile",
    """
    WITH dem AS (
      SELECT p.p_type,
             year(l_shipdate) * 12 + month(l_shipdate) - 1 AS ym,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
      FROM lineitem JOIN part p ON p.p_partkey = l_partkey
      GROUP BY 1, 2)
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(SUM(d) // COUNT(*) AS BIGINT) AS mean_monthly_demand,
           quantile_cont(CAST(d AS DOUBLE), 0.8) AS stock_level_q80,
           CAST(round(quantile_cont(CAST(d AS DOUBLE), 0.8))
                - SUM(d) // COUNT(*) AS BIGINT) AS safety_stock
    FROM dem GROUP BY p_type ORDER BY p_type
    """,
)
def part_newsvendor_stock_quantile(spark: SparkSession, sf_dir: str):
    """Newsvendor stocking levels per part type: with critical ratio
    cu/(cu+co) = 0.8, the profit-maximizing stock is the 0.8 demand
    quantile — the one-line inventory result that turns the repo's
    demand statistics (EOQ, XYZ classes, Croston) into an order
    quantity. Monthly demand aggregates to (type, month) grain
    (bounded), the quantile uses the pinned interpolation parity, and
    safety stock = q80 − mean reads the buffer the service target
    costs. One fact scan, dimension-bounded everything after."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    dem = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_type",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias(
                "ym"
            ),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("d"))
    )
    return (
        dem.groupBy("p_type")
        .agg(
            F.count("*").cast("bigint").alias("n_months"),
            F.expr("CAST(SUM(d) div COUNT(*) AS BIGINT)").alias(
                "mean_monthly_demand"
            ),
            F.percentile(dbl(F.col("d")), 0.8).alias("stock_level_q80"),
            F.expr(
                "CAST(round(percentile(CAST(d AS DOUBLE), 0.8))"
                " - SUM(d) div COUNT(*) AS BIGINT)"
            ).alias("safety_stock"),
        )
        .orderBy("p_type")
    )
