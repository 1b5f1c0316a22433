"""Round-7p operators: item-item collaborative filtering, a Kalman
local-level filter fold, Good-Turing smoothing, Hurst rescaled-range
analysis, Dirichlet log-odds ("fightin' words") corpus comparison, and
DTW profile matching as a nested-HOF dynamic program.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import t

# ------------------------------------------------------------------
# 1. part_item_item_cf_topk — co-purchase cosine similarity
# ------------------------------------------------------------------

_CF_K = 20
_CF_MIN_CO = 2
# Hub-customer cap, the r8 co-purchase-family recipe (see _AA_HUB_CAP in
# round7o_ops.py): a basket of B parts emits B²/2 pairs through the
# customer-keyed self-join — join-OUTPUT skew AQE cannot split. The cap
# bounds any basket at cap²/2 ≈ 8k pairs and sits in BOTH engines' plans
# (row_number by part key, deterministic). Deliberately above the corpus
# maxima at test scales (max distinct parts per customer: 90 @ sf0.01,
# 105 @ sf0.1 — measured via DuckDB, round-9 session), so it binds only
# at the 100× hub skew it exists for. NOT silent: cap constant, measured
# headroom, and binding condition documented here and in SCALE.md.
# Popularity (n_a/n_b) is computed from the CAPPED baskets so the cosine
# stays self-consistent when the cap binds.
_CF_HUB_CAP = 128


@register(
    "part_item_item_cf_topk",
    f"""
    WITH baskets0 AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    baskets AS (
      SELECT c, p FROM (
        SELECT c, p, ROW_NUMBER() OVER (PARTITION BY c ORDER BY p) AS rn
        FROM baskets0) WHERE rn <= {_CF_HUB_CAP}),
    pop AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS np
            FROM baskets GROUP BY 1),
    co AS (
      SELECT a.p AS part_a, b.p AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_co
      FROM baskets a JOIN baskets b ON b.c = a.c AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= {_CF_MIN_CO})
    SELECT co.part_a, co.part_b, co.n_co,
           pa.np AS n_a, pb.np AS n_b,
           CAST(round(1e6 * co.n_co
             / sqrt(CAST(pa.np AS DOUBLE) * pb.np)) AS BIGINT)
             AS cosine_ppm
    FROM co
    JOIN pop pa ON pa.p = co.part_a
    JOIN pop pb ON pb.p = co.part_b
    ORDER BY cosine_ppm DESC, part_a, part_b
    LIMIT {_CF_K}
    """,
)
def part_item_item_cf_topk(spark: SparkSession, sf_dir: str):
    """Item-item collaborative filtering (the Amazon-style recsys
    workhorse): parts are similar when the same customers buy both,
    normalized by each part's own popularity — cosine over binary
    customer vectors, n_co / sqrt(n_a n_b) — so hub items don't
    dominate the way they do in raw co-counts
    (supplier_shared_customer_graph) or AA weighting
    (graph_adamic_adar_suppliers). Codegen equi-key self-join on the
    customer key generates pairs; hub baskets are capped at
    {_CF_HUB_CAP} parts per customer (see _CF_HUB_CAP — above all
    measured corpus maxima, mirrored in the oracle) so no single
    customer can emit an unsplittable pair block at 100×; the HAVING
    >= {_CF_MIN_CO} support cut prunes the singleton-pair tail BEFORE
    the popularity joins (selective at any SF — co-purchase counts
    follow a power law); cosine takes one sqrt from exact integers.
    Top-{_CF_K} via orderBy+limit."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    baskets0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    wcap = Window.partitionBy("c").orderBy("p")
    baskets = (
        baskets0.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= _CF_HUB_CAP)
        .drop("rn")
    )
    pop = baskets.groupBy("p").agg(
        F.count("*").cast("bigint").alias("np")
    )
    a = baskets.select(F.col("p").alias("part_a"), "c")
    b = baskets.select(
        F.col("p").alias("part_b"), F.col("c").alias("c2")
    )
    co = (
        a.join(
            b,
            (F.col("c") == F.col("c2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("n_co"))
        .filter(F.col("n_co") >= _CF_MIN_CO)
    )
    return (
        co.join(
            pop.select(F.col("p").alias("part_a"), F.col("np").alias("n_a")),
            "part_a",
        )
        .join(
            pop.select(F.col("p").alias("part_b"), F.col("np").alias("n_b")),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "n_co",
            "n_a",
            "n_b",
            F.expr(
                "CAST(round(1e6 * n_co"
                " / sqrt(CAST(n_a AS DOUBLE) * n_b)) AS BIGINT)"
            ).alias("cosine_ppm"),
        )
        .orderBy(F.col("cosine_ppm").desc(), "part_a", "part_b")
        .limit(_CF_K)
    )


# ------------------------------------------------------------------
# 2. orders_kalman_level_filter — local-level state-space fold
# ------------------------------------------------------------------

# signal-to-noise q = Q/R = 1/4 (R = 4 Q-units, milli fixed point)
_KAL_R_MILLI = 4000
_KAL_P0_MILLI = 10000  # diffuse-ish prior: P0 = 10 Q-units


@register(
    "orders_kalman_level_filter",
    f"""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    series AS (
      SELECT list(y ORDER BY ym) AS ys,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM m),
    folded AS (
      SELECT n_months,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT),
                             CAST({_KAL_P0_MILLI} AS BIGINT),
                             CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT)],
                            list_transform(ys, y -> [y])),
               (acc, e) -> CASE WHEN acc[5] = 0 THEN
                 [e[1], {_KAL_P0_MILLI} * {_KAL_R_MILLI}
                    // ({_KAL_P0_MILLI} + {_KAL_R_MILLI}),
                  CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                  CAST(1 AS BIGINT)]
               ELSE
                 [acc[1] + ((acc[2] + 1000) * 1000000
                    // (acc[2] + 1000 + {_KAL_R_MILLI}))
                    * (e[1] - acc[1]) // 1000000,
                  (acc[2] + 1000) * {_KAL_R_MILLI}
                    // (acc[2] + 1000 + {_KAL_R_MILLI}),
                  acc[3] + abs(e[1] - acc[1]),
                  (acc[2] + 1000) * 1000000
                    // (acc[2] + 1000 + {_KAL_R_MILLI}),
                  acc[5] + 1] END) AS st
      FROM series)
    SELECT n_months,
           CAST(st[1] AS BIGINT) AS final_level_cents,
           CAST(st[2] AS BIGINT) AS final_p_milli,
           CAST(st[4] AS BIGINT) AS final_gain_ppm,
           CAST(st[3] // GREATEST(n_months - 1, 1) AS BIGINT)
             AS mean_abs_innovation_cents
    FROM folded
    """,
)
def orders_kalman_level_filter(spark: SparkSession, sf_dir: str):
    """Kalman filter for the local-level (random-walk-plus-noise)
    state-space model over monthly revenue — the probabilistic
    smoother underlying structural time series (and the optimal
    version of the EWMA already in the tier: the gain ADAPTS,
    starting diffuse and converging to the steady state set by the
    signal-to-noise ratio q = 1/4). The whole filter is one fold
    over the calendar-bounded month series: state = [level cents,
    variance in milli-Q-units, innovation L1, last gain ppm, t],
    with the Riccati update P <- (P+Q)R/(P+Q+R) and gain K =
    (P+Q)/(P+Q+R) in exact truncating integer fixed point —
    identical in both engines, no doubles anywhere. First
    observation initializes the level exactly (diffuse prior). The
    mean absolute innovation is the filter's one-step-ahead fit."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "ym"
        )
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("y")
    )
    series = m.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ym, y))),"
            " s -> s.y)"
        ).alias("ys"),
        F.count("*").cast("bigint").alias("n_months"),
    )
    r, p0 = _KAL_R_MILLI, _KAL_P0_MILLI
    folded = series.select(
        "n_months",
        F.expr(
            "aggregate(ys,"
            f" array(CAST(0 AS BIGINT), CAST({p0} AS BIGINT),"
            "  CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
            "  CAST(0 AS BIGINT)),"
            " (acc, y) -> IF(acc[4] = 0,"
            f"  array(y, CAST({p0 * r // (p0 + r)} AS BIGINT),"
            "   CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
            "   CAST(1 AS BIGINT)),"
            "  array("
            f"   acc[0] + ((acc[1] + 1000) * 1000000"
            f"     div (acc[1] + 1000 + {r}))"
            "     * (y - acc[0]) div 1000000,"
            f"   (acc[1] + 1000) * {r} div (acc[1] + 1000 + {r}),"
            "   acc[2] + abs(y - acc[0]),"
            f"   (acc[1] + 1000) * 1000000 div (acc[1] + 1000 + {r}),"
            "   acc[4] + 1)))"
        ).alias("st"),
    )
    return folded.select(
        "n_months",
        F.expr("CAST(st[0] AS BIGINT)").alias("final_level_cents"),
        F.expr("CAST(st[1] AS BIGINT)").alias("final_p_milli"),
        F.expr("CAST(st[3] AS BIGINT)").alias("final_gain_ppm"),
        F.expr(
            "CAST(st[2] div GREATEST(n_months - 1, 1) AS BIGINT)"
        ).alias("mean_abs_innovation_cents"),
    )


# ------------------------------------------------------------------
# 3. docs_good_turing_smoothing — frequency-of-frequencies
# ------------------------------------------------------------------


@register(
    "docs_good_turing_smoothing",
    """
    WITH toks AS (
      SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
    counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS r
      FROM toks WHERE w != '' GROUP BY 1),
    tot AS (SELECT CAST(SUM(r) AS BIGINT) AS n_tokens FROM counts),
    cc AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM counts GROUP BY 1)
    SELECT a.r,
           a.n_r,
           CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_plus_1,
           CAST((a.r + 1) * COALESCE(b.n_r, 0) * 1000000 // a.n_r
             AS BIGINT) AS smoothed_r_micro,
           CAST((SELECT n_tokens FROM tot) AS BIGINT) AS n_tokens,
           CAST((SELECT n_r FROM cc WHERE r = 1) * 1000000
             // (SELECT n_tokens FROM tot) AS BIGINT)
             AS unseen_mass_ppm
    FROM cc a LEFT JOIN cc b ON b.r = a.r + 1
    WHERE a.r <= 10
    ORDER BY a.r
    """,
)
def docs_good_turing_smoothing(spark: SparkSession, sf_dir: str):
    """Good-Turing smoothing of the corpus unigram counts — the
    frequency-of-frequencies estimator (r* = (r+1) N_{r+1} / N_r)
    that language models use to reserve mass for unseen events: the
    N_1/N unseen-mass estimate is THE number a tokenizer/vocab
    decision needs (how much of the next corpus will be new types?).
    The token explode is the only fact-grain work; counts collapse
    to the count-of-counts table, whose r<=10 head (where GT is
    reliable) self-joins on r+1 — a <=11-row join. Exact micro
    fixed point; smoothed_r of the largest shown r correctly reads
    0 when N_{r+1} is empty."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w")
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(
        F.count("*").cast("bigint").alias("r")
    )
    tot = counts.agg(F.sum("r").cast("bigint").alias("n_tokens"))
    cc = counts.groupBy("r").agg(
        F.count("*").cast("bigint").alias("n_r")
    )
    n1 = cc.filter(F.col("r") == 1).select(
        F.col("n_r").alias("n_1")
    )
    b = cc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_rp1"))
    return (
        cc.filter(F.col("r") <= 10)
        .join(b, "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_rp1"), F.lit(0))
            .cast("bigint")
            .alias("n_r_plus_1"),
            F.expr(
                "CAST((r + 1) * COALESCE(n_rp1, 0) * 1000000 div n_r"
                " AS BIGINT)"
            ).alias("smoothed_r_micro"),
            "n_tokens",
            F.expr(
                "CAST(n_1 * 1000000 div n_tokens AS BIGINT)"
            ).alias("unseen_mass_ppm"),
        )
        .orderBy("r")
    )


# ------------------------------------------------------------------
# 4. events_hurst_rescaled_range — long-memory diagnostic
# ------------------------------------------------------------------

_HURST_WINDOWS = (8, 16, 32, 64)


@register(
    "events_hurst_rescaled_range",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    idx AS (
      SELECT datediff('day', (SELECT MIN(day) FROM daily), day) AS i, x
      FROM daily),
    ws AS (SELECT UNNEST([{', '.join(str(w) for w in _HURST_WINDOWS)}])
             AS w),
    blocks AS (
      SELECT ws.w, idx.i // ws.w AS blk, idx.i, idx.x
      FROM idx CROSS JOIN ws),
    sized AS (
      SELECT w, blk, i, x,
             CAST(COUNT(*) OVER (PARTITION BY w, blk) AS BIGINT) AS bn,
             CAST(SUM(x) OVER (PARTITION BY w, blk) AS BIGINT) AS bs,
             CAST(SUM(x * x) OVER (PARTITION BY w, blk) AS BIGINT)
               AS bss,
             CAST(SUM(x) OVER (PARTITION BY w, blk ORDER BY i)
               AS BIGINT) AS cx,
             CAST(ROW_NUMBER() OVER (PARTITION BY w, blk ORDER BY i)
               AS BIGINT) AS tb
      FROM blocks),
    devs AS (
      SELECT w, blk,
             CAST(round(1e3
               * (CAST(MAX(cx * bn - tb * bs)
                       - MIN(cx * bn - tb * bs) AS DOUBLE) / MAX(bn))
               / sqrt((CAST(MAX(bss) AS DOUBLE) * MAX(bn)
                       - CAST(MAX(bs) AS DOUBLE) * MAX(bs))
                      / (CAST(MAX(bn) AS DOUBLE) * MAX(bn))))
               AS BIGINT) AS rs_blk_milli
      FROM sized WHERE bn = w
      GROUP BY 1, 2),
    ratios AS (
      SELECT w,
             CAST(SUM(rs_blk_milli) // COUNT(*) AS BIGINT) AS rs_milli
      FROM devs GROUP BY 1),
    wide AS (
      SELECT MAX(CASE WHEN w = 8 THEN rs_milli END) AS rs8_milli,
             MAX(CASE WHEN w = 16 THEN rs_milli END) AS rs16_milli,
             MAX(CASE WHEN w = 32 THEN rs_milli END) AS rs32_milli,
             MAX(CASE WHEN w = 64 THEN rs_milli END) AS rs64_milli
      FROM ratios)
    SELECT rs8_milli, rs16_milli, rs32_milli, rs64_milli,
           CAST(round(1e6
             * (1.5 * (ln(rs64_milli / 1e3) - ln(rs8_milli / 1e3))
                + 0.5 * (ln(rs32_milli / 1e3) - ln(rs16_milli / 1e3)))
             / (5 * ln(2.0) * ln(2.0))) AS BIGINT) AS hurst_micro
    FROM wide
    """,
)
def events_hurst_rescaled_range(spark: SparkSession, sf_dir: str):
    """Hurst exponent of the daily event-count series via classical
    rescaled-range (R/S) analysis — the long-memory diagnostic
    (H ~ 0.5 random walk, H > 0.5 persistent trends, H < 0.5 mean
    reversion) that decides whether naive day-over-day forecasting
    can work at all. Days split into complete blocks of 8/16/32/64;
    within each block the cumulative-deviation range is computed in
    the n-scaled integer form cx*n - t*S (no mean division), the
    block std from exact sums, R/S averaged per window size, and the
    Hurst slope is the log-log OLS over the four (w, R/S) points —
    the R/S ratios milli-quantize BEFORE the log regression so both
    engines regress identical inputs. One fact scan to day grain;
    every window is PARTITIONED by (w, block)."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    mn = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        F.datediff("day", "d0").cast("bigint").alias("i"), "x"
    )
    ws = spark.createDataFrame(
        [(w,) for w in _HURST_WINDOWS], "w long"
    )
    blocks = idx.crossJoin(F.broadcast(ws)).select(
        "w", F.expr("i div w").alias("blk"), "i", "x"
    )
    wb = Window.partitionBy("w", "blk")
    wbo = Window.partitionBy("w", "blk").orderBy("i")
    sized = blocks.select(
        "w",
        "blk",
        F.count("*").over(wb).cast("bigint").alias("bn"),
        F.sum("x").over(wb).cast("bigint").alias("bs"),
        F.sum(F.col("x") * F.col("x")).over(wb).cast("bigint").alias("bss"),
        F.sum("x").over(wbo).cast("bigint").alias("cx"),
        F.row_number().over(wbo).cast("bigint").alias("tb"),
    )
    devs = (
        sized.filter(F.col("bn") == F.col("w"))
        .groupBy("w", "blk")
        .agg(
            F.expr(
                "CAST(round(1e3"
                " * (CAST(MAX(cx * bn - tb * bs)"
                "    - MIN(cx * bn - tb * bs) AS DOUBLE) / MAX(bn))"
                " / sqrt((CAST(MAX(bss) AS DOUBLE) * MAX(bn)"
                "   - CAST(MAX(bs) AS DOUBLE) * MAX(bs))"
                "   / (CAST(MAX(bn) AS DOUBLE) * MAX(bn))))"
                " AS BIGINT)"
            ).alias("rs_blk_milli")
        )
    )
    ratios = devs.groupBy("w").agg(
        F.expr(
            "CAST(SUM(rs_blk_milli) div COUNT(*) AS BIGINT)"
        ).alias("rs_milli")
    )
    wide = ratios.agg(
        *[
            F.max(
                F.when(F.col("w") == w, F.col("rs_milli"))
            ).alias(f"rs{w}_milli")
            for w in _HURST_WINDOWS
        ]
    )
    return wide.select(
        "rs8_milli",
        "rs16_milli",
        "rs32_milli",
        "rs64_milli",
        F.expr(
            "CAST(round(1e6"
            " * (1.5 * (ln(rs64_milli / 1e3) - ln(rs8_milli / 1e3))"
            " + 0.5 * (ln(rs32_milli / 1e3) - ln(rs16_milli / 1e3)))"
            " / (5 * ln(2.0) * ln(2.0))) AS BIGINT)"
        ).alias("hurst_micro"),
    )


# ------------------------------------------------------------------
# 5. docs_log_odds_fighting_words — Dirichlet log-odds z-scores
# ------------------------------------------------------------------

_LO_ALPHA_MILLI = 10  # 0.01 pseudo-count per word, milli fixed point
_LO_K = 20


@register(
    "docs_log_odds_fighting_words",
    f"""
    WITH g1 AS (SELECT MIN(lang) AS l FROM documents),
    toks AS (
      SELECT CASE WHEN lang = (SELECT l FROM g1) THEN 1 ELSE 2 END AS g,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents),
    counts AS (
      SELECT w, g, CAST(COUNT(*) AS BIGINT) AS y
      FROM toks WHERE w != '' GROUP BY 1, 2),
    wide AS (
      SELECT w,
             CAST(COALESCE(SUM(CASE WHEN g = 1 THEN y END), 0)
               AS BIGINT) AS y1,
             CAST(COALESCE(SUM(CASE WHEN g = 2 THEN y END), 0)
               AS BIGINT) AS y2
      FROM counts GROUP BY 1),
    tots AS (
      SELECT CAST(SUM(y1) AS BIGINT) AS n1,
             CAST(SUM(y2) AS BIGINT) AS n2,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM wide),
    z AS (
      SELECT w.w, w.y1, w.y2,
             CAST(round(1e6 * (
               ln((w.y1 * 1000.0 + {_LO_ALPHA_MILLI})
                  / (t.n1 * 1000.0 + t.v * {_LO_ALPHA_MILLI}
                     - w.y1 * 1000.0 - {_LO_ALPHA_MILLI}))
             - ln((w.y2 * 1000.0 + {_LO_ALPHA_MILLI})
                  / (t.n2 * 1000.0 + t.v * {_LO_ALPHA_MILLI}
                     - w.y2 * 1000.0 - {_LO_ALPHA_MILLI}))
             ) / sqrt(1000.0 / (w.y1 * 1000.0 + {_LO_ALPHA_MILLI})
                    + 1000.0 / (w.y2 * 1000.0 + {_LO_ALPHA_MILLI})))
             AS BIGINT) AS z_micro
      FROM wide w CROSS JOIN tots t)
    SELECT w AS token, y1 AS count_g1, y2 AS count_g2, z_micro
    FROM z
    ORDER BY abs(z_micro) DESC, token
    LIMIT {_LO_K}
    """,
)
def docs_log_odds_fighting_words(spark: SparkSession, sf_dir: str):
    """Dirichlet-prior log-odds with z-normalization (Monroe/Colaresi/
    Quinn's 'fightin' words') between the alphabetically-first
    language's documents and the rest — the corpus-comparison method
    that fixes both failure modes of raw log-odds (rare-word
    explosion) and of the G2 keyness already in the tier (common-word
    bias) by shrinking with a prior and dividing by the variance of
    the estimate. Token counts pivot to one row per word (single
    conditional aggregate — absent-in-one-group words surface as 0
    with the prior keeping the odds finite); the z expression is one
    deterministic double composition from exact milli-scaled integer
    ratios, identical text in both engines. Top-{_LO_K} by |z| via
    orderBy+limit."""
    d = t(spark, sf_dir, "documents")
    g1 = d.agg(F.min("lang").alias("l"))
    toks = (
        d.crossJoin(F.broadcast(g1))
        .select(
            F.when(F.col("lang") == F.col("l"), 1)
            .otherwise(2)
            .alias("g"),
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("w", "g").agg(
        F.count("*").cast("bigint").alias("y")
    )
    wide = counts.groupBy("w").agg(
        F.coalesce(F.sum(F.when(F.col("g") == 1, F.col("y"))), F.lit(0))
        .cast("bigint")
        .alias("y1"),
        F.coalesce(F.sum(F.when(F.col("g") == 2, F.col("y"))), F.lit(0))
        .cast("bigint")
        .alias("y2"),
    )
    tots = wide.agg(
        F.sum("y1").cast("bigint").alias("n1"),
        F.sum("y2").cast("bigint").alias("n2"),
        F.count("*").cast("bigint").alias("v"),
    )
    al = _LO_ALPHA_MILLI
    z = wide.crossJoin(F.broadcast(tots)).select(
        F.col("w").alias("token"),
        F.col("y1").alias("count_g1"),
        F.col("y2").alias("count_g2"),
        F.expr(
            "CAST(round(1e6 * ("
            f" ln((y1 * 1000.0 + {al})"
            f"    / (n1 * 1000.0 + v * {al} - y1 * 1000.0 - {al}))"
            f" - ln((y2 * 1000.0 + {al})"
            f"    / (n2 * 1000.0 + v * {al} - y2 * 1000.0 - {al}))"
            f" ) / sqrt(1000.0 / (y1 * 1000.0 + {al})"
            f"        + 1000.0 / (y2 * 1000.0 + {al}))) AS BIGINT)"
        ).alias("z_micro"),
    )
    return z.orderBy(F.abs(F.col("z_micro")).desc(), "token").limit(
        _LO_K
    )


# ------------------------------------------------------------------
# 6. events_dtw_hourly_profiles — DTW as a nested-HOF DP
# ------------------------------------------------------------------

_DTW_INF = 1_000_000_000_000_000  # saturating infinity for DP borders


@register(
    "events_dtw_hourly_profiles",
    f"""
    WITH hr AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT t.event_type, hh.h
      FROM (SELECT DISTINCT event_type FROM hr) t
      CROSS JOIN (SELECT UNNEST(range(0, 24)) AS h) hh),
    dense AS (
      SELECT s.event_type, s.h,
             CAST(COALESCE(hr.c, 0) AS BIGINT) AS c
      FROM spine s LEFT JOIN hr
        ON hr.event_type = s.event_type AND hr.h = s.h),
    prof AS (
      SELECT event_type,
             list(c * 1000000 // tot ORDER BY h) AS p
      FROM (SELECT event_type, h, c,
                   SUM(c) OVER (PARTITION BY event_type) AS tot
            FROM dense)
      GROUP BY 1),
    gl AS (
      SELECT list(c * 1000000 // tot ORDER BY h) AS ref
      FROM (SELECT h, SUM(c) AS c, SUM(SUM(c)) OVER () AS tot
            FROM dense GROUP BY 1)),
    dp AS (
      SELECT p.event_type, p.p, g.ref,
             list_reduce(
               list_prepend(
                 [CAST(0 AS BIGINT)]
                 || list_transform(range(1, 25),
                      z -> CAST({_DTW_INF} AS BIGINT)),
                 list_transform(p.p, x -> [x])),
               (prev, e) -> list_reduce(
                 list_prepend([CAST({_DTW_INF} AS BIGINT)],
                              list_transform(range(1, 25), j -> [j])),
                 (nr, jj) -> list_append(nr,
                   abs(e[1] - g.ref[jj[1]])
                   + LEAST(prev[jj[1] + 1], prev[jj[1]], nr[-1])))
             ) AS row
      FROM prof p CROSS JOIN gl g),
    l1 AS (
      SELECT event_type,
             CAST(list_sum(list_transform(range(1, 25),
               j -> abs(p[j] - ref[j]))) AS BIGINT) AS l1_ppm,
             CAST(row[25] AS BIGINT) AS dtw_ppm
      FROM dp)
    SELECT event_type, dtw_ppm, l1_ppm,
           CAST((l1_ppm - dtw_ppm) * 1000000
             // GREATEST(l1_ppm, 1) AS BIGINT) AS warp_gain_ppm
    FROM l1 ORDER BY event_type
    """,
)
def events_dtw_hourly_profiles(spark: SparkSession, sf_dir: str):
    """Dynamic time warping between each event type's hourly activity
    profile and the global profile — the shape-matching distance that
    tolerates phase shift (a type whose peak lags the site-wide peak
    by 2h is CLOSE under DTW, far under L1) — with the full 24x24 DP
    executed as a NESTED array fold: the outer fold walks the type's
    profile carrying the previous DP row, the inner fold builds each
    new row left-to-right (the in-row dependency that a flat
    transform cannot express). Saturating integer infinity on the
    borders, exact ppm profiles, zero doubles. Everything after the
    one fact scan is (event_type x 24) bounded; L1 is emitted
    alongside and warp_gain = how much warping explains. The DP is
    bounded at 576 lambda cells per type — constant at any SF."""
    e = t(spark, sf_dir, "events")
    hr = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count("*").cast("bigint").alias("c"))
    hours = spark.range(0, 24).select(F.col("id").alias("h"))
    dense = (
        hr.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(hours))
        .join(hr, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
        )
    )
    prof = (
        dense.select(
            "event_type",
            "h",
            "c",
            F.sum("c")
            .over(Window.partitionBy("event_type"))
            .alias("tot"),
        )
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                " struct(h, c * 1000000 div tot AS s))), q -> q.s)"
            ).alias("p")
        )
    )
    glob = (
        dense.groupBy("h")
        .agg(F.sum("c").alias("c"))
        .select(
            "h", "c", F.sum("c").over(Window.partitionBy()).alias("tot")
        )
        .groupBy()
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                " struct(h, c * 1000000 div tot AS s))), q -> q.s)"
            ).alias("ref")
        )
    )
    inf = _DTW_INF
    dp = prof.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "p",
        "ref",
        F.expr(
            "aggregate(p,"
            # init row: D(0, 0..24) = [0, INF x 24]
            f" concat(array(CAST(0 AS BIGINT)),"
            f"  array_repeat(CAST({inf} AS BIGINT), 24)),"
            " (prev, x) -> aggregate(sequence(1, 24),"
            f"   array(CAST({inf} AS BIGINT)),"
            "   (nr, j) -> concat(nr, array("
            "     abs(x - element_at(ref, j))"
            "     + LEAST(element_at(prev, j + 1), element_at(prev, j),"
            "             element_at(nr, -1))))))"
        ).alias("row"),
    )
    return (
        dp.select(
            "event_type",
            F.expr("CAST(element_at(row, 25) AS BIGINT)").alias(
                "dtw_ppm"
            ),
            F.expr(
                "CAST(aggregate(sequence(1, 24), CAST(0 AS BIGINT),"
                " (s, j) -> s + abs(element_at(p, j)"
                " - element_at(ref, j))) AS BIGINT)"
            ).alias("l1_ppm"),
        )
        .select(
            "event_type",
            "dtw_ppm",
            "l1_ppm",
            F.expr(
                "CAST((l1_ppm - dtw_ppm) * 1000000"
                " div GREATEST(l1_ppm, 1) AS BIGINT)"
            ).alias("warp_gain_ppm"),
        )
        .orderBy("event_type")
    )
