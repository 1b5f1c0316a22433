"""Round-7n operators: Viterbi HMM decoding, a 0/1-knapsack DP fold,
HBOS (histogram-based outlier score) top-k, single-lag Granger
causality, Borda rank aggregation, and hierarchical forecast
reconciliation.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. events_viterbi_hmm_decode — max-product HMM scoring fold
# ------------------------------------------------------------------

_VIT_K = 20
# 2-state model (engaged / idle), micro-log fixed point. The model is
# a FIXED literal spec — the realistic serving shape (score a trained
# model over every user's sequence), so both engines fold identical
# integers. ln values quantized once here, by hand.
_VIT_START = (-693147, -693147)  # ln 0.5
_VIT_T = (-223144, -1609438, -916291, -510826)  # ln .8 .2 .4 .6
_VIT_EMIT = {  # event_type -> (engaged micro-log, idle micro-log)
    "view": (-1049822, -510826),  # .35 / .60
    "click": (-1203973, -2302585),  # .30 / .10
    "purchase": (-1609438, -3912023),  # .20 / .02
    "signup": (-2302585, -2525729),  # .10 / .08
    "error": (-2995732, -1609438),  # .05 / .20
}
_VIT_ELSE = -4605170  # ln 0.01


def _vit_case(idx: int, col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = '{k}' THEN CAST({v[idx]} AS BIGINT)"
        for k, v in _VIT_EMIT.items()
    )
    return f"CASE {whens} ELSE CAST({_VIT_ELSE} AS BIGINT) END"


@register(
    "events_viterbi_hmm_decode",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    emis AS (
      SELECT user_id, rn,
             {_vit_case(0, 'event_type')} AS e1,
             {_vit_case(1, 'event_type')} AS e2
      FROM seq WHERE rn <= {_VIT_K}),
    folded AS (
      SELECT user_id,
             list_reduce(
               list_prepend([CAST({_VIT_START[0]} AS BIGINT),
                             CAST({_VIT_START[1]} AS BIGINT)],
                            list([e1, e2] ORDER BY rn)),
               (acc, e) -> [GREATEST(acc[1] + ({_VIT_T[0]}),
                                     acc[2] + ({_VIT_T[2]})) + e[1],
                            GREATEST(acc[1] + ({_VIT_T[1]}),
                                     acc[2] + ({_VIT_T[3]})) + e[2]]
             ) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM emis GROUP BY user_id)
    SELECT CASE WHEN v[1] >= v[2] THEN 'engaged' ELSE 'idle' END
             AS decoded_state,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(GREATEST(v[1], v[2])) AS BIGINT)
             AS total_score_micro,
           CAST(SUM(GREATEST(v[1], v[2])) // COUNT(*) AS BIGINT)
             AS mean_score_micro
    FROM folded GROUP BY 1 ORDER BY decoded_state
    """,
)
def events_viterbi_hmm_decode(spark: SparkSession, sf_dir: str):
    """Viterbi (max-product) decoding of a 2-state engaged/idle HMM
    over every user's event sequence — the classic latent-state
    scoring pass a behavioral pipeline runs at serving time. Each
    user's first {_VIT_K} events map to fixed micro-log emission
    pairs, then fold through the Viterbi recurrence v' = max(v +
    T) + e inside one array-HOF aggregate: exact integer adds and
    GREATEST, so both engines decode identically (no log-sum-exp
    float drift — max-product, not forward). The model is a literal
    constant spec; per-user state is 2 integers regardless of
    sequence length, and sequences cap at {_VIT_K} via a PARTITIONED
    rank window. Output: user counts and path scores per decoded
    final state."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    emis = (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _VIT_K)
        .select(
            "user_id",
            "rn",
            F.expr(_vit_case(0, "event_type")).alias("e1"),
            F.expr(_vit_case(1, "event_type")).alias("e2"),
        )
    )
    folded = emis.groupBy("user_id").agg(
        F.expr(
            "aggregate("
            " transform(array_sort(collect_list(struct(rn, e1, e2))),"
            "           s -> array(s.e1, s.e2)),"
            f" array(CAST({_VIT_START[0]} AS BIGINT),"
            f"       CAST({_VIT_START[1]} AS BIGINT)),"
            f" (acc, e) -> array("
            f"   GREATEST(acc[0] + ({_VIT_T[0]}),"
            f"            acc[1] + ({_VIT_T[2]})) + e[0],"
            f"   GREATEST(acc[0] + ({_VIT_T[1]}),"
            f"            acc[1] + ({_VIT_T[3]})) + e[1]))"
        ).alias("v"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    return (
        folded.groupBy(
            F.expr(
                "CASE WHEN v[0] >= v[1] THEN 'engaged' ELSE 'idle' END"
            ).alias("decoded_state")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.expr(
                "CAST(SUM(GREATEST(v[0], v[1])) AS BIGINT)"
            ).alias("total_score_micro"),
            F.expr(
                "CAST(SUM(GREATEST(v[0], v[1])) div COUNT(*)"
                " AS BIGINT)"
            ).alias("mean_score_micro"),
        )
        .orderBy("decoded_state")
    )


# ------------------------------------------------------------------
# 2. part_knapsack_dp_plan — 0/1 knapsack DP as an array fold
# ------------------------------------------------------------------

_KNAP_CAP = 200
_KNAP_TOPK = 40


@register(
    "part_knapsack_dp_plan",
    f"""
    WITH ranked AS (
      SELECT p_brand, CAST(p_size AS BIGINT) AS w,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS v,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey)
               AS rk
      FROM part),
    series AS (
      SELECT p_brand, list([w, v] ORDER BY rk) AS items,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(w) AS BIGINT) AS total_weight,
             CAST(SUM(v) AS BIGINT) AS total_value_cents
      FROM ranked WHERE rk <= {_KNAP_TOPK} GROUP BY 1),
    solved AS (
      SELECT p_brand, n_items, total_weight, total_value_cents,
             list_reduce(
               list_prepend(
                 list_transform(range(0, {_KNAP_CAP + 1}),
                                z -> CAST(0 AS BIGINT)),
                 items),
               (acc, e) -> list_transform(range(0, {_KNAP_CAP + 1}),
                 c -> CASE WHEN c >= e[1]
                      THEN GREATEST(acc[c + 1], acc[c - e[1] + 1] + e[2])
                      ELSE acc[c + 1] END)) AS dp
      FROM series)
    SELECT p_brand, n_items, total_weight, total_value_cents,
           CAST({_KNAP_CAP} AS BIGINT) AS capacity,
           CAST(dp[{_KNAP_CAP + 1}] AS BIGINT) AS best_value_cents,
           CAST(dp[{_KNAP_CAP + 1}] * 1000000 // total_value_cents
             AS BIGINT) AS captured_value_ppm
    FROM solved ORDER BY p_brand
    """,
)
def part_knapsack_dp_plan(spark: SparkSession, sf_dir: str):
    """0/1 knapsack per brand — pick the subset of each brand's
    top-{_KNAP_TOPK} highest-priced parts (weight = p_size, value =
    retail cents) that maximizes value within a capacity-{_KNAP_CAP}
    container — solved EXACTLY by the classic DP, expressed as an
    array fold: the accumulator is the {_KNAP_CAP + 1}-wide
    best-value-per-capacity table and each item rebuilds it via
    max(skip, take) against the PREVIOUS table (a fresh array per
    step, so the 0/1 no-reuse constraint holds by construction). 25
    independent DPs run in one shuffle-free pass; per-brand work is
    {_KNAP_TOPK} x {_KNAP_CAP + 1} lambda cells, bounded by the rank
    window regardless of fact size. Exact integer cents; the
    captured-value share shows how much of the brand's candidate
    value fits."""
    p = t(spark, sf_dir, "part")
    ranked = p.select(
        "p_brand",
        F.col("p_size").cast("bigint").alias("w"),
        (dec("p_retailprice") * 100).cast("bigint").alias("v"),
        F.row_number()
        .over(
            Window.partitionBy("p_brand").orderBy(
                F.col("p_retailprice").desc(), "p_partkey"
            )
        )
        .alias("rk"),
    ).filter(F.col("rk") <= _KNAP_TOPK)
    series = ranked.groupBy("p_brand").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(rk, w, v))),"
            " s -> array(s.w, s.v))"
        ).alias("items"),
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("w").cast("bigint").alias("total_weight"),
        F.sum("v").cast("bigint").alias("total_value_cents"),
    )
    solved = series.select(
        "p_brand",
        "n_items",
        "total_weight",
        "total_value_cents",
        F.expr(
            "aggregate(items,"
            f" array_repeat(CAST(0 AS BIGINT), {_KNAP_CAP + 1}),"
            f" (acc, e) -> transform(sequence(0, {_KNAP_CAP}),"
            "   c -> IF(c >= e[0],"
            "        GREATEST(element_at(acc, c + 1),"
            "                 element_at(acc, c - CAST(e[0] AS INT) + 1)"
            "                 + e[1]),"
            "        element_at(acc, c + 1))))"
        ).alias("dp"),
    )
    return solved.select(
        "p_brand",
        "n_items",
        "total_weight",
        "total_value_cents",
        F.lit(_KNAP_CAP).cast("bigint").alias("capacity"),
        F.expr(f"CAST(dp[{_KNAP_CAP}] AS BIGINT)").alias(
            "best_value_cents"
        ),
        F.expr(
            f"CAST(dp[{_KNAP_CAP}] * 1000000 div total_value_cents"
            " AS BIGINT)"
        ).alias("captured_value_ppm"),
    ).orderBy("p_brand")


# ------------------------------------------------------------------
# 3. docs_hbos_outlier_topk — histogram-based outlier score
# ------------------------------------------------------------------

_HBOS_K = 20


@register(
    "docs_hbos_outlier_topk",
    """
    WITH feats AS (
      SELECT doc_id,
             LEAST(length(text) // 100, 50) AS len_b,
             LEAST(len(string_split_regex(trim(text), '\\s+')) // 20, 50)
               AS tok_b,
             LEAST(length(text)
               // GREATEST(len(string_split_regex(trim(text), '\\s+')), 1),
               30) AS awl_b
      FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats),
    hl AS (SELECT len_b, CAST(COUNT(*) AS BIGINT) AS c
           FROM feats GROUP BY 1),
    ht AS (SELECT tok_b, CAST(COUNT(*) AS BIGINT) AS c
           FROM feats GROUP BY 1),
    ha AS (SELECT awl_b, CAST(COUNT(*) AS BIGINT) AS c
           FROM feats GROUP BY 1),
    scored AS (
      SELECT f.doc_id, f.len_b, f.tok_b, f.awl_b,
             CAST(round(1e6 * ln(CAST(n.n AS DOUBLE) / hl.c)) AS BIGINT)
           + CAST(round(1e6 * ln(CAST(n.n AS DOUBLE) / ht.c)) AS BIGINT)
           + CAST(round(1e6 * ln(CAST(n.n AS DOUBLE) / ha.c)) AS BIGINT)
               AS hbos_micro
      FROM feats f
      CROSS JOIN n
      JOIN hl ON hl.len_b = f.len_b
      JOIN ht ON ht.tok_b = f.tok_b
      JOIN ha ON ha.awl_b = f.awl_b)
    SELECT doc_id, len_b AS len_bucket, tok_b AS tok_bucket,
           awl_b AS awl_bucket, hbos_micro
    FROM scored
    ORDER BY hbos_micro DESC, doc_id
    LIMIT {k}
    """.replace("{k}", str(_HBOS_K)),
)
def docs_hbos_outlier_topk(spark: SparkSession, sf_dir: str):
    """HBOS (histogram-based outlier score) over three document shape
    features — length, token count, mean word length, each bucketed
    onto a bounded grid — the linear-time unsupervised outlier
    detector (Goldstein-Dengel) a training-data pipeline runs where
    isolation forests are too random-dependent to reproduce: score =
    sum of per-feature surprisals ln(n / bin_count), micro-quantized
    per term so both engines sum identical integers. One scan builds
    the feature rows; the three histograms are bounded (<= 51 bins)
    and BROADCAST back; top-{_HBOS_K} via orderBy+limit
    (TakeOrderedAndProject — no global sort, no unpartitioned
    window). The independence assumption (HBOS's documented trade)
    makes it a screen, not a verdict — feed survivors to the
    Mahalanobis OOD op for the correlated check."""
    d = t(spark, sf_dir, "documents")
    toks = "size(split(trim(text), '\\\\s+'))"
    feats = d.select(
        "doc_id",
        F.expr("LEAST(length(text) div 100, 50)").alias("len_b"),
        F.expr(f"LEAST({toks} div 20, 50)").alias("tok_b"),
        F.expr(
            f"LEAST(length(text) div GREATEST({toks}, 1), 30)"
        ).alias("awl_b"),
    )
    n = feats.agg(F.count("*").cast("bigint").alias("n"))
    hl = feats.groupBy("len_b").agg(
        F.count("*").cast("bigint").alias("cl")
    )
    ht = feats.groupBy("tok_b").agg(
        F.count("*").cast("bigint").alias("ct")
    )
    ha = feats.groupBy("awl_b").agg(
        F.count("*").cast("bigint").alias("ca")
    )
    scored = (
        feats.crossJoin(F.broadcast(n))
        .join(F.broadcast(hl), "len_b")
        .join(F.broadcast(ht), "tok_b")
        .join(F.broadcast(ha), "awl_b")
        .select(
            "doc_id",
            F.col("len_b").alias("len_bucket"),
            F.col("tok_b").alias("tok_bucket"),
            F.col("awl_b").alias("awl_bucket"),
            F.expr(
                "CAST(round(1e6 * ln(CAST(n AS DOUBLE) / cl)) AS BIGINT)"
                " + CAST(round(1e6 * ln(CAST(n AS DOUBLE) / ct))"
                "   AS BIGINT)"
                " + CAST(round(1e6 * ln(CAST(n AS DOUBLE) / ca))"
                "   AS BIGINT)"
            ).alias("hbos_micro"),
        )
    )
    return scored.orderBy(
        F.col("hbos_micro").desc(), "doc_id"
    ).limit(_HBOS_K)


# ------------------------------------------------------------------
# 4. orders_granger_lag_causality — single-lag Granger test
# ------------------------------------------------------------------


@register(
    "orders_granger_lag_causality",
    """
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS HUGEINT) AS rev,
             CAST(COUNT(*) AS HUGEINT) AS cnt
      FROM orders GROUP BY 1),
    lagd AS (
      SELECT a.rev AS y, b.rev AS y1, b.cnt AS x1
      FROM m a JOIN m b ON b.ym = a.ym - 1),
    mom AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(y) AS sy, SUM(y1) AS sy1, SUM(x1) AS sx1,
             SUM(y * y) AS syy, SUM(y1 * y1) AS sy1y1,
             SUM(x1 * x1) AS sx1x1,
             SUM(y * y1) AS syy1, SUM(y * x1) AS syx1,
             SUM(y1 * x1) AS sy1x1
      FROM lagd),
    covs AS (
      SELECT CAST(n AS BIGINT) AS n_months_used,
             CAST(n * syy1 - sy * sy1 AS DOUBLE) AS c_y_y1,
             CAST(n * syx1 - sy * sx1 AS DOUBLE) AS c_y_x1,
             CAST(n * sy1x1 - sy1 * sx1 AS DOUBLE) AS c_y1_x1,
             CAST(n * syy - sy * sy AS DOUBLE) AS v_y,
             CAST(n * sy1y1 - sy1 * sy1 AS DOUBLE) AS v_y1,
             CAST(n * sx1x1 - sx1 * sx1 AS DOUBLE) AS v_x1
      FROM mom),
    rs AS (
      SELECT n_months_used,
             c_y_y1 / sqrt(v_y * v_y1) AS r1,
             c_y_x1 / sqrt(v_y * v_x1) AS r2,
             c_y1_x1 / sqrt(v_y1 * v_x1) AS r3
      FROM covs),
    pr AS (
      SELECT n_months_used, r1, r2,
             (r2 - r1 * r3) / sqrt((1 - r1 * r1) * (1 - r3 * r3)) AS rp
      FROM rs)
    SELECT n_months_used,
           CAST(round(1e6 * r1) AS BIGINT) AS autocorr_micro,
           CAST(round(1e6 * r2) AS BIGINT) AS rawcorr_micro,
           CAST(round(1e6 * rp) AS BIGINT) AS partial_r_micro,
           CAST(round(1e3 * rp * sqrt((n_months_used - 3)
             / (1 - rp * rp))) AS BIGINT) AS t_stat_milli,
           CAST(CASE WHEN abs(rp * sqrt((n_months_used - 3)
             / (1 - rp * rp))) > 1.96 THEN 1 ELSE 0 END AS INT)
             AS causal_5pct
    FROM pr
    """,
)
def orders_granger_lag_causality(spark: SparkSession, sf_dir: str):
    """Single-lag Granger causality: does last month's ORDER VOLUME
    predict this month's REVENUE beyond what revenue's own lag
    explains? For one lag the F test is equivalent to the
    significance of the partial correlation of y_t with x_{t-1}
    controlling y_{t-1} (t = r_p sqrt((n-3)/(1-r_p^2))), which needs
    only exact second moments: one fact scan to month grain, a
    calendar-bounded 1-month lag self-join, then ten integer moment
    sums in decimal(38,0)/HUGEINT (monthly-cents squares pass 1e26
    at sf100). Doubles enter ONCE, in the final correlation ratios
    from identically-reduced integers. Emitted alongside: the raw
    lag correlation, so confounding-by-trend (raw high, partial ~0)
    is visible."""
    o = t(spark, sf_dir, "orders")
    big = "decimal(38,0)"
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "ym"
        )
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast(big)
        .alias("rev"),
        F.count("*").cast(big).alias("cnt"),
    )
    b = m.select(
        (F.col("ym") + 1).alias("ym"),
        F.col("rev").alias("y1"),
        F.col("cnt").alias("x1"),
    )
    lagd = m.join(b, "ym").select(F.col("rev").alias("y"), "y1", "x1")
    mom = lagd.agg(
        F.count("*").cast(big).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("y1").alias("sy1"),
        F.sum("x1").alias("sx1"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).alias("sy1y1"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("y") * F.col("y1")).alias("syy1"),
        F.sum(F.col("y") * F.col("x1")).alias("syx1"),
        F.sum(F.col("y1") * F.col("x1")).alias("sy1x1"),
    )
    covs = mom.select(
        F.col("n").cast("bigint").alias("n_months_used"),
        F.expr("CAST(n * syy1 - sy * sy1 AS DOUBLE)").alias("c_y_y1"),
        F.expr("CAST(n * syx1 - sy * sx1 AS DOUBLE)").alias("c_y_x1"),
        F.expr("CAST(n * sy1x1 - sy1 * sx1 AS DOUBLE)").alias(
            "c_y1_x1"
        ),
        F.expr("CAST(n * syy - sy * sy AS DOUBLE)").alias("v_y"),
        F.expr("CAST(n * sy1y1 - sy1 * sy1 AS DOUBLE)").alias("v_y1"),
        F.expr("CAST(n * sx1x1 - sx1 * sx1 AS DOUBLE)").alias("v_x1"),
    )
    rs = covs.select(
        "n_months_used",
        F.expr("c_y_y1 / sqrt(v_y * v_y1)").alias("r1"),
        F.expr("c_y_x1 / sqrt(v_y * v_x1)").alias("r2"),
        F.expr("c_y1_x1 / sqrt(v_y1 * v_x1)").alias("r3"),
    )
    pr = rs.select(
        "n_months_used",
        "r1",
        "r2",
        F.expr(
            "(r2 - r1 * r3) / sqrt((1 - r1 * r1) * (1 - r3 * r3))"
        ).alias("rp"),
    )
    return pr.select(
        "n_months_used",
        F.expr("CAST(round(1e6 * r1) AS BIGINT)").alias(
            "autocorr_micro"
        ),
        F.expr("CAST(round(1e6 * r2) AS BIGINT)").alias(
            "rawcorr_micro"
        ),
        F.expr("CAST(round(1e6 * rp) AS BIGINT)").alias(
            "partial_r_micro"
        ),
        F.expr(
            "CAST(round(1e3 * rp * sqrt((n_months_used - 3)"
            " / (1 - rp * rp))) AS BIGINT)"
        ).alias("t_stat_milli"),
        F.expr(
            "CAST(CASE WHEN abs(rp * sqrt((n_months_used - 3)"
            " / (1 - rp * rp))) > 1.96 THEN 1 ELSE 0 END AS INT)"
        ).alias("causal_5pct"),
    )


# ------------------------------------------------------------------
# 5. nation_borda_priority_consensus — rank aggregation
# ------------------------------------------------------------------


@register(
    "nation_borda_priority_consensus",
    """
    WITH rev AS (
      SELECT c_nationkey AS nat, o_orderpriority AS priority,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT nat, priority,
             ROW_NUMBER() OVER (PARTITION BY nat
                                ORDER BY rev DESC, priority) AS rk
      FROM rev),
    borda AS (
      SELECT priority,
             CAST(SUM(5 - rk) AS BIGINT) AS borda_points,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_votes
      FROM ranked GROUP BY 1)
    SELECT priority, borda_points, n_first_votes,
           CAST(ROW_NUMBER() OVER (ORDER BY borda_points DESC, priority)
             AS BIGINT) AS consensus_rank
    FROM borda ORDER BY consensus_rank
    """,
)
def nation_borda_priority_consensus(spark: SparkSession, sf_dir: str):
    """Borda-count rank aggregation: each nation 'votes' a ranking of
    the five order priorities by its revenue, and the Borda points
    (5 - rank, summed across nations) give the consensus ranking —
    the social-choice aggregation that is robust where plurality
    (first-place votes, emitted alongside) flips on vote splitting.
    The shape is the canonical two-level rank-then-aggregate: a
    PARTITIONED rank window on the bounded 25 x 5 (nation, priority)
    grain, a 5-row Borda fold, and a final rank over 5 rows. One fact
    scan; every later stage is dimension-bounded."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum((dec("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    ranked = rev.select(
        "nat",
        "priority",
        F.row_number()
        .over(
            Window.partitionBy("nat").orderBy(
                F.col("rev").desc(), "priority"
            )
        )
        .alias("rk"),
    )
    borda = ranked.groupBy("priority").agg(
        F.sum(5 - F.col("rk")).cast("bigint").alias("borda_points"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_first_votes"),
    )
    return borda.select(
        "priority",
        "borda_points",
        "n_first_votes",
        F.row_number()
        .over(
            Window.orderBy(F.col("borda_points").desc(), "priority")
        )
        .cast("bigint")
        .alias("consensus_rank"),
    ).orderBy("consensus_rank")


# ------------------------------------------------------------------
# 6. orders_hierarchical_forecast_reconcile — M5-style coherence
# ------------------------------------------------------------------


@register(
    "orders_hierarchical_forecast_reconcile",
    """
    WITH nm AS (
      SELECT n_nationkey, n_name, r_name
      FROM nation JOIN region ON r_regionkey = n_regionkey),
    mrev AS (
      SELECT c_nationkey AS nat,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2),
    evalm AS (SELECT MAX(ym) AS m FROM mrev),
    nat_fc AS (
      SELECT mr.nat, mr.rev AS fc
      FROM mrev mr CROSS JOIN evalm e WHERE mr.ym = e.m - 12),
    actual AS (
      SELECT nm.r_name AS region, CAST(SUM(mr.rev) AS BIGINT) AS actual
      FROM mrev mr CROSS JOIN evalm e
      JOIN nm ON nm.n_nationkey = mr.nat
      WHERE mr.ym = e.m GROUP BY 1),
    bottom_up AS (
      SELECT nm.r_name AS region, CAST(SUM(nf.fc) AS BIGINT) AS bu_fc
      FROM nat_fc nf JOIN nm ON nm.n_nationkey = nf.nat GROUP BY 1),
    direct AS (
      SELECT nm.r_name AS region,
             CAST(SUM(mr.rev) // 12 AS BIGINT) AS dir_fc
      FROM mrev mr CROSS JOIN evalm e
      JOIN nm ON nm.n_nationkey = mr.nat
      WHERE mr.ym >= e.m - 12 AND mr.ym < e.m GROUP BY 1)
    SELECT a.region, a.actual AS actual_cents,
           d.dir_fc AS direct_fc_cents,
           b.bu_fc AS bottomup_fc_cents,
           CAST(CASE WHEN d.dir_fc >= b.bu_fc THEN d.dir_fc - b.bu_fc
                ELSE b.bu_fc - d.dir_fc END AS BIGINT)
             AS coherence_gap_cents,
           CAST(CASE WHEN d.dir_fc >= a.actual THEN d.dir_fc - a.actual
                ELSE a.actual - d.dir_fc END AS BIGINT)
             AS ae_direct_cents,
           CAST(CASE WHEN b.bu_fc >= a.actual THEN b.bu_fc - a.actual
                ELSE a.actual - b.bu_fc END AS BIGINT)
             AS ae_bottomup_cents
    FROM actual a
    JOIN direct d ON d.region = a.region
    JOIN bottom_up b ON b.region = a.region
    ORDER BY a.region
    """,
)
def orders_hierarchical_forecast_reconcile(
    spark: SparkSession, sf_dir: str
):
    """Hierarchical forecast coherence check (the M5-competition
    problem): forecast the latest month's revenue per REGION two
    ways — directly (trailing-12-month mean at region level) and
    bottom-up (seasonal-naive per NATION, summed up the hierarchy) —
    and report the coherence gap plus each method's absolute error
    against the realized month. Incoherent forecasts (gap > 0) are
    why reconciliation layers exist; emitting both errors shows
    which level's signal wins. One fact scan to (nation, month)
    grain; the evaluation month is the data's own max month (exact,
    engine-identical); every later stage is the 25-nation / 5-region
    dimension grain. Exact integer cents."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    nm = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "r_name")
    mrev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("ym"),
        )
        .agg(
            F.sum((dec("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    # (nation, month) grain is bounded (~25 x calendar); persist so the
    # actual/bottom-up/direct branches and the max-month probe replay a
    # 2k-row cache, not four fact-grain join+aggregates
    mrev = mrev.persist()
    evalm = mrev.agg(F.max("ym").alias("m"))
    mr = mrev.crossJoin(F.broadcast(evalm)).join(
        F.broadcast(nm), mrev.nat == nm.n_nationkey
    )
    actual = (
        mr.filter(F.col("ym") == F.col("m"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.sum("rev").cast("bigint").alias("actual_cents"))
    )
    bottom_up = (
        mr.filter(F.col("ym") == F.col("m") - 12)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.sum("rev").cast("bigint").alias("bottomup_fc_cents"))
    )
    direct = (
        mr.filter(
            (F.col("ym") >= F.col("m") - 12) & (F.col("ym") < F.col("m"))
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.expr("CAST(SUM(rev) div 12 AS BIGINT)").alias(
                "direct_fc_cents"
            )
        )
    )
    return (
        actual.join(direct, "region")
        .join(bottom_up, "region")
        .select(
            "region",
            "actual_cents",
            "direct_fc_cents",
            "bottomup_fc_cents",
            F.expr(
                "CAST(CASE WHEN direct_fc_cents >= bottomup_fc_cents"
                " THEN direct_fc_cents - bottomup_fc_cents"
                " ELSE bottomup_fc_cents - direct_fc_cents END"
                " AS BIGINT)"
            ).alias("coherence_gap_cents"),
            F.expr(
                "CAST(CASE WHEN direct_fc_cents >= actual_cents"
                " THEN direct_fc_cents - actual_cents"
                " ELSE actual_cents - direct_fc_cents END AS BIGINT)"
            ).alias("ae_direct_cents"),
            F.expr(
                "CAST(CASE WHEN bottomup_fc_cents >= actual_cents"
                " THEN bottomup_fc_cents - actual_cents"
                " ELSE actual_cents - bottomup_fc_cents END AS BIGINT)"
            ).alias("ae_bottomup_cents"),
        )
        .orderBy("region")
    )
