"""Round-7x operators: a Poisson scan statistic, average-hash payload
dedup, trading-day adjustment, Holm step-down multiple testing, trade
reciprocity metrics, and a varbyte postings-compression estimate.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. events_poisson_scan_statistic — Kulldorff-style burst scan
# ------------------------------------------------------------------

_SCAN_WINDOWS = (1, 3, 7)


@register(
    "events_poisson_scan_statistic",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    idx AS (
      SELECT datediff('day', (SELECT MIN(day) FROM daily), day) AS i,
             day, x
      FROM daily),
    tot AS (SELECT CAST(SUM(x) AS BIGINT) AS nn,
                   CAST(MAX(i) + 1 AS BIGINT) AS nd
            FROM idx),
    ws AS (SELECT UNNEST([{', '.join(str(w) for w in _SCAN_WINDOWS)}])
             AS w),
    wins AS (
      SELECT ws.w, a.i AS start_i, a.day AS start_day,
             CAST(SUM(b.x) AS BIGINT) AS cin,
             CAST(COUNT(*) AS BIGINT) AS days_in
      FROM idx a CROSS JOIN ws
      JOIN idx b ON b.i >= a.i AND b.i < a.i + ws.w
      GROUP BY 1, 2, 3),
    llr AS (
      SELECT w, start_day, cin,
             CAST(round(1e3 * (
               cin * ln(CAST(cin AS DOUBLE)
                 / (CAST((SELECT nn FROM tot) AS DOUBLE) * days_in
                    / (SELECT nd FROM tot)))
               + ((SELECT nn FROM tot) - cin)
                 * ln((CAST((SELECT nn FROM tot) AS DOUBLE) - cin)
                   / ((SELECT nn FROM tot)
                      - CAST((SELECT nn FROM tot) AS DOUBLE) * days_in
                        / (SELECT nd FROM tot)))))
               AS BIGINT) AS llr_milli
      FROM wins
      WHERE days_in = w
        AND cin * (SELECT nd FROM tot)
            > (SELECT nn FROM tot) * days_in)
    SELECT w AS window_days,
           strftime(MIN(CASE WHEN llr_milli = mx THEN start_day END),
                    '%Y-%m-%d') AS peak_start_day,
           CAST(MAX(CASE WHEN llr_milli = mx THEN cin END) AS BIGINT)
             AS peak_count,
           CAST(mx AS BIGINT) AS max_llr_milli
    FROM (SELECT *, MAX(llr_milli) OVER (PARTITION BY w) AS mx
          FROM llr)
    GROUP BY w, mx ORDER BY w
    """,
)
def events_poisson_scan_statistic(spark: SparkSession, sf_dir: str):
    """Poisson scan statistic (Kulldorff's spatial-scan LLR on the
    time axis): for window lengths {_SCAN_WINDOWS}, find the
    interval whose event count most exceeds its expectation under a
    homogeneous Poisson process, scored by the likelihood ratio
    c ln(c/E) + (N-c) ln((N-c)/(N-E)) — the epidemiology/fraud
    surveillance detector that beats fixed-threshold alerts because
    the window COMPETES over all placements and sizes. Candidate
    windows come from a bounded day-grain interval self-join
    (calendar x 3 lengths); only over-dense complete windows score;
    LLR terms milli-quantize from identically-derived doubles. One
    fact scan to day grain; output = argmax per window length."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    mn = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        F.datediff("day", "d0").cast("bigint").alias("i"), "day", "x"
    )
    idx = idx.persist()
    tot = idx.agg(
        F.sum("x").cast("bigint").alias("nn"),
        (F.max("i") + 1).cast("bigint").alias("nd"),
    )
    ws = spark.createDataFrame(
        [(w,) for w in _SCAN_WINDOWS], "w long"
    )
    b = idx.select(F.col("i").alias("i2"), F.col("x").alias("x2"))
    wins = (
        idx.crossJoin(F.broadcast(ws))
        .join(
            b,
            (F.col("i2") >= F.col("i"))
            & (F.col("i2") < F.col("i") + F.col("w")),
        )
        .groupBy("w", F.col("i").alias("start_i"), "day")
        .agg(
            F.sum("x2").cast("bigint").alias("cin"),
            F.count("*").cast("bigint").alias("days_in"),
        )
    )
    llr = (
        wins.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("days_in") == F.col("w"))
            & (F.col("cin") * F.col("nd") > F.col("nn") * F.col("days_in"))
        )
        .select(
            "w",
            F.col("day").alias("start_day"),
            "cin",
            F.expr(
                "CAST(round(1e3 * ("
                " cin * ln(CAST(cin AS DOUBLE)"
                "  / (CAST(nn AS DOUBLE) * days_in / nd))"
                " + (nn - cin) * ln((CAST(nn AS DOUBLE) - cin)"
                "  / (nn - CAST(nn AS DOUBLE) * days_in / nd))))"
                " AS BIGINT)"
            ).alias("llr_milli"),
        )
    )
    llr = llr.select(
        "w",
        "start_day",
        "cin",
        "llr_milli",
        F.max("llr_milli").over(Window.partitionBy("w")).alias("mx"),
    )
    return (
        llr.groupBy(F.col("w").alias("window_days"), "mx")
        .agg(
            F.date_format(
                F.min(
                    F.when(
                        F.col("llr_milli") == F.col("mx"),
                        F.col("start_day"),
                    )
                ),
                "yyyy-MM-dd",
            ).alias("peak_start_day"),
            F.max(
                F.when(
                    F.col("llr_milli") == F.col("mx"), F.col("cin")
                )
            )
            .cast("bigint")
            .alias("peak_count"),
        )
        .select(
            "window_days",
            "peak_start_day",
            "peak_count",
            F.col("mx").cast("bigint").alias("max_llr_milli"),
        )
        .orderBy("window_days")
    )


# ------------------------------------------------------------------
# 2. multimodal_payload_ahash_dedup — perceptual-hash near-dup
# ------------------------------------------------------------------

_AH_BLOCKS = 64
_AH_HAM_MAX = 3
_AH_BANDS = 4  # 16-bit bands; ham<=3 over 4 bands => one band matches exactly

_AH_CAND_UNION = "\n    UNION ALL\n".join(
    f"""    SELECT a.doc_id AS da, b.doc_id AS db,
           a.s0 AS ha0, a.s1 AS ha1, a.s2 AS ha2, a.s3 AS ha3,
           b.s0 AS hb0, b.s1 AS hb1, b.s2 AS hb2, b.s3 AS hb3
        FROM sig a JOIN sig b
          ON a.s{j} = b.s{j} AND a.doc_id < b.doc_id"""
    for j in range(_AH_BANDS)
)


@register(
    "multimodal_payload_ahash_dedup",
    f"""
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS h FROM documents),
    blocks AS (
      SELECT doc_id, u.k AS blk,
             CAST(COALESCE(list_sum(list_transform(
               list_transform(
                 range(1, (GREATEST(len(h) // (2 * {_AH_BLOCKS}), 1) + 5)
                          // 6 + 1),
                 i -> CAST('0x' || h[
                   (u.k * (len(h) // (2 * {_AH_BLOCKS}))
                    + (i - 1) * 6) * 2 + 1:
                   (u.k * (len(h) // (2 * {_AH_BLOCKS}))
                    + (i - 1) * 6) * 2
                   + LEAST(12, (GREATEST(len(h) // (2 * {_AH_BLOCKS}), 1)
                                - (i - 1) * 6) * 2)] AS BIGINT)),
               v -> (v & 255) + ((v >> 8) & 255) + ((v >> 16) & 255)
                  + ((v >> 24) & 255) + ((v >> 32) & 255)
                  + ((v >> 40) & 255))), 0) AS BIGINT)
               AS bsum
      FROM hx, UNNEST(range({_AH_BLOCKS})) AS u(k)),
    bits AS (
      SELECT doc_id, blk // 16 AS band,
             CASE WHEN bsum * {_AH_BLOCKS}
               > SUM(bsum) OVER (PARTITION BY doc_id)
             THEN (1 << CAST(blk % 16 AS INT)) ELSE 0 END AS bitv
      FROM blocks),
    sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN band = 0 THEN bitv ELSE 0 END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN band = 1 THEN bitv ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN band = 2 THEN bitv ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN band = 3 THEN bitv ELSE 0 END) AS BIGINT) AS s3
      FROM bits GROUP BY 1),
    cand AS (
      SELECT DISTINCT da, db, ha0, ha1, ha2, ha3, hb0, hb1, hb2, hb3
      FROM (
{_AH_CAND_UNION})),
    dups AS (
      SELECT da, db FROM cand
      WHERE bit_count(xor(ha0, hb0)) + bit_count(xor(ha1, hb1))
          + bit_count(xor(ha2, hb2)) + bit_count(xor(ha3, hb3))
          <= {_AH_HAM_MAX})
    SELECT CAST((SELECT COUNT(*) FROM sig) AS BIGINT) AS n_payloads,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT)
             AS n_candidates,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
           CAST(COUNT(DISTINCT db) AS BIGINT) AS n_docs_removable
    FROM dups
    """,
)
def multimodal_payload_ahash_dedup(spark: SparkSession, sf_dir: str):
    """Average-hash (aHash) near-duplicate detection over opaque
    binary payloads — the perceptual-hash dedup an image/media
    pipeline runs without decoding: the payload's bytes split into
    64 blocks, each block's byte-sum compares against the payload
    mean to set one signature bit, and near-dups are signature
    pairs within Hamming distance 3, found by LSH band blocking
    over FOUR 16-bit bands (any pair within distance 3 must match
    at least one band exactly — the pigeonhole guarantee, so
    candidate generation is an equi-join, never all-pairs).
    Widened from the original 16-bit/2x8 design (VERDICT r6): with
    8-bit bands the buckets scale as N/256 and candidates as
    ~N^2/128 — quadratic at corpus scale; 16-bit bands put bucket
    cardinality at ~N/65536 so the candidate set stays near-linear
    on a billion-payload corpus. The signature is carried as four
    16-bit band columns rather than one 64-bit word — same
    information, and no sign-bit hazard on bit 63 in either engine.
    The byte path stays UDF-free via hex() arithmetic (the
    entropy-screen pattern); per-band XOR popcounts verify
    candidates. Payload-size-linear block fold, then
    signature-grain joins."""
    d = t(spark, sf_dir, "documents")
    # doc_id hash-repartition before the fold: the fold runs in the
    # scan's stage, and a small parquet file packs into ONE task
    # (maxPartitionBytes) — serializing the whole corpus's fold onto
    # a single core (measured 6.2s -> 0.9s at sf0.1). At cluster
    # scale the scan is already many-partition and this one payload
    # shuffle pre-spreads the later per-doc window/groupBy anyway.
    hx = d.select(
        "doc_id", F.hex(F.encode(F.col("text"), "utf-8")).alias("h")
    ).repartition(32, "doc_id")
    # 64-way block crossJoin: the block-fold total work is one pass
    # over the payload's hex pairs regardless of block count (each of
    # the 64 rows folds 1/64th of the payload), and the crossJoin form
    # runs codegen'd where a nested transform-of-aggregates executes
    # interpreted (measured on the 16-block original: 9.5s vs 18.9s).
    # The fold reads SIX bytes per conv() (48-bit chunk, then six
    # shift-mask adds) via transform-then-aggregate so each chunk
    # value is parsed once — conv() dominates the interpreted-lambda
    # cost, so this is ~6x fewer expensive calls than per-pair conv.
    ks = spark.range(_AH_BLOCKS).select(F.col("id").alias("blk"))
    bs = f"(length(h) div (2 * {_AH_BLOCKS}))"
    bn = f"GREATEST({bs}, 1)"
    blocks = hx.crossJoin(F.broadcast(ks)).select(
        "doc_id",
        "blk",
        F.expr(
            "CAST(COALESCE(aggregate(transform("
            f"sequence(1, CAST(({bn} + 5) div 6 AS INT)),"
            " i -> CAST(conv(substring(h,"
            f" (CAST(blk AS INT) * {bs} + (i - 1) * 6) * 2 + 1,"
            f" CAST(LEAST(12, ({bn} - (i - 1) * 6) * 2) AS INT)),"
            " 16, 10) AS BIGINT)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc"
            " + (v & 255) + ((v >> 8) & 255) + ((v >> 16) & 255)"
            " + ((v >> 24) & 255) + ((v >> 32) & 255)"
            " + ((v >> 40) & 255)), 0) AS BIGINT)"
        ).alias("bsum"),
    )
    bits = blocks.select(
        "doc_id",
        F.expr("blk div 16").alias("band"),
        F.sum("bsum").over(Window.partitionBy("doc_id")).alias("tot"),
        "bsum",
        "blk",
    ).select(
        "doc_id",
        "band",
        F.expr(
            f"CASE WHEN bsum * {_AH_BLOCKS} > tot"
            " THEN (CAST(1 AS BIGINT) << CAST(blk % 16 AS INT))"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("bitv"),
    )
    # persist the signature table (doc_id + four 16-bit ints — tiny):
    # it feeds four join arms AND the n_payloads count; without the
    # cache the payload fold re-executes per consumer
    sig = bits.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("band") == j, F.col("bitv")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"s{j}")
            for j in range(_AH_BANDS)
        ]
    ).persist()
    a_cols = [F.col("doc_id").alias("da")] + [
        F.col(f"s{j}").alias(f"ha{j}") for j in range(_AH_BANDS)
    ]
    bb = sig.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"s{j}").alias(f"hb{j}") for j in range(_AH_BANDS)],
    )
    arms = [
        sig.join(
            bb,
            (F.col(f"s{j}") == F.col(f"hb{j}"))
            & (F.col("doc_id") < F.col("db")),
        ).select(*a_cols, "db", *[f"hb{k}" for k in range(_AH_BANDS)])
        for j in range(_AH_BANDS)
    ]
    cand = arms[0]
    for arm in arms[1:]:
        cand = cand.unionByName(arm)
    cand = cand.distinct().persist()
    n_pay = sig.agg(F.count("*").cast("bigint").alias("n_payloads"))
    n_cand = cand.agg(
        F.count("*").cast("bigint").alias("n_candidates")
    )
    ham = " + ".join(
        f"bit_count(ha{j} ^ hb{j})" for j in range(_AH_BANDS)
    )
    dups = cand.filter(F.expr(f"{ham} <= {_AH_HAM_MAX}"))
    return (
        dups.agg(
            F.count("*").cast("bigint").alias("n_dup_pairs"),
            F.count_distinct("db")
            .cast("bigint")
            .alias("n_docs_removable"),
        )
        .crossJoin(F.broadcast(n_pay))
        .crossJoin(F.broadcast(n_cand))
        .select(
            "n_payloads", "n_candidates", "n_dup_pairs",
            "n_docs_removable",
        )
    )


# ------------------------------------------------------------------
# 3. orders_trading_day_adjustment — calendar-effect correction
# ------------------------------------------------------------------


@register(
    "orders_trading_day_adjustment",
    """
    WITH m AS (
      SELECT year(o_orderdate) AS yy, month(o_orderdate) AS mm,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2),
    spine AS (
      SELECT yy, mm,
             CAST(SUM(CASE WHEN dayofweek(make_date(yy, mm, dd)) NOT IN
               (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS weekdays
      FROM (SELECT DISTINCT yy, mm FROM m) ym,
      UNNEST(range(1, 32)) AS u(dd)
      WHERE dd <= day(last_day(make_date(yy, mm, 1)))
      GROUP BY 1, 2),
    adj AS (
      SELECT m.yy, m.mm, m.rev, s.weekdays,
             CAST(m.rev * 21 // s.weekdays AS BIGINT) AS adj_rev
      FROM m JOIN spine s ON s.yy = m.yy AND s.mm = m.mm)
    SELECT CAST(yy AS BIGINT) AS year, CAST(mm AS BIGINT) AS month,
           rev AS revenue_cents, weekdays,
           adj_rev AS adjusted_revenue_cents,
           CAST((adj_rev - rev) * 1000000 // rev AS BIGINT)
             AS adjustment_ppm
    FROM adj
    ORDER BY year, month
    """,
)
def orders_trading_day_adjustment(spark: SparkSession, sf_dir: str):
    """Trading-day adjustment of monthly revenue — the calendar
    correction every official statistic applies before
    month-over-month comparison (a 23-weekday March mechanically
    beats a 20-weekday February by ~15% with zero underlying
    change): each month's revenue rescales to a standard 21-weekday
    month by its actual weekday count, computed from a generated
    calendar spine (month x day-of-month explode, bounded by the
    calendar, engine-identical dayofweek/last_day semantics
    verified by the oracle match itself). Exact integer cents; the
    adjustment_ppm column isolates how much of each month's move
    was calendar artifact. One fact scan + a bounded spine."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("yy"),
        F.month("o_orderdate").alias("mm"),
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    ym = m.select("yy", "mm").distinct()
    dd = spark.range(1, 32).select(F.col("id").alias("dd"))
    spine = (
        ym.crossJoin(F.broadcast(dd))
        .filter(
            F.expr(
                "dd <= day(last_day(make_date(yy, mm, 1)))"
            )
        )
        .groupBy("yy", "mm")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN dayofweek(make_date(yy, mm,"
                    " CAST(dd AS INT))) NOT IN (1, 7)"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("weekdays")
        )
    )
    adj = m.join(spine, ["yy", "mm"]).select(
        "yy",
        "mm",
        "rev",
        "weekdays",
        F.expr("CAST(rev * 21 div weekdays AS BIGINT)").alias(
            "adj_rev"
        ),
    )
    return adj.select(
        F.col("yy").cast("bigint").alias("year"),
        F.col("mm").cast("bigint").alias("month"),
        F.col("rev").alias("revenue_cents"),
        "weekdays",
        F.col("adj_rev").alias("adjusted_revenue_cents"),
        F.expr(
            "CAST((adj_rev - rev) * 1000000 div rev AS BIGINT)"
        ).alias("adjustment_ppm"),
    ).orderBy("year", "month")


# ------------------------------------------------------------------
# 4. customer_segment_holm_ztests — step-down multiple testing
# ------------------------------------------------------------------

# two-sided critical z for alpha/(m - rank + 1), alpha = 0.05, m = 5:
# 0.05 -> 1.960, 0.025 -> 2.241, 0.0167 -> 2.394, 0.0125 -> 2.498,
# 0.01 -> 2.576 (fixed literals, identical in both engines)
_HOLM_Z_MILLI = (2576, 2498, 2394, 2241, 1960)


def _holm_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = {i + 1} THEN {z}"
        for i, z in enumerate(_HOLM_Z_MILLI)
    )
    return f"CASE {whens} END"


@register(
    "customer_segment_holm_ztests",
    f"""
    WITH seg AS (
      SELECT c_mktsegment AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS HUGEINT) AS s,
             SUM(CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
               AS BIGINT) AS HUGEINT)
               * CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                 AS BIGINT)) AS ss
      FROM customer GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS HUGEINT) AS st
      FROM seg),
    z AS (
      SELECT grp, n,
             CAST(round(1e3 * (CAST(s AS DOUBLE) / n
                 - (CAST(t.st AS DOUBLE) - CAST(s AS DOUBLE))
                   / (t.nn - n))
               / sqrt((CAST(ss AS DOUBLE) * n - CAST(s AS DOUBLE) * s)
                 / (CAST(n AS DOUBLE) * n) / n * 2)) AS BIGINT)
               AS z_milli
      FROM seg CROSS JOIN tot t),
    ranked AS (
      SELECT grp, n, z_milli,
             ROW_NUMBER() OVER (ORDER BY abs(z_milli) DESC, grp)
               AS rk
      FROM z),
    flags AS (
      SELECT grp, n, z_milli, rk,
             {_holm_case('rk')} AS crit_milli,
             CASE WHEN abs(z_milli) > {_holm_case('rk')}
               THEN 1 ELSE 0 END AS raw_reject
      FROM ranked)
    SELECT f.grp AS segment, f.n AS n_customers, f.z_milli,
           CAST(f.rk AS BIGINT) AS holm_rank,
           CAST(f.crit_milli AS BIGINT) AS critical_z_milli,
           CAST(CASE WHEN NOT EXISTS (
               SELECT 1 FROM flags g
               WHERE g.rk <= f.rk AND g.raw_reject = 0)
             THEN 1 ELSE 0 END AS INT) AS holm_significant
    FROM flags f ORDER BY holm_rank
    """,
)
def customer_segment_holm_ztests(spark: SparkSession, sf_dir: str):
    """Holm step-down multiple-testing correction over the five
    per-segment balance z-tests (segment mean vs rest-of-population
    mean): tests sort by |z|, compare against increasingly lenient
    critical values alpha/(m-k+1) — embedded as fixed z literals, no
    run-time quantile functions — and rejection STOPS at the first
    failure (the step-down rule that controls family-wise error
    where five naive 5% tests would fire ~23% of the time on pure
    noise). The per-segment moments are one customer scan in
    HUGEINT/decimal(38,0); the step-down cumulative-all-rejected
    rule is an EXISTS over the bounded 5-row rank table. The z
    denominator uses the conservative equal-variance 2/n form
    (documented simplification)."""
    c = t(spark, sf_dir, "customer")
    big = "decimal(38,0)"
    bal = (dec("c_acctbal") * 100).cast("bigint")
    seg = c.groupBy(F.col("c_mktsegment").alias("grp")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(bal).cast(big).alias("s"),
        F.sum(bal.cast(big) * bal).alias("ss"),
    )
    tot = seg.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast(big).alias("st"),
    )
    z = seg.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n",
        F.expr(
            "CAST(round(1e3 * (CAST(s AS DOUBLE) / n"
            " - (CAST(st AS DOUBLE) - CAST(s AS DOUBLE)) / (nn - n))"
            " / sqrt((CAST(ss AS DOUBLE) * n - CAST(s AS DOUBLE) * s)"
            " / (CAST(n AS DOUBLE) * n) / n * 2)) AS BIGINT)"
        ).alias("z_milli"),
    )
    ranked = z.select(
        "grp",
        "n",
        "z_milli",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("z_milli")).desc(), "grp"))
        .alias("rk"),
    )
    flags = ranked.select(
        "grp",
        "n",
        "z_milli",
        "rk",
        F.expr(_holm_case("rk")).alias("crit_milli"),
        F.expr(
            f"CASE WHEN abs(z_milli) > {_holm_case('rk')}"
            " THEN 1 ELSE 0 END"
        ).alias("raw_reject"),
    )
    # step-down: significant iff every test at rank <= rk rejected
    g = flags.select(
        F.col("rk").alias("rk2"), F.col("raw_reject").alias("rj2")
    )
    steps = (
        flags.join(g, F.col("rk2") <= F.col("rk"))
        .groupBy("grp", "n", "z_milli", "rk", "crit_milli")
        .agg(F.min("rj2").alias("all_rejected"))
    )
    return steps.select(
        F.col("grp").alias("segment"),
        F.col("n").alias("n_customers"),
        "z_milli",
        F.col("rk").cast("bigint").alias("holm_rank"),
        F.col("crit_milli").cast("bigint").alias("critical_z_milli"),
        F.col("all_rejected").cast("int").alias("holm_significant"),
    ).orderBy("holm_rank")


# ------------------------------------------------------------------
# 5. nation_trade_reciprocity — directed-network structure
# ------------------------------------------------------------------


@register(
    "nation_trade_reciprocity",
    """
    WITH flows AS (
      SELECT s.s_nationkey AS i, c.c_nationkey AS j,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS f
      FROM lineitem
      JOIN orders o ON o.o_orderkey = l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l_suppkey
      WHERE s.s_nationkey != c.c_nationkey
      GROUP BY 1, 2),
    pairs AS (
      SELECT a.i, a.j, a.f AS fij, COALESCE(b.f, 0) AS fji
      FROM flows a LEFT JOIN flows b ON b.i = a.j AND b.j = a.i
      WHERE a.i < a.j
      UNION ALL
      SELECT a.j, a.i, COALESCE(b.f, 0), a.f
      FROM flows a LEFT JOIN flows b ON b.i = a.j AND b.j = a.i
      WHERE a.i > a.j AND b.i IS NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dyads,
           CAST(SUM(CASE WHEN fij > 0 AND fji > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_reciprocal,
           CAST(SUM(CASE WHEN fij > 0 AND fji > 0 THEN 1 ELSE 0 END)
             * 1000000 // COUNT(*) AS BIGINT) AS dyad_reciprocity_ppm,
           CAST(SUM(2 * LEAST(fij, fji)) * 1000000
             // SUM(fij + fji) AS BIGINT) AS weighted_reciprocity_ppm,
           CAST(COUNT(*) * 1000000 // (25 * 24 // 2) AS BIGINT)
             AS dyad_density_ppm
    FROM pairs
    """,
)
def nation_trade_reciprocity(spark: SparkSession, sf_dir: str):
    """Directed-network reciprocity of inter-nation trade: what share
    of trading dyads flow BOTH ways (dyad reciprocity), and what
    share of total flow value is matched by a counter-flow
    (weighted reciprocity, 2 min(f_ij, f_ji) / (f_ij + f_ji)) —
    the network-structure summary that distinguishes a hub-spoke
    economy from a mesh, complementing the gravity fit (magnitude
    model) and RCA (specialization) with TOPOLOGY. Self-trade
    excluded; the dyad table canonicalizes each unordered pair once
    (forward rows plus backward-only rows via the anti pattern).
    One fact aggregate to the bounded 25x25 matrix, then constant
    work. Exact ppm."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
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
    b = flows.select(
        F.col("i").alias("bi"),
        F.col("j").alias("bj"),
        F.col("f").alias("fb"),
    )
    fwd = (
        flows.join(
            b,
            (F.col("bi") == F.col("j")) & (F.col("bj") == F.col("i")),
            "left",
        )
        .filter(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.col("f").alias("fij"),
            F.coalesce(F.col("fb"), F.lit(0)).alias("fji"),
        )
    )
    bwd = (
        flows.join(
            b,
            (F.col("bi") == F.col("j")) & (F.col("bj") == F.col("i")),
            "left",
        )
        .filter((F.col("i") > F.col("j")) & F.col("bi").isNull())
        .select(
            F.col("j").alias("i"),
            F.col("i").alias("j"),
            F.lit(0).cast("bigint").alias("fij"),
            F.col("f").alias("fji"),
        )
    )
    pairs = fwd.unionByName(bwd)
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_dyads"),
        F.sum(
            F.when((F.col("fij") > 0) & (F.col("fji") > 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_reciprocal"),
        F.expr(
            "CAST(SUM(CASE WHEN fij > 0 AND fji > 0 THEN 1 ELSE 0"
            " END) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("dyad_reciprocity_ppm"),
        F.expr(
            "CAST(SUM(2 * LEAST(fij, fji)) * 1000000"
            " div SUM(fij + fji) AS BIGINT)"
        ).alias("weighted_reciprocity_ppm"),
        F.expr(
            "CAST(COUNT(*) * 1000000 div (25 * 24 div 2) AS BIGINT)"
        ).alias("dyad_density_ppm"),
    )


# ------------------------------------------------------------------
# 6. docs_postings_varbyte_estimate — index compression planning
# ------------------------------------------------------------------

_VB_TOPTERMS = 30


@register(
    "docs_postings_varbyte_estimate",
    f"""
    WITH post AS (
      SELECT w, doc_id
      FROM (
        SELECT DISTINCT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+'))
                 AS w
        FROM documents)
      WHERE w != ''),
    topt AS (
      SELECT w FROM post GROUP BY w
      ORDER BY COUNT(*) DESC, w LIMIT {_VB_TOPTERMS}),
    gaps AS (
      SELECT p.w, p.doc_id,
             p.doc_id - COALESCE(LAG(p.doc_id) OVER (
               PARTITION BY p.w ORDER BY p.doc_id), 0) AS gap
      FROM post p JOIN topt USING (w)),
    cost AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(CASE WHEN gap < 128 THEN 1
                  WHEN gap < 16384 THEN 2
                  WHEN gap < 2097152 THEN 3
                  ELSE 4 END) AS BIGINT) AS varbyte_bytes,
             CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes
      FROM gaps GROUP BY 1)
    SELECT w AS term, df, varbyte_bytes, raw_bytes,
           CAST(varbyte_bytes * 1000000 // raw_bytes AS BIGINT)
             AS compression_ppm
    FROM cost
    ORDER BY df DESC, term
    LIMIT {_VB_TOPTERMS}
    """,
)
def docs_postings_varbyte_estimate(spark: SparkSession, sf_dir: str):
    """Varbyte delta-compression estimate for the inverted index's
    hottest postings lists — the index-capacity planning number
    (sorted doc-id postings store GAPS, and varbyte spends 1 byte
    per gap < 128, 2 below 16K, ...; dense terms compress toward
    1 byte/posting = 8x over raw 64-bit ids, sparse terms barely
    2x): per-term gap streams come from a lag window PARTITIONED by
    term over the postings of the top {_VB_TOPTERMS} terms, and the
    byte cost is a pure CASE fold — the measured basis for choosing
    varbyte vs bitpacking the docs_inverted_index_segments layout.
    One distinct-postings pass; everything after is bounded by the
    term cut."""
    d = t(spark, sf_dir, "documents")
    post = (
        d.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    post = post.persist()
    topt = (
        post.groupBy("w")
        .agg(F.count("*").alias("df0"))
        .orderBy(F.col("df0").desc(), "w")
        .limit(_VB_TOPTERMS)
        .select("w")
    )
    gaps = (
        post.join(F.broadcast(topt), "w")
        .select(
            "w",
            "doc_id",
            (
                F.col("doc_id")
                - F.coalesce(
                    F.lag("doc_id").over(
                        Window.partitionBy("w").orderBy("doc_id")
                    ),
                    F.lit(0),
                )
            ).alias("gap"),
        )
    )
    cost = gaps.groupBy("w").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum(
            F.expr(
                "CASE WHEN gap < 128 THEN 1"
                " WHEN gap < 16384 THEN 2"
                " WHEN gap < 2097152 THEN 3 ELSE 4 END"
            )
        )
        .cast("bigint")
        .alias("varbyte_bytes"),
        F.expr("CAST(COUNT(*) * 8 AS BIGINT)").alias("raw_bytes"),
    )
    return (
        cost.select(
            F.col("w").alias("term"),
            "df",
            "varbyte_bytes",
            "raw_bytes",
            F.expr(
                "CAST(varbyte_bytes * 1000000 div raw_bytes"
                " AS BIGINT)"
            ).alias("compression_ppm"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(_VB_TOPTERMS)
    )
