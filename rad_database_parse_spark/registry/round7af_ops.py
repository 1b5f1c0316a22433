"""Round-7af operators: eigenvector trade centrality, Kingman VUT
queue estimate, Fellegi-Sunter u-probabilities, interval-coalescing
islands, SimHash bit-balance audit, and a retention power-law fit.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t
from ..llm.dedup import HASH_AS, HASH_BS, MERSENNE_P, simhash_signatures
from .llm_ops import _TOKS_SQL

# ------------------------------------------------------------------
# 1. nation_eigenvector_centrality_trade — power iteration, 25x25
# ------------------------------------------------------------------

_EVC_ROUNDS = 3
_EVC_SCALE = 1000


def _evc_oracle() -> str:
    steps = []
    for r in range(1, _EVC_ROUNDS + 1):
        prev = f"v{r - 1}"
        steps.append(
            f"""
    raw{r} AS (
      SELECT m.a AS nation, CAST(SUM(m.w * p.v) AS BIGINT) AS v
      FROM m JOIN {prev} p ON p.nation = m.b GROUP BY 1),
    mx{r} AS (SELECT MAX(v) AS mx FROM raw{r}),
    v{r} AS (
      SELECT nation, CAST(v * {_EVC_SCALE} // mx AS BIGINT) AS v
      FROM raw{r}, mx{r})"""
        )
    return f"""
    WITH flows AS (
      SELECT c.c_nationkey AS cn, s.s_nationkey AS sn,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * 100 AS BIGINT) // 100) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    m AS (
      SELECT cn AS a, sn AS b, CAST(SUM(w) AS BIGINT) AS w
      FROM (SELECT cn, sn, w FROM flows
            UNION ALL SELECT sn, cn, w FROM flows)
      GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT a AS nation FROM m),
    v0 AS (
      SELECT nation, CAST({_EVC_SCALE} AS BIGINT) AS v FROM nodes),
    {','.join(steps)}
    SELECT CAST(nation AS INT) AS nation,
           v AS centrality_fp
    FROM v{_EVC_ROUNDS} ORDER BY nation
    """


@register("nation_eigenvector_centrality_trade", _evc_oracle())
def nation_eigenvector_centrality_trade(spark: SparkSession, sf_dir: str):
    """Eigenvector centrality of the nation-level trade network —
    the undamped, weight-respecting sibling of the pagerank op: a
    nation is central in proportion to the trade volume of the
    nations it trades WITH, the fixpoint of v ∝ Mv. One fact-grain
    join folds the 100 TB of lineitem down to the ≤25×25 symmetric
    dollar-flow matrix; the {_EVC_ROUNDS} unrolled power iterations
    then touch only those ≤625 rows (the same bounded-state iterate
    as emb_top_pc_power_iteration, but on a graph adjacency), with
    exact-integer max-normalization between rounds (entries are
    non-negative so plain floor division is engine-identical — no
    sign handling needed). Flows quantize to whole dollars so the
    matvec products stay within int64 through sf100. The output
    fixed-point vector ranks nations by systemic trade importance —
    the contagion-exposure ordering."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    flows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("cn"),
            F.col("s_nationkey").alias("sn"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
                    " * 100 AS BIGINT) div 100"
                )
            )
            .cast("bigint")
            .alias("w")
        )
    )
    m = (
        flows.select(F.col("cn").alias("a"), F.col("sn").alias("b"), "w")
        .union(
            flows.select(
                F.col("sn").alias("a"), F.col("cn").alias("b"), "w"
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    # the matvec rounds iterate DRIVER-SIDE over the collected <=625-cell
    # matrix (25 nations squared — bounded at any corpus size): as Spark
    # jobs each round paid ~3 sequential broadcast-exchange stages of
    # pure scheduling latency (VERDICT r6 item 5; the Markov-ops
    # pattern).  Python ints are exact and `//` on the non-negative
    # entries matches both engines' integer division.
    cells = m.collect()  # <=625 rows: bounded grain
    W: dict[int, dict[int, int]] = {}
    for r in cells:
        W.setdefault(int(r["a"]), {})[int(r["b"])] = int(r["w"])
    nodes = sorted(W)
    v = {n: _EVC_SCALE for n in nodes}
    for _ in range(_EVC_ROUNDS):
        raw = {
            a: sum(w * v[b] for b, w in row.items()) for a, row in W.items()
        }
        mx = max(raw.values())
        v = {a: x * _EVC_SCALE // mx for a, x in raw.items()}
    return spark.createDataFrame(
        [(int(n), int(v[n])) for n in nodes],
        "nation int, centrality_fp bigint",
    ).orderBy("nation")


# ------------------------------------------------------------------
# 2. orders_kingman_queue_estimate — VUT variability decomposition
# ------------------------------------------------------------------

_KQ_RHO_MILLI = 800  # fixed design utilization 0.8
# rho/(1-rho) precomputed in Python: ONE literal so neither engine
# can reassociate the constant chain differently
_KQ_UTIL_FACTOR = (_KQ_RHO_MILLI / 1000.0) / (1.0 - _KQ_RHO_MILLI / 1000.0)


@register(
    "orders_kingman_queue_estimate",
    f"""
    WITH svc AS (
      SELECT o.o_orderpriority AS pr, o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS od,
             datediff('day', CAST(o.o_orderdate AS DATE),
               MAX(CAST(l.l_shipdate AS DATE))) AS s_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3),
    daily AS (
      SELECT pr, od, CAST(COUNT(*) AS BIGINT) AS c
      FROM svc GROUP BY 1, 2),
    arr AS (
      SELECT pr, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS scc
      FROM daily GROUP BY 1),
    srv AS (
      SELECT pr, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s_days) AS BIGINT) AS ss,
             CAST(SUM(s_days * s_days) AS BIGINT) AS sss
      FROM svc GROUP BY 1),
    d AS (
      SELECT a.pr, a.nd, s.n,
             CAST(a.sc AS DOUBLE) / a.nd AS lam,
             (CAST(a.scc AS DOUBLE) - CAST(a.sc AS DOUBLE) * a.sc
               / a.nd) / NULLIF(a.nd - 1, 0)
               / (CAST(a.sc AS DOUBLE) / a.nd) AS ca2,
             ((CAST(s.sss AS DOUBLE) - CAST(s.ss AS DOUBLE) * s.ss
               / s.n) / NULLIF(s.n - 1, 0))
               / ((CAST(s.ss AS DOUBLE) / s.n)
                  * (CAST(s.ss AS DOUBLE) / s.n)) AS cs2,
             CAST(s.ss AS DOUBLE) / s.n AS es
      FROM arr a JOIN srv s ON s.pr = a.pr)
    SELECT pr AS priority, nd AS n_days, n AS n_orders,
           lam AS lambda_per_day, ca2 AS arrival_dispersion,
           cs2 AS service_cv2, es AS service_days_mean,
           (ca2 + cs2) / 2.0 * {_KQ_UTIL_FACTOR!r} * es
             AS wq_days_at_design_rho
    FROM d ORDER BY priority
    """,
)
def orders_kingman_queue_estimate(spark: SparkSession, sf_dir: str):
    """Kingman VUT queue estimate per order priority — the queueing
    decomposition (Wq ≈ Variability × Utilization × Time) that turns
    raw operational data into a staffing argument, one level above
    the tier's Little's-law audit: arrival variability ca² is the
    dispersion index of DAILY order counts (1 = Poisson; >1 = bursty
    — burstier arrivals queue superlinearly), service variability cs²
    and mean come from the order→last-ship latency, and Wq is
    evaluated at a fixed design utilization ρ=0.8 (the what-if knob —
    a real capacity plan sweeps it; the formula's ρ/(1−ρ) blow-up IS
    the lesson). All moments fold to exact BIGINT in two bounded
    groupBys off one fact join; every output is a fixed double
    expression of those integers. At 100 TB both aggregates are hash
    partials over (priority, day) and (priority) — nothing wider than
    the day grain survives the first fold."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    svc = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("pr"),
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("od"),
        )
        .agg(
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")), F.col("od")
            ).alias("s_days")
        )
    ).persist()
    daily = svc.groupBy("pr", "od").agg(
        F.count("*").cast("bigint").alias("c")
    )
    arr = daily.groupBy("pr").agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    srv = svc.groupBy("pr").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("s_days").cast("bigint").alias("ss"),
        F.sum(F.col("s_days") * F.col("s_days"))
        .cast("bigint")
        .alias("sss"),
    )
    d = arr.join(srv, "pr").select(
        "pr",
        "nd",
        "n",
        F.expr("CAST(sc AS DOUBLE) / nd").alias("lam"),
        F.expr(
            "(CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / nd)"
            " / NULLIF(nd - 1, 0) / (CAST(sc AS DOUBLE) / nd)"
        ).alias("ca2"),
        F.expr(
            "((CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * ss / n)"
            " / NULLIF(n - 1, 0))"
            " / ((CAST(ss AS DOUBLE) / n) * (CAST(ss AS DOUBLE) / n))"
        ).alias("cs2"),
        F.expr("CAST(ss AS DOUBLE) / n").alias("es"),
    )
    return d.select(
        F.col("pr").alias("priority"),
        F.col("nd").alias("n_days"),
        F.col("n").alias("n_orders"),
        F.col("lam").alias("lambda_per_day"),
        F.col("ca2").alias("arrival_dispersion"),
        F.col("cs2").alias("service_cv2"),
        F.col("es").alias("service_days_mean"),
        F.expr(
            f"(ca2 + cs2) / 2.0 * {_KQ_UTIL_FACTOR!r} * es"
        ).alias("wq_days_at_design_rho"),
    ).orderBy("priority")


# ------------------------------------------------------------------
# 3. customer_linkage_u_probabilities — Fellegi-Sunter planning
# ------------------------------------------------------------------

_FS_M_PPM = 900_000  # literature-standard m-probability 0.9


@register(
    "customer_linkage_u_probabilities",
    f"""
    WITH tagged AS (
      SELECT field, val FROM (
        SELECT 'mktsegment' AS field, c_mktsegment AS val
        FROM customer
        UNION ALL
        SELECT 'nation', CAST(c_nationkey AS VARCHAR) FROM customer
        UNION ALL
        SELECT 'acctbal_band', CAST(
          (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
           + 100000) // 100000 AS VARCHAR)
        FROM customer)),
    freq AS (
      SELECT field, val, CAST(COUNT(*) AS BIGINT) AS f
      FROM tagged GROUP BY 1, 2),
    u AS (
      SELECT field, CAST(COUNT(*) AS BIGINT) AS ndv,
             CAST(SUM(f) AS BIGINT) AS n,
             CAST(SUM(f * f) AS BIGINT) AS sf2
      FROM freq GROUP BY 1)
    SELECT field, ndv,
           CAST(sf2 * 1000000 // (n * n) AS BIGINT) AS u_ppm,
           CAST({_FS_M_PPM} * CAST(1000 AS BIGINT)
                // GREATEST(sf2 * 1000000 // (n * n), 1) AS BIGINT)
             AS match_odds_milli
    FROM u ORDER BY field
    """,
)
def customer_linkage_u_probabilities(spark: SparkSession, sf_dir: str):
    """Fellegi-Sunter u-probabilities for record-linkage planning —
    the number that decides which fields are worth COMPARING and
    which are worth BLOCKING on before any pairwise matching runs:
    u(field) = P(field agrees | non-match) = Σf_v²/N² (the chance two
    RANDOM records collide), and the agreement weight is the odds
    m/u with the literature-standard m = 0.9. A field with
    match_odds_milli in the hundreds of thousands (acctbal band)
    carries real evidence; one in the thousands (5-value segment)
    barely moves the posterior — and u·N is each field's blocking
    candidate volume. One scan (stack emits all three field/value
    rows per record), one bounded frequency groupBy, and the u
    estimate is pure BIGINT (Σf²·1e6 // N²). At 100 TB this replaces
    the quadratic 'just compare everything' instinct with arithmetic
    — the planner stage of the fuzzy-match family (levenshtein
    blocking, symspell, phonetic collapse)."""
    c = t(spark, sf_dir, "customer")
    tagged = c.selectExpr(
        "stack(3,"
        " 'mktsegment', c_mktsegment,"
        " 'nation', CAST(c_nationkey AS STRING),"
        " 'acctbal_band', CAST("
        "   (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
        "    + 100000) div 100000 AS STRING)"
        ") AS (field, val)"
    )
    freq = tagged.groupBy("field", "val").agg(
        F.count("*").cast("bigint").alias("f")
    )
    u = freq.groupBy("field").agg(
        F.count("*").cast("bigint").alias("ndv"),
        F.sum("f").cast("bigint").alias("n"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("sf2"),
    )
    return u.select(
        "field",
        "ndv",
        F.expr("CAST(sf2 * 1000000 div (n * n) AS BIGINT)").alias(
            "u_ppm"
        ),
        F.expr(
            f"CAST({_FS_M_PPM} * CAST(1000 AS BIGINT)"
            " div GREATEST(sf2 * 1000000 div (n * n), 1) AS BIGINT)"
        ).alias("match_odds_milli"),
    ).orderBy("field")


# ------------------------------------------------------------------
# 4. orders_interval_coalesce_islands — merge-overlapping-intervals
# ------------------------------------------------------------------


@register(
    "orders_interval_coalesce_islands",
    """
    WITH iv AS (
      SELECT o.o_custkey AS cust, o.o_orderkey,
             datediff('day', DATE '1992-01-01',
               CAST(o.o_orderdate AS DATE)) AS s,
             datediff('day', DATE '1992-01-01',
               MAX(CAST(l.l_shipdate AS DATE))) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3),
    marked AS (
      SELECT cust, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY cust
                    ORDER BY s, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS brk
      FROM iv),
    islanded AS (
      SELECT cust, s, e,
             SUM(brk) OVER (PARTITION BY cust ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS island_id
      FROM marked),
    islands AS (
      SELECT cust, island_id,
             CAST(COUNT(*) AS BIGINT) AS n_intervals,
             CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS island_days
      FROM islanded GROUP BY 1, 2),
    seg AS (
      SELECT c.c_mktsegment AS segment, i.*
      FROM islands i JOIN customer c ON c.c_custkey = i.cust)
    SELECT segment,
           CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_days) AS BIGINT) AS covered_days,
           CAST(SUM(n_intervals) * 1000 // COUNT(*) AS BIGINT)
             AS intervals_per_island_milli
    FROM seg GROUP BY 1 ORDER BY segment
    """,
)
def orders_interval_coalesce_islands(spark: SparkSession, sf_dir: str):
    """Interval coalescing (gaps-and-islands over RANGES) — the SQL
    pattern under effective-dating, SLA uptime stitching and booking
    engines, and the overlap-aware sibling of the point-event streak
    op: each order spans [orderdate, last ship]; overlapping spans per
    customer merge into islands via the running-max-end trick (an
    island breaks exactly where a start clears every prior end — one
    cumulative MAX window, no self-join, no recursion). Both windows
    share one (customer, start) shuffle — scale-safe partitioning by
    construction; epoch-day integers end to end. The per-segment
    census (intervals per island, covered days) is the contiguity
    profile: how much of the order flow overlaps into continuous
    engagement episodes vs arrives as isolated one-offs. At 100 TB
    the fact join folds order-grain before any window runs."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    iv = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).alias("s"),
        )
        .agg(
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.lit("1992-01-01").cast("date"),
            ).alias("e")
        )
    )
    w_prev = (
        Window.partitionBy("cust")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "cust",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    w_cum = (
        Window.partitionBy("cust")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islanded = marked.select(
        "cust", "s", "e", F.sum("brk").over(w_cum).alias("island_id")
    )
    islands = islanded.groupBy("cust", "island_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        (F.max("e") - F.min("s") + 1).cast("bigint").alias("island_days"),
    )
    seg = islands.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        islands.cust == F.col("c_custkey"),
    )
    return (
        seg.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum("n_intervals").cast("bigint").alias("n_intervals"),
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum("island_days").cast("bigint").alias("covered_days"),
        )
        .select(
            "segment",
            "n_intervals",
            "n_islands",
            "covered_days",
            F.expr(
                "CAST(n_intervals * 1000 div n_islands AS BIGINT)"
            ).alias("intervals_per_island_milli"),
        )
        .orderBy("segment")
    )


# ------------------------------------------------------------------
# 5. docs_simhash_bit_balance_audit — signature quality
# ------------------------------------------------------------------


@register(
    "docs_simhash_bit_balance_audit",
    f"""
    WITH {_TOKS_SQL},
    doc_tokens AS (SELECT doc_id, token_id FROM toks),
    contrib AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN ((CAST({HASH_AS[0]} AS BIGINT) * token_id
                             + {HASH_BS[0]})
                            % {MERSENNE_P} >> bit) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM doc_tokens CROSS JOIN range(32) t(bit)
      GROUP BY doc_id, bit),
    bits AS (
      SELECT bit, CASE WHEN s > 0 THEN 1 ELSE 0 END AS b
      FROM contrib),
    tot AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
            FROM contrib)
    SELECT CAST(bit AS INT) AS bit,
           CAST(SUM(b) AS BIGINT) AS n_set,
           CAST(SUM(b) * 1000000 // (SELECT n FROM tot) AS BIGINT)
             AS set_ppm,
           CAST(ABS(SUM(b) * 2000000 // (SELECT n FROM tot)
                    - 1000000) AS BIGINT) AS imbalance_ppm
    FROM bits GROUP BY 1 ORDER BY bit
    """,
)
def docs_simhash_bit_balance_audit(spark: SparkSession, sf_dir: str):
    """SimHash signature-quality audit: the per-bit set rate across
    the corpus, which SHOULD sit near 50% — a biased bit carries less
    than one bit of entropy, inflating collision rates and dragging
    the Hamming-band near-dup stage (docs_simhash's consumer) toward
    more false candidates; imbalance_ppm = |2p − 1| is the audit
    number (0 = perfect, 1e6 = dead bit). Reuses the EXACT signature
    construction the dedup op gates (same hash family, same majority
    vote) so the audit measures the production signatures, not a
    proxy. Costs one signature build (map-side bit-sum aggregate per
    doc) + one 32-group fold — the audit is free next to the dedup it
    protects. The corpus's skewed token distribution makes several
    bits measurably biased — exactly the thing to know before sizing
    Hamming bands at 100 TB."""
    d = t(spark, sf_dir, "documents")
    sig = simhash_signatures(d, "text", "doc_id", bits=32)
    ks = spark.range(32).select(F.col("id").cast("int").alias("bit"))
    bits = sig.crossJoin(F.broadcast(ks)).select(
        "bit",
        F.expr("(simhash >> bit) & 1").alias("b"),
    )
    tot = sig.agg(F.count("*").cast("bigint").alias("n"))
    return (
        bits.groupBy("bit")
        .agg(F.sum("b").cast("bigint").alias("n_set"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bit",
            "n_set",
            F.expr("CAST(n_set * 1000000 div n AS BIGINT)").alias(
                "set_ppm"
            ),
            F.expr(
                "CAST(ABS(n_set * 2000000 div n - 1000000) AS BIGINT)"
            ).alias("imbalance_ppm"),
        )
        .orderBy("bit")
    )


# ------------------------------------------------------------------
# 6. events_retention_powerlaw_fit — parametric retention model
# ------------------------------------------------------------------

_RET_WEEKS = 8
# ln(k) micro-quantized in PYTHON so neither engine evaluates ln(k)
_RET_LNK = {k: round(math.log(k) * 1_000_000) for k in range(1, _RET_WEEKS + 1)}


def _ret_oracle() -> str:
    lnk_rows = ", ".join(
        f"({k}, CAST({v} AS BIGINT))" for k, v in _RET_LNK.items()
    )
    return f"""
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY 1),
    nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts),
    weekly AS (
      SELECT DISTINCT e.user_id,
             datediff('day', CAST(f.t0 AS DATE), CAST(e.ts AS DATE))
               // 7 AS wk
      FROM events e JOIN firsts f ON f.user_id = e.user_id),
    ret AS (
      SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(COUNT(*) * 1000000 // (SELECT n_users FROM nu)
               AS BIGINT) AS retention_ppm
      FROM weekly WHERE wk BETWEEN 1 AND {_RET_WEEKS} GROUP BY 1),
    lnk (wk, lx) AS (VALUES {lnk_rows}),
    pts AS (
      SELECT r.wk, r.n_active, r.retention_ppm, k.lx,
             CAST(round(ln(retention_ppm / 1000000.0) * 1000000)
               AS BIGINT) AS ly
      FROM ret r JOIN lnk k ON k.wk = r.wk),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(lx) AS BIGINT) AS sx,
             CAST(SUM(ly) AS BIGINT) AS sy,
             CAST(SUM(lx * ly) AS BIGINT) AS sxy,
             CAST(SUM(lx * lx) AS BIGINT) AS sxx
      FROM pts)
    SELECT p.wk AS week, p.n_active, p.retention_ppm,
           (CAST(f.np AS DOUBLE) * f.sxy - CAST(f.sx AS DOUBLE) * f.sy)
             / (CAST(f.np AS DOUBLE) * f.sxx
                - CAST(f.sx AS DOUBLE) * f.sx) AS powerlaw_slope
    FROM pts p CROSS JOIN fit f
    ORDER BY week
    """


@register("events_retention_powerlaw_fit", _ret_oracle())
def events_retention_powerlaw_fit(spark: SparkSession, sf_dir: str):
    """Parametric retention model: fit r(k) ∝ k^(−β) over weeks 1-{_RET_WEEKS}
    since each user's first event — the power-law retention shape
    (Duolingo/Facebook growth literature) whose single β summarizes a
    whole retention curve and EXTRAPOLATES it (β < 1 flattens toward
    a habit floor; β > 1 decays to zero — the growth-model fork). The
    weekly retention table is the tier's cohort machinery (distinct
    (user, week) fold, never event-grain past the first join); the
    log-log OLS runs on {_RET_WEEKS} bounded points with ln(k)
    precomputed as PYTHON literals (neither engine evaluates ln on
    the x side) and ln(retention) micro-quantized before the moment
    sums (the adamic-adar rounding precedent), so the slope is a
    fixed double expression of exact integers. Slope repeats per row
    next to the observed curve — fit and data in one relation, the
    residual eyeball test built in."""
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    nu = firsts.agg(F.count("*").cast("bigint").alias("n_users"))
    weekly = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.expr(
                "datediff(CAST(ts AS DATE), CAST(t0 AS DATE)) div 7"
            ).alias("wk"),
        )
        .distinct()
    )
    ret = (
        weekly.filter(
            (F.col("wk") >= 1) & (F.col("wk") <= _RET_WEEKS)
        )
        .groupBy("wk")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .crossJoin(F.broadcast(nu))
        .select(
            "wk",
            "n_active",
            F.expr(
                "CAST(n_active * 1000000 div n_users AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )
    lnk = spark.createDataFrame(
        [(k, v) for k, v in _RET_LNK.items()], "wk INT, lx BIGINT"
    )
    pts = ret.join(F.broadcast(lnk), ret.wk == lnk.wk).select(
        ret.wk.alias("wk"),
        "n_active",
        "retention_ppm",
        "lx",
        F.expr(
            "CAST(round(ln(retention_ppm / 1000000.0) * 1000000)"
            " AS BIGINT)"
        ).alias("ly"),
    ).persist()
    fit = pts.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum("lx").cast("bigint").alias("sx"),
        F.sum("ly").cast("bigint").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("bigint").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("bigint").alias("sxx"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("wk").alias("week"),
            "n_active",
            "retention_ppm",
            F.expr(
                "(CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
                " / (CAST(np AS DOUBLE) * sxx"
                " - CAST(sx AS DOUBLE) * sx)"
            ).alias("powerlaw_slope"),
        )
        .orderBy("week")
    )
