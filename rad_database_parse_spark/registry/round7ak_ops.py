"""Round-7ak operators: lead-k extractive coverage, settlement
netting efficiency, price-ladder gap analysis, hash-shard balance
audit, Benjamini-Hochberg FDR, and a Condorcet pairwise winner.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. docs_lead_k_coverage_curve — extractive-lead vocabulary recall
# ------------------------------------------------------------------

_LEAD_KS = [16, 32, 64]


def _lead_oracle() -> str:
    covs = ",\n             ".join(
        f"CAST(SUM(CASE WHEN first_pos < {k} THEN 1 ELSE 0 END)"
        f" * 1000000 // COUNT(*) AS BIGINT) AS cov{k}_ppm"
        for k in _LEAD_KS
    )
    sums = ",\n             ".join(
        f"CAST(SUM(cov{k}_ppm) AS BIGINT) AS s{k}" for k in _LEAD_KS
    )
    outs = "\n      UNION ALL\n      ".join(
        f"SELECT lang, CAST({k} AS BIGINT) AS lead_k, n_docs,"
        f" CAST(s{k} // n_docs AS BIGINT)"
        f" AS mean_vocab_coverage_ppm FROM per_lang"
        for k in _LEAD_KS
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, token, CAST(pos AS BIGINT) AS pos FROM (
        SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS token,
               unnest(range(len(string_split(text, ' ')))) AS pos
        FROM documents)
      WHERE token != ''),
    firsts AS (
      SELECT doc_id, lang, token, CAST(MIN(pos) AS BIGINT)
        AS first_pos
      FROM toks GROUP BY 1, 2, 3),
    per_doc AS (
      SELECT doc_id, lang,
             {covs}
      FROM firsts GROUP BY doc_id, lang),
    per_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             {sums}
      FROM per_doc GROUP BY 1)
    SELECT lang, lead_k, n_docs, mean_vocab_coverage_ppm FROM (
      {outs})
    ORDER BY lang, lead_k
    """


@register("docs_lead_k_coverage_curve", _lead_oracle())
def docs_lead_k_coverage_curve(spark: SparkSession, sf_dir: str):
    """Lead-k vocabulary coverage — the extractive-summary baseline
    number (news editing's 'lead-3' as a vocabulary-recall curve):
    what share of each document's distinct vocabulary already appears
    in its first k tokens, averaged per language. A corpus whose
    lead-64 coverage is high front-loads information (truncation-safe
    for fixed-context training); a flat curve means truncating docs
    at k tokens DELETES vocabulary — exactly the call a
    sequence-packing policy needs (the tier's docs_pack_sequences
    consumes that decision). One tokenize-explode, one (doc, token)
    MIN(pos) fold — the same shuffle every token op pays — then
    per-doc ratios quantize to ppm integers BEFORE the per-language
    mean (integer mean of integer ratios: no double sums). The three
    k's fold as conditional sums in ONE aggregate — no per-k
    rescans."""
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            "lang",
            F.posexplode(F.split(F.col("text"), " ")).alias(
                "pos", "token"
            ),
        )
        .filter(F.col("token") != "")
    )
    firsts = toks.groupBy("doc_id", "lang", "token").agg(
        F.min("pos").cast("bigint").alias("first_pos")
    )
    per_doc = firsts.groupBy("doc_id", "lang").agg(
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN first_pos < {k} THEN 1 ELSE 0"
                f" END) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias(f"cov{k}_ppm")
            for k in _LEAD_KS
        ]
    )
    per_lang = per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        *[
            F.sum(f"cov{k}_ppm").cast("bigint").alias(f"s{k}")
            for k in _LEAD_KS
        ],
    )
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), CAST(s{k} div n_docs AS BIGINT)"
        for k in _LEAD_KS
    )
    return (
        per_lang.selectExpr(
            "lang",
            "n_docs",
            f"stack({len(_LEAD_KS)}, {stack_args})"
            " AS (lead_k, mean_vocab_coverage_ppm)",
        )
        .select("lang", "lead_k", "n_docs", "mean_vocab_coverage_ppm")
        .orderBy("lang", "lead_k")
    )


# ------------------------------------------------------------------
# 2. nation_settlement_netting_efficiency — bilateral netting
# ------------------------------------------------------------------

_NET_TOPK = 10


@register(
    "nation_settlement_netting_efficiency",
    f"""
    WITH flows AS (
      SELECT c.c_nationkey AS cn, s.s_nationkey AS sn,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * 100 AS BIGINT)) AS BIGINT) AS f
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey != s.s_nationkey
      GROUP BY 1, 2),
    pairs AS (
      SELECT LEAST(cn, sn) AS a, GREATEST(cn, sn) AS b,
             CAST(SUM(CASE WHEN cn < sn THEN f ELSE 0 END) AS BIGINT)
               AS f_ab,
             CAST(SUM(CASE WHEN cn > sn THEN f ELSE 0 END) AS BIGINT)
               AS f_ba
      FROM flows GROUP BY 1, 2)
    SELECT CAST(a AS INT) AS nation_a, CAST(b AS INT) AS nation_b,
           f_ab + f_ba AS gross_cents,
           ABS(f_ab - f_ba) AS net_cents,
           CAST((f_ab + f_ba - ABS(f_ab - f_ba)) * 1000000
                // (f_ab + f_ba) AS BIGINT) AS netting_savings_ppm
    FROM pairs
    ORDER BY f_ab + f_ba - ABS(f_ab - f_ba) DESC, nation_a, nation_b
    LIMIT {_NET_TOPK}
    """,
)
def nation_settlement_netting_efficiency(spark: SparkSession, sf_dir: str):
    """Bilateral settlement netting — the payment-infrastructure
    arithmetic under every clearing house: two nations owing each
    other f_ab and f_ba need move only |f_ab − f_ba| if they net, and
    savings = gross − net is the liquidity a netting agreement frees.
    Symmetric trade nets ~100%; one-directional corridors net ~0 —
    the top-{_NET_TOPK} savings pairs ARE the clearing-agreement
    shortlist. One fact-grain join folds to the ≤600-cell directed
    flow matrix (same build as the eigenvector-centrality op — at
    100 TB these ops share one materialized flow table); pair folding
    via LEAST/GREATEST keys, everything exact integer cents. The
    self-trade diagonal is excluded (a nation does not settle with
    itself)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    flows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("cn"),
            F.col("s_nationkey").alias("sn"),
        )
        .agg(
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("f")
        )
    )
    pairs = flows.groupBy(
        F.least("cn", "sn").alias("a"),
        F.greatest("cn", "sn").alias("b"),
    ).agg(
        F.sum(F.when(F.col("cn") < F.col("sn"), F.col("f")).otherwise(0))
        .cast("bigint")
        .alias("f_ab"),
        F.sum(F.when(F.col("cn") > F.col("sn"), F.col("f")).otherwise(0))
        .cast("bigint")
        .alias("f_ba"),
    )
    return (
        pairs.select(
            F.col("a").cast("int").alias("nation_a"),
            F.col("b").cast("int").alias("nation_b"),
            (F.col("f_ab") + F.col("f_ba")).alias("gross_cents"),
            F.abs(F.col("f_ab") - F.col("f_ba")).alias("net_cents"),
            F.expr(
                "CAST((f_ab + f_ba - ABS(f_ab - f_ba)) * 1000000"
                " div (f_ab + f_ba) AS BIGINT)"
            ).alias("netting_savings_ppm"),
        )
        .orderBy(
            (
                F.col("gross_cents") - F.col("net_cents")
            ).desc(),
            "nation_a",
            "nation_b",
        )
        .limit(_NET_TOPK)
    )


# ------------------------------------------------------------------
# 3. part_price_ladder_gaps — assortment hole analysis
# ------------------------------------------------------------------


@register(
    "part_price_ladder_gaps",
    """
    WITH pts AS (
      SELECT DISTINCT p_brand AS brand,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
               AS BIGINT) AS price_c
      FROM part),
    gaps AS (
      SELECT brand, price_c,
             price_c - LAG(price_c) OVER (PARTITION BY brand
               ORDER BY price_c) AS gap
      FROM pts),
    agg AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n_price_points,
             CAST(MAX(price_c) - MIN(price_c) AS BIGINT) AS span_cents,
             CAST(MAX(gap) AS BIGINT) AS max_gap_cents,
             CAST(round(quantile_cont(gap, 0.5)) AS BIGINT)
               AS median_gap_cents
      FROM gaps GROUP BY 1)
    SELECT brand, n_price_points, span_cents, max_gap_cents,
           median_gap_cents,
           CAST(max_gap_cents * 1000000 // span_cents AS BIGINT)
             AS max_gap_share_ppm
    FROM agg ORDER BY max_gap_share_ppm DESC, brand
    """,
)
def part_price_ladder_gaps(spark: SparkSession, sf_dir: str):
    """Price-ladder gap analysis per brand — the assortment-hole
    finder merchandising runs before line reviews: a brand's distinct
    price points form a ladder, and the largest rung gap (as a share
    of the ladder's span) marks the price band where the brand offers
    NOTHING — the opening a competitor's mid-tier product walks into.
    The ladder is a per-brand DISTINCT fold (bounded: distinct prices
    per brand, never part-grain downstream); rung gaps come from one
    lag window PARTITIONED by brand; the median gap is an exact
    interpolated percentile (.5-grain-safe as everywhere). Max-gap
    share in integer ppm ranks the review queue. At 100 TB the only
    fact-scale stage is the initial distinct; 25 brands × ~hundreds
    of rungs bound everything else."""
    p = t(spark, sf_dir, "part")
    pts = p.select(
        F.col("p_brand").alias("brand"),
        (dec("p_retailprice") * 100).cast("bigint").alias("price_c"),
    ).distinct()
    w = Window.partitionBy("brand").orderBy("price_c")
    gaps = pts.select(
        "brand",
        "price_c",
        (F.col("price_c") - F.lag("price_c").over(w)).alias("gap"),
    )
    agg = gaps.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n_price_points"),
        (F.max("price_c") - F.min("price_c"))
        .cast("bigint")
        .alias("span_cents"),
        F.max("gap").cast("bigint").alias("max_gap_cents"),
        F.expr("CAST(round(percentile(gap, 0.5)) AS BIGINT)").alias(
            "median_gap_cents"
        ),
    )
    return (
        agg.select(
            "brand",
            "n_price_points",
            "span_cents",
            "max_gap_cents",
            "median_gap_cents",
            F.expr(
                "CAST(max_gap_cents * 1000000 div span_cents AS BIGINT)"
            ).alias("max_gap_share_ppm"),
        )
        .orderBy(F.col("max_gap_share_ppm").desc(), "brand")
    )


# ------------------------------------------------------------------
# 4. docs_hash_shard_balance — partitioner quality audit
# ------------------------------------------------------------------

_SHARDS = 32


@register(
    "docs_hash_shard_balance",
    f"""
    WITH sharded AS (
      SELECT CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
               % {_SHARDS} AS shard
      FROM documents),
    cells AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS c
      FROM sharded GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(c) AS BIGINT) AS mx
      FROM cells),
    chi AS (
      SELECT CAST(SUM((c * {_SHARDS} - t.n) * (c * {_SHARDS} - t.n)
                      // (t.n * {_SHARDS})) AS BIGINT) AS chi2_scaled
      FROM cells, tot t)
    SELECT t.n AS n_docs, t.k AS shards_used,
           t.mx AS max_shard_rows,
           CAST(t.mx * {_SHARDS} * 1000 // t.n AS BIGINT)
             AS max_over_mean_milli,
           c.chi2_scaled
    FROM tot t CROSS JOIN chi c
    """,
)
def docs_hash_shard_balance(spark: SparkSession, sf_dir: str):
    """Hash-partitioner balance audit: route every document to one of
    {_SHARDS} shards by content hash (md5-prefix — the engine-neutral
    stand-in for the partitioner's hash) and measure skew: max-shard
    over mean (the straggler factor — a 1.3 here means the slowest
    task of every downstream stage runs 30% long) and a scaled χ²
    uniformity statistic against the uniform expectation. This is the
    partitioner-QUALITY member of the skew family: join_skew_
    diagnostics audits the KEY distribution, this audits what the
    HASH does to it — a fine hash over near-unique content should
    land within sampling noise of uniform, and a χ² blowup here means
    duplicate payloads, not a bad hash (the dedup tier's cue). χ²
    terms fold in exact scaled integers (each (c·K − n)²/(n·K) term
    divides once, floor — engines identical on the non-negative
    numerator). One scan, {_SHARDS}-row census."""
    d = t(spark, sf_dir, "documents")
    sharded = d.select(
        (
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast(
                "bigint"
            )
            % _SHARDS
        ).alias("shard")
    )
    cells = sharded.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.max("c").cast("bigint").alias("mx"),
    )
    chi = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    f"(c * {_SHARDS} - n) * (c * {_SHARDS} - n)"
                    f" div (n * {_SHARDS})"
                )
            )
            .cast("bigint")
            .alias("chi2_scaled")
        )
    )
    return (
        tot.crossJoin(F.broadcast(chi))
        .select(
            F.col("n").alias("n_docs"),
            F.col("k").alias("shards_used"),
            F.col("mx").alias("max_shard_rows"),
            F.expr(
                f"CAST(mx * {_SHARDS} * 1000 div n AS BIGINT)"
            ).alias("max_over_mean_milli"),
            "chi2_scaled",
        )
    )


# ------------------------------------------------------------------
# 5. customer_segment_bh_fdr — step-up FDR control
# ------------------------------------------------------------------

# two-sided critical |z| for alpha*k/m, alpha=0.05, m=5, precomputed
# in Python (statistics.NormalDist) — no run-time quantile functions
_BH_CRIT_MILLI = {
    1: 2576,  # alpha/5   -> z=2.5758
    2: 2326,  # 2alpha/5  -> z=2.3263
    3: 2170,
    4: 2054,
    5: 1960,
}


def _bh_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {k} THEN {v}" for k, v in _BH_CRIT_MILLI.items()
    )
    return f"CASE {col} {whens} END"


@register(
    "customer_segment_bh_fdr",
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
               / sqrt((CAST(ss AS DOUBLE) * n
                       - CAST(s AS DOUBLE) * s)
               / (CAST(n AS DOUBLE) * n) / n * 2)) AS BIGINT)
               AS z_milli
      FROM seg CROSS JOIN tot t),
    ranked AS (
      SELECT grp, n, z_milli,
             CAST(ROW_NUMBER() OVER (ORDER BY ABS(z_milli) DESC, grp)
               AS BIGINT) AS rk
      FROM z),
    flags AS (
      SELECT grp, n, z_milli, rk,
             CAST({_bh_case('rk')} AS BIGINT) AS crit_milli,
             CASE WHEN ABS(z_milli) > {_bh_case('rk')}
               THEN 1 ELSE 0 END AS raw_pass
      FROM ranked),
    kstar AS (
      SELECT CAST(COALESCE(MAX(CASE WHEN raw_pass = 1 THEN rk END), 0)
        AS BIGINT) AS ks
      FROM flags)
    SELECT f.grp AS segment, f.n, f.z_milli, f.rk AS p_rank,
           f.crit_milli,
           CAST(CASE WHEN f.rk <= k.ks THEN 1 ELSE 0 END AS INT)
             AS bh_reject
    FROM flags f CROSS JOIN kstar k
    ORDER BY f.rk
    """,
)
def customer_segment_bh_fdr(spark: SparkSession, sf_dir: str):
    """Benjamini-Hochberg step-UP FDR control over the five per-
    segment balance z-tests — the false-discovery counterpart to the
    tier's Holm op on the SAME tests, and the method a dashboard with
    many metrics should actually use (Holm controls any-false-
    positive and grows hopeless as m grows; BH controls the false-
    discovery RATE and keeps power): sort by |z|, find the LARGEST
    rank k with |z|_(k) above the α·k/m critical value, reject
    everything ranked at or under it — including tests that
    individually failed (the step-up rescue that distinguishes BH
    from Holm in the output). Critical z values are Python-
    precomputed milli literals (no run-time normal quantiles); z's
    use the same decimal(38,0)-widened moments as the Holm op; k*
    is one MAX over the 5-row rank table. Reading this op's rejects
    against Holm's on identical z's is the multiple-testing lesson
    in one diff."""
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
        .cast("bigint")
        .alias("rk"),
    )
    flags = ranked.select(
        "grp",
        "n",
        "z_milli",
        "rk",
        F.expr(f"CAST({_bh_case('rk')} AS BIGINT)").alias("crit_milli"),
        F.expr(
            f"CASE WHEN ABS(z_milli) > {_bh_case('rk')}"
            " THEN 1 ELSE 0 END"
        ).alias("raw_pass"),
    )
    kstar = flags.agg(
        F.expr(
            "CAST(COALESCE(MAX(CASE WHEN raw_pass = 1 THEN rk END), 0)"
            " AS BIGINT)"
        ).alias("ks")
    )
    return (
        flags.crossJoin(F.broadcast(kstar))
        .select(
            F.col("grp").alias("segment"),
            "n",
            "z_milli",
            F.col("rk").alias("p_rank"),
            "crit_milli",
            F.expr(
                "CAST(CASE WHEN rk <= ks THEN 1 ELSE 0 END AS INT)"
            ).alias("bh_reject"),
        )
        .orderBy("p_rank")
    )


# ------------------------------------------------------------------
# 6. orders_condorcet_priority_winner — pairwise-majority consensus
# ------------------------------------------------------------------


@register(
    "orders_condorcet_priority_winner",
    """
    WITH monthly AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             o_orderpriority AS pr,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2),
    ranked AS (
      SELECT ym, pr,
             ROW_NUMBER() OVER (PARTITION BY ym
               ORDER BY rev DESC, pr) AS rk
      FROM monthly),
    duels AS (
      SELECT a.pr AS p, b.pr AS q,
             CAST(SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END)
               AS BIGINT) AS p_wins,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM ranked a JOIN ranked b
        ON b.ym = a.ym AND a.pr != b.pr
      GROUP BY 1, 2),
    beats AS (
      SELECT p, CAST(SUM(CASE WHEN 2 * p_wins > n_months
               THEN 1 ELSE 0 END) AS BIGINT) AS n_beaten,
             CAST(COUNT(*) AS BIGINT) AS n_opponents
      FROM duels GROUP BY 1)
    SELECT p AS priority, n_beaten, n_opponents,
           CAST(CASE WHEN n_beaten = n_opponents THEN 1 ELSE 0 END
             AS INT) AS is_condorcet_winner
    FROM beats ORDER BY n_beaten DESC, priority
    """,
)
def orders_condorcet_priority_winner(spark: SparkSession, sf_dir: str):
    """Condorcet pairwise-majority consensus across monthly revenue
    rankings — the social-choice sibling of the tier's Borda op that
    answers a DIFFERENT question: Borda averages rank positions (and
    can crown a mediocre-everywhere option), Condorcet asks 'does any
    priority beat EVERY other in head-to-head monthly majorities' —
    robust to irrelevant alternatives, and its failure mode (no
    winner — a rock-paper-scissors cycle) is detectable here as all
    n_beaten < n_opponents. Months are the voters: one fold to
    (month, priority) revenue, one PARTITIONED rank window, one
    bounded self-join on the ≤84×5 rank table for the 20 duels.
    Everything exact integers; majority is the 2·wins > months test
    (strict — ties don't count, the standard convention). At 100 TB
    only the first fold sees fact rows."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").alias(
            "ym"
        ),
        F.col("o_orderpriority").alias("pr"),
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    w = Window.partitionBy("ym").orderBy(F.col("rev").desc(), "pr")
    ranked = monthly.select(
        "ym", "pr", F.row_number().over(w).alias("rk")
    )
    r2 = ranked.select(
        F.col("ym").alias("ym2"),
        F.col("pr").alias("q"),
        F.col("rk").alias("rk2"),
    )
    duels = (
        ranked.join(
            r2,
            (F.col("ym2") == F.col("ym")) & (F.col("pr") != F.col("q")),
        )
        .groupBy(F.col("pr").alias("p"), "q")
        .agg(
            F.sum(F.when(F.col("rk") < F.col("rk2"), 1).otherwise(0))
            .cast("bigint")
            .alias("p_wins"),
            F.count("*").cast("bigint").alias("n_months"),
        )
    )
    beats = duels.groupBy("p").agg(
        F.sum(
            F.when(2 * F.col("p_wins") > F.col("n_months"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_beaten"),
        F.count("*").cast("bigint").alias("n_opponents"),
    )
    return beats.select(
        F.col("p").alias("priority"),
        "n_beaten",
        "n_opponents",
        F.expr(
            "CAST(CASE WHEN n_beaten = n_opponents THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("is_condorcet_winner"),
    ).orderBy(F.col("n_beaten").desc(), "priority")
