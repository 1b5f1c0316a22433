"""Round-6h operators: assortment matching,
supply-chain KPIs, collocation mining, and embedding-space audits.

Four more platform operators: substitute-product candidate pairs
(blocked price-proximity matching), a supplier on-time scorecard
(OTIF), PMI collocation extraction over the document corpus, and a
per-dimension isotropy audit of the embedding space (the health check
before cosine/IP index choices). (The cohort LTV curve planned for
this batch already exists as round5d's orders_cohort_ltv_curve.)

Same parity contract as the rest of the registry."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 2. part_substitute_candidates — blocked price-proximity matching
# ------------------------------------------------------------------

_SUB_BAND_PCT = 5  # price within 5%


@register(
    "part_substitute_candidates",
    f"""
    WITH p AS (
      SELECT p_partkey, p_type, p_size,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM part)
    SELECT a.p_type AS part_type,
           CAST(a.p_size AS INT) AS part_size,
           CAST(a.p_partkey AS BIGINT) AS partkey_a,
           CAST(b.p_partkey AS BIGINT) AS partkey_b,
           CAST(a.cents AS BIGINT) AS cents_a,
           CAST(b.cents AS BIGINT) AS cents_b,
           CAST(abs(a.cents - b.cents)::HUGEINT * 1000000
                // LEAST(a.cents, b.cents) AS BIGINT) AS price_gap_ppm
    FROM p a JOIN p b
      ON a.p_type = b.p_type AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
     AND abs(a.cents - b.cents) * {100 // _SUB_BAND_PCT}
         <= LEAST(a.cents, b.cents)
    ORDER BY part_type, part_size, partkey_a, partkey_b
    """,
)
def part_substitute_candidates(spark: SparkSession, sf_dir: str):
    """Substitute-product candidate pairs — the assortment-matching
    blocking join merchandising and match-group pipelines run: two
    parts of the SAME type and size whose retail prices sit within
    {_SUB_BAND_PCT}% of each other are substitution candidates (the
    blocking keys confine the quadratic risk to (type, size) groups;
    the price-band predicate — integer cross-multiplication, no
    division — prunes row-locally inside each block). The price gap
    reports in exact ppm of the cheaper part. At 100 TB this is one
    keyed shuffle over the blocking columns — the same shape as the
    levenshtein-blocked name near-dup (part_name_neardup), with price
    proximity standing in for edit distance."""
    p = t(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        "p_type",
        "p_size",
        (dec("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    a = base.select(
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("p_partkey").alias("partkey_a"),
        F.col("cents").alias("cents_a"),
    )
    b = base.select(
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("p_partkey").alias("partkey_b"),
        F.col("cents").alias("cents_b"),
    )
    mult = 100 // _SUB_BAND_PCT
    return (
        a.join(b, ["part_type", "part_size"])
        .filter(
            (F.col("partkey_a") < F.col("partkey_b"))
            & (
                F.abs(F.col("cents_a") - F.col("cents_b")) * mult
                <= F.least(F.col("cents_a"), F.col("cents_b"))
            )
        )
        .select(
            "part_type",
            F.col("part_size").cast("int"),
            F.col("partkey_a").cast("bigint"),
            F.col("partkey_b").cast("bigint"),
            F.col("cents_a").cast("bigint"),
            F.col("cents_b").cast("bigint"),
            F.expr(
                "CAST(abs(cents_a - cents_b) * 1000000"
                " div LEAST(cents_a, cents_b) AS BIGINT)"
            ).alias("price_gap_ppm"),
        )
        .orderBy("part_type", "part_size", "partkey_a", "partkey_b")
    )


# ------------------------------------------------------------------
# 3. supplier_otif_scorecard — on-time delivery KPI
# ------------------------------------------------------------------

_OTIF_SLA_DAYS = 90


@register(
    "supplier_otif_scorecard",
    f"""
    WITH d AS (
      SELECT l.l_suppkey,
             CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
               AS delay_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT CAST(s.s_suppkey AS BIGINT) AS suppkey,
           s.s_name AS supplier,
           CAST(COUNT(d.delay_days) AS BIGINT) AS n_shipments,
           CAST(COUNT(CASE WHEN d.delay_days <= {_OTIF_SLA_DAYS}
                           THEN 1 END) AS BIGINT) AS n_on_time,
           CAST(COUNT(CASE WHEN d.delay_days <= {_OTIF_SLA_DAYS}
                           THEN 1 END)::HUGEINT * 1000000
                // COUNT(d.delay_days) AS BIGINT) AS otif_ppm,
           CAST(CASE WHEN SUM(d.delay_days) >= 0
                     THEN SUM(d.delay_days) // COUNT(d.delay_days)
                     ELSE -((-SUM(d.delay_days))
                            // COUNT(d.delay_days)) END AS BIGINT)
             AS avg_delay_days,
           CAST(MAX(d.delay_days) AS BIGINT) AS max_delay_days
    FROM d JOIN supplier s ON d.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY suppkey
    """,
)
def supplier_otif_scorecard(spark: SparkSession, sf_dir: str):
    """Supplier on-time scorecard (the OTIF KPI every supply-chain
    review runs): per supplier, the share of shipments landing within
    the {_OTIF_SLA_DAYS}-day SLA from order placement, plus average and
    worst-case delays. The lineitem×orders key join is the one real
    shuffle (orderkey-keyed, AQE-handled); delays are exact integer day
    arithmetic, the supplier dimension broadcasts, and the scorecard
    grain is bounded by the supplier count. Complements
    order_to_ship_latency_profile (global distribution) with the
    per-supplier accountability view and nation_supplier_hhi
    (concentration) with the performance axis."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    d = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("delay_days"),
    )
    return (
        d.join(F.broadcast(s), d.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
        )
        .agg(
            F.count("delay_days").cast("bigint").alias("n_shipments"),
            F.count(
                F.when(F.col("delay_days") <= _OTIF_SLA_DAYS, 1)
            )
            .cast("bigint")
            .alias("n_on_time"),
            F.expr(
                f"CAST(COUNT(CASE WHEN delay_days <= {_OTIF_SLA_DAYS}"
                " THEN 1 END) * 1000000 div COUNT(delay_days) AS BIGINT)"
            ).alias("otif_ppm"),
            F.expr(
                "CAST(CASE WHEN SUM(delay_days) >= 0"
                " THEN SUM(delay_days) div COUNT(delay_days)"
                " ELSE -((-SUM(delay_days)) div COUNT(delay_days)) END"
                " AS BIGINT)"
            ).alias("avg_delay_days"),
            F.max("delay_days").cast("bigint").alias("max_delay_days"),
        )
        .select(
            F.col("suppkey").cast("bigint"),
            "supplier",
            "n_shipments",
            "n_on_time",
            "otif_ppm",
            "avg_delay_days",
            "max_delay_days",
        )
        .orderBy("suppkey")
    )


# ------------------------------------------------------------------
# 4. docs_pmi_collocations — pointwise mutual information bigrams
# ------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@register(
    "docs_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents),
    uni AS (
      SELECT unnest(ts) AS w FROM toks),
    ucnt AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY w),
    n_tot AS (SELECT COUNT(*) AS n FROM uni),
    bi AS (
      SELECT ts[p] AS w1, ts[p + 1] AS w2
      FROM (SELECT ts, unnest(range(1, length(ts))) AS p
            FROM toks WHERE length(ts) >= 2)),
    bcnt AS (
      SELECT w1, w2, COUNT(*) AS cxy FROM bi GROUP BY w1, w2
      HAVING COUNT(*) >= {_PMI_MIN_COUNT}),
    pmi AS (
      SELECT b.w1, b.w2, b.cxy, u1.cw AS c1, u2.cw AS c2,
             CAST(round(1000 * ln(CAST(b.cxy AS DOUBLE) * n_tot.n
                                  / (CAST(u1.cw AS DOUBLE) * u2.cw)))
                  AS BIGINT) AS pmi_milli
      FROM bcnt b
      JOIN ucnt u1 ON b.w1 = u1.w
      JOIN ucnt u2 ON b.w2 = u2.w
      CROSS JOIN n_tot)
    SELECT w1, w2,
           CAST(cxy AS BIGINT) AS n_bigram,
           CAST(c1 AS BIGINT) AS n_w1,
           CAST(c2 AS BIGINT) AS n_w2,
           CAST(pmi_milli AS BIGINT) AS pmi_milli
    FROM pmi
    ORDER BY pmi_milli DESC, w1, w2
    LIMIT {_PMI_TOPK}
    """,
)
def docs_pmi_collocations(spark: SparkSession, sf_dir: str):
    """Pointwise-mutual-information collocation extraction — the
    terminology miner that surfaces multiword units ("machine learning",
    template boilerplate) a tokenizer or dedup shingle should treat as
    one: adjacent bigrams occurring ≥{_PMI_MIN_COUNT} times ranked by
    PMI = ln(c_xy·N / (c_x·c_y)). All counts are mergeable token-grain
    aggregates (bigrams from an index-shifted zip of the token array —
    scan-local, no self-join); the single ln per surviving bigram takes
    a ratio of exact integers and quantizes to milli-units so the
    ranking is exact, and the global top-{_PMI_TOPK} is a
    TakeOrderedAndProject (per-partition top-k, no window).
    Complements docs_bigram_lm_score (which SCORES documents with these
    statistics) by EXTRACTING the collocations themselves."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("ts")
    )
    uni = toks.select(F.explode("ts").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("cw"))
    n_tot = uni.agg(F.count("*").alias("n"))
    bi = toks.filter(F.size("ts") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " p -> struct(ts[p - 1] AS w1, ts[p] AS w2))"
            )
        ).alias("pair")
    ).select(F.col("pair.w1").alias("w1"), F.col("pair.w2").alias("w2"))
    bcnt = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").alias("cxy"))
        .filter(F.col("cxy") >= _PMI_MIN_COUNT)
    )
    u1 = ucnt.select(
        F.col("w").alias("w1"), F.col("cw").alias("c1")
    )
    u2 = ucnt.select(
        F.col("w").alias("w2"), F.col("cw").alias("c2")
    )
    pmi = (
        bcnt.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "w1",
            "w2",
            "cxy",
            "c1",
            "c2",
            F.round(
                1000
                * F.log(
                    F.col("cxy").cast("double")
                    * F.col("n")
                    / (F.col("c1").cast("double") * F.col("c2"))
                )
            )
            .cast("bigint")
            .alias("pmi_milli"),
        )
    )
    return (
        pmi.select(
            "w1",
            "w2",
            F.col("cxy").cast("bigint").alias("n_bigram"),
            F.col("c1").cast("bigint").alias("n_w1"),
            F.col("c2").cast("bigint").alias("n_w2"),
            "pmi_milli",
        )
        .orderBy(F.col("pmi_milli").desc(), "w1", "w2")
        .limit(_PMI_TOPK)
    )


# ------------------------------------------------------------------
# 5. emb_dimension_isotropy_audit — embedding-space health check
# ------------------------------------------------------------------

_ISO_DIMS = 64


@register(
    "emb_dimension_isotropy_audit",
    f"""
    WITH el AS (
      SELECT d,
             CAST(round(CAST(embedding AS DOUBLE[])[d] * 1000000)
                  AS BIGINT) AS x
      FROM embeddings,
           (SELECT unnest(range(1, {_ISO_DIMS} + 1)) AS d)),
    per AS (
      SELECT d, COUNT(*) AS n,
             SUM(x::HUGEINT) AS sx,
             SUM(x::HUGEINT * x) AS sxx
      FROM el GROUP BY d),
    v AS (
      SELECT d, n, sx,
             (n * sxx - sx * sx) AS var_num
      FROM per),
    tot AS (SELECT SUM(var_num) AS tv FROM v)
    SELECT CAST(v.d AS INT) AS dim,
           CAST(v.n AS BIGINT) AS n_vecs,
           CAST(CASE WHEN v.sx >= 0 THEN v.sx // v.n
                     ELSE -((-v.sx) // v.n) END AS BIGINT) AS mean_micro,
           CAST(v.var_num // (v.n::HUGEINT * v.n) AS BIGINT)
             AS var_micro2,
           CAST(v.var_num * 1000000 // tot.tv AS BIGINT) AS var_share_ppm
    FROM v, tot ORDER BY dim
    """,
)
def emb_dimension_isotropy_audit(spark: SparkSession, sf_dir: str):
    """Per-dimension isotropy audit of the embedding space — the health
    check run before committing to a similarity metric or quantizer:
    dominant dimensions (high variance share) break inner-product
    search and waste PQ codebook bits; a mean far from zero says the
    corpus needs centering before cosine. Each coordinate quantizes to
    exact integer micro-units at the scan, so the per-dimension moment
    sums (Σx, Σx² in HUGEINT/decimal(38,0)) are exact and every output
    column is integer arithmetic — means in micro-units, variances in
    micro², variance shares in exact ppm of the total. One dimension-
    grid explode (×{_ISO_DIMS}) and one combinable groupBy; the
    {_ISO_DIMS}-row post-stage is free at any corpus size. Feeds
    emb_top_pc_power_iteration (which finds the dominant DIRECTION)
    with the axis-aligned screen."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 1_000_000).cast(
                    "bigint"
                ),
            )
        ).alias("d0", "x")
    ).select((F.col("d0") + 1).alias("d"), "x")
    big = "decimal(38,0)"
    per = el.groupBy("d").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(big)).alias("sx"),
        F.sum((F.col("x").cast(big) * F.col("x")).cast(big)).alias(
            "sxx"
        ),
    )
    v = per.select(
        "d",
        "n",
        "sx",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "var_num"
        ),
    )
    tot = v.agg(F.sum("var_num").alias("tv"))
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").cast("int").alias("dim"),
            F.col("n").cast("bigint").alias("n_vecs"),
            F.expr(
                "CAST(CASE WHEN sx >= 0 THEN sx div n"
                " ELSE -((-sx) div n) END AS BIGINT)"
            ).alias("mean_micro"),
            F.expr(
                "CAST(var_num div (CAST(n AS DECIMAL(38,0)) * n)"
                " AS BIGINT)"
            ).alias("var_micro2"),
            F.expr(
                "CAST(var_num * 1000000 div tv AS BIGINT)"
            ).alias("var_share_ppm"),
        )
        .orderBy("dim")
    )
