"""Round-7g operators: empirical-Bayes rate shrinkage, churn-definition
sensitivity, a regression-discontinuity estimate, query-likelihood
retrieval, an IVF index sharding planner, and stratified A/B assignment
with a balance audit.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t
from .sampling_profile import _BUCKET_SQL, _md5_bucket

# ------------------------------------------------------------------
# 1. lineitem_return_rate_bayes_shrinkage — beta-binomial shrinkage
# ------------------------------------------------------------------


@register(
    "lineitem_return_rate_bayes_shrinkage",
    """
    WITH pp AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1),
    rates AS (SELECT l_partkey, n, x,
                     x * 1000000 // n AS raw_ppm FROM pp),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(raw_ppm) AS BIGINT) AS sr,
             CAST(SUM(raw_ppm * raw_ppm) AS BIGINT) AS srr
      FROM rates),
    prior AS (
      SELECT CAST(sr AS DOUBLE) / np / 1e6 AS m,
             GREATEST((CAST(srr AS DOUBLE) / np
                       - (CAST(sr AS DOUBLE) / np)
                         * (CAST(sr AS DOUBLE) / np)) / 1e12, 1e-9) AS v
      FROM mom),
    shrunk AS (
      SELECT l_partkey, n, x, raw_ppm,
             CAST(round(1e6 * (x + m * GREATEST(m * (1 - m) / v - 1, 1.0))
                  / (n + GREATEST(m * (1 - m) / v - 1, 1.0))) AS BIGINT)
               AS shrunk_ppm
      FROM rates CROSS JOIN prior)
    SELECT l_partkey, n, x, raw_ppm, shrunk_ppm,
           ABS(shrunk_ppm - raw_ppm) AS shift_ppm
    FROM shrunk ORDER BY shift_ppm DESC, l_partkey LIMIT 20
    """,
)
def lineitem_return_rate_bayes_shrinkage(spark: SparkSession, sf_dir: str):
    """Empirical-Bayes (beta-binomial) shrinkage of per-part return
    rates — the small-n estimation pattern behind every 'worst SKUs by
    defect rate' list that isn't just noise: a part with 1 return in 2
    lines must not outrank one with 40 in 100, so each raw rate pulls
    toward the corpus prior with strength K = m(1−m)/v − 1 fitted by
    method of moments from the per-part rate distribution itself. Raw
    rates are exact ppm integers; the prior's two moments come from one
    part-grain aggregate (broadcast back as a 1-row cross join); the
    shrunk rate computes in double from identical integers and
    re-quantizes to ppm before the exact-integer ranking. Output: the
    20 most-shrunk parts — exactly the ones a naive ranking misleads
    on."""
    l = t(spark, sf_dir, "lineitem")
    pp = l.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    rates = pp.select(
        "l_partkey",
        "n",
        "x",
        F.expr("x * 1000000 div n").alias("raw_ppm"),
    )
    mom = rates.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum("raw_ppm").cast("bigint").alias("sr"),
        F.sum(F.col("raw_ppm") * F.col("raw_ppm"))
        .cast("bigint")
        .alias("srr"),
    )
    prior = mom.select(
        (F.col("sr").cast("double") / F.col("np") / 1e6).alias("m"),
        F.greatest(
            (
                F.col("srr").cast("double") / F.col("np")
                - (F.col("sr").cast("double") / F.col("np"))
                * (F.col("sr").cast("double") / F.col("np"))
            )
            / 1e12,
            F.lit(1e-9),
        ).alias("v"),
    )
    k = F.greatest(
        F.col("m") * (1 - F.col("m")) / F.col("v") - 1, F.lit(1.0)
    )
    shrunk = rates.crossJoin(F.broadcast(prior)).select(
        "l_partkey",
        "n",
        "x",
        "raw_ppm",
        F.round(
            1e6 * (F.col("x") + F.col("m") * k) / (F.col("n") + k)
        )
        .cast("bigint")
        .alias("shrunk_ppm"),
    )
    return (
        shrunk.withColumn(
            "shift_ppm", F.abs(F.col("shrunk_ppm") - F.col("raw_ppm"))
        )
        .orderBy(F.col("shift_ppm").desc(), "l_partkey")
        .limit(20)
    )


# ------------------------------------------------------------------
# 2. customer_churn_cutoff_sensitivity — definition sensitivity grid
# ------------------------------------------------------------------

_CHURN_CUTS = [30, 60, 90, 180, 365]


@register(
    "customer_churn_cutoff_sensitivity",
    f"""
    WITH snap AS (SELECT MAX(o_orderdate) AS snap_ts FROM orders),
    last_o AS (
      SELECT o_custkey, MAX(o_orderdate) AS last_ts
      FROM orders GROUP BY 1),
    ages AS (
      SELECT date_diff('day', last_ts, snap_ts) AS age_days
      FROM last_o CROSS JOIN snap),
    grid AS (
      SELECT cutoff_days, age_days
      FROM ages CROSS JOIN (SELECT unnest(
        [{", ".join(str(c) for c in _CHURN_CUTS)}]) AS cutoff_days) cuts)
    SELECT cutoff_days,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN age_days > cutoff_days THEN 1 ELSE 0 END)
             AS BIGINT) AS n_churned,
           CAST(SUM(CASE WHEN age_days > cutoff_days THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS churn_ppm
    FROM grid GROUP BY cutoff_days ORDER BY cutoff_days
    """,
)
def customer_churn_cutoff_sensitivity(spark: SparkSession, sf_dir: str):
    """Churn-definition sensitivity grid: the churn rate under five
    inactivity cutoffs at once — the analytics-engineering sanity check
    that belongs BEFORE any churn model: if the rate cliff-dives
    between adjacent cutoffs, the metric is measuring purchase cadence,
    not attrition (customer_survival_curve shows the full curve; this
    is the decision table for picking the definition). One customer-
    grain last-order aggregate, a 1-row broadcast snapshot, and a
    5-element literal grid cross join — conditional sums do the rest,
    5 output rows at any scale."""
    o = t(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("snap_ts"))
    last_o = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_ts")
    )
    ages = last_o.crossJoin(F.broadcast(snap)).select(
        F.datediff(F.col("snap_ts"), F.col("last_ts")).alias("age_days")
    )
    cuts = spark.createDataFrame(
        [(c,) for c in _CHURN_CUTS], "cutoff_days int"
    )
    grid = ages.crossJoin(F.broadcast(cuts))
    churned = F.when(F.col("age_days") > F.col("cutoff_days"), 1).otherwise(
        0
    )
    return (
        grid.groupBy("cutoff_days")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(churned).cast("bigint").alias("n_churned"),
            F.expr(
                "CAST(SUM(CASE WHEN age_days > cutoff_days THEN 1 ELSE 0"
                " END) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("churn_ppm"),
        )
        .orderBy("cutoff_days")
    )


# ------------------------------------------------------------------
# 3. lineitem_qty24_rdd_discount — regression discontinuity at the
#    Q6/Q17 quantity threshold
# ------------------------------------------------------------------

_RDD_CUT = 24
_RDD_BW = 10


@register(
    "lineitem_qty24_rdd_discount",
    f"""
    WITH obs AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(CAST(l_discount AS DECIMAL(12,2)) * 1000000 AS BIGINT)
               AS disc_ppm,
             CASE WHEN CAST(l_quantity AS BIGINT) >= {_RDD_CUT}
                  THEN 1 ELSE 0 END AS side
      FROM lineitem
      WHERE CAST(l_quantity AS BIGINT)
              BETWEEN {_RDD_CUT - _RDD_BW} AND {_RDD_CUT + _RDD_BW - 1}),
    m AS (
      SELECT side, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(q::HUGEINT) AS sx, SUM(disc_ppm::HUGEINT) AS sy,
             SUM(q::HUGEINT * q) AS sxx, SUM(q::HUGEINT * disc_ppm) AS sxy
      FROM obs GROUP BY side),
    fits AS (
      SELECT side,
             CAST(n AS BIGINT) AS n_lines,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
               / CAST(n AS DOUBLE) AS intercept
      FROM m)
    SELECT
      MAX(CASE WHEN side = 0 THEN n_lines END) AS n_left,
      MAX(CASE WHEN side = 1 THEN n_lines END) AS n_right,
      MAX(CASE WHEN side = 0 THEN slope END) AS slope_left,
      MAX(CASE WHEN side = 1 THEN slope END) AS slope_right,
      MAX(CASE WHEN side = 1 THEN intercept + slope * {_RDD_CUT} END)
      - MAX(CASE WHEN side = 0 THEN intercept + slope * {_RDD_CUT} END)
        AS rdd_jump_ppm
    FROM fits
    """,
)
def lineitem_qty24_rdd_discount(spark: SparkSession, sf_dir: str):
    """Sharp regression discontinuity at the quantity-24 threshold (the
    cutoff TPC-H Q6/Q17 price around): does discount policy JUMP at the
    bulk boundary, beyond its smooth trend? Local linear fits on each
    side of the cutoff (bandwidth ±10), jump = difference of the two
    fits extrapolated to the cutoff — the causal-inference tier's third
    leg next to diff-in-differences and CUPED: RDD identifies the
    effect from the discontinuity itself, no control group needed. OLS
    moments are exact integers (ppm discount, unit quantities) in
    HUGEINT/decimal(38,0) — magnitudes stay within exact double
    conversion — and the two-row side table pivots by MAX-CASE.
    Bandwidth-filtered scan + one 2-group aggregate."""
    l = t(spark, sf_dir, "lineitem")
    obs = l.filter(
        F.col("l_quantity")
        .cast("bigint")
        .between(_RDD_CUT - _RDD_BW, _RDD_CUT + _RDD_BW - 1)
    ).select(
        F.col("l_quantity").cast("bigint").alias("q"),
        (dec("l_discount") * 1000000).cast("bigint").alias("disc_ppm"),
        F.when(F.col("l_quantity").cast("bigint") >= _RDD_CUT, 1)
        .otherwise(0)
        .alias("side"),
    )
    big = "decimal(38,0)"
    m = obs.groupBy("side").agg(
        F.count("*").cast(big).alias("n"),
        F.sum(F.col("q").cast(big)).alias("sx"),
        F.sum(F.col("disc_ppm").cast(big)).alias("sy"),
        F.sum((F.col("q").cast(big) * F.col("q")).cast(big)).alias("sxx"),
        F.sum((F.col("q").cast(big) * F.col("disc_ppm")).cast(big)).alias(
            "sxy"
        ),
    )
    slope = F.expr("CAST(n * sxy - sx * sy AS DOUBLE)") / F.expr(
        "CAST(n * sxx - sx * sx AS DOUBLE)"
    )
    fits = m.select(
        "side",
        F.col("n").cast("bigint").alias("n_lines"),
        slope.alias("slope"),
        (
            (F.expr("CAST(sy AS DOUBLE)") - slope * F.expr("CAST(sx AS DOUBLE)"))
            / F.expr("CAST(n AS DOUBLE)")
        ).alias("intercept"),
    )

    def pick(side: int, col: str):
        return F.max(F.when(F.col("side") == side, F.col(col)))

    at_cut = lambda s: pick(s, "intercept") + pick(s, "slope") * _RDD_CUT
    return fits.agg(
        pick(0, "n_lines").alias("n_left"),
        pick(1, "n_lines").alias("n_right"),
        pick(0, "slope").alias("slope_left"),
        pick(1, "slope").alias("slope_right"),
        (at_cut(1) - at_cut(0)).alias("rdd_jump_ppm"),
    )


# ------------------------------------------------------------------
# 4. docs_query_likelihood_retrieval — Dirichlet-smoothed LM ranking
# ------------------------------------------------------------------

_QL_TERMS = ("spark", "table", "fast")
_QL_MU = 2000


@register(
    "docs_query_likelihood_retrieval",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents),
    dlen AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
             FROM toks GROUP BY doc_id),
    ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ct FROM toks),
    qterms AS (SELECT unnest(['{_QL_TERMS[0]}', '{_QL_TERMS[1]}',
                              '{_QL_TERMS[2]}']) AS term),
    cf AS (
      SELECT term,
             CAST(COUNT(tok) AS BIGINT) * 1000000000
               // (SELECT ct FROM ctot) AS p_ppb
      FROM qterms LEFT JOIN toks ON tok = term GROUP BY term),
    tf AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS f
      FROM toks WHERE tok IN ('{_QL_TERMS[0]}', '{_QL_TERMS[1]}',
                              '{_QL_TERMS[2]}')
      GROUP BY doc_id, tok),
    scored AS (
      SELECT dlen.doc_id,
             CAST(SUM(round(1e6 * ln(
               (COALESCE(tf.f, 0) + {_QL_MU} * (cf.p_ppb / 1e9))
               / (dlen.dl + {_QL_MU})))) AS BIGINT) AS ql_score_micro
      FROM dlen CROSS JOIN cf
      LEFT JOIN tf ON tf.doc_id = dlen.doc_id AND tf.term = cf.term
      GROUP BY dlen.doc_id)
    SELECT doc_id, ql_score_micro
    FROM scored ORDER BY ql_score_micro DESC, doc_id LIMIT 10
    """,
)
def docs_query_likelihood_retrieval(spark: SparkSession, sf_dir: str):
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) — the probabilistic-LM ranking that completes the IR tier
    next to docs_bm25_topk and the RRF fusion: score(d) = Σ_q ln((tf +
    μ·P(q|C)) / (|d| + μ)), where unseen terms still contribute through
    the collection prior instead of zeroing the product. Corpus priors
    quantize to exact ppb; every doc×term cell (3 terms — the query is
    bounded, the CROSS JOIN is 3-wide) takes one ln on identical
    operands, micro-quantized before the per-doc sum; top-10 is an
    exact integer ranking. Token-grain aggregates, doc-grain join —
    BM25's plan shape."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    )
    dlen = toks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    ctot = toks.agg(F.count("*").cast("bigint").alias("ct"))
    qterms = spark.createDataFrame(
        [(x,) for x in _QL_TERMS], "term string"
    )
    cf = (
        qterms.join(toks, qterms.term == toks.tok, "left")
        .groupBy("term")
        .agg(F.count("tok").cast("bigint").alias("tc"))
        .crossJoin(F.broadcast(ctot))
        .select(
            "term", F.expr("tc * 1000000000 div ct").alias("p_ppb")
        )
    )
    tf = (
        toks.filter(F.col("tok").isin(*_QL_TERMS))
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    scored = (
        dlen.crossJoin(F.broadcast(cf))
        .join(tf, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            F.round(
                1e6
                * F.log(
                    (
                        F.coalesce(F.col("f"), F.lit(0))
                        + _QL_MU * (F.col("p_ppb") / 1e9)
                    )
                    / (F.col("dl") + _QL_MU)
                )
            )
            .cast("bigint")
            .alias("term_micro"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_micro").cast("bigint").alias("ql_score_micro"))
    )
    return scored.orderBy(
        F.col("ql_score_micro").desc(), "doc_id"
    ).limit(10)


# ------------------------------------------------------------------
# 5. emb_ivf_sharding_plan — ANN index capacity planner
# ------------------------------------------------------------------

_SHARD_BYTES = 64 * 1024 * 1024
_VEC_BYTES = 4 * 64 + 16  # fp32 coords + id/overhead
_NPROBE = 8


@register(
    "emb_ivf_sharding_plan",
    f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM embeddings)
    SELECT nv AS n_vectors,
           CAST(floor(sqrt(CAST(nv AS DOUBLE))) AS BIGINT) AS nlist,
           CAST(nv * {_VEC_BYTES} AS BIGINT) AS index_bytes,
           CAST((nv * {_VEC_BYTES} + {_SHARD_BYTES} - 1)
                // {_SHARD_BYTES} AS BIGINT) AS n_shards,
           CAST(nv // GREATEST((nv * {_VEC_BYTES} + {_SHARD_BYTES} - 1)
                // {_SHARD_BYTES}, 1) AS BIGINT) AS vectors_per_shard,
           CAST({_NPROBE} * nv
                // GREATEST(CAST(floor(sqrt(CAST(nv AS DOUBLE)))
                            AS BIGINT), 1) AS BIGINT)
             AS expected_scan_per_query,
           CAST({_NPROBE} * nv * 1000000
                // GREATEST(CAST(floor(sqrt(CAST(nv AS DOUBLE)))
                            AS BIGINT), 1) // nv AS BIGINT)
             AS scan_fraction_ppm
    FROM n
    """,
)
def emb_ivf_sharding_plan(spark: SparkSession, sf_dir: str):
    """IVF index capacity planner — minhash_band_planner's sibling for
    the ANN tier: from the corpus count alone, derive the √n nlist
    rule, bytes and shard count at a 64 MiB shard target, and the
    expected per-query scan volume at nprobe=8 (nprobe·n/nlist — the
    number the IVF ops' docstrings cite; here it's computed, so a
    capacity review reads cost BEFORE building the index). Everything
    is exact integer arithmetic off one COUNT — the only non-integer
    step is floor(√n), identical in both engines. At 100 TB the same
    single-row plan falls out of the table statistics."""
    e = t(spark, sf_dir, "embeddings")
    n = e.agg(F.count("*").cast("bigint").alias("nv"))
    nlist = "CAST(floor(sqrt(CAST(nv AS DOUBLE))) AS BIGINT)"
    shards = (
        f"(nv * {_VEC_BYTES} + {_SHARD_BYTES} - 1) div {_SHARD_BYTES}"
    )
    return n.select(
        F.col("nv").alias("n_vectors"),
        F.expr(nlist).alias("nlist"),
        F.expr(f"CAST(nv * {_VEC_BYTES} AS BIGINT)").alias("index_bytes"),
        F.expr(f"CAST({shards} AS BIGINT)").alias("n_shards"),
        F.expr(
            f"CAST(nv div GREATEST({shards}, 1) AS BIGINT)"
        ).alias("vectors_per_shard"),
        F.expr(
            f"CAST({_NPROBE} * nv div GREATEST({nlist}, 1) AS BIGINT)"
        ).alias("expected_scan_per_query"),
        F.expr(
            f"CAST({_NPROBE} * nv * 1000000 div GREATEST({nlist}, 1)"
            " div nv AS BIGINT)"
        ).alias("scan_fraction_ppm"),
    )


# ------------------------------------------------------------------
# 6. customer_ab_stratified_assignment — randomization + balance audit
# ------------------------------------------------------------------


@register(
    "customer_ab_stratified_assignment",
    f"""
    WITH spend AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS spend_c
      FROM orders GROUP BY 1),
    tiled AS (
      SELECT custkey, spend_c,
             NTILE(5) OVER (ORDER BY spend_c, custkey) AS stratum,
             CASE WHEN {_BUCKET_SQL.format(key="CAST(custkey AS VARCHAR)")}
                  < 50 THEN 'A' ELSE 'B' END AS arm
      FROM spend)
    SELECT stratum,
           CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           CAST(SUM(CASE WHEN arm = 'A' THEN spend_c ELSE 0 END)
             AS BIGINT) AS spend_a_cents,
           CAST(SUM(CASE WHEN arm = 'B' THEN spend_c ELSE 0 END)
             AS BIGINT) AS spend_b_cents,
           (CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS DOUBLE)
            - CAST(COUNT(*) AS DOUBLE) / 2)
           / sqrt(CAST(COUNT(*) AS DOUBLE) / 4) AS srm_z
    FROM tiled GROUP BY stratum ORDER BY stratum
    """,
)
def customer_ab_stratified_assignment(spark: SparkSession, sf_dir: str):
    """Stratified experiment randomization with its own balance audit:
    customers stratify into exact spend quintiles
    (operators/ranking.exact_ntile — distributed, no fact-grain global
    window), the deterministic md5 coin assigns arms (reproducible —
    the same customer always lands in the same arm, the property
    triggered-experiment reruns depend on), and the per-stratum report
    carries counts, spend mass, and the SRM z-score — the
    events_ab_srm_check guardrail applied per stratum, where imbalance
    actually hides. Quintile grain output (5 rows); the md5 coin and
    conditional sums are scan-local."""
    from ..operators.ranking import exact_ntile

    o = t(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_c")
    )
    tiled = exact_ntile(
        spend, 5, F.col("spend_c"), ["custkey"], "stratum"
    ).withColumn(
        "arm",
        F.when(
            _md5_bucket(F.col("custkey").cast("string")) < 50, "A"
        ).otherwise("B"),
    )
    in_a = F.col("arm") == "A"
    return (
        tiled.groupBy("stratum")
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
            F.sum(F.when(~in_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
            F.sum(F.when(in_a, F.col("spend_c")).otherwise(0))
            .cast("bigint")
            .alias("spend_a_cents"),
            F.sum(F.when(~in_a, F.col("spend_c")).otherwise(0))
            .cast("bigint")
            .alias("spend_b_cents"),
            (
                (
                    F.sum(F.when(in_a, 1).otherwise(0)).cast("double")
                    - F.count("*").cast("double") / 2
                )
                / F.sqrt(F.count("*").cast("double") / 4)
            ).alias("srm_z"),
        )
        .orderBy("stratum")
    )
