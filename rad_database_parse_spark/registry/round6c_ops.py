"""Round-6c operators: curation-governance and statistics extensions.

Six operators a 100 TB training-data platform needs beyond the round-6b
surface — privacy release (k-anonymity generalization over quasi-
identifiers), corpus balance (per-domain capping), semantic dedup over
embedding clusters (SemDeDup-style), contrastive hard-negative mining,
and two statistics kernels (autocorrelation of a revenue series,
jackknife variance of a ratio estimator).

Extends the reference's governance surface (delete-with-LIMIT
`database.py:66-71`, exact-dup anti-join `database.py:35-41`) with the
curation operators a modern pipeline layers on top.

Float-parity contract (same as the rest of the registry): exact
decimal/integer aggregation first, double division of exact operands
last, cosines rounded to 6dp before any comparison, fixed-point
micro-units wherever a SUM over doubles would be order-dependent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, disc_price, t
from ..llm.similarity import _dot, _norm

# ------------------------------------------------------------------
# 1. events_autocorrelation — ACF of the daily purchase-revenue series
# ------------------------------------------------------------------

_ACF_LAGS = [1, 2, 3, 4, 5, 6, 7]


@register(
    "events_autocorrelation",
    f"""
    WITH day_rev AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    daily AS (
      SELECT day, CAST(SUM(cents) AS BIGINT) AS rev
      FROM day_rev GROUP BY day),
    lagged AS (
      SELECT g.lag AS lag, a.rev AS x, b.rev AS y
      FROM (SELECT unnest({_ACF_LAGS}) AS lag) g
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + to_days(g.lag::INT))
    SELECT CAST(lag AS INT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(
             CAST(COUNT(*)::HUGEINT * SUM(x::HUGEINT * y)
                  - SUM(x::HUGEINT) * SUM(y::HUGEINT) AS DOUBLE)
             / (sqrt(CAST(COUNT(*)::HUGEINT * SUM(x::HUGEINT * x)
                          - SUM(x::HUGEINT) * SUM(x::HUGEINT) AS DOUBLE))
                * sqrt(CAST(COUNT(*)::HUGEINT * SUM(y::HUGEINT * y)
                            - SUM(y::HUGEINT) * SUM(y::HUGEINT) AS DOUBLE))),
             6) AS acf
    FROM lagged GROUP BY lag ORDER BY lag
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str):
    """Autocorrelation function of the daily purchase-revenue series at
    lags 1..7 — the seasonality probe behind every anomaly detector and
    forecast horizon choice (is there a weekly cycle worth modeling?).
    Daily revenue aggregates exactly in integer cents (one map-side-
    combinable groupBy to calendar grain — the result is bounded by days,
    not rows, so everything after is metadata-sized at any corpus scale).
    Pearson r per lag from the five exact integer sums (n, Σx, Σy, Σxy,
    Σx², Σy²) carried in DECIMAL(38,0)/HUGEINT so the 100×-scale squares
    cannot overflow; the only double op is the final ratio of exact
    operands, rounded to 6dp. The lag alignment is a self-join of the
    day-grain table on day+lag — calendar-bounded, broadcastable."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum((dec("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    lags = F.explode(
        F.array(*[F.lit(x) for x in _ACF_LAGS])
    ).alias("lag")
    a = daily.select(lags, F.col("day"), F.col("rev").alias("x"))
    b = daily.select(
        F.col("day").alias("day_b"), F.col("rev").alias("y")
    )
    pairs = a.join(
        F.broadcast(b),
        F.expr("date_add(day, lag) = day_b"),
    )
    big = "decimal(38,0)"
    agg = pairs.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.col("x").cast(big)).alias("sx"),
        F.sum(F.col("y").cast(big)).alias("sy"),
        F.sum((F.col("x").cast(big) * F.col("y")).cast(big)).alias("sxy"),
        F.sum((F.col("x").cast(big) * F.col("x")).cast(big)).alias("sxx"),
        F.sum((F.col("y").cast(big) * F.col("y")).cast(big)).alias("syy"),
    )
    return (
        agg.select(
            F.col("lag").cast("int"),
            "n_pairs",
            F.round(
                (
                    F.col("n_pairs") * F.col("sxy")
                    - F.col("sx") * F.col("sy")
                ).cast("double")
                / (
                    F.sqrt(
                        (
                            F.col("n_pairs") * F.col("sxx")
                            - F.col("sx") * F.col("sx")
                        ).cast("double")
                    )
                    * F.sqrt(
                        (
                            F.col("n_pairs") * F.col("syy")
                            - F.col("sy") * F.col("sy")
                        ).cast("double")
                    )
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# ------------------------------------------------------------------
# 2. emb_semantic_dedup — SemDeDup within assigned clusters
# ------------------------------------------------------------------

_SEMDEDUP_TAU = 0.9


@register(
    "emb_semantic_dedup",
    f"""
    WITH c AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    dups AS (
      SELECT DISTINCT b.vec_id AS dup_id, b.label
      FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6)
            >= {_SEMDEDUP_TAU}),
    marked AS (
      SELECT c.label, c.vec_id,
             CASE WHEN d.dup_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      FROM c LEFT JOIN dups d ON c.vec_id = d.dup_id)
    SELECT CAST(label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dups,
           CAST(SUM(is_dup)::HUGEINT * 1000000 // COUNT(*) AS BIGINT)
             AS dup_ppm,
           md5(string_agg(CASE WHEN is_dup = 0
                               THEN CAST(vec_id AS VARCHAR) END,
                          ',' ORDER BY vec_id)) AS kept_fp
    FROM marked GROUP BY label ORDER BY label
    """,
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str):
    """SemDeDup-style semantic deduplication: within each embedding
    cluster, drop every vector whose rounded cosine to an earlier-id
    cluster member reaches τ=0.9, and report per-cluster keep/drop
    counts plus an md5 fingerprint of the kept set. The `label` column
    stands in for the cluster assignment a k-means pass produces at
    scale (the repo has that pass — emb_kmeans_lloyd / ivf_assign);
    SemDeDup's insight is exactly that the O(n²) cosine matrix becomes
    tractable once it is confined within small clusters. The self-join
    shuffles on the cluster key only; the cosine runs row-locally in
    whole-stage codegen on the joined arrays (no explode), and the kept
    fingerprint is a numeric-sorted collect bounded by cluster size. At
    100 TB: thousands of k-means clusters replace the 10-20 labels, so
    per-cluster pair volume stays flat while parallelism grows with the
    cluster count; skewed giant clusters split by a sub-cluster round
    (documented in SCALE.md)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("embedding").alias("va"),
    ).withColumn("na", _norm(F.col("va")))
    b = e.select(
        F.col("vec_id").alias("id_b"),
        "label",
        F.col("embedding").alias("vb"),
    ).withColumn("nb", _norm(F.col("vb")))
    dups = (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ),
        )
        .filter(F.col("sim") >= _SEMDEDUP_TAU)
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    marked = e.join(
        dups, e.vec_id == dups.dup_id, "left"
    ).select(
        "label",
        "vec_id",
        F.when(F.col("dup_id").isNotNull(), 1).otherwise(0).alias("is_dup"),
    )
    kept_fp = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_dup") == 0, F.col("vec_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        )
    )
    return (
        marked.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("is_dup").cast("bigint").alias("n_dups"),
            F.expr(
                "CAST(SUM(is_dup) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("dup_ppm"),
            kept_fp.alias("kept_fp"),
        )
        .select(
            F.col("label").cast("int"),
            "n_vecs",
            "n_dups",
            "dup_ppm",
            "kept_fp",
        )
        .orderBy("label")
    )


# ------------------------------------------------------------------
# 3. customer_kanon_generalize — k-anonymous release audit
# ------------------------------------------------------------------

_KANON_K = 5
_BAND_CENTS = 200_000  # 2000.00 balance-band width


@register(
    "customer_kanon_generalize",
    f"""
    WITH g AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               // {_BAND_CENTS} AS bal_band,
             sha256(c_name) AS pseudo
      FROM customer)
    SELECT CAST(nation AS INT) AS nation,
           segment,
           CAST(bal_band AS BIGINT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT pseudo) AS BIGINT) AS n_pseudonyms,
           CAST(CASE WHEN COUNT(*) < {_KANON_K} THEN 1 ELSE 0 END AS INT)
             AS suppressed
    FROM g GROUP BY nation, segment, bal_band
    ORDER BY nation, segment, bal_band
    """,
)
def customer_kanon_generalize(spark: SparkSession, sf_dir: str):
    """K-anonymity release audit over the customer table — the privacy
    gate before any per-customer extract leaves the platform (GDPR
    pseudonymization, reference delete semantics `database.py:66-71`
    generalized to release-time suppression). Quasi-identifiers are
    generalized (exact balance → 2000-wide band via integer-cents
    floor-division, no float banding), direct identifiers are
    pseudonymized (sha256 of the name; the distinct-pseudonym count per
    cell doubles as a collision check), and every equivalence class of
    size < k={_KANON_K} is flagged for suppression. One map-side-
    combinable groupBy to a (nation, segment, band) grain bounded by the
    dimension cross-product, never by row count — the 100 TB plan is the
    same plan. The banding uses `div` on exact cents so a boundary
    balance lands in the same band in both engines."""
    c = t(spark, sf_dir, "customer")
    g = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            f"CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            f" div {_BAND_CENTS} AS BIGINT)"
        ).alias("bal_band"),
        F.sha2(F.col("c_name"), 256).alias("pseudo"),
    )
    return (
        g.groupBy("nation", "segment", "bal_band")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.countDistinct("pseudo").cast("bigint").alias("n_pseudonyms"),
        )
        .select(
            F.col("nation").cast("int"),
            "segment",
            "bal_band",
            "n_customers",
            "n_pseudonyms",
            F.when(F.col("n_customers") < _KANON_K, 1)
            .otherwise(0)
            .cast("int")
            .alias("suppressed"),
        )
        .orderBy("nation", "segment", "bal_band")
    )


# ------------------------------------------------------------------
# 4. docs_domain_cap_sample — per-source corpus balance capping
# ------------------------------------------------------------------

_DOMAIN_CAP = 18


@register(
    "docs_domain_cap_sample",
    f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST((COUNT(*) - COUNT(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 END))
                ::HUGEINT * 1000000 // COUNT(*) AS BIGINT) AS drop_ppm,
           md5(string_agg(CASE WHEN rn <= {_DOMAIN_CAP}
                               THEN CAST(doc_id AS VARCHAR) END,
                          ',' ORDER BY doc_id)) AS kept_fp
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def docs_domain_cap_sample(spark: SparkSession, sf_dir: str):
    """Per-domain corpus capping — the balance lever web-scale curation
    pipelines apply so no single domain dominates the training mix
    (RefinedWeb / C4-style per-host caps): keep at most {_DOMAIN_CAP}
    documents per source, chosen by a deterministic md5-of-key order so
    the SAME documents survive on every run, every partitioning, and
    both engines. One window per source partition (the shuffle key is
    the domain — at 100 TB that is millions of hosts, so parallelism is
    wide and per-partition state is one counter; a pathological mega-
    host is exactly the row_number-early-prune shape InferWindowGroupLimit
    optimizes map-side on Spark 4). Reports kept/total/drop-ppm per
    source plus an md5 fingerprint of the kept id set, numeric-sorted in
    both engines."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "source", "doc_id", F.row_number().over(w).alias("rn")
    )
    kept_fp = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= _DOMAIN_CAP, F.col("doc_id")
                        )
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        )
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("rn") <= _DOMAIN_CAP, 1))
            .cast("bigint")
            .alias("n_kept"),
            kept_fp.alias("kept_fp"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.expr(
                "CAST((n_docs - n_kept) * 1000000 div n_docs AS BIGINT)"
            ).alias("drop_ppm"),
            "kept_fp",
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# 5. lineitem_jackknife_ratio — leave-one-month-out jackknife
# ------------------------------------------------------------------


@register(
    "lineitem_jackknife_ratio",
    """
    WITH monthly AS (
      SELECT date_trunc('month', l_shipdate) AS month,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev,
             SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY 1),
    tot AS (
      SELECT COUNT(*) AS m, SUM(rev) AS tr, SUM(qty) AS tq FROM monthly),
    loo AS (
      SELECT CAST(round(
               CAST(tot.tr - monthly.rev AS DOUBLE)
               / CAST(tot.tq - monthly.qty AS DOUBLE) * 1000000)
             AS BIGINT) AS theta_i_micro
      FROM monthly, tot),
    agg AS (
      SELECT MAX(tot.m) AS m,
             CAST(round(CAST(MAX(tot.tr) AS DOUBLE)
                        / CAST(MAX(tot.tq) AS DOUBLE) * 1000000)
               AS BIGINT) AS theta_micro,
             SUM(theta_i_micro::HUGEINT) AS s1,
             SUM(theta_i_micro::HUGEINT * theta_i_micro) AS s2
      FROM loo, tot)
    SELECT CAST(m AS BIGINT) AS n_months,
           round(theta_micro / 1e6, 6) AS theta_ratio,
           round((m - 1) * (CAST(s1 AS DOUBLE) / m - theta_micro) / 1e6,
                 6) AS jack_bias,
           round(sqrt(CAST(m - 1 AS DOUBLE) / m
                      * CAST(m * s2 - s1 * s1 AS DOUBLE)
                      / (CAST(m AS DOUBLE) * m)) / 1e6,
                 6) AS jack_se
    FROM agg
    """,
)
def lineitem_jackknife_ratio(spark: SparkSession, sf_dir: str):
    """Leave-one-month-out jackknife for the revenue-per-unit ratio
    estimator — the resampling-based uncertainty readout for a
    statistic whose variance has no closed form (a ratio of sums is
    non-linear, so the naive variance formula is biased; the jackknife
    is the classical fix). Monthly (revenue, quantity) totals aggregate
    exactly in decimal/bigint; each leave-one-out ratio θ_(i) =
    (T_r−r_i)/(T_q−q_i) is ONE double division of exact operands,
    immediately quantized to integer micro-units so the cross-month
    sums Σθ_(i) and Σθ_(i)² are exact integers (HUGEINT/decimal(38,0))
    — the repo's fixed-point contract that removes float summation-
    order divergence. Output: the ratio, the jackknife bias estimate
    (m−1)(θ̄_loo − θ), and the jackknife SE. The month grain bounds all
    post-aggregation work by the calendar, so this is a two-row-stage
    plan at any corpus size."""
    li = t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(
        F.sum(disc_price()).alias("rev"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
    )
    tot = monthly.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("rev").alias("tr"),
        F.sum("qty").alias("tq"),
    )
    big = "decimal(38,0)"
    loo = monthly.crossJoin(F.broadcast(tot)).select(
        "m",
        "tr",
        "tq",
        F.round(
            (F.col("tr") - F.col("rev")).cast("double")
            / (F.col("tq") - F.col("qty")).cast("double")
            * 1_000_000
        )
        .cast(big)
        .alias("ti"),
    )
    agg = loo.groupBy().agg(
        F.max("m").alias("m"),
        F.round(
            F.max(F.col("tr")).cast("double")
            / F.max(F.col("tq")).cast("double")
            * 1_000_000
        )
        .cast(big)
        .alias("theta_micro"),
        F.sum("ti").alias("s1"),
        F.sum((F.col("ti") * F.col("ti")).cast(big)).alias("s2"),
    )
    return agg.select(
        F.col("m").cast("bigint").alias("n_months"),
        F.round(F.col("theta_micro").cast("double") / 1e6, 6).alias(
            "theta_ratio"
        ),
        F.round(
            (F.col("m") - 1).cast("double")
            * (
                F.col("s1").cast("double") / F.col("m").cast("double")
                - F.col("theta_micro").cast("double")
            )
            / 1e6,
            6,
        ).alias("jack_bias"),
        F.round(
            F.sqrt(
                (F.col("m") - 1).cast("double")
                / F.col("m").cast("double")
                * (
                    F.col("m") * F.col("s2")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
                / (
                    F.col("m").cast("double")
                    * F.col("m").cast("double")
                )
            )
            / 1e6,
            6,
        ).alias("jack_se"),
    )


# ------------------------------------------------------------------
# 6. emb_hard_negative_mining — contrastive negatives via cosine
# ------------------------------------------------------------------

_HN_EVERY = 50  # query sample: vec_id % 50 == 0
_HN_K = 3


@register(
    "emb_hard_negative_mining",
    f"""
    WITH c AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    q AS (SELECT * FROM c WHERE vec_id % {_HN_EVERY} = 0),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             round(list_dot_product(q.v, c.v) /
                   (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
      FROM q JOIN c ON q.label <> c.label),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY sim DESC, negative_id) AS rnk
      FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(query_label AS INT) AS query_label,
           CAST(rnk AS INT) AS rnk,
           CAST(negative_id AS BIGINT) AS negative_id,
           CAST(negative_label AS INT) AS negative_label,
           sim
    FROM ranked WHERE rnk <= {_HN_K}
    ORDER BY query_id, rnk
    """,
)
def emb_hard_negative_mining(spark: SparkSession, sf_dir: str):
    """Hard-negative mining for contrastive training — for each sampled
    anchor embedding, the top-{_HN_K} most-similar vectors that carry a
    DIFFERENT label: the near-misses that teach a retrieval or
    embedding model its decision boundary (the negatives random
    sampling never finds). The anchor sample is a deterministic modulus
    of the id; anchors broadcast against one pass over the corpus (a
    broadcast nested-loop on the label-mismatch predicate — at 100 TB
    the anchor batch stays driver-bounded while the corpus side scans
    embarrassingly parallel, and the IVF index (emb_cosine_topk_ivf)
    swaps in as the candidate generator when the anchor set itself
    scales). Cosines rounded to 6dp before ranking, ties on id —
    byte-stable top-k in both engines; top-k per anchor prunes
    map-side via InferWindowGroupLimit."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % _HN_EVERY == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = e.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.join(
            F.broadcast(q),
            F.col("query_label") != F.col("negative_label"),
        )
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("query_label").cast("int"),
            F.col("rnk").cast("int"),
            F.col("negative_id").cast("bigint"),
            F.col("negative_label").cast("int"),
            "sim",
        )
        .orderBy("query_id", "rnk")
    )
