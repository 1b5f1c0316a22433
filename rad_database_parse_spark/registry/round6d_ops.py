"""Round-6d operators: robust statistics, drift monitoring, and
deterministic resampling.

Six more platform operators: MAD-based robust outlier bounds, PSI
population-drift between order eras, a deterministic Poisson bootstrap
(the distributed-resampling trick: per-row hash-derived Poisson(1)
weights replace sampling-with-replacement), per-document character
entropy as a quality signal, a Johnson-Lindenstrauss random-projection
distortion audit, and a classical seasonal decomposition of the monthly
revenue series.

Parity contract: all transcendental calls (ln) happen on bounded-grain
exact-integer inputs and are quantized to milli-units immediately
(boundary-flip probability is ulp/quantum per call — negligible at the
call counts here, see each docstring); everything else is exact
decimal/integer aggregation with double division of exact operands last.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. events_mad_outlier_bounds — robust location/scale per event type
# ------------------------------------------------------------------

_MAD_SIGMA = 1.4826  # consistency constant for normal data
_MAD_K = 3.0


@register(
    "events_mad_outlier_bounds",
    f"""
    WITH c AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events),
    med AS (
      SELECT event_type, quantile_cont(2 * cents, 0.5) AS med2
      FROM c GROUP BY event_type),
    dev AS (
      SELECT c.event_type, c.cents, med.med2,
             abs(2 * c.cents - med.med2) AS dev2
      FROM c JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, MAX(med2) AS med2,
             quantile_cont(2 * dev2, 0.5) AS mad4
      FROM dev GROUP BY event_type),
    bounds AS (
      SELECT event_type, med2, mad4,
             med2 / 200.0 - {_MAD_K} * {_MAD_SIGMA} * (mad4 / 400.0) AS lo,
             med2 / 200.0 + {_MAD_K} * {_MAD_SIGMA} * (mad4 / 400.0) AS hi
      FROM mad)
    SELECT b.event_type,
           round(b.med2 / 200.0, 6) AS median_value,
           round(b.mad4 / 400.0, 6) AS mad_value,
           round(b.lo, 6) AS lower_bound,
           round(b.hi, 6) AS upper_bound,
           CAST(COUNT(CASE WHEN c.cents / 100.0 < b.lo
                             OR c.cents / 100.0 > b.hi THEN 1 END)
                AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM bounds b JOIN c ON c.event_type = b.event_type
    GROUP BY b.event_type, b.med2, b.mad4, b.lo, b.hi
    ORDER BY b.event_type
    """,
)
def events_mad_outlier_bounds(spark: SparkSession, sf_dir: str):
    """Median/MAD robust outlier bounds per event type — the
    outlier screen that, unlike the z-score (events_anomaly_zscore),
    cannot be dragged by the outliers it is hunting (50% breakdown
    point vs 0%). Exactness trick: medians are computed over DOUBLED
    integer cents, so the even-count midpoint (a+b)/2 is itself an
    integer — both engines' interpolating percentile lands on the same
    exact value and the deviations stay integer all the way into the
    second median. Bounds are median ± 3·1.4826·MAD, pure IEEE ops on
    identical operands. The group grain is the event-type dimension;
    exact percentile is a per-group sort, the documented 100 TB swap is
    approx_percentile cut points (the ntile_decile_stats precedent) —
    the output contract is unchanged."""
    ev = t(spark, sf_dir, "events")
    c = ev.select(
        "event_type", (dec("value") * 100).cast("bigint").alias("cents")
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(2 * cents, 0.5)").alias("med2")
    )
    dev = c.join(med, "event_type").withColumn(
        "dev2", F.abs(2 * F.col("cents") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med2").alias("med2"),
        F.expr("percentile(2 * dev2, 0.5)").alias("mad4"),
    )
    bounds = mad.select(
        "event_type",
        "med2",
        "mad4",
        (
            F.col("med2") / 200.0
            - _MAD_K * _MAD_SIGMA * (F.col("mad4") / 400.0)
        ).alias("lo"),
        (
            F.col("med2") / 200.0
            + _MAD_K * _MAD_SIGMA * (F.col("mad4") / 400.0)
        ).alias("hi"),
    )
    return (
        c.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "med2", "mad4", "lo", "hi")
        .agg(
            F.count(
                F.when(
                    (F.col("cents") / 100.0 < F.col("lo"))
                    | (F.col("cents") / 100.0 > F.col("hi")),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        .select(
            "event_type",
            F.round(F.col("med2") / 200.0, 6).alias("median_value"),
            F.round(F.col("mad4") / 400.0, 6).alias("mad_value"),
            F.round("lo", 6).alias("lower_bound"),
            F.round("hi", 6).alias("upper_bound"),
            "n_outliers",
            "n_rows",
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------------------
# 2. orders_psi_drift — population stability index between eras
# ------------------------------------------------------------------

_PSI_CUT = "1998-07-01"
_PSI_BAND = 5_000_000  # 50,000.00 price-band width in cents


@register(
    "orders_psi_drift",
    f"""
    WITH binned AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               // {_PSI_BAND} AS band,
             CASE WHEN o_orderdate < TIMESTAMP '{_PSI_CUT}'
                  THEN 0 ELSE 1 END AS era
      FROM orders),
    counts AS (
      SELECT band,
             COUNT(CASE WHEN era = 0 THEN 1 END) AS n_a,
             COUNT(CASE WHEN era = 1 THEN 1 END) AS n_b
      FROM binned GROUP BY band),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts),
    shares AS (
      SELECT band, n_a, n_b,
             GREATEST(n_a::HUGEINT * 1000000 // tot.ta, 1) AS pa_ppm,
             GREATEST(n_b::HUGEINT * 1000000 // tot.tb, 1) AS pb_ppm
      FROM counts, tot)
    SELECT CAST(band AS BIGINT) AS band,
           CAST(n_a AS BIGINT) AS n_before,
           CAST(n_b AS BIGINT) AS n_after,
           CAST(pa_ppm AS BIGINT) AS before_ppm,
           CAST(pb_ppm AS BIGINT) AS after_ppm,
           CAST(round((pa_ppm - pb_ppm)
                      * round(ln(CAST(pa_ppm AS DOUBLE)
                                 / CAST(pb_ppm AS DOUBLE)) * 1000)
                      / 1000000000.0 * 1000000) AS BIGINT)
             AS psi_term_micro
    FROM shares ORDER BY band
    """,
)
def orders_psi_drift(spark: SparkSession, sf_dir: str):
    """Population stability index between the pre- and post-{_PSI_CUT}
    order eras over fixed 50k price bands — the model-monitoring drift
    metric (PSI > 0.25 = retrain) applied to the revenue distribution.
    Band shares are exact integer ppm (floored at 1 ppm — the standard
    zero-bin guard); each band's PSI term (Δp·ln(pa/pb)) takes ONE ln
    call on a ratio of exact integers, quantized to milli-units before
    the multiply, so the ~10 band terms are exact integer micro-PSI the
    reader can sum. Band grain is fixed by the price-band constant, not
    the data — the whole post-aggregation stage is metadata-sized at
    any corpus scale, and the one groupBy is map-side combinable."""
    o = t(spark, sf_dir, "orders")
    binned = o.select(
        F.expr(
            f"CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            f" div {_PSI_BAND} AS BIGINT)"
        ).alias("band"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_CUT).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("era"),
    )
    counts = binned.groupBy("band").agg(
        F.count(F.when(F.col("era") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("era") == 1, 1)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    shares = counts.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_a",
        "n_b",
        F.greatest(
            F.expr("CAST(n_a * 1000000 div ta AS BIGINT)"), F.lit(1)
        ).alias("pa_ppm"),
        F.greatest(
            F.expr("CAST(n_b * 1000000 div tb AS BIGINT)"), F.lit(1)
        ).alias("pb_ppm"),
    )
    return shares.select(
        F.col("band").cast("bigint"),
        F.col("n_a").cast("bigint").alias("n_before"),
        F.col("n_b").cast("bigint").alias("n_after"),
        F.col("pa_ppm").cast("bigint").alias("before_ppm"),
        F.col("pb_ppm").cast("bigint").alias("after_ppm"),
        F.round(
            (F.col("pa_ppm") - F.col("pb_ppm"))
            * F.round(
                F.log(
                    F.col("pa_ppm").cast("double")
                    / F.col("pb_ppm").cast("double")
                )
                * 1000
            )
            / 1e9
            * 1e6
        )
        .cast("bigint")
        .alias("psi_term_micro"),
    ).orderBy("band")


# ------------------------------------------------------------------
# 3. orders_bootstrap_ci_poisson — deterministic distributed bootstrap
# ------------------------------------------------------------------

# Poisson(1) CDF thresholds scaled to the 24-bit md5-derived uniform:
# floor(CDF(k) * 2^24) for k = 0..6 (k=7+ has the residual mass).
_POIS_T = [6171992, 12343985, 15429982, 16458647, 16715813, 16767247, 16775819]
_BOOT_B = 20


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {thr} THEN {k}" for k, thr in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 7 END"


@register(
    "orders_bootstrap_ci_poisson",
    f"""
    WITH g AS (SELECT unnest(range({_BOOT_B})) AS b),
    drawn AS (
      SELECT g.b,
             {_pois_case_sql("CAST(('0x' || substr(md5(o_orderkey || '_' || g.b), 1, 6)) AS INT)")}
               AS w,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM orders, g)
    SELECT CAST(b AS INT) AS replicate,
           CAST(SUM(w) AS BIGINT) AS n_drawn,
           round(CAST(SUM(w::HUGEINT * cents) AS DOUBLE)
                 / CAST(SUM(w) AS DOUBLE) / 100.0, 6) AS mean_price
    FROM drawn GROUP BY b ORDER BY b
    """,
)
def orders_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str):
    """Deterministic Poisson bootstrap of the mean order value — the
    distributed-resampling standard (Chamandy et al.: at scale you
    cannot sample n rows with replacement, but Multinomial(n, 1/n) ≈
    iid Poisson(1) weights, assignable row-locally in one pass). Each
    (row, replicate) weight is the inverse-CDF bucket of a 24-bit
    md5-derived uniform — a pure function of (o_orderkey, replicate),
    so both engines and every partitioning draw the SAME resamples;
    the CDF thresholds are hard-coded integer constants (no float ops
    at draw time). All {_BOOT_B} replicates accumulate in ONE map-side-
    combinable groupBy over the replicate-grid explode (no data is
    copied {_BOOT_B}×  through a shuffle; the weighted sums ride
    HUGEINT/decimal(38,0)). The replicate means ARE the bootstrap
    distribution — percentile CIs read straight off the 20 rows."""
    o = t(spark, sf_dir, "orders")
    grid = F.explode(
        F.array(*[F.lit(b) for b in range(_BOOT_B)])
    ).alias("b")
    u = (
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '_',"
        " CAST(b AS STRING))), 1, 6), 16, 10) AS INT)"
    )
    drawn = o.select("o_orderkey", "o_totalprice", grid).select(
        "b",
        F.expr(_pois_case_sql(u)).alias("w"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        drawn.groupBy("b")
        .agg(
            F.sum("w").cast("bigint").alias("n_drawn"),
            F.sum(
                (F.col("w").cast("decimal(38,0)") * F.col("cents")).cast(
                    "decimal(38,0)"
                )
            ).alias("swc"),
        )
        .select(
            F.col("b").cast("int").alias("replicate"),
            "n_drawn",
            F.round(
                F.col("swc").cast("double")
                / F.col("n_drawn").cast("double")
                / 100.0,
                6,
            ).alias("mean_price"),
        )
        .orderBy("replicate")
    )


# ------------------------------------------------------------------
# 4. docs_char_entropy — per-document character entropy profile
# ------------------------------------------------------------------

_ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
_ENTROPY_BUCKET = 250  # millinats per histogram bucket


def _char_count_sql(ch: str) -> str:
    lit = "' '" if ch == " " else f"'{ch}'"
    return f"(length(text) - length(replace(text, {lit}, '')))"


@register(
    "docs_char_entropy",
    f"""
    WITH terms AS (
      SELECT doc_id, lang,
             {" + ".join(_char_count_sql(c) for c in _ENTROPY_ALPHABET)}
               AS n,
             {" + ".join(
                 "CASE WHEN " + _char_count_sql(c) + " > 0 THEN "
                 "CAST(round(" + _char_count_sql(c) + " * ln("
                 + _char_count_sql(c) + ") * 1000) AS BIGINT) "
                 "ELSE 0 END"
                 for c in _ENTROPY_ALPHABET
             )} AS s_milli
      FROM documents),
    h AS (
      SELECT doc_id, lang, n,
             GREATEST(CAST(round(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT)
                      * n - s_milli, 0) // n AS h_milli
      FROM terms WHERE n > 0)
    SELECT lang,
           CAST(h_milli // {_ENTROPY_BUCKET} AS BIGINT) AS entropy_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(h_milli) AS BIGINT) AS min_millinats,
           CAST(MAX(h_milli) AS BIGINT) AS max_millinats
    FROM h GROUP BY lang, entropy_bucket
    ORDER BY lang, entropy_bucket
    """,
)
def docs_char_entropy(spark: SparkSession, sf_dir: str):
    """Per-document character-level Shannon entropy, bucketed into a
    per-language histogram — the cheapest quality/gibberish signal in
    the curation stack (runs of one character → near-zero entropy;
    natural text sits in a narrow band; random noise maxes out). The
    alphabet counts come from the length-difference trick (27 replace
    passes, all JVM string ops — NO per-character explode, so the row
    volume never multiplies). Each c·ln(c) term is quantized to exact
    integer millinats immediately (values ≤ ~10³, quantum 5e-4, ulp
    ~1e-13 — boundary-flip odds ~1e-10 per call), then H = ln(n) − S/n
    is pure integer arithmetic (floor div), so the bucket assignment is
    exact in both engines. One scan, one map-side-combinable groupBy to
    the (lang × bucket) grain."""
    d = t(spark, sf_dir, "documents")

    def cnt(ch: str):
        return F.length("text") - F.length(
            F.replace(F.col("text"), F.lit(ch))
        )

    n = None
    s = None
    for ch in _ENTROPY_ALPHABET:
        c = cnt(ch)
        n = c if n is None else n + c
        term = F.when(
            c > 0,
            F.round(
                c.cast("double") * F.log(c.cast("double")) * 1000
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        s = term if s is None else s + term
    h = (
        d.select(
            "doc_id",
            "lang",
            n.alias("n"),
            s.alias("s_milli"),
        )
        .filter(F.col("n") > 0)
        .select(
            "lang",
            F.expr(
                "CAST(GREATEST(CAST(round(ln(CAST(n AS DOUBLE)) * 1000)"
                " AS BIGINT) * n - s_milli, 0) div n AS BIGINT)"
            ).alias("h_milli"),
        )
    )
    return (
        h.groupBy(
            "lang",
            F.expr(
                f"CAST(h_milli div {_ENTROPY_BUCKET} AS BIGINT)"
            ).alias("entropy_bucket"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("h_milli").cast("bigint").alias("min_millinats"),
            F.max("h_milli").cast("bigint").alias("max_millinats"),
        )
        .orderBy("lang", "entropy_bucket")
    )


# ------------------------------------------------------------------
# 5. emb_jl_projection_distortion — random-projection audit
# ------------------------------------------------------------------

_JL_DIMS = 64
_JL_K = 16
_JL_EVERY = 37  # sample: vec_id % 37 == 0


@register(
    "emb_jl_projection_distortion",
    f"""
    WITH signs AS (
      SELECT j, list_transform(range({_JL_DIMS}), i ->
               CASE WHEN CAST(('0x' || substr(md5(i || '_' || j), 1, 6))
                         AS INT) % 2 = 0
                    THEN 1.0 ELSE -1.0 END) AS s
      FROM (SELECT unnest(range({_JL_K})) AS j)),
    sample_v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % {_JL_EVERY} = 0),
    proj AS (
      SELECT vec_id, j, list_dot_product(v, s) AS y
      FROM sample_v, signs),
    pd AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(round((a.y - b.y) * (a.y - b.y) * 1000) AS BIGINT))
               AS dist2p_milli
      FROM proj a JOIN proj b
        ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id),
    od AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, {_JL_DIMS} + 1),
               i -> CAST(round((a.v[i] - b.v[i]) * (a.v[i] - b.v[i]) * 1000)
                         AS BIGINT))) AS dist2o_milli
      FROM sample_v a JOIN sample_v b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, {_JL_DIMS} + 1),
              i -> CAST(round((a.v[i] - b.v[i]) * (a.v[i] - b.v[i]) * 1000)
                        AS BIGINT))) > 0)
    SELECT CAST(pd.id_a AS BIGINT) AS id_a,
           CAST(pd.id_b AS BIGINT) AS id_b,
           CAST(od.dist2o_milli AS BIGINT) AS dist2_orig_milli,
           CAST(pd.dist2p_milli AS BIGINT) AS dist2_proj_milli,
           CAST(pd.dist2p_milli::HUGEINT * 1000000
                // ({_JL_K} * od.dist2o_milli) AS BIGINT) AS distortion_ppm
    FROM pd JOIN od ON pd.id_a = od.id_a AND pd.id_b = od.id_b
    ORDER BY id_a, id_b
    """,
)
def emb_jl_projection_distortion(spark: SparkSession, sf_dir: str):
    """Johnson-Lindenstrauss random-projection distortion audit: project
    the {_JL_DIMS}-dim embeddings to {_JL_K} dims with a deterministic
    ±1 Achlioptas sign matrix (sign = md5 parity of (i,j) — the SAME
    matrix in both engines and on every executor, no RNG state to
    ship), then report per-pair how well projected distances track
    original distances (distortion_ppm ≈ 1e6 means the JL promise
    holds at k={_JL_K}). This is the audit run before committing an ANN
    index or dedup tier to a reduced dimension. Squared distances
    quantize per-term to exact integer milli-units (identical IEEE
    products of identical doubles, then exact sums — no summation-order
    exposure); distortion is exact integer ppm. The sampled pair set is
    quadratic only in the SAMPLE (id-modulus, driver-bounded); the
    projection itself is one broadcast of {_JL_K} sign rows against a
    map-side scan — the 100 TB shape for projecting the full corpus."""
    e = t(spark, sf_dir, "embeddings")
    sample = e.filter(F.col("vec_id") % _JL_EVERY == 0).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    signs = spark.range(_JL_K).select(
        F.col("id").cast("int").alias("j"),
        F.expr(
            f"transform(sequence(0, {_JL_DIMS - 1}), i -> "
            "CASE WHEN CAST(conv(substring(md5(concat(CAST(i AS STRING),"
            " '_', CAST(id AS STRING))), 1, 6), 16, 10) AS INT) % 2 = 0"
            " THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
        ).alias("s"),
    )
    proj = sample.crossJoin(F.broadcast(signs)).select(
        "vec_id",
        "j",
        F.expr(
            "aggregate(zip_with(v, s, (x, sg) -> x * sg),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("y"),
    )
    pa = proj.select(
        F.col("vec_id").alias("id_a"), "j", F.col("y").alias("ya")
    )
    pb = proj.select(
        F.col("vec_id").alias("id_b"), "j", F.col("y").alias("yb")
    )
    pd = (
        pa.join(pb, "j")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.round(
                    (F.col("ya") - F.col("yb"))
                    * (F.col("ya") - F.col("yb"))
                    * 1000
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("dist2p_milli")
        )
    )
    oa = sample.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    ob = sample.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    od = (
        oa.crossJoin(F.broadcast(ob))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr(
                "aggregate(zip_with(va, vb, (x, y) -> "
                "CAST(round((x - y) * (x - y) * 1000) AS BIGINT)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dist2o_milli"),
        )
        .filter(F.col("dist2o_milli") > 0)
    )
    return (
        pd.join(od, ["id_a", "id_b"])
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("dist2o_milli").cast("bigint").alias("dist2_orig_milli"),
            F.col("dist2p_milli").cast("bigint").alias("dist2_proj_milli"),
            F.expr(
                f"CAST(dist2p_milli * 1000000 div"
                f" ({_JL_K} * dist2o_milli) AS BIGINT)"
            ).alias("distortion_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------------------------
# 6. lineitem_seasonal_decompose — classical multiplicative seasonality
# ------------------------------------------------------------------


@register(
    "lineitem_seasonal_decompose",
    """
    WITH monthly AS (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY 1),
    idx AS (
      SELECT month, rev,
             row_number() OVER (ORDER BY month) AS i,
             COUNT(*) OVER () AS m
      FROM monthly),
    trend AS (
      SELECT a.i, a.month, a.rev,
             SUM(CASE WHEN abs(b.i - a.i) = 6 THEN b.rev
                      ELSE 2 * b.rev END) AS t24
      FROM idx a JOIN idx b ON b.i BETWEEN a.i - 6 AND a.i + 6
      WHERE a.i > 6 AND a.i <= a.m - 6
      GROUP BY a.i, a.month, a.rev
      HAVING COUNT(*) = 13),
    ratio AS (
      SELECT date_part('month', month) AS month_of_year,
             CAST(round(CAST(rev AS DOUBLE) * 24.0
                        / CAST(t24 AS DOUBLE) * 1000000) AS BIGINT)
               AS r_micro
      FROM trend),
    season AS (
      SELECT month_of_year,
             COUNT(*) AS n_obs,
             SUM(r_micro) // COUNT(*) AS s_micro
      FROM ratio GROUP BY month_of_year),
    norm AS (SELECT SUM(s_micro) AS tot FROM season)
    SELECT CAST(month_of_year AS INT) AS month_of_year,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(s_micro AS BIGINT) AS seasonal_micro,
           CAST(s_micro::HUGEINT * 12000000 // norm.tot AS BIGINT)
             AS seasonal_norm_ppm
    FROM season, norm ORDER BY month_of_year
    """,
)
def lineitem_seasonal_decompose(spark: SparkSession, sf_dir: str):
    """Classical multiplicative seasonal decomposition of the monthly
    revenue series — the 2×12 centered moving-average recipe every
    forecasting textbook opens with: trend from a 13-month window with
    half-weight endpoints (doubled weights keep it exact integer),
    detrended ratios quantized to micro-units, seasonal index = the
    per-calendar-month integer mean of those ratios, normalized so the
    12 indices sum to 12 (exact ppm). The fact scan collapses to month
    grain in one map-side-combinable groupBy; everything after — the
    13-month window join, the month-of-year fold — is calendar-bounded
    metadata work at any corpus scale. Complements orders_seasonality
    (raw month-of-year shares) with the trend-removed index and
    orders_holt_recursive_forecast (level+trend) with the seasonal
    factor it lacks."""
    li = t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(
        (
            F.sum(
                (
                    dec("l_extendedprice")
                    * (
                        F.lit(1).cast("decimal(12,2)")
                        - dec("l_discount")
                    )
                ).cast("decimal(18,4)")
            )
            * 10000
        )
        .cast("bigint")
        .alias("rev")
    )
    w = Window.orderBy("month")
    mtot = monthly.agg(F.count("*").alias("m"))
    idx = monthly.select(
        "month", "rev", F.row_number().over(w).alias("i")
    ).crossJoin(F.broadcast(mtot))
    a = idx.select(
        F.col("i").alias("ia"),
        F.col("month").alias("month"),
        F.col("rev").alias("rev_a"),
        "m",
    )
    b = idx.select(F.col("i").alias("ib"), F.col("rev").alias("rev_b"))
    trend = (
        a.join(
            F.broadcast(b),
            (F.col("ib") >= F.col("ia") - 6)
            & (F.col("ib") <= F.col("ia") + 6),
        )
        .filter((F.col("ia") > 6) & (F.col("ia") <= F.col("m") - 6))
        .groupBy("ia", "month", "rev_a")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("ib") - F.col("ia")) == 6, F.col("rev_b")
                ).otherwise(2 * F.col("rev_b"))
            ).alias("t24"),
            F.count("*").alias("nw"),
        )
        .filter(F.col("nw") == 13)
    )
    ratio = trend.select(
        F.month("month").alias("month_of_year"),
        F.round(
            F.col("rev_a").cast("double")
            * 24.0
            / F.col("t24").cast("double")
            * 1_000_000
        )
        .cast("bigint")
        .alias("r_micro"),
    )
    season = ratio.groupBy("month_of_year").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.expr("CAST(SUM(r_micro) div COUNT(*) AS BIGINT)").alias(
            "s_micro"
        ),
    )
    norm = season.agg(F.sum("s_micro").alias("tot"))
    return (
        season.crossJoin(F.broadcast(norm))
        .select(
            F.col("month_of_year").cast("int"),
            "n_obs",
            F.col("s_micro").cast("bigint").alias("seasonal_micro"),
            F.expr(
                "CAST(s_micro * 12000000 div tot AS BIGINT)"
            ).alias("seasonal_norm_ppm"),
        )
        .orderBy("month_of_year")
    )
