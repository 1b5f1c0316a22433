"""Round-6g operators: corpus keyness, experiment planning, clustering
evaluation, fraud audit, availability monitoring, and the salted
two-phase aggregation pattern.

Six more platform operators: log-likelihood (G²) keyness per source,
an A/B sample-size (power) calculator from observed conversion, the
adjusted Rand index between the LSH-bucket and label partitions of the
embedding corpus, a duplicate-payment fraud audit, an hourly outage
(gap run) report, and a salted two-phase aggregation that demonstrates
the canonical skew-mitigation shape with a value-identical contract.

Same parity contract as the rest of the registry."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t
from .llm_ops import _BUCKET_DIMS, _BUCKET_SQL
from ..llm.similarity import sign_bucket

# ------------------------------------------------------------------
# 1. docs_source_keyness_g2 — log-likelihood keyness per source
# ------------------------------------------------------------------

_KEY_TOPK = 5


@register(
    "docs_source_keyness_g2",
    f"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+'))
               AS tok
      FROM documents),
    tc AS (
      SELECT source, tok, COUNT(*) AS o11 FROM toks GROUP BY source, tok),
    col_tot AS (SELECT tok, SUM(o11) AS c1 FROM tc GROUP BY tok),
    row_tot AS (SELECT source, SUM(o11) AS r1 FROM tc GROUP BY source),
    n_tot AS (SELECT SUM(o11) AS n FROM tc),
    cells AS (
      SELECT tc.source, tc.tok, tc.o11,
             col_tot.c1 - tc.o11 AS o21,
             row_tot.r1 - tc.o11 AS o12,
             n_tot.n - col_tot.c1 - row_tot.r1 + tc.o11 AS o22,
             row_tot.r1, col_tot.c1, n_tot.n
      FROM tc
      JOIN col_tot ON tc.tok = col_tot.tok
      JOIN row_tot ON tc.source = row_tot.source
      CROSS JOIN n_tot),
    g2 AS (
      SELECT source, tok, o11,
             (CASE WHEN o11 > 0 THEN CAST(round(2000 * o11 *
                ln(CAST(o11 AS DOUBLE) * n
                   / (CAST(r1 AS DOUBLE) * c1))) AS BIGINT) ELSE 0 END)
             + (CASE WHEN o12 > 0 THEN CAST(round(2000 * o12 *
                ln(CAST(o12 AS DOUBLE) * n
                   / (CAST(r1 AS DOUBLE) * (n - c1)))) AS BIGINT)
                ELSE 0 END)
             + (CASE WHEN o21 > 0 THEN CAST(round(2000 * o21 *
                ln(CAST(o21 AS DOUBLE) * n
                   / (CAST(n - r1 AS DOUBLE) * c1))) AS BIGINT)
                ELSE 0 END)
             + (CASE WHEN o22 > 0 THEN CAST(round(2000 * o22 *
                ln(CAST(o22 AS DOUBLE) * n
                   / (CAST(n - r1 AS DOUBLE) * (n - c1)))) AS BIGINT)
                ELSE 0 END) AS g2_milli
      FROM cells),
    ranked AS (
      SELECT source, tok, o11, g2_milli,
             row_number() OVER (PARTITION BY source
                                ORDER BY g2_milli DESC, tok) AS rnk
      FROM g2)
    SELECT source, CAST(rnk AS INT) AS rnk, tok AS token,
           CAST(o11 AS BIGINT) AS n_in_source,
           CAST(g2_milli AS BIGINT) AS g2_milli
    FROM ranked WHERE rnk <= {_KEY_TOPK}
    ORDER BY source, rnk
    """,
)
def docs_source_keyness_g2(spark: SparkSession, sf_dir: str):
    """Log-likelihood (Dunning G²) keyness per source — the
    corpus-linguistics statistic behind "what words characterize this
    domain vs the rest of the corpus", used to spot template
    contamination and topical skew before mixing sources into a
    training corpus. The 2×2 contingency per (source, token) comes from
    three mergeable aggregates (cell, row, column totals) joined back
    on the token key — token-grain, never document-grain, so the joins
    ride vocabulary size; each of the four O·ln(O/E) terms takes ONE ln
    of a ratio of exact integers and quantizes to milli-units, so
    ranking is exact. Top-{_KEY_TOPK} per source prunes map-side
    (partitioned row_number → WindowGroupLimit)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    )
    tc = toks.groupBy("source", "tok").agg(F.count("*").alias("o11"))
    col_tot = tc.groupBy("tok").agg(F.sum("o11").alias("c1"))
    row_tot = tc.groupBy("source").agg(F.sum("o11").alias("r1"))
    n_tot = tc.agg(F.sum("o11").alias("n"))
    cells = (
        tc.join(col_tot, "tok")
        .join(F.broadcast(row_tot), "source")
        .crossJoin(F.broadcast(n_tot))
    )

    def term(o, e_num, e_den):
        return F.when(
            o > 0,
            F.round(
                2000
                * o
                * F.log(
                    o.cast("double") * F.col("n") / (e_num * e_den)
                )
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))

    o11 = F.col("o11")
    o12 = F.col("r1") - o11
    o21 = F.col("c1") - o11
    o22 = F.col("n") - F.col("c1") - F.col("r1") + o11
    g2 = cells.select(
        "source",
        "tok",
        "o11",
        (
            term(o11, F.col("r1").cast("double"), F.col("c1"))
            + term(
                o12,
                F.col("r1").cast("double"),
                F.col("n") - F.col("c1"),
            )
            + term(
                o21,
                (F.col("n") - F.col("r1")).cast("double"),
                F.col("c1"),
            )
            + term(
                o22,
                (F.col("n") - F.col("r1")).cast("double"),
                F.col("n") - F.col("c1"),
            )
        ).alias("g2_milli"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("g2_milli").desc(), F.col("tok")
    )
    return (
        g2.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KEY_TOPK)
        .select(
            "source",
            F.col("rnk").cast("int"),
            F.col("tok").alias("token"),
            F.col("o11").cast("bigint").alias("n_in_source"),
            F.col("g2_milli").cast("bigint"),
        )
        .orderBy("source", "rnk")
    )


# ------------------------------------------------------------------
# 2. events_power_analysis_grid — A/B sample-size calculator
# ------------------------------------------------------------------

_POWER_Z = 1.959964 + 0.841621  # z_{0.975} + z_{0.80}
_POWER_MDES = [5000, 10000, 20000, 50000]  # absolute MDE in ppm


@register(
    "events_power_analysis_grid",
    f"""
    WITH base AS (
      SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  ::HUGEINT * 1000000 // COUNT(*) AS BIGINT) AS p_ppm
      FROM events),
    grid AS (SELECT unnest({_POWER_MDES}) AS mde_ppm)
    SELECT CAST(grid.mde_ppm AS BIGINT) AS mde_ppm,
           CAST(base.p_ppm AS BIGINT) AS p_base_ppm,
           CAST(ceil(
             {_POWER_Z} * {_POWER_Z}
             * ((base.p_ppm / 1e6) * (1 - base.p_ppm / 1e6)
                + ((base.p_ppm + grid.mde_ppm) / 1e6)
                  * (1 - (base.p_ppm + grid.mde_ppm) / 1e6))
             / ((grid.mde_ppm / 1e6) * (grid.mde_ppm / 1e6)))
           AS BIGINT) AS n_per_arm
    FROM base, grid ORDER BY mde_ppm
    """,
)
def events_power_analysis_grid(spark: SparkSession, sf_dir: str):
    """A/B sample-size (power) calculator seeded from the OBSERVED
    purchase conversion — the planning step before
    events_ab_sequential_monitor runs: for each minimum-detectable
    effect in the grid, the per-arm sample size at 80% power / 5%
    two-sided alpha (two-proportion normal approximation, z constants
    hard-coded literals). The base rate is ONE exact-integer ppm from a
    combinable count; everything after is a 4-row grid of IEEE ops on
    identical operands. At any scale this is one scan plus metadata
    arithmetic — the op exists because experiment planning belongs next
    to the data, not in a notebook with a stale rate."""
    ev = t(spark, sf_dir, "events")
    base = ev.agg(
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0"
            " END) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("p_ppm")
    )
    grid = F.explode(
        F.array(*[F.lit(m) for m in _POWER_MDES])
    ).alias("mde_ppm")
    p = F.col("p_ppm") / 1e6
    p2 = (F.col("p_ppm") + F.col("mde_ppm")) / 1e6
    d = F.col("mde_ppm") / 1e6
    return (
        base.select(grid, "p_ppm")
        .select(
            F.col("mde_ppm").cast("bigint"),
            F.col("p_ppm").cast("bigint").alias("p_base_ppm"),
            F.ceil(
                _POWER_Z
                * _POWER_Z
                * (p * (1 - p) + p2 * (1 - p2))
                / (d * d)
            )
            .cast("bigint")
            .alias("n_per_arm"),
        )
        .orderBy("mde_ppm")
    )


# ------------------------------------------------------------------
# 3. emb_bucket_label_ari — adjusted Rand index of two partitions
# ------------------------------------------------------------------


@register(
    "emb_bucket_label_ari",
    f"""
    WITH assign AS (
      SELECT {_BUCKET_SQL} AS bucket, label FROM embeddings),
    cont AS (
      SELECT bucket, label, COUNT(*) AS nij
      FROM assign GROUP BY bucket, label),
    sums AS (
      SELECT SUM((nij * (nij - 1)) // 2) AS sum_ij,
             (SELECT SUM((a * (a - 1)) // 2) FROM (
                SELECT SUM(nij) AS a FROM cont GROUP BY bucket)) AS sum_a,
             (SELECT SUM((b * (b - 1)) // 2) FROM (
                SELECT SUM(nij) AS b FROM cont GROUP BY label)) AS sum_b,
             (SELECT COUNT(*) FROM assign) AS n
      FROM cont)
    SELECT CAST(n AS BIGINT) AS n_vecs,
           CAST(sum_ij AS BIGINT) AS sum_pairs_joint,
           CAST(sum_a AS BIGINT) AS sum_pairs_buckets,
           CAST(sum_b AS BIGINT) AS sum_pairs_labels,
           round(
             CAST(2 * (((n * (n - 1)) // 2)::HUGEINT * sum_ij
                       - sum_a::HUGEINT * sum_b) AS DOUBLE)
             / CAST(((n * (n - 1)) // 2)::HUGEINT * (sum_a + sum_b)
                    - 2 * sum_a::HUGEINT * sum_b AS DOUBLE), 6) AS ari
    FROM sums
    """,
)
def emb_bucket_label_ari(spark: SparkSession, sf_dir: str):
    """Adjusted Rand index between the sign-bucket LSH partition and the
    label partition of the embedding corpus — the clustering-evaluation
    statistic that answers "does the cheap hash partition recover the
    semantic clusters?" (ARI = 0 ⇔ chance agreement, 1 ⇔ identical
    partitions), i.e. the quality gate on the bucketed-dedup and
    LSH-ANN tiers. The entire index reduces to pair-counting sums over
    the bucket×label contingency table — ONE combinable groupBy, then
    marginal folds of the tiny contingency, all exact integers
    (C(n,2) products in HUGEINT/decimal(38,0), the /2s exact because
    n(n−1) is even); the single double division is the last op. At
    100 TB the contingency is |buckets|×|labels| rows regardless of
    corpus size."""
    e = t(spark, sf_dir, "embeddings")
    assign = e.select(
        sign_bucket(F.col("embedding"), _BUCKET_DIMS).alias("bucket"),
        "label",
    )
    cont = assign.groupBy("bucket", "label").agg(
        F.count("*").alias("nij")
    )
    big = "decimal(38,0)"
    sum_ij = cont.agg(
        F.sum(
            F.expr("CAST((nij * (nij - 1)) div 2 AS DECIMAL(38,0))")
        ).alias("sum_ij")
    )
    sum_a = (
        cont.groupBy("bucket")
        .agg(F.sum("nij").alias("a"))
        .agg(
            F.sum(
                F.expr("CAST((a * (a - 1)) div 2 AS DECIMAL(38,0))")
            ).alias("sum_a")
        )
    )
    sum_b = (
        cont.groupBy("label")
        .agg(F.sum("nij").alias("b"))
        .agg(
            F.sum(
                F.expr("CAST((b * (b - 1)) div 2 AS DECIMAL(38,0))")
            ).alias("sum_b")
        )
    )
    n = assign.agg(F.count("*").cast(big).alias("n"))
    tot = (
        sum_ij.crossJoin(sum_a).crossJoin(sum_b).crossJoin(n)
    )
    cn2 = F.expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * (n - 1)) div 2 AS DECIMAL(38,0))"
    )
    return tot.select(
        F.col("n").cast("bigint").alias("n_vecs"),
        F.col("sum_ij").cast("bigint").alias("sum_pairs_joint"),
        F.col("sum_a").cast("bigint").alias("sum_pairs_buckets"),
        F.col("sum_b").cast("bigint").alias("sum_pairs_labels"),
        F.round(
            (
                2
                * (
                    cn2 * F.col("sum_ij")
                    - F.col("sum_a") * F.col("sum_b")
                )
            ).cast("double")
            / (
                cn2 * (F.col("sum_a") + F.col("sum_b"))
                - 2 * F.col("sum_a") * F.col("sum_b")
            ).cast("double"),
            6,
        ).alias("ari"),
    )


# ------------------------------------------------------------------
# 4. orders_duplicate_payment_audit — fraud/double-charge screen
# ------------------------------------------------------------------

_DUP_BAND_CENTS = 10_000  # $100 amount band


@register(
    "orders_duplicate_payment_audit",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
             CAST(o_orderdate AS DATE) AS day
      FROM orders)
    SELECT CAST(a.o_custkey AS BIGINT) AS custkey,
           CAST(a.cents // {_DUP_BAND_CENTS} AS BIGINT) AS amount_band,
           CAST(a.cents AS BIGINT) AS cents_a,
           CAST(b.cents AS BIGINT) AS cents_b,
           CAST(a.o_orderkey AS BIGINT) AS orderkey_a,
           CAST(b.o_orderkey AS BIGINT) AS orderkey_b,
           CAST(abs(b.day - a.day) AS INT) AS day_gap,
           CAST(CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END AS INT)
             AS exact_amount
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.cents // {_DUP_BAND_CENTS} = b.cents // {_DUP_BAND_CENTS}
     AND a.o_orderkey < b.o_orderkey
    ORDER BY custkey, amount_band, orderkey_a, orderkey_b
    """,
)
def orders_duplicate_payment_audit(spark: SparkSession, sf_dir: str):
    """Duplicate-payment audit — the double-charge screen every
    payments/AP team runs: pairs of orders from the SAME customer in
    the SAME $100 amount band, flagged exact when the cents match to
    the penny, with the day gap an analyst triages by (a same-day
    exact pair is a double-submit; a 30-day exact pair is a
    subscription). The self-join keys on (custkey, integer amount
    band) — a real equi-join, so the shuffle is keyed and row-local
    comparison handles the rest; banding (not exact cents) is the
    blocking choice because real double-charges drift by fees, and it
    is what makes the audit fire on data whose amounts rarely collide
    exactly. Pair order is pinned (lower orderkey first). At 100 TB
    this is one keyed shuffle; a skewed (cust, band) — a subscription
    charging the same amount daily — is exactly what the audit should
    surface."""
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).withColumn(
        "amount_band", F.expr(f"cents div {_DUP_BAND_CENTS}")
    )
    a = base.select(
        F.col("o_custkey").alias("custkey"),
        "amount_band",
        F.col("cents").alias("cents_a"),
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("day").alias("day_a"),
    )
    b = base.select(
        F.col("o_custkey").alias("custkey"),
        "amount_band",
        F.col("cents").alias("cents_b"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("day").alias("day_b"),
    )
    return (
        a.join(b, ["custkey", "amount_band"])
        .filter(F.col("orderkey_a") < F.col("orderkey_b"))
        .select(
            F.col("custkey").cast("bigint"),
            F.col("amount_band").cast("bigint"),
            F.col("cents_a").cast("bigint"),
            F.col("cents_b").cast("bigint"),
            F.col("orderkey_a").cast("bigint"),
            F.col("orderkey_b").cast("bigint"),
            F.abs(F.datediff(F.col("day_b"), F.col("day_a")))
            .cast("int")
            .alias("day_gap"),
            F.when(F.col("cents_a") == F.col("cents_b"), 1)
            .otherwise(0)
            .cast("int")
            .alias("exact_amount"),
        )
        .orderBy("custkey", "amount_band", "orderkey_a", "orderkey_b")
    )


# ------------------------------------------------------------------
# 5. events_gap_outage_report — zero-traffic run detection
# ------------------------------------------------------------------


@register(
    "events_gap_outage_report",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events),
    spine AS (
      SELECT t.ty AS event_type, h.h AS hour
      FROM (SELECT DISTINCT event_type AS ty FROM events) t,
           (SELECT unnest(generate_series(bounds.h0, bounds.h1,
                                          INTERVAL 1 HOUR)) AS h
            FROM bounds) h),
    counts AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    zeroed AS (
      SELECT s.event_type, s.hour,
             row_number() OVER (PARTITION BY s.event_type
                                ORDER BY s.hour) AS rn
      FROM spine s LEFT JOIN counts c
        ON s.event_type = c.event_type AND s.hour = c.hour
      WHERE c.n IS NULL),
    islands AS (
      SELECT event_type, hour,
             hour - to_hours(rn::INT) AS grp
      FROM zeroed)
    SELECT event_type,
           MIN(hour) AS gap_start,
           MAX(hour) AS gap_end,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM islands GROUP BY event_type, grp
    ORDER BY event_type, gap_start
    """,
)
def events_gap_outage_report(spark: SparkSession, sf_dir: str):
    """Zero-traffic outage report — the availability monitor that turns
    "which (event_type, hour) cells are EMPTY" into consolidated outage
    windows via gaps-and-islands (consecutive zero hours collapse to
    one row with start/end/duration — what a pager needs, not 720 cell
    flags). The hour spine derives from the observed bounds (calendar-
    bounded — metadata-sized at any corpus scale), the per-cell counts
    are one combinable groupBy, and the island key is the classic
    hour − row_number() trick inside a per-type partition. Complements
    orders_calendar_densify (which fills gaps) by REPORTING them, and
    events_late_arrival_accounting (data late vs data absent)."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = ev.select(
        F.col("event_type").alias("ty")
    ).distinct()
    spine = (
        bounds.select(
            F.explode(
                F.sequence(
                    F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR")
                )
            ).alias("hour")
        )
        .crossJoin(F.broadcast(types))
        .select(F.col("ty").alias("event_type"), "hour")
    )
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    zeroed = (
        spine.join(counts, ["event_type", "hour"], "left")
        .filter(F.col("n").isNull())
        .select("event_type", "hour")
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    islands = zeroed.withColumn("rn", F.row_number().over(w)).select(
        "event_type",
        "hour",
        (
            F.col("hour").cast("long") - F.col("rn") * 3600
        ).alias("grp"),
    )
    return (
        islands.groupBy("event_type", "grp")
        .agg(
            F.min("hour").alias("gap_start"),
            F.max("hour").alias("gap_end"),
            F.count("*").cast("bigint").alias("n_hours"),
        )
        .select("event_type", "gap_start", "gap_end", "n_hours")
        .orderBy("event_type", "gap_start")
    )


# ------------------------------------------------------------------
# 6. events_salted_twophase_agg — the skew-mitigation pattern
# ------------------------------------------------------------------

_SALT_BUCKETS = 8


@register(
    "events_salted_twophase_agg",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT user_id % {_SALT_BUCKETS}) AS BIGINT)
             AS n_salt_partitions
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_salted_twophase_agg(spark: SparkSession, sf_dir: str):
    """Salted two-phase aggregation — the canonical skew-mitigation
    pattern made value-identical to the direct aggregate (the oracle IS
    the plain GROUP BY): phase 1 aggregates on (key, salt) so a hot key
    spreads across {_SALT_BUCKETS} reducers, phase 2 merges the salted
    partials on the key alone. Counts and exact-cents sums are
    mergeable (the property that makes two-phase legal — which is why
    the per-phase aggregates here are count/sum, never a median); the
    salt is derived (user_id modulus), not random, so the phase-1
    partials are themselves deterministic. At 100 TB this is the
    standard fix when one event_type dominates the shuffle — AQE's
    skew-join handles joins, but skewed AGGREGATION keys need this
    shape; the n_salt_partitions column reports the achieved fan-out."""
    ev = t(spark, sf_dir, "events")
    phase1 = (
        ev.select(
            "event_type",
            (F.col("user_id") % _SALT_BUCKETS).alias("salt"),
            (dec("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum("cents").alias("pc"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n_events"),
            F.sum("pc").cast("bigint").alias("total_cents"),
            F.countDistinct("salt").cast("bigint").alias(
                "n_salt_partitions"
            ),
        )
        .orderBy("event_type")
    )
