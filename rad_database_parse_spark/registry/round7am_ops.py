"""Round-7am operators: PQ code-usage balance, supply-shock exposure,
template-prefix census, unit-price consistency audit, and A/B novelty
decay.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import _REGISTRY, register
from ._util import dec, t
from . import round5_ops  # noqa: F401 — registers emb_pq_quantize

# ------------------------------------------------------------------
# 1. emb_pq_code_balance — quantizer health audit
# ------------------------------------------------------------------


def _pq_balance_oracle() -> str:
    pq = _REGISTRY["emb_pq_quantize"].oracle
    return f"""
    WITH pq AS ({pq}),
    cells AS (
      SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pq GROUP BY 1, 2),
    tot AS (
      SELECT subspace, CAST(SUM(cnt) AS BIGINT) AS n
      FROM cells GROUP BY 1),
    scored AS (
      SELECT c.subspace, c.cnt, t.n,
             CAST(round(-(CAST(c.cnt AS DOUBLE) / t.n)
               * ln(CAST(c.cnt AS DOUBLE) / t.n) * 1000000)
               AS BIGINT) AS contrib_micro
      FROM cells c JOIN tot t ON t.subspace = c.subspace)
    SELECT subspace,
           CAST(COUNT(*) AS BIGINT) AS n_codes_used,
           CAST(MAX(cnt) * 1000000 // MAX(n) AS BIGINT)
             AS max_code_share_ppm,
           CAST(SUM(contrib_micro) AS BIGINT) AS entropy_micro_nats
    FROM scored GROUP BY 1 ORDER BY subspace
    """


@register("emb_pq_code_balance", _pq_balance_oracle())
def emb_pq_code_balance(spark: SparkSession, sf_dir: str):
    """Product-quantizer code-usage balance — the quantizer-health
    audit next to the SimHash bit-balance op (same question, different
    signature family): a PQ subspace whose codes are used unevenly
    wastes its byte (entropy << ln 16 nats means fewer effective
    codes, coarser distances, worse ADC recall — and the fix is
    re-training that subspace's codebook, which this table localizes).
    Reuses the production quantization EXACTLY (the registered
    emb_pq_quantize plan builds the codes; its oracle text embeds as
    a CTE so both engines audit identical assignments). Per-code
    entropy contributions micro-round one ln each (bounded: 8×16
    cells) before the integer sum. max_code_share_ppm near 1e6/16 ≈
    62500 certifies balance; the deterministic seed codebooks here
    skew it — which is the audit working."""
    pq = _REGISTRY["emb_pq_quantize"].fn(spark, sf_dir)
    cells = pq.groupBy("subspace", "code").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = cells.groupBy("subspace").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    scored = cells.join(tot, "subspace").select(
        "subspace",
        "cnt",
        "n",
        F.expr(
            "CAST(round(-(CAST(cnt AS DOUBLE) / n)"
            " * ln(CAST(cnt AS DOUBLE) / n) * 1000000) AS BIGINT)"
        ).alias("contrib_micro"),
    )
    return (
        scored.groupBy("subspace")
        .agg(
            F.count("*").cast("bigint").alias("n_codes_used"),
            F.expr(
                "CAST(MAX(cnt) * 1000000 div MAX(n) AS BIGINT)"
            ).alias("max_code_share_ppm"),
            F.sum("contrib_micro").cast("bigint").alias(
                "entropy_micro_nats"
            ),
        )
        .orderBy("subspace")
    )


# ------------------------------------------------------------------
# 2. customer_supply_shock_exposure — stress-test analytics
# ------------------------------------------------------------------

_SHOCK_THRESH_PPM = 500_000  # >50% sourced from one nation


@register(
    "customer_supply_shock_exposure",
    f"""
    WITH sourced AS (
      SELECT o.o_custkey AS cust, s.s_nationkey AS supp_nation,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * 100 AS BIGINT)) AS BIGINT) AS v
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    shares AS (
      SELECT cust, supp_nation, v,
             CAST(v * 1000000 // SUM(v) OVER (PARTITION BY cust)
               AS BIGINT) AS share_ppm
      FROM sourced),
    exposed AS (
      SELECT supp_nation,
             CAST(COUNT(*) AS BIGINT) AS n_exposed_customers,
             CAST(SUM(v) AS BIGINT) AS exposed_value_cents
      FROM shares WHERE share_ppm > {_SHOCK_THRESH_PPM}
      GROUP BY 1),
    ncust AS (
      SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_customers
      FROM sourced)
    SELECT CAST(e.supp_nation AS INT) AS supplier_nation,
           e.n_exposed_customers,
           CAST(e.n_exposed_customers * 1000000 // c.n_customers
             AS BIGINT) AS exposed_customer_ppm,
           e.exposed_value_cents
    FROM exposed e CROSS JOIN ncust c
    ORDER BY e.n_exposed_customers DESC, supplier_nation
    """,
)
def customer_supply_shock_exposure(spark: SparkSession, sf_dir: str):
    """Supply-shock exposure stress test — the contagion question a
    single-nation disruption raises, answered at CUSTOMER grain:
    which customers source more than half their purchase value from
    suppliers of ONE nation, and how much value sits exposed per
    scenario nation. The part-level single-source-risk op asks this
    of the catalog; this asks it of the demand side — the pair is a
    supply-chain stress test's two halves. One fact-grain fold to
    (customer, supplier-nation) cents, a customer-PARTITIONED share
    window (scale-safe key), a threshold filter, and a bounded
    25-row scenario census against the distinct-customer base. All
    integer cents/ppm. At 100 TB the shuffle is the customer key the
    revenue ops already use; the stress grid is free."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    sourced = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("s_nationkey").alias("supp_nation"),
        )
        .agg(
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    ).persist()
    w = Window.partitionBy("cust")
    shares = sourced.select(
        "cust",
        "supp_nation",
        "v",
        F.expr(
            "CAST(v * 1000000 div SUM(v) OVER"
            " (PARTITION BY cust) AS BIGINT)"
        ).alias("share_ppm"),
    )
    exposed = (
        shares.filter(F.col("share_ppm") > _SHOCK_THRESH_PPM)
        .groupBy("supp_nation")
        .agg(
            F.count("*").cast("bigint").alias("n_exposed_customers"),
            F.sum("v").cast("bigint").alias("exposed_value_cents"),
        )
    )
    ncust = sourced.agg(
        F.count_distinct("cust").cast("bigint").alias("n_customers")
    )
    return (
        exposed.crossJoin(F.broadcast(ncust))
        .select(
            F.col("supp_nation").cast("int").alias("supplier_nation"),
            "n_exposed_customers",
            F.expr(
                "CAST(n_exposed_customers * 1000000 div n_customers"
                " AS BIGINT)"
            ).alias("exposed_customer_ppm"),
            "exposed_value_cents",
        )
        .orderBy(
            F.col("n_exposed_customers").desc(), "supplier_nation"
        )
    )


# ------------------------------------------------------------------
# 3. docs_template_prefix_census — structural boilerplate detection
# ------------------------------------------------------------------

_TPL_PREFIX_TOKENS = 8
_TPL_MIN_GROUP = 5


@register(
    "docs_template_prefix_census",
    f"""
    WITH pfx AS (
      SELECT source,
             md5(array_to_string(string_split(text, ' ')
               [1 : {_TPL_PREFIX_TOKENS}], ' ')) AS ph
      FROM documents),
    groups AS (
      SELECT source, ph, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pfx GROUP BY 1, 2),
    census AS (
      SELECT source,
             CAST(SUM(cnt) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN cnt >= {_TPL_MIN_GROUP} THEN cnt
               ELSE 0 END) AS BIGINT) AS n_templated,
             CAST(MAX(cnt) AS BIGINT) AS largest_template
      FROM groups GROUP BY 1)
    SELECT source, n_docs, n_templated, largest_template,
           CAST(n_templated * 1000000 // n_docs AS BIGINT)
             AS templated_ppm
    FROM census ORDER BY source
    """,
)
def docs_template_prefix_census(spark: SparkSession, sf_dir: str):
    """Template-prefix census — structural boilerplate detection one
    level above the content filters: documents OPENING with the same
    {_TPL_PREFIX_TOKENS} tokens (hashed prefix groups of size ≥
    {_TPL_MIN_GROUP}) are template instances — generated pages, form
    letters, scraper artifacts — which near-dup MinHash often misses
    (the bodies differ; only the scaffold repeats) and which training
    pipelines de-weight as a class rather than dedup pairwise. One
    prefix-hash per doc (in-row slice + md5 — no explode), one
    (source, hash) fold, one source census: the cheapest structural
    audit there is, and the per-source templated share tells the
    curation plan which ingests need template stripping BEFORE
    tokenization spends compute on scaffold tokens. Exact integer
    counts/ppm throughout."""
    d = t(spark, sf_dir, "documents")
    pfx = d.select(
        "source",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.split(F.col("text"), " "), 1, _TPL_PREFIX_TOKENS),
            )
        ).alias("ph"),
    )
    groups = pfx.groupBy("source", "ph").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    census = groups.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("cnt") >= _TPL_MIN_GROUP, F.col("cnt")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_templated"),
        F.max("cnt").cast("bigint").alias("largest_template"),
    )
    return census.select(
        "source",
        "n_docs",
        "n_templated",
        "largest_template",
        F.expr(
            "CAST(n_templated * 1000000 div n_docs AS BIGINT)"
        ).alias("templated_ppm"),
    ).orderBy("source")


# ------------------------------------------------------------------
# 4. lineitem_unit_price_consistency_audit — catalog-price DQ
# ------------------------------------------------------------------

_UPC_TOL_PPM = 100_000  # flag unit prices >10% off catalog


@register(
    "lineitem_unit_price_consistency_audit",
    f"""
    WITH lines AS (
      SELECT l.l_partkey,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
               AS BIGINT) AS ext_c,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100
               AS BIGINT) AS cat_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    scored AS (
      SELECT l_partkey,
             CAST(ext_c * 1000000 // (qty * cat_c) AS BIGINT)
               AS unit_over_catalog_ppm
      FROM lines WHERE qty > 0 AND cat_c > 0),
    flags AS (
      SELECT l_partkey, unit_over_catalog_ppm,
             CASE WHEN unit_over_catalog_ppm
                    NOT BETWEEN {1_000_000 - _UPC_TOL_PPM}
                    AND {1_000_000 + _UPC_TOL_PPM}
               THEN 1 ELSE 0 END AS off_catalog
      FROM scored)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(off_catalog) AS BIGINT) AS n_off_catalog,
           CAST(SUM(off_catalog) * 1000000 // COUNT(*) AS BIGINT)
             AS off_catalog_ppm,
           CAST(MIN(unit_over_catalog_ppm) AS BIGINT)
             AS min_ratio_ppm,
           CAST(MAX(unit_over_catalog_ppm) AS BIGINT)
             AS max_ratio_ppm
    FROM flags
    """,
)
def lineitem_unit_price_consistency_audit(spark: SparkSession, sf_dir: str):
    """Unit-price-vs-catalog consistency audit — the pricing DQ check
    a revenue-assurance team runs: each line's implied unit price
    (extended/quantity) against the part's catalog price, flagging
    lines outside ±10% (mispriced entries, stale catalog rows, or —
    in TPC-H's case — the generator's own price formula, which this
    audit measures rather than assumes). The ratio folds in exact
    integer ppm (ext·1e6 // (qty·cat) — one integer division, no
    per-line doubles); the census is one broadcast part join + one
    aggregate. The min/max ratio columns bound the whole
    distribution — the two numbers that say whether the tail is fat
    or a handful of entry errors. At 100 TB: broadcast dim join +
    map-side census, the cheapest possible shape."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    lines = li.join(
        F.broadcast(p.select("p_partkey", "p_retailprice")),
        p.p_partkey == li.l_partkey,
    ).select(
        (dec("l_extendedprice") * 100).cast("bigint").alias("ext_c"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        (dec("p_retailprice") * 100).cast("bigint").alias("cat_c"),
    )
    scored = lines.filter(
        (F.col("qty") > 0) & (F.col("cat_c") > 0)
    ).select(
        F.expr(
            "CAST(ext_c * 1000000 div (qty * cat_c) AS BIGINT)"
        ).alias("unit_over_catalog_ppm")
    )
    flags = scored.select(
        "unit_over_catalog_ppm",
        F.when(
            (F.col("unit_over_catalog_ppm") < 1_000_000 - _UPC_TOL_PPM)
            | (F.col("unit_over_catalog_ppm") > 1_000_000 + _UPC_TOL_PPM),
            1,
        )
        .otherwise(0)
        .alias("off_catalog"),
    )
    return flags.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum("off_catalog").cast("bigint").alias("n_off_catalog"),
        F.expr(
            "CAST(SUM(off_catalog) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("off_catalog_ppm"),
        F.min("unit_over_catalog_ppm")
        .cast("bigint")
        .alias("min_ratio_ppm"),
        F.max("unit_over_catalog_ppm")
        .cast("bigint")
        .alias("max_ratio_ppm"),
    )


# ------------------------------------------------------------------
# 5. events_ab_novelty_decay — treatment effect by exposure age
# ------------------------------------------------------------------

_NOV_MAX_DAY = 14


@register(
    "events_ab_novelty_decay",
    f"""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
      GROUP BY 1),
    daily AS (
      SELECT e.user_id,
             CAST(e.user_id % 2 = 0 AS INT) AS treated,
             datediff('day', f.d0, CAST(e.ts AS DATE)) AS age,
             CAST(SUM(CASE WHEN e.event_type = 'purchase'
               THEN CAST(CAST(e.value AS DECIMAL(12,2)) * 100
                 AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      GROUP BY 1, 2, 3),
    cells AS (
      SELECT age, treated,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS v
      FROM daily WHERE age BETWEEN 0 AND {_NOV_MAX_DAY}
      GROUP BY 1, 2),
    wide AS (
      SELECT age,
             CAST(MAX(CASE WHEN treated = 1 THEN n END) AS BIGINT)
               AS n_t,
             CAST(MAX(CASE WHEN treated = 1 THEN v END) AS BIGINT)
               AS v_t,
             CAST(MAX(CASE WHEN treated = 0 THEN n END) AS BIGINT)
               AS n_c,
             CAST(MAX(CASE WHEN treated = 0 THEN v END) AS BIGINT)
               AS v_c
      FROM cells GROUP BY 1)
    SELECT CAST(age AS BIGINT) AS days_since_first_seen,
           n_t AS n_treated_user_days, n_c AS n_control_user_days,
           CAST(v_t AS DOUBLE) / NULLIF(n_t, 0)
             - CAST(v_c AS DOUBLE) / NULLIF(n_c, 0)
             AS uplift_cents_per_user_day
    FROM wide ORDER BY days_since_first_seen
    """,
)
def events_ab_novelty_decay(spark: SparkSession, sf_dir: str):
    """Treatment-effect-by-exposure-age curve — the novelty-effect
    check every experiment readout should include before shipping on
    a flat average: if the uplift concentrates in users' first days
    and decays toward zero, the measured effect is novelty, not
    value, and extrapolating it forward overstates the launch (the
    CUPED and DiD ops correct bias; this one detects TRANSIENCE).
    Each user-day indexes by days since the user's first appearance;
    per (age, arm) cells fold to exact BIGINT; the per-age uplift is
    a fixed double expression of those integers with missing cells
    surfacing as NULL identically in both engines (the DiD op's
    conditional-pivot trick). Two hash folds on the user key, then
    ≤{_NOV_MAX_DAY + 1} bounded rows — at 100 TB the curve costs one
    more groupBy than the experiment readout already pays."""
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    daily = (
        ev.join(firsts, "user_id")
        .groupBy(
            "user_id",
            F.expr("CAST(user_id % 2 = 0 AS INT)").alias("treated"),
            F.datediff(F.col("ts").cast("date"), F.col("d0")).alias(
                "age"
            ),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (dec("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    cells = (
        daily.filter(
            (F.col("age") >= 0) & (F.col("age") <= _NOV_MAX_DAY)
        )
        .groupBy("age", "treated")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("v"),
        )
    )
    wide = cells.groupBy("age").agg(
        F.max(F.when(F.col("treated") == 1, F.col("n")))
        .cast("bigint")
        .alias("n_t"),
        F.max(F.when(F.col("treated") == 1, F.col("v")))
        .cast("bigint")
        .alias("v_t"),
        F.max(F.when(F.col("treated") == 0, F.col("n")))
        .cast("bigint")
        .alias("n_c"),
        F.max(F.when(F.col("treated") == 0, F.col("v")))
        .cast("bigint")
        .alias("v_c"),
    )
    return wide.select(
        F.col("age").cast("bigint").alias("days_since_first_seen"),
        F.col("n_t").alias("n_treated_user_days"),
        F.col("n_c").alias("n_control_user_days"),
        F.expr(
            "CAST(v_t AS DOUBLE) / NULLIF(n_t, 0)"
            " - CAST(v_c AS DOUBLE) / NULLIF(n_c, 0)"
        ).alias("uplift_cents_per_user_day"),
    ).orderBy("days_since_first_seen")
