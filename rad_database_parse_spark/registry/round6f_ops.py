"""Round-6f operators: reconciliation, profiling, apportionment,
concordance, sequential testing, and clustering initialization.

Six more platform operators: an order↔lineitem financial
reconciliation audit, a one-scan column-profile report (the ANALYZE
TABLE shape), largest-remainder budget apportionment, a
keyword-in-context concordancer, an O'Brien-Fleming-shaped sequential
A/B monitor, and deterministic farthest-first (Gonzalez k-center)
cluster seeding over the embedding corpus.

Same parity contract as the rest of the registry."""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. orders_lineitem_reconciliation — financial audit histogram
# ------------------------------------------------------------------


@register(
    "orders_lineitem_reconciliation",
    """
    WITH line AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                      * (1 + CAST(l_tax AS DECIMAL(12,2)))) * 1000000
                  AS BIGINT) AS line_micro
      FROM lineitem GROUP BY l_orderkey),
    delta AS (
      SELECT o.o_orderkey,
             CASE WHEN l.l_orderkey IS NULL THEN NULL
                  ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT) * 10000 - l.line_micro
             END AS d_micro
      FROM orders o LEFT JOIN line l ON o.o_orderkey = l.l_orderkey),
    bucketed AS (
      SELECT CASE
               WHEN d_micro IS NULL THEN 'no_lineitems'
               WHEN d_micro = 0 THEN 'exact'
               WHEN abs(d_micro) <= 10000 THEN 'within_1_cent'
               WHEN abs(d_micro) <= 1000000 THEN 'within_1_dollar'
               ELSE 'over_1_dollar'
             END AS bucket,
             d_micro
      FROM delta)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(abs(d_micro)), 0) AS BIGINT)
             AS total_abs_delta_micro
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def orders_lineitem_reconciliation(spark: SparkSession, sf_dir: str):
    """Order-header vs line-detail financial reconciliation — the audit
    every finance pipeline runs nightly: does each order's posted total
    equal the sum of its lines (price × (1−discount) × (1+tax)), and if
    not, how big is the drift? Line totals aggregate exactly in decimal
    micro-units (no float money math anywhere); deltas bucket into the
    audit bands an accountant reads (exact / within-a-cent / within-a-
    dollar / material / orphaned header). The orderkey groupBy and the
    header join share the same key, so at 100 TB the plan is one
    shuffle reused twice; the left join surfaces headers with no lines
    — the bug class reconciliation exists to catch."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    line = li.groupBy("l_orderkey").agg(
        (
            F.sum(
                (
                    dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
                    * (F.lit(1).cast("decimal(12,2)") + dec("l_tax"))
                ).cast("decimal(24,6)")
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("line_micro")
    )
    delta = o.join(line, o.o_orderkey == line.l_orderkey, "left").select(
        F.when(
            F.col("l_orderkey").isNull(), F.lit(None).cast("bigint")
        )
        .otherwise(
            (dec("o_totalprice") * 100).cast("bigint") * 10000
            - F.col("line_micro")
        )
        .alias("d_micro")
    )
    bucketed = delta.select(
        F.when(F.col("d_micro").isNull(), "no_lineitems")
        .when(F.col("d_micro") == 0, "exact")
        .when(F.abs("d_micro") <= 10000, "within_1_cent")
        .when(F.abs("d_micro") <= 1000000, "within_1_dollar")
        .otherwise("over_1_dollar")
        .alias("bucket"),
        "d_micro",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.coalesce(F.sum(F.abs("d_micro")), F.lit(0))
            .cast("bigint")
            .alias("total_abs_delta_micro"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------------
# 2. orders_column_profile — one-scan ANALYZE-style profile
# ------------------------------------------------------------------


@register(
    "orders_column_profile",
    """
    WITH s AS (
      SELECT COUNT(*) AS n,
             COUNT(o_orderkey) AS nn_orderkey,
             COUNT(DISTINCT o_orderkey) AS nd_orderkey,
             CAST(MIN(o_orderkey) AS VARCHAR) AS mn_orderkey,
             CAST(MAX(o_orderkey) AS VARCHAR) AS mx_orderkey,
             COUNT(o_custkey) AS nn_custkey,
             COUNT(DISTINCT o_custkey) AS nd_custkey,
             CAST(MIN(o_custkey) AS VARCHAR) AS mn_custkey,
             CAST(MAX(o_custkey) AS VARCHAR) AS mx_custkey,
             COUNT(o_orderstatus) AS nn_status,
             COUNT(DISTINCT o_orderstatus) AS nd_status,
             MIN(o_orderstatus) AS mn_status,
             MAX(o_orderstatus) AS mx_status,
             COUNT(o_totalprice) AS nn_totalprice,
             COUNT(DISTINCT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                 AS BIGINT)) AS nd_totalprice,
             CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)
               AS mn_totalprice,
             CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)
               AS mx_totalprice,
             COUNT(o_orderdate) AS nn_orderdate,
             COUNT(DISTINCT o_orderdate) AS nd_orderdate,
             CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS mn_orderdate,
             CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS mx_orderdate,
             COUNT(o_orderpriority) AS nn_priority,
             COUNT(DISTINCT o_orderpriority) AS nd_priority,
             MIN(o_orderpriority) AS mn_priority,
             MAX(o_orderpriority) AS mx_priority
      FROM orders)
    SELECT col, CAST(n AS BIGINT) AS n_rows,
           CAST(n - nn AS BIGINT) AS n_nulls,
           CAST(nd AS BIGINT) AS n_distinct,
           mn AS min_value, mx AS max_value
    FROM (
      SELECT 'o_orderkey' AS col, n, nn_orderkey AS nn, nd_orderkey AS nd,
             mn_orderkey AS mn, mx_orderkey AS mx FROM s
      UNION ALL SELECT 'o_custkey', n, nn_custkey, nd_custkey,
             mn_custkey, mx_custkey FROM s
      UNION ALL SELECT 'o_orderstatus', n, nn_status, nd_status,
             mn_status, mx_status FROM s
      UNION ALL SELECT 'o_totalprice', n, nn_totalprice, nd_totalprice,
             mn_totalprice, mx_totalprice FROM s
      UNION ALL SELECT 'o_orderdate', n, nn_orderdate, nd_orderdate,
             mn_orderdate, mx_orderdate FROM s
      UNION ALL SELECT 'o_orderpriority', n, nn_priority, nd_priority,
             mn_priority, mx_priority FROM s)
    ORDER BY col
    """,
)
def orders_column_profile(spark: SparkSession, sf_dir: str):
    """One-scan column-profile report over the orders table — the
    ANALYZE TABLE / data-catalog statistics shape: per column the row
    count, null count, exact distinct count, and min/max rendered as
    strings so heterogeneous column types share one report schema.
    Plan shape (re-planned round 11, VERDICT r10 item 2): the obvious
    single wide aggregate with six countDistinct triggers Catalyst's
    RewriteDistinctAggregates, whose Expand replicates EVERY scanned
    row x7 before the partial aggregate — the scale-killer the r10
    driver bench surfaced (7.85s, #2 slowest). Instead this builds SIX
    per-column single-distinct aggregates and unions the one-row
    results: each leg's parquet scan is column-pruned to exactly its
    own column (total column IO identical to one wide scan), and a
    single-distinct aggregate gets the no-Expand two-stage dedup
    rewrite. One job, six scan legs, zero row replication. Money
    distincts count on exact integer cents; dates render ISO-formatted.
    At 100 TB the exact distincts are still the cost — the documented
    swap is approx_count_distinct per column (HLL, mergeable), same
    shape."""
    o = t(spark, sf_dir, "orders")
    # (column_name, distinct_expr, min_expr, max_expr); column_name is
    # also the non-null count target
    legs = [
        (
            "o_orderkey",
            F.col("o_orderkey"),
            F.min("o_orderkey").cast("string"),
            F.max("o_orderkey").cast("string"),
        ),
        (
            "o_custkey",
            F.col("o_custkey"),
            F.min("o_custkey").cast("string"),
            F.max("o_custkey").cast("string"),
        ),
        (
            "o_orderstatus",
            F.col("o_orderstatus"),
            F.min("o_orderstatus"),
            F.max("o_orderstatus"),
        ),
        (
            "o_totalprice",
            (dec("o_totalprice") * 100).cast("bigint"),
            F.min(dec("o_totalprice")).cast("string"),
            F.max(dec("o_totalprice")).cast("string"),
        ),
        (
            "o_orderdate",
            F.col("o_orderdate"),
            F.min(F.col("o_orderdate").cast("date")).cast("string"),
            F.max(F.col("o_orderdate").cast("date")).cast("string"),
        ),
        (
            "o_orderpriority",
            F.col("o_orderpriority"),
            F.min("o_orderpriority"),
            F.max("o_orderpriority"),
        ),
    ]
    parts = []
    for name, nd_expr, mn_expr, mx_expr in legs:
        parts.append(
            o.agg(
                F.count("*").cast("bigint").alias("n_rows"),
                (F.count("*") - F.count(name))
                .cast("bigint")
                .alias("n_nulls"),
                F.countDistinct(nd_expr)
                .cast("bigint")
                .alias("n_distinct"),
                mn_expr.alias("min_value"),
                mx_expr.alias("max_value"),
            ).select(
                F.lit(name).alias("col"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col")


# ------------------------------------------------------------------
# 3. nation_budget_largest_remainder — exact apportionment
# ------------------------------------------------------------------

_BUDGET_UNITS = 1_000_000


@register(
    "nation_budget_largest_remainder",
    f"""
    WITH rev AS (
      SELECT n.n_name AS nation,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                      AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name),
    tot AS (SELECT SUM(cents) AS t FROM rev),
    q AS (
      SELECT nation, cents,
             (cents::HUGEINT * {_BUDGET_UNITS}) // tot.t AS base,
             (cents::HUGEINT * {_BUDGET_UNITS}) % tot.t AS rem
      FROM rev, tot),
    leftover AS (
      SELECT {_BUDGET_UNITS} - SUM(base) AS extra FROM q),
    ranked AS (
      SELECT a.nation, a.cents, a.base, a.rem,
             1 + COUNT(CASE WHEN b.rem > a.rem
                              OR (b.rem = a.rem AND b.nation < a.nation)
                            THEN 1 END) AS rnk
      FROM q a LEFT JOIN q b ON a.nation <> b.nation
      GROUP BY a.nation, a.cents, a.base, a.rem)
    SELECT ranked.nation,
           CAST(ranked.cents AS BIGINT) AS revenue_cents,
           CAST(ranked.base AS BIGINT) AS base_units,
           CAST(ranked.rnk AS INT) AS remainder_rank,
           CAST(ranked.base + CASE WHEN ranked.rnk <= leftover.extra
                                   THEN 1 ELSE 0 END AS BIGINT)
             AS allocated_units
    FROM ranked, leftover ORDER BY nation
    """,
)
def nation_budget_largest_remainder(spark: SparkSession, sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a fixed budget
    across nations by exact revenue share — the allocation algorithm
    behind seat apportionment, budget splits, and pro-rata rounding
    wherever the allocations must sum EXACTLY to the total (naive
    per-row rounding drifts). Integer quotas floor-divide on exact
    cents (HUGEINT/decimal(38,0) cross-products), the leftover units go
    to the largest remainders with a deterministic name tiebreak, and
    the rank is a nation-grain self-join count (25×25 — no window, no
    sort of fact rows). The fact work is one groupBy to nation grain
    behind two dimension joins; everything after is metadata-sized."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum((dec("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    big = "decimal(38,0)"
    tot = rev.agg(F.sum("cents").cast(big).alias("t"))
    q = rev.crossJoin(F.broadcast(tot)).select(
        "nation",
        "cents",
        F.expr(
            f"CAST(CAST(cents AS DECIMAL(38,0)) * {_BUDGET_UNITS}"
            f" div t AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"CAST(CAST(cents AS DECIMAL(38,0)) * {_BUDGET_UNITS}"
            f" % t AS BIGINT)"
        ).alias("rem"),
    )
    leftover = q.agg(
        (F.lit(_BUDGET_UNITS) - F.sum("base")).alias("extra")
    )
    a = q.select("nation", "cents", "base", "rem")
    b = q.select(
        F.col("nation").alias("nation_b"), F.col("rem").alias("rem_b")
    )
    ranked = (
        a.join(F.broadcast(b), F.col("nation_b") != F.col("nation"), "left")
        .groupBy("nation", "cents", "base", "rem")
        .agg(
            (
                1
                + F.count(
                    F.when(
                        (F.col("rem_b") > F.col("rem"))
                        | (
                            (F.col("rem_b") == F.col("rem"))
                            & (F.col("nation_b") < F.col("nation"))
                        ),
                        1,
                    )
                )
            ).alias("rnk")
        )
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "nation",
            F.col("cents").cast("bigint").alias("revenue_cents"),
            F.col("base").cast("bigint").alias("base_units"),
            F.col("rnk").cast("int").alias("remainder_rank"),
            (
                F.col("base")
                + F.when(F.col("rnk") <= F.col("extra"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocated_units"),
        )
        .orderBy("nation")
    )


# ------------------------------------------------------------------
# 4. docs_kwic_concordance — keyword-in-context extraction
# ------------------------------------------------------------------

_KWIC_TERMS = ["spark", "hash", "merge"]
_KWIC_EVERY = 50  # doc sample: doc_id % 50 == 0
_KWIC_CTX = 2  # context words each side


@register(
    "docs_kwic_concordance",
    f"""
    WITH sample_docs AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents WHERE doc_id % {_KWIC_EVERY} = 0),
    pos AS (
      SELECT doc_id, toks,
             unnest(range(1, length(toks) + 1)) AS p
      FROM sample_docs),
    hits AS (
      SELECT doc_id, p, toks[p] AS keyword,
             COALESCE(array_to_string(
               toks[GREATEST(p - {_KWIC_CTX}, 1) : p - 1], ' '), '')
               AS left_ctx,
             COALESCE(array_to_string(
               toks[p + 1 : LEAST(p + {_KWIC_CTX}, length(toks))], ' '), '')
               AS right_ctx
      FROM pos
      WHERE toks[p] IN ({", ".join(f"'{w}'" for w in _KWIC_TERMS)}))
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(p AS INT) AS position,
           keyword, left_ctx, right_ctx
    FROM hits ORDER BY doc_id, position
    """,
)
def docs_kwic_concordance(spark: SparkSession, sf_dir: str):
    """Keyword-in-context (KWIC) concordance — the corpus-linguistics
    extraction every terminology audit and prompt-leak investigation
    runs: for each hit of a fixed keyword list, the token position plus
    {_KWIC_CTX} words of left/right context, ordered as a concordance.
    Tokenization, position explode, membership filter and context
    slicing are all scan-local array ops (posexplode → filter → slice
    — the explode multiplies only SAMPLED docs, and the filter prunes
    to keyword hits before anything shuffles); the keyword list is a
    literal IN-filter the optimizer pushes beneath the explode's
    projection. At 100 TB the sample modulus becomes the partition
    predicate and the per-hit output is bounded by term frequency, not
    corpus size."""
    d = t(spark, sf_dir, "documents")
    sample = d.filter(F.col("doc_id") % _KWIC_EVERY == 0).select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    )
    hits = (
        sample.select(
            "doc_id", "toks", F.posexplode("toks").alias("p0", "keyword")
        )
        .withColumn("p", F.col("p0") + 1)  # 1-based like the oracle
        .filter(F.col("keyword").isin(_KWIC_TERMS))
    )
    return hits.select(
        F.col("doc_id").cast("bigint"),
        F.col("p").cast("int").alias("position"),
        "keyword",
        F.array_join(
            F.slice(
                F.col("toks"),
                F.greatest(F.col("p") - _KWIC_CTX, F.lit(1)),
                F.greatest(
                    F.col("p")
                    - F.greatest(F.col("p") - _KWIC_CTX, F.lit(1)),
                    F.lit(0),
                ),
            ),
            " ",
        ).alias("left_ctx"),
        F.array_join(
            F.slice(
                F.col("toks"),
                F.col("p") + 1,
                F.greatest(
                    F.least(
                        F.col("p") + _KWIC_CTX, F.size("toks")
                    )
                    - F.col("p"),
                    F.lit(0),
                ),
            ),
            " ",
        ).alias("right_ctx"),
    ).orderBy("doc_id", "position")


# ------------------------------------------------------------------
# 5. events_ab_sequential_monitor — OBF-shaped interim looks
# ------------------------------------------------------------------

_AB_LOOKS = 4
_AB_C = 2.024  # z-boundary at the final look; interim k gets c*sqrt(K/k)
_AB_BOUNDS = [round(_AB_C * math.sqrt(_AB_LOOKS / k), 6) for k in [1, 2, 3, 4]]
_AB_EPOCH = "2024-01-01"


@register(
    "events_ab_sequential_monitor",
    f"""
    WITH g AS (SELECT unnest(range(1, {_AB_LOOKS} + 1)) AS look),
    base AS (
      SELECT CAST(user_id % 2 AS INT) AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
             CAST(ts AS DATE) - DATE '{_AB_EPOCH}' AS day
      FROM events),
    cum AS (
      SELECT g.look, b.arm,
             COUNT(*) AS n,
             SUM(b.conv) AS k
      FROM g JOIN base b ON b.day < g.look * 7
      GROUP BY g.look, b.arm),
    wide AS (
      SELECT look,
             MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN k END) AS k0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN k END) AS k1
      FROM cum GROUP BY look),
    z AS (
      SELECT look, n0, k0, n1, k1,
             round((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                   / sqrt(CAST(k0 + k1 AS DOUBLE) / (n0 + n1)
                          * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                          * (1.0 / n0 + 1.0 / n1)), 6) AS z_stat
      FROM wide)
    SELECT CAST(z.look AS INT) AS look,
           CAST(z.n0 AS BIGINT) AS n_control,
           CAST(z.k0 AS BIGINT) AS conv_control,
           CAST(z.n1 AS BIGINT) AS n_treatment,
           CAST(z.k1 AS BIGINT) AS conv_treatment,
           z.z_stat,
           b.bound AS z_boundary,
           CAST(CASE WHEN abs(z.z_stat) > b.bound THEN 1 ELSE 0 END AS INT)
             AS crossed
    FROM z JOIN (SELECT unnest(range(1, {_AB_LOOKS} + 1)) AS look,
                        unnest({_AB_BOUNDS}) AS bound) b
      ON z.look = b.look
    ORDER BY look
    """,
)
def events_ab_sequential_monitor(spark: SparkSession, sf_dir: str):
    """Group-sequential A/B monitor with O'Brien-Fleming-shaped
    boundaries — the experimentation-platform guardrail against
    peeking: at each weekly interim look the cumulative two-proportion
    z-statistic (purchase conversion, arms by user-id parity) is
    compared against the spending boundary c·sqrt(K/k), which is wide
    early (look 1 needs |z| > {_AB_BOUNDS[0]}) and tightens to c at the
    final look — so early stops need overwhelming evidence. All four
    looks compute from ONE pass: the look-grid join replicates only
    (arm, conv, day) tuples and one combinable groupBy folds them;
    z is a double ratio of exact integer counts, boundaries are
    hard-coded literals shared by both engines. Complements
    events_ab_srm_check (validity) and events_ab_cuped_adjustment
    (variance reduction) with the sequential-stopping readout."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
        F.datediff(
            F.col("ts").cast("date"), F.lit(_AB_EPOCH).cast("date")
        ).alias("day"),
    )
    looks = F.explode(
        F.array(*[F.lit(k) for k in range(1, _AB_LOOKS + 1)])
    ).alias("look")
    cum = (
        base.select("arm", "conv", "day", looks)
        .filter(F.col("day") < F.col("look") * 7)
        .groupBy("look", "arm")
        .agg(F.count("*").alias("n"), F.sum("conv").alias("k"))
    )
    wide = cum.groupBy("look").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("k"))).alias("k0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).alias("k1"),
    )
    p_pool = (F.col("k0") + F.col("k1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = wide.select(
        "look",
        "n0",
        "k0",
        "n1",
        "k1",
        F.round(
            (
                F.col("k1").cast("double") / F.col("n1")
                - F.col("k0").cast("double") / F.col("n0")
            )
            / F.sqrt(
                p_pool
                * (1 - p_pool)
                * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
            ),
            6,
        ).alias("z_stat"),
    )
    bounds = spark.createDataFrame(
        [(k, b) for k, b in zip(range(1, _AB_LOOKS + 1), _AB_BOUNDS)],
        "look int, bound double",
    )
    return (
        z.join(F.broadcast(bounds), "look")
        .select(
            F.col("look").cast("int"),
            F.col("n0").cast("bigint").alias("n_control"),
            F.col("k0").cast("bigint").alias("conv_control"),
            F.col("n1").cast("bigint").alias("n_treatment"),
            F.col("k1").cast("bigint").alias("conv_treatment"),
            "z_stat",
            F.col("bound").alias("z_boundary"),
            F.when(F.abs(F.col("z_stat")) > F.col("bound"), 1)
            .otherwise(0)
            .cast("int")
            .alias("crossed"),
        )
        .orderBy("look")
    )


# ------------------------------------------------------------------
# 6. emb_farthest_first_centers — Gonzalez k-center seeding
# ------------------------------------------------------------------

_FF_K = 5


def _d2_milli_sql(av: str, bv: str, dims: int = 64) -> str:
    return (
        f"list_sum(list_transform(range(1, {dims} + 1), i ->"
        f" CAST(round(({av}[i] - {bv}[i]) * ({av}[i] - {bv}[i]) * 1000)"
        f" AS BIGINT)))"
    )


def _ff_oracle() -> str:
    # unrolled farthest-first: c1 = min vec_id; c_{k+1} = argmax over the
    # corpus of the min exact-integer distance to the chosen set
    lines = [
        "WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),",
        "c1 AS (SELECT vec_id, v FROM c ORDER BY vec_id LIMIT 1),",
    ]
    def _least(exprs: list[str]) -> str:
        return exprs[0] if len(exprs) == 1 else f"LEAST({', '.join(exprs)})"

    for k in range(2, _FF_K + 1):
        prev = ", ".join(f"c{i}" for i in range(1, k))
        mind = _least(
            [_d2_milli_sql("c.v", f"c{i}.v") for i in range(1, k)]
        )
        not_in = ", ".join(
            f"(SELECT vec_id FROM c{i})" for i in range(1, k)
        )
        lines.append(
            f"c{k} AS (SELECT c.vec_id, c.v FROM c, {prev} "
            f"WHERE c.vec_id NOT IN ({not_in}) "
            f"ORDER BY {mind} DESC, c.vec_id LIMIT 1),"
        )
    sel = []
    for k in range(1, _FF_K + 1):
        if k == 1:
            sel.append(
                "SELECT 1 AS step, CAST(vec_id AS BIGINT) AS center_id,"
                " CAST(NULL AS BIGINT) AS sep_milli FROM c1"
            )
        else:
            prev = ", ".join(f"c{i}" for i in range(1, k))
            mind = _least(
                [
                    _d2_milli_sql(f"c{k}.v", f"c{i}.v")
                    for i in range(1, k)
                ]
            )
            sel.append(
                f"SELECT {k} AS step, CAST(c{k}.vec_id AS BIGINT)"
                f" AS center_id, CAST({mind} AS BIGINT)"
                f" AS sep_milli FROM c{k}, {prev}"
            )
    body = "\nUNION ALL\n".join(sel)
    return "\n".join(lines)[:-1] + f"\nSELECT * FROM ({body}) ORDER BY step"


@register("emb_farthest_first_centers", _ff_oracle())
def emb_farthest_first_centers(spark: SparkSession, sf_dir: str):
    """Deterministic farthest-first traversal (Gonzalez k-center) over
    the embedding corpus — the classical 2-approximation seeding for
    k-center clustering and the deterministic stand-in for k-means++
    (which needs randomness): start from the lowest id, then repeatedly
    admit the point FARTHEST from the chosen set, ties to the lowest
    id. Distances are the repo's exact-integer milli-quantized squared
    euclidean (per-term round, exact sums — so argmax is exact and both
    engines trace the identical center sequence; the oracle unrolls the
    same {_FF_K} steps as chained CTEs). Spark side is driver-paced:
    each step broadcasts the ≤{_FF_K} chosen vectors as literals and
    takes ONE TakeOrdered(1) over a scan-local min-distance column —
    k bounded passes over the corpus, the textbook distributed shape
    for this algorithm (SCALE.md). The projected corpus (vec_id +
    64-double vector) is persisted across the greedy rounds (round-11
    re-plan, VERDICT r10 item 3): without it each of the k sequential
    TakeOrdered jobs re-reads and re-transforms the parquet source —
    k-1 redundant scans. At 100 TB the same projection would be
    persisted to MEMORY_AND_DISK or checkpointed once and reused by
    every round."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    # persist: bounded — vec_id + 64-double vector per row, released in
    # the finally below after the greedy rounds collect their centers
    e = e.persist()
    try:
        first = e.orderBy("vec_id").limit(1).collect()[0]  # bounded: limit 1
        centers = [(1, int(first.vec_id), None, list(first.v))]
        for step in range(2, _FF_K + 1):
            chosen_ids = [c[1] for c in centers]
            d_exprs = []
            for _, _, _, vec in centers:
                arr = F.array(*[F.lit(float(x)) for x in vec])
                d_exprs.append(
                    F.aggregate(
                        F.zip_with(
                            F.col("v"),
                            arr,
                            lambda x, y: F.round(
                                (x - y) * (x - y) * 1000
                            ).cast("bigint"),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x,
                    )
                )
            mind = d_exprs[0]
            for dx in d_exprs[1:]:
                mind = F.least(mind, dx)
            cand = (
                e.filter(~F.col("vec_id").isin(chosen_ids))
                .select("vec_id", "v", mind.alias("min_d"))
                .orderBy(F.col("min_d").desc(), F.col("vec_id"))
                .limit(1)
                .collect()[0]  # bounded: limit 1 per greedy round
            )
            centers.append(
                (step, int(cand.vec_id), int(cand.min_d), list(cand.v))
            )
    finally:
        e.unpersist()
    return spark.createDataFrame(
        [(s, cid, sep) for s, cid, sep, _ in centers],
        "step int, center_id bigint, sep_milli bigint",
    )
