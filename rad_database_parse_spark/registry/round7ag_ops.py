"""Round-7ag operators: dedup token savings, session-timeout
sensitivity, referential-orphan audit, data-vault hash keys, and the
deflated second principal component.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import t

# ------------------------------------------------------------------
# 1. docs_dedup_token_savings — the curation budget question
# ------------------------------------------------------------------


@register(
    "docs_dedup_token_savings",
    r"""
    WITH d AS (
      SELECT doc_id, source,
             md5(text) AS h,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
               AS toks
      FROM documents),
    kept AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(SUM(toks) AS BIGINT) AS tok_all,
             CAST(MIN(toks) AS BIGINT) AS tok_kept
      FROM d GROUP BY 1, 2)
    SELECT source,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
           CAST(SUM(tok_all) AS BIGINT) AS tokens_raw,
           CAST(SUM(tok_kept) AS BIGINT) AS tokens_after_dedup,
           CAST((SUM(tok_all) - SUM(tok_kept)) * 1000000
                // SUM(tok_all) AS BIGINT) AS savings_ppm
    FROM kept GROUP BY 1 ORDER BY source
    """,
)
def docs_dedup_token_savings(spark: SparkSession, sf_dir: str):
    """Token-budget savings from exact dedup, per source — the number
    the whole dedup tier exists to produce: training cost is paid in
    TOKENS, so 'how many duplicate docs' matters less than 'how many
    duplicate tokens', and per-source savings decide which ingests are
    worth deduplicating at all (a 40%-duplicate crawl and a 2%-
    duplicate curated source get different pipelines). Exact-hash
    groups fold doc-grain to (source, hash) with token sums carried
    along; keep-one-copy token counts come from MIN within the group
    (identical texts have identical counts — MIN is the deterministic
    representative). One scan, two hash aggregates, everything exact
    BIGINT — at 100 TB this is the same shuffle the dedup itself pays,
    so the audit rides the existing job. Near-dup savings stack on top
    (docs_minhash_lsh's cluster sizes × token sums — deliberately not
    recomputed here to keep the op one-scan)."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.md5("text").alias("h"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
        )
        .cast("bigint")
        .alias("toks"),
    )
    kept = d.groupBy("source", "h").agg(
        F.count("*").cast("bigint").alias("n_copies"),
        F.sum("toks").cast("bigint").alias("tok_all"),
        F.min("toks").cast("bigint").alias("tok_kept"),
    )
    return (
        kept.groupBy("source")
        .agg(
            F.sum("n_copies").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_unique_docs"),
            F.sum("tok_all").cast("bigint").alias("tokens_raw"),
            F.sum("tok_kept").cast("bigint").alias("tokens_after_dedup"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique_docs",
            "tokens_raw",
            "tokens_after_dedup",
            F.expr(
                "CAST((tokens_raw - tokens_after_dedup) * 1000000"
                " div tokens_raw AS BIGINT)"
            ).alias("savings_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# 2. events_session_timeout_sensitivity — sessionization planner
# ------------------------------------------------------------------

_SESS_TIMEOUTS = [300, 900, 1800]


def _sess_oracle() -> str:
    conds = ",\n             ".join(
        f"CAST(SUM(CASE WHEN gap_s > {d} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS brk{d}"
        for d in _SESS_TIMEOUTS
    )
    rows = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({d} AS BIGINT) AS timeout_sec,"
        f" n_users + brk{d} AS n_sessions, n_events FROM agg"
        for d in _SESS_TIMEOUTS
    )
    return f"""
    WITH seq AS (
      SELECT user_id,
             CAST(epoch(ts) AS BIGINT)
               - LAG(CAST(epoch(ts) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
               AS gap_s
      FROM events),
    agg AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             {conds}
      FROM seq),
    grid AS (
      {rows})
    SELECT timeout_sec, n_sessions,
           CAST(n_events * 1000 // n_sessions AS BIGINT)
             AS events_per_session_milli
    FROM grid ORDER BY timeout_sec
    """


@register("events_session_timeout_sensitivity", _sess_oracle())
def events_session_timeout_sensitivity(spark: SparkSession, sf_dir: str):
    """Session-timeout sensitivity — the tuning curve BEHIND the
    sessionize/session-window ops: session count per candidate
    inactivity gap ({', '.join(str(d) for d in _SESS_TIMEOUTS)}s).
    Sessions per user = 1 + gaps exceeding the timeout, so ONE lag
    window (partitioned by user — the same shuffle sessionization
    itself pays) feeds every candidate through conditional sums in a
    single aggregate; no per-timeout rescans, no per-timeout windows.
    The knee of this curve is how a 30-minute default actually gets
    justified; a curve still falling steeply at 30min means the
    event stream has long-gap structure a session metric will
    misread. Counts exact BIGINT; events-per-session milli-quantized
    integer division."""
    ev = t(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.expr(
            "CAST(unix_timestamp(ts) AS BIGINT)"
            " - LAG(CAST(unix_timestamp(ts) AS BIGINT)) OVER ("
            "   PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("gap_s"),
    )
    agg = seq.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count("*").cast("bigint").alias("n_events"),
        *[
            F.sum(
                F.when(F.col("gap_s") > d, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"brk{d}")
            for d in _SESS_TIMEOUTS
        ],
    )
    stack_args = ", ".join(
        f"CAST({d} AS BIGINT), n_users + brk{d}" for d in _SESS_TIMEOUTS
    )
    grid = agg.selectExpr(
        "n_events",
        f"stack({len(_SESS_TIMEOUTS)}, {stack_args})"
        " AS (timeout_sec, n_sessions)",
    )
    return grid.select(
        "timeout_sec",
        "n_sessions",
        F.expr(
            "CAST(n_events * 1000 div n_sessions AS BIGINT)"
        ).alias("events_per_session_milli"),
    ).orderBy("timeout_sec")


# ------------------------------------------------------------------
# 3. dq_referential_orphan_audit — FK integrity census
# ------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem.l_orderkey", "orders.o_orderkey"),
    ("lineitem.l_partkey", "part.p_partkey"),
    ("lineitem.l_suppkey", "supplier.s_suppkey"),
    ("orders.o_custkey", "customer.c_custkey"),
    ("customer.c_nationkey", "nation.n_nationkey"),
    ("supplier.s_nationkey", "nation.n_nationkey"),
    ("nation.n_regionkey", "region.r_regionkey"),
]


def _orphan_oracle() -> str:
    parts = []
    for child, parent in _FK_EDGES:
        ct, cc = child.split(".")
        pt, pc = parent.split(".")
        parts.append(
            f"""
      SELECT '{child}' AS fk_edge,
             CAST(COUNT(*) AS BIGINT) AS child_rows,
             CAST(SUM(CASE WHEN p.{pc} IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS orphan_rows
      FROM {ct} c LEFT JOIN {pt} p ON p.{pc} = c.{cc}"""
        )
    union = "\n      UNION ALL\n      ".join(parts)
    return f"""
    WITH audit AS (
      {union})
    SELECT fk_edge, child_rows, orphan_rows,
           CAST(orphan_rows * 1000000 // child_rows AS BIGINT)
             AS orphan_ppm
    FROM audit ORDER BY fk_edge
    """


@register("dq_referential_orphan_audit", _orphan_oracle())
def dq_referential_orphan_audit(spark: SparkSession, sf_dir: str):
    """Referential-integrity census over every declared FK edge of
    the catalog — the audit a lakehouse runs nightly because nothing
    ENFORCES foreign keys over parquet: per edge, child rows whose
    key finds no parent (LEFT JOIN + null-parent count — one pass per
    edge, no distinct materialization). Complements the inclusion-
    dependency PROFILER (which discovers candidate FKs) by verifying
    the declared ones and quantifying rot in ppm; a nonzero row here
    is what turns a silent inner-join row loss into a pageable data
    incident. Dimension sides broadcast (region/nation/customer/part/
    supplier are the classic small sides); the two fact-side edges
    ride one lineitem scan each. All counts exact BIGINT. At 100 TB
    the audit's cost is the same broadcast joins the workload already
    runs — and the orphan count doubles as the dead-letter queue
    size for the repair job."""
    dfs = {
        name: t(spark, sf_dir, name)
        for name in [
            "lineitem",
            "orders",
            "part",
            "supplier",
            "customer",
            "nation",
            "region",
        ]
    }
    out = None
    for child, parent in _FK_EDGES:
        ct, cc = child.split(".")
        pt, pc = parent.split(".")
        joined = dfs[ct].join(
            F.broadcast(dfs[pt].select(pc)),
            F.col(cc) == F.col(pc),
            "left",
        )
        row = joined.agg(
            F.lit(child).alias("fk_edge"),
            F.count("*").cast("bigint").alias("child_rows"),
            F.sum(
                F.when(F.col(pc).isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("orphan_rows"),
        )
        out = row if out is None else out.union(row)
    return out.select(
        "fk_edge",
        "child_rows",
        "orphan_rows",
        F.expr(
            "CAST(orphan_rows * 1000000 div child_rows AS BIGINT)"
        ).alias("orphan_ppm"),
    ).orderBy("fk_edge")


# ------------------------------------------------------------------
# 4. orders_data_vault_hash_keys — modeling-layer key generation
# ------------------------------------------------------------------


@register(
    "orders_data_vault_hash_keys",
    """
    WITH hub_customer AS (
      SELECT DISTINCT sha256(CAST(o_custkey AS VARCHAR)) AS hk
      FROM orders),
    hub_order AS (
      SELECT DISTINCT sha256(CAST(o_orderkey AS VARCHAR)) AS hk
      FROM orders),
    link_oc AS (
      SELECT DISTINCT sha256(concat(CAST(o_custkey AS VARCHAR), '||',
        CAST(o_orderkey AS VARCHAR))) AS hk
      FROM orders),
    nat AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_ord,
             CAST(COUNT(DISTINCT o_custkey || '||' || o_orderkey)
               AS BIGINT) AS n_link
      FROM orders),
    census AS (
      SELECT 'hub_customer' AS entity,
             (SELECT n_cust FROM nat) AS n_business_keys,
             CAST(COUNT(*) AS BIGINT) AS n_hash_keys
      FROM hub_customer
      UNION ALL
      SELECT 'hub_order', (SELECT n_ord FROM nat),
             CAST(COUNT(*) AS BIGINT) FROM hub_order
      UNION ALL
      SELECT 'link_order_customer', (SELECT n_link FROM nat),
             CAST(COUNT(*) AS BIGINT) FROM link_oc)
    SELECT entity, n_business_keys, n_hash_keys,
           n_business_keys - n_hash_keys AS hash_collisions
    FROM census ORDER BY entity
    """,
)
def orders_data_vault_hash_keys(spark: SparkSession, sf_dir: str):
    """Data-vault hash-key generation + collision audit — the
    modeling-layer primitive under hub/link/satellite warehouses:
    business keys hash to fixed-width surrogate keys (sha256 of the
    canonicalized key, '||'-delimited for composites) so hubs and
    links load in parallel with no sequence bottleneck — THE reason
    data vault scales ingest horizontally, and exactly the
    deterministic-surrogate philosophy the tier's merge/SCD2 ops
    already use. The audit column proves the property the pattern
    depends on: distinct hash keys == distinct business keys (a
    collision would silently merge two customers). One scan per
    distinct-fold; SHA-256 runs JVM-side (sha2) and in DuckDB
    natively — the digests themselves agree cross-engine, which this
    op's determinism gate verifies implicitly. At 100 TB each hub
    fold is one hash-distinct shuffle — the same cost as the dedup
    tier's exact pass."""
    o = t(spark, sf_dir, "orders")
    hub_c = o.select(
        F.sha2(F.col("o_custkey").cast("string"), 256).alias("hk")
    ).distinct()
    hub_o = o.select(
        F.sha2(F.col("o_orderkey").cast("string"), 256).alias("hk")
    ).distinct()
    link = o.select(
        F.sha2(
            F.concat(
                F.col("o_custkey").cast("string"),
                F.lit("||"),
                F.col("o_orderkey").cast("string"),
            ),
            256,
        ).alias("hk")
    ).distinct()
    nat = o.agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_cust"),
        F.count_distinct("o_orderkey").cast("bigint").alias("n_ord"),
        F.count_distinct(
            F.concat(
                F.col("o_custkey").cast("string"),
                F.lit("||"),
                F.col("o_orderkey").cast("string"),
            )
        )
        .cast("bigint")
        .alias("n_link"),
    )
    rows = []
    for name, df, key in [
        ("hub_customer", hub_c, "n_cust"),
        ("hub_order", hub_o, "n_ord"),
        ("link_order_customer", link, "n_link"),
    ]:
        rows.append(
            df.agg(F.count("*").cast("bigint").alias("n_hash_keys"))
            .crossJoin(F.broadcast(nat))
            .select(
                F.lit(name).alias("entity"),
                F.col(key).alias("n_business_keys"),
                "n_hash_keys",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return out.select(
        "entity",
        "n_business_keys",
        "n_hash_keys",
        (F.col("n_business_keys") - F.col("n_hash_keys")).alias(
            "hash_collisions"
        ),
    ).orderBy("entity")


# ------------------------------------------------------------------
# 5. emb_second_pc_deflation — deflated power iteration
# ------------------------------------------------------------------

_PC2_SCALE = 1000


def _pc2_oracle() -> str:
    s = _PC2_SCALE
    return f"""
    WITH g AS (
      SELECT u.i, w.j,
             SUM(CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * {s})
                      AS BIGINT)
                 * CAST(round(CAST(embedding[w.j + 1] AS DOUBLE)
                              * {s}) AS BIGINT)) AS gij
      FROM embeddings,
           UNNEST(range(len(embedding))) AS u(i),
           UNNEST(range(len(embedding))) AS w(j)
      GROUP BY u.i, w.j),
    v1 AS (
      SELECT i AS dim, SUM(gij * {s}) AS v FROM g GROUP BY i),
    mx1 AS (SELECT MAX(abs(v)) AS mx FROM v1),
    v1n AS (
      SELECT dim, ((v * {s})
                   - ((((v * {s}) % mx) + mx) % mx)) // mx AS v
      FROM v1, mx1),
    v2 AS (
      SELECT g.i AS dim, SUM(g.gij * v1n.v) AS v
      FROM g JOIN v1n ON v1n.dim = g.j GROUP BY g.i),
    mx2 AS (SELECT MAX(abs(v)) AS mx FROM v2),
    v2n AS (
      SELECT dim, ((v * {s})
                   - ((((v * {s}) % mx) + mx) % mx)) // mx AS v
      FROM v2, mx2),
    sgn AS (
      SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
      FROM v2n ORDER BY abs(v) DESC, dim LIMIT 1),
    topu AS (
      SELECT CAST(v2n.dim AS INT) AS dim,
             CAST(v2n.v * sgn.s AS BIGINT) AS uv
      FROM v2n, sgn),
    ul AS (
      SELECT list(uv ORDER BY dim) AS ua,
             CAST(SUM(uv * uv) AS BIGINT) AS uu
      FROM topu),
    qraw AS (
      SELECT vec_id,
             list_transform(range(len(embedding)), ii ->
               CAST(round(CAST(embedding[ii + 1] AS DOUBLE) * {s})
                    AS BIGINT)) AS q0
      FROM embeddings),
    qdot AS (
      SELECT vec_id, q0,
             CAST(list_sum(list_transform(range(len(q0)), kk ->
               q0[kk + 1] * ua[kk + 1])) AS BIGINT) AS dot
      FROM qraw, ul),
    qp AS (
      SELECT vec_id,
             list_transform(range(len(q0)), ii ->
               q0[ii + 1]
               - CAST(round(CAST(dot AS DOUBLE) * ua[ii + 1] / uu)
                      AS BIGINT)) AS q
      FROM qdot, ul),
    g2 AS (
      SELECT u.i, w.j, SUM(q[u.i + 1] * q[w.j + 1]) AS gij
      FROM qp,
           UNNEST(range(len(q))) AS u(i),
           UNNEST(range(len(q))) AS w(j)
      GROUP BY u.i, w.j),
    w1 AS (
      SELECT i AS dim, SUM(gij * {s}) AS v FROM g2 GROUP BY i),
    wmx1 AS (SELECT MAX(abs(v)) AS mx FROM w1),
    w1n AS (
      SELECT dim, ((v * {s})
                   - ((((v * {s}) % mx) + mx) % mx)) // mx AS v
      FROM w1, wmx1),
    w2 AS (
      SELECT g2.i AS dim, SUM(g2.gij * w1n.v) AS v
      FROM g2 JOIN w1n ON w1n.dim = g2.j GROUP BY g2.i),
    wmx2 AS (SELECT MAX(abs(v)) AS mx FROM w2),
    w2n AS (
      SELECT dim, ((v * {s})
                   - ((((v * {s}) % mx) + mx) % mx)) // mx AS v
      FROM w2, wmx2),
    sgn2 AS (
      SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
      FROM w2n ORDER BY abs(v) DESC, dim LIMIT 1)
    SELECT CAST(w2n.dim AS INT) AS dim,
           CAST(w2n.v * sgn2.s AS BIGINT) AS component_fp
    FROM w2n, sgn2
    """


@register("emb_second_pc_deflation", _pc2_oracle())
def emb_second_pc_deflation(spark: SparkSession, sf_dir: str):
    """Second principal direction by VECTOR-LEVEL deflation then power
    iteration — the step after emb_top_pc_power_iteration in the
    anisotropy workup (one dominant direction is centering debt; TWO
    mean the corpus is low-rank and IVF cells will be slab-shaped):
    each quantized vector sheds its projection on the fixed-point top
    PC (q' = q − round(⟨q,u⟩·uᵢ/⟨u,u⟩) — per-component integer
    arithmetic with ONE scalar double division, engine-identical),
    then the same Gram build + two exact-integer power iterations run
    on the deflated vectors. Deflation is approximate exactly to the
    extent u is (documented: fixed-point u plus per-component
    rounding), which is the production trade — re-orthogonalization
    at full precision would force float parity problems this tier
    deliberately avoids. Corpus rows touch only the two Gram builds
    (d² bounded cells each); everything after is 4096-row
    linear algebra. Sign fixed deterministically as in the top-PC
    op."""
    e = t(spark, sf_dir, "embeddings")
    from .round6b_ops import (
        _int_gram,
        _power_iterate_int,
        _top_pc_components,
    )

    # top PC as driver-side constants (d = 64 components — bounded):
    # embedding u as LITERAL arrays in the deflation expressions keeps
    # the whole deflation + Gram fold to TWO Spark jobs, where chaining
    # the top-PC DataFrame through broadcast crossJoins paid ~8
    # sequential tiny-stage latencies (VERDICT r6 item 5)
    comp = _top_pc_components(spark, sf_dir)
    ua = [v for _, v in sorted(comp)]
    uu = sum(v * v for v in ua)
    s = _PC2_SCALE
    ua_sql = "array(" + ", ".join(f"CAST({v} AS BIGINT)" for v in ua) + ")"
    # Spark arrays are 0-based (DuckDB lists 1-based): the Spark text
    # indexes via zip_with; the oracle the 1-based equivalents.
    qraw = e.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x ->"
            f" CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT)) AS q0"
        ),
    )
    qdot = qraw.select(
        "vec_id",
        "q0",
        F.expr(
            f"CAST(aggregate(zip_with(q0, {ua_sql}, (a, b) -> a * b),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
            " AS dot"
        ),
    )
    qp = qdot.select(
        "vec_id",
        F.expr(
            f"zip_with(q0, {ua_sql}, (a, b) -> a"
            f" - CAST(round(CAST(dot AS DOUBLE) * b"
            f" / CAST({uu} AS BIGINT)) AS BIGINT)) AS q"
        ),
    )
    # Gram of the deflated vectors via the shared per-partition integer
    # QᵀQ (no d²-row inflation), then the driver-side exact-integer
    # iterate over the collected 4096 bounded cells
    cells = _int_gram(qp.select(F.col("q").alias("qarr"))).collect()
    out = _power_iterate_int(cells, s)
    return spark.createDataFrame(
        [(int(i), int(v)) for i, v in out],
        "dim int, component_fp bigint",
    )
