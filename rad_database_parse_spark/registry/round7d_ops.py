"""Round-7d operators: corpus TextRank, MLM span-corruption planning,
feature hashing, Spark-4 pipe-syntax SQL, an open-order aging snapshot,
and a diagonal-Mahalanobis embedding OOD screen.

Parity contract as everywhere (registry/__init__.py float policy);
deterministic selection uses the md5-bucket trick shared with
sampling_profile (identical string-md5 prefix in both engines)."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t
from .sampling_profile import _BUCKET_SQL, _md5_bucket

# ------------------------------------------------------------------
# 1. docs_textrank_keywords — graph keyword extraction over the corpus
# ------------------------------------------------------------------


@register(
    "docs_textrank_keywords",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents),
    adj AS (
      SELECT CASE WHEN ts[p.pos] < ts[p.pos + 1]
                  THEN ts[p.pos] ELSE ts[p.pos + 1] END AS u,
             CASE WHEN ts[p.pos] < ts[p.pos + 1]
                  THEN ts[p.pos + 1] ELSE ts[p.pos] END AS v
      FROM toks CROSS JOIN (SELECT unnest(range(1, 4096)) AS pos) p
      WHERE p.pos < len(ts) AND ts[p.pos] <> ts[p.pos + 1]),
    edges AS (SELECT u, v FROM adj GROUP BY u, v HAVING COUNT(*) >= 3),
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    nodes AS (SELECT DISTINCT u AS node FROM und),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
    c1 AS (
      SELECT und.v AS node,
             CAST(SUM(CAST(floor(CAST(r AS DOUBLE) / d) AS BIGINT))
                  AS BIGINT) AS m
      FROM und JOIN deg ON und.u = deg.u JOIN r0 ON r0.node = und.u
      GROUP BY und.v),
    r1 AS (
      SELECT n.node,
             CAST(150000 + CAST(floor(0.85 * COALESCE(m, 0)) AS BIGINT)
                  AS BIGINT) AS r
      FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
    c2 AS (
      SELECT und.v AS node,
             CAST(SUM(CAST(floor(CAST(r AS DOUBLE) / d) AS BIGINT))
                  AS BIGINT) AS m
      FROM und JOIN deg ON und.u = deg.u JOIN r1 ON r1.node = und.u
      GROUP BY und.v),
    r2 AS (
      SELECT n.node,
             CAST(150000 + CAST(floor(0.85 * COALESCE(m, 0)) AS BIGINT)
                  AS BIGINT) AS r
      FROM nodes n LEFT JOIN c2 ON c2.node = n.node)
    SELECT node AS keyword, r AS textrank_fp
    FROM r2 ORDER BY textrank_fp DESC, keyword LIMIT 20
    """,
)
def docs_textrank_keywords(spark: SparkSession, sf_dir: str):
    """TextRank keyword extraction over the whole corpus — the
    graph-centrality sibling of docs_rake_keyphrases (RAKE scores by
    degree/frequency inside candidate phrases; TextRank lets importance
    FLOW, so a term adjacent to other central terms outranks a merely
    frequent one). Adjacent-token co-occurrence edges (support ≥ 3 to
    bound the graph), then two integer fixed-point PageRank iterations
    with the llm/cluster arithmetic contract (floor-spread, 0.85 damp,
    base 150000 — exact ints, bit-identical on any partitioning). The
    graph is VOCABULARY-grain: nodes/edges saturate while the corpus
    grows, so the iterate's cost is fixed and only the one edge-count
    aggregate scans fact-scale data."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    adj = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("tok") != F.col("nxt")))
        .select(
            F.least("tok", "nxt").alias("u"),
            F.greatest("tok", "nxt").alias("v"),
        )
    )
    edges = (
        adj.groupBy("u", "v")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= 3)
        .select("u", "v")
        .persist()
    )
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    deg = und.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    ed = und.join(deg, "u")
    ranks = nodes.select("node", F.lit(1000000).cast("bigint").alias("r"))
    for _ in range(2):
        contrib = (
            ed.join(ranks, ed.u == ranks.node)
            .select(
                F.col("v").alias("node"),
                F.floor(F.col("r").cast("double") / F.col("d"))
                .cast("bigint")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(150000)
                + F.floor(
                    F.lit(0.85) * F.coalesce(F.col("m"), F.lit(0))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("r"),
        )
    return (
        ranks.select(
            F.col("node").alias("keyword"), F.col("r").alias("textrank_fp")
        )
        .orderBy(F.col("textrank_fp").desc(), "keyword")
        .limit(20)
    )


# ------------------------------------------------------------------
# 2. docs_mlm_span_corruption_plan — T5-style masking audit
# ------------------------------------------------------------------

_MLM_PCT = 15  # target mask density, percent


@register(
    "docs_mlm_span_corruption_plan",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(trim(text), '\\s+') AS ts
      FROM documents),
    pos AS (
      SELECT doc_id, source, p.pos,
             CASE WHEN {_BUCKET_SQL.format(key="doc_id || '-' || p.pos")}
                  < {_MLM_PCT} THEN 1 ELSE 0 END AS sel
      FROM toks CROSS JOIN (SELECT unnest(range(1, 4096)) AS pos) p
      WHERE p.pos <= len(ts)),
    runs AS (
      SELECT doc_id, source, pos, sel,
             CASE WHEN sel = 1 AND COALESCE(LAG(sel) OVER (
                    PARTITION BY doc_id ORDER BY pos), 0) = 0
                  THEN 1 ELSE 0 END AS span_start
      FROM pos)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(sel) AS BIGINT) AS n_masked,
           CAST(SUM(sel) * 1000000 // COUNT(*) AS BIGINT) AS masked_ppm,
           CAST(SUM(span_start) AS BIGINT) AS n_spans,
           CAST(SUM(sel) * 1000 // GREATEST(SUM(span_start), 1) AS BIGINT)
             AS avg_span_len_milli
    FROM runs GROUP BY source ORDER BY source
    """,
)
def docs_mlm_span_corruption_plan(spark: SparkSession, sf_dir: str):
    """Span-corruption planning audit for MLM/T5-style pretraining: mark
    ~15% of token positions with the deterministic md5-bucket coin
    (reproducible across engines, retries, and repartitionings — the
    sampling_profile discipline, so the SAME spans come out on every
    run), detect contiguous runs via one per-doc lag, and report
    per-source mask density and span-length geometry — the numbers a
    data engineer checks against the noise-density/mean-span targets
    before burning GPU time. Token-grain work is scan-local except the
    per-doc ordered lag (partitioned window, bounded by doc length);
    output is source-grain."""
    d = t(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos0", "tok"
        ),
    ).select(
        "doc_id",
        "source",
        (F.col("pos0") + 1).alias("pos"),
        F.when(
            _md5_bucket(
                F.concat_ws("-", F.col("doc_id"), F.col("pos0") + 1)
            )
            < _MLM_PCT,
            1,
        )
        .otherwise(0)
        .alias("sel"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = pos.withColumn(
        "span_start",
        F.when(
            (F.col("sel") == 1)
            & (F.coalesce(F.lag("sel").over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    return (
        runs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("sel").cast("bigint").alias("n_masked"),
            F.expr(
                "CAST(SUM(sel) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("masked_ppm"),
            F.sum("span_start").cast("bigint").alias("n_spans"),
            F.expr(
                "CAST(SUM(sel) * 1000 div GREATEST(SUM(span_start), 1)"
                " AS BIGINT)"
            ).alias("avg_span_len_milli"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# 3. events_feature_hashing_matrix — hashing-trick featurizer audit
# ------------------------------------------------------------------

_FH_SLOTS = 32


@register(
    "events_feature_hashing_matrix",
    f"""
    WITH keys AS (
      SELECT user_id, event_type || '-' || hour(ts) AS fkey FROM events),
    hashed AS (
      SELECT user_id, fkey,
             {_BUCKET_SQL.format(key="fkey")} % {_FH_SLOTS} AS slot,
             CASE WHEN {_BUCKET_SQL.format(key="fkey || '#s'")} < 50
                  THEN 1 ELSE -1 END AS sgn
      FROM keys),
    uv AS (
      SELECT user_id, slot, CAST(SUM(sgn) AS BIGINT) AS val,
             COUNT(*) AS n_hits
      FROM hashed GROUP BY user_id, slot)
    SELECT slot,
           CAST(COUNT(*) AS BIGINT) AS n_user_cells,
           CAST(SUM(CASE WHEN val <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonzero_cells,
           CAST(SUM(val) AS BIGINT) AS net_sum,
           CAST(SUM(ABS(val)) AS BIGINT) AS abs_sum,
           (SELECT CAST(COUNT(DISTINCT fkey) AS BIGINT)
            FROM hashed h WHERE h.slot = uv.slot) AS n_distinct_keys
    FROM uv GROUP BY slot ORDER BY slot
    """,
)
def events_feature_hashing_matrix(spark: SparkSession, sf_dir: str):
    """The hashing-trick featurizer (signed feature hashing à la
    Weinberger et al. / scikit's FeatureHasher) over per-user event
    features, audited per slot: (event_type, hour) keys hash into 32
    signed slots with the deterministic md5 coin, per-user cell values
    are signed hit sums, and the slot report carries occupancy,
    cancellation (net vs abs sum — sign hashing makes collisions cancel
    in expectation) and the collision census (distinct keys per slot).
    This is the fixed-width featurization that needs NO vocabulary
    build — the property that matters at 100 TB where a dictionary
    would be another shuffle; everything here is scan-local hashing +
    two partial-combine aggregates."""
    e = t(spark, sf_dir, "events")
    keys = e.select(
        "user_id",
        F.concat_ws(
            "-", F.col("event_type"), F.hour("ts").cast("string")
        ).alias("fkey"),
    )
    hashed = keys.select(
        "user_id",
        "fkey",
        (_md5_bucket(F.col("fkey")) % _FH_SLOTS).alias("slot"),
        F.when(_md5_bucket(F.concat(F.col("fkey"), F.lit("#s"))) < 50, 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    uv = hashed.groupBy("user_id", "slot").agg(
        F.sum("sgn").cast("bigint").alias("val")
    )
    slot_keys = hashed.groupBy("slot").agg(
        F.countDistinct("fkey").cast("bigint").alias("n_distinct_keys")
    )
    return (
        uv.groupBy("slot")
        .agg(
            F.count("*").cast("bigint").alias("n_user_cells"),
            F.sum(F.when(F.col("val") != 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonzero_cells"),
            F.sum("val").cast("bigint").alias("net_sum"),
            F.sum(F.abs(F.col("val"))).cast("bigint").alias("abs_sum"),
        )
        .join(F.broadcast(slot_keys), "slot")
        .select(
            "slot",
            "n_user_cells",
            "n_nonzero_cells",
            "net_sum",
            "abs_sum",
            "n_distinct_keys",
        )
        .orderBy("slot")
    )


# ------------------------------------------------------------------
# 4. sql_pipe_syntax_revenue — Spark 4 SQL pipe-operator surface
# ------------------------------------------------------------------

_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
     AND l_shipdate < TIMESTAMP '1997-01-01'
|> AGGREGATE
     SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
       AS rev_dec,
     COUNT(*) AS n_lines
   GROUP BY l_returnflag, l_linestatus
|> SELECT l_returnflag, l_linestatus, CAST(rev_dec AS DOUBLE) AS revenue,
          n_lines
|> ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_pipe_syntax_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2))
                       - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str):
    """Spark 4's SQL pipe-operator syntax end-to-end (SPARK-49555): the
    same filtered revenue rollup sql_api_rank_revenue proves for ANSI
    SQL, written as a |> pipeline (FROM |> WHERE |> AGGREGATE |> SELECT
    |> ORDER BY) and handed to spark.sql — each pipe stage lowers onto
    the exact logical operators the DataFrame API builds, so Catalyst
    sees an identical plan (scan-pruned filter, partial+final decimal
    aggregate) and the oracle is the plain-SQL restatement. Coverage
    marker: a reference user can bring pipe-syntax SQL, ANSI SQL, or
    DataFrames to the same engine."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_SQL)


# ------------------------------------------------------------------
# 5. orders_open_order_aging_snapshot — receivables-style aging report
# ------------------------------------------------------------------


@register(
    "orders_open_order_aging_snapshot",
    """
    WITH snap AS (SELECT MAX(o_orderdate) AS snap_ts FROM orders),
    aged AS (
      SELECT o_orderstatus,
             CASE
               WHEN date_diff('day', o_orderdate, snap_ts) <= 180
                 THEN 'A_0_180'
               WHEN date_diff('day', o_orderdate, snap_ts) <= 365
                 THEN 'B_181_365'
               WHEN date_diff('day', o_orderdate, snap_ts) <= 730
                 THEN 'C_366_730'
               ELSE 'D_over_730' END AS age_bucket,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS price_c
      FROM orders CROSS JOIN snap
      WHERE o_orderstatus IN ('O', 'P'))
    SELECT o_orderstatus, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price_c) AS BIGINT) AS open_value_cents
    FROM aged GROUP BY 1, 2 ORDER BY o_orderstatus, age_bucket
    """,
)
def orders_open_order_aging_snapshot(spark: SparkSession, sf_dir: str):
    """Open-order aging snapshot — the receivables-style bucket report
    every ops/finance team runs: orders still open (status O/P) as of
    the latest order date, bucketed by age with open value in exact
    cents. The snapshot date is a 1-row broadcast (no collect), bucket
    assignment is scan-local, and the rollup is one partial-combine
    aggregate over (status, bucket) — 8 output rows at any corpus
    size."""
    o = t(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("snap_ts"))
    age = F.datediff(F.col("snap_ts"), F.col("o_orderdate"))
    bucket = (
        F.when(age <= 180, "A_0_180")
        .when(age <= 365, "B_181_365")
        .when(age <= 730, "C_366_730")
        .otherwise("D_over_730")
    )
    return (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(snap))
        .select(
            "o_orderstatus",
            bucket.alias("age_bucket"),
            (dec("o_totalprice") * 100).cast("bigint").alias("price_c"),
        )
        .groupBy("o_orderstatus", "age_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("price_c").cast("bigint").alias("open_value_cents"),
        )
        .orderBy("o_orderstatus", "age_bucket")
    )


# ------------------------------------------------------------------
# 6. emb_mahalanobis_ood_diag — out-of-distribution screen
# ------------------------------------------------------------------


@register(
    "emb_mahalanobis_ood_diag",
    """
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(1000000 * CAST(x AS DOUBLE)) AS BIGINT))
               AS qv
      FROM embeddings),
    flat AS (
      SELECT vec_id, label, p.pos, qv[p.pos] AS val
      FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p),
    stats AS (
      SELECT pos, SUM(val) // COUNT(*) AS mu,
             GREATEST((SUM(val::HUGEINT * val)
                       - SUM(val)::HUGEINT * SUM(val) // COUNT(*))
                      // COUNT(*), 1) AS varr
      FROM flat GROUP BY pos),
    md AS (
      SELECT vec_id, label,
             CAST(SUM((val - mu) * (val - mu) * 1000 // varr) AS BIGINT)
               AS md2_milli
      FROM flat JOIN stats USING (pos)
      GROUP BY vec_id, label)
    SELECT vec_id, label, md2_milli
    FROM md ORDER BY md2_milli DESC, vec_id LIMIT 10
    """,
)
def emb_mahalanobis_ood_diag(spark: SparkSession, sf_dir: str):
    """Out-of-distribution screen via diagonal Mahalanobis distance:
    per-dimension corpus mean and variance in the kmeans micro-integer
    fixed point (truncating divisions — identical both engines), then
    each vector's Σ (x−μ)²/σ² with the per-term ×1000 quantized BEFORE
    the cross-dimension sum, so the top-10 outlier ranking is exact
    integer compares. The diagonal covariance is the variant that
    scales — the 64-row stats table broadcasts where a full covariance
    would need a d×d solve — and it's the standard first-pass OOD
    filter before shipping embeddings to training
    (emb_dimension_isotropy_audit reads the same moments corpus-wide;
    this op turns them on individual vectors)."""
    e = t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(F.lit(1000000) * x.cast("double")).cast(
                "bigint"
            ),
        ).alias("qv"),
    )
    flat = q.select(
        "vec_id", "label", F.posexplode("qv").alias("pos0", "val")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val")
    big = "decimal(38,0)"
    stats = flat.groupBy("pos").agg(
        F.expr("SUM(val) div COUNT(*)").alias("mu"),
        F.expr(
            f"GREATEST((SUM(CAST(val AS {big}) * val)"
            f" - CAST(SUM(val) AS {big}) * SUM(val) div COUNT(*))"
            " div COUNT(*), 1)"
        ).alias("varr"),
    )
    md = (
        flat.join(F.broadcast(stats), "pos")
        .groupBy("vec_id", "label")
        .agg(
            F.expr(
                "CAST(SUM((val - mu) * (val - mu) * 1000 div varr)"
                " AS BIGINT)"
            ).alias("md2_milli")
        )
    )
    return md.orderBy(F.col("md2_milli").desc(), "vec_id").limit(10)
