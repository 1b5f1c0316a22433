"""Round-6b operators: KMV theta-sketch set algebra, decision-stump
split search, training-mixture sampling planner, and nearest-as-of joins.

Extends the reference's aggregate/join surface (SURVEY §2A A14/A15 dedup
probes, A23 argmin) toward the curation/analytics tiers the north star
names. Float-parity policy as registry/__init__.py: exact integer/decimal
arithmetic everywhere a ranking or a division feeds a comparison; doubles
only as final presentation casts of exact integers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import t
from .llm_ops import _BUCKET_DIMS, _BUCKET_SQL

# 60-bit hash space: first 15 hex chars of md5, identically computable in
# Spark (conv) and DuckDB (0x-prefixed cast).
_MAXH = 1 << 60
_KMV_K = 64


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


@register(
    "sketch_kmv_set_ops",
    f"""
    WITH tagged AS (
      SELECT DISTINCT event_type AS tag, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE event_type IN ('view', 'purchase')),
    ska AS (SELECT h FROM tagged WHERE tag = 'view'
            ORDER BY h LIMIT {_KMV_K}),
    skb AS (SELECT h FROM tagged WHERE tag = 'purchase'
            ORDER BY h LIMIT {_KMV_K}),
    sku AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
            ORDER BY h LIMIT {_KMV_K}),
    hk AS (SELECT MAX(h) AS hk, COUNT(*) AS ku FROM sku),
    both_cnt AS (
      SELECT COUNT(*) AS c FROM sku
      WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
    exact AS (
      SELECT
        COUNT(DISTINCT CASE WHEN tag = 'view' THEN user_id END) AS a_exact,
        COUNT(DISTINCT CASE WHEN tag = 'purchase' THEN user_id END) AS b_exact,
        COUNT(DISTINCT user_id) AS union_exact
      FROM tagged),
    inter AS (
      SELECT COUNT(*) AS inter_exact FROM (
        SELECT user_id FROM tagged GROUP BY user_id HAVING COUNT(DISTINCT tag) = 2))
    SELECT
      CAST({_KMV_K} AS BIGINT) AS k,
      CAST(a_exact AS BIGINT) AS a_exact,
      CAST(b_exact AS BIGINT) AS b_exact,
      CAST(union_exact AS BIGINT) AS union_exact,
      CAST(inter_exact AS BIGINT) AS inter_exact,
      CAST(((ku - 1)::HUGEINT * {_MAXH}) // hk AS BIGINT) AS union_est,
      CAST((c::HUGEINT * (((ku - 1)::HUGEINT * {_MAXH}) // hk)) // ku
           AS BIGINT) AS inter_est
    FROM hk, both_cnt, exact, inter
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str):
    """KMV (k-minimum-values / theta) sketch set algebra: estimate the
    distinct-user cardinality of `view` UNION `purchase` and their
    INTERSECTION from two 64-value sketches, next to the exact answers.
    This is the mergeable-sketch contract behind Theta/HLL set operations
    (Datasketches): each set keeps only its k smallest 60-bit hashes, the
    union sketch is the k smallest of the merged value set, and the
    Jaccard estimate is the fraction of union-sketch values present in
    both input sketches. Every k-smallest is a global `ORDER BY h LIMIT k`
    — Spark plans TakeOrderedAndProject (per-partition top-k, merged at
    the driver), so no full sort and no single giant partition at any
    scale; the sketch joins are 64-row broadcasts. Estimator arithmetic is
    exact integer: est = (k-1)*2^60 div h_k in DECIMAL(38,0), identically
    truncated by DuckDB's HUGEINT floor-div (operands positive).
    Reference tie-in: A15's existence probe generalized to cardinality
    estimation (database.py:43-61)."""
    ev = t(spark, sf_dir, "events")
    tagged = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .select(F.col("event_type").alias("tag"), "user_id")
        .distinct()
        .withColumn("h", _h60(F.col("user_id")))
    )
    ska = tagged.filter(F.col("tag") == "view").select("h").orderBy("h").limit(
        _KMV_K
    )
    skb = (
        tagged.filter(F.col("tag") == "purchase")
        .select("h")
        .orderBy("h")
        .limit(_KMV_K)
    )
    sku = ska.unionAll(skb).distinct().orderBy("h").limit(_KMV_K)
    hk = sku.agg(
        F.max("h").alias("hk"), F.count("*").cast("bigint").alias("ku")
    )
    both_cnt = (
        sku.join(ska, "h", "left_semi")
        .join(skb, "h", "left_semi")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # Exact ground truth in ONE user-keyed pass (re-planned r11, same
    # lesson as orders_column_profile): three countDistinct over three
    # different expressions in one aggregate would trigger Catalyst's
    # RewriteDistinctAggregates x4 Expand, and the old intersection
    # branch re-aggregated tagged separately. tagged is already distinct
    # on (tag, user_id), so per-user membership flags make every exact
    # count a plain sum: one exchange on user_id, zero row replication,
    # and the inter branch folds into the same aggregate.
    per_user = tagged.groupBy("user_id").agg(
        F.max(
            F.when(F.col("tag") == "view", 1).otherwise(0)
        ).alias("in_a"),
        F.max(
            F.when(F.col("tag") == "purchase", 1).otherwise(0)
        ).alias("in_b"),
    )
    exact = per_user.agg(
        F.sum("in_a").cast("bigint").alias("a_exact"),
        F.sum("in_b").cast("bigint").alias("b_exact"),
        F.count("*").cast("bigint").alias("union_exact"),
        F.sum(F.col("in_a") * F.col("in_b"))
        .cast("bigint")
        .alias("inter_exact"),
    )
    est_union = F.expr(
        f"CAST((CAST(ku - 1 AS DECIMAL(38,0)) * {_MAXH}) div hk AS BIGINT)"
    )
    return (
        hk.crossJoin(both_cnt)
        .crossJoin(exact)
        .select(
            F.lit(_KMV_K).cast("bigint").alias("k"),
            F.col("a_exact").cast("bigint"),
            F.col("b_exact").cast("bigint"),
            F.col("union_exact").cast("bigint"),
            F.col("inter_exact").cast("bigint"),
            est_union.alias("union_est"),
            F.expr(
                f"CAST((CAST(c AS DECIMAL(38,0)) * "
                f"(CAST((CAST(ku - 1 AS DECIMAL(38,0)) * {_MAXH}) div hk "
                f"AS DECIMAL(38,0)))) div ku AS BIGINT)"
            ).alias("inter_est"),
        )
    )


_STUMP_BUCKET = 20000


@register(
    "orders_gini_best_split_stump",
    f"""
    WITH labeled AS (
      SELECT CAST(FLOOR(o_totalprice / {_STUMP_BUCKET}) AS BIGINT)
               * {_STUMP_BUCKET} AS bucket,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders),
    grid AS (
      SELECT bucket, COUNT(*) AS n, SUM(pos) AS p
      FROM labeled GROUP BY bucket),
    cum AS (
      SELECT bucket,
             COALESCE(SUM(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nl,
             COALESCE(SUM(p) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pl,
             SUM(n) OVER () AS nt,
             SUM(p) OVER () AS pt
      FROM grid),
    scored AS (
      SELECT bucket AS threshold, nl AS n_left, pl AS pos_left,
             nt - nl AS n_right, pt - pl AS pos_right,
             CAST((pl::HUGEINT * (nl - pl) * (nt - nl)
                   + (pt - pl)::HUGEINT * ((nt - nl) - (pt - pl)) * nl)
                  * 1000000 // (nl::HUGEINT * (nt - nl)) AS BIGINT)
               AS impurity_fp
      FROM cum WHERE nl > 0 AND nt - nl > 0)
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(pos_left AS BIGINT) AS pos_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(pos_right AS BIGINT) AS pos_right,
           impurity_fp
    FROM scored
    ORDER BY impurity_fp, threshold LIMIT 5
    """,
)
def orders_gini_best_split_stump(spark: SparkSession, sf_dir: str):
    """Decision-stump split search by weighted Gini impurity — the inner
    loop of distributed tree training (XGBoost/LightGBM histogram-based
    split finding): bucket the feature (o_totalprice, fixed 20k-wide
    histogram bins, the standard scale trick — candidate thresholds are
    bin edges, not distinct values), build the per-bin (count, positives)
    histogram in ONE map-side-combinable groupBy, then evaluate every
    threshold from the exclusive prefix sums of the tiny bin table.
    Weighted Gini 2*(pl*(nl-pl)/nl + pr*(nr-pr)/nr) is ranked in exact
    fixed point: numerator cross-multiplied onto the common denominator
    nl*nr and integer-divided at 1e6 scale in DECIMAL(38,0) — identical
    truncation in DuckDB HUGEINT. The window runs over O(#bins) rows, not
    the fact table, so the single unpartitioned window is bounded (~60
    rows) at any data scale. Label = order priority in {URGENT, HIGH}.
    Returns the 5 best thresholds (TakeOrdered)."""
    o = t(spark, sf_dir, "orders")
    labeled = o.select(
        (
            F.floor(F.col("o_totalprice") / _STUMP_BUCKET).cast("bigint")
            * _STUMP_BUCKET
        ).alias("bucket"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("pos"),
    )
    grid = labeled.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grid.select(
        "bucket",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("nl"),
        F.coalesce(F.sum("p").over(w), F.lit(0)).alias("pl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("p").over(wt).alias("pt"),
    )
    scored = cum.filter(
        (F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0)
    ).select(
        F.col("bucket").cast("bigint").alias("threshold"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("pl").cast("bigint").alias("pos_left"),
        (F.col("nt") - F.col("nl")).cast("bigint").alias("n_right"),
        (F.col("pt") - F.col("pl")).cast("bigint").alias("pos_right"),
        F.expr(
            "CAST((CAST(pl AS DECIMAL(38,0)) * (nl - pl) * (nt - nl)"
            " + CAST(pt - pl AS DECIMAL(38,0)) * ((nt - nl) - (pt - pl)) * nl)"
            " * 1000000 div (CAST(nl AS DECIMAL(38,0)) * (nt - nl)) AS BIGINT)"
        ).alias("impurity_fp"),
    )
    return scored.orderBy("impurity_fp", "threshold").limit(5)


_MIX_TARGET_PPM = {0: 400000, 1: 300000, 2: 200000, 3: 100000}


@register(
    "docs_mixture_sampling_plan",
    f"""
    WITH grouped AS (
      SELECT CAST(substr(source, 4) AS INT) % 4 AS domain,
             SUM(n_chars) AS tokens
      FROM documents GROUP BY 1),
    targeted AS (
      SELECT domain, tokens,
             CASE domain WHEN 0 THEN {_MIX_TARGET_PPM[0]}
                         WHEN 1 THEN {_MIX_TARGET_PPM[1]}
                         WHEN 2 THEN {_MIX_TARGET_PPM[2]}
                         ELSE {_MIX_TARGET_PPM[3]} END AS target_ppm
      FROM grouped),
    lim AS (
      SELECT MIN(tokens * 1000000 // target_ppm) AS final_total FROM targeted)
    SELECT CAST(domain AS INT) AS domain,
           CAST(tokens AS BIGINT) AS tokens,
           CAST(target_ppm AS BIGINT) AS target_ppm,
           CAST(final_total * target_ppm // 1000000 AS BIGINT) AS kept_tokens,
           CAST((final_total * target_ppm // 1000000) * 1000000 // tokens
                AS BIGINT) AS rate_ppm
    FROM targeted, lim
    ORDER BY domain
    """,
)
def docs_mixture_sampling_plan(spark: SparkSession, sf_dir: str):
    """Training-mixture sampling planner — the data-recipe step of every
    LLM pretraining run (Dolma/Pile-style domain weighting): given target
    mixture weights per domain (ppm literals) and the observed token mass
    per domain (n_chars as the token proxy), find the largest total corpus
    honoring the weights with NO upsampling: the binding domain is the one
    with the smallest tokens/target ratio; every domain then keeps
    target_ppm of that total. Downsample rates come out as exact ppm
    integers (floor at each step, identical truncation both engines).
    Pure metadata arithmetic: one map-side-combinable groupBy over the
    corpus, a 4-row broadcastable plan table, zero shuffles beyond the
    aggregate — at 100 TB the plan feeds a deterministic-hash row filter
    (registry/sampling_profile.py) rather than materializing samples."""
    d = t(spark, sf_dir, "documents")
    grouped = d.groupBy(
        (F.substring("source", 4, 10).cast("int") % 4).alias("domain")
    ).agg(F.sum("n_chars").alias("tokens"))
    target = (
        F.when(F.col("domain") == 0, _MIX_TARGET_PPM[0])
        .when(F.col("domain") == 1, _MIX_TARGET_PPM[1])
        .when(F.col("domain") == 2, _MIX_TARGET_PPM[2])
        .otherwise(_MIX_TARGET_PPM[3])
    )
    targeted = grouped.select(
        "domain", "tokens", target.alias("target_ppm")
    )
    lim = targeted.agg(
        F.min(F.expr("tokens * 1000000 div target_ppm")).alias("final_total")
    )
    kept = F.expr("final_total * target_ppm div 1000000")
    return (
        targeted.crossJoin(F.broadcast(lim))
        .select(
            F.col("domain").cast("int"),
            F.col("tokens").cast("bigint"),
            F.col("target_ppm").cast("bigint"),
            kept.cast("bigint").alias("kept_tokens"),
            F.expr(
                "(final_total * target_ppm div 1000000) * 1000000 div tokens"
            )
            .cast("bigint")
            .alias("rate_ppm"),
        )
        .orderBy("domain")
    )


@register(
    "asof_nearest_event_join",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('view', 'purchase')),
    marked AS (
      SELECT user_id, ts, event_id, side,
             LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_id,
             LAST_VALUE(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_ts,
             FIRST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_id,
             FIRST_VALUE(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
      FROM ordered)
    SELECT CAST(event_id AS BIGINT) AS purchase_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(CASE
             WHEN prev_view_id IS NULL THEN next_view_id
             WHEN next_view_id IS NULL THEN prev_view_id
             WHEN epoch_us(ts) - epoch_us(prev_view_ts)
                  <= epoch_us(next_view_ts) - epoch_us(ts)
               THEN prev_view_id ELSE next_view_id END AS BIGINT)
             AS view_id,
           CAST(CASE
             WHEN prev_view_id IS NULL AND next_view_id IS NULL THEN NULL
             WHEN prev_view_id IS NULL THEN epoch_us(next_view_ts) - epoch_us(ts)
             WHEN next_view_id IS NULL THEN epoch_us(ts) - epoch_us(prev_view_ts)
             WHEN epoch_us(ts) - epoch_us(prev_view_ts)
                  <= epoch_us(next_view_ts) - epoch_us(ts)
               THEN epoch_us(ts) - epoch_us(prev_view_ts)
             ELSE epoch_us(next_view_ts) - epoch_us(ts) END AS BIGINT) AS gap_us
    FROM marked WHERE side = 1
    """,
)
def asof_nearest_event_join(spark: SparkSession, sf_dir: str):
    """Nearest-as-of join — the bidirectional sibling of the backward-only
    as-of operator (operators/asof.py, itself generalizing the reference's
    nearest-text argmin, tables.py:33-46): for every purchase, the nearest
    view by ABSOLUTE time distance per user; ties prefer the earlier
    (backward) view. Implemented as the union-sort pattern: one shuffle on
    user_id, one window sorted (ts, side, event_id) — the tiebreak on
    event_id pins a total order so both engines resolve equal-timestamp
    neighbors identically — carrying last-view-before and first-view-after
    with ignorenulls frames; the nearer side wins in an exact integer
    epoch-microseconds comparison. No self-join, no range explosion: cost is
    one sort per user partition at any scale."""
    ev = t(spark, sf_dir, "events")
    ordered = ev.filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("side"),
    )
    order = [F.col("ts"), F.col("side"), F.col("event_id")]
    wprev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    vid = F.when(F.col("side") == 0, F.col("event_id"))
    vts = F.when(F.col("side") == 0, F.col("ts"))
    marked = ordered.select(
        "user_id",
        "ts",
        "event_id",
        "side",
        F.last(vid, ignorenulls=True).over(wprev).alias("prev_view_id"),
        F.last(vts, ignorenulls=True).over(wprev).alias("prev_view_ts"),
        F.first(vid, ignorenulls=True).over(wnext).alias("next_view_id"),
        F.first(vts, ignorenulls=True).over(wnext).alias("next_view_ts"),
    )
    gap_prev = (
        F.unix_micros("ts") - F.unix_micros("prev_view_ts")
    ).cast("bigint")
    gap_next = (
        F.unix_micros("next_view_ts") - F.unix_micros("ts")
    ).cast("bigint")
    prev_wins = F.col("next_view_id").isNull() | (
        F.col("prev_view_id").isNotNull() & (gap_prev <= gap_next)
    )
    return marked.filter(F.col("side") == 1).select(
        F.col("event_id").cast("bigint").alias("purchase_id"),
        F.col("user_id").cast("bigint"),
        F.when(prev_wins, F.col("prev_view_id"))
        .otherwise(F.col("next_view_id"))
        .cast("bigint")
        .alias("view_id"),
        F.when(
            F.col("prev_view_id").isNull() & F.col("next_view_id").isNull(),
            F.lit(None),
        )
        .when(prev_wins, gap_prev)
        .otherwise(gap_next)
        .cast("bigint")
        .alias("gap_us"),
    )


def _copurchase_labels(spark: SparkSession, sf_dir: str):
    """Shared co-purchase graph: support-pruned part-pair edges (>= 2
    shared orders), undirected edge list, and 2-round min-label
    communities. Used by graph_label_propagation and the modularity
    evaluation op.

    The edge list and the final label table are PERSISTED: every
    consumer references them from several plan branches (both union
    directions, ru/rv sides of the intra-edge join, degree rollups), and
    without the persist Spark re-executes the lineitem self-join per
    branch (measured 19.4s -> ~6s for modularity at sf0.1). Both tables
    are edge/node grain — far smaller than the fact table — and spill
    to disk if not."""
    from pyspark import StorageLevel

    li = t(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    r1 = (
        nodes.join(und, nodes.node == und.u, "left")
        .groupBy("node")
        .agg(
            F.least(
                F.col("node"), F.coalesce(F.min("v"), F.col("node"))
            ).alias("label")
        )
    )
    r1 = r1.persist(StorageLevel.MEMORY_AND_DISK)  # referenced twice in r2
    nb_labels = r1.select(
        F.col("node").alias("nb_node"), F.col("label").alias("nb_label")
    )
    und2 = und.select(F.col("u").alias("u2"), F.col("v").alias("v2"))
    r2 = (
        r1.join(und2, r1.node == und2.u2, "left")
        .join(nb_labels, und2.v2 == nb_labels.nb_node, "left")
        .groupBy("node", "label")
        .agg(
            F.least(
                F.col("label"), F.coalesce(F.min("nb_label"), F.col("label"))
            ).alias("label2")
        )
        .select("node", F.col("label2").alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return edges, und, r2


# shared CTE chain for the co-purchase graph + 2-round min-label
# communities (ends in r2/und/edges) — mirrored by _copurchase_labels
_COPURCHASE_CTES = """pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS (
      SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    nodes AS (SELECT DISTINCT u AS node FROM und),
    r1 AS (
      SELECT n.node,
             LEAST(n.node, COALESCE(MIN(e.v), n.node)) AS label
      FROM nodes n LEFT JOIN und e ON e.u = n.node
      GROUP BY n.node),
    r2 AS (
      SELECT n.node,
             LEAST(n.label, COALESCE(MIN(nb.label), n.label)) AS label
      FROM r1 n LEFT JOIN und e ON e.u = n.node
      LEFT JOIN r1 nb ON nb.node = e.v
      GROUP BY n.node, n.label)"""


@register(
    "graph_label_propagation",
    f"""
    WITH {_COPURCHASE_CTES},
    sized AS (
      SELECT label, COUNT(*) AS community_size FROM r2 GROUP BY label)
    SELECT CAST(r2.node AS BIGINT) AS part_key,
           CAST(r2.label AS BIGINT) AS community,
           CAST(sized.community_size AS BIGINT) AS community_size
    FROM r2 JOIN sized USING (label)
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str):
    """Synchronous min-label propagation (2 unrolled rounds) over the
    part co-purchase graph — the community-detection sibling of the
    connected-components canonicalizer (llm/cluster.py): edges are part
    pairs sharing >= 2 orders (the same bounded-width per-order pair
    expansion as basket_part_association — order width is O(lines/order),
    never O(n²)), labels start as node ids and each round every node takes
    the min of its own and its neighbors' labels. Deterministic (min is
    order-free), fully unrolled in one lazy plan: two join+groupBy rounds
    over the edge list — the fixed-iteration-count variant of the
    driver-paced CC fixpoint, which is the right shape when the graph
    diameter is known-small. Output: node -> community + community size."""
    _edges, _und, r2 = _copurchase_labels(spark, sf_dir)
    sized = r2.groupBy("label").agg(
        F.count("*").cast("bigint").alias("community_size")
    )
    return r2.join(sized, "label").select(
        F.col("node").cast("bigint").alias("part_key"),
        F.col("label").cast("bigint").alias("community"),
        "community_size",
    )


_KANON_N = 3
_KANON_K = 3


@register(
    "docs_kanon_shingle_suppression",
    f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i + 1 : i + {_KANON_N}], ' ')) AS gh
      FROM w, UNNEST(range(len(toks) - {_KANON_N} + 1)) AS t(i)
      WHERE len(toks) >= {_KANON_N}),
    dfreq AS (
      SELECT gh, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY gh),
    flagged AS (
      SELECT s.doc_id, s.pos, s.gh, d.df < {_KANON_K} AS rare
      FROM sh s JOIN dfreq d USING (gh))
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN rare THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST(SUM(CASE WHEN rare THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS suppressed_ppm,
           md5(COALESCE(
             string_agg(CASE WHEN NOT rare THEN gh END, ',' ORDER BY pos), ''))
             AS kept_fp
    FROM flagged GROUP BY doc_id
    """,
)
def docs_kanon_shingle_suppression(spark: SparkSession, sf_dir: str):
    """K-anonymity shingle suppression — the privacy-scrub tier of a
    training-data pipeline (suppress any span whose corpus frequency is
    below k, since rare spans are the memorization/PII risk): word
    {n}-gram shingles (the repo's shared md5-shingle stream), document
    frequency per shingle in one groupBy, and each document reports how
    much of its content survives k>={k} suppression plus an order-exact
    fingerprint of the kept stream (md5 over pos-sorted kept hashes —
    Spark re-assembles with the sort-struct trick, DuckDB with
    string_agg ORDER BY). All counts exact integers; the shuffle keys are
    shingle hash then doc_id — the same two-exchange shape as TF-IDF, no
    self-joins, collect_list bounded by document length."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= _KANON_N)
    sh = w.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.size("toks") - F.lit(_KANON_N)
                ),
                lambda i: F.md5(
                    F.array_join(
                        F.slice(F.col("toks"), i + 1, _KANON_N), " "
                    )
                ),
            )
        ).alias("pos", "gh"),
    )
    dfreq = sh.groupBy("gh").agg(F.countDistinct("doc_id").alias("df"))
    flagged = sh.join(dfreq, "gh").withColumn(
        "rare", F.col("df") < _KANON_K
    )
    kept = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("rare"), F.struct("pos", "gh")
                    )
                )
            ),
            lambda s: s.gh,
        ),
        ",",
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum(F.col("rare").cast("int")).cast("bigint").alias("n_rare"),
        F.expr(
            "CAST(SUM(CASE WHEN rare THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("suppressed_ppm"),
        F.md5(kept).alias("kept_fp"),
    ).select(
        F.col("doc_id").cast("bigint"),
        "n_shingles",
        "n_rare",
        "suppressed_ppm",
        "kept_fp",
    )


_SWEEP_GRID = list(range(0, 100, 10))  # cosine threshold pct 0..90


@register(
    "emb_cosine_threshold_sweep",
    f"""
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_BUCKET_SQL} AS bucket
      FROM embeddings),
    pairs AS (
      SELECT round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
      FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.0),
    tot AS (SELECT COUNT(*) AS total FROM pairs)
    SELECT CAST(g.t AS INT) AS threshold_pct,
           CAST(COUNT(CASE WHEN p.sim >= g.t / 100.0 THEN 1 END) AS BIGINT)
             AS n_pairs,
           CAST(COUNT(CASE WHEN p.sim >= g.t / 100.0 THEN 1 END)::HUGEINT
                * 1000000 // MAX(tot.total) AS BIGINT) AS share_ppm
    FROM (SELECT unnest({_SWEEP_GRID}) AS t) g, pairs p, tot
    GROUP BY g.t
    """,
)
def emb_cosine_threshold_sweep(spark: SparkSession, sf_dir: str):
    """Near-duplicate threshold calibration sweep — the tuning dial for
    the embedding-cosine dedup tier (emb_cosine_neardup): over the SAME
    sign-bucket LSH candidate pairs, count how many survive each cosine
    threshold in a 0..0.9 grid, with the share of all candidates in exact
    ppm. This is the curve a curator reads before committing to a dedup
    threshold at 100 TB — pair volume vs strictness on real data, at
    bucketed (never all-pairs) cost. Candidate generation reuses
    llm/similarity.cosine_neardup_pairs (one bucket-keyed shuffle,
    row-local codegen cosine); the 10-point grid multiplies only the tiny
    (sim) projection, not the vectors. Counts and shares exact integers;
    cosines rounded to 6dp before every comparison (the repo's proven
    cross-engine float contract)."""
    from ..llm.similarity import cosine_neardup_pairs

    e = t(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_pairs(e, threshold=0.0, dims=_BUCKET_DIMS).select(
        "sim"
    )
    grid = F.explode(
        F.array(*[F.lit(x) for x in _SWEEP_GRID])
    ).alias("t")
    tot = pairs.agg(F.count("*").cast("bigint").alias("total"))
    swept = (
        pairs.select("sim", grid)
        .groupBy("t")
        .agg(
            F.count(
                F.when(F.col("sim") >= F.col("t") / 100.0, 1)
            )
            .cast("bigint")
            .alias("n_pairs")
        )
    )
    return swept.crossJoin(F.broadcast(tot)).select(
        F.col("t").cast("int").alias("threshold_pct"),
        "n_pairs",
        F.expr("CAST(n_pairs * 1000000 div total AS BIGINT)").alias(
            "share_ppm"
        ),
    )


_ZONE_GRID = [50, 100, 150, 200, 250, 300, 350, 400]


@register(
    "files_zone_map_prune_stats",
    f"""
    WITH inv AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n_rows, MAX(value) AS max_v
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT COUNT(*) AS n_files, SUM(n_rows) AS total_rows FROM inv)
    SELECT CAST(g.c AS INT) AS cutoff,
           CAST(COUNT(CASE WHEN inv.max_v < g.c THEN 1 END) AS BIGINT)
             AS files_skipped,
           CAST(MAX(tot.n_files) AS BIGINT) AS files_total,
           CAST(COUNT(CASE WHEN inv.max_v < g.c THEN 1 END)::HUGEINT
                * 1000000 // MAX(tot.n_files) AS BIGINT) AS file_skip_ppm,
           CAST(COALESCE(SUM(CASE WHEN inv.max_v < g.c
                                  THEN inv.n_rows END), 0) AS BIGINT)
             AS rows_skipped,
           CAST(COALESCE(SUM(CASE WHEN inv.max_v < g.c
                                  THEN inv.n_rows END), 0)::HUGEINT
                * 1000000 // MAX(tot.total_rows) AS BIGINT) AS row_skip_ppm
    FROM (SELECT unnest({_ZONE_GRID}) AS c) g, inv, tot
    GROUP BY g.c
    """,
)
def files_zone_map_prune_stats(spark: SparkSession, sf_dir: str):
    """Zone-map (min/max file-statistics) prune-effectiveness profiler —
    the data-skipping audit every lakehouse layout decision rests on
    (parquet row-group stats, Delta/Iceberg file stats, the reason
    zorder_layout_orders exists): simulate the file inventory at
    (event_type, day) grain with per-file MAX(value) zone stats, then for
    each `value >= c` predicate cutoff report how many files and rows a
    stats-aware scanner would skip outright. Pure metadata arithmetic —
    one map-side-combinable groupBy builds the inventory (at scale this
    reads the manifest/footer stats, not data), and the 8-point cutoff
    grid multiplies only the tiny inventory. Exact integer ppm shares.
    Complements files_compaction_plan (bin-packing) with the
    read-path-side layout quality metric."""
    ev = t(spark, sf_dir, "events")
    inv = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_rows"), F.max("value").alias("max_v")
    )
    tot = inv.agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("total_rows"),
    )
    grid = F.explode(F.array(*[F.lit(x) for x in _ZONE_GRID])).alias("c")
    swept = (
        inv.select("n_rows", "max_v", grid)
        .groupBy("c")
        .agg(
            F.count(F.when(F.col("max_v") < F.col("c"), 1))
            .cast("bigint")
            .alias("files_skipped"),
            F.coalesce(
                F.sum(F.when(F.col("max_v") < F.col("c"), F.col("n_rows"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("rows_skipped"),
        )
    )
    return swept.crossJoin(F.broadcast(tot)).select(
        F.col("c").cast("int").alias("cutoff"),
        "files_skipped",
        F.col("n_files").alias("files_total"),
        F.expr("CAST(files_skipped * 1000000 div n_files AS BIGINT)").alias(
            "file_skip_ppm"
        ),
        "rows_skipped",
        F.expr("CAST(rows_skipped * 1000000 div total_rows AS BIGINT)").alias(
            "row_skip_ppm"
        ),
    )


@register(
    "txn_optimize_compact",
    """
    WITH base AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem WHERE l_orderkey <= 3000)
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(1 AS INT) AS version,
           CAST(8 AS INT) AS files_before,
           CAST(1 AS INT) AS files_after
    FROM base GROUP BY l_returnflag
    """,
)
def txn_optimize_compact(spark: SparkSession, sf_dir: str):
    """OPTIMIZE (small-file compaction) as a TRANSACTION on the snapshot
    layer (catalog/txn.py) — the write-path twin of files_compaction_plan:
    create the table at v0 deliberately fragmented (repartition(8) → 8
    part files), then commit an `optimize` version that rewrites the SAME
    rows as one file (copy-on-write, snapshot-isolated: a reader pinned
    to v0 still sees the 8-file layout). The gate validates that the
    post-OPTIMIZE snapshot is byte-equivalent to the pre-OPTIMIZE data
    (aggregates straight off the raw table) AND that the physical layout
    collapsed (part-file counts read from the committed data dirs).
    At 100 TB, OPTIMIZE scopes rewrite groups per partition from manifest
    stats (the compaction-planner op) — the data plane stays ordinary
    parquet; this op proves the transactional publish around it."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from ..catalog.txn import commit, read_snapshot, _manifest_path

    li = t(spark, sf_dir, "lineitem")
    scratch = tempfile.mkdtemp(prefix="txn_optimize_q_")
    try:
        base = li.filter(F.col("l_orderkey") <= 3000).select(
            "l_returnflag",
            (
                F.col("l_extendedprice").cast("decimal(12,2)") * 100
            )
            .cast("bigint")
            .alias("cents"),
        )
        commit(spark, scratch, base.repartition(8), "create", None)

        def _nfiles(version: int) -> int:
            with open(_manifest_path(scratch, version)) as f:
                dirs = _json.load(f)["files"]
            return sum(
                len(_glob.glob(_os.path.join(d, "part-*.parquet")))
                for d in dirs
            )

        files_before = _nfiles(0)
        compacted = read_snapshot(spark, scratch).coalesce(1)
        version = commit(spark, scratch, compacted, "optimize", 0)
        files_after = _nfiles(version)
        out = (
            read_snapshot(spark, scratch)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("total_cents"),
            )
            .select(
                "l_returnflag",
                "n_rows",
                "total_cents",
                F.lit(version).cast("int").alias("version"),
                F.lit(files_before).cast("int").alias("files_before"),
                F.lit(files_after).cast("int").alias("files_after"),
            )
        )
        rows = out.collect()  # bounded: one stats row; pin before scratch cleanup
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "events_linear_interp_resample",
    """
    WITH samp AS (SELECT * FROM events WHERE user_id % 20 = 1),
    pts AS (
      SELECT user_id, epoch_us(ts) AS t_us, value AS v, 0 AS is_grid,
             event_id
      FROM samp),
    bounds AS (
      SELECT user_id,
             CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS d0,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS d1
      FROM samp GROUP BY user_id),
    spine AS (
      SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS hour
      FROM bounds),
    gridpts AS (
      SELECT user_id, epoch_us(hour) AS t_us, CAST(NULL AS DOUBLE) AS v,
             1 AS is_grid, CAST(NULL AS BIGINT) AS event_id, hour
      FROM spine),
    unioned AS (
      SELECT user_id, t_us, v, is_grid, event_id,
             CAST(NULL AS TIMESTAMP) AS hour FROM pts
      UNION ALL
      SELECT user_id, t_us, v, is_grid, event_id, hour FROM gridpts),
    marked AS (
      SELECT user_id, t_us, is_grid, hour,
             LAST_VALUE(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, is_grid, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
             LAST_VALUE(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, is_grid, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tp,
             FIRST_VALUE(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, is_grid, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn,
             FIRST_VALUE(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t_us, is_grid, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS tn
      FROM unioned)
    SELECT CAST(user_id AS BIGINT) AS user_id, hour,
           round(CASE
             WHEN vp IS NULL THEN vn
             WHEN vn IS NULL THEN vp
             ELSE vp + (vn - vp) * (CAST(t_us - tp AS DOUBLE)
                                    / CAST(tn - tp AS DOUBLE))
           END, 6) AS interp_value,
           CASE WHEN vp IS NULL THEN 'bfill'
                WHEN vn IS NULL THEN 'ffill'
                ELSE 'interp' END AS mode
    FROM marked WHERE is_grid = 1
    """,
)
def events_linear_interp_resample(spark: SparkSession, sf_dir: str):
    """Linear-interpolation resampling onto the per-user hourly grid —
    the interpolating sibling of events_resample_ffill (same per-user
    spine construction: sequence() from each user's own bounds, never a
    global calendar cross join): each grid point takes the straight line
    between its surrounding raw events, flat-filling beyond the ends.
    One union-sort per user (the nearest-as-of pattern): events and grid
    points interleave in (t_us, is_grid, event_id) order — a total order,
    so both engines pick identical neighbors — and ignorenulls frames
    carry (prev value, prev time, next value, next time). The weight
    (t-tp)/(tn-tp) and the blend run in IEEE double on identical
    operands, rounded to 6dp (the repo's float contract). Cost: one
    user_id exchange + one window sort; spine volume is hours × users."""
    ev = t(spark, sf_dir, "events")
    samp = ev.filter(F.col("user_id") % 20 == 1)
    pts = samp.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").alias("v"),
        F.lit(0).alias("is_grid"),
        "event_id",
        F.lit(None).cast("timestamp").alias("hour"),
    )
    bounds = samp.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("d0"),
        F.date_trunc("hour", F.max("ts")).alias("d1"),
    )
    gridpts = bounds.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    ).select(
        "user_id",
        F.unix_micros("hour").alias("t_us"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
        F.lit(None).cast("bigint").alias("event_id"),
        "hour",
    )
    unioned = pts.unionByName(gridpts)
    order = [F.col("t_us"), F.col("is_grid"), F.col("event_id")]
    wprev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ev_v = F.when(F.col("is_grid") == 0, F.col("v"))
    ev_t = F.when(F.col("is_grid") == 0, F.col("t_us"))
    marked = unioned.select(
        "user_id",
        "t_us",
        "is_grid",
        "hour",
        F.last(ev_v, ignorenulls=True).over(wprev).alias("vp"),
        F.last(ev_t, ignorenulls=True).over(wprev).alias("tp"),
        F.first(ev_v, ignorenulls=True).over(wnext).alias("vn"),
        F.first(ev_t, ignorenulls=True).over(wnext).alias("tn"),
    )
    interp = (
        F.when(F.col("vp").isNull(), F.col("vn"))
        .when(F.col("vn").isNull(), F.col("vp"))
        .otherwise(
            F.col("vp")
            + (F.col("vn") - F.col("vp"))
            * (
                (F.col("t_us") - F.col("tp")).cast("double")
                / (F.col("tn") - F.col("tp")).cast("double")
            )
        )
    )
    return marked.filter(F.col("is_grid") == 1).select(
        F.col("user_id").cast("bigint"),
        "hour",
        F.round(interp, 6).alias("interp_value"),
        F.when(F.col("vp").isNull(), "bfill")
        .when(F.col("vn").isNull(), "ffill")
        .otherwise("interp")
        .alias("mode"),
    )


# floor-division by 2 with identical semantics in Spark (`div`, truncating)
# and DuckDB (`//`, flooring): subtract the positive remainder first so the
# division is exact and rounding mode becomes irrelevant.
def _fdiv2(x: str) -> str:
    return f"(({x}) - (((({x}) % 2) + 2) % 2)) "


@register(
    "orders_holt_recursive_forecast",
    f"""
    WITH RECURSIVE m AS (
      SELECT CAST((EXTRACT(year FROM o_orderdate) - 1995) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS idx,
             CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP)
               AS month,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    holt(idx, l, b) AS (
      SELECT idx, y, CAST(0 AS BIGINT) FROM m WHERE idx = 1
      UNION ALL
      SELECT m.idx,
             {_fdiv2("m.y + h.l + h.b")} // 2,
             {_fdiv2(_fdiv2("m.y + h.l + h.b") + " // 2 - h.l + h.b")} // 2
      FROM m JOIN holt h ON m.idx = h.idx + 1)
    SELECT CAST(m.idx AS BIGINT) AS idx, m.month,
           CAST(m.y AS BIGINT) AS y_cents,
           CAST(h.l AS BIGINT) AS level_cents,
           CAST(h.b AS BIGINT) AS trend_cents,
           CAST(h.l + h.b AS BIGINT) AS forecast_next_cents
    FROM m JOIN holt h USING (idx)
    """,
)
def orders_holt_recursive_forecast(spark: SparkSession, sf_dir: str):
    """Holt double-exponential smoothing (level + trend) over the monthly
    revenue series. alpha = beta = 1/2 makes every update an exact
    integer floor-half: l_t = floor((y_t + l_{t-1} + b_{t-1})/2),
    b_t = floor((l_t - l_{t-1} + b_{t-1})/2). The ORACLE runs the
    recurrence as a DuckDB RECURSIVE CTE; the Spark side aggregates the
    fact table to the month grain (the only full-data pass — one
    map-side-combinable groupBy) and runs the 80-step recurrence on the
    COLLECTED series driver-side. That collect is bounded metadata at
    any corpus size (month grain), and it is deliberately NOT a Spark
    recursive CTE: a sequential 1-row-frontier recursion costs one
    cluster job per step (measured 24s of pure scheduling at sf0.01 for
    zero data), which is the wrong physical shape for an
     80-element state recurrence — the same driver-side-bounded-state
    judgment as the abbreviation dict (operators/abbrev.py) and the
    bloom bitset (round5_ops). Python's // is floor division, matching
    DuckDB's // on the oracle side exactly (negative trends included).
    The month index is ARITHMETIC ((year-1995)*12 + month — testdata
    months are contiguous), so no total-order window sequences the
    series."""
    from pyspark.sql import types as T

    o = t(spark, sf_dir, "orders")
    m_df = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("idx")
        )
        .agg(
            F.date_trunc("month", F.min("o_orderdate")).alias("month"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("y"),
        )
        .orderBy("idx")
    )
    series = m_df.collect()  # month grain: bounded at any corpus size
    rows, level, trend = [], None, None
    for r in series:
        if level is None:
            level, trend = r.y, 0
        else:
            new_level = (r.y + level + trend) // 2
            trend = (new_level - level + trend) // 2
            level = new_level
        rows.append((r.idx, r.month, r.y, level, trend, level + trend))
    schema = T.StructType(
        [
            T.StructField("idx", T.LongType()),
            T.StructField("month", T.TimestampType()),
            T.StructField("y_cents", T.LongType()),
            T.StructField("level_cents", T.LongType()),
            T.StructField("trend_cents", T.LongType()),
            T.StructField("forecast_next_cents", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------ MinHash band planner
_BAND_CONFIGS = [(2, 64), (4, 32), (8, 16), (16, 8)]  # (rows r per band, b bands), r*b=128
_BAND_S = 10**6


def _capture_ppm(s_fp: int, r: int, b: int) -> int:
    """S-curve capture probability 1-(1-s^r)^b in truncating 1e6 fixed
    point via repeated squaring (r, b powers of two) — the EXACT integer
    recurrence both engines replicate."""
    p = s_fp
    k = r
    while k > 1:
        p = (p * p) // _BAND_S
        k //= 2
    m = _BAND_S - p
    k = b
    while k > 1:
        m = (m * m) // _BAND_S
        k //= 2
    return _BAND_S - m


def _band_oracle() -> str:
    from .llm_ops import _TOKS_SQL

    branches = []
    for r, b in _BAND_CONFIGS:
        # chained squarings as CTE steps: p = s^r, then m = (1e6-p)^b
        steps = []
        expr = "s"
        k = r
        i = 0
        while k > 1:
            steps.append(f"p{r}_{b}_{i} AS (SELECT *, "
                         f"(({expr}) * ({expr})) // {_BAND_S} AS sp{i} "
                         f"FROM {'bp_pairs' if i == 0 else f'p{r}_{b}_{i-1}'})")
            expr = f"sp{i}"
            k //= 2
            i += 1
        mexpr = f"{_BAND_S} - {expr}"
        k = b
        j = 0
        while k > 1:
            steps.append(f"m{r}_{b}_{j} AS (SELECT *, "
                         f"(({mexpr}) * ({mexpr})) // {_BAND_S} AS sm{j} "
                         f"FROM {f'p{r}_{b}_{i-1}' if j == 0 else f'm{r}_{b}_{j-1}'})")
            mexpr = f"sm{j}"
            k //= 2
            j += 1
        ref = _capture_ppm(850000, r, b)
        branches.append((
            ",\n    ".join(steps),
            f"""SELECT CAST({r} AS INT) AS rows_per_band,
               CAST({b} AS INT) AS n_bands,
               CAST({ref} AS BIGINT) AS capture_at_850k_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(CASE WHEN COUNT(*) = 0 THEN NULL
                    ELSE SUM({_BAND_S} - ({mexpr})) // COUNT(*) END AS BIGINT)
                 AS expected_recall_ppm
            FROM m{r}_{b}_{j-1}""",
        ))
    ctes = ",\n    ".join(x[0] for x in branches)
    selects = "\n    UNION ALL\n    ".join(x[1] for x in branches)
    return f"""
    WITH {_TOKS_SQL},
    bp_sh AS (
      SELECT DISTINCT doc_id,
             token || ' ' || lead(token, 1) OVER w || ' '
               || lead(token, 2) OVER w AS shingle
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(token, 2) OVER w IS NOT NULL),
    bp_capped AS (
      SELECT * FROM bp_sh WHERE shingle NOT IN (
        SELECT shingle FROM bp_sh GROUP BY shingle HAVING COUNT(*) > 10000)),
    bp_sizes AS (SELECT doc_id, COUNT(*) AS sz FROM bp_capped GROUP BY doc_id),
    bp_inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM bp_capped a JOIN bp_capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    bp_pairs AS (
      SELECT inter * {_BAND_S} // (sa.sz + sb.sz - inter) AS s
      FROM bp_inter JOIN bp_sizes sa ON sa.doc_id = id_a
                    JOIN bp_sizes sb ON sb.doc_id = id_b
      WHERE 2 * inter >= sa.sz + sb.sz - inter),
    {ctes}
    {selects}
    """


@register("minhash_band_planner", _band_oracle())
def minhash_band_planner(spark: SparkSession, sf_dir: str):
    """MinHash banding planner — choose (bands r, rows-per-band b) for a
    128-hash signature by EXPECTED RECALL ON THIS CORPUS, not the
    textbook S-curve alone: for every ground-truth near-dup pair (exact
    n-gram Jaccard >= 0.5, the same integer pair stats as
    docs_ngram_jaccard), evaluate the banding capture probability
    1-(1-s^r)^b at the pair's OWN similarity and average. All arithmetic
    is truncating 1e6 fixed point with powers computed by repeated
    squaring (r, b are powers of two) — bitwise identical in Spark (div)
    and DuckDB (//), no float pow. The textbook anchor (capture at
    s=0.85) rides along as a precomputed literal per config. This is the
    tuning table read before committing the MinHash-LSH tier
    (llm/dedup.py:160) to a threshold at 100 TB: pair stats cost one
    shingle self-join (blocked, df-capped), the sweep itself is O(pairs
    x configs) scalar arithmetic."""
    from pyspark import StorageLevel

    from ..llm.dedup import tokenize, word_shingles

    d = t(spark, sf_dir, "documents")
    # persist the shingle stream: it feeds the hot-shingle cap, the doc
    # sizes, and BOTH self-join sides (the ngram_jaccard_pairs persist
    # rationale — without it the tokenize+lead windows re-run per branch)
    sh = word_shingles(tokenize(d, "text", "doc_id"), "doc_id", 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > 10000)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b_side = sh.alias("b")
    inter = (
        a.join(b_side, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(2 * F.col("inter") >= F.col("uni"))
        .select(F.expr(f"inter * {_BAND_S} div uni").alias("s"))
    )
    outs = []
    for r, b in _BAND_CONFIGS:
        df_c = pairs
        expr = "s"
        k = r
        i = 0
        while k > 1:
            df_c = df_c.withColumn(
                f"sp{i}", F.expr(f"(({expr}) * ({expr})) div {_BAND_S}")
            )
            expr = f"sp{i}"
            k //= 2
            i += 1
        mexpr = f"{_BAND_S} - {expr}"
        k = b
        j = 0
        while k > 1:
            df_c = df_c.withColumn(
                f"sm{j}", F.expr(f"(({mexpr}) * ({mexpr})) div {_BAND_S}")
            )
            mexpr = f"sm{j}"
            k //= 2
            j += 1
        outs.append(
            df_c.agg(
                F.count("*").cast("bigint").alias("n_pairs"),
                F.expr(
                    f"CAST(CASE WHEN COUNT(*) = 0 THEN NULL"
                    f" ELSE SUM({_BAND_S} - ({mexpr})) div COUNT(*) END"
                    f" AS BIGINT)"
                ).alias("expected_recall_ppm"),
            ).select(
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(_capture_ppm(850000, r, b))
                .cast("bigint")
                .alias("capture_at_850k_ppm"),
                "n_pairs",
                "expected_recall_ppm",
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


@register(
    "part_theilsen_trend",
    """
    WITH pts AS (
      SELECT p_brand, p_size AS s,
             SUM(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT))
               * 1000 // COUNT(*) AS m
      FROM part GROUP BY p_brand, p_size),
    slopes AS (
      -- FLOOR division (DuckDB // truncates like Spark div): subtract the
      -- positive remainder so negative slopes floor identically
      SELECT a.p_brand,
             (((b.m - a.m) * 1000)
              - (((((b.m - a.m) * 1000) % (b.s - a.s)) + (b.s - a.s))
                 % (b.s - a.s))) // (b.s - a.s) AS slope_fp
      FROM pts a JOIN pts b
        ON a.p_brand = b.p_brand AND b.s > a.s),
    ranked AS (
      SELECT p_brand, slope_fp,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY slope_fp, p_brand) AS rn,
             COUNT(*) OVER (PARTITION BY p_brand) AS n_pairs
      FROM slopes)
    SELECT p_brand,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(slope_fp AS BIGINT) AS median_slope_fp
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
)
def part_theilsen_trend(spark: SparkSession, sf_dir: str):
    """Theil-Sen robust trend estimate (median of pairwise slopes, 29%
    breakdown point) of retail price vs part size, per brand — the
    robust-regression sibling of the OLS slope op (part_brand_ols_slope)
    and the MAD outlier screen. The scale trick: slopes are computed
    between the (size → mean price) GRID POINTS, not raw rows — size is
    a bounded domain (<=50 values), so the pair expansion is <=C(50,2)
    per brand at ANY corpus size, after one map-side-combinable groupBy
    collapses the fact table. All arithmetic exact fixed point: means at
    1e3-scaled cents via truncating div, slopes cross-divided at 1e3,
    the median picked by row_number (lower median, deterministic ties)
    inside a brand-partitioned window."""
    p = t(spark, sf_dir, "part")
    pts = p.groupBy(F.col("p_brand"), F.col("p_size").alias("s")).agg(
        F.expr(
            "SUM(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
            " * 1000 div COUNT(*)"
        ).alias("m")
    )
    a = pts.select(
        F.col("p_brand"), F.col("s").alias("sa"), F.col("m").alias("ma")
    )
    b = pts.select(
        F.col("p_brand"), F.col("s").alias("sb"), F.col("m").alias("mb")
    )
    # slope numerators can be NEGATIVE: Spark `div` truncates while the
    # oracle's `//` floors, so subtract the positive remainder first (the
    # _fdiv2 construction generalized to divisor sb-sa) — the division is
    # then exact and the rounding mode irrelevant.
    num = "(mb - ma) * 1000"
    d = "(sb - sa)"
    slopes = (
        a.join(b, "p_brand")
        .filter(F.col("sb") > F.col("sa"))
        .select(
            "p_brand",
            F.expr(
                f"(({num}) - (((({num}) % {d}) + {d}) % {d})) div {d}"
            ).alias("slope_fp"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("slope_fp", "p_brand")
    wc = Window.partitionBy("p_brand")
    ranked = slopes.select(
        "p_brand",
        "slope_fp",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "p_brand",
        F.col("n_pairs").cast("bigint"),
        F.col("slope_fp").cast("bigint").alias("median_slope_fp"),
    )


_PC_SCALE = 1000


def _int_gram(qarr_df, schema: str = "i int, j int, gij long"):
    """Exact-integer Gram matrix G = Σ q qᵀ over an int64 array column
    named `qarr` — one d²-cell partial per PARTITION via mapInArrow
    (numpy int64 matmul: exact integer arithmetic at C speed), then a
    bounded groupBy folds the ~num_partitions × d² partials into the
    final d² cells.  Replaces the double-posexplode build (VERDICT r6):
    exploding each vector to d² rows before the aggregate was a 4096×
    row inflation (d=64) through the scan stage — this form touches
    each vector once and emits only the d² partial per task, so shuffle
    volume is constant in corpus size.  Quantization stays in Spark
    expressions upstream, so integer parity with the DuckDB oracle is
    untouched."""

    def part(batches):
        import numpy as np
        import pyarrow as pa

        acc = None
        for b in batches:
            col = b.column(0)
            if col.null_count:
                col = col.drop_null()
            if len(col) == 0:
                continue
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = col.values.to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            widths = np.diff(offs)
            if not widths.size:
                continue
            d = int(widths.max())
            if (widths == d).all():
                q = vals[offs[0] : offs[-1]].reshape(-1, d)
                g = q.T @ q
            else:  # ragged corpus: row-wise outer products (rare path)
                g = np.zeros((d, d), dtype=np.int64)
                for k in range(len(widths)):
                    r = vals[offs[k] : offs[k + 1]]
                    g[: len(r), : len(r)] += np.outer(r, r)
            if acc is None:
                acc = g
            elif acc.shape[0] >= g.shape[0]:
                acc[: g.shape[0], : g.shape[0]] += g
            else:
                g[: acc.shape[0], : acc.shape[0]] += acc
                acc = g
        if acc is not None:
            d = acc.shape[0]
            yield pa.RecordBatch.from_pydict(
                {
                    "i": np.repeat(np.arange(d, dtype=np.int32), d),
                    "j": np.tile(np.arange(d, dtype=np.int32), d),
                    "gij": acc.reshape(-1),
                }
            )

    from pyspark.sql import functions as SF

    return (
        qarr_df.select("qarr")
        .mapInArrow(part, schema)
        .groupBy("i", "j")
        .agg(SF.sum("gij").alias("gij"))
    )


def _power_iterate_int(cells, scale: int):
    """Two exact-integer power iterations + deterministic sign fix over
    a COLLECTED Gram matrix — the Markov-ops pattern (fact fold
    distributed, fixpoint iterate driver-side over bounded state): the
    d² = 4096 Gram cells are constant in corpus size, and iterating
    them as Spark jobs paid ~8 sequential broadcast-exchange stages of
    pure scheduling latency (VERDICT r6 item 5).  Python ints are
    arbitrary-precision, and `//` is floor division — bit-identical to
    the floor-div construction the SQL oracle uses."""
    G: dict[tuple[int, int], int] = {}
    dims: set[int] = set()
    for r in cells:
        G[(r["i"], r["j"])] = int(r["gij"])
        dims.add(int(r["i"]))
        dims.add(int(r["j"]))
    ds = sorted(dims)

    def norm(v):
        mx = max(abs(x) for x in v.values())
        if mx == 0:  # all-zero Gram (empty/all-zero corpus): zero vector
            return {i: 0 for i in v}
        return {i: (x * scale) // mx for i, x in v.items()}

    v1 = norm({i: sum(G.get((i, j), 0) for j in ds) * scale for i in ds})
    v2 = norm({i: sum(G.get((i, j), 0) * v1[j] for j in ds) for i in ds})
    top = max(ds, key=lambda i: (abs(v2[i]), -i))
    s = -1 if v2[top] < 0 else 1
    return [(i, v2[i] * s) for i in ds]


@register(
    "emb_top_pc_power_iteration",
    f"""
    WITH g AS (
      SELECT u.i, w.j,
             SUM(CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * {_PC_SCALE})
                      AS BIGINT)
                 * CAST(round(CAST(embedding[w.j + 1] AS DOUBLE)
                              * {_PC_SCALE}) AS BIGINT)) AS gij
      FROM embeddings,
           UNNEST(range(len(embedding))) AS u(i),
           UNNEST(range(len(embedding))) AS w(j)
      GROUP BY u.i, w.j),
    v1 AS (
      SELECT i AS dim, SUM(gij * {_PC_SCALE}) AS v FROM g GROUP BY i),
    mx1 AS (SELECT MAX(abs(v)) AS mx FROM v1),
    -- FLOOR division on possibly-negative components (DuckDB // truncates
    -- like Spark div): subtract the positive remainder first
    v1n AS (
      SELECT dim, ((v * {_PC_SCALE})
                   - ((((v * {_PC_SCALE}) % mx) + mx) % mx)) // mx AS v
      FROM v1, mx1),
    v2 AS (
      SELECT g.i AS dim, SUM(g.gij * v1n.v) AS v
      FROM g JOIN v1n ON v1n.dim = g.j GROUP BY g.i),
    mx2 AS (SELECT MAX(abs(v)) AS mx FROM v2),
    v2n AS (
      SELECT dim, ((v * {_PC_SCALE})
                   - ((((v * {_PC_SCALE}) % mx) + mx) % mx)) // mx AS v
      FROM v2, mx2),
    sgn AS (
      SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
      FROM v2n
      ORDER BY abs(v) DESC, dim LIMIT 1)
    SELECT CAST(v2n.dim AS INT) AS dim,
           CAST(v2n.v * sgn.s AS BIGINT) AS component_fp
    FROM v2n, sgn
    """,
)
def emb_top_pc_power_iteration(spark: SparkSession, sf_dir: str):
    """Top principal direction of the embedding corpus by TWO unrolled
    power iterations on the Gram matrix — the iterative-linear-algebra-
    on-DataFrames shape (the eigen sibling of emb_kmeans_lloyd): quantize
    to 1e3 fixed point, build G = Σ qqᵀ in ONE map-side-combinable
    groupBy over the d² co-ordinate pairs (d=64 → 4096 cells, bounded at
    any corpus size — corpus rows touch only the Gram build), then two
    matrix-vector products against the 4096-row broadcastable G with
    exact-integer max-normalization between iterations (no sqrt, no
    float). Sign fixed deterministically (largest-|component| positive).
    This is the dead-dim/anisotropy diagnostic read next to
    emb_dim_variance_profile before ANN index choices: a corpus whose
    top direction dominates wants centering/whitening before IVF."""
    comp = _top_pc_components(spark, sf_dir)
    return spark.createDataFrame(
        [(int(i), int(v)) for i, v in comp],
        "dim int, component_fp bigint",
    )


def _top_pc_components(spark: SparkSession, sf_dir: str):
    """Shared top-PC computation (also feeds emb_second_pc_deflation's
    deflation step): distributed Gram fold, then the driver-side
    exact-integer iterate.  The collect is d² = 4096 cells — bounded
    at any corpus size."""
    e = t(spark, sf_dir, "embeddings")
    # Gram build: quantize in Spark expressions (exact parity with the
    # oracle's round()), then per-partition integer QᵀQ via _int_gram —
    # one scan, no row inflation, constant d² shuffle per task.
    qarr = e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * _PC_SCALE).cast("bigint"),
        ).alias("qarr"),
    )
    cells = _int_gram(qarr).collect()  # 4096 cells: bounded grain
    return _power_iterate_int(cells, _PC_SCALE)


@register(
    "multimodal_image_patch_stats",
    """
    WITH px AS (
      SELECT doc_id, CAST(gs.i AS BIGINT) AS i,
             ord(substr(text, CAST(gs.i AS INT) + 1, 1)) AS s
      FROM documents LEFT JOIN LATERAL
           (SELECT unnest(range(64)) AS i) gs ON TRUE
      WHERE length(text) >= 64 AND gs.i IS NOT NULL),
    placed AS (
      SELECT doc_id, s,
             (i // 8) AS r, (i % 8) AS c,
             ((i // 8) // 4) * 2 + ((i % 8) // 4) AS patch_idx
      FROM px),
    grads AS (
      SELECT a.doc_id, a.patch_idx, SUM(abs(b.s - a.s)) AS h_gradient
      FROM placed a JOIN placed b
        ON a.doc_id = b.doc_id AND b.r = a.r AND b.c = a.c + 1
           AND (a.c % 4) < 3
      GROUP BY a.doc_id, a.patch_idx)
    SELECT p.doc_id, p.patch_idx,
           CAST(SUM(p.s) AS BIGINT) AS brightness,
           CAST(MIN(p.s) AS BIGINT) AS min_px,
           CAST(MAX(p.s) AS BIGINT) AS max_px,
           CAST(MAX(g.h_gradient) AS BIGINT) AS h_gradient
    FROM placed p JOIN grads g
      ON g.doc_id = p.doc_id AND g.patch_idx = p.patch_idx
    GROUP BY p.doc_id, p.patch_idx
    """,
)
def multimodal_image_patch_stats(spark: SparkSession, sf_dir: str):
    """Patch-level luminance/contrast profile over binary payloads — the
    IMAGE sibling of multimodal_audio_frame_energy, with REAL numpy math
    through the Arrow mapInPandas boundary and a full value gate: the
    first 64 payload bytes form an 8×8 grayscale raster (payloads are
    ASCII so DuckDB reproduces every pixel via ord(substr)); each 4×4
    patch emits exact-integer brightness sum, min/max pixel, and the
    horizontal-gradient magnitude (the contrast screen image curation
    runs before model scoring). numpy does reshape + vectorized |diff|
    inside the batch — no per-pixel Python; the SQL mirror builds the
    gradient as a one-step self-join on (row, col+1) within patches.
    Swap frombuffer for a codec decode and the batch shape is the real
    image pipeline (llm/multimodal.py image_patch_stats)."""
    from ..llm.multimodal import attach_binary_payload, image_patch_stats

    d = attach_binary_payload(t(spark, sf_dir, "documents"), "text")
    return image_patch_stats(d, payload_col="payload", id_col="doc_id")


@register(
    "part_fisher_price_index",
    """
    WITH p0 AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS ext0,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty0
      FROM lineitem l WHERE year(l.l_shipdate) = 1996
      GROUP BY l.l_partkey),
    p1 AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS ext1,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty1
      FROM lineitem l WHERE year(l.l_shipdate) = 1997
      GROUP BY l.l_partkey),
    j AS (
      SELECT p.p_brand,
             CAST(SUM((1000000 * p1.ext1 * p0.qty0) // p1.qty1) AS BIGINT)
               AS num_l,
             CAST(SUM(1000000 * p0.ext0) AS BIGINT) AS den_l,
             CAST(SUM(1000000 * p1.ext1) AS BIGINT) AS num_p,
             CAST(SUM((1000000 * p0.ext0 * p1.qty1) // p0.qty0) AS BIGINT)
               AS den_p,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM p0 JOIN p1 USING (l_partkey)
      JOIN part p ON p.p_partkey = p0.l_partkey
      GROUP BY p.p_brand)
    SELECT p_brand, n_parts,
           CAST(floor(1000000.0 * num_l / den_l) AS BIGINT) AS laspeyres_fp,
           CAST(floor(1000000.0 * num_p / den_p) AS BIGINT) AS paasche_fp,
           CAST(floor(1000000.0 * sqrt((CAST(num_l AS DOUBLE) / den_l)
                                       * (CAST(num_p AS DOUBLE) / den_p)))
                AS BIGINT) AS fisher_fp
    FROM j
    """,
)
def part_fisher_price_index(spark: SparkSession, sf_dir: str):
    """Fisher ideal price index per brand — the geometric mean of the
    Laspeyres (base-period basket) and Paasche (current-period basket)
    indices, completing the index-number family started by
    part_laspeyres_price_index: Paasche terms mirror Laspeyres with the
    roles of the periods swapped (p0·q1 = ext0·qty1/qty0 as 1e6-scaled
    integer division), so both numerator/denominator sums are
    bit-identical across engines; the Fisher sqrt runs on IEEE doubles
    built from those exact integers — sqrt, division and multiplication
    are correctly-rounded operations on identical operands (the Wilson-CI
    contract), so the floor is safe. Same plan shape as Laspeyres: two
    pruned-year partial aggs, one part-keyed join, broadcast part dim,
    brand rollup."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    from ._util import dec

    def per_part(yr: int, ext: str, qty: str):
        return (
            li.filter(F.year("l_shipdate") == yr)
            .groupBy("l_partkey")
            .agg(
                F.sum((dec("l_extendedprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias(ext),
                F.sum(F.col("l_quantity").cast("bigint"))
                .cast("bigint")
                .alias(qty),
            )
        )

    p0 = per_part(1996, "ext0", "qty0")
    p1 = per_part(1997, "ext1", "qty1")
    j = (
        p0.join(p1, "l_partkey")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            p0.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.expr("(1000000 * ext1 * qty0) div qty1"))
            .cast("bigint")
            .alias("num_l"),
            F.sum(F.expr("1000000 * ext0")).cast("bigint").alias("den_l"),
            F.sum(F.expr("1000000 * ext1")).cast("bigint").alias("num_p"),
            F.sum(F.expr("(1000000 * ext0 * qty1) div qty0"))
            .cast("bigint")
            .alias("den_p"),
            F.count("*").cast("bigint").alias("n_parts"),
        )
    )
    return j.select(
        "p_brand",
        "n_parts",
        F.expr("CAST(floor(1000000.0 * num_l / den_l) AS BIGINT)").alias(
            "laspeyres_fp"
        ),
        F.expr("CAST(floor(1000000.0 * num_p / den_p) AS BIGINT)").alias(
            "paasche_fp"
        ),
        F.expr(
            "CAST(floor(1000000.0 * sqrt((CAST(num_l AS DOUBLE) / den_l)"
            " * (CAST(num_p AS DOUBLE) / den_p))) AS BIGINT)"
        ).alias("fisher_fp"),
    )


_WINNOW_W = 4  # winnowing window over word-3-gram hashes
_H40 = 1 << 40


@register(
    "docs_winnowing_fingerprints",
    f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents),
    gr AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 3], ' ')),
                             1, 10))::BIGINT AS h40
      FROM w, UNNEST(range(len(toks) - 2)) AS t(i)
      WHERE len(toks) >= 3),
    keyed AS (
      SELECT doc_id, pos,
             h40 * 2097152 + (1048576 - pos) AS k,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM gr),
    -- window min BEFORE the anchor filter: the last anchors still need to
    -- see the tail rows inside their frames
    winall AS (
      SELECT doc_id, n_grams, pos,
             MIN(k) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
               AS sel_k
      FROM keyed),
    wins AS (
      SELECT doc_id, n_grams, pos, sel_k FROM winall
      WHERE pos <= n_grams - {_WINNOW_W}),
    sel AS (
      SELECT DISTINCT doc_id, n_grams,
             1048576 - (sel_k % 2097152) AS sel_pos,
             sel_k // 2097152 AS sel_h
      FROM wins)
    SELECT doc_id,
           CAST(MAX(n_grams) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(COUNT(*) * 1000000 // MAX(n_grams) AS BIGINT) AS density_ppm,
           md5(string_agg(CAST(sel_h AS VARCHAR), ',' ORDER BY sel_pos))
             AS selected_fp
    FROM sel GROUP BY doc_id
    """,
)
def docs_winnowing_fingerprints(spark: SparkSession, sf_dir: str):
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken — the
    MOSS algorithm): slide a window of 4 consecutive word-3-gram
    hashes per document and keep the window MINIMUM, rightmost on ties —
    the guarantee-bearing local sampling scheme (any shared substring of
    length >= w+2 words yields a shared fingerprint) that plagiarism /
    near-dup detectors use instead of uniform sampling. The tie rule is
    encoded arithmetically: key = h40·2²¹ + (2²⁰ − pos), so MIN(key)
    picks the smallest hash and, among equals, the LARGEST position —
    one BIGINT, no struct ordering, identical in both engines. One
    doc-partitioned window + a DISTINCT collapse; selected-set
    fingerprint is md5 over the pos-ordered kept hashes (the kanon
    re-assembly idiom). Density ~ 2/(w+1) is the winnowing bound."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= 3)
    gr = w.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice(F.col("toks"), i + 1, 3), " ")),
                        1,
                        10,
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        ).alias("pos", "h40"),
    )
    wn = Window.partitionBy("doc_id")
    keyed = gr.select(
        "doc_id",
        "pos",
        (F.col("h40") * 2097152 + (1048576 - F.col("pos"))).alias("k"),
        F.count("*").over(wn).alias("n_grams"),
    )
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WINNOW_W - 1)
    )
    # window min BEFORE the anchor filter — the last anchors' frames must
    # still see the tail rows
    wins = keyed.select(
        "doc_id",
        "n_grams",
        "pos",
        F.min("k").over(wmin).alias("sel_k"),
    ).filter(F.col("pos") <= F.col("n_grams") - _WINNOW_W)
    sel = wins.select(
        "doc_id",
        "n_grams",
        (1048576 - F.col("sel_k") % 2097152).alias("sel_pos"),
        F.expr("sel_k div 2097152").alias("sel_h"),
    ).distinct()
    ordered_fp = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sel_pos", "sel_h"))
                ),
                lambda s: s.sel_h.cast("string"),
            ),
            ",",
        )
    )
    return sel.groupBy("doc_id").agg(
        F.max("n_grams").cast("bigint").alias("n_grams"),
        F.count("*").cast("bigint").alias("n_selected"),
        F.expr("CAST(COUNT(*) * 1000000 div MAX(n_grams) AS BIGINT)").alias(
            "density_ppm"
        ),
        ordered_fp.alias("selected_fp"),
    ).select(
        F.col("doc_id").cast("bigint"),
        "n_grams",
        "n_selected",
        "density_ppm",
        "selected_fp",
    )


@register(
    "graph_link_prediction_jaccard",
    """
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS (
      SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    undcap AS (
      SELECT u, v FROM (
        SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn
        FROM und) WHERE rn <= 64),
    cand AS (
      SELECT e1.u AS u, e2.v AS w, COUNT(*) AS common
      FROM undcap e1 JOIN undcap e2 ON e1.v = e2.u AND e1.u < e2.v
      GROUP BY e1.u, e2.v),
    new_links AS (
      SELECT c.u, c.w, c.common
      FROM cand c LEFT JOIN edges e ON e.u = c.u AND e.v = c.w
      WHERE e.u IS NULL),
    scored AS (
      SELECT n.u, n.w, n.common,
             du.d + dw.d - n.common AS uni,
             n.common * 1000000 // (du.d + dw.d - n.common) AS score_fp
      FROM new_links n
      JOIN deg du ON du.node = n.u
      JOIN deg dw ON dw.node = n.w)
    SELECT CAST(u AS BIGINT) AS u, CAST(w AS BIGINT) AS w,
           CAST(common AS BIGINT) AS common_neighbors,
           CAST(score_fp AS BIGINT) AS jaccard_fp
    FROM scored
    ORDER BY score_fp DESC, u, w LIMIT 50
    """,
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str):
    """Jaccard-coefficient link prediction over the co-purchase graph —
    the classic graph-ML baseline (predict the missing edges most likely
    to form) on the same support-pruned edge list as
    graph_label_propagation: candidate pairs come from the 2-hop join
    (bounded by degree², never all-pairs), existing edges are removed by
    an anti join, and the score |N(u)∩N(w)| / |N(u)∪N(w)| is an exact
    1e6 fixed-point integer (common from the 2-hop count, union from the
    degree table by inclusion-exclusion). Global top-50 via ORDER BY +
    LIMIT — TakeOrderedAndProject, per-partition top-k, no global sort.
    At 100 TB the 2-hop join is the cost and hub nodes the skew: the
    degree cap is now IN the plan (VERDICT r7) — each node feeds only
    its first 64 neighbors (deterministic key order, same cap in the
    oracle) into the 2-hop join, bounding per-mid-key join output at
    64²; the Jaccard union still uses TRUE degrees. 64 exceeds the
    corpus max degree at test scales (15 @ sf0.01, 10 @ sf0.1 —
    measured), binding only at 100× hubs. The persisted shared edge
    list (_copurchase_labels) feeds the 2-hop join, the anti join, and
    the degree rollup without re-running the lineitem self-join per
    branch."""
    edges, und, _r2 = _copurchase_labels(spark, sf_dir)
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    undcap = (
        und.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("u").orderBy("v")),
        )
        .filter(F.col("rn") <= 64)
        .drop("rn")
    )
    e1 = undcap.select(F.col("u").alias("cu"), F.col("v").alias("mid"))
    e2 = undcap.select(F.col("u").alias("mid"), F.col("v").alias("cw"))
    cand = (
        e1.join(e2, "mid")
        .filter(F.col("cu") < F.col("cw"))
        .groupBy(F.col("cu").alias("u"), F.col("cw").alias("w"))
        .agg(F.count("*").alias("common"))
    )
    existing = edges.select(
        F.col("u").alias("eu"), F.col("v").alias("ew")
    )
    new_links = cand.join(
        existing,
        (cand.u == existing.eu) & (cand.w == existing.ew),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("node").alias("w"), F.col("d").alias("dw"))
    scored = (
        new_links.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            F.col("common").alias("common_neighbors"),
            F.expr(
                "common * 1000000 div (du + dw - common)"
            ).alias("jaccard_fp"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_fp").desc(), "u", "w"
    ).limit(50).select(
        F.col("u").cast("bigint"),
        F.col("w").cast("bigint"),
        F.col("common_neighbors").cast("bigint"),
        F.col("jaccard_fp").cast("bigint"),
    )


_SPAN_W = 32  # byte window length
_SPAN_STRIDE = 8


@register(
    "docs_dup_substring_spans",
    f"""
    WITH w AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE length(text) >= {_SPAN_W}),
    wins AS (
      SELECT doc_id, CAST(g.i AS BIGINT) * {_SPAN_STRIDE} AS start,
             md5(substr(text, CAST(g.i AS INT) * {_SPAN_STRIDE} + 1,
                        {_SPAN_W})) AS h
      FROM w, UNNEST(range((n - {_SPAN_W}) // {_SPAN_STRIDE} + 1)) AS g(i)),
    dfreq AS (
      SELECT h, COUNT(DISTINCT doc_id) AS df FROM wins GROUP BY h),
    flagged AS (
      SELECT wi.doc_id, wi.start, wi.start + {_SPAN_W} AS fin
      FROM wins wi JOIN dfreq USING (h) WHERE dfreq.df >= 2),
    runmax AS (
      SELECT doc_id, start, fin,
             MAX(fin) OVER (PARTITION BY doc_id ORDER BY start, fin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
      FROM flagged),
    islanded AS (
      SELECT doc_id, start, fin,
             SUM(CASE WHEN prev_max IS NULL OR start > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start, fin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM runmax),
    spans AS (
      SELECT doc_id, island,
             MIN(start) AS s0, MAX(fin) AS s1
      FROM islanded GROUP BY doc_id, island),
    per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_spans,
             SUM(s1 - s0) AS dup_bytes
      FROM spans GROUP BY doc_id)
    SELECT w.doc_id,
           CAST(w.n AS BIGINT) AS n_bytes,
           CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(p.dup_bytes, 0) AS BIGINT) AS dup_bytes,
           CAST(COALESCE(p.dup_bytes, 0) * 1000000 // w.n AS BIGINT)
             AS dup_ppm
    FROM w LEFT JOIN per_doc p USING (doc_id)
    """,
)
def docs_dup_substring_spans(spark: SparkSession, sf_dir: str):
    """Exact-substring duplicate spans (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" recipe, windowed): hash
    32-byte windows at stride 8 per document, flag windows whose hash
    appears in >= 2 documents, and merge overlapping flagged windows
    into maximal duplicated SPANS via the gaps-and-islands running-max
    (the events_active_streaks pattern at byte granularity). Per doc:
    span count, duplicated bytes (overlap-merged), duplicated fraction
    in exact ppm. Unlike word-shingle boilerplate share this is
    byte-exact and span-resolving — the input a surgical span-removal
    pass consumes. Scale shape: window volume is n_bytes/stride rows
    (one groupBy on the hash, one doc-partitioned island window);
    cross-doc duplicate mass, not corpus size, drives the flagged
    volume. Suffix-array exactness for arbitrary lengths trades here
    for two fixed knobs (w=32, stride=8) that keep everything one scan
    + two exchanges."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "text", F.length("text").alias("n")
    ).filter(F.col("n") >= _SPAN_W)
    wins = w.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.expr(f"(n - {_SPAN_W}) div {_SPAN_STRIDE}"),
                ),
                lambda i: F.md5(
                    F.substring(
                        F.col("text"), (i * _SPAN_STRIDE + 1).cast("int"), _SPAN_W
                    )
                ),
            )
        ).alias("widx", "h"),
    ).select(
        "doc_id",
        (F.col("widx").cast("bigint") * _SPAN_STRIDE).alias("start"),
        "h",
    )
    dfreq = wins.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    flagged = (
        wins.join(dfreq, "h")
        .filter(F.col("df") >= 2)
        .select(
            "doc_id", "start", (F.col("start") + _SPAN_W).alias("fin")
        )
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("start", "fin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("start", "fin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runmax = flagged.select(
        "doc_id",
        "start",
        "fin",
        F.max("fin").over(wprev).alias("prev_max"),
    )
    islanded = runmax.select(
        "doc_id",
        "start",
        "fin",
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("start") > F.col("prev_max")),
                1,
            ).otherwise(0)
        )
        .over(wrun)
        .alias("island"),
    )
    spans = islanded.groupBy("doc_id", "island").agg(
        F.min("start").alias("s0"), F.max("fin").alias("s1")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("s1") - F.col("s0")).alias("dup_bytes"),
    )
    return (
        w.select("doc_id", F.col("n"))
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id"),
            F.col("n").cast("bigint").alias("n_bytes"),
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("bigint")
            .alias("n_spans"),
            F.coalesce(F.col("dup_bytes"), F.lit(0))
            .cast("bigint")
            .alias("dup_bytes"),
            F.expr(
                "CAST(COALESCE(dup_bytes, 0) * 1000000 div n AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


def _langid_confusion_oracle() -> str:
    from .llm_ops import _STOPWORDS_SQL

    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents),
    stop(lang_cand, stopword) AS (VALUES {_STOPWORDS_SQL}),
    hits AS (
      SELECT doc_id, lang_cand, COUNT(*) AS hits
      FROM toks JOIN stop ON token = stopword AND token != ''
      GROUP BY doc_id, lang_cand),
    best AS (
      SELECT doc_id, lang_cand AS predicted_lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang_cand) AS rn
      FROM hits),
    pred AS (
      SELECT d.doc_id, d.lang AS labeled_lang,
             coalesce(b.predicted_lang, 'und') AS predicted_lang
      FROM documents d LEFT JOIN best b
        ON b.doc_id = d.doc_id AND b.rn = 1),
    cm AS (
      SELECT labeled_lang, predicted_lang, COUNT(*) AS n
      FROM pred GROUP BY labeled_lang, predicted_lang),
    tot AS (
      SELECT labeled_lang, SUM(n) AS label_total FROM cm
      GROUP BY labeled_lang)
    SELECT cm.labeled_lang, cm.predicted_lang,
           CAST(cm.n AS BIGINT) AS n,
           CAST(cm.n * 1000000 // tot.label_total AS BIGINT) AS share_ppm
    FROM cm JOIN tot USING (labeled_lang)
    """


@register("docs_langid_confusion", _langid_confusion_oracle())
def docs_langid_confusion(spark: SparkSession, sf_dir: str):
    """Language-ID confusion matrix — the EVALUATION harness for the
    stopword-hit lang-id heuristic (llm/text.py language_id) against the
    corpus's labeled `lang` column: per (labeled, predicted) cell, count
    and within-label share in exact ppm. This is the accuracy report a
    curation pipeline reads before trusting the classifier to route or
    filter by language at 100 TB; cells are |langs|² bounded regardless
    of corpus size, and the prediction reuses the broadcast-stopword
    argmax (one token-hash exchange + a doc-grain window)."""
    from ..llm.text import language_id

    d = t(spark, sf_dir, "documents")
    pred = language_id(d, "text", "doc_id").select(
        "doc_id", "predicted_lang"
    )
    cm = (
        d.select("doc_id", F.col("lang").alias("labeled_lang"))
        .join(pred, "doc_id")
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    tot = cm.groupBy("labeled_lang").agg(
        F.sum("n").alias("label_total")
    )
    return cm.join(tot, "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        F.col("n").cast("bigint"),
        F.expr("CAST(n * 1000000 div label_total AS BIGINT)").alias(
            "share_ppm"
        ),
    )


_SRM_CRIT_FP = 3841459  # chi-square df=1 critical value at alpha=0.05, 1e6 fp


@register(
    "events_ab_srm_check",
    f"""
    WITH users AS (
      SELECT DISTINCT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS arm
      FROM events),
    counts AS (
      SELECT
        COUNT(*) AS n,
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS arm_a,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS arm_b
      FROM users)
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(arm_a AS BIGINT) AS arm_a,
           CAST(arm_b AS BIGINT) AS arm_b,
           CAST((arm_a - arm_b) * (arm_a - arm_b) * 1000000 // n AS BIGINT)
             AS chi2_fp,
           CAST(CASE WHEN (arm_a - arm_b) * (arm_a - arm_b) * 1000000 // n
                          > {_SRM_CRIT_FP} THEN 1 ELSE 0 END AS INT)
             AS srm_flag
    FROM counts
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str):
    """Sample-ratio-mismatch (SRM) check — the first gate every A/B
    readout must pass before CUPED/DiD analysis is trusted (a biased
    randomizer invalidates everything downstream): users are assigned to
    arms by the same deterministic md5 hash the experimentation ops use,
    and the 50/50 chi-square statistic collapses to (a-b)²/n for df=1 —
    computed in exact 1e6 fixed point and compared against the 3.84
    critical value as integers. One distinct + one scalar aggregate; the
    flag rides with the evidence (counts), not instead of it."""
    ev = t(spark, sf_dir, "events")
    users = (
        ev.select("user_id")
        .distinct()
        .select("user_id", (_h60(F.col("user_id")) % 2).alias("arm"))
    )
    counts = users.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("arm_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("arm_b"),
    )
    chi2 = "(arm_a - arm_b) * (arm_a - arm_b) * 1000000 div n"
    return counts.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("arm_a").cast("bigint"),
        F.col("arm_b").cast("bigint"),
        F.expr(f"CAST({chi2} AS BIGINT)").alias("chi2_fp"),
        F.expr(
            f"CAST(CASE WHEN {chi2} > {_SRM_CRIT_FP} THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("srm_flag"),
    )


@register(
    "events_conversion_path_topk",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 3 GROUP BY user_id),
    conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    agg AS (
      SELECT p.path,
             COUNT(*) AS n_users,
             SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_converted
      FROM paths p LEFT JOIN conv c USING (user_id)
      GROUP BY p.path)
    SELECT path,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_converted AS BIGINT) AS n_converted,
           CAST(n_converted * 1000000 // n_users AS BIGINT) AS cv_ppm
    FROM agg
    ORDER BY n_users DESC, path LIMIT 10
    """,
)
def events_conversion_path_topk(spark: SparkSession, sf_dir: str):
    """Top entry paths by user volume with conversion rate — the
    product-analytics path report (the full-journey sibling of the
    Markov transition ops): each user's first THREE events in exact
    (ts, event_id) order form the entry path; conversion = the user ever
    purchases. One user_id exchange for the window + path assembly
    (bounded: 3 rows per user), a semi-join-shaped flag, a path-grain
    aggregate (|types|³ bounded), TakeOrdered top-10. Exact ppm
    conversion rates."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = ordered.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    agg = (
        paths.join(conv, "user_id", "left")
        .groupBy("path")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0))).alias(
                "n_converted"
            ),
        )
    )
    return (
        agg.select(
            "path",
            F.col("n_users").cast("bigint"),
            F.col("n_converted").cast("bigint"),
            F.expr("CAST(n_converted * 1000000 div n_users AS BIGINT)").alias(
                "cv_ppm"
            ),
        )
        .orderBy(F.col("n_users").desc(), "path")
        .limit(10)
    )


@register(
    "graph_modularity_communities",
    f"""
    WITH {_COPURCHASE_CTES},
    m AS (SELECT COUNT(*) AS m_edges FROM edges),
    intra AS (
      SELECT COUNT(*) AS e_intra_total,
             COUNT(DISTINCT ru.label) AS n_comm_with_edges
      FROM edges e
      JOIN r2 ru ON ru.node = e.u
      JOIN r2 rv ON rv.node = e.v
      WHERE ru.label = rv.label),
    degc AS (
      SELECT r2.label, COUNT(*) AS deg_c
      FROM und JOIN r2 ON r2.node = und.u
      GROUP BY r2.label),
    ec AS (
      SELECT ru.label, COUNT(*) AS e_c
      FROM edges e
      JOIN r2 ru ON ru.node = e.u
      JOIN r2 rv ON rv.node = e.v
      WHERE ru.label = rv.label
      GROUP BY ru.label),
    terms AS (
      SELECT d.label,
             4 * m.m_edges * COALESCE(ec.e_c, 0)
               - d.deg_c * d.deg_c AS q_num_c
      FROM degc d LEFT JOIN ec USING (label) CROSS JOIN m),
    q AS (SELECT SUM(q_num_c) AS q_num, COUNT(*) AS n_communities
          FROM terms)
    SELECT CAST(m.m_edges AS BIGINT) AS m_edges,
           CAST(q.n_communities AS BIGINT) AS n_communities,
           CAST(intra.e_intra_total AS BIGINT) AS intra_edges,
           CAST(((q.q_num * 1000000)
                 - ((((q.q_num * 1000000) % (4 * m.m_edges * m.m_edges))
                     + (4 * m.m_edges * m.m_edges))
                    % (4 * m.m_edges * m.m_edges)))
                // (4 * m.m_edges * m.m_edges) AS BIGINT) AS modularity_fp
    FROM q, m, intra
    """,
)
def graph_modularity_communities(spark: SparkSession, sf_dir: str):
    """Newman modularity Q of the min-label communities — the EVALUATION
    metric for graph_label_propagation (is the partition better than
    random?): Q = Σ_c [e_c/m − (deg_c/2m)²], assembled EXACTLY as
    Q_num = Σ_c (4·m·e_c − deg_c²) over integer community aggregates and
    floored once at 1e6 scale over 4m² (floor-div construction — Q can
    be negative). Plan: the shared co-purchase CTE chain, one
    intra-community edge count (edge list joined twice to the bounded
    label table), one degree rollup — community grain everywhere after
    the edge join. At 100 TB the label table join is the cost; both
    sides key on node id."""
    from pyspark import StorageLevel

    edges, _und, r2 = _copurchase_labels(spark, sf_dir)
    ru = r2.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    rv = r2.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    # ONE labeled edge table feeds every aggregate below (m, intra, e_c,
    # deg_c) — persisting it avoids re-running the edge+label joins per
    # branch; deg_c comes from the two endpoint projections, not a
    # separate und join (each edge adds 1 to both endpoint labels).
    labeled_edges = edges.join(ru, "u").join(rv, "v").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    m = labeled_edges.agg(F.count("*").alias("m_edges"))
    intra_edges = labeled_edges.filter(F.col("lu") == F.col("lv"))
    intra = intra_edges.agg(
        F.count("*").alias("e_intra_total"),
        F.countDistinct("lu").alias("n_comm_with_edges"),
    )
    degc = (
        labeled_edges.select(F.col("lu").alias("label"))
        .unionAll(labeled_edges.select(F.col("lv").alias("label")))
        .groupBy("label")
        .agg(F.count("*").alias("deg_c"))
    )
    ec = (
        intra_edges.groupBy(F.col("lu").alias("label"))
        .agg(F.count("*").alias("e_c"))
    )
    terms = (
        degc.join(ec, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            (
                4 * F.col("m_edges") * F.coalesce(F.col("e_c"), F.lit(0))
                - F.col("deg_c") * F.col("deg_c")
            ).alias("q_num_c")
        )
    )
    q = terms.agg(
        F.sum("q_num_c").alias("q_num"),
        F.count("*").alias("n_communities"),
    )
    d = "(4 * m_edges * m_edges)"
    x = "(q_num * 1000000)"
    return (
        q.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(intra))
        .select(
            F.col("m_edges").cast("bigint"),
            F.col("n_communities").cast("bigint"),
            F.col("e_intra_total").cast("bigint").alias("intra_edges"),
            F.expr(
                f"CAST((({x}) - (((({x}) % {d}) + {d}) % {d})) div {d}"
                " AS BIGINT)"
            ).alias("modularity_fp"),
        )
    )


@register(
    "events_dau_mau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    mau AS (
      SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - INTERVAL 29 DAY AND d.day
      GROUP BY d.day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(dau.dau * 1000000 // mau.mau AS BIGINT) AS stickiness_ppm
    FROM days d JOIN dau USING (day) JOIN mau USING (day)
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str):
    """DAU/MAU stickiness curve — the product-health headline metric:
    per calendar day, distinct daily actives over distinct trailing-30d
    actives, in exact ppm. Follows the events_rolling_wau collapse
    pattern: the fact table collapses to (user, day) grain FIRST (one
    map-side-combinable distinct), and the trailing window is a
    day-spine × user-day range join — volume is user-days × 30, never
    events × 30; the day spine broadcasts. The exact distinct in the
    trailing window is the honest form; at extreme scale the HLL-merge
    op (sketch_hll_daily_merge) is the documented approximate swap."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    d2 = days.select(F.col("day").alias("anchor"))
    mau = (
        d2.join(
            ud,
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 29)),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("mau"))
        .withColumnRenamed("anchor", "day")
    )
    return (
        days.join(dau, "day")
        .join(mau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint"),
            F.col("mau").cast("bigint"),
            F.expr("CAST(dau * 1000000 div mau AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
    )


_SLO_BUDGET_PPM = 200000  # 20% error budget
_SLO_BURN_PPM = 240000  # alert when BOTH windows burn at >= 1.2x budget


@register(
    "events_slo_burn_alerts",
    f"""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
      FROM events GROUP BY 1),
    windowed AS (
      SELECT hour, n, errs,
             SUM(n) OVER (ORDER BY hour
                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n6,
             SUM(errs) OVER (ORDER BY hour
                             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS e6
      FROM hours)
    SELECT CAST(hour AS TIMESTAMP) AS hour,
           CAST(n AS BIGINT) AS n_1h,
           CAST(errs * 1000000 // n AS BIGINT) AS err_ppm_1h,
           CAST(n6 AS BIGINT) AS n_6h,
           CAST(e6 * 1000000 // n6 AS BIGINT) AS err_ppm_6h,
           CAST(CASE WHEN errs * 1000000 // n >= {_SLO_BURN_PPM}
                      AND e6 * 1000000 // n6 >= {_SLO_BURN_PPM}
                     THEN 1 ELSE 0 END AS INT) AS burn_alert
    FROM windowed
    """,
)
def events_slo_burn_alerts(spark: SparkSession, sf_dir: str):
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    recipe): per hour, the error share over the short (1h) and long (6h
    trailing) windows in exact ppm, alerting only when BOTH exceed 1.2x
    the 20% error budget — short window for responsiveness, long window
    to suppress blips. Hour-grain input (one map-side-combinable
    groupBy); the trailing frame runs over the bounded hour series (the
    orders_backlog_sweepline whitelist class — calendar-hour grain, not
    fact rows). Exact integer ppm; the alert flag is an integer
    comparison, reproducible to the row across engines."""
    ev = t(spark, sf_dir, "events")
    hours = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("errs"),
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    windowed = hours.select(
        "hour",
        "n",
        "errs",
        F.sum("n").over(w6).alias("n6"),
        F.sum("errs").over(w6).alias("e6"),
    )
    short = "errs * 1000000 div n"
    long6 = "e6 * 1000000 div n6"
    return windowed.select(
        F.col("hour").cast("timestamp"),
        F.col("n").cast("bigint").alias("n_1h"),
        F.expr(f"CAST({short} AS BIGINT)").alias("err_ppm_1h"),
        F.col("n6").cast("bigint").alias("n_6h"),
        F.expr(f"CAST({long6} AS BIGINT)").alias("err_ppm_6h"),
        F.expr(
            f"CAST(CASE WHEN {short} >= {_SLO_BURN_PPM}"
            f" AND {long6} >= {_SLO_BURN_PPM}"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("burn_alert"),
    )


@register(
    "events_fano_burstiness",
    """
    WITH spine AS (
      SELECT t.event_type, h.hour
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT DISTINCT date_trunc('hour', ts) AS hour
                  FROM events) h),
    counts AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    grid AS (
      SELECT s.event_type, COALESCE(c.c, 0) AS c
      FROM spine s LEFT JOIN counts c
        ON c.event_type = s.event_type AND c.hour = s.hour),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(c) AS s1,
             SUM(c * c) AS s2
      FROM grid GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(s1 AS BIGINT) AS n_events,
           CAST((n * s2 - s1 * s1) * 1000000 // (n * s1) AS BIGINT)
             AS fano_fp
    FROM m
    """,
)
def events_fano_burstiness(spark: SparkSession, sf_dir: str):
    """Fano factor (variance-to-mean ratio of hourly counts, zero hours
    included) per event type — the burstiness/overdispersion test: 1e6
    means Poisson-like arrivals, above means bursty, below means
    regular. Var/mean collapses to (n·Σc² − (Σc)²)/(n·Σc) — one exact
    integer expression over per-type moments, no float variance. The
    zero-filled grid is |types| × |hours| (bounded calendar grain); the
    only full-data pass is the (type, hour) count. The dispersion
    sibling of events_type_diversity_simpson and the screen read before
    choosing the anomaly detector (z-score assumes the variance this op
    measures)."""
    ev = t(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    hours = ev.select(F.date_trunc("hour", "ts").alias("hour")).distinct()
    spine = types.crossJoin(hours)
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("c"))
    grid = spine.join(counts, ["event_type", "hour"], "left").select(
        "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    m = grid.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        F.col("s1").cast("bigint").alias("n_events"),
        F.expr(
            "CAST((n * s2 - s1 * s1) * 1000000 div (n * s1) AS BIGINT)"
        ).alias("fano_fp"),
    )


@register(
    "docs_zipf_rank_freq",
    """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
        AS token
      FROM documents),
    freq AS (
      SELECT token, COUNT(*) AS f FROM toks
      WHERE token != '' GROUP BY token),
    top AS (
      SELECT token, f FROM freq ORDER BY f DESC, token LIMIT 50),
    ranked AS (
      SELECT token, f,
             ROW_NUMBER() OVER (ORDER BY f DESC, token) AS rank
      FROM top),
    anchor AS (SELECT MAX(f) AS f1 FROM top)
    SELECT CAST(rank AS BIGINT) AS rank, token, CAST(f AS BIGINT) AS freq,
           CAST(rank * f AS BIGINT) AS zipf_product,
           CAST(rank * f * 1000000 // f1 AS BIGINT) AS zipf_ratio_ppm
    FROM ranked, anchor
    """,
)
def docs_zipf_rank_freq(spark: SparkSession, sf_dir: str):
    """Zipf's-law rank-frequency profile of the corpus vocabulary: the
    top-50 tokens with rank, frequency, and the Zipf invariant rank×freq
    (plus its ratio to the rank-1 frequency in exact ppm — constant ≈1e6
    under a perfect Zipf fit, no log-log regression and no floats). The
    corpus-linguistics screen next to Heaps'-law vocabulary growth: a
    corpus whose product curve collapses is boilerplate-heavy; one whose
    curve explodes is vocabulary-anomalous. Scale shape: one token
    groupBy (map-side combinable), global top-50 via TakeOrdered —
    the rank window runs AFTER the 50-row truncation (bounded,
    whitelisted), so the full vocabulary is never globally sorted."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    ).filter(F.col("token") != "")
    freq = toks.groupBy("token").agg(F.count("*").alias("f"))
    top = freq.orderBy(F.col("f").desc(), "token").limit(50)
    w = Window.orderBy(F.col("f").desc(), "token")
    ranked = top.select(
        "token", "f", F.row_number().over(w).alias("rank")
    )
    anchor = top.agg(F.max("f").alias("f1"))
    return ranked.crossJoin(F.broadcast(anchor)).select(
        F.col("rank").cast("bigint"),
        "token",
        F.col("f").cast("bigint").alias("freq"),
        (F.col("rank") * F.col("f")).cast("bigint").alias("zipf_product"),
        F.expr("CAST(rank * f * 1000000 div f1 AS BIGINT)").alias(
            "zipf_ratio_ppm"
        ),
    )


@register(
    "nation_trade_balance",
    """
    WITH flows AS (
      SELECT ns.n_name AS exporter, nc.n_name AS importer,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                      AS BIGINT)
                 * (100 - CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100
                               AS BIGINT)))
               AS rev_c4
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      WHERE ns.n_name != nc.n_name
      GROUP BY ns.n_name, nc.n_name)
    SELECT a.exporter AS nation_a, a.importer AS nation_b,
           CAST(a.rev_c4 AS BIGINT) AS export_c4,
           CAST(COALESCE(b.rev_c4, 0) AS BIGINT) AS import_c4,
           CAST(a.rev_c4 - COALESCE(b.rev_c4, 0) AS BIGINT) AS balance_c4
    FROM flows a LEFT JOIN flows b
      ON b.exporter = a.importer AND b.importer = a.exporter
    WHERE a.exporter < a.importer
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str):
    """Bilateral trade-balance matrix — the TPC-H Q7 volume-shipping
    shape completed into a full netting report: revenue flowing from
    supplier nation (exporter) to customer nation (importer) per ordered
    pair, then each unordered pair nets export minus import. Revenue is
    exact: extendedprice cents × (100 − discount-percent) as BIGINT
    (scale 1e4 'c4' units — no decimal multiplication drift). Plan: the
    standard fact scan with two broadcast nation dims + supplier/
    customer key joins, one |nations|²-bounded flow aggregate, and a
    self-join of the tiny flow matrix for the netting. At 100 TB only
    the fact scan grows."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("exporter")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("importer")
    )
    # cents FIRST (integral decimal -> exact BIGINT), then pure integer
    # multiply: a fractional decimal->BIGINT cast would round in DuckDB
    # but truncate in Spark
    rev = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))"
    )
    flows = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("exporter") != F.col("importer"))
        .groupBy("exporter", "importer")
        .agg(F.sum(rev).alias("rev_c4"))
    )
    back = flows.select(
        F.col("exporter").alias("importer_b"),
        F.col("importer").alias("exporter_b"),
        F.col("rev_c4").alias("rev_back"),
    )
    return (
        flows.join(
            back,
            (flows.exporter == back.exporter_b)
            & (flows.importer == back.importer_b),
            "left",
        )
        .filter(F.col("exporter") < F.col("importer"))
        .select(
            F.col("exporter").alias("nation_a"),
            F.col("importer").alias("nation_b"),
            F.col("rev_c4").cast("bigint").alias("export_c4"),
            F.coalesce(F.col("rev_back"), F.lit(0))
            .cast("bigint")
            .alias("import_c4"),
            (F.col("rev_c4") - F.coalesce(F.col("rev_back"), F.lit(0)))
            .cast("bigint")
            .alias("balance_c4"),
        )
    )


_GAP_BUCKETS_US = [
    60_000_000,  # 1 min
    600_000_000,  # 10 min
    3_600_000_000,  # 1 h
    21_600_000_000,  # 6 h
    86_400_000_000,  # 1 d
]


@register(
    "events_interpurchase_profile",
    f"""
    WITH purchases AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id
      FROM events WHERE event_type = 'purchase'),
    gaps AS (
      SELECT user_id,
             t_us - LAG(t_us) OVER (PARTITION BY user_id
                                    ORDER BY t_us, event_id) AS gap_us
      FROM purchases),
    g AS (SELECT gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_gaps,
      CAST(SUM(gap_us) // COUNT(*) AS BIGINT) AS mean_gap_us,
      CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
      CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
      CAST(SUM(CASE WHEN gap_us < {_GAP_BUCKETS_US[0]} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lt_1m,
      CAST(SUM(CASE WHEN gap_us < {_GAP_BUCKETS_US[1]} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lt_10m,
      CAST(SUM(CASE WHEN gap_us < {_GAP_BUCKETS_US[2]} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lt_1h,
      CAST(SUM(CASE WHEN gap_us < {_GAP_BUCKETS_US[3]} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lt_6h,
      CAST(SUM(CASE WHEN gap_us < {_GAP_BUCKETS_US[4]} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lt_1d
    FROM g
    """,
)
def events_interpurchase_profile(spark: SparkSession, sf_dir: str):
    """Inter-purchase time profile — the repeat-behavior input to CLV
    and replenishment models: per-user consecutive purchase gaps (one
    user_id exchange, lag over the exact (t_us, event_id) order) rolled
    into a corpus profile of exact integers — mean/min/max gap in micros
    and a cumulative lt-threshold histogram (1m/10m/1h/6h/1d). No
    percentile window over the near-continuous gap domain: the fixed
    cumulative histogram is the scale-stable summary (the
    order_to_ship_latency_profile's exact-percentile machinery is the
    documented swap when exact quantiles are required)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("t_us"), "event_id"
    )
    gaps = purchases.select(
        (F.col("t_us") - F.lag("t_us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    aggs = [
        F.count("*").cast("bigint").alias("n_gaps"),
        F.expr("CAST(SUM(gap_us) div COUNT(*) AS BIGINT)").alias(
            "mean_gap_us"
        ),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    ]
    names = ["n_lt_1m", "n_lt_10m", "n_lt_1h", "n_lt_6h", "n_lt_1d"]
    for nm, cut in zip(names, _GAP_BUCKETS_US):
        aggs.append(
            F.sum(F.when(F.col("gap_us") < cut, 1).otherwise(0))
            .cast("bigint")
            .alias(nm)
        )
    return gaps.agg(*aggs)


_NORM_BUCKET = 500_000  # norm² fixed-point bucket width (1e3-scale coords)


@register(
    "emb_norm_profile",
    f"""
    WITH q AS (
      SELECT vec_id,
             SUM(CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000)
                      AS BIGINT)
                 * CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000)
                        AS BIGINT)) AS norm2
      FROM embeddings, UNNEST(range(len(embedding))) AS u(i)
      GROUP BY vec_id),
    m AS (
      SELECT COUNT(*) AS n, SUM(norm2) AS s1,
             MIN(norm2) AS mn, MAX(norm2) AS mx
      FROM q),
    hist AS (
      SELECT norm2 // {_NORM_BUCKET} AS bucket, COUNT(*) AS n_vecs
      FROM q GROUP BY 1)
    SELECT CAST(h.bucket AS BIGINT) AS bucket,
           CAST(h.bucket * {_NORM_BUCKET} AS BIGINT) AS norm2_lo,
           CAST(h.n_vecs AS BIGINT) AS n_vecs,
           CAST(h.n_vecs * 1000000 // m.n AS BIGINT) AS share_ppm,
           CAST(m.s1 // m.n AS BIGINT) AS corpus_mean_norm2,
           CAST(m.mn AS BIGINT) AS corpus_min_norm2,
           CAST(m.mx AS BIGINT) AS corpus_max_norm2
    FROM hist h, m
    """,
)
def emb_norm_profile(spark: SparkSession, sf_dir: str):
    """Embedding norm distribution profile — the normalization audit
    read before ANY cosine/IP index decision (un-normalized vectors make
    inner-product and cosine retrieval disagree; a wide norm spread
    under IP indexing biases toward long vectors): per-vector ||q||² in
    exact 1e3-fixed-point integers (no sqrt anywhere), a fixed-width
    histogram of norm², and corpus mean/min/max riding on every row.
    One scan builds per-vector norms (map-side d-element fold), the
    histogram is bucket-grain. Complements emb_dim_variance_profile
    (per-dimension health) with the per-vector view."""
    e = t(spark, sf_dir, "embeddings")
    qv = F.round(F.col("v") * 1000).cast("bigint")
    q = (
        e.select(
            "vec_id",
            F.explode(F.col("embedding").cast("array<double>")).alias("v"),
        )
        .select("vec_id", (qv * qv).alias("sq"))
        .groupBy("vec_id")
        .agg(F.sum("sq").alias("norm2"))
    )
    m = q.agg(
        F.count("*").alias("n"),
        F.sum("norm2").alias("s1"),
        F.min("norm2").alias("mn"),
        F.max("norm2").alias("mx"),
    )
    hist = q.groupBy(
        F.expr(f"norm2 div {_NORM_BUCKET}").alias("bucket")
    ).agg(F.count("*").alias("n_vecs"))
    return hist.crossJoin(F.broadcast(m)).select(
        F.col("bucket").cast("bigint"),
        (F.col("bucket") * _NORM_BUCKET).cast("bigint").alias("norm2_lo"),
        F.col("n_vecs").cast("bigint"),
        F.expr("CAST(n_vecs * 1000000 div n AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(s1 div n AS BIGINT)").alias("corpus_mean_norm2"),
        F.col("mn").cast("bigint").alias("corpus_min_norm2"),
        F.col("mx").cast("bigint").alias("corpus_max_norm2"),
    )


@register(
    "docs_heaps_hapax_curve",
    """
    WITH mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
    toks AS (
      SELECT LEAST(CAST(doc_id * 10 // m AS BIGINT), 9) AS slice,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
               AS token
      FROM documents, mx),
    tf AS (
      SELECT token, slice, COUNT(*) AS f FROM toks
      WHERE token != '' GROUP BY token, slice),
    cum AS (
      SELECT token, slice,
             SUM(f) OVER (PARTITION BY token ORDER BY slice
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cf
      FROM tf),
    -- carry each token's cumulative count forward onto every LATER slice
    -- it is absent from: join the token's slice list against the decile
    -- spine taking the last known cf
    spine AS (SELECT unnest(range(10)) AS k),
    latest AS (
      SELECT s.k, c.token, MAX(c.slice) AS last_slice
      FROM spine s JOIN cum c ON c.slice <= s.k
      GROUP BY s.k, c.token),
    state AS (
      SELECT l.k, l.token, c.cf
      FROM latest l JOIN cum c
        ON c.token = l.token AND c.slice = l.last_slice),
    curve AS (
      SELECT k,
             COUNT(*) AS vocab_cum,
             SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS hapax_cum,
             SUM(cf) AS tokens_cum
      FROM state GROUP BY k)
    SELECT CAST(k AS INT) AS decile,
           CAST(tokens_cum AS BIGINT) AS tokens_cum,
           CAST(vocab_cum AS BIGINT) AS vocab_cum,
           CAST(hapax_cum AS BIGINT) AS hapax_cum,
           CAST(hapax_cum * 1000000 // vocab_cum AS BIGINT)
             AS hapax_share_ppm
    FROM curve
    """,
)
def docs_heaps_hapax_curve(spark: SparkSession, sf_dir: str):
    """Heaps'-law vocabulary-growth and hapax-legomena curve: for each
    cumulative doc-id decile of the corpus, total tokens, distinct
    vocabulary, hapax count (tokens seen exactly once so far) and hapax
    share in exact ppm — the vocabulary-saturation diagnostic (token-
    level sibling of the shingle novelty-decay curve): a natural corpus
    holds a stable hapax share; a template-heavy one collapses. Plan:
    token×slice partial counts (map-side combinable), a per-token
    cumulative window over <=10 rows, and a spine join that carries each
    token's last-known cumulative count onto later deciles — all
    token-grain, never row-grain, and the spine is 10 literals."""
    d = t(spark, sf_dir, "documents")
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    toks = (
        d.crossJoin(F.broadcast(mx))
        .select(
            F.least(F.expr("CAST(doc_id * 10 div m AS BIGINT)"), F.lit(9))
            .alias("slice"),
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("token", "slice").agg(F.count("*").alias("f"))
    wcum = (
        Window.partitionBy("token")
        .orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = tf.select(
        "token", "slice", F.sum("f").over(wcum).alias("cf")
    )
    spine = spark.range(10).select(F.col("id").alias("k"))
    latest = (
        F.broadcast(spine)
        .join(cum.select("token", "slice"), F.col("slice") <= F.col("k"))
        .groupBy("k", "token")
        .agg(F.max("slice").alias("last_slice"))
    )
    cum2 = cum.select(
        F.col("token").alias("t2"),
        F.col("slice").alias("s2"),
        F.col("cf"),
    )
    state = latest.join(
        cum2,
        (F.col("token") == F.col("t2"))
        & (F.col("last_slice") == F.col("s2")),
    )
    curve = state.groupBy("k").agg(
        F.count("*").alias("vocab_cum"),
        F.sum(F.when(F.col("cf") == 1, 1).otherwise(0)).alias("hapax_cum"),
        F.sum("cf").alias("tokens_cum"),
    )
    return curve.select(
        F.col("k").cast("int").alias("decile"),
        F.col("tokens_cum").cast("bigint"),
        F.col("vocab_cum").cast("bigint"),
        F.col("hapax_cum").cast("bigint"),
        F.expr("CAST(hapax_cum * 1000000 div vocab_cum AS BIGINT)").alias(
            "hapax_share_ppm"
        ),
    )


@register(
    "events_markov_stationary_power",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (
      SELECT event_type AS i, nxt AS j, COUNT(*) AS c
      FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2),
    rowsum AS (SELECT i, SUM(c) AS rs FROM trans GROUP BY i),
    states AS (SELECT i AS state FROM rowsum),
    n_states AS (SELECT COUNT(*) AS ns FROM states),
    v0 AS (
      SELECT state, 1000000 // ns AS v FROM states, n_states),
    v1r AS (
      SELECT t.j AS state, SUM(v0.v * t.c // r.rs) AS v
      FROM trans t JOIN rowsum r ON r.i = t.i
      JOIN v0 ON v0.state = t.i
      GROUP BY t.j),
    v1s AS (SELECT SUM(v) AS tot FROM v1r),
    v1 AS (SELECT state, v * 1000000 // tot AS v FROM v1r, v1s),
    v2r AS (
      SELECT t.j AS state, SUM(v1.v * t.c // r.rs) AS v
      FROM trans t JOIN rowsum r ON r.i = t.i
      JOIN v1 ON v1.state = t.i
      GROUP BY t.j),
    v2s AS (SELECT SUM(v) AS tot FROM v2r),
    v2 AS (SELECT state, v * 1000000 // tot AS v FROM v2r, v2s),
    emp AS (
      SELECT event_type AS state, COUNT(*) AS n FROM events GROUP BY 1),
    empt AS (SELECT SUM(n) AS tot FROM emp)
    SELECT v2.state AS event_type,
           CAST(v2.v AS BIGINT) AS stationary_fp,
           CAST(emp.n * 1000000 // empt.tot AS BIGINT) AS empirical_fp
    FROM v2 JOIN emp ON emp.state = v2.state, empt
    """,
)
def events_markov_stationary_power(spark: SparkSession, sf_dir: str):
    """Stationary distribution of the user-journey Markov chain by TWO
    power iterations v·P from uniform — the steady-state companion to
    the second-order transition model (where do journeys settle?),
    reported next to the raw empirical event-type shares for
    comparison. The transition matrix is |types|²-bounded (one lead()
    pass over the user_id exchange builds it); each iteration is a
    broadcast-sized matrix-vector product in exact integer fixed point
    — per-edge mass v_i·c_ij div rowsum_i (all nonnegative, plain
    truncating div identical in both engines) renormalized to 1e6 after
    each step so truncation cannot drift the total. The same
    fixed-iteration integer-linear-algebra shape as
    emb_top_pc_power_iteration."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = ordered.groupBy(
        F.col("event_type").alias("i"), F.col("nxt").alias("j")
    ).agg(F.count("*").alias("c"))
    rowsum = trans.groupBy("i").agg(F.sum("c").alias("rs"))
    states = rowsum.select(F.col("i").alias("state"))
    ns = states.agg(F.count("*").alias("nsc"))
    v0 = states.crossJoin(F.broadcast(ns)).select(
        "state", F.expr("1000000 div nsc").alias("v")
    )

    def step(v):
        vr = (
            trans.join(rowsum, "i")
            .join(v.withColumnRenamed("state", "i"), "i")
            .groupBy(F.col("j").alias("state"))
            .agg(F.sum(F.expr("v * c div rs")).alias("vraw"))
        )
        tot = vr.agg(F.sum("vraw").alias("tot"))
        return vr.crossJoin(F.broadcast(tot)).select(
            "state", F.expr("vraw * 1000000 div tot").alias("v")
        )

    v2 = step(step(v0))
    emp = ev.groupBy(F.col("event_type").alias("state")).agg(
        F.count("*").alias("n")
    )
    empt = emp.agg(F.sum("n").alias("tot"))
    return (
        v2.join(emp, "state")
        .crossJoin(F.broadcast(empt))
        .select(
            F.col("state").alias("event_type"),
            F.col("v").cast("bigint").alias("stationary_fp"),
            F.expr("CAST(n * 1000000 div tot AS BIGINT)").alias(
                "empirical_fp"
            ),
        )
    )


@register(
    "pyds_stream_events_replay",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
)
def pyds_stream_events_replay(spark: SparkSession, sf_dir: str):
    """Streaming read through the Python DataSource STREAM reader
    (sources/replay_stream.py, ``format("events_replay")``) — the
    missing quadrant of the Python DataSource matrix (batch reader: pdf;
    batch writer: jsonl_manifest; now a streaming source with real
    initialOffset/read/readBetweenOffsets bookkeeping): the events
    parquet replays in deterministic 2000-row micro-batches; foreachBatch
    folds each batch into per-type partial aggregates (count + exact
    cents) that a final Spark aggregation merges — the partial-agg merge
    contract, so the result is independent of batch boundaries. The
    ORACLE aggregates the raw table directly: a full value gate proving
    the custom source delivered every row exactly once across the whole
    offset sequence. The builder also asserts multiple micro-batches
    actually ran (chunk < table size)."""
    from pyspark.sql import types as T

    from ..sources.replay_stream import register_events_replay_source

    register_events_replay_source(spark)
    partials: list[tuple] = []
    n_batches = [0]

    def fold(batch_df, batch_id: int):
        n_batches[0] += 1
        for r in (
            batch_df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("cents").alias("c"),
            )
            .collect()  # bounded: flag-grain cells
        ):
            partials.append((r.event_type, r.n, r.c))

    import pyarrow.parquet as pq

    # scale the micro-batch to the table so the replay spans several
    # batches at EVERY sf (a fixed chunk collapses to one batch when the
    # table is smaller than it — parquet footer read, no Spark job)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    chunk = max(1, n_rows // 4)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("chunk", str(chunk))
        .load()
    )
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="pyds_stream_ckpt_")
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # default trigger: one micro-batch per read() chunk — drain the
        # offset sequence, then stop (availableNow would coalesce the
        # whole replay into a single batch)
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    assert n_batches[0] > 1, "replay must span multiple micro-batches"
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("c", T.LongType()),
        ]
    )
    pdf = spark.createDataFrame(partials, schema)
    return pdf.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("c").cast("bigint").alias("total_cents"),
    )
