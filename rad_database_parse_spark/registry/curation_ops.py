"""Round-5c curation / analytics operators (20): cross-source duplication
matrix, corpus-bigram LM scoring, segmented inverted-index build, Pareto
skyline, calendar densify (date-spine gap fill), last-touch and
time-decay multi-touch attribution, winsorized robust statistics,
count-min-sketch heavy hitters, exact power-of-two EWMA smoothing,
Herfindahl and Gini concentration/inequality indices, multimodal frame
sampling, Observation-API DQ metrics, the Arrow-native (mapInArrow) UDF,
seasonal-naive forecast backtesting, the Benford first-digit screen,
market-basket association rules, the customer survival curve, and
Gini-Simpson event-type diversity.

These close the remaining training-data-curation gaps a 100 TB ingest
pipeline hits that the earlier rounds did not cover: source-provenance
overlap (which crawls mirror each other — the input to priority dedup),
cheap LM-proxy quality scoring (the perplexity-bucket filter without a
model), the retrieval-side index build (segment-sharded posting lists), a
fixed-memory mergeable frequency sketch, and the robust-stats /
attribution / densify / skyline analytics shapes.

Float-parity discipline (registry/__init__.py): money stays DECIMAL until
after aggregation; cross-engine scores are integer fixed-point
(floor(1e6 * p)) so sums are exact; sampling is PRNG-free (md5 of the row
key), identical on any engine, retry, or partitioning.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, t

# ------------------------------------- cross-source duplication matrix
# Word-5-gram shingles; output is the (source_a, source_b) overlap matrix —
# "which crawls duplicate each other", the provenance report that drives
# source-priority dedup ordering.
_XSRC_N = 5


@register(
    "docs_cross_source_overlap",
    f"""
    WITH d AS (SELECT source, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT DISTINCT source,
                 unnest(CASE WHEN len(w) >= {_XSRC_N} THEN
                          list_transform(range(len(w) - {_XSRC_N - 1}),
                            i -> md5(array_to_string(w[i + 1 : i + {_XSRC_N}], ' ')))
                        ELSE [] END) AS gh
          FROM d)
    SELECT a.source AS src_a, b.source AS src_b,
           COUNT(*) AS n_shared_grams
    FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def docs_cross_source_overlap(spark: SparkSession, sf_dir: str):
    """Cross-source duplication matrix: for every pair of ingest sources,
    how many distinct word-5-gram shingles they share — the provenance
    overlap report that tells a curation pipeline which crawls mirror each
    other (and therefore which source to keep in priority dedup). Shingles
    travel as md5 hashes; after the (gh, source) DISTINCT the per-gram
    width is bounded by |sources| (20 here, a few thousand at worst in
    production), so collapsing each gram to its sorted source-set and
    exploding ordered pairs is a bounded-width operation NO MATTER how many
    billions of documents share the gram — the corpus never self-joins at
    row granularity (contrast the naive gram self-join, which is quadratic
    in per-gram doc frequency). One (gh, source) distinct + one gh groupBy
    + one pair groupBy; output is |sources|^2/2 rows at any scale."""
    d = t(spark, sf_dir, "documents")
    # split hoisted to a column (once per row, not once per lambda element)
    dw = d.select("source", F.split("text", " ").alias("w"))
    grams = dw.select(
        "source",
        F.explode(
            F.expr(
                f"""CASE WHEN size(w) >= {_XSRC_N} THEN
                      transform(sequence(0, size(w) - {_XSRC_N}),
                        i -> md5(concat_ws(' ', slice(w, i + 1, {_XSRC_N}))))
                    ELSE array() END"""
            )
        ).alias("gh"),
    ).distinct()
    srcs = (
        grams.groupBy("gh")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") > 1)
    )
    pairs = srcs.select(
        F.explode(
            F.expr(
                """flatten(transform(srcs, (a, i) ->
                     transform(slice(srcs, i + 2, size(srcs)),
                               b -> struct(a AS src_a, b AS src_b))))"""
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    return pairs.groupBy("src_a", "src_b").agg(
        F.count("*").alias("n_shared_grams")
    )


# ------------------------------------------------ corpus-bigram LM score
@register(
    "docs_bigram_lm_score",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id,
                  unnest(CASE WHEN len(w) >= 2 THEN
                           list_transform(range(len(w) - 1),
                             i -> {'w1': w[i + 1], 'w2': w[i + 2]})
                         ELSE [] END, recursive := true)
           FROM d),
    c1 AS (SELECT word, COUNT(*) AS c1
           FROM (SELECT unnest(w) AS word FROM d) GROUP BY word),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    j AS (SELECT bg.doc_id,
                 CAST(floor(1000000.0 * c12.c12 / c1.c1) AS BIGINT) AS fp
          FROM bg JOIN c12 USING (w1, w2) JOIN c1 ON bg.w1 = c1.word)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(fp) AS BIGINT) AS sum_fp,
           CAST(floor(CAST(SUM(fp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_fp
    FROM j GROUP BY doc_id
    """,
)
def docs_bigram_lm_score(spark: SparkSession, sf_dir: str):
    """Perplexity-bucket quality filter without a model: score each doc by
    the average corpus-bigram transition probability p(w2|w1) =
    c(w1,w2)/c(w1), trained on the corpus itself in the same job. Two
    groupBys build the LM (bigram + unigram counts over the vocabulary —
    at most |V|^2 rows, megabytes even for a 1M-word vocab), which is then
    BROADCAST back onto the doc-bigram stream: the 100 TB corpus is
    scanned twice but never shuffled by anything wider than the tiny count
    tables. Probabilities cross the engine boundary as integer fixed-point
    floor(1e6*p) — sums stay exact, and the one terminal division is
    floor()ed — so the oracle hash-compares bit-identically (the policy of
    registry/__init__.py's float-parity note). A doc whose avg_fp lands in
    the bottom bucket is the one a curation funnel drops first."""
    d = t(spark, sf_dir, "documents")
    # hoist the split into a projected column: inlining split(text) in the
    # transform lambda re-evaluates it per element (O(words^2) per doc,
    # measured 2x the query wall at sf0.1); as a column it runs once per row
    dw = d.select("doc_id", F.split("text", " ").alias("w"))
    bg = dw.select(
        "doc_id",
        F.explode(
            F.expr(
                """CASE WHEN size(w) >= 2 THEN
                      transform(sequence(0, size(w) - 2),
                        i -> struct(element_at(w, i + 1) AS w1,
                                    element_at(w, i + 2) AS w2))
                    ELSE array() END"""
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c1 = (
        dw.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c1"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    j = bg.join(F.broadcast(c12), ["w1", "w2"]).join(
        F.broadcast(c1), bg["w1"] == c1["word"]
    )
    j = j.select(
        "doc_id",
        F.floor(F.lit(1000000.0) * F.col("c12") / F.col("c1"))
        .cast("bigint")
        .alias("fp"),
    )
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("fp").cast("bigint").alias("sum_fp"),
        F.floor(dbl(F.sum("fp")) / F.count("*")).cast("bigint").alias("avg_fp"),
    )


# ------------------------------------ segmented inverted-index build
# Posting lists sharded by doc_id segment: per-(token, segment) cells are
# bounded at _IDX_SEG ids regardless of token frequency, so the build never
# materializes an unbounded collect_list.
_IDX_SEG = 256


@register(
    "docs_inverted_index_segments",
    f"""
    WITH tok AS (SELECT DISTINCT doc_id,
                        unnest(string_split(text, ' ')) AS token
                 FROM documents),
    seg AS (SELECT token, doc_id // {_IDX_SEG} AS seg, doc_id FROM tok),
    cells AS (SELECT token, seg,
                     COUNT(*) AS seg_n,
                     md5(array_to_string(list_sort(list(doc_id)), ','))
                       AS seg_md5
              FROM seg GROUP BY token, seg)
    SELECT token, seg, seg_n,
           CAST(SUM(seg_n) OVER (PARTITION BY token) AS BIGINT) AS df,
           seg_md5
    FROM cells
    """,
)
def docs_inverted_index_segments(spark: SparkSession, sf_dir: str):
    """Distributed inverted-index build, the retrieval-side primitive a
    corpus engine feeds to BM25/search: per (token, doc_id-segment) cell,
    the sorted posting list (carried as an md5 of the comma-joined ids — a
    full-content integrity gate without shipping arrays), the segment
    posting count, and the token's global document frequency via a window
    sum over its segments. Sharding postings by doc_id // 256 is the load-
    bearing scale decision: a stop-word token at 100 TB has billions of
    postings, so a naive groupBy(token) + collect_list OOMs one reducer —
    segment cells are bounded at 256 ids each, the (token, seg) groupBy
    skew-splits the hot token across reducers, and readers merge segments
    in seg order (they are already doc_id-disjoint and internally sorted).
    The df window per token runs over segment counts, not postings."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    cells = (
        tok.withColumn("seg", F.floor(F.col("doc_id") / _IDX_SEG))
        .groupBy("token", "seg")
        .agg(
            F.count("*").alias("seg_n"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(sort_array(collect_list(doc_id)),"
                        " x -> cast(x AS STRING))"
                    ),
                    ",",
                )
            ).alias("seg_md5"),
        )
    )
    w = Window.partitionBy("token")
    return cells.select(
        "token",
        "seg",
        "seg_n",
        F.sum("seg_n").over(w).cast("bigint").alias("df"),
        "seg_md5",
    )


# --------------------------------------------------- Pareto skyline (2-D)
@register(
    "part_skyline_pareto",
    """
    WITH pp AS (SELECT p_retailprice AS pr, MIN(p_size) AS msize
                FROM part GROUP BY p_retailprice),
    pw AS (SELECT pr, msize,
                  MIN(msize) OVER (ORDER BY pr
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS prev_min
           FROM pp)
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN pw ON p.p_retailprice = pw.pr
    WHERE NOT (COALESCE(pw.prev_min <= p.p_size, FALSE)
               OR pw.msize < p.p_size)
    """,
)
def part_skyline_pareto(spark: SparkSession, sf_dir: str):
    """Skyline (Pareto-frontier) operator: parts not dominated on
    (p_retailprice low, p_size low) — dominated means some other part is <=
    on both axes and < on at least one. The naive formulation is an O(N^2)
    self-join; the 2-D sort-based identity reduces it to (a) one groupBy to
    min-size per DISTINCT price, (b) one running-min window over the
    distinct-price table (tiny — |distinct prices|, not |rows|: the only
    single-partition step, over thousands of rows at any corpus size), and
    (c) one broadcast join back to the fact rows as a scan-local dominance
    predicate: dominated iff a strictly-cheaper price saw size <= s, or the
    same price saw size < s. Ties on both axes survive (non-strict
    domination needs one strict edge), matching the standard skyline
    definition."""
    from ..operators.core import skyline_2d

    p = t(spark, sf_dir, "part")
    return skyline_2d(p, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


# ------------------------------------------- calendar densify (gap fill)
@register(
    "orders_calendar_densify",
    """
    WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS dmin,
                      CAST(MAX(o_orderdate) AS DATE) AS dmax
               FROM orders),
    spine AS (SELECT CAST(unnest(generate_series(dmin, dmax,
                                                 INTERVAL 1 DAY)) AS DATE)
                       AS day
              FROM b),
    dims AS (SELECT DISTINCT o_orderpriority FROM orders),
    daily AS (SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
                     SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev,
                     COUNT(*) AS n
              FROM orders GROUP BY 1, 2)
    SELECT strftime(s.day, '%Y-%m-%d') AS day, d.o_orderpriority,
           CAST(COALESCE(daily.rev, 0) AS DOUBLE) AS revenue,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders
    FROM spine s CROSS JOIN dims d
    LEFT JOIN daily ON daily.day = s.day
                   AND daily.o_orderpriority = d.o_orderpriority
    """,
)
def orders_calendar_densify(spark: SparkSession, sf_dir: str):
    """Time-series densify: zero-fill every (day, priority) cell of the
    daily-revenue grid so downstream rolling windows see a gapless series
    (the resample-to-calendar primitive; events_resample_ffill is the
    forward-fill sibling). The date spine is generated with sequence()
    from the global min/max — a 1-row broadcast aggregate — and
    cross-joined with the distinct dims: both sides are tiny (days x
    priorities), so the only full-data pass is the one daily groupBy; the
    spine LEFT JOIN is a broadcast of the grid against the aggregated (not
    raw) rows. Revenue stays DECIMAL through the sum and the COALESCE so
    both engines produce bit-identical cells."""
    o = t(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.to_date("o_orderdate")).alias("dmin"),
        F.max(F.to_date("o_orderdate")).alias("dmax"),
    )
    spine = b.select(
        F.explode(F.sequence("dmin", "dmax")).alias("day")
    )
    dims = o.select("o_orderpriority").distinct()
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"), "o_orderpriority"
    ).agg(
        F.sum(dec("o_totalprice")).alias("rev"),
        F.count("*").alias("n"),
    )
    grid = spine.crossJoin(F.broadcast(dims))
    # day leaves as yyyy-MM-dd text and revenue as double AFTER the exact
    # decimal sum — the cross-engine output conventions of events_rolling_wau
    # and the q1 family (sorted-hash compare needs identical dtypes).
    return grid.join(daily, ["day", "o_orderpriority"], "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "o_orderpriority",
        dbl(F.coalesce(F.col("rev"), F.lit(0))).alias("revenue"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
    )


# --------------------------------------------- last-touch attribution
@register(
    "events_attribution_last_touch",
    """
    WITH tagged AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events)
    SELECT COALESCE(touch, 'none') AS touch_type,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch, 'none')
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str):
    """Marketing-attribution primitive: credit each purchase to the user's
    most recent preceding non-purchase event (last-touch model), then roll
    purchase counts and value up by touch type. One shuffle on user_id
    feeds a running last(..., ignorenulls) window — the same
    partition-local sweep sessionization uses, so at 100 TB it rides the
    same user_id exchange; ties inside a timestamp break on event_id so the
    credit assignment is deterministic on both engines. Purchases with no
    prior touch credit 'none'. Value aggregates in DECIMAL (exact sums)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            dbl(F.sum(dec("value"))).alias("total_value"),
        )
    )


# ----------------------------------------------- winsorized robust stats
@register(
    "lineitem_winsorized_stats",
    """
    WITH g AS (SELECT l_returnflag,
                      quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05)
                        AS p05,
                      quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95)
                        AS p95
               FROM lineitem GROUP BY l_returnflag),
    j AS (SELECT l.l_returnflag, l.l_extendedprice AS x, g.p05, g.p95
          FROM lineitem l JOIN g USING (l_returnflag))
    SELECT l_returnflag, p05, p95,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN x < p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(CASE WHEN x > p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           (CAST(SUM(CASE WHEN x >= p05 AND x <= p95
                          THEN CAST(x AS DECIMAL(12,2))
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            + CAST(SUM(CASE WHEN x < p05 THEN 1 ELSE 0 END) AS BIGINT) * p05
            + CAST(SUM(CASE WHEN x > p95 THEN 1 ELSE 0 END) AS BIGINT) * p95)
           / COUNT(*) AS w_mean
    FROM j GROUP BY l_returnflag, p05, p95
    """,
)
def lineitem_winsorized_stats(spark: SparkSession, sf_dir: str):
    """Winsorized mean per group — the outlier-robust location estimate a
    feature pipeline uses when a fat tail would swamp avg(). Two passes:
    exact p05/p95 per group (3 groups — the same percentile/quantile_cont
    interpolation parity agg_approx_quantile_check pins), broadcast back,
    then ONE conditional aggregation. The winsorized mean is assembled from
    exact parts — DECIMAL sum of in-range values plus integer tail counts
    times the (double) clamp bounds — with a single terminal double
    expression written in the same association order in both engines, so
    IEEE determinism carries the hash gate. At 100 TB the first pass
    becomes approx_percentile (one mergeable sketch pass, no sort) with the
    error budget checked exactly as agg_approx_quantile_check does."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.percentile(dbl(F.col("l_extendedprice")), 0.05).alias("p05"),
        F.percentile(dbl(F.col("l_extendedprice")), 0.95).alias("p95"),
    )
    x = F.col("l_extendedprice")
    j = li.join(F.broadcast(g), "l_returnflag")
    agg = j.groupBy("l_returnflag", "p05", "p95").agg(
        F.count("*").alias("n"),
        F.sum(F.when(x < F.col("p05"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_below"),
        F.sum(F.when(x > F.col("p95"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
        F.sum(
            F.when((x >= F.col("p05")) & (x <= F.col("p95")), dec(x)).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )
        ).alias("sum_within"),
    )
    w_mean = (
        dbl(F.col("sum_within"))
        + F.col("n_below") * F.col("p05")
        + F.col("n_above") * F.col("p95")
    ) / F.col("n")
    return agg.select(
        "l_returnflag", "p05", "p95", "n", "n_below", "n_above",
        w_mean.alias("w_mean"),
    )


# -------------------------------------- count-min-sketch heavy hitters
# d=4 hash rows x w=64 buckets; fixed-size mergeable frequency sketch with
# the exact count alongside so the one-sided error bound is checked in-gate
# (the approx_percentile-vs-exact harness pattern of agg_approx_quantile_check).
_CMS_D = 4
_CMS_W = 64
_CMS_K = 25


def _cms_bucket_sql(j: str, key: str) -> str:
    # DuckDB bucket definition: first 24 md5 bits of "j:key", mod w
    return (
        f"CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 6)) AS BIGINT) % {_CMS_W}"
    )


def _cms_bucket_spark(j: str, key: str) -> str:
    # same 24 md5 bits in Spark SQL dialect (conv hex->dec)
    return (
        f"CAST(conv(substr(md5(concat(CAST({j} AS STRING), ':', "
        f"CAST({key} AS STRING))), 1, 6), 16, 10) AS BIGINT) % {_CMS_W}"
    )


@register(
    "events_cms_heavy_hitters",
    f"""
    WITH rows_j AS (SELECT user_id, unnest(range({_CMS_D})) AS j FROM events),
    cells AS (SELECT j, {_cms_bucket_sql('j', 'user_id')} AS bucket,
                     COUNT(*) AS c
              FROM rows_j GROUP BY j, bucket),
    truth AS (SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id),
    probes AS (SELECT t.user_id, t.true_n, cells.c
               FROM truth t
               CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j) u
               JOIN cells ON cells.j = u.j
                 AND cells.bucket = {_cms_bucket_sql('u.j', 't.user_id')}),
    est AS (SELECT user_id, MIN(true_n) AS true_n, MIN(c) AS est
            FROM probes GROUP BY user_id),
    ranked AS (SELECT user_id, est, true_n,
                      CAST(est >= true_n AS INT) AS est_ge_true,
                      ROW_NUMBER() OVER (ORDER BY est DESC, user_id) AS rn
               FROM est)
    SELECT user_id, est, true_n, est_ge_true, rn
    FROM ranked WHERE rn <= {_CMS_K}
    """,
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str):
    """Heavy hitters via count-min sketch: estimate per-user event counts
    from a fixed d x w = 4 x 64 counter grid (md5-derived bucket hashes, so
    both engines build the identical sketch), rank users by estimate, and
    carry the exact count beside it — the oracle pins est >= true_n (the
    CMS one-sided error guarantee) into the hash gate, the same
    sketch-vs-exact harness agg_approx_quantile_check uses. Why it matters
    at 100 TB: the sketch is FIXED memory regardless of key cardinality and
    merges by cell-wise addition — per-partition sketches combine map-side,
    so the frequency pass over billions of keys never shuffles raw keys,
    only 256 counters; the exact groupBy here exists purely to verify the
    estimate. Deterministic ranking: estimate DESC, user_id ASC — a
    bounded top-25 global window over already-aggregated per-user rows
    (at corpus scale this degenerates to two-level top-k: per-partition
    top-25 then a tiny merge, as the reservoir sampler documents)."""
    e = t(spark, sf_dir, "events")
    bucket = _cms_bucket_spark("j", "user_id")
    cells = (
        e.select("user_id", F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("j"))
        .selectExpr("j", f"{bucket} AS bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    truth = e.groupBy("user_id").agg(F.count("*").alias("true_n"))
    probes = (
        truth.select(
            "user_id",
            "true_n",
            F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("j"),
        )
        .selectExpr("user_id", "true_n", "j", f"{bucket} AS bucket")
        .join(F.broadcast(cells), ["j", "bucket"])
    )
    est = probes.groupBy("user_id").agg(
        F.min("true_n").alias("true_n"), F.min("c").alias("est")
    )
    # rank() == row_number() under the user_id tie-break; rank() gets the
    # map-side WindowGroupLimit top-k prune (see docs_bm25_topk)
    w = Window.orderBy(F.desc("est"), F.asc("user_id"))
    return (
        est.withColumn("est_ge_true", (F.col("est") >= F.col("true_n")).cast("int"))
        .withColumn("rn", F.rank().over(w))
        .filter(F.col("rn") <= _CMS_K)
        .select("user_id", "est", "true_n", "est_ge_true", "rn")
    )


# ------------------------------------------ EWMA time-series smoothing
# alpha = 1/2 over a 10-event horizon: weights are powers of two, so the
# weighted sum is exact integer arithmetic until one terminal division.
_EWMA_H = 10


@register(
    "events_ewma_smoothing",
    f"""
    WITH v AS (SELECT event_id, user_id, ts,
                      CAST(round(value * 100, 0) AS BIGINT) AS cents
               FROM events),
    fr AS (SELECT event_id, user_id,
                  list(cents) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN {_EWMA_H - 1} PRECEDING
                                             AND CURRENT ROW) AS arr
           FROM v)
    SELECT event_id, user_id,
           CAST(len(arr) AS INT) AS n_win,
           CAST(list_sum(list_transform(arr, (x, i) -> x * (1 << (i - 1))))
                AS DOUBLE)
           / CAST(100 * ((1 << len(arr)) - 1) AS DOUBLE) AS ewma
    FROM fr
    """,
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str):
    """Exponentially-weighted moving average (alpha=1/2) of each user's
    value series over a 10-event horizon — the time-series smoothing
    primitive (anomaly baselines, rate limiting, trend features) missing
    from plain SQL windows because EWMA is recursive. The half-life trick
    makes it exact: alpha=1/2 means weights are powers of two, so the
    windowed weighted sum folds as INTEGER arithmetic (values as cents,
    weight doubling per step) and only one terminal double division exists
    — bit-identical on any engine, unlike a pow()-based EWMA (pow is not
    correctly-rounded libm territory, excluded by the parity policy). One
    user_id shuffle; the per-row fold touches at most 10 elements, so the
    window state is O(horizon) regardless of series length."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_H - 1), 0)
    )
    fr = e.select(
        "event_id",
        "user_id",
        F.collect_list(
            F.round(F.col("value") * 100, 0).cast("bigint")
        ).over(w).alias("arr"),
    )
    return fr.select(
        "event_id",
        "user_id",
        F.size("arr").alias("n_win"),
        (
            dbl(
                F.expr(
                    "aggregate(arr,"
                    " struct(cast(0 AS BIGINT) AS s, cast(1 AS BIGINT) AS p),"
                    " (acc, x) -> struct(acc.s + x * acc.p, acc.p * 2),"
                    " acc -> acc.s)"
                )
            )
            / dbl(F.expr("cast(100 * (shiftleft(1L, size(arr)) - 1) AS BIGINT)"))
        ).alias("ewma"),
    )


# --------------------------------------- Herfindahl concentration index
@register(
    "nation_supplier_hhi",
    """
    WITH rev AS (SELECT s.s_nationkey, l.l_suppkey,
                        SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(12,2))
                               - CAST(l_discount AS DECIMAL(12,2))))
                          AS r
                 FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                 GROUP BY s.s_nationkey, l.l_suppkey),
    tot AS (SELECT s_nationkey, SUM(r) AS total, COUNT(*) AS n_suppliers
            FROM rev GROUP BY s_nationkey),
    shares AS (SELECT rev.s_nationkey,
                      CAST(floor(1000000.0 * CAST(rev.r AS DOUBLE)
                                 / CAST(tot.total AS DOUBLE)) AS BIGINT)
                        AS share_fp
               FROM rev JOIN tot USING (s_nationkey))
    SELECT n.n_name,
           t.n_suppliers,
           CAST(SUM(s.share_fp * s.share_fp) AS BIGINT) AS hhi_fp
    FROM shares s
    JOIN tot t USING (s_nationkey)
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, t.n_suppliers
    """,
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str):
    """Herfindahl-Hirschman concentration index of supplier revenue per
    nation — the market-concentration analytic (is one supplier dominating
    a nation's volume?). Revenue aggregates exactly in DECIMAL per
    (nation, supplier); shares become integer fixed-point floor(1e6*r/total)
    (the one double division per supplier happens on identical exact
    operands), and HHI = sum(share^2) stays a BIGINT — no float summation
    order anywhere, so the gate hash-compares exactly. Plan shape: one
    lineitem groupBy keyed (nation, supplier) with the tiny supplier and
    nation dims broadcast, then two aggregations over supplier-level rows
    (|suppliers| per nation, not |lineitem|). Interpretation: 1e12 = single
    supplier; ~1e12/n = perfectly even."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
            ).alias("r")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("r").alias("total"), F.count("*").alias("n_suppliers")
    )
    shares = rev.join(F.broadcast(tot), "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        F.floor(F.lit(1000000.0) * dbl(F.col("r")) / dbl(F.col("total")))
        .cast("bigint")
        .alias("share_fp"),
    )
    return (
        shares.join(
            F.broadcast(n), shares["s_nationkey"] == n["n_nationkey"]
        )
        .groupBy("n_name", "n_suppliers")
        .agg(
            F.sum(F.col("share_fp") * F.col("share_fp"))
            .cast("bigint")
            .alias("hhi_fp")
        )
    )


# --------------------------------------- multimodal frame sampling
# Round-5d (window R6): every 2nd 32-byte frame of each payload, as an
# Arrow mapInPandas 1->N expansion with a full SQL value mirror (the
# multimodal_decode_oracle pattern: payload bytes are the utf-8 text, so
# DuckDB reproduces the checksums with substr/ord math).
@register(
    "multimodal_frame_sample",
    """
    WITH fr AS (
      SELECT doc_id, text, length(text) AS n,
             unnest(range(0, CAST(ceil(length(text) / 32.0) AS BIGINT), 2))
               AS frame_idx
      FROM documents),
    ch AS (
      SELECT fr.doc_id, fr.frame_idx,
             CAST(least(32, fr.n - fr.frame_idx * 32) AS INT) AS frame_len,
             COALESCE(SUM(ord(substr(fr.text,
                        CAST(fr.frame_idx * 32 + gs.i AS INT) + 1, 1))), 0)
               AS checksum
      FROM fr LEFT JOIN LATERAL
           (SELECT unnest(range(least(32, fr.n - fr.frame_idx * 32))) AS i)
             gs ON TRUE
      GROUP BY fr.doc_id, fr.frame_idx, fr.n)
    SELECT doc_id, frame_idx, frame_len, CAST(checksum AS BIGINT) AS checksum
    FROM ch
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str):
    """Video-style frame sampling over opaque binary payloads: an Arrow
    mapInPandas stage explodes each payload into every 2nd 32-byte frame
    (1→N expansion — the shape a video curation pipeline uses to pull
    keyframes before feature extraction; llm/multimodal.py:frame_sample).
    The frame "decode" is the deterministic byte-window checksum stand-in
    (real codecs are pluggable, absent from this container), which lets
    DuckDB mirror every output cell with substr/ord math — so unlike the
    rows-only multimodal_decode_features, this multimodal expansion is under
    the FULL value-hash gate. Scale: decode parallelism follows the scan
    partitioning, expansion happens inside the Arrow batch (no shuffle),
    and output rows are narrow scalars — frames_per_doc × corpus."""
    from ..llm.multimodal import attach_binary_payload, frame_sample

    d = attach_binary_payload(t(spark, sf_dir, "documents"), "text")
    return frame_sample(d, payload_col="payload", id_col="doc_id")


# --------------------------------------- Observation-API DQ metrics
@register(
    "dq_observe_metrics",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT)
             AS n_null_priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_revenue,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonpositive_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
)
def dq_observe_metrics(spark: SparkSession, sf_dir: str):
    """Data-quality metrics via Spark's Observation API: the counters ride
    the SAME pass as the production write (here a noop sink standing in for
    the real one) — zero extra scans, zero extra shuffles, exactly how a
    100 TB ingest job self-reports row counts, null rates, and value
    integrity without a second job (contrast dq_expectations_report, which
    is a standalone audit pass). The observed map materializes after the
    action and returns as a one-row metrics DataFrame — metric-sized
    driver involvement only. Aggregates follow the parity policy: counts
    as BIGINT, revenue summed in DECIMAL then cast to double once."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Observation

    obs = Observation()
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_orderpriority"))
        .cast("bigint")
        .alias("n_null_priority"),
        dbl(F.sum(dec("o_totalprice"))).alias("total_revenue"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonpositive_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    # the action the metrics piggyback on (a real pipeline's sink write)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_priority"],
                float(m["total_revenue"]),
                m["n_nonpositive_price"],
                float(m["min_price"]),
                float(m["max_price"]),
            )
        ],
        "n_rows bigint, n_null_priority bigint, total_revenue double,"
        " n_nonpositive_price bigint, min_price double, max_price double",
    )


# ------------------------------------------- Arrow-native UDF (mapInArrow)
@register(
    "arrow_native_net_revenue",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                AS BIGINT) AS net_fp_total,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def arrow_native_net_revenue(spark: SparkSession, sf_dir: str):
    """The Arrow-native member of the UDF matrix: mapInArrow transforms raw
    RecordBatches with pyarrow.compute kernels — no pandas materialization,
    no per-row Python, just vectorized C++ over Arrow buffers (the cheapest
    Python escape hatch when even Series conversion overhead matters at
    100 TB). Per-row
    math is integer fixed-point (cents x discount-percent), so the
    follow-on Spark-side groupBy sums BIGINTs exactly and the DuckDB mirror
    hash-matches. Plan shape: scan -> ArrowEvalPython(map) -> partial agg
    -> one 3-row exchange."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    # a closure (pickled by value): a module-level function would make the
    # Python worker re-import its defining module, and any top-level
    # @pandas_udf there needs a driver-side context the worker lacks
    def arrow_net_revenue_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            ep = pc.cast(
                pc.round(
                    pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))
                ),
                pa.int64(),
            )
            dc = pc.cast(
                pc.round(pc.multiply(batch.column("l_discount"), pa.scalar(100.0))),
                pa.int64(),
            )
            net = pc.multiply(ep, pc.subtract(pa.scalar(100, pa.int64()), dc))
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_returnflag"), net], ["l_returnflag", "net_fp"]
            )

    mapped = li.mapInArrow(
        arrow_net_revenue_batches,
        StructType(
            [
                StructField("l_returnflag", StringType()),
                StructField("net_fp", LongType()),
            ]
        ),
    )
    return mapped.groupBy("l_returnflag").agg(
        F.sum("net_fp").cast("bigint").alias("net_fp_total"),
        F.count("*").alias("n_rows"),
    )


# ------------------------------------- seasonal-naive forecast backtest
@register(
    "orders_seasonal_naive_backtest",
    """
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY 1, 2),
    scored AS (
      SELECT a.y, a.m,
             CAST(floor(1000000.0
                        * abs(CAST(a.rev AS DOUBLE) - CAST(b.rev AS DOUBLE))
                        / CAST(a.rev AS DOUBLE)) AS BIGINT) AS ape_fp
      FROM monthly a JOIN monthly b ON b.y = a.y - 1 AND b.m = a.m)
    SELECT y,
           COUNT(*) AS n_months,
           CAST(SUM(ape_fp) AS BIGINT) AS sum_ape_fp,
           CAST(floor(CAST(SUM(ape_fp) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mape_fp
    FROM scored GROUP BY y
    """,
)
def orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str):
    """Forecast backtesting: score the seasonal-naive model (predict month
    M of year Y with month M of year Y-1) against actual monthly revenue,
    reporting per-year MAPE — the baseline every demand-forecast model must
    beat, and the standard backtest harness shape (join actuals to lagged
    predictions, score, aggregate by fold). The fact table collapses to a
    |years|x12 monthly grid in one DECIMAL aggregation; the self-join and
    scoring run over that tiny grid, so the backtest adds nothing to the
    full-data cost at any scale. APE terms are fixed-point (exact decimal
    operands, one floored double division each), summed as BIGINT —
    engine-exact. Complements orders_seasonality (decomposition) with the
    evaluation side."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    a = monthly.select("y", "m", F.col("rev").alias("actual"))
    b = monthly.select(
        (F.col("y") + 1).alias("y"), "m", F.col("rev").alias("pred")
    )
    scored = a.join(b, ["y", "m"]).select(
        "y",
        F.floor(
            F.lit(1000000.0)
            * F.abs(dbl(F.col("actual")) - dbl(F.col("pred")))
            / dbl(F.col("actual"))
        )
        .cast("bigint")
        .alias("ape_fp"),
    )
    return scored.groupBy("y").agg(
        F.count("*").alias("n_months"),
        F.sum("ape_fp").cast("bigint").alias("sum_ape_fp"),
        F.floor(dbl(F.sum("ape_fp")) / F.count("*"))
        .cast("bigint")
        .alias("mape_fp"),
    )


# ------------------------------------------ Benford first-digit DQ test
# Expected shares floor(1e6*log10(1+1/d)) precomputed as literals — the
# parity policy forbids runtime log (libm differs between engines), and
# Benford's expectations are universal constants anyway.
_BENFORD_FP = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]
_BENFORD_VALUES = ", ".join(
    f"({d + 1}, {fp})" for d, fp in enumerate(_BENFORD_FP)
)


@register(
    "orders_benford_digit_test",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1),
    counts AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM counts),
    expected(d, exp_fp) AS (VALUES {_BENFORD_VALUES})
    SELECT e.d,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
           CAST(floor(1000000.0 * COALESCE(c.n, 0) / t.total_n) AS BIGINT)
             AS obs_fp,
           CAST(e.exp_fp AS BIGINT) AS exp_fp,
           CAST(abs(CAST(floor(1000000.0 * COALESCE(c.n, 0) / t.total_n)
                         AS BIGINT) - e.exp_fp) AS BIGINT) AS dev_fp
    FROM expected e LEFT JOIN counts c ON c.d = e.d CROSS JOIN total t
    """,
)
def orders_benford_digit_test(spark: SparkSession, sf_dir: str):
    """Benford's-law first-digit screen — the forensic data-quality test
    for fabricated or truncated numeric columns (real multi-scale amounts
    follow P(d) = log10(1+1/d); synthetic-uniform data flunks it, which is
    itself the finding here). The expected shares are embedded as
    fixed-point LITERALS (Benford's constants are universal, and the
    parity policy bars runtime log over the engine boundary); observed
    shares are one digit-extraction groupBy over the scan — 9 rows out at
    any scale, with per-digit absolute deviation for the alerting
    threshold. Complements dq_expectations_report (structural checks) and
    chisq_contingency_cells (association) with the distributional-forensic
    axis."""
    o = t(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("total_n"))
    expected = spark.createDataFrame(
        [(d + 1, fp) for d, fp in enumerate(_BENFORD_FP)], "d int, exp_fp bigint"
    )
    obs_fp = F.floor(
        F.lit(1000000.0) * F.coalesce(F.col("n"), F.lit(0)) / F.col("total_n")
    ).cast("bigint")
    return (
        expected.join(counts, "d", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "d",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            obs_fp.alias("obs_fp"),
            F.col("exp_fp").cast("bigint").alias("exp_fp"),
            F.abs(obs_fp - F.col("exp_fp")).cast("bigint").alias("dev_fp"),
        )
    )


# ------------------------------- time-decay multi-touch attribution
# Last up-to-8 touches share each purchase's value with power-of-two decay
# (most recent touch weight 128 .. oldest 1), normalized per purchase so
# credits are exact fixed-point fractions of the purchase value.
@register(
    "events_multitouch_decay_attribution",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tcnt
      FROM events),
    touches AS (
      SELECT user_id, event_type AS touch_type, tcnt AS i
      FROM ordered WHERE event_type <> 'purchase'),
    purchases AS (
      SELECT user_id, cents, tcnt AS c FROM ordered
      WHERE event_type = 'purchase' AND tcnt >= 1),
    credits AS (
      SELECT t.touch_type,
             CAST(floor(1000000.0 * p.cents
                        * (1 << CAST(7 - (p.c - t.i) AS INT))
                        / (256 - (1 << CAST(8 - least(p.c, 8) AS INT))))
                  AS BIGINT) AS credit_fp
      FROM purchases p JOIN touches t
        ON t.user_id = p.user_id AND t.i <= p.c AND t.i >= p.c - 7)
    SELECT touch_type,
           COUNT(*) AS n_credits,
           CAST(SUM(credit_fp) AS BIGINT) AS credit_fp_total
    FROM credits GROUP BY touch_type
    """,
)
def events_multitouch_decay_attribution(spark: SparkSession, sf_dir: str):
    """Time-decay MULTI-touch attribution: each purchase's value is shared
    across the user's last up-to-8 preceding touches with exponential
    position decay — weight 2^(7-r) for recency rank r, normalized per
    purchase — the fractional-credit model marketing stacks run next to
    last-touch (events_attribution_last_touch credits only r=0). The
    power-of-two decay is the EWMA trick again: weights and the
    normalizer (256 - 2^(8-m) for m available touches) are exact
    integers, so each credit is one floored fixed-point division and the
    per-type totals sum as BIGINTs — engine-exact. Plan: one user_id
    window pass indexes touches; the purchase-to-touch join is an
    integer band (8 rows max per purchase) on the SAME user_id exchange
    — no new full-data shuffle."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ordered = e.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.sum(F.when(F.col("event_type") != "purchase", 1).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("tcnt"),
    )
    touches = ordered.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("touch_type"), F.col("tcnt").alias("i")
    )
    purchases = ordered.filter(
        (F.col("event_type") == "purchase") & (F.col("tcnt") >= 1)
    ).select("user_id", "cents", F.col("tcnt").alias("c"))
    credit_fp = F.floor(
        F.lit(1000000.0)
        * F.col("cents")
        * F.expr("shiftleft(1L, CAST(7 - (c - i) AS INT))")
        / F.expr("256 - shiftleft(1L, CAST(8 - least(c, 8) AS INT))")
    ).cast("bigint")
    credits = purchases.join(
        touches,
        (purchases["user_id"] == touches["user_id"])
        & (touches["i"] <= purchases["c"])
        & (touches["i"] >= purchases["c"] - 7),
    ).select("touch_type", credit_fp.alias("credit_fp"))
    return credits.groupBy("touch_type").agg(
        F.count("*").alias("n_credits"),
        F.sum("credit_fp").cast("bigint").alias("credit_fp_total"),
    )


# ------------------------------- market-basket association rules (L2)
_BASKET_MINSUP = 3  # pair must co-occur in >= 3 orders


@register(
    "basket_part_association",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nt AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    item_n AS (
      SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY l_partkey
      HAVING COUNT(*) >= {_BASKET_MINSUP}),
    fi AS (SELECT i.l_orderkey, i.l_partkey
           FROM items i JOIN item_n USING (l_partkey)),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM fi a JOIN fi b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {_BASKET_MINSUP})
    SELECT p.part_a, p.part_b, p.n_ab,
           CAST(floor(1000000.0 * p.n_ab / t.n_orders) AS BIGINT)
             AS support_fp,
           CAST(floor(1000000.0 * p.n_ab / na.n) AS BIGINT) AS conf_ab_fp,
           CAST(floor(1000000.0 * p.n_ab * t.n_orders
                      / (na.n * nb.n)) AS BIGINT) AS lift_fp
    FROM pairs p
    JOIN item_n na ON na.l_partkey = p.part_a
    JOIN item_n nb ON nb.l_partkey = p.part_b
    CROSS JOIN nt t
    """,
)
def basket_part_association(spark: SparkSession, sf_dir: str):
    """Market-basket association rules at the pair level (apriori L2):
    parts co-purchased in >= {_BASKET_MINSUP} orders, with support,
    confidence(a→b), and lift — the frequent-itemset family the engine
    was missing. The apriori prune is the scale lever: items below
    min-support are filtered BEFORE the pair self-join (L1 prune), and
    the join is keyed on l_orderkey so pair generation is bounded by
    basket size squared per order (<=12 items here, 2-3 dozen in real
    carts) — never corpus-quadratic. All three metrics are floored
    fixed-point ratios of exact counts (the n_ab·N/(n_a·n_b) lift
    numerator stays < 2^53, so the double is exact); the broadcast sides
    are the item-frequency table and the 1-row order count."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    nt = items.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    item_n = (
        items.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= _BASKET_MINSUP)
    )
    fi = items.join(F.broadcast(item_n.select("l_partkey")), "l_partkey")
    a = fi.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = fi.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MINSUP)
    )
    na = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    nb = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .crossJoin(F.broadcast(nt))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.floor(F.lit(1000000.0) * F.col("n_ab") / F.col("n_orders"))
            .cast("bigint")
            .alias("support_fp"),
            F.floor(F.lit(1000000.0) * F.col("n_ab") / F.col("n_a"))
            .cast("bigint")
            .alias("conf_ab_fp"),
            F.floor(
                F.lit(1000000.0)
                * F.col("n_ab")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b"))
            )
            .cast("bigint")
            .alias("lift_fp"),
        )
    )


# --------------------------------------------- Gini inequality index
@register(
    "lineitem_gini_inequality",
    """
    WITH ranked AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS i
      FROM lineitem),
    sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(cents) AS BIGINT) AS s0,
             CAST(SUM(i * cents) AS BIGINT) AS s1
      FROM ranked GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(floor(1000000.0 * (2 * CAST(s1 AS DOUBLE)
                                   - (n + 1) * CAST(s0 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE)))
                AS BIGINT) AS gini_fp
    FROM sums
    """,
)
def lineitem_gini_inequality(spark: SparkSession, sf_dir: str):
    """Gini coefficient of revenue inequality per return flag — the
    rank-based concentration measure next to HHI (share-based) and the
    ABC/Pareto classification: G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) over ascending-ranked amounts. Both moments accumulate as
    exact BIGINTs from cent-granular values (rank*cents stays far below
    2^63; tied amounts make the sum permutation-invariant, so the
    deterministic tie-break is cosmetic), and one floored fixed-point
    expression crosses the engine boundary. The per-group global rank is
    the sf-test formulation — at 100 TB the same two moments come from the
    distributed two-pass rank (per-partition histograms, then offset
    prefix sums), identical outputs."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
        F.row_number().over(w).alias("i"),
    )
    sums = ranked.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("bigint").alias("s0"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("s1"),
    )
    gini = F.floor(
        F.lit(1000000.0)
        * (
            2 * dbl(F.col("s1"))
            - (F.col("n") + 1) * dbl(F.col("s0"))
        )
        / (dbl(F.col("n")) * dbl(F.col("s0")))
    ).cast("bigint")
    return sums.select("l_returnflag", "n", gini.alias("gini_fp"))


# --------------------------------------- customer survival curve
_SURV_MAX_MONTHS = 24


@register(
    "customer_survival_curve",
    f"""
    WITH life AS (
      SELECT o_custkey,
             CAST(date_diff('month', MIN(o_orderdate), MAX(o_orderdate))
                  AS INT) AS months
      FROM orders GROUP BY o_custkey),
    base AS (SELECT COUNT(*) AS n_customers FROM life),
    k AS (SELECT unnest(range({_SURV_MAX_MONTHS + 1})) AS k)
    SELECT k.k,
           CAST(SUM(CASE WHEN life.months >= k.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alive,
           CAST(floor(1000000.0
                      * SUM(CASE WHEN life.months >= k.k THEN 1 ELSE 0 END)
                      / b.n_customers) AS BIGINT) AS share_fp
    FROM k CROSS JOIN life CROSS JOIN base b
    GROUP BY k.k, b.n_customers
    """,
)
def customer_survival_curve(spark: SparkSession, sf_dir: str):
    """Discrete survival (retention-lifetime) curve: the share of
    customers whose observed activity span reaches k months, for k in
    0..{_SURV_MAX_MONTHS} — the survival-analysis primitive behind churn
    and LTV models (here uncensored: lifetime = last minus first order
    month). The fact table collapses to one row per customer FIRST; the
    curve is a {_SURV_MAX_MONTHS + 1}-point band join against that tiny
    table (broadcast spine, exact integer month arithmetic in both
    engines), so the sweep adds nothing to the full-data pass. Shares are
    floored fixed-point of exact counts. At scale the same two-step holds:
    per-customer min/max is one groupBy; the spine never grows."""
    o = t(spark, sf_dir, "orders")
    life = o.groupBy("o_custkey").agg(
        (
            (F.year(F.max("o_orderdate")) - F.year(F.min("o_orderdate"))) * 12
            + (F.month(F.max("o_orderdate")) - F.month(F.min("o_orderdate")))
        )
        .cast("int")
        .alias("months")
    )
    base = life.agg(F.count("*").alias("n_customers"))
    k = spark.range(_SURV_MAX_MONTHS + 1).select(F.col("id").cast("int").alias("k"))
    return (
        F.broadcast(k)
        .crossJoin(life)
        .crossJoin(F.broadcast(base))
        .groupBy("k", "n_customers")
        .agg(
            F.sum(F.when(F.col("months") >= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_alive")
        )
        .select(
            "k",
            "n_alive",
            F.floor(F.lit(1000000.0) * F.col("n_alive") / F.col("n_customers"))
            .cast("bigint")
            .alias("share_fp"),
        )
    )


# ------------------------------------ Simpson diversity of event mix
@register(
    "events_type_diversity_simpson",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type),
    u AS (
      SELECT user_id,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(SUM(n * (n - 1)) AS BIGINT) AS homog
      FROM c GROUP BY user_id)
    SELECT user_id, total,
           CAST(CASE WHEN total > 1 THEN
                  floor(1000000.0 * (1.0 - CAST(homog AS DOUBLE)
                                          / (total * (total - 1.0))))
                ELSE 0 END AS BIGINT) AS diversity_fp
    FROM u
    """,
)
def events_type_diversity_simpson(spark: SparkSession, sf_dir: str):
    """Gini-Simpson diversity of each user's event-type mix: 1 - sum
    n_t(n_t-1) / (n(n-1)) — the behavioral-breadth feature (0 = every
    event the same type, →1 = evenly spread) that segmentation models use
    where Shannon entropy would need log (barred by the cross-engine
    parity policy; Simpson's index is a ratio of EXACT integer pair
    counts, so it hash-matches engine-to-engine with one floored terminal
    expression). Two narrow groupBys on the same user_id exchange; no
    joins, no floats until the final division."""
    e = t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    u = c.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("homog"),
    )
    div = F.when(
        F.col("total") > 1,
        F.floor(
            F.lit(1000000.0)
            * (
                F.lit(1.0)
                - dbl(F.col("homog"))
                / (F.col("total") * (F.col("total") - F.lit(1.0)))
            )
        ),
    ).otherwise(0)
    return u.select("user_id", "total", div.cast("bigint").alias("diversity_fp"))


# ------------------------------------ order-to-ship latency profile
@register(
    "order_to_ship_latency_profile",
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT)
               AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority,
           COUNT(*) AS n,
           MIN(days) AS min_days,
           quantile_cont(CAST(days AS DOUBLE), 0.5) AS p50_days,
           quantile_cont(CAST(days AS DOUBLE), 0.95) AS p95_days,
           MAX(days) AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def order_to_ship_latency_profile(spark: SparkSession, sf_dir: str):
    """Operational-SLA latency profile: order-to-ship days per priority
    class with exact p50/p95 — the fulfilment-latency report an ops
    dashboard alerts on (is URGENT actually shipping faster?). One
    broadcast join of the order dim onto lineitem, integer day deltas,
    and the established percentile/quantile_cont interpolation parity
    (agg_approx_quantile_check) for the quantiles; at 100 TB the exact
    percentile swaps for the mergeable approx_percentile sketch with the
    same output contract."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    lat = li.join(
        F.broadcast(o.select("o_orderkey", "o_orderdate", "o_orderpriority")),
        li["l_orderkey"] == o["o_orderkey"],
    ).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min("days").alias("min_days"),
        F.percentile(dbl(F.col("days")), 0.5).alias("p50_days"),
        F.percentile(dbl(F.col("days")), 0.95).alias("p95_days"),
        F.max("days").alias("max_days"),
    )


# -------------------------------------- categorical drift monitor
# Reference window: orders before 1998; current window: 1998 onward.
@register(
    "orders_priority_drift_chi2",
    """
    WITH ref AS (
      SELECT o_orderpriority, COUNT(*) AS n_ref
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY o_orderpriority),
    cur AS (
      SELECT o_orderpriority, COUNT(*) AS n_cur
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      GROUP BY o_orderpriority),
    tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             (SELECT CAST(SUM(n_cur) AS BIGINT) FROM cur) AS t_cur
      FROM ref)
    SELECT r.o_orderpriority,
           CAST(r.n_ref AS BIGINT) AS n_ref,
           CAST(COALESCE(c.n_cur, 0) AS BIGINT) AS n_cur,
           CAST(floor(1000000.0 * r.n_ref / t.t_ref) AS BIGINT)
             AS ref_share_fp,
           CAST(floor(1000000.0 * COALESCE(c.n_cur, 0) / t.t_cur) AS BIGINT)
             AS cur_share_fp,
           CAST(floor(1000000.0
                      * (COALESCE(c.n_cur, 0)
                         - r.n_ref * CAST(t.t_cur AS DOUBLE) / t.t_ref)
                      * (COALESCE(c.n_cur, 0)
                         - r.n_ref * CAST(t.t_cur AS DOUBLE) / t.t_ref)
                      / (r.n_ref * CAST(t.t_cur AS DOUBLE) / t.t_ref))
                AS BIGINT) AS chi2_term_fp
    FROM ref r LEFT JOIN cur c USING (o_orderpriority) CROSS JOIN tot t
    """,
)
def orders_priority_drift_chi2(spark: SparkSession, sf_dir: str):
    """Categorical drift monitor — the train/serve-skew detector an ML
    pipeline runs on every feature: the order-priority mix before 1998
    (reference window) versus 1998 onward (current window), with per-class
    shares and the chi-square drift term ((obs - exp)^2 / exp, expected
    scaled from the reference mix). PSI is the textbook alternative but
    needs log (barred by the cross-engine parity policy); the chi-square
    statistic ranks drift identically and is built from exact counts with
    one deterministic double expression per class, written in the same
    association order in both engines. Two scan-local filtered
    aggregations plus a broadcast of the per-class and total counts; at
    100 TB the windows come from partition pruning on the date column."""
    o = t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    ref = (
        o.filter(F.col("o_orderdate") < cut)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_ref"))
    )
    cur = (
        o.filter(F.col("o_orderdate") >= cut)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_cur"))
    )
    tot = ref.agg(F.sum("n_ref").cast("bigint").alias("t_ref")).crossJoin(
        cur.agg(F.sum("n_cur").cast("bigint").alias("t_cur"))
    )
    j = (
        ref.join(cur, "o_orderpriority", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("n_cur0", F.coalesce(F.col("n_cur"), F.lit(0)))
        .withColumn(
            "exp_cur", F.col("n_ref") * dbl(F.col("t_cur")) / F.col("t_ref")
        )
    )
    return j.select(
        "o_orderpriority",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur0").cast("bigint").alias("n_cur"),
        F.floor(F.lit(1000000.0) * F.col("n_ref") / F.col("t_ref"))
        .cast("bigint")
        .alias("ref_share_fp"),
        F.floor(F.lit(1000000.0) * F.col("n_cur0") / F.col("t_cur"))
        .cast("bigint")
        .alias("cur_share_fp"),
        F.floor(
            F.lit(1000000.0)
            * (F.col("n_cur0") - F.col("exp_cur"))
            * (F.col("n_cur0") - F.col("exp_cur"))
            / F.col("exp_cur")
        )
        .cast("bigint")
        .alias("chi2_term_fp"),
    )


# ------------------------------------- late-arrival (watermark) accounting
# Arrival order proxy: shard-major replay (event_id % 4 shards, replayed
# shard by shard) — the same shape as the repo's own file-replay fixture,
# where a lagging ingest shard delivers its events after the others.
# Lateness of an event = how far its event-time lags the latest event-time
# already seen in the same user's stream at its arrival.
@register(
    "events_late_arrival_accounting",
    """
    WITH arr AS (
      SELECT user_id, event_id, ts,
             MAX(ts) OVER (PARTITION BY user_id
                           ORDER BY event_id % 4, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
      FROM events),
    lat AS (
      SELECT CAST(CASE WHEN hwm IS NULL OR ts >= hwm THEN 0
                       ELSE date_diff('second', ts, hwm) END AS BIGINT)
               AS late_s
      FROM arr)
    SELECT CASE WHEN late_s = 0 THEN 'on_time'
                WHEN late_s <= 300 THEN 'late_5m'
                WHEN late_s <= 1800 THEN 'late_30m'
                ELSE 'dropped_at_30m' END AS bucket,
           COUNT(*) AS n,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s
    FROM lat GROUP BY 1
    """,
)
def events_late_arrival_accounting(spark: SparkSession, sf_dir: str):
    """Watermark-policy sizing: per-user event-time lateness at arrival
    (arrival order = shard-major replay of event_id % 4 ingest shards —
    the repo's own file-replay fixture shape, a lagging shard delivering
    late; the high-water mark is the user's running max event-time), bucketed into
    on-time / <=5m / <=30m / would-be-DROPPED by a 30-minute watermark —
    the accounting that decides `withWatermark` for every streaming query
    in this repo (streaming/events.py) before it ships: too tight loses
    the dropped_at_30m rows silently, too loose holds state. Batch
    formulation of a streaming-side metric: one user_id-partitioned
    running-max window (the sessionization exchange — per-key watermarks,
    no global single-partition pass), integer second deltas, 4 rows out.
    In production the same profile is read off the streaming
    progress-report's watermark/lateness metrics; this query is the
    offline calibration pass over historical data."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id") % 4, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = e.select(
        "ts", F.max("ts").over(w).alias("hwm")
    )
    late_s = F.when(
        F.col("hwm").isNull() | (F.col("ts") >= F.col("hwm")), F.lit(0)
    ).otherwise(
        F.col("hwm").cast("long") - F.col("ts").cast("long")
    ).cast("bigint")
    lat = arr.select(late_s.alias("late_s"))
    bucket = (
        F.when(F.col("late_s") == 0, "on_time")
        .when(F.col("late_s") <= 300, "late_5m")
        .when(F.col("late_s") <= 1800, "late_30m")
        .otherwise("dropped_at_30m")
    )
    return lat.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )
