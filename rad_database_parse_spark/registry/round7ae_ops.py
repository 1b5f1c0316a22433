"""Round-7ae operators: bitmap-index sizing plan, join-cardinality
estimator audit, histogram selectivity audit, OFFSET/FETCH pagination
surface, streaming watermark-delay planner, and a readability-grade
text audit.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. lineitem_bitmap_index_plan — roaring-container sizing
# ------------------------------------------------------------------

_BMP_CONTAINER = 65536  # 2^16 rows per roaring container
_BMP_ARRAY_CUTOVER = 4096  # < 4096 set bits -> 2-byte array entries


@register(
    "lineitem_bitmap_index_plan",
    f"""
    WITH rows_tagged AS (
      SELECT l_orderkey * 8 + l_linenumber AS rowid,
             l_returnflag, l_linestatus
      FROM lineitem),
    cells AS (
      SELECT column_name, val,
             rowid // {_BMP_CONTAINER} AS container,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT rowid, 'l_returnflag' AS column_name,
               l_returnflag AS val FROM rows_tagged
        UNION ALL
        SELECT rowid, 'l_linestatus', l_linestatus FROM rows_tagged)
      GROUP BY 1, 2, 3),
    sized AS (
      SELECT column_name, val, container, cnt,
             CASE WHEN cnt < {_BMP_ARRAY_CUTOVER} THEN 2 * cnt
                  ELSE 8192 END AS bytes
      FROM cells)
    SELECT column_name,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS ndv,
           CAST(COUNT(*) AS BIGINT) AS n_containers,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(bytes) + 16 * COUNT(*) AS BIGINT)
             AS est_index_bytes,
           CAST((SUM(bytes) + 16 * COUNT(*)) * 8000 // SUM(cnt)
             AS BIGINT) AS bits_per_row_milli
    FROM sized GROUP BY 1 ORDER BY column_name
    """,
)
def lineitem_bitmap_index_plan(spark: SparkSession, sf_dir: str):
    """Bitmap-index sizing plan (roaring layout) for the low-
    cardinality lineitem flags — the index-selection arithmetic next
    to the tier's bloom planner, RLE estimate and varbyte postings
    estimate: each (value, 2^16-row container) cell becomes an array
    container (2 bytes/row) below 4096 set bits or a fixed 8 KiB
    bitmap above, + 16 bytes/container directory overhead. The rowid
    is the (orderkey·8 + linenumber) surrogate — a documented proxy
    for file position with the same locality structure. One scan
    (stack emits both columns' cells in a single pass on the Spark
    side), one bounded groupBy (ndv × containers cells), all sizes
    exact integers. bits_per_row_milli lands near the classic ~2
    bits/row for clustered flags — the number that decides bitmap vs
    dictionary encoding."""
    li = t(spark, sf_dir, "lineitem")
    tagged = li.selectExpr(
        "l_orderkey * 8 + l_linenumber AS rowid",
        "stack(2, 'l_returnflag', l_returnflag,"
        " 'l_linestatus', l_linestatus) AS (column_name, val)",
    )
    cells = tagged.groupBy(
        "column_name",
        "val",
        F.expr(f"rowid div {_BMP_CONTAINER}").alias("container"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    sized = cells.withColumn(
        "bytes",
        F.expr(
            f"CASE WHEN cnt < {_BMP_ARRAY_CUTOVER} THEN 2 * cnt"
            " ELSE 8192 END"
        ),
    )
    return (
        sized.groupBy("column_name")
        .agg(
            F.count_distinct("val").cast("bigint").alias("ndv"),
            F.count("*").cast("bigint").alias("n_containers"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            (F.sum("bytes") + 16 * F.count("*"))
            .cast("bigint")
            .alias("est_index_bytes"),
            F.expr(
                "CAST((SUM(bytes) + 16 * COUNT(*)) * 8000"
                " div SUM(cnt) AS BIGINT)"
            ).alias("bits_per_row_milli"),
        )
        .orderBy("column_name")
    )


# ------------------------------------------------------------------
# 2. join_cardinality_estimate_audit — optimizer CE vs truth
# ------------------------------------------------------------------


@register(
    "join_cardinality_estimate_audit",
    """
    WITH lo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_l,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv_l
      FROM lineitem),
    oo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_o,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv_ok,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_ck
      FROM orders),
    cc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ndv_c
      FROM customer),
    a1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    a2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual
      FROM orders JOIN customer ON c_custkey = o_custkey),
    audit AS (
      SELECT 'lineitem_x_orders' AS join_name,
             lo.n_l AS n_left, oo.n_o AS n_right,
             lo.ndv_l AS ndv_left_key, oo.ndv_ok AS ndv_right_key,
             CAST(lo.n_l * oo.n_o
               // GREATEST(lo.ndv_l, oo.ndv_ok) AS BIGINT) AS est_rows,
             a1.actual AS actual_rows
      FROM lo, oo, a1
      UNION ALL
      SELECT 'orders_x_customer', oo.n_o, cc.n_c,
             oo.ndv_ck, cc.ndv_c,
             CAST(oo.n_o * cc.n_c
               // GREATEST(oo.ndv_ck, cc.ndv_c) AS BIGINT),
             a2.actual
      FROM oo, cc, a2)
    SELECT join_name, n_left, n_right, ndv_left_key, ndv_right_key,
           est_rows, actual_rows,
           CAST(ABS(est_rows - actual_rows) * 1000000
                // actual_rows AS BIGINT) AS abs_err_ppm
    FROM audit ORDER BY join_name
    """,
)
def join_cardinality_estimate_audit(spark: SparkSession, sf_dir: str):
    """Join-cardinality estimation audit — the textbook System-R
    formula |R⋈S| = |R|·|S| / max(ndv_R(k), ndv_S(k)) scored against
    the TRUE join cardinality, per join. This is the number a cost-
    based optimizer stakes its plan choice on (Spark's CBO applies
    exactly this with ANALYZE-collected ndv); auditing it against
    truth on the FK joins shows the containment assumption holding
    (err ~0 on clean FKs) and quantifies drift when it doesn't —
    the planner-statistics sibling of the bloom/zone-map advisors.
    Exact ndv + count scans per table, the two true-join counts are
    plain broadcast-able FK joins, and the estimate/error arithmetic
    is pure BIGINT (n_l·n_o // max-ndv — products within int64 through
    sf1 by the same bound as the delta-method op). At 100 TB the ndv
    inputs swap to HLL sketches (ANALYZE does the same) with the
    estimate shape unchanged."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    lo = li.agg(
        F.count("*").cast("bigint").alias("n_l"),
        F.count_distinct("l_orderkey").cast("bigint").alias("ndv_l"),
    )
    oo = o.agg(
        F.count("*").cast("bigint").alias("n_o"),
        F.count_distinct("o_orderkey").cast("bigint").alias("ndv_ok"),
        F.count_distinct("o_custkey").cast("bigint").alias("ndv_ck"),
    )
    cc = c.agg(
        F.count("*").cast("bigint").alias("n_c"),
        F.count_distinct("c_custkey").cast("bigint").alias("ndv_c"),
    )
    a1 = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .agg(F.count("*").cast("bigint").alias("actual"))
    )
    a2 = (
        o.join(c, c.c_custkey == o.o_custkey)
        .agg(F.count("*").cast("bigint").alias("actual"))
    )
    r1 = (
        lo.crossJoin(F.broadcast(oo))
        .crossJoin(F.broadcast(a1))
        .select(
            F.lit("lineitem_x_orders").alias("join_name"),
            F.col("n_l").alias("n_left"),
            F.col("n_o").alias("n_right"),
            F.col("ndv_l").alias("ndv_left_key"),
            F.col("ndv_ok").alias("ndv_right_key"),
            F.expr(
                "CAST(n_l * n_o div GREATEST(ndv_l, ndv_ok)"
                " AS BIGINT)"
            ).alias("est_rows"),
            F.col("actual").alias("actual_rows"),
        )
    )
    r2 = (
        oo.crossJoin(F.broadcast(cc))
        .crossJoin(F.broadcast(a2))
        .select(
            F.lit("orders_x_customer").alias("join_name"),
            F.col("n_o").alias("n_left"),
            F.col("n_c").alias("n_right"),
            F.col("ndv_ck").alias("ndv_left_key"),
            F.col("ndv_c").alias("ndv_right_key"),
            F.expr(
                "CAST(n_o * n_c div GREATEST(ndv_ck, ndv_c)"
                " AS BIGINT)"
            ).alias("est_rows"),
            F.col("actual").alias("actual_rows"),
        )
    )
    return (
        r1.union(r2)
        .select(
            "*",
            F.expr(
                "CAST(ABS(est_rows - actual_rows) * 1000000"
                " div actual_rows AS BIGINT)"
            ).alias("abs_err_ppm"),
        )
        .orderBy("join_name")
    )


# ------------------------------------------------------------------
# 3. events_histogram_selectivity_audit — CE histogram quality
# ------------------------------------------------------------------

_HIST_BINS = 10
# fixed probe ranges in cents: narrow / medium / wide
_HIST_PROBES = [(1, 5000, 10000), (2, 2000, 30000), (3, 100, 80000)]


def _hist_oracle() -> str:
    probes = ", ".join(f"({i}, {a}, {b})" for i, a, b in _HIST_PROBES)
    return f"""
    WITH base AS (
      SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
      FROM events),
    ext AS (
      SELECT CAST(MIN(x) AS BIGINT) AS lo, CAST(MAX(x) AS BIGINT) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM base),
    binned AS (
      SELECT LEAST((x - ext.lo) * {_HIST_BINS} // NULLIF(ext.hi - ext.lo + 1, 0),
                   {_HIST_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base, ext GROUP BY 1),
    probes (probe_id, a, b) AS (VALUES {probes}),
    truth AS (
      SELECT p.probe_id, CAST(COUNT(x) AS BIGINT) AS true_rows
      FROM probes p LEFT JOIN base ON x BETWEEN p.a AND p.b
      GROUP BY 1),
    est AS (
      SELECT p.probe_id,
             CAST(SUM(
               GREATEST(0, LEAST(p.b, ext.lo + (bn.bin + 1)
                   * (ext.hi - ext.lo + 1) // {_HIST_BINS} - 1)
                 - GREATEST(p.a, ext.lo + bn.bin
                   * (ext.hi - ext.lo + 1) // {_HIST_BINS}) + 1)
               * bn.cnt * {_HIST_BINS}
               // NULLIF(ext.hi - ext.lo + 1, 0)) AS BIGINT)
               AS est_equiwidth,
             CAST(ext.n * (p.b - p.a + 1)
               // NULLIF(ext.hi - ext.lo + 1, 0) AS BIGINT)
               AS est_uniform
      FROM probes p CROSS JOIN ext LEFT JOIN binned bn ON TRUE
      GROUP BY 1, ext.n, ext.lo, ext.hi, p.a, p.b)
    SELECT t.probe_id AS probe_id, t.true_rows, e.est_uniform, e.est_equiwidth,
           CAST(ABS(e.est_uniform - t.true_rows) * 1000000
                // GREATEST(t.true_rows, 1) AS BIGINT)
             AS uniform_err_ppm,
           CAST(ABS(e.est_equiwidth - t.true_rows) * 1000000
                // GREATEST(t.true_rows, 1) AS BIGINT)
             AS equiwidth_err_ppm
    FROM truth t JOIN est e ON e.probe_id = t.probe_id
    ORDER BY probe_id
    """


@register("events_histogram_selectivity_audit", _hist_oracle())
def events_histogram_selectivity_audit(spark: SparkSession, sf_dir: str):
    """Histogram selectivity audit — scores the two cardinality-
    estimation models an optimizer actually chooses between (uniform
    min/max interpolation, which Spark uses without ANALYZE, vs a
    {_HIST_BINS}-bin equi-width histogram) against TRUE selectivity
    for three fixed range probes. The gap between uniform_err_ppm and
    equiwidth_err_ppm on the skewed value column IS the case for
    collecting histogram statistics — the third member of the planner-
    audit family (join-CE audit, bloom planner). Exact integer bins
    ((x−lo)·B/(hi−lo+1), pure int arithmetic), exact true counts, and
    both estimators are integer expressions of the bin counts (the
    per-bin overlap fraction multiplies BEFORE dividing, so nothing
    rounds until the final cast). One fact scan for the histogram +
    one probe-tagged count; bins and probes stay bounded. Integer
    division here is floor on non-negatives in both engines — all
    quantities non-negative by construction."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        (dec("value") * 100).cast("bigint").alias("x")
    ).persist()
    ext = base.agg(
        F.min("x").cast("bigint").alias("lo"),
        F.max("x").cast("bigint").alias("hi"),
        F.count("*").cast("bigint").alias("n"),
    )
    binned = (
        base.crossJoin(F.broadcast(ext))
        .groupBy(
            F.expr(
                f"LEAST((x - lo) * {_HIST_BINS}"
                f" div NULLIF(hi - lo + 1, 0), {_HIST_BINS - 1})"
            ).alias("bin")
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    probes = spark.createDataFrame(
        list(_HIST_PROBES), "probe_id INT, a BIGINT, b BIGINT"
    )
    truth = (
        probes.join(
            base,
            (F.col("x") >= F.col("a")) & (F.col("x") <= F.col("b")),
            "left",
        )
        .groupBy("probe_id")
        .agg(F.count("x").cast("bigint").alias("true_rows"))
    )
    est = (
        probes.crossJoin(F.broadcast(ext))
        .join(binned, F.lit(True), "left")
        .groupBy("probe_id", "n", "lo", "hi", "a", "b")
        .agg(
            F.expr(
                f"CAST(SUM(GREATEST(0, LEAST(b, lo + (bin + 1)"
                f" * (hi - lo + 1) div {_HIST_BINS} - 1)"
                f" - GREATEST(a, lo + bin"
                f" * (hi - lo + 1) div {_HIST_BINS}) + 1)"
                f" * cnt * {_HIST_BINS}"
                " div NULLIF(hi - lo + 1, 0)) AS BIGINT)"
            ).alias("est_equiwidth")
        )
        .select(
            "probe_id",
            "est_equiwidth",
            F.expr(
                "CAST(n * (b - a + 1) div NULLIF(hi - lo + 1, 0)"
                " AS BIGINT)"
            ).alias("est_uniform"),
        )
    )
    return (
        truth.join(est, "probe_id")
        .select(
            "probe_id",
            "true_rows",
            "est_uniform",
            "est_equiwidth",
            F.expr(
                "CAST(ABS(est_uniform - true_rows) * 1000000"
                " div GREATEST(true_rows, 1) AS BIGINT)"
            ).alias("uniform_err_ppm"),
            F.expr(
                "CAST(ABS(est_equiwidth - true_rows) * 1000000"
                " div GREATEST(true_rows, 1) AS BIGINT)"
            ).alias("equiwidth_err_ppm"),
        )
        .orderBy("probe_id")
    )


# ------------------------------------------------------------------
# 4. sql_pagination_offset_fetch — OFFSET surface
# ------------------------------------------------------------------

_PAGE_SIZE = 20
_PAGE_NO = 3  # 1-based third page


@register(
    "sql_pagination_offset_fetch",
    f"""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_cents
    FROM orders
    ORDER BY price_cents DESC, o_orderkey
    LIMIT {_PAGE_SIZE} OFFSET {(_PAGE_NO - 1) * _PAGE_SIZE}
    """,
)
def sql_pagination_offset_fetch(spark: SparkSession, sf_dir: str):
    """Keyed pagination via ORDER BY … LIMIT … OFFSET — the SQL
    surface page-serving APIs lean on (Spark supports OFFSET since
    3.4; the optimizer folds it into GlobalLimit(offset+limit) with a
    per-partition TakeOrdered of only offset+limit rows map-side, so
    page 3 never sorts the table). Total order tie-broken by key for
    cross-engine determinism; price in exact cents. The docstring
    caveat IS the scale lesson: OFFSET cost grows with page depth
    (offset+limit rows move to one task) — deep pagination should
    switch to keyset continuation (WHERE (price, key) < last-seen
    ORDER BY LIMIT), which this op's ordering makes directly
    expressible."""
    t(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_page_v"
    )
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                 AS BIGINT) AS price_cents
        FROM orders_page_v
        ORDER BY price_cents DESC, o_orderkey
        LIMIT {_PAGE_SIZE} OFFSET {(_PAGE_NO - 1) * _PAGE_SIZE}
        """
    )


# ------------------------------------------------------------------
# 5. events_watermark_delay_planner — late-data budget tuning
# ------------------------------------------------------------------

_WM_DELAYS = [60, 300, 900]  # candidate watermark delays (seconds)


def _wm_oracle() -> str:
    delays = ", ".join(f"({d})" for d in _WM_DELAYS)
    return f"""
    WITH seq AS (
      SELECT CAST(epoch(ts) AS BIGINT) AS es,
             MAX(CAST(epoch(ts) AS BIGINT)) OVER (PARTITION BY user_id
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS seen_max
      FROM events),
    lateness AS (
      SELECT GREATEST(COALESCE(seen_max - es, 0), 0) AS late_s
      FROM seq),
    delays (delay_sec) AS (VALUES {delays}),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lateness)
    SELECT CAST(d.delay_sec AS BIGINT) AS delay_sec,
           CAST(COUNT(*) FILTER (WHERE l.late_s > d.delay_sec)
             AS BIGINT) AS n_dropped,
           CAST(COUNT(*) FILTER (WHERE l.late_s > d.delay_sec)
             * 1000000 // (SELECT n FROM tot) AS BIGINT)
             AS dropped_ppm
    FROM delays d LEFT JOIN lateness l ON TRUE
    GROUP BY 1 ORDER BY delay_sec
    """


@register("events_watermark_delay_planner", _wm_oracle())
def events_watermark_delay_planner(spark: SparkSession, sf_dir: str):
    """Watermark delay planner — the tuning number every Structured
    Streaming job with withWatermark() needs BEFORE deployment: for
    each candidate delay, how many events would arrive later than the
    watermark (per-key running-max event time minus the event's own
    time, with event_id as the arrival-order proxy) and get dropped
    from stateful aggregations. The streaming ops in the tier CONSUME
    a watermark; this op measures, from replayable history, what each
    setting would cost — the dropped_ppm vs delay curve is the state-
    size/completeness trade made explicit. Lateness is one lag-max
    window PARTITIONED BY user (never a global window); the delay
    grid is a bounded broadcast; counts exact BIGINT, shares integer
    ppm. At 100 TB the window shuffles once on the same user key the
    sessionization ops already use."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        F.unix_timestamp("ts").alias("es"),
        F.max(F.unix_timestamp("ts")).over(w).alias("seen_max"),
    )
    lateness = seq.select(
        F.expr(
            "GREATEST(COALESCE(seen_max - es, 0), 0)"
        ).alias("late_s")
    )
    delays = spark.createDataFrame(
        [(d,) for d in _WM_DELAYS], "delay_sec INT"
    )
    tot = lateness.agg(F.count("*").cast("bigint").alias("n"))
    return (
        delays.join(lateness, F.lit(True), "left")
        .groupBy("delay_sec")
        .agg(
            F.sum(
                F.when(F.col("late_s") > F.col("delay_sec"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("delay_sec").cast("bigint").alias("delay_sec"),
            "n_dropped",
            F.expr(
                "CAST(n_dropped * 1000000 div n AS BIGINT)"
            ).alias("dropped_ppm"),
        )
        .orderBy("delay_sec")
    )


# ------------------------------------------------------------------
# 6. docs_readability_grade — Flesch-Kincaid audit by language
# ------------------------------------------------------------------


@register(
    "docs_readability_grade",
    r"""
    WITH m AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text, '\S+')))
               AS BIGINT) AS words,
             CAST(SUM(GREATEST(len(regexp_extract_all(text,
               '[.!?]+')), 1)) AS BIGINT) AS sentences,
             CAST(SUM(len(regexp_extract_all(lower(text),
               '[aeiouy]+'))) AS BIGINT) AS syllables
      FROM documents GROUP BY 1)
    SELECT lang, n_docs, words, sentences, syllables,
           0.39 * (CAST(words AS DOUBLE) / sentences)
             + 11.8 * (CAST(syllables AS DOUBLE) / words)
             - 15.59 AS fk_grade
    FROM m ORDER BY lang
    """,
)
def docs_readability_grade(spark: SparkSession, sf_dir: str):
    """Flesch-Kincaid grade level per language — the curation-filter
    complement to the quality/Gopher gates: FK = 0.39·(words/sentence)
    + 11.8·(syllables/word) − 15.59, with syllables approximated by
    vowel-group runs (the standard regex surrogate — consistent bias,
    fine for ranking and thresholding) and sentences by terminal-
    punctuation runs, floored at 1 per doc so fragments don't divide
    by zero. Three regexp_extract_all counts fold to exact BIGINT sums
    in ONE map-side aggregate over the bounded language set; the grade
    is a fixed double expression of those integers — engine-identical.
    At 100 TB this shares the single documents scan with every other
    text audit; a per-doc variant is the same expression without the
    groupBy."""
    d = t(spark, sf_dir, "documents")
    m = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0)))
        )
        .cast("bigint")
        .alias("words"),
        F.sum(
            F.greatest(
                F.size(
                    F.regexp_extract_all(
                        F.col("text"), F.lit(r"[.!?]+"), F.lit(0)
                    )
                ),
                F.lit(1),
            )
        )
        .cast("bigint")
        .alias("sentences"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0)
                )
            )
        )
        .cast("bigint")
        .alias("syllables"),
    )
    return m.select(
        "lang",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.expr(
            "0.39 * (CAST(words AS DOUBLE) / sentences)"
            " + 11.8 * (CAST(syllables AS DOUBLE) / words)"
            " - 15.59"
        ).alias("fk_grade"),
    ).orderBy("lang")
