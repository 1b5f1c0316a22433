"""Round-6j operators: randomness testing, stopword induction,
procurement risk, peak detection, demand variability, and layout
advisory.

Six more platform operators: the Wald-Wolfowitz runs test on monthly
growth signs, corpus-driven stopword induction by document frequency,
single-source procurement risk per part type, local-maximum peak
detection over the hourly event series, XYZ demand-variability
classification (the companion of ABC/EOQ), and a partition-layout
advisor that turns observed monthly row counts into file-count
recommendations.

Same parity contract as the rest of the registry."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. orders_runs_test — Wald-Wolfowitz randomness check
# ------------------------------------------------------------------


@register(
    "orders_runs_test",
    """
    WITH m AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1),
    s AS (
      SELECT a.ym, CASE WHEN a.rev >= b.rev THEN 1 ELSE 0 END AS up
      FROM m a JOIN m b ON b.ym = a.ym - 1),
    runs AS (
      SELECT COUNT(*) AS n,
             SUM(up) AS n_up,
             COUNT(*) - SUM(up) AS n_down,
             1 + SUM(CASE WHEN up <> prev_up THEN 1 ELSE 0 END) AS n_runs
      FROM (
        SELECT a.up,
               (SELECT b.up FROM s b WHERE b.ym < a.ym
                ORDER BY b.ym DESC LIMIT 1) AS prev_up
        FROM s a))
    SELECT CAST(n AS BIGINT) AS n_signs,
           CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(n_runs AS BIGINT) AS n_runs,
           round(1.0 + 2.0 * n_up * n_down / n, 6) AS expected_runs,
           round((n_runs - (1.0 + 2.0 * n_up * n_down / n))
                 / sqrt(GREATEST(
                     2.0 * n_up * n_down
                     * (2.0 * n_up * n_down - n)
                     / (CAST(n AS DOUBLE) * n * (n - 1)), 1e-12)),
                 6) AS z_stat
    FROM runs
    """,
)
def orders_runs_test(spark: SparkSession, sf_dir: str):
    """Wald-Wolfowitz runs test on the signs of month-over-month
    revenue changes — the classical randomness screen that separates
    a genuinely trending series from noise before anyone fits a trend
    model to it (too few runs ⇒ momentum/trend; too many ⇒
    oscillation): observed run count vs the expected 1 + 2·n₊·n₋/n
    with the usual normal approximation. The series collapses to
    month grain in one combinable groupBy; the sign sequence is a
    1-offset calendar join, the run count is one lag comparison over
    the bounded month table, and the z-statistic is IEEE ops on exact
    integer counts. The correlated-subquery lag in the oracle is the
    month-grain mirror of the Spark window."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("ym")
    ).agg(
        F.sum((dec("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    a = m.select("ym", "rev")
    b = m.select(
        (F.col("ym") + 1).alias("ym"), F.col("rev").alias("rev_prev")
    )
    s = a.join(F.broadcast(b), "ym").select(
        "ym",
        F.when(F.col("rev") >= F.col("rev_prev"), 1)
        .otherwise(0)
        .alias("up"),
    )
    w = Window.orderBy("ym")
    seq = s.withColumn("prev_up", F.lag("up").over(w))
    runs = seq.agg(
        F.count("*").alias("n"),
        F.sum("up").alias("n_up"),
        (F.count("*") - F.sum("up")).alias("n_down"),
        (
            1
            + F.sum(
                F.when(F.col("up") != F.col("prev_up"), 1).otherwise(0)
            )
        ).alias("n_runs"),
    )
    exp_runs = 1.0 + 2.0 * F.col("n_up") * F.col("n_down") / F.col("n")
    var_runs = F.greatest(
        2.0
        * F.col("n_up")
        * F.col("n_down")
        * (2.0 * F.col("n_up") * F.col("n_down") - F.col("n"))
        / (
            F.col("n").cast("double")
            * F.col("n")
            * (F.col("n") - 1)
        ),
        F.lit(1e-12),
    )
    return runs.select(
        F.col("n").cast("bigint").alias("n_signs"),
        F.col("n_up").cast("bigint"),
        F.col("n_down").cast("bigint"),
        F.col("n_runs").cast("bigint"),
        F.round(exp_runs, 6).alias("expected_runs"),
        F.round(
            (F.col("n_runs") - exp_runs) / F.sqrt(var_runs), 6
        ).alias("z_stat"),
    )


# ------------------------------------------------------------------
# 2. docs_stopword_induction — corpus-driven stopword discovery
# ------------------------------------------------------------------

_SW_DF_PPM = 300_000  # tokens present in >30% of documents


@register(
    "docs_stopword_induction",
    f"""
    WITH n_docs AS (SELECT COUNT(*) AS nd FROM documents),
    df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS docfreq
      FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents)
      GROUP BY tok)
    SELECT df.tok AS token,
           CAST(df.docfreq AS BIGINT) AS doc_freq,
           CAST(df.docfreq::HUGEINT * 1000000 // n_docs.nd AS BIGINT)
             AS df_ppm
    FROM df, n_docs
    WHERE df.docfreq::HUGEINT * 1000000 // n_docs.nd >= {_SW_DF_PPM}
    ORDER BY df_ppm DESC, token
    """,
)
def docs_stopword_induction(spark: SparkSession, sf_dir: str):
    """Corpus-driven stopword induction — discover the tokens so
    ubiquitous (document frequency above {_SW_DF_PPM} ppm) that they
    carry no retrieval or dedup signal, instead of trusting a static
    list that misses domain boilerplate ("copyright", template
    navigation). Document frequency is one distinct-per-token
    aggregate (token-grain, combinable); the threshold compares exact
    integer ppm. The induced list is what the TF-IDF, BM25 and
    shingling tiers should subtract — and diffing it against the
    static lang-id stopword list is the drift check between the
    corpus and the assumptions baked into the classifiers."""
    d = t(spark, sf_dir, "documents")
    n_docs = d.agg(F.count("*").alias("nd"))
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    )
    df = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("docfreq")
    )
    return (
        df.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "df_ppm",
            F.expr("CAST(docfreq * 1000000 div nd AS BIGINT)"),
        )
        .filter(F.col("df_ppm") >= _SW_DF_PPM)
        .select(
            F.col("tok").alias("token"),
            F.col("docfreq").cast("bigint").alias("doc_freq"),
            "df_ppm",
        )
        .orderBy(F.col("df_ppm").desc(), "token")
    )


# ------------------------------------------------------------------
# 3. part_single_source_risk — procurement concentration per type
# ------------------------------------------------------------------


@register(
    "part_single_source_risk",
    """
    WITH ps AS (
      SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
      FROM lineitem GROUP BY l_partkey),
    typed AS (
      SELECT p.p_type AS part_type, ps.n_suppliers
      FROM ps JOIN part p ON ps.l_partkey = p.p_partkey)
    SELECT part_type,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(CASE WHEN n_suppliers = 1 THEN 1 END) AS BIGINT)
             AS single_source_parts,
           CAST(COUNT(CASE WHEN n_suppliers = 1 THEN 1 END)::HUGEINT
                * 1000000 // COUNT(*) AS BIGINT) AS single_source_ppm,
           CAST(MIN(n_suppliers) AS BIGINT) AS min_suppliers,
           CAST(SUM(n_suppliers) // COUNT(*) AS BIGINT)
             AS avg_suppliers_floor
    FROM typed GROUP BY part_type ORDER BY part_type
    """,
)
def part_single_source_risk(spark: SparkSession, sf_dir: str):
    """Single-source procurement risk per part type — the supply-chain
    resilience screen: a part observed shipping from exactly ONE
    supplier is a single point of failure, and the per-type
    concentration (share of single-sourced parts, minimum supplier
    count) is what a sourcing review acts on. Two combinable
    aggregations — distinct suppliers per part (the partkey-keyed
    shuffle), then the type rollup behind a dimension join — with
    exact integer ppm shares. Complements supplier_otif_scorecard
    (performance) and nation_supplier_hhi (geographic concentration)
    with the redundancy axis."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    typed = ps.join(
        F.broadcast(p.select("p_partkey", "p_type")),
        ps.l_partkey == F.col("p_partkey"),
    ).select(F.col("p_type").alias("part_type"), "n_suppliers")
    return (
        typed.groupBy("part_type")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.count(F.when(F.col("n_suppliers") == 1, 1))
            .cast("bigint")
            .alias("single_source_parts"),
            F.expr(
                "CAST(COUNT(CASE WHEN n_suppliers = 1 THEN 1 END)"
                " * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("single_source_ppm"),
            F.min("n_suppliers").cast("bigint").alias("min_suppliers"),
            F.expr(
                "CAST(SUM(n_suppliers) div COUNT(*) AS BIGINT)"
            ).alias("avg_suppliers_floor"),
        )
        .orderBy("part_type")
    )


# ------------------------------------------------------------------
# 4. events_hourly_peaks — local-maximum peak detection
# ------------------------------------------------------------------


@register(
    "events_hourly_peaks",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    nbr AS (
      SELECT c.event_type, c.hour, c.n,
             p.n AS n_prev, f.n AS n_next
      FROM hourly c
      LEFT JOIN hourly p ON p.event_type = c.event_type
                        AND p.hour = c.hour - INTERVAL 1 HOUR
      LEFT JOIN hourly f ON f.event_type = c.event_type
                        AND f.hour = c.hour + INTERVAL 1 HOUR)
    SELECT event_type, hour,
           CAST(n AS BIGINT) AS n_events,
           CAST(COALESCE(n_prev, 0) AS BIGINT) AS n_prev,
           CAST(COALESCE(n_next, 0) AS BIGINT) AS n_next,
           CAST(n - GREATEST(COALESCE(n_prev, 0), COALESCE(n_next, 0))
                AS BIGINT) AS prominence
    FROM nbr
    WHERE n > COALESCE(n_prev, 0) AND n > COALESCE(n_next, 0)
    ORDER BY event_type, hour
    """,
)
def events_hourly_peaks(spark: SparkSession, sf_dir: str):
    """Local-maximum peak detection over the hourly event series — the
    traffic-spike inventory an on-call review reads (every hour
    strictly above both neighbors, with its prominence over the taller
    neighbor): the discrete complement of the CUSUM changepoint and
    z-score detectors, which find level SHIFTS rather than spikes.
    The fact log collapses to (type, hour) grain in one combinable
    groupBy; neighbor alignment is two calendar-offset self-joins of
    that bounded table (equi-joins on hour arithmetic — no window, no
    sort), and missing neighbors coalesce to zero so series edges
    behave. Output is bounded by the peak count, and every column is
    an exact integer."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    p = hourly.select(
        F.col("event_type").alias("event_type"),
        (F.col("hour") + F.expr("INTERVAL 1 HOUR")).alias("hour"),
        F.col("n").alias("n_prev"),
    )
    f = hourly.select(
        F.col("event_type").alias("event_type"),
        (F.col("hour") - F.expr("INTERVAL 1 HOUR")).alias("hour"),
        F.col("n").alias("n_next"),
    )
    nbr = (
        hourly.join(p, ["event_type", "hour"], "left")
        .join(f, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            "n",
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
            F.coalesce("n_next", F.lit(0)).alias("n_next"),
        )
    )
    return (
        nbr.filter(
            (F.col("n") > F.col("n_prev"))
            & (F.col("n") > F.col("n_next"))
        )
        .select(
            "event_type",
            "hour",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("n_prev").cast("bigint"),
            F.col("n_next").cast("bigint"),
            (
                F.col("n")
                - F.greatest(F.col("n_prev"), F.col("n_next"))
            )
            .cast("bigint")
            .alias("prominence"),
        )
        .orderBy("event_type", "hour")
    )


# ------------------------------------------------------------------
# 5. part_xyz_variability_classes — demand-variability classing
# ------------------------------------------------------------------

# CV thresholds in ppm: X ≤ 0.5, Y ≤ 1.0, Z above
_XYZ_X_PPM = 500_000
_XYZ_Y_PPM = 1_000_000


@register(
    "part_xyz_variability_classes",
    f"""
    WITH md AS (
      SELECT p.p_type AS part_type,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1) AS ym,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    s AS (
      SELECT part_type, COUNT(*) AS m,
             SUM(qty::HUGEINT) AS sq,
             SUM(qty::HUGEINT * qty) AS sqq
      FROM md GROUP BY part_type),
    cv AS (
      SELECT part_type, m, sq,
             CAST(round(sqrt(CAST(m * sqq - sq * sq AS DOUBLE))
                        / CAST(sq AS DOUBLE) * sqrt(CAST(m AS DOUBLE)
                                                    / (m - 1))
                        * 1000000) AS BIGINT) AS cv_ppm
      FROM s WHERE m > 1 AND sq > 0)
    SELECT part_type,
           CAST(m AS BIGINT) AS n_months,
           CAST(sq AS BIGINT) AS total_qty,
           cv_ppm,
           CASE WHEN cv_ppm <= {_XYZ_X_PPM} THEN 'X'
                WHEN cv_ppm <= {_XYZ_Y_PPM} THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM cv ORDER BY part_type
    """,
)
def part_xyz_variability_classes(spark: SparkSession, sf_dir: str):
    """XYZ demand-variability classification per part type — the
    planning-stability companion to ABC value classing
    (supplier_abc_classification) and the EOQ plan
    (part_type_eoq_plan): X = steady demand you can forecast and
    automate, Z = erratic demand that needs safety stock and human
    review, classified by the coefficient of variation of MONTHLY
    demand. Monthly quantities aggregate exactly; the CV comes from
    the exact integer moment sums (m·Σq²−(Σq)² in HUGEINT) with one
    sqrt/division pass of identical IEEE operands, quantized to ppm
    before the literal class thresholds — so the class assignment is
    deterministic in both engines. Type×month grain bounds everything
    after the one fact groupBy."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    md = (
        li.join(F.broadcast(p.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy(
            F.col("p_type").alias("part_type"),
            (
                F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
            ).alias("ym"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty")
        )
    )
    big = "decimal(38,0)"
    s = md.groupBy("part_type").agg(
        F.count("*").alias("m"),
        F.sum(F.col("qty").cast(big)).alias("sq"),
        F.sum((F.col("qty").cast(big) * F.col("qty")).cast(big)).alias(
            "sqq"
        ),
    )
    cv_ppm = F.round(
        F.sqrt(
            (F.col("m") * F.col("sqq") - F.col("sq") * F.col("sq")).cast(
                "double"
            )
        )
        / F.col("sq").cast("double")
        * F.sqrt(
            F.col("m").cast("double") / (F.col("m") - 1)
        )
        * 1_000_000
    ).cast("bigint")
    return (
        s.filter((F.col("m") > 1) & (F.col("sq") > 0))
        .select(
            "part_type",
            F.col("m").cast("bigint").alias("n_months"),
            F.col("sq").cast("bigint").alias("total_qty"),
            cv_ppm.alias("cv_ppm"),
        )
        .withColumn(
            "xyz_class",
            F.when(F.col("cv_ppm") <= _XYZ_X_PPM, "X")
            .when(F.col("cv_ppm") <= _XYZ_Y_PPM, "Y")
            .otherwise("Z"),
        )
        .orderBy("part_type")
    )


# ------------------------------------------------------------------
# 6. orders_partition_layout_advisor — file-layout planning
# ------------------------------------------------------------------

_LAYOUT_ROW_BYTES = 64  # estimated bytes/row after parquet encoding
_LAYOUT_TARGET_MB = 128


@register(
    "orders_partition_layout_advisor",
    f"""
    WITH m AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS ym,
             COUNT(*) AS n_rows
      FROM orders GROUP BY 1)
    SELECT CAST(ym // 12 AS INT) AS year,
           CAST(1 + ym % 12 AS INT) AS month_in_year,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_rows * {_LAYOUT_ROW_BYTES} AS BIGINT) AS est_bytes,
           CAST(GREATEST((n_rows * {_LAYOUT_ROW_BYTES}
                          + {_LAYOUT_TARGET_MB} * 1048576 - 1)
                         // ({_LAYOUT_TARGET_MB} * 1048576), 1) AS BIGINT)
             AS recommended_files,
           CAST(n_rows // GREATEST((n_rows * {_LAYOUT_ROW_BYTES}
                                    + {_LAYOUT_TARGET_MB} * 1048576 - 1)
                                   // ({_LAYOUT_TARGET_MB} * 1048576), 1)
                AS BIGINT) AS rows_per_file
    FROM m ORDER BY year, month_in_year
    """,
)
def orders_partition_layout_advisor(spark: SparkSession, sf_dir: str):
    """Partition-layout advisor — turn observed per-month row counts
    into the file-count plan a writer should use (ceil of estimated
    bytes over the {_LAYOUT_TARGET_MB} MB target, floored at one),
    the planning half of the lakehouse-maintenance trio next to
    files_compaction_plan (fixing yesterday's small files) and
    zorder_layout_orders (ordering within them). All integer ceiling
    arithmetic ((b + T − 1) div T — no float) from one combinable
    month-grain groupBy; the row-width constant is the estimate a real
    advisor would read from parquet footer stats. At 100 TB this is
    the query a nightly writer runs BEFORE choosing repartition(n) per
    partition — undersized files waste scan parallelism, oversized
    ones break retry granularity."""
    o = t(spark, sf_dir, "orders")
    tgt = _LAYOUT_TARGET_MB * 1048576
    m = o.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("ym")
    ).agg(F.count("*").alias("n_rows"))
    rec = F.greatest(
        F.expr(
            f"CAST((n_rows * {_LAYOUT_ROW_BYTES} + {tgt} - 1)"
            f" div {tgt} AS BIGINT)"
        ),
        F.lit(1).cast("bigint"),
    )
    return m.select(
        F.expr("CAST(ym div 12 AS INT)").alias("year"),
        (1 + F.col("ym") % 12).cast("int").alias("month_in_year"),
        F.col("n_rows").cast("bigint"),
        (F.col("n_rows") * _LAYOUT_ROW_BYTES)
        .cast("bigint")
        .alias("est_bytes"),
        rec.alias("recommended_files"),
        F.expr(
            f"CAST(n_rows div GREATEST((n_rows * {_LAYOUT_ROW_BYTES}"
            f" + {tgt} - 1) div {tgt}, 1) AS BIGINT)"
        ).alias("rows_per_file"),
    ).orderBy("year", "month_in_year")
