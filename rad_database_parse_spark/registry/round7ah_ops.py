"""Round-7ah operators: grid quantile regression, mixture temperature
sampling plan, business-day SLA, snapshot-vs-CDC cost model,
cumulative-distinct emulation, and a freshness/staleness audit.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. lineitem_quantile_regression_grid — median regression by grid
# ------------------------------------------------------------------

# slope grid in milli-units of quantity per discount point
_QR_SLOPES = list(range(-500, 501, 100))


def _qr_oracle() -> str:
    slopes = ", ".join(f"({b})" for b in _QR_SLOPES)
    return f"""
    WITH base AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS x,
             CAST(l_quantity AS BIGINT) * 1000 AS y_milli
      FROM lineitem),
    grid (slope_milli) AS (VALUES {slopes}),
    resid AS (
      SELECT CAST(g.slope_milli AS BIGINT) AS slope_milli,
             b.y_milli - g.slope_milli * b.x AS r
      FROM base b CROSS JOIN grid g),
    med AS (
      SELECT slope_milli,
             CAST(round(quantile_cont(r, 0.5)) AS BIGINT)
               AS intercept_milli
      FROM resid GROUP BY 1),
    loss AS (
      SELECT r.slope_milli, m.intercept_milli,
             CAST(SUM(ABS(r.r - m.intercept_milli)) // 2 AS BIGINT)
               AS pinball_sum_milli
      FROM resid r JOIN med m ON m.slope_milli = r.slope_milli
      GROUP BY 1, 2),
    best AS (
      SELECT MIN(pinball_sum_milli) AS mn FROM loss)
    SELECT l.slope_milli, l.intercept_milli, l.pinball_sum_milli,
           CAST(CASE WHEN l.pinball_sum_milli = b.mn THEN 1 ELSE 0
             END AS INT) AS is_best
    FROM loss l CROSS JOIN best b
    ORDER BY slope_milli
    """


@register("lineitem_quantile_regression_grid", _qr_oracle())
def lineitem_quantile_regression_grid(spark: SparkSession, sf_dir: str):
    """Median (tau=0.5 quantile) regression of quantity on discount by
    slope-grid search — the robust-regression member the OLS/Theil-Sen
    family lacks: quantile regression minimizes pinball loss, and for
    FIXED slope the optimal intercept is exactly the median of the
    residuals, so an 11-point slope grid turns the non-smooth LP into
    11 medians + 11 absolute-deviation sums — fully deterministic,
    distributed, no iterative solver. All arithmetic in exact milli
    integers (x = discount points, y = quantity·1000); the medians
    land on .5-grain binary-exact doubles and round once; tau=0.5
    pinball = |r|/2 stays integer.

    r9 re-plan: the grid no longer crosses FACT rows — residuals for
    every slope are a function of (x, y) alone, so one fact scan
    aggregates to (x, y, n) sufficient statistics (≤ |distinct
    discounts| × |distinct quantities| rows — ~550 here, bounded by
    value domains, and degrading gracefully toward fact grain on
    continuous data, never past it), the 11-slope cross runs on that
    bounded table, the median becomes Spark's exact frequency-weighted
    percentile(r, 0.5, n) (identical multiset ⇒ identical
    interpolation), and the pinball sum weights by n. This deletes the
    old 11×-fact persisted residual cache — the thing that would
    actually hurt at 100 TB — and measured 4.9-6.3s → ~1.1s at sf0.1
    with values identical (SCALE.md). is_best marks the grid argmin;
    the flat-vs-sharp loss profile around it is the identifiability
    readout."""
    li = t(spark, sf_dir, "lineitem")
    xy = (
        li.select(
            (dec("l_discount") * 100).cast("bigint").alias("x"),
            (F.col("l_quantity").cast("bigint") * 1000).alias("y_milli"),
        )
        .groupBy("x", "y_milli")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    grid = spark.createDataFrame(
        [(b,) for b in _QR_SLOPES], "slope_milli BIGINT"
    )
    resid = xy.crossJoin(F.broadcast(grid)).select(
        "slope_milli",
        (F.col("y_milli") - F.col("slope_milli") * F.col("x")).alias("r"),
        "n",
    )
    med = resid.groupBy("slope_milli").agg(
        F.expr(
            "CAST(round(percentile(r, 0.5, n)) AS BIGINT)"
        ).alias("intercept_milli")
    )
    loss = (
        resid.join(F.broadcast(med), "slope_milli")
        .groupBy("slope_milli", "intercept_milli")
        .agg(
            F.expr(
                "CAST(SUM(n * ABS(r - intercept_milli)) div 2 AS BIGINT)"
            ).alias("pinball_sum_milli")
        )
    )
    best = loss.agg(F.min("pinball_sum_milli").alias("mn"))
    return (
        loss.crossJoin(F.broadcast(best))
        .select(
            "slope_milli",
            "intercept_milli",
            "pinball_sum_milli",
            F.when(F.col("pinball_sum_milli") == F.col("mn"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_best"),
        )
        .orderBy("slope_milli")
    )


# ------------------------------------------------------------------
# 2. docs_mixture_temperature_plan — T5-style sampling temperatures
# ------------------------------------------------------------------

# temperatures restricted to powers of two so p^(1/T) is sqrt chains —
# IEEE sqrt is correctly rounded, hence engine-identical (pow is not)
_MIX_TEMPS = [1, 2, 4]


def _mix_oracle() -> str:
    def root(expr: str, temp: int) -> str:
        out = expr
        n = temp
        while n > 1:
            out = f"sqrt({out})"
            n //= 2
        return out

    branches = []
    for temp in _MIX_TEMPS:
        term = root("CAST(p_ppm AS DOUBLE) / 1000000.0", temp)
        branches.append(
            f"""
      SELECT CAST({temp} AS BIGINT) AS temperature, source, p_ppm,
             CAST(round(1000000000.0 * {term}) AS BIGINT) AS tq
      FROM shares"""
        )
    terms = "\n      UNION ALL\n      ".join(branches)
    return f"""
    WITH tok AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS n FROM tok),
    shares AS (
      SELECT source, CAST(toks * 1000000 // (SELECT n FROM tot)
        AS BIGINT) AS p_ppm
      FROM tok),
    terms AS (
      {terms}),
    norm AS (
      SELECT temperature, CAST(SUM(tq) AS BIGINT) AS z
      FROM terms GROUP BY 1)
    SELECT t.temperature AS temperature, t.source, t.p_ppm,
           CAST(t.tq * 1000000 // n.z AS BIGINT) AS weight_ppm,
           CAST(t.tq * 1000000 // n.z * 1000
                // GREATEST(t.p_ppm, 1) AS BIGINT) AS boost_milli
    FROM terms t JOIN norm n ON n.temperature = t.temperature
    ORDER BY temperature, source
    """


@register("docs_mixture_temperature_plan", _mix_oracle())
def docs_mixture_temperature_plan(spark: SparkSession, sf_dir: str):
    """Temperature-scaled mixture sampling plan (T5/mT5 recipe): a
    training mix sampled ∝ p^(1/T) upweights small sources as T grows
    — T=1 is proportional, T→∞ uniform — and THIS table (weight and
    boost per source per T) is what a data-mixing config actually
    contains. Temperatures are restricted to powers of two so p^(1/T)
    evaluates as a sqrt chain: IEEE sqrt is CORRECTLY ROUNDED (unlike
    pow/exp, which differ across libms in the last ulp), so both
    engines produce bit-identical terms, which then micro-quantize to
    integers BEFORE the normalization sum — the engine-parity trick
    that makes a fractional-power op gateable at all. One token-count
    scan, then everything is source-grain (bounded). boost_milli > 1000
    marks the upweighted tail sources — the low-resource languages in
    the mT5 story."""
    d = t(spark, sf_dir, "documents")
    tok = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("toks")
    )
    tot = tok.agg(F.sum("toks").cast("bigint").alias("n"))
    shares = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr("CAST(toks * 1000000 div n AS BIGINT)").alias("p_ppm"),
    )
    terms = None
    for temp in _MIX_TEMPS:
        expr = "CAST(p_ppm AS DOUBLE) / 1000000.0"
        n = temp
        while n > 1:
            expr = f"sqrt({expr})"
            n //= 2
        branch = shares.select(
            F.lit(temp).cast("bigint").alias("temperature"),
            "source",
            "p_ppm",
            F.expr(
                f"CAST(round(1000000000.0 * {expr}) AS BIGINT)"
            ).alias("tq"),
        )
        terms = branch if terms is None else terms.union(branch)
    norm = terms.groupBy("temperature").agg(
        F.sum("tq").cast("bigint").alias("z")
    )
    return (
        terms.join(F.broadcast(norm), "temperature")
        .select(
            "temperature",
            "source",
            "p_ppm",
            F.expr("CAST(tq * 1000000 div z AS BIGINT)").alias(
                "weight_ppm"
            ),
            F.expr(
                "CAST(tq * 1000000 div z * 1000"
                " div GREATEST(p_ppm, 1) AS BIGINT)"
            ).alias("boost_milli"),
        )
        .orderBy("temperature", "source")
    )


# ------------------------------------------------------------------
# 3. orders_business_day_sla — weekday-aware latency compliance
# ------------------------------------------------------------------

_SLA_BIZ_DAYS = 10
# 1992-01-01 (the epoch used across the tier) is a WEDNESDAY; business
# days in a partial week starting Wednesday: r=0..6 -> extra weekdays
_BIZ_EXTRA = [0, 1, 2, 3, 3, 3, 4]


def _biz_count(day: str) -> str:
    """SQL: # business days in [epoch, epoch + day) for epoch=Wed."""
    extra = " ".join(
        f"WHEN {r} THEN {v}" for r, v in enumerate(_BIZ_EXTRA)
    )
    return (
        f"(({day}) // 7 * 5 + CASE ({day}) % 7 {extra} END)"
    )


def _biz_count_spark(day: str) -> str:
    extra = " ".join(
        f"WHEN {r} THEN {v}" for r, v in enumerate(_BIZ_EXTRA)
    )
    return (
        f"(({day}) div 7 * 5 + CASE ({day}) % 7 {extra} END)"
    )


@register(
    "orders_business_day_sla",
    f"""
    WITH iv AS (
      SELECT o.o_orderpriority AS pr,
             datediff('day', DATE '1992-01-01',
               CAST(o.o_orderdate AS DATE)) AS d0,
             datediff('day', DATE '1992-01-01',
               MAX(CAST(l.l_shipdate AS DATE))) AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, o.o_orderkey, 2),
    biz AS (
      SELECT pr,
             {_biz_count('d1')} - {_biz_count('d0')} AS biz_days
      FROM iv)
    SELECT pr AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN biz_days <= {_SLA_BIZ_DAYS} THEN 1
             ELSE 0 END) AS BIGINT) AS n_within_sla,
           CAST(SUM(CASE WHEN biz_days <= {_SLA_BIZ_DAYS} THEN 1
             ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS sla_ppm,
           CAST(SUM(biz_days) * 1000 // COUNT(*) AS BIGINT)
             AS biz_days_mean_milli
    FROM biz GROUP BY 1 ORDER BY priority
    """,
)
def orders_business_day_sla(spark: SparkSession, sf_dir: str):
    """SLA compliance in BUSINESS days — the calendar arithmetic ops
    teams actually contract on (10 business days, not 14 calendar):
    business-day distance computes closed-form from epoch-day
    integers — 5·(d div 7) plus a 7-entry partial-week table anchored
    at the epoch's known weekday (1992-01-01 is a Wednesday) — so
    there is NO per-engine dayofweek() call (Spark and DuckDB number
    weekdays differently; the epoch-anchored mod-7 sidesteps the whole
    convention mismatch, the same trick the fiscal-445 op uses for
    week alignment). Pure integer arithmetic end to end, one fact
    fold to order grain, one priority-grain census. The URGENT-vs-LOW
    sla_ppm gap (or its absence) is the op's business finding — TPC-H
    famously ships all priorities alike."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("pr"),
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).alias("d0"),
        )
        .agg(
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.lit("1992-01-01").cast("date"),
            ).alias("d1")
        )
    )
    biz = iv.select(
        "pr",
        F.expr(
            f"{_biz_count_spark('d1')} - {_biz_count_spark('d0')}"
        ).alias("biz_days"),
    )
    return (
        biz.groupBy(F.col("pr").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(
                F.when(F.col("biz_days") <= _SLA_BIZ_DAYS, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_within_sla"),
            F.sum("biz_days").cast("bigint").alias("sum_biz"),
        )
        .select(
            "priority",
            "n_orders",
            "n_within_sla",
            F.expr(
                "CAST(n_within_sla * 1000000 div n_orders AS BIGINT)"
            ).alias("sla_ppm"),
            F.expr(
                "CAST(sum_biz * 1000 div n_orders AS BIGINT)"
            ).alias("biz_days_mean_milli"),
        )
        .orderBy("priority")
    )


# ------------------------------------------------------------------
# 4. orders_snapshot_vs_cdc_cost — replication strategy arithmetic
# ------------------------------------------------------------------

_ROW_BYTES = 64          # serialized order row estimate
_CDC_OVERHEAD_BYTES = 32  # per-change envelope (op, ts, key, lsn)


@register(
    "orders_snapshot_vs_cdc_cost",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1),
    m AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily)
    SELECT n_rows, n_days,
           CAST(n_rows * 1000 // n_days AS BIGINT)
             AS inserts_per_day_milli,
           CAST(n_rows * {_ROW_BYTES} AS BIGINT)
             AS snapshot_bytes_per_day,
           CAST(n_rows * ({_ROW_BYTES} + {_CDC_OVERHEAD_BYTES})
                // n_days AS BIGINT) AS cdc_bytes_per_day,
           CAST(n_rows * {_ROW_BYTES} * 1000000
                // (n_rows * ({_ROW_BYTES} + {_CDC_OVERHEAD_BYTES})
                    // n_days) AS BIGINT) AS snapshot_over_cdc_ppm
    FROM m
    """,
)
def orders_snapshot_vs_cdc_cost(spark: SparkSession, sf_dir: str):
    """Snapshot-vs-CDC replication cost model — the arithmetic that
    decides a pipeline's nightly architecture: a full daily snapshot
    re-ships EVERY row (n_rows × row_bytes, every day), while CDC
    ships only the day's changes plus an envelope; their ratio is the
    table's effective change rate inverted, and for an append-only
    orders table with ~uniform daily inserts the model shows snapshot
    cost growing linearly with history while CDC stays flat — the
    ppm ratio IS the decision. Inputs measured from the data (row
    count, active days, inserts/day); byte constants are declared
    literals (row ~{_ROW_BYTES}B, envelope +{_CDC_OVERHEAD_BYTES}B —
    swap for measured sizes in production). One scan, day-grain fold,
    pure BIGINT. The tier's txn_change_data_feed op implements the
    CDC side this planner prices."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    m = daily.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    return m.select(
        "n_rows",
        "n_days",
        F.expr("CAST(n_rows * 1000 div n_days AS BIGINT)").alias(
            "inserts_per_day_milli"
        ),
        F.expr(f"CAST(n_rows * {_ROW_BYTES} AS BIGINT)").alias(
            "snapshot_bytes_per_day"
        ),
        F.expr(
            f"CAST(n_rows * ({_ROW_BYTES} + {_CDC_OVERHEAD_BYTES})"
            " div n_days AS BIGINT)"
        ).alias("cdc_bytes_per_day"),
        F.expr(
            f"CAST(n_rows * {_ROW_BYTES} * 1000000"
            f" div (n_rows * ({_ROW_BYTES} + {_CDC_OVERHEAD_BYTES})"
            " div n_days) AS BIGINT)"
        ).alias("snapshot_over_cdc_ppm"),
    )


# ------------------------------------------------------------------
# 5. orders_cumulative_distinct_customers — windowed COUNT(DISTINCT)
# ------------------------------------------------------------------


@register(
    "orders_cumulative_distinct_customers",
    """
    WITH firsts AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate) - 1)
               AS first_ym
      FROM orders GROUP BY 1),
    monthly_new AS (
      SELECT first_ym AS ym, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY 1),
    months AS (
      SELECT DISTINCT year(o_orderdate) * 12 + month(o_orderdate) - 1
        AS ym
      FROM orders)
    SELECT CAST(m.ym AS BIGINT) AS ym,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_customers,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY m.ym
             ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_distinct_customers
    FROM months m LEFT JOIN monthly_new n ON n.ym = m.ym
    ORDER BY ym
    """,
)
def orders_cumulative_distinct_customers(spark: SparkSession, sf_dir: str):
    """Cumulative COUNT(DISTINCT) over a running window — the metric
    every growth dashboard wants and no engine supports directly
    (COUNT(DISTINCT) OVER is unsupported in Spark AND DuckDB): the
    standard rewrite attributes each customer to their FIRST month
    (one customer-grain fold — scale-safe partitioning by key), counts
    first-appearances per month, and a cumulative sum over the BOUNDED
    month axis reproduces the running distinct total exactly. The
    month-axis window is ~84 rows by construction — the unpartitioned
    window is bounded-size, never fact-grain (the distinction the
    NTILE re-plan documented). Pure integer counts; months densified
    from the data so the left join surfaces zero-new months
    explicitly."""
    o = t(spark, sf_dir, "orders")
    ym = F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
    firsts = o.groupBy("o_custkey").agg(
        F.min(ym).alias("first_ym")
    )
    monthly_new = firsts.groupBy(
        F.col("first_ym").alias("ym")
    ).agg(F.count("*").cast("bigint").alias("n_new"))
    months = o.select(ym.alias("ym")).distinct()
    w = Window.orderBy("ym").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        months.join(monthly_new, "ym", "left")
        .select(
            F.col("ym").cast("bigint").alias("ym"),
            F.coalesce(F.col("n_new"), F.lit(0))
            .cast("bigint")
            .alias("n_new_customers"),
        )
        .select(
            "ym",
            "n_new_customers",
            F.sum("n_new_customers")
            .over(w)
            .cast("bigint")
            .alias("cumulative_distinct_customers"),
        )
        .orderBy("ym")
    )


# ------------------------------------------------------------------
# 6. dq_freshness_staleness_audit — pipeline lag census
# ------------------------------------------------------------------


@register(
    "dq_freshness_staleness_audit",
    """
    WITH marks AS (
      SELECT 'orders' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MAX(CAST(o_orderdate AS DATE)) AS latest
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
             MAX(CAST(l_shipdate AS DATE))
      FROM lineitem
      UNION ALL
      SELECT 'events', CAST(COUNT(*) AS BIGINT),
             MAX(CAST(ts AS DATE))
      FROM events),
    ref AS (SELECT MAX(latest) AS wm FROM marks)
    SELECT m.table_name, m.n_rows,
           CAST(datediff('day', DATE '1992-01-01', m.latest)
             AS BIGINT) AS latest_epoch_day,
           CAST(datediff('day', m.latest, r.wm) AS BIGINT)
             AS staleness_days
    FROM marks m CROSS JOIN ref r
    ORDER BY table_name
    """,
)
def dq_freshness_staleness_audit(spark: SparkSession, sf_dir: str):
    """Freshness/staleness census — the first DQ check any scheduler
    fires and the one that catches a silently-stalled ingest before
    any content check can: each table's high-water mark (its natural
    event-time column) against the NEWEST mark across the catalog,
    in days behind. Anchored to epoch-day integers (no wall-clock
    dependence — the audit is reproducible and oracle-gateable, and a
    production run swaps current_date in for the cross-table
    watermark). MAX per table is the cheapest possible scan (parquet
    footer statistics answer it without reading data pages when the
    reader exposes them — at 100 TB this audit is metadata-only);
    the union is three 1-row aggregates. The lineitem-vs-events
    staleness asymmetry in the output is the synthetic catalog's
    actual shape, not an error."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ev = t(spark, sf_dir, "events")
    marks = (
        o.agg(
            F.lit("orders").alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.max(F.col("o_orderdate").cast("date")).alias("latest"),
        )
        .union(
            li.agg(
                F.lit("lineitem").alias("table_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.max(F.col("l_shipdate").cast("date")).alias("latest"),
            )
        )
        .union(
            ev.agg(
                F.lit("events").alias("table_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.max(F.col("ts").cast("date")).alias("latest"),
            )
        )
    )
    ref = marks.agg(F.max("latest").alias("wm"))
    return (
        marks.crossJoin(F.broadcast(ref))
        .select(
            "table_name",
            "n_rows",
            F.datediff(F.col("latest"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("latest_epoch_day"),
            F.datediff(F.col("wm"), F.col("latest"))
            .cast("bigint")
            .alias("staleness_days"),
        )
        .orderBy("table_name")
    )
