"""Round-5d operators: lakehouse-maintenance and advanced-analytics
shapes that close the remaining day-2-operations gaps — small-file
compaction planning (the table-maintenance job every parquet lake runs
nightly), CUSUM changepoint detection (the ops-side drift alarm),
second-order Markov transitions (higher-order user-journey modeling),
MAD-based robust outlier screening (the quantile-robust complement to
the z-score screen), and incremental aggregate maintenance (partial-agg
merge ≡ full recompute — the IVM contract behind every materialized
rollup).

Reference parity: these extend the §2C analytics surface the same way
the round-5c curation ops do (reference `grover-dev/rad-database-parse`
exposes the query lifecycle in `query.py:24-60`; the maintenance shapes
here are the operational layer a 100 TB deployment of that surface
needs).

Float-parity discipline (registry/__init__.py): money travels as exact
integer cents (BIGINT) or DECIMAL until the final division; divisions
happen in double on identical operands in both engines; ranking on
floats is fixed-point floored and ties break on ids.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, t

# ------------------------------------------ small-file compaction plan
# Target bin size for the packer (bytes). Deliberately small so the plan
# has interesting structure at every test SF; production would use
# 128-1024 MiB.
_COMPACT_TARGET = 16384


@register(
    "files_compaction_plan",
    f"""
    WITH f AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(24 + length(event_type) + length(props)) AS BIGINT)
               AS bytes
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    b AS (
      SELECT event_type, day, bytes,
             COALESCE(SUM(bytes) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM f)
    SELECT event_type,
           CAST(floor(cum_before / {_COMPACT_TARGET}.0) AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           strftime(MIN(day), '%Y-%m-%d') AS first_day,
           strftime(MAX(day), '%Y-%m-%d') AS last_day
    FROM b GROUP BY event_type, bin_id
    """,
)
def files_compaction_plan(spark: SparkSession, sf_dir: str):
    """Small-file compaction planner — the nightly table-maintenance job
    of every parquet/Delta/Iceberg lake. The file inventory is simulated
    as one "file" per (event_type, day) slice with an exact byte proxy
    (fixed row overhead + payload lengths); the packer assigns files to
    target-size output bins by exclusive running byte total within the
    partition column: bin = floor(bytes_before / target). That
    cumsum-bucketing rule is the DISTRIBUTABLE variant of greedy
    first-fit (greedy is inherently sequential; the cumsum rule is
    deterministic, order-stable, and computable in one window pass), and
    it is how real lakehouse optimizers scope rewrite groups. Plan shape:
    one groupBy (file inventory — at scale this is the metadata/manifest
    table, NOT a data scan), one window partitioned by event_type (no
    global sort), one final groupBy. Output is O(#files), driver-safe at
    any corpus size because it aggregates metadata only."""
    ev = t(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.lit(24) + F.length("event_type") + F.length("props")
        ).cast("bigint").alias("bytes")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = files.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    ).withColumn(
        "bin_id",
        F.floor(F.col("cum_before") / F.lit(float(_COMPACT_TARGET))).cast(
            "bigint"
        ),
    )
    return binned.groupBy("event_type", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("bin_bytes"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
    )


# ------------------------------------------ CUSUM changepoint detection
@register(
    "events_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    cum AS (
      SELECT event_type, day, cents,
             CAST(ROW_NUMBER() OVER w_ord AS BIGINT) AS i,
             CAST(SUM(cents) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cents,
             CAST(COUNT(*) OVER w_all AS BIGINT) AS n_days,
             CAST(SUM(cents) OVER w_all AS BIGINT) AS tot_cents
      FROM daily
      WINDOW w_ord AS (PARTITION BY event_type ORDER BY day),
             w_all AS (PARTITION BY event_type)),
    s AS (
      SELECT event_type, day, n_days,
             n_days * cum_cents - i * tot_cents AS cusum_cents
      FROM cum),
    best AS (
      SELECT event_type, day AS cp_day, cusum_cents, n_days,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum_cents) DESC, day) AS rk
      FROM s)
    SELECT event_type, strftime(cp_day, '%Y-%m-%d') AS cp_day,
           cusum_cents, n_days
    FROM best WHERE rk = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str):
    """CUSUM changepoint detection on the daily revenue series per event
    type — the classic sequential drift alarm (Page 1954): the day where
    the cumulative deviation from the series mean peaks is the most
    likely level-shift point. Arithmetic is EXACT end to end: values
    become integer cents, and the mean division is eliminated by scaling
    — S_i = n*cumsum_i - i*total is the CUSUM statistic times n, an
    integer, so both engines agree bit-for-bit and the argmax needs no
    float tolerance (ties break on the earlier day). Plan shape: one
    groupBy to the daily grain (map-side partial combine does the heavy
    lifting — the window then runs over #days rows per type, not raw
    events), two frames over the same event_type partitioning (ONE
    exchange), and a rank-1 filter. At 100 TB the daily grain is already
    tiny; the raw-event groupBy is the only real cost and it is the
    canonical partial-agg shape."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum((dec("value") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type")
    s = (
        daily.withColumn("i", F.row_number().over(w_ord).cast("bigint"))
        .withColumn("cum_cents", F.sum("cents").over(w_run).cast("bigint"))
        .withColumn("n_days", F.count("*").over(w_all).cast("bigint"))
        .withColumn("tot_cents", F.sum("cents").over(w_all).cast("bigint"))
        .select(
            "event_type",
            "day",
            "n_days",
            (
                F.col("n_days") * F.col("cum_cents")
                - F.col("i") * F.col("tot_cents")
            ).alias("cusum_cents"),
        )
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_cents")).desc(), F.col("day")
    )
    return (
        s.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            "cusum_cents",
            "n_days",
        )
    )


# ---------------------------------- second-order Markov transitions
@register(
    "events_second_order_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS nxt,
             LAG(event_type, 1) OVER w AS prev1,
             LAG(event_type, 2) OVER w AS prev2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
      SELECT prev2, prev1, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev2 IS NOT NULL
      GROUP BY prev2, prev1, nxt),
    tot AS (
      SELECT prev2, prev1, nxt, n,
             CAST(SUM(n) OVER (PARTITION BY prev2, prev1) AS BIGINT)
               AS n_context
      FROM tri)
    SELECT prev2, prev1, nxt, n, n_context,
           CAST(floor(1000000.0 * n / n_context) AS BIGINT) AS prob_fp
    FROM tot
    """,
)
def events_second_order_transitions(spark: SparkSession, sf_dir: str):
    """Second-order Markov transition table over user event streams:
    P(next | prev2, prev1) — the higher-order user-journey model that
    first-order transition matrices (event_type_transitions) cannot
    express (e.g. view→click→purchase vs click→view→purchase diverge).
    One user_id-partitioned window supplies both lags in a single pass,
    the trigram groupBy collapses to at most |types|^3 rows (216 here —
    bounded at ANY corpus size), and the conditional probability is a
    window over that bounded table, so the only data-sized cost is the
    one user_id exchange every sessionization query already pays.
    Probabilities are integer fixed-point (floor 1e6·n/total) for exact
    cross-engine agreement."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("nxt"),
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    ).filter(F.col("prev2").isNotNull())
    tri = seq.groupBy("prev2", "prev1", "nxt").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w_ctx = Window.partitionBy("prev2", "prev1")
    return tri.withColumn(
        "n_context", F.sum("n").over(w_ctx).cast("bigint")
    ).withColumn(
        "prob_fp",
        F.floor(F.lit(1000000.0) * F.col("n") / F.col("n_context")).cast(
            "bigint"
        ),
    )


# ------------------------------------------ MAD robust outlier screen
_MAD_K = 3.0


@register(
    "lineitem_mad_outliers",
    f"""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
      FROM lineitem GROUP BY l_returnflag),
    dev AS (
      SELECT l.l_returnflag, m.med_qty,
             abs(l.l_quantity - m.med_qty) AS adev
      FROM lineitem l JOIN med m USING (l_returnflag)),
    mad AS (
      SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad_qty
      FROM dev GROUP BY l_returnflag)
    SELECT d.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           d.med_qty AS med_qty,
           a.mad_qty AS mad_qty,
           CAST(SUM(CASE WHEN d.adev > {_MAD_K} * a.mad_qty
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (l_returnflag)
    GROUP BY d.l_returnflag, d.med_qty, a.mad_qty
    """,
)
def lineitem_mad_outliers(spark: SparkSession, sf_dir: str):
    """Median-absolute-deviation robust outlier screen per return flag —
    the quantile-robust complement to the z-score screen
    (events_anomaly_zscore is mean/stddev — one wild value poisons it;
    MAD's 50% breakdown point does not care). Two exact-median passes
    (the established F.percentile ↔ quantile_cont interpolation parity)
    with the 3-row aggregate broadcast back each time, so the lineitem
    stream never shuffles — both joins are map-side. The deviation and
    the 3·MAD threshold are IEEE ops on identical doubles in both
    engines, so the outlier count is exact. At 100 TB the exact medians
    swap for the mergeable approx_percentile sketch with the same
    output contract (the agg_approx_quantile_check pattern pins that
    sketch's error)."""
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.percentile(dbl(F.col("l_quantity")), 0.5).alias("med_qty")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "med_qty",
        F.abs(F.col("l_quantity") - F.col("med_qty")).alias("adev"),
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.percentile(dbl(F.col("adev")), 0.5).alias("mad_qty")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med_qty", "mad_qty")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(_MAD_K) * F.col("mad_qty"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select("l_returnflag", "n", "med_qty", "mad_qty", "n_outliers")
    )


# --------------------------------- incremental aggregate maintenance
_IVM_CUTOVER = "1997-07-01"


@register(
    "orders_ivm_partial_agg_merge",
    f"""
    WITH base AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate < TIMESTAMP '{_IVM_CUTOVER}'
      GROUP BY month),
    delta AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_IVM_CUTOVER}'
      GROUP BY month),
    merged AS (
      SELECT month, SUM(cnt) AS n_orders, SUM(cents) AS total_cents
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY month)
    SELECT strftime(month, '%Y-%m') AS month,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(total_cents AS BIGINT) AS total_cents,
           CAST(total_cents AS DOUBLE) / (100.0 * n_orders) AS avg_price
    FROM merged
    """,
)
def orders_ivm_partial_agg_merge(spark: SparkSession, sf_dir: str):
    """Incremental view maintenance by partial-aggregate merge: the
    monthly revenue rollup is maintained as mergeable partials
    (count, cents) computed independently over a base segment and a
    delta batch, then merged by re-aggregation — and the merged result
    is IDENTICAL to a full recompute (the oracle runs the same
    two-segment merge; a dedicated test asserts merge ≡ recompute).
    This is the contract that lets a 100 TB deployment maintain
    materialized rollups by folding in each ingest batch instead of
    rescanning history: sums/counts are commutative monoids, cents are
    exact BIGINT, and the final average is derived from merged partials
    only. Plan shape: two pruned scans (the date split is a pushed-down
    predicate), partial agg each side, one union + re-agg on the month
    key — no join, no second pass over either segment."""
    o = t(spark, sf_dir, "orders")
    cut = F.lit(_IVM_CUTOVER).cast("timestamp")

    def partial(df):
        return df.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        ).agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum((dec("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cut))
    delta = partial(o.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionAll(delta)
        .groupBy("month")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )
    return merged.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        "n_orders",
        "total_cents",
        (
            F.col("total_cents").cast("double")
            / (F.lit(100.0) * F.col("n_orders"))
        ).alias("avg_price"),
    )
