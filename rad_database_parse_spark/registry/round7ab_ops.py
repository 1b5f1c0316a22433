"""Round-7ab operators: Bhattacharyya distribution overlap and an
RLE compression estimate.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dec, t

# ------------------------------------------------------------------
# 1. part_price_bhattacharyya_overlap — distribution overlap matrix
# ------------------------------------------------------------------

_BH_BIN_CENTS = 10_000  # $100 price bins
_BH_TOPK = 10


@register(
    "part_price_bhattacharyya_overlap",
    f"""
    WITH binned AS (
      SELECT p_brand AS brand,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               // {_BH_BIN_CENTS} AS bin,
             CAST(COUNT(*) AS BIGINT) AS c,
             SUM(COUNT(*)) OVER (PARTITION BY p_brand) AS tot
      FROM part GROUP BY 1, 2),
    probs AS (
      SELECT brand, bin,
             CAST(c * 1000000 // tot AS BIGINT) AS p_ppm
      FROM binned),
    shared AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(SUM(CAST(round(1e3 * sqrt(CAST(a.p_ppm AS DOUBLE)
               * b.p_ppm / 1e6)) AS BIGINT)) AS BIGINT) AS bc_milli_ppm
      FROM probs a JOIN probs b
        ON b.bin = a.bin AND a.brand < b.brand
      GROUP BY 1, 2),
    grid AS (
      SELECT x.brand AS brand_a, y.brand AS brand_b
      FROM (SELECT DISTINCT brand FROM probs) x
      JOIN (SELECT DISTINCT brand FROM probs) y ON x.brand < y.brand),
    pairs AS (
      SELECT g.brand_a, g.brand_b,
             CAST(COALESCE(s.bc_milli_ppm, 0) AS BIGINT)
               AS bc_milli_ppm
      FROM grid g LEFT JOIN shared s
        ON s.brand_a = g.brand_a AND s.brand_b = g.brand_b)
    SELECT brand_a, brand_b,
           CAST(bc_milli_ppm // 1000 AS BIGINT) AS bhattacharyya_ppm
    FROM pairs
    ORDER BY bc_milli_ppm, brand_a, brand_b
    LIMIT {_BH_TOPK}
    """,
)
def part_price_bhattacharyya_overlap(spark: SparkSession, sf_dir: str):
    """Bhattacharyya coefficient between brand price distributions —
    the overlap member of the distribution-distance family (PSI and
    Wasserstein in the tier measure DRIFT of one series over time;
    BC = sum sqrt(p_i q_i) measures how much two populations SHARE,
    1 = identical, 0 = disjoint — the substitutability prior pricing
    and assortment models start from). Per-brand histograms on a
    fixed $100 grid are exact ppm; each bin's sqrt term quantizes to
    milli-ppm from identically-derived doubles BEFORE the pair sum,
    so both engines add identical integers. The pair join is
    (brand x bin) equi on the bounded bin grid — 25 brands x ~50
    bins, never fact-grain. The {_BH_TOPK} LEAST-overlapping pairs
    surface (the interesting tail: candidate premium/value splits)."""
    p = t(spark, sf_dir, "part")
    binned = p.groupBy(
        F.col("p_brand").alias("brand"),
        F.expr(
            "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100"
            f" AS BIGINT) div {_BH_BIN_CENTS}"
        ).alias("bin"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    binned = binned.select(
        "brand",
        "bin",
        "c",
        F.sum("c").over(Window.partitionBy("brand")).alias("tot"),
    )
    probs = binned.select(
        "brand",
        "bin",
        F.expr("CAST(c * 1000000 div tot AS BIGINT)").alias("p_ppm"),
    )
    b = probs.select(
        F.col("brand").alias("brand_b"),
        F.col("bin").alias("bin2"),
        F.col("p_ppm").alias("q_ppm"),
    )
    shared = (
        probs.join(
            b,
            (F.col("bin2") == F.col("bin"))
            & (F.col("brand") < F.col("brand_b")),
        )
        .groupBy(F.col("brand").alias("brand_a"), "brand_b")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(1e3 * sqrt(CAST(p_ppm AS DOUBLE)"
                    " * q_ppm / 1e6)) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("bc_milli_ppm")
        )
    )
    brands = probs.select("brand").distinct()
    grid = brands.select(F.col("brand").alias("brand_a")).join(
        brands.select(F.col("brand").alias("brand_b")),
        F.col("brand_a") < F.col("brand_b"),
    )
    pairs = grid.join(shared, ["brand_a", "brand_b"], "left").select(
        "brand_a",
        "brand_b",
        F.coalesce(F.col("bc_milli_ppm"), F.lit(0))
        .cast("bigint")
        .alias("bc_milli_ppm"),
    )
    return (
        pairs.select(
            "brand_a",
            "brand_b",
            F.expr("CAST(bc_milli_ppm div 1000 AS BIGINT)").alias(
                "bhattacharyya_ppm"
            ),
        )
        .orderBy("bhattacharyya_ppm", "brand_a", "brand_b")
        .limit(_BH_TOPK)
    )


# ------------------------------------------------------------------
# 2. orders_rle_compression_estimate — layout-aware encoding plan
# ------------------------------------------------------------------


@register(
    "orders_rle_compression_estimate",
    """
    WITH seq AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
             o_orderstatus AS st, o_orderpriority AS pr,
             CASE WHEN o_orderstatus != LAG(o_orderstatus) OVER w
                    OR LAG(o_orderstatus) OVER w IS NULL
                  THEN 1 ELSE 0 END AS st_break,
             CASE WHEN o_orderpriority != LAG(o_orderpriority) OVER w
                    OR LAG(o_orderpriority) OVER w IS NULL
                  THEN 1 ELSE 0 END AS pr_break
      FROM orders
      WINDOW w AS (PARTITION BY year(o_orderdate) * 12
                     + month(o_orderdate) ORDER BY o_orderdate,
                   o_orderkey)),
    agg AS (
      SELECT 'o_orderstatus' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(st_break) AS BIGINT) AS n_runs
      FROM seq
      UNION ALL
      SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(pr_break) AS BIGINT)
      FROM seq)
    SELECT column_name, n_rows, n_runs,
           CAST(n_rows * 1000 // n_runs AS BIGINT) AS avg_run_len_milli,
           CAST(n_runs * 1000000 // n_rows AS BIGINT)
             AS rle_size_ratio_ppm
    FROM agg ORDER BY column_name
    """,
)
def orders_rle_compression_estimate(spark: SparkSession, sf_dir: str):
    """Run-length-encoding payoff estimate for the low-cardinality
    order columns under the table's date-ordered layout — the
    encoding-selection number a columnar writer needs (RLE size is
    proportional to RUN COUNT, so rle_size_ratio_ppm ~ 1e6/avg-run;
    a 5-value column in random order runs ~1.25 long and RLE loses,
    the same column sorted runs thousands long and RLE wins 100x —
    this op measures where THIS layout actually sits, the
    value-level sibling of the varbyte postings estimate and the
    zorder layout op). Run breaks come from a lag window PARTITIONED
    by month over the (date, key) order — per-partition run counts
    are exact and the month-boundary break inflates runs by at most
    #months, documented. One scan, two-row output."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy(
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.when(
            (F.col("o_orderstatus") != F.lag("o_orderstatus").over(w))
            | F.lag("o_orderstatus").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("st_break"),
        F.when(
            (
                F.col("o_orderpriority")
                != F.lag("o_orderpriority").over(w)
            )
            | F.lag("o_orderpriority").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("pr_break"),
    )
    agg = seq.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("st_break").cast("bigint").alias("st_runs"),
        F.sum("pr_break").cast("bigint").alias("pr_runs"),
    )
    out = agg.selectExpr(
        "stack(2, 'o_orderstatus', n_rows, st_runs,"
        " 'o_orderpriority', n_rows, pr_runs)"
        " AS (column_name, n_rows, n_runs)"
    )
    return out.select(
        "column_name",
        "n_rows",
        "n_runs",
        F.expr("CAST(n_rows * 1000 div n_runs AS BIGINT)").alias(
            "avg_run_len_milli"
        ),
        F.expr("CAST(n_runs * 1000000 div n_rows AS BIGINT)").alias(
            "rle_size_ratio_ppm"
        ),
    ).orderBy("column_name")
