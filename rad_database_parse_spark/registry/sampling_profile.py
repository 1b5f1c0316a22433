"""Sampling, profiling, and histogram operators for pipeline curation.

Training-data pipelines constantly sample (debug subsets, eval splits,
source-mixing weights) and profile (null rates, cardinalities, value
ranges) their corpora. Everything here is hash-deterministic — NO
rand()/TABLESAMPLE, whose engine-specific PRNGs can't be oracle-checked
and, worse, aren't stable across retries of a failed Spark task. An
md5-derived bucket makes the sample a pure function of the row key: same
rows selected on any engine, any retry, any partitioning — which is what
you want for a reproducible eval split at 100 TB too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from . import register
from ._util import dbl, dec, t


def _md5_bucket(key: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) bucket from the md5 of a key string."""
    return F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("int") % buckets


_BUCKET_SQL = "CAST(('0x' || substr(md5({key}), 1, 6)) AS INT) % 100"


# ------------------------------------------------- systematic hash sample
@register(
    "deterministic_sample",
    f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE {_BUCKET_SQL.format(key="l_orderkey || '-' || l_linenumber")} < 5
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str):
    """5% systematic sample keyed on the row identity — selection is a
    scan-local predicate (no shuffle, no state), reproducible across
    engines, retries, and repartitionings."""
    l = t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return l.filter(_md5_bucket(key) < 5).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# ------------------------------------------------- stratified mix sample
@register(
    "stratified_sample_by_segment",
    f"""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE {_BUCKET_SQL.format(key="CAST(c_custkey AS VARCHAR)")} <
          CASE WHEN c_mktsegment = 'BUILDING' THEN 20 ELSE 5 END
    """,
)
def stratified_sample_by_segment(spark: SparkSession, sf_dir: str):
    """Per-stratum sampling rates (the source-mixing primitive: oversample
    one slice, undersample the rest) — still one scan-local predicate."""
    c = t(spark, sf_dir, "customer")
    rate = F.when(F.col("c_mktsegment") == "BUILDING", 20).otherwise(5)
    return c.filter(_md5_bucket(F.col("c_custkey").cast("string")) < rate).select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------- column profiling
@register(
    "profile_orders",
    """
    SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR),
           CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str):
    """Data-quality profile: per-column null count, cardinality, and value
    range in one pass per column (Catalyst merges the six aggregations of
    one cached scan; numeric ranges stringify through DECIMAL so both
    engines print identically)."""
    o = t(spark, sf_dir, "orders")

    def prof(col: str, minmax=None):
        mn, mx = minmax or (F.min(col).cast("string"), F.max(col).cast("string"))
        return o.agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        ).select(F.lit(col).alias("col_name"), "*")

    price = dec("o_totalprice")
    parts = [
        prof("o_orderkey"),
        prof("o_custkey"),
        prof("o_orderstatus"),
        prof(
            "o_totalprice",
            (
                F.min(price).cast("string"),
                F.max(price).cast("string"),
            ),
        ),
        prof("o_orderdate"),
        prof("o_orderpriority"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------- histogram
@register(
    "histogram_totalprice",
    """
    WITH binned AS (
      SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
             o_totalprice
      FROM orders)
    SELECT bin, bin * 50000.0 AS bin_lo,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS bin_total,
           CAST(SUM(COUNT(*)) OVER (ORDER BY bin) AS BIGINT) AS cum_n
    FROM binned GROUP BY bin
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str):
    """Fixed-width value histogram + cumulative distribution: floor-bin on
    the scan, one groupBy, one ordered window over the (tiny) bin table."""
    o = t(spark, sf_dir, "orders")
    binned = o.withColumn(
        "bin", F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
    )
    agg = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        dbl(F.sum(dec("o_totalprice"))).alias("bin_total"),
    )
    w = Window.orderBy("bin").rangeBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "bin",
        (F.col("bin") * 50000.0).alias("bin_lo"),
        "n",
        "bin_total",
        F.sum("n").over(w).alias("cum_n"),
    )


# ------------------------------------------- language rebalancing mix
@register(
    "docs_balance_by_lang",
    f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    thresholds AS (
      SELECT lang, (SELECT MIN(n) FROM counts) * 10000 // n AS t
      FROM counts)
    SELECT doc_id, d.lang
    FROM documents d JOIN thresholds th ON d.lang = th.lang
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INT)
          % 10000 < th.t
    """,
)
def docs_balance_by_lang(spark: SparkSession, sf_dir: str):
    """Corpus rebalancing with DATA-DEPENDENT rates: every language is
    downsampled toward the minority language's count (rate = min_n/n_lang,
    exact integer threshold out of 10000). Two passes: a language census
    (tiny, broadcast back), then the same scan-local hash predicate as the
    fixed-rate samplers — the source-mixing primitive at its real shape,
    where mix targets come from the data, not a constant."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    thresholds = counts.crossJoin(F.broadcast(min_n)).select(
        "lang", (F.col("min_n") * 10000 / F.col("n")).cast("long").alias("t")
    )
    return (
        d.join(F.broadcast(thresholds), "lang")
        .filter(
            _md5_bucket(F.col("doc_id").cast("string"), 10000) < F.col("t")
        )
        .select("doc_id", "lang")
    )
