"""Scalar function-suite queries: math, conditional/null, hash, bitwise.

Completes the §2C scalar-function matrix next to the string suite
(core_relational.string_functions) and datetime suite
(events_ops.datetime_functions). Each suite evaluates a battery of
functions per-row over real columns so the oracle hash-compare covers
actual values, not types.

Cross-engine parity notes (why some functions are absent):
- exp/ln/trig are libm-dependent (not IEEE-exactly-rounded) — excluded;
  sqrt IS correctly rounded per IEEE-754, so it's in.
- Spark `ceil/floor` on DOUBLE return BIGINT, DuckDB return DOUBLE —
  oracle casts to BIGINT.
- DuckDB `^` is exponentiation; bitwise XOR is `xor()`.
- Spark `pmod` has no DuckDB twin — oracle uses ((a % b) + b) % b.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import t


# ------------------------------------------------------------ math suite
@register(
    "math_functions",
    """
    SELECT p_partkey,
           abs(p_size - 25) AS abs_off,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
           round(p_retailprice, 1) AS round_price,
           CAST(sign(p_retailprice - 1000.0) AS INT) AS sign_vs_1000,
           p_size % 7 AS size_mod7,
           ((p_size - 30) % 7 + 7) % 7 AS size_pmod7,
           CAST(p_size AS DOUBLE) ** 2 AS size_sq,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           greatest(p_size, 25) AS size_hi,
           least(p_size, 25) AS size_lo
    FROM part
    """,
)
def math_functions(spark: SparkSession, sf_dir: str):
    p = t(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("abs_off"),
        F.ceil("p_retailprice").alias("ceil_price"),
        F.floor("p_retailprice").alias("floor_price"),
        F.round("p_retailprice", 1).alias("round_price"),
        F.signum(F.col("p_retailprice") - 1000.0).cast("int").alias("sign_vs_1000"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.pmod(F.col("p_size") - 30, F.lit(7)).alias("size_pmod7"),
        F.pow(size_d, 2).alias("size_sq"),
        F.sqrt(size_d).alias("size_sqrt"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
    )


# ----------------------------------------------------- conditional suite
@register(
    "conditional_functions",
    """
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_filled,
           ifnull(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_ifnull,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'kept' ELSE 'dropped' END AS seg_nvl2,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           (nullif(c_mktsegment, 'BUILDING') IS NULL) AS is_building,
           CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE 0.0 END AS bal_clamped
    FROM customer
    """,
)
def conditional_functions(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("SUPPRESSED")).alias("seg_filled"),
        F.ifnull(seg_null, F.lit("SUPPRESSED")).alias("seg_ifnull"),
        F.nvl2(seg_null, F.lit("kept"), F.lit("dropped")).alias("seg_nvl2"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        seg_null.isNull().alias("is_building"),
        F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))
        .otherwise(F.lit(0.0))
        .alias("bal_clamped"),
    )


# ------------------------------------------------------------ hash suite
@register(
    "hash_functions",
    """
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           upper(substr(md5(p_name), 1, 8)) AS md5_prefix,
           length(md5(p_name)) AS md5_len,
           CAST(('0x' || substr(md5(p_name), 1, 12)) AS BIGINT) % 2147483647
             AS md5_bucket
    FROM part
    """,
)
def hash_functions(spark: SparkSession, sf_dir: str):
    """Portable cryptographic digests (md5/sha256 are specification-stable
    across engines, unlike murmur/xxhash whose seeds differ) plus the
    engine's md5→bigint bucket construction used for token ids."""
    p = t(spark, sf_dir, "part")
    name_md5 = F.md5(F.col("p_name"))
    return p.select(
        "p_partkey",
        name_md5.alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.upper(F.substring(name_md5, 1, 8)).alias("md5_prefix"),
        F.length(name_md5).alias("md5_len"),
        (
            F.conv(F.substring(name_md5, 1, 12), 16, 10).cast("bigint")
            % F.lit(2147483647)
        ).alias("md5_bucket"),
    )


# --------------------------------------------------------- bitwise suite
@register(
    "bitwise_functions",
    """
    SELECT l_orderkey, l_linenumber,
           l_linenumber & 3 AS ln_and,
           l_linenumber | 8 AS ln_or,
           xor(l_linenumber, 5) AS ln_xor,
           l_linenumber << 2 AS ln_shl,
           l_orderkey >> 3 AS ok_shr,
           bit_count(l_orderkey) AS ok_bits,
           ~l_linenumber AS ln_not
    FROM lineitem
    """,
)
def bitwise_functions(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        ln.bitwiseAND(F.lit(3)).alias("ln_and"),
        ln.bitwiseOR(F.lit(8)).alias("ln_or"),
        ln.bitwiseXOR(F.lit(5)).alias("ln_xor"),
        F.shiftleft(ln, 2).alias("ln_shl"),
        F.shiftright(F.col("l_orderkey"), 3).alias("ok_shr"),
        F.bit_count(F.col("l_orderkey")).alias("ok_bits"),
        F.bitwise_not(ln).alias("ln_not"),
    )


# ----------------------------------------------------- try_* error-safe
@register(
    "try_functions",
    """
    SELECT c_custkey,
           TRY_CAST(substr(c_name, 10) AS INT) AS id_digits,
           TRY_CAST(c_mktsegment AS INT) AS seg_as_int,
           c_acctbal / nullif(c_custkey % 3, 0) AS safe_div,
           CASE WHEN c_custkey = 0 THEN 9223372036854775807 END AS overflow_add
    FROM customer
    """,
)
def try_functions(spark: SparkSession, sf_dir: str):
    """ANSI-safe try_* family — the data-cleaning staple: try_cast parses
    the digit tail of c_name and NULLs the non-numeric segment string;
    try_divide NULLs division by zero; try_add NULLs bigint overflow
    (oracle mirrors each with nullif/CASE since DuckDB stops at
    TRY_CAST)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 10, 100).try_cast("int").alias("id_digits"),
        F.col("c_mktsegment").try_cast("int").alias("seg_as_int"),
        F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 3).alias("safe_div"),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"),
            F.col("c_custkey").cast("bigint"),
        ).alias("overflow_add"),
    )
