"""Round-7an operators: SimHash width collision tradeoff and the
duplicate-cluster-size power law.

Parity contract as everywhere (registry/__init__.py float policy).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import t
from ..llm.dedup import HASH_AS, HASH_BS, MERSENNE_P, simhash_signatures
from .llm_ops import _TOKS_SQL

# ------------------------------------------------------------------
# 1. docs_simhash_width_collisions — signature sizing tradeoff
# ------------------------------------------------------------------
# The 64-bit signature is handled as (hi, lo) 32-bit halves in BOTH
# engines: materializing bit 63 via 1<<63 additions overflows DuckDB's
# BIGINT (no two's-complement wraparound), while the half-pair compares
# identically and each half stays well inside int64.


def _width_oracle() -> str:
    def contrib(src: int) -> str:
        return f"""
      SELECT doc_id, bit,
             SUM(CASE WHEN ((CAST({HASH_AS[src]} AS BIGINT) * token_id
                             + {HASH_BS[src]})
                            % {MERSENNE_P} >> bit) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM doc_tokens CROSS JOIN range(32) t(bit)
      GROUP BY doc_id, bit"""

    return f"""
    WITH {_TOKS_SQL},
    doc_tokens AS (SELECT doc_id, token_id FROM toks),
    lo_c AS ({contrib(0)}),
    hi_c AS ({contrib(1)}),
    sigs AS (
      SELECT l.doc_id,
             CAST(SUM(CASE WHEN l.s > 0
               THEN CAST(1 AS BIGINT) << l.bit ELSE 0 END) AS BIGINT)
               AS lo,
             CAST(SUM(CASE WHEN h.s > 0
               THEN CAST(1 AS BIGINT) << h.bit ELSE 0 END) AS BIGINT)
               AS hi
      FROM lo_c l JOIN hi_c h
        ON h.doc_id = l.doc_id AND h.bit = l.bit
      GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sigs),
    g32 AS (
      SELECT lo, CAST(COUNT(*) AS BIGINT) AS c FROM sigs GROUP BY 1),
    g64 AS (
      SELECT hi, lo, CAST(COUNT(*) AS BIGINT) AS c FROM sigs
      GROUP BY 1, 2),
    census AS (
      SELECT CAST(32 AS BIGINT) AS sig_bits,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS colliding_pairs
      FROM g32
      UNION ALL
      SELECT CAST(64 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             CAST(SUM(c * (c - 1) // 2) AS BIGINT)
      FROM g64)
    SELECT c.sig_bits, c.n_distinct, c.colliding_pairs,
           CAST(c.colliding_pairs * 1000000
                // NULLIF(t.n * (t.n - 1) // 2, 0) AS BIGINT)
             AS collision_ppm
    FROM census c CROSS JOIN tot t
    ORDER BY sig_bits
    """


@register("docs_simhash_width_collisions", _width_oracle())
def docs_simhash_width_collisions(spark: SparkSession, sf_dir: str):
    """SimHash signature-width sizing: identical-signature pair
    counts at 32 vs 64 bits — the collision-vs-memory tradeoff the
    dedup tier's band planner takes as INPUT, measured on the actual
    corpus rather than assumed uniform (the bit-balance audit showed
    the bits are biased, so the uniform 2^-32 collision estimate is
    optimistic — this op measures by how much). One signature pass
    serves both widths (the 32-bit signature is the 64-bit one's low
    half — the production builder's documented property), and the
    64-bit signature compares as (hi, lo) 32-bit halves in both
    engines because materializing bit 63 by addition overflows
    DuckDB's BIGINT. Collisions count WITHOUT pair joins: group by
    signature, fold c·(c−1)/2 — signature-grain, never pair-grain.
    The 32→64 collision drop in ppm is the memory argument's whole
    case. Exact integers throughout."""
    d = t(spark, sf_dir, "documents")
    sig = simhash_signatures(d, "text", "doc_id", bits=64)
    sigs = sig.select(
        "doc_id",
        F.expr("simhash & 4294967295").alias("lo"),
        F.expr("(simhash >> 32) & 4294967295").alias("hi"),
    )
    tot = sigs.agg(F.count("*").cast("bigint").alias("n"))
    g32 = sigs.groupBy("lo").agg(
        F.count("*").cast("bigint").alias("c")
    )
    g64 = sigs.groupBy("hi", "lo").agg(
        F.count("*").cast("bigint").alias("c")
    )
    rows = []
    for bits, grp in [(32, g32), (64, g64)]:
        rows.append(
            grp.agg(
                F.lit(bits).cast("bigint").alias("sig_bits"),
                F.count("*").cast("bigint").alias("n_distinct"),
                F.sum(F.expr("c * (c - 1) div 2"))
                .cast("bigint")
                .alias("colliding_pairs"),
            )
        )
    census = rows[0].union(rows[1])
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "sig_bits",
            "n_distinct",
            "colliding_pairs",
            F.expr(
                "CAST(colliding_pairs * 1000000"
                " div NULLIF(n * (n - 1) div 2, 0) AS BIGINT)"
            ).alias("collision_ppm"),
        )
        .orderBy("sig_bits")
    )


# ------------------------------------------------------------------
# 2. docs_dup_cluster_size_powerlaw — dup structure diagnostic
# ------------------------------------------------------------------

_DUP_SMIN = 2


@register(
    "docs_dup_cluster_size_powerlaw",
    f"""
    WITH clusters AS (
      SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS sz
      FROM documents GROUP BY 1),
    dups AS (
      SELECT sz FROM clusters WHERE sz >= {_DUP_SMIN}),
    terms AS (
      SELECT sz,
             CAST(round(ln(CAST(sz AS DOUBLE) / {_DUP_SMIN - 0.5})
               * 1000000) AS BIGINT) AS lnterm_micro
      FROM dups),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(sz) AS BIGINT) AS n_dup_docs,
             CAST(MAX(sz) AS BIGINT) AS max_cluster,
             CAST(SUM(lnterm_micro) AS BIGINT) AS sum_ln_micro
      FROM terms)
    SELECT n_clusters, n_dup_docs, max_cluster,
           CAST(1000 + n_clusters * CAST(1000000000 AS BIGINT)
                // NULLIF(sum_ln_micro, 0) // 1000 AS BIGINT)
             AS alpha_milli
    FROM fit
    """,
)
def docs_dup_cluster_size_powerlaw(spark: SparkSession, sf_dir: str):
    """Power-law fit of the exact-duplicate cluster-size distribution
    — the dup-STRUCTURE diagnostic that decides dedup strategy: a
    heavy tail (α → 2) means a few mega-clusters dominate the
    duplicate mass (keep-one-per-cluster removes most of it — cheap
    wins), while a steep α means duplication is diffuse pairs and the
    near-dup machinery has to carry the load. Hill/MLE estimator
    α = 1 + n/Σln(s/(smin−½)) over clusters of size ≥{_DUP_SMIN};
    each ln micro-rounds once per CLUSTER (bounded — cluster grain,
    not doc grain), then the estimate is pure integer arithmetic. One
    hash fold (the dedup shuffle itself) + one cluster-grain fold —
    at 100 TB the diagnostic is free on top of the dedup pass it
    informs. Read with docs_dedup_token_savings: that op prices the
    dup mass, this one describes its shape."""
    d = t(spark, sf_dir, "documents")
    clusters = d.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").cast("bigint").alias("sz")
    )
    dups = clusters.filter(F.col("sz") >= _DUP_SMIN)
    terms = dups.select(
        "sz",
        F.expr(
            f"CAST(round(ln(CAST(sz AS DOUBLE) / {_DUP_SMIN - 0.5})"
            " * 1000000) AS BIGINT)"
        ).alias("lnterm_micro"),
    )
    fit = terms.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_dup_docs"),
        F.max("sz").cast("bigint").alias("max_cluster"),
        F.sum("lnterm_micro").cast("bigint").alias("sum_ln_micro"),
    )
    return fit.select(
        "n_clusters",
        "n_dup_docs",
        "max_cluster",
        F.expr(
            "CAST(1000 + n_clusters * CAST(1000000000 AS BIGINT)"
            " div NULLIF(sum_ln_micro, 0) div 1000 AS BIGINT)"
        ).alias("alpha_milli"),
    )
