"""Scale-safe exact total-order ranking (distributed NTILE / row_number).

An unpartitioned ``Window.orderBy(...)`` is correct but serial: Spark moves
the entire input into ONE task ("No Partition Defined for Window
operation"). At 100 TB that is the difference between a 30-second stage and
a job that never finishes. These helpers compute the SAME exact rank /
NTILE bucket with no unpartitioned window:

1. sample ``P-1`` approximate cut points of the order value
   (``percentile_approx`` — one partial-combine aggregate, tiny result);
2. assign each row a range bucket by comparing against the literal cut
   points (scan-local, codegen — equal values always share a bucket, so
   bucket boundaries can be sloppy without affecting the final rank);
3. count rows per bucket (one partial-combine aggregate, ≤P rows
   collected) and turn the counts into cumulative offsets;
4. rank = offset[bucket] + row_number over a window PARTITIONED by bucket
   — every partition sorts only its slice, in parallel.

The result is bit-identical to ``row_number()/ntile()`` over the global
order (value ASC, *tiebreaks ASC): step 2 preserves order across buckets
and never splits ties, step 4 is exact within a bucket. Cost: two extra
small aggregates; the input is scanned three times, so callers ranking the
same DataFrame repeatedly should persist it first.

Cut-point quality only affects balance, not correctness — a skewed value
distribution degrades to fewer effective buckets (in the limit of one
distinct value, one bucket = the serial window, which is inherent: ties
cannot be ranked in parallel without an arbitrary split).

Descending ranks: pass an ascending-oriented expression (e.g. ``-col``)
as ``order_expr``; the helper only ever sorts ascending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ORD = "__exact_rank_ord"
_BUCKET = "__exact_rank_bucket"


def _range_bucketed(
    df: DataFrame, order_expr: Column, n_buckets: int
) -> DataFrame:
    """Add _ORD (double orientation copy) and _BUCKET (range bucket id).

    Bucketing compares in double: rounding can only move a cut point,
    never split equal values (the comparison result is a function of the
    value alone), so exactness of the final rank is unaffected.
    """
    with_ord = df.withColumn(_ORD, order_expr)
    pcts = [i / n_buckets for i in range(1, n_buckets)]
    row = with_ord.select(
        F.percentile_approx(F.col(_ORD).cast("double"), pcts, 2000).alias("c")
    ).first()
    cuts = sorted({c for c in (row["c"] or []) if c is not None})
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col(_ORD).cast("double") > F.lit(c), 1).otherwise(0)
    return with_ord.withColumn(_BUCKET, bucket)


def exact_global_rank(
    df: DataFrame,
    order_expr: Column,
    tiebreaks: list[str],
    out_col: str = "rank",
    n_buckets: int = 32,
) -> tuple[DataFrame, int]:
    """Exact 1-based row_number over (order_expr ASC, *tiebreaks ASC).

    Returns (df + out_col, total_row_count). No unpartitioned window:
    plan-guarded in tests/test_plans.py.
    """
    bucketed = _range_bucketed(df, order_expr, n_buckets)
    counts = {
        r[_BUCKET]: r["n"]
        for r in bucketed.groupBy(_BUCKET)
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: one count per fixed bucket
    }
    total = sum(counts.values())
    if not counts:
        return df.withColumn(out_col, F.lit(None).cast("bigint")), 0
    offset = 0
    offsets: dict[int, int] = {}
    for b in sorted(counts):
        offsets[b] = offset
        offset += counts[b]
    offset_map = F.create_map(
        *[x for b, off in offsets.items() for x in (F.lit(b), F.lit(off))]
    )
    w = Window.partitionBy(_BUCKET).orderBy(
        F.col(_ORD).asc(), *[F.col(c).asc() for c in tiebreaks]
    )
    ranked = bucketed.withColumn(
        out_col,
        (
            F.element_at(offset_map, F.col(_BUCKET))
            + F.row_number().over(w)
        ).cast("bigint"),
    ).drop(_ORD, _BUCKET)
    return ranked, total


def exact_ntile_multi(
    df: DataFrame,
    n: int,
    specs: list[tuple[Column, list[str], str]],
    n_buckets: int = 32,
) -> DataFrame:
    """Several exact NTILE(n) rankings over the SAME DataFrame with the
    driver-side cost of one: a single percentile_approx job computes every
    spec's cut points, a single groupBy over the joint bucket tuple
    (collected, ≤ n_buckets^len(specs) data-limited rows) yields every
    spec's marginal counts. Each spec still gets its own partitioned
    window (the shuffles are inherent — different orderings), but the
    2·len(specs) driver actions collapse to 2. Semantics per spec are
    identical to exact_ntile: (order_expr ASC, *tiebreaks ASC).

    Motivation (r6 bench): customer_decile_migration paid 4 actions + a
    persist for its two rankings — 0.5 → 2.7s at sf0.1 after the
    scale-safe swap; sharing the jobs claws most of that back while
    keeping the no-unpartitioned-window property."""
    ords = [f"__ord_{i}" for i in range(len(specs))]
    bks = [f"__bucket_{i}" for i in range(len(specs))]
    cur = df
    for (order_expr, _tb, _out), oc in zip(specs, ords):
        cur = cur.withColumn(oc, order_expr)
    pcts = [i / n_buckets for i in range(1, n_buckets)]
    cut_row = cur.select(
        *[
            F.percentile_approx(F.col(oc).cast("double"), pcts, 2000).alias(oc)
            for oc in ords
        ]
    ).first()
    for oc, bc in zip(ords, bks):
        cuts = sorted({c for c in (cut_row[oc] or []) if c is not None})
        bucket = F.lit(0)
        for c in cuts:
            bucket = bucket + F.when(
                F.col(oc).cast("double") > F.lit(c), 1
            ).otherwise(0)
        cur = cur.withColumn(bc, bucket)
    joint = cur.groupBy(*bks).agg(F.count("*").alias("n")).collect()  # bounded: bucket grid
    total = sum(r["n"] for r in joint)
    if total == 0:
        out = df
        for _oe, _tb, out_col in specs:
            out = out.withColumn(out_col, F.lit(None).cast("int"))
        return out
    q, rem = divmod(total, n)
    for i, (_oe, tiebreaks, out_col) in enumerate(specs):
        marginal: dict[int, int] = {}
        for r in joint:
            marginal[r[bks[i]]] = marginal.get(r[bks[i]], 0) + r["n"]
        offset = 0
        offsets: dict[int, int] = {}
        for b in sorted(marginal):
            offsets[b] = offset
            offset += marginal[b]
        offset_map = F.create_map(
            *[x for b, off in offsets.items() for x in (F.lit(b), F.lit(off))]
        )
        w = Window.partitionBy(bks[i]).orderBy(
            F.col(ords[i]).asc(), *[F.col(c).asc() for c in tiebreaks]
        )
        rank_col = f"__rank_{i}"
        cur = cur.withColumn(
            rank_col,
            (
                F.element_at(offset_map, F.col(bks[i]))
                + F.row_number().over(w)
            ).cast("bigint"),
        )
        r = F.col(rank_col)
        if q == 0:
            tile = r
        elif rem == 0:
            tile = F.expr(f"({rank_col} - 1) div {q} + 1")
        else:
            big = q + 1
            tile = F.when(
                r <= rem * big, F.expr(f"({rank_col} - 1) div {big} + 1")
            ).otherwise(
                F.expr(f"{rem} + ({rank_col} - {rem * big} - 1) div {q} + 1")
            )
        cur = cur.withColumn(out_col, tile.cast("int")).drop(rank_col)
    return cur.drop(*ords, *bks)


def exact_prefix_sum(
    df: DataFrame,
    order_expr: Column,
    tiebreaks: list[str],
    value_col: str,
    out_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact running SUM(value) over (order_expr ASC, *tiebreaks ASC)
    without an unpartitioned window — the distributed prefix-sum.

    Same range-bucket construction as exact_global_rank, but the
    collected per-bucket quantity is the bucket's value SUM (exact:
    bigint/decimal come back as Python int/Decimal); each row's prefix
    sum = Σ(sums of earlier buckets) + running sum within its own bucket
    (window PARTITIONED by bucket). Sum is associative over exact types,
    so the result is bit-identical to the serial window."""
    bucketed = _range_bucketed(df, order_expr, n_buckets)
    per_bucket = {
        r[_BUCKET]: r["s"]
        for r in bucketed.groupBy(_BUCKET)
        .agg(F.sum(value_col).alias("s"))
        .collect()  # bounded: one partial sum per bucket
    }
    if not per_bucket:
        return df.withColumn(out_col, F.lit(None).cast(df.schema[value_col].dataType))
    value_type = bucketed.select(F.sum(value_col).alias("s")).schema["s"].dataType
    offset = None
    offsets: dict[int, object] = {}
    for b in sorted(per_bucket):
        offsets[b] = offset  # None for the first bucket → coalesce(0)
        offset = per_bucket[b] if offset is None else offset + per_bucket[b]
    offset_map = F.create_map(
        *[
            x
            for b, off in offsets.items()
            for x in (
                F.lit(b),
                F.lit(off).cast(value_type)
                if off is not None
                else F.lit(0).cast(value_type),
            )
        ]
    )
    w = Window.partitionBy(_BUCKET).orderBy(
        F.col(_ORD).asc(), *[F.col(c).asc() for c in tiebreaks]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        bucketed.withColumn(
            out_col,
            (
                F.element_at(offset_map, F.col(_BUCKET))
                + F.sum(value_col).over(w)
            ).cast(value_type),
        )
        .drop(_ORD, _BUCKET)
    )


def exact_ntile(
    df: DataFrame,
    n: int,
    order_expr: Column,
    tiebreaks: list[str],
    out_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact SQL ``NTILE(n) OVER (ORDER BY order_expr ASC, *tiebreaks)``
    without an unpartitioned window.

    SQL NTILE semantics: with N rows, the first ``N mod n`` tiles hold
    ``N div n + 1`` rows, the rest ``N div n`` — derived here from the
    exact global rank with the row count known driver-side (it falls out
    of the offset computation for free).
    """
    ranked, total = exact_global_rank(
        df, order_expr, tiebreaks, out_col="__exact_rank_r", n_buckets=n_buckets
    )
    if total == 0:
        return ranked.withColumnRenamed("__exact_rank_r", out_col)
    q, rem = divmod(total, n)
    r = F.col("__exact_rank_r")
    # integer `div` throughout — ranks reach the full row count, where
    # double floor-division starts rounding (ADVICE r5: the 2^53 trap)
    if q == 0:
        tile = r  # fewer rows than tiles: row i is tile i
    elif rem == 0:
        tile = F.expr(f"(__exact_rank_r - 1) div {q} + 1")
    else:
        big = q + 1
        tile = F.when(
            r <= rem * big, F.expr(f"(__exact_rank_r - 1) div {big} + 1")
        ).otherwise(
            F.expr(f"{rem} + (__exact_rank_r - {rem * big} - 1) div {q} + 1")
        )
    return ranked.withColumn(out_col, tile.cast("int")).drop("__exact_rank_r")
