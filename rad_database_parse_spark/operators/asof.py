"""As-of join — enrich each left row with the most recent right row.

Spark has no native ASOF JOIN; the scalable form here is union+window:
tag both sides, union on the partition key, sort by time within key, and
let ``last(..., ignorenulls)`` carry the right side's latest values forward
onto left rows. One shuffle on the key, no range blow-up, skew handled by
AQE — this is the plan you want at 100 TB (a naive non-equi join would be
quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, append `value_cols` from the latest right row with
    right_time <= left_time (per `on` key). Ties: right row at exactly
    left_time wins (right sorts before left at equal times)."""
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        *[F.col(c) for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l.unionByName(r)
    for c in value_cols:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols], *value_cols
    )
