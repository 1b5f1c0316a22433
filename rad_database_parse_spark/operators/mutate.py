"""A18/A19 — update/delete semantics without a transactional table format.

Delta/Iceberg jars aren't in this image (import-gated below), so the plain-
Spark forms are join+rewrite: the idiomatic copy-on-write that every lake
format implements underneath. At cluster scale these become partition-scoped
rewrites when the predicate prunes partitions.

Reference: ``add_to_entry_in_table`` (database.py:35-41, dead code with a
syntax bug — we implement the intent) and ``delete_entry_from_table``
(database.py:66-71, including its nonstandard LIMIT-n delete).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

try:  # pragma: no cover - not in this image
    from delta.tables import DeltaTable  # noqa: F401

    HAS_DELTA = True
except Exception:  # pragma: no cover
    HAS_DELTA = False


def update_where(df: DataFrame, cond: Column, assignments: dict[str, Column]) -> DataFrame:
    """UPDATE t SET k=v,... WHERE cond — as a single projection."""
    out = df
    for name, value in assignments.items():
        out = out.withColumn(name, F.when(cond, value).otherwise(F.col(name)))
    return out


def delete_where(df: DataFrame, cond: Column, limit: int | None = None,
                 order_by: list[Column] | None = None) -> DataFrame:
    """DELETE FROM t WHERE cond [LIMIT n]. The LIMIT-n form needs a
    deterministic order; matches get row_number() over `order_by` and only
    rn<=n are deleted (SURVEY §2A-19)."""
    # SQL DELETE only removes rows whose predicate is TRUE; a NULL predicate
    # keeps the row. Coalesce so NULL doesn't leak through ~cond (dropped) or
    # land in its own _m=NULL window partition.
    cond = F.coalesce(cond, F.lit(False))
    if limit is None:
        return df.filter(~cond)
    w = Window.partitionBy().orderBy(*(order_by or [F.monotonically_increasing_id()]))
    marked = df.withColumn("_m", cond).withColumn(
        "_rn", F.row_number().over(w.partitionBy("_m"))
    )
    return (
        marked.filter(~F.col("_m") | (F.col("_rn") > limit)).drop("_m", "_rn")
    )


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT, emulated: keep target
    rows that have no source match, then union all source rows."""
    untouched = target.join(source.select(*keys), on=keys, how="left_anti")
    return untouched.unionByName(source.select(*target.columns))


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_ts: str,
    genesis_ts: str = "1900-01-01",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply `updates` to `dim` as new
    versions effective at `effective_ts`, closing the superseded rows.

    Output = dim columns + (valid_from, valid_to, is_current). Updated keys
    yield two rows (old version closed at effective_ts, new version open);
    untouched keys keep one open row. The update set is usually tiny next
    to the dimension, so both the semi and anti probes broadcast — the
    dimension streams through without a shuffle."""
    upd_keys = updates.select(*keys)
    genesis = F.lit(genesis_ts).cast("timestamp")
    eff = F.lit(effective_ts).cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    closed = (
        dim.join(F.broadcast(upd_keys), on=keys, how="left_semi")
        .withColumn("valid_from", genesis)
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    untouched = (
        dim.join(F.broadcast(upd_keys), on=keys, how="left_anti")
        .withColumn("valid_from", genesis)
        .withColumn("valid_to", null_ts)
        .withColumn("is_current", F.lit(True))
    )
    fresh = (
        updates.select(*dim.columns)
        .withColumn("valid_from", eff)
        .withColumn("valid_to", null_ts)
        .withColumn("is_current", F.lit(True))
    )
    return closed.unionByName(untouched).unionByName(fresh)
