"""Shared helpers for registry queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.io import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: str | Column, prec: int = 12, scale: int = 2) -> Column:
    """Exact-decimal view of a 2-decimal-clean double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dbl(c: Column) -> Column:
    return c.cast("double")


# revenue term: extendedprice * (1 - discount), exact decimal (scale 4).
def disc_price() -> Column:
    return (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    ).cast("decimal(18,4)")
