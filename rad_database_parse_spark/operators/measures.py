"""parse_measure — upgrade the reference's stringly measure expressions.

The reference stores dose/fluence/degradation values as free text:
``'<1'``, ``'>50'``, ``'HDR~65  LDR~30'`` (verified in main.db, SURVEY §1.2),
making parametric search (reference main.py:70-71) impossible without a
parse step. This extractor turns such a string into a queryable struct
{op, value, qualifier} with pure Catalyst regexp expressions (codegen'd,
no UDF); the raw column stays alongside for lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# First condition in the cell: optional qualifier word, optional operator,
# then a number. ('HDR~65  LDR~30' → qualifier HDR, op ~, value 65.)
_QUAL_RX = r"^\s*([A-Za-z]+)?\s*(<=|>=|[<>~=≈])?\s*(-?\d+(?:\.\d+)?)"


def parse_measure_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    qualifier = F.nullif(F.regexp_extract(c, _QUAL_RX, 1), F.lit(""))
    op = F.nullif(F.regexp_extract(c, _QUAL_RX, 2), F.lit(""))
    value = F.nullif(F.regexp_extract(c, _QUAL_RX, 3), F.lit("")).cast("double")
    return F.struct(
        F.coalesce(op, F.lit("=")).alias("op"),
        value.alias("value"),
        qualifier.alias("qualifier"),
    )


def parse_measure(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Append `{col}_parsed` struct; keep the raw string column."""
    return df.withColumn(out or f"{col}_parsed", parse_measure_expr(col))
