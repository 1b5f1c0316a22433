"""File sources/sinks (SURVEY §2A A1/A7/A8/A17, §2C).

Thin declarative wrappers — every reader keeps Catalyst's pushdown/pruning
path intact. ``read_binary_dir`` is the distributed replacement for the
reference's os.listdir loop (main.py:88-92): one row per file with path,
length, modificationTime, and content, filterable BEFORE content is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, header: bool = True
) -> DataFrame:
    """A8 — the reference's pandas.read_csv reload (tables.py:111). Explicit
    schema preferred; inferSchema costs an extra pass at scale."""
    reader = spark.read.option("header", str(header).lower())
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """A1 — directory scan as a distributed binaryFile source."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A7 — CSV checkpoint sink (reference tables.py:102). The reference's
    blocking human review step becomes an optional staged write between
    jobs; no operator blocks."""
    df.write.mode(mode).option("header", "true").csv(path)
