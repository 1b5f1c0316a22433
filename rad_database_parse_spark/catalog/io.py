"""Parquet IO over the driver testdata + generic read/write helpers.

All reads are plain ``spark.read.parquet`` so Catalyst's vectorized reader,
predicate pushdown, and column pruning apply. Writers partition by the given
keys so downstream queries get partition pruning (the Spark replacement for
the reference's table-per-category design, database.py:244-251).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Tables whose parquet carries TIMESTAMP(NANOS) columns, which Spark's
# vectorized reader rejects by default. We read them as long (legacy conf)
# and convert to micros — matching how micro-resolution engines (and the
# DuckDB oracle) truncate nanos.
NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; Catalyst prunes columns/filters at the scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = NANO_TS_COLUMNS.get(name, [])
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in nano_cols:
            if dict(df.dtypes).get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink (replaces the reference's per-row INSERT,
    database.py:18-32, with one distributed append)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    out_path: str | None = None,
) -> str:
    """Small-file compaction: rewrite a parquet directory into files sized
    for scan efficiency (~target_file_mb each, the row-group sweet spot a
    100 TB table needs — thousands of KB-sized files turn a scan into a
    metadata storm). File count is computed from the actual input bytes;
    the rewrite is one read → repartition → write with no shuffle beyond
    the repartition itself. Writes to `out_path` (or `path + '_compacted'`)
    — atomic swap is the caller's move (or a lake format's)."""
    import pathlib

    total_bytes = sum(
        f.stat().st_size for f in pathlib.Path(path).rglob("*.parquet")
    )
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    dest = out_path or path.rstrip("/") + "_compacted"
    spark.read.parquet(path).repartition(int(n_files)).write.mode(
        "overwrite"
    ).parquet(dest)
    return dest
