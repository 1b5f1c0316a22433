"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator inventory (SURVEY.md §2) with
DuckDB oracle twins where SQL-expressible. Implementation lives in
``rad_database_parse_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rad_database_parse_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation — one
    shot through scan → pushdown filters → broadcast dim joins → hash agg."""
    from rad_database_parse_spark.registry.core_relational import q5_revenue_by_nation

    return q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None
    }
