"""Canonical StructType schemas for the engine's catalog.

Mirrors the reference's SQLite DDL (``database.py:75-278``) with typed Spark
schemas. Two deliberate departures from the reference, per SURVEY.md §1.4:

- the 6 per-category part tables (``database.py:244-251``) collapse into ONE
  ``parts`` table with a ``category`` partition column — partition pruning
  replaces table dispatch and scales to arbitrarily many categories;
- surrogate ids are produced by ``row_number()`` over a stable natural-key
  sort (reproducible), not AUTOINCREMENT.
"""

from __future__ import annotations

from pyspark.sql import types as T

# rad_table — reference database.py:83-105 (17 columns, stringly payload).
RAD_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("part_number", T.StringType(), False),
        T.StructField("manufacturer", T.StringType(), True),
        T.StructField("tester_id", T.StringType(), True),
        T.StructField("device_function", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("technology", T.StringType(), True),
        T.StructField("principal_investigator", T.StringType(), True),
        T.StructField("results", T.StringType(), True),
        T.StructField("spec", T.StringType(), True),
        T.StructField("dose_rate", T.StringType(), True),
        T.StructField("proton_energy", T.StringType(), True),
        T.StructField("degradation_level", T.StringType(), True),
        T.StructField("proton_fluence", T.StringType(), True),
        T.StructField("misc_info", T.StringType(), True),
        T.StructField("source_paper", T.StringType(), False),
        T.StructField("source_paper_filename", T.StringType(), False),
    ]
)

# abbreviation_table — reference database.py:109-116.
ABBREVIATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("abbreviation", T.StringType(), False),
        T.StructField("expansion", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("source_papers", T.StringType(), True),
    ]
)

# Unified parts table — reference's 6 category tables (database.py:118-278)
# as one partitioned table; category-specific extras ride in a JSON attrs col.
PARTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("category", T.StringType(), False),  # partition key
        T.StructField("part_number", T.StringType(), False),
        T.StructField("part_family", T.StringType(), True),
        T.StructField("part_family_id", T.LongType(), True),
        T.StructField("manufacturer", T.StringType(), True),
        T.StructField("device_type", T.StringType(), True),
        T.StructField("technology", T.StringType(), True),
        T.StructField("supply_current", T.StringType(), True),
        T.StructField("current_per_channel", T.StringType(), True),
        T.StructField("voltage_supply_min", T.StringType(), True),
        T.StructField("voltage_supply_max", T.StringType(), True),
        T.StructField("temperature_range", T.StringType(), True),
        T.StructField("mounting_type", T.StringType(), True),
        T.StructField("package", T.StringType(), True),
        T.StructField("datasheet", T.StringType(), True),
        T.StructField("rad_id", T.ArrayType(T.LongType()), True),
        T.StructField("attrs", T.StringType(), True),  # JSON, category extras
    ]
)

# Post-extraction cell grid — the shape the PDF extraction stage emits
# (reference tables.py:78-97); input to density/classify/header-map operators.
RAW_CELLS_SCHEMA = T.StructType(
    [
        T.StructField("doc_filename", T.StringType(), False),
        T.StructField("doc_title", T.StringType(), True),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("table_idx", T.IntegerType(), False),
        T.StructField("table_title", T.StringType(), True),
        T.StructField("row_idx", T.IntegerType(), False),
        T.StructField("col_idx", T.IntegerType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# The 10 canonical rad-table payload columns the fuzzy header mapper targets
# (reference tables.py:172).
CANONICAL_RAD_COLUMNS = [
    "part_number",
    "manufacturer",
    "device_function",
    "technology",
    "results",
    "spec",
    "dose_rate",
    "proton_energy",
    "degradation_level",
    "proton_fluence",
]
