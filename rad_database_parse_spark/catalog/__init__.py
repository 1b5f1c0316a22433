from .io import TESTDATA_TABLES, load_table, load_tables, register_views
from .schemas import (
    ABBREVIATION_SCHEMA,
    PARTS_SCHEMA,
    RAD_TABLE_SCHEMA,
    RAW_CELLS_SCHEMA,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "RAD_TABLE_SCHEMA",
    "ABBREVIATION_SCHEMA",
    "PARTS_SCHEMA",
    "RAW_CELLS_SCHEMA",
]
