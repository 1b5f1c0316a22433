from .files import read_binary_dir, read_csv, read_json, read_parquet
from .pdf import extract_pdf_cells

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_binary_dir",
    "extract_pdf_cells",
]
