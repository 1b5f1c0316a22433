"""A2/A3 integration test against a REAL reference PDF — skip-marked.

This container ships no camelot/Ghostscript/pdfminer, so the extractor in
sources/pdf.py normally runs as a pluggable stub. The moment the toolchain
exists, this test runs the real path end to end: binaryFile scan →
extract_pdf_cells (camelot lattice, metadata title, nearest-heading guess)
→ the A5→A14 chain (density gate → classification → normalization →
projection → exact dedup) over one reference compendium, checking the
golden per-file row count BASELINE.md records for it (reference pipeline:
tables.py:51-97 + main.py:88-106).
"""

import shutil

import pytest
from pyspark.sql import functions as F

try:
    import camelot  # noqa: F401

    _HAVE_CAMELOT = True
except Exception:
    _HAVE_CAMELOT = False

_HAVE_GS = shutil.which("gs") is not None

REFERENCE_PDF = "/root/reference/docs/2006-nasa-compendium.pdf"
GOLDEN_2006_ROWS = 28  # BASELINE.md per-file distribution (main.db)


@pytest.mark.skipif(
    not (_HAVE_CAMELOT and _HAVE_GS),
    reason="camelot/Ghostscript toolchain absent in this container — "
    "sources/pdf.py runs as a pluggable stub (SURVEY A2/A3)",
)
def test_real_pdf_extraction_lands_golden_counts(spark):
    from rad_database_parse_spark.operators.core import (
        classify_title,
        normalize_expr,
        project_with_lineage,
        row_density,
        table_density_filter,
    )
    from rad_database_parse_spark.operators.header_map import (
        resolve_header_mapping,
    )
    from rad_database_parse_spark.sources.pdf import extract_pdf_cells

    files = spark.read.format("binaryFile").load(REFERENCE_PDF)
    cells = extract_pdf_cells(files).persist()
    assert cells.count() > 0, "extractor produced no cells from a real PDF"

    # table-level density gate (reference get_table_density > 0.25)
    dense_tables = table_density_filter(
        cells,
        group_cols=["doc_filename", "page", "table_idx"],
        value_cols=["value"],
        threshold=0.25,
    )

    # header resolution: row 0 of each table holds the source headers
    headers = [
        r["value"]
        for r in dense_tables.filter(
            (F.col("row_idx") == 0) & (F.col("table_idx") == 0)
        )
        .orderBy("col_idx")
        .select("value")
        .collect()
    ]
    mapping = resolve_header_mapping(
        headers, ["part_number", "manufacturer", "results"]
    )

    # pivot the cell grid to record shape on the mapped columns
    def col_for(canonical):
        return F.max(
            F.when(F.col("col_idx") == mapping[canonical], F.col("value"))
        ).alias(canonical)

    records = (
        dense_tables.filter(F.col("row_idx") > 0)
        .groupBy("doc_filename", "table_title", "page", "table_idx", "row_idx")
        .agg(
            col_for("part_number"),
            col_for("manufacturer"),
            col_for("results"),
        )
    )

    classified = records.withColumn(
        "table_type", classify_title("table_title")
    ).filter(F.col("table_type") == "rad")
    dense = classified.filter(
        row_density(["part_number", "manufacturer", "results"]) >= 0.5
    )
    normalized = dense.select(
        "table_title",
        "doc_filename",
        normalize_expr("part_number").alias("part_number"),
        normalize_expr("manufacturer").alias("manufacturer"),
        normalize_expr("results").alias("results"),
    )
    projected = project_with_lineage(
        normalized,
        {
            "part_number": "part_number",
            "manufacturer": "manufacturer",
            "results": "results",
        },
        source_paper=F.col("table_title"),
        source_paper_filename=F.col("doc_filename"),
    )
    out = projected.dropDuplicates()
    assert out.count() == GOLDEN_2006_ROWS
    cells.unpersist()
