"""A2/A3/A4 integration test against a REAL reference PDF — live path.

The container ships no camelot/Ghostscript, so ``extract_pdf_cells``
falls back to the pure-Python lattice extractor (sources/pdf_lattice.py:
stdlib PDF parser + content-stream interpreter + camelot-style grid with
span-anchor text reduction and copy_text='v'). This test runs the FULL
reference pipeline shape on the 2006 compendium — binaryFile scan →
cell grid → A5 density gate → A6 continuation merge → A9 classification
→ A10 per-table fuzzy header mapping → row validity (the reference's
CSV-round-trip NaN semantics: any empty mapped cell invalidates the row)
→ A14 exact dedup — and asserts FIELD-EXACT equality with the rows the
reference itself produced into main.db (reference pipeline:
tables.py:51-97 get_all_tables + map_header/map_row, main.py:88-106).

Golden: 28 rows for 2006 (BASELINE.md per-file distribution), all six
mapped fields byte-identical to the reference database.
"""

import os
import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window

from rad_database_parse_spark.operators.core import (
    classify_title,
    table_density_filter,
)
from rad_database_parse_spark.operators.header_map import (
    resolve_header_mapping,
)
from rad_database_parse_spark.sources.pdf import extract_pdf_cells

REFERENCE_PDF = "/root/reference/docs/2006-nasa-compendium.pdf"
REFERENCE_DB = "/root/reference/main.db"
GOLDEN_2006_ROWS = 28  # BASELINE.md per-file distribution (main.db)

CATS = [
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


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_PDF), reason="reference PDF not present"
)
def test_real_pdf_extraction_lands_golden_counts(spark):
    files = spark.read.format("binaryFile").load(REFERENCE_PDF)
    cells = extract_pdf_cells(files).persist()
    assert cells.count() > 0, "extractor produced no cells from a real PDF"

    # A5: table-level density gate (reference get_table_density > 0.25)
    dense = table_density_filter(
        cells,
        group_cols=["doc_filename", "page", "table_idx"],
        value_cols=["value"],
        threshold=0.25,
    )

    # A6: continuation merge — a '' title marks a page-break fragment; it
    # adopts the last surviving anchor (title + identity) and drops its
    # repeated header row (reference get_all_tables, tables.py:90-93)
    w = (
        Window.partitionBy("doc_filename")
        .orderBy("page", "table_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_anchor = F.trim(F.col("table_title")) != ""
    titled = (
        dense.withColumn(
            "effective_title",
            F.last(
                F.when(is_anchor, F.col("table_title")), ignorenulls=True
            ).over(w),
        )
        .withColumn(
            "anchor",
            F.last(
                F.when(is_anchor, F.struct("page", "table_idx")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("anchor").isNotNull())
        .filter(is_anchor | (F.col("row_idx") > 0))
    )

    # A9: classification on the merged title (reference find_table_type)
    rad = titled.withColumn(
        "ttype", classify_title("effective_title")
    ).filter(F.col("ttype") == "rad")

    # A10: per-merged-table header mapping — headers are BOUNDED (one row
    # of cells per table), so resolution is driver-side planning work
    hdr_rows = (
        rad.filter(is_anchor & (F.col("row_idx") == 0))
        .select("anchor", "col_idx", "value")
        .collect()
    )
    headers: dict[tuple, dict[int, str]] = {}
    for r in hdr_rows:
        key = (r["anchor"]["page"], r["anchor"]["table_idx"])
        headers.setdefault(key, {})[r["col_idx"]] = r["value"]
    mapping_rows = []
    for (apage, atidx), hmap in headers.items():
        hdr = [hmap.get(i, "") for i in range(max(hmap) + 1)]
        mapping = resolve_header_mapping(hdr, CATS)
        for canon, idx in mapping.items():
            mapping_rows.append((apage, atidx, idx, canon))
    mapping_df = spark.createDataFrame(
        mapping_rows, "apage int, atidx int, col_idx int, canon string"
    )

    # project mapped columns per table (broadcast plan join + pivot)
    data = rad.filter(~(is_anchor & (F.col("row_idx") == 0))).select(
        F.col("anchor.page").alias("apage"),
        F.col("anchor.table_idx").alias("atidx"),
        "page",
        "table_idx",
        "row_idx",
        "col_idx",
        "value",
        "effective_title",
        "doc_filename",
        "doc_title",
    )
    recs = (
        data.join(F.broadcast(mapping_df), ["apage", "atidx", "col_idx"])
        .groupBy(
            "apage",
            "atidx",
            "page",
            "table_idx",
            "row_idx",
            "effective_title",
            "doc_filename",
            "doc_title",
        )
        .agg(
            *[
                F.max(F.when(F.col("canon") == c, F.col("value"))).alias(c)
                for c in CATS
            ]
        )
    )

    # row validity: the reference's manual-CSV round trip turns empty
    # cells into NaN and map_row raises on them (tables.py:252-263 +
    # csv_check) — so a row survives only when EVERY mapped cell is
    # non-empty, and (n_mapped + 2) / 10 >= 0.5
    n_mapped = len({r[3] for r in mapping_rows})
    assert n_mapped == 6  # part/manu/function/results/dose/deg for 2006
    mapped_cats = sorted({r[3] for r in mapping_rows})
    valid = recs
    for c in mapped_cats:
        valid = valid.filter(
            F.col(c).isNotNull() & (F.col(c) != F.lit(""))
        )
    assert (n_mapped + 2) / 10 >= 0.5

    # map_row newline flattening + A14 exact dedup on quote-stripped keys
    out = valid.select(
        "doc_filename",
        "doc_title",
        *[
            F.regexp_replace(F.col(c), "\n", " ").alias(c)
            for c in mapped_cats
        ],
    )
    dedup_keys = [
        F.translate(F.col(c), "'\"", "").alias(f"_k_{c}")
        for c in mapped_cats
    ]
    out = (
        out.withColumn("_key", F.concat_ws("\x1f", *dedup_keys))
        .dropDuplicates(["_key"])
        .drop("_key")
        .persist()
    )

    rows = {
        (
            r["part_number"],
            r["manufacturer"],
            r["device_function"],
            r["results"],
            r["dose_rate"],
            r["degradation_level"],
        )
        for r in out.collect()
    }
    assert len(rows) == GOLDEN_2006_ROWS

    # field-exact parity with the reference's own database
    con = sqlite3.connect(REFERENCE_DB)
    db_rows = set(
        map(
            tuple,
            con.execute(
                "SELECT part_number, manufacturer, device_function,"
                " results, dose_rate, degradation_level FROM rad_table"
                " WHERE source_paper_filename LIKE '%2006%'"
            ).fetchall(),
        )
    )
    con.close()
    assert rows == db_rows

    # the metadata-title quirk (repr-of-bytes 'b' between Title+ModDate)
    titles = {r["doc_title"] for r in out.select("doc_title").collect()}
    assert titles == {
        "Compendium of Total Ionizing Dose Results and Displacement"
        " Damage Results for Candidate Spacecraft Electronics for"
        " NASAbD:20110705164300-0400"
    }
    cells.unpersist()
    out.unpersist()
