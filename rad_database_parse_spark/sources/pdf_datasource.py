"""A1/A2 as a Spark 4 Python DataSource: ``spark.read.format("pdf")``.

The modern integration point for the reference's directory-of-PDFs corpus
(main.py:88-92): after ``register_pdf_datasource(spark)``, the whole ETL
front end is one line —

    cells = spark.read.format("pdf").schema(CELL_DDL).load("/data/docs")

Partition planning is one InputPartition per file, so a directory of 10k
PDFs fans out across the cluster; each task runs the (pluggable) extraction
library on its file and emits the same cell grid as
``sources.pdf.extract_pdf_cells``. Without the camelot toolchain (absent in
this container) the reader degrades to a deterministic stub grid when
``stub=true`` is set, else zero rows — the downstream plan is identical
either way, which is what the tests pin.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .pdf import CELL_DDL, _camelot_extractor


class _PdfFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PdfTableReader(DataSourceReader):
    def __init__(self, options):
        self.dir_path = options.get("path")
        self.stub = str(options.get("stub", "false")).lower() == "true"

    def partitions(self):
        paths = sorted(
            os.path.join(self.dir_path, f)
            for f in os.listdir(self.dir_path)
            if f.endswith(".pdf")
        )
        # the reader API requires ≥1 partition; an empty corpus gets one
        # no-op partition that yields nothing
        return [_PdfFilePartition(p) for p in paths] or [_PdfFilePartition("")]

    def read(self, partition: _PdfFilePartition):
        if not partition.path:
            return
        fname = partition.path.rsplit("/", 1)[-1]
        ex = _camelot_extractor()
        if ex is not None:  # pragma: no cover - toolchain absent here
            with open(partition.path, "rb") as fh:
                content = fh.read()
            for title, page, tidx, ttitle, ridx, cidx, val in ex(fname, content):
                yield (fname, title, page, tidx, ttitle, ridx, cidx, val)
        elif self.stub:
            # deterministic fake grid: one 2x2 table on page 1, derived only
            # from the filename so every engine/run agrees
            for r in range(2):
                for c in range(2):
                    yield (
                        fname,
                        f"{fname}:title",
                        1,
                        0,
                        "Stub Table",
                        r,
                        c,
                        f"{fname}:{r}:{c}",
                    )
        # else: graceful degrade — no toolchain, no stub → zero rows


class PdfTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pdf"

    def schema(self) -> str:
        return CELL_DDL

    def reader(self, schema) -> PdfTableReader:
        return PdfTableReader(self.options)


def register_pdf_datasource(spark) -> None:
    spark.dataSource.register(PdfTableDataSource)
