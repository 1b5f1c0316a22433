"""A17/A8 as a Spark 4 Python DataSource WRITER: ``df.write.format("jsonl")``.

The writer half of the Python DataSource API (the reader half is
``sources/pdf_datasource.py``): each task serializes its partition to one
JSONL part file staged under ``_staging/``, returns a commit message with
its file name and row count, and the DRIVER commit publishes atomically —
staged files rename into place and a ``_MANIFEST.json`` (file list + row
counts) appears last, so readers that respect the manifest never observe a
torn write; ``abort()`` discards the staging dir. This is the same
stage-then-publish discipline as ``catalog/txn.py``, expressed through
Spark's sink contract (WriterCommitMessage), and the JSONL payload is the
interchange format LLM-pipeline tooling actually consumes.

Scale notes: one file per task (no driver data path — only tiny commit
messages cross), rows serialize with sorted keys for determinism, and the
output reads back with ``spark.read.json`` (round-trip oracle-gated by
``pyds_jsonl_roundtrip_nation``).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")

    def write(self, rows) -> JsonlCommit:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), sort_keys=True, default=str))
                f.write("\n")
                n += 1
        return JsonlCommit(name, n)

    def commit(self, messages) -> None:
        import shutil

        staging = os.path.join(self.path, "_staging")
        manifest = []
        for m in messages:
            if m.n_rows == 0:
                os.unlink(os.path.join(staging, m.filename))
                continue
            os.rename(
                os.path.join(staging, m.filename),
                os.path.join(self.path, m.filename),
            )
            manifest.append({"file": m.filename, "n_rows": m.n_rows})
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(sorted(manifest, key=lambda x: x["file"]), f)
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDataSource)
