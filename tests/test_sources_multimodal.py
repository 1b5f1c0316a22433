import os

from rad_database_parse_spark.llm.multimodal import (
    attach_binary_payload,
    decode_media,
    payload_stats,
)
from rad_database_parse_spark.sources.files import read_binary_dir
from rad_database_parse_spark.sources.pdf import extract_pdf_cells


def test_binary_scan_and_pdf_cell_extraction(spark, tmp_path):
    # nested so cloudpickle ships it by value (test modules aren't importable
    # on executors)
    def _fake_extractor(filename, content):
        n_pages = max(1, len(content) // 100)
        rows = []
        for page in range(1, n_pages + 1):
            rows.append((f"title-{filename}", page, 0, "TID Results", 0, 0, "Part Number"))
            rows.append((f"title-{filename}", page, 0, "TID Results", 0, 1, "Mfr."))
            rows.append((f"title-{filename}", page, 0, "TID Results", 1, 0, f"P{page}"))
            rows.append((f"title-{filename}", page, 0, "TID Results", 1, 1, "ACME"))
        return rows

    for i in range(3):
        (tmp_path / f"doc{i}.pdf").write_bytes(b"x" * (150 * (i + 1)))
    (tmp_path / "ignore.txt").write_text("not a pdf")
    files = read_binary_dir(spark, str(tmp_path))
    assert files.count() == 3  # glob filter applied at the source
    cells = extract_pdf_cells(files, extractor=_fake_extractor)
    got = cells.collect()
    assert len(got) == (150 // 100 + 300 // 100 + 450 // 100) * 4  # pages per file × 4 cells
    assert {r.doc_filename for r in got} == {"doc0.pdf", "doc1.pdf", "doc2.pdf"}
    assert all(r.table_title == "TID Results" for r in got)


def test_pdf_extraction_degrades_gracefully_without_toolchain(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(b"%PDF-1.4 fake")
    files = read_binary_dir(spark, str(tmp_path))
    cells = extract_pdf_cells(files, extractor=None)  # camelot absent here
    assert cells.count() == 0  # skip, don't fail (reference tables.py:83-84)
    assert cells.columns == [
        "doc_filename", "doc_title", "page", "table_idx",
        "table_title", "row_idx", "col_idx", "value",
    ]


def test_multimodal_payload_and_fake_decode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    with_payload = attach_binary_payload(docs, "text")
    stats = payload_stats(with_payload)
    r = stats.select("doc_id", "n_bytes", "sha256").collect()
    assert all(row.n_bytes > 0 and len(row.sha256) == 64 for row in r)
    feats = decode_media(with_payload, payload_col="payload", id_col="doc_id")
    rows = feats.collect()
    assert len(rows) == 20
    assert all(row.media_type == "fake" and len(row.features) == 4 for row in rows)
    # determinism: same payload → same pseudo-metadata
    again = {row.doc_id: row.width for row in feats.collect()}
    assert {row.doc_id: row.width for row in rows} == again


def test_pdf_python_datasource_stub_grid(spark, tmp_path):
    """spark.read.format('pdf') through the Spark 4 Python DataSource: one
    partition per file, deterministic stub grid when the extraction
    toolchain is absent."""
    from rad_database_parse_spark.sources.pdf_datasource import (
        register_pdf_datasource,
    )

    d = tmp_path / "docs"
    d.mkdir()
    for name in ("a.pdf", "b.pdf"):
        (d / name).write_bytes(b"%PDF-1.4 fake")
    (d / "ignore.txt").write_text("not a pdf")

    register_pdf_datasource(spark)
    cells = (
        spark.read.format("pdf").option("stub", "true").load(str(d))
    )
    rows = cells.collect()
    assert len(rows) == 8  # 2 files x 2x2 grid
    assert {r.doc_filename for r in rows} == {"a.pdf", "b.pdf"}
    assert {r.value for r in rows if r.doc_filename == "a.pdf"} == {
        "a.pdf:0:0", "a.pdf:0:1", "a.pdf:1:0", "a.pdf:1:1"
    }
    # graceful degrade: no stub, no toolchain -> zero rows, same schema
    empty = spark.read.format("pdf").load(str(d))
    assert empty.count() == 0 and empty.columns == cells.columns


def test_jsonl_manifest_sink_atomic_publish(spark, tmp_path):
    import json
    import os

    from rad_database_parse_spark.sources.jsonl_sink import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "id * 2 AS v").repartition(8)
    df.write.format("jsonl_manifest").mode("append").save(out)
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(m["n_rows"] for m in manifest) == 100
    # every manifest entry exists, no staging residue, no unlisted parts
    parts = {f for f in os.listdir(out) if f.startswith("part-")}
    assert parts == {m["file"] for m in manifest}
    assert not os.path.isdir(os.path.join(out, "_staging"))
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 100
    assert back.selectExpr("sum(v)").collect()[0][0] == sum(2 * i for i in range(100))
