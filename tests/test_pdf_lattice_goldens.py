"""Pure-Python golden tests for the lattice extractor across reference
compendium generations (no Spark needed — the extractor runs inside the
mapInPandas UDF worker, so this is exactly the code path the Spark
pipeline executes per file).

Golden counts come from BASELINE.md's per-file distribution (queried
from the reference's own main.db). The reference run included a manual
CSV gate, so only the files whose counts reproduce MECHANICALLY are
asserted exactly here:

- 2006 -> 28 (also field-exact; the Spark end-to-end test asserts that)
- 2011 -> 91, 2015 -> 64, 2017 -> 16 (mechanically exact counts;
  2011 is also 81/91 field-exact — the rest differ by one space)
- 2005 / 2019 -> skipped entirely (no PDF metadata -> get_pdf_title
  None -> file ignored; the reference's '10/12 PDFs contribute')
- 2016 -> 67 under the DENSITY validity regime (its main.db load ran
  with --csv_bypass; see test_golden_2016_density_regime)
- 2007 is a scanned/OCR file (table rules live in the page IMAGE, not
  in vector ops) — the pure extractor yields no tables, degrading
  gracefully to zero rows instead of failing; the decoder-unavailable
  proof is pinned in test_2007_rules_are_provably_unreachable_without_jbig2.

The four remaining residuals (2010 55vs50, 2013 97vs95, 2014 102vs86,
2018 15vs12) are GRID-level camelot divergences, proven by forensics on
main.db rather than loader semantics (round 8): the reference's 2013
`results` values carry the PI column's initials as prefixes ("JP ",
"MeC ", "DC ", "RL " — e.g. 'JP All parameters passed up to…'), i.e.
camelot's Ghostscript-raster line detection at line_scale=40 MERGED the
PI column into RESULTS, and several multi-line cells were split into
separate rows ('monotonically for biased par…' as a standalone results
value). Row-by-row, our 2013 extraction matches main.db pairwise except
for those merge artifacts. 2014 (the largest residual) completes the
story from the other side: ALL 86 of its main.db part numbers appear
in our 102 extracted rows — the residual is PURE over-extraction of 16
rows (15 part numbers + 1 multiplicity) scattered inside Tables
VII/VIII that camelot's raster grid lost or invalidated; nothing the
reference extracted is missing from us on any residual file.
Reproducing the losses would mean replicating Ghostscript
rasterization + OpenCV morphology pixel-exactly — raster artifacts,
not PDF semantics — so the residual counts are pinned here as
documented divergences, not bugs.
"""

import os
import re

import pytest

from rad_database_parse_spark.operators.header_map import _partial_ratio
from rad_database_parse_spark.sources.pdf_lattice import extract_tables

DOCS = "/root/reference/docs"

CATEGORIES = [
    "part number",
    "manufacturer",
    "device function",
    "technology",
    "results",
    "spec",
    "dose rate",
    "proton energy",
    "degradation level",
    "proton fluence",
]


def _map_header(header):
    """The reference's map_header (tables.py:167-203): per-category
    argmax of partial_ratio over the header cells, >= 75 gate, with the
    'deg level' alias for degradation level."""
    scores = []
    for elem in header:
        e = str(elem).strip().replace("\n", "").lower()
        scores.append(
            [
                max(
                    _partial_ratio(c, e),
                    _partial_ratio("deg level", e)
                    if c == "degradation level"
                    else 0,
                )
                for c in CATEGORIES
            ]
        )
    out = {}
    for ci, cat in enumerate(CATEGORIES):
        mx, mi = 0, None
        for ri in range(len(header)):
            if scores[ri][ci] > mx:
                mx, mi = scores[ri][ci], ri
        out[cat] = mi if mx >= 75 else None
    return out


def _reference_row_count(content: bytes, validity: str = "strict") -> int | None:
    """The reference loader's row count for one file: density gate +
    continuation merge (get_all_tables), rad classification
    (find_table_type), per-table fuzzy header map, the regime-selected
    row-validity rule, and whole-row dedup (check_if_exists with quotes
    stripped). None when the file has no metadata (skipped).

    Validity regimes (the reference had BOTH, selected by main.py's
    --csv_bypass flag, and main.db was built incrementally across runs
    with different flags — main.py:90 skips already-loaded files):
    - "strict" (csv_check ran): the pandas round trip turns every empty
      mapped cell into NaN and map_row raises -> ANY empty mapped cell
      invalidates the row. main.db's 2006 rows have zero ''-fields.
    - "density" (--csv_bypass): values reach map_row as camelot's
      strings ('' included), so the only gate is get_mapped_row_type's
      (tables.py:252-263) density check: valid iff (non-empty mapped
      values + 2 constants)/10 >= 0.5, empty mapped cells INSERTED as
      ''. main.db's 2016 rows include 4 rows with ''-valued mapped
      fields (ids 3/7/34), which strict could never produce."""
    title, raw = extract_tables(content)
    if title is None:
        return None
    tables = []
    for _pno, _bbox, grid, heading in raw:
        if not grid or not grid[0]:
            continue
        density = sum((len(r) - r.count("")) / len(r) for r in grid) / len(grid)
        if density > 0.25:
            if heading == "":
                if tables:
                    tables[-1] = (tables[-1][0], tables[-1][1] + grid[1:])
            else:
                tables.append((heading, list(grid)))
    n = 0
    seen = set()
    for ttitle, grid in tables:
        if re.search(
            r"\b(principal|investigator|acronym|abbreviations)\b", ttitle, re.I
        ):
            continue
        if not re.search(
            r"\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\b", ttitle, re.I
        ):
            continue
        mapping = _map_header(grid[0])
        idxs = [mi for mi in mapping.values() if mi is not None]
        if (len(idxs) + 2) / 10 < 0.5:
            continue
        for r in grid[1:]:
            vals = [(r[mi] if mi < len(r) else None) for mi in idxs]
            if validity == "strict":
                if any(not v for v in vals):
                    continue
            else:
                if sum(1 for v in vals if v) + 2 < 5:
                    continue
            key = tuple(
                (v or "").replace('"', "").replace("'", "") for v in vals
            )
            if key not in seen:
                seen.add(key)
                n += 1
    return n


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
@pytest.mark.parametrize(
    "fname,golden",
    [
        ("2006-nasa-compendium.pdf", 28),
        ("2011-nasa-compendium.pdf", 91),
        ("2015-nasa-compendium.pdf", 64),
        ("2017-nasa-compendium.pdf", 16),
    ],
)
def test_golden_row_counts(fname, golden):
    content = open(os.path.join(DOCS, fname), "rb").read()
    assert _reference_row_count(content) == golden


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
def test_golden_2016_density_regime():
    """2016's main.db load ran under --csv_bypass: its 67 rows include 4
    with ''-valued MAPPED fields (ids 3/7/34 — manufacturer='',
    technology='', spec=''), which the strict (csv_check) regime can
    never insert ('' -> NaN -> map_row raises). Under the density
    regime the count is exactly 67; under strict it is 66 — the one
    missing row is main.db id 34 (part '(ENGINEERING  SAMPLES)',
    dose_rate 0.5, degradation '>20'), whose mapped technology and spec
    cells are empty and which only get_mapped_row_type's density>=0.5
    gate admits (6 non-empty mapped + 2 constants = 0.8)."""
    content = open(os.path.join(DOCS, "2016-nasa-compendium.pdf"), "rb").read()
    assert _reference_row_count(content, validity="density") == 67
    assert _reference_row_count(content, validity="strict") == 66


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
@pytest.mark.parametrize(
    "fname", ["2005-nasa-compendium-b.pdf", "2019-nasa-compendium.pdf"]
)
def test_metadata_less_files_are_skipped(fname):
    content = open(os.path.join(DOCS, fname), "rb").read()
    assert _reference_row_count(content) is None


def _row_dicts(content: bytes, validity: str):
    """Deduped row dicts (canonical column -> value) for the field-
    exactness census — same chain as _reference_row_count but keeping
    the values."""
    canon = {c: c.replace(" ", "_") for c in CATEGORIES}
    title, raw = extract_tables(content)
    tables = []
    for _pno, _bbox, grid, heading in raw:
        if not grid or not grid[0]:
            continue
        density = sum((len(r) - r.count("")) / len(r) for r in grid) / len(grid)
        if density > 0.25:
            if heading == "":
                if tables:
                    tables[-1] = (tables[-1][0], tables[-1][1] + grid[1:])
            else:
                tables.append((heading, list(grid)))
    out, seen = [], set()
    for ttitle, grid in tables:
        if re.search(
            r"\b(principal|investigator|acronym|abbreviations)\b", ttitle, re.I
        ):
            continue
        if not re.search(
            r"\b(tid|see|dd|ddd|seu|let|ongoing|dose|result)\b", ttitle, re.I
        ):
            continue
        mapping = _map_header(grid[0])
        idxs = {c: mi for c, mi in mapping.items() if mi is not None}
        if (len(idxs) + 2) / 10 < 0.5:
            continue
        for r in grid[1:]:
            vals = {c: (r[mi] if mi < len(r) else None) for c, mi in idxs.items()}
            if validity == "strict":
                if any(not v for v in vals.values()):
                    continue
            elif sum(1 for v in vals.values() if v) + 2 < 5:
                continue
            d = {canon[c]: (v or "").replace("\n", " ") for c, v in vals.items()}
            key = tuple(
                sorted(
                    (k, v.replace('"', "").replace("'", ""))
                    for k, v in d.items()
                )
            )
            if key in seen:
                continue
            seen.add(key)
            out.append(d)
    return out


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
@pytest.mark.parametrize(
    "fname,regime,golden_exact,total",
    [
        # field-exact = reference main.db rows whose EVERY stored column
        # byte-matches one of ours (multiset semantics). The shortfalls
        # are pinned reference-side camelot-grid artifacts, diagnosed in
        # the r8 session: 2011's one miss is a superscript band-union
        # edge (cm-2 line separation); 2016's four are spanning cells
        # camelot left empty / a PI-initial column merge ('MJC ...');
        # 2017's two are an LDC-column merge ('1203, 1233; (16-007)
        # Optocoupler') and a row-boundary split.
        ("2006-nasa-compendium.pdf", "strict", 28, 28),
        ("2011-nasa-compendium.pdf", "strict", 90, 91),
        ("2015-nasa-compendium.pdf", "strict", 64, 64),
        ("2017-nasa-compendium.pdf", "strict", 14, 16),
        ("2016-nasa-compendium.pdf", "density", 63, 67),
    ],
)
def test_field_exactness_census(fname, regime, golden_exact, total):
    import sqlite3

    cols = [c.replace(" ", "_") for c in CATEGORIES]
    db = sqlite3.connect("/root/reference/main.db")
    ref = [
        {c: v for c, v in zip(cols, row) if v is not None}
        for row in db.execute(
            f"SELECT {','.join(cols)} FROM rad_table"
            " WHERE source_paper_filename = ?",
            (fname,),
        ).fetchall()
    ]
    db.close()
    ours = _row_dicts(open(os.path.join(DOCS, fname), "rb").read(), regime)
    counts: dict = {}
    for d in ours:
        k = frozenset(d.items())
        counts[k] = counts.get(k, 0) + 1
    exact = 0
    for rd in ref:
        k = frozenset(rd.items())
        if counts.get(k, 0) > 0:
            counts[k] -= 1
            exact += 1
    assert len(ref) == total
    assert exact == golden_exact


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
@pytest.mark.parametrize(
    "fname",
    [
        "2006-nasa-compendium.pdf",
        "2010-nasa-compendium.pdf",
        "2011-nasa-compendium.pdf",
        "2013-nasa-compendium.pdf",
        "2014-nasa-compendium.pdf",
        "2015-nasa-compendium.pdf",
        "2016-nasa-compendium.pdf",
        "2017-nasa-compendium.pdf",
        "2018-nasa-compendium.pdf",
    ],
)
def test_reference_part_numbers_are_subset_of_ours(fname):
    """Direction-of-error invariant for every vector-PDF compendium:
    every part number the reference extracted into main.db appears in
    OUR extraction (whitespace/quote-normalized). The residual files'
    count gaps are therefore pure OVER-extraction of rows camelot's
    raster grid lost or invalidated — the reference's output is a
    subset; we never lose a row it kept (2007 excluded: JBIG2 scan,
    see the decoder-unavailable proof)."""
    import sqlite3

    def norm(s):
        return re.sub(r"\s+", " ", (s or "")).strip().replace('"', "").replace("'", "")

    db = sqlite3.connect("/root/reference/main.db")
    ref = {
        norm(r[0])
        for r in db.execute(
            "SELECT part_number FROM rad_table WHERE source_paper_filename = ?",
            (fname,),
        ).fetchall()
    }
    db.close()
    content = open(os.path.join(DOCS, fname), "rb").read()
    ours = {
        norm(d.get("part_number"))
        for d in _row_dicts(content, "density")
    } | {
        norm(d.get("part_number"))
        for d in _row_dicts(content, "strict")
    }
    assert ref, "reference rows must exist for a contributing file"
    assert ref - ours == set()


def test_parse_string_non_octal_escape_is_literal():
    # PDF spec: a backslash before a non-octal digit is ignored — \8
    # must yield '8', not crash the whole file's extraction (ADVICE r7)
    from rad_database_parse_spark.sources.pdf_lattice import _parse_string

    out, j = _parse_string(rb"(a\8b\101c)", 0)
    assert out == b"a8bAc"
    assert j == len(rb"(a\8b\101c)")


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
def test_scanned_file_degrades_to_zero_rows():
    content = open(os.path.join(DOCS, "2007-nasa-compendium.pdf"), "rb").read()
    # OCR'd scan: metadata exists but the rules are raster — no tables,
    # no crash (the reference needed Ghostscript+OpenCV to read these)
    assert _reference_row_count(content) == 0


def _jbig2_segment_types(data: bytes) -> set[str]:
    """Segment types of an embedded JBIG2 stream (ITU-T T.88 §7.2:
    header = 4-byte number, flags [type = low 6 bits], referred-to
    list, page association, 4-byte data length)."""
    import struct

    names = {0: "symbol-dict", 6: "imm-text", 7: "imm-lossless-text",
             36: "generic-i", 38: "generic-imm", 39: "generic-imm-ll",
             48: "page-info"}
    i, out = 0, set()
    while i < len(data) - 11:
        segnum = struct.unpack(">I", data[i : i + 4])[0]
        flags = data[i + 4]
        pa = (flags >> 6) & 1
        j = i + 5
        cnt = data[j] >> 5
        if cnt == 7:
            cnt = struct.unpack(">I", data[j : j + 4])[0] & 0x1FFFFFFF
            j += 4 + (cnt + 8) // 8
        else:
            j += 1
        j += cnt * (1 if segnum <= 256 else 2 if segnum <= 65536 else 4)
        j += 4 if pa else 1
        dlen = struct.unpack(">I", data[j : j + 4])[0]
        j += 4
        out.add(names.get(flags & 0x3F, str(flags & 0x3F)))
        if dlen == 0xFFFFFFFF:
            break
        i = j + dlen
    return out


@pytest.mark.skipif(not os.path.isdir(DOCS), reason="reference docs absent")
def test_2007_rules_are_provably_unreachable_without_jbig2():
    """The PROOF (VERDICT r7 item 6) that 2007's 23 reference rows are
    unreachable without a JBIG2 decoder, pinned mechanically:

    1. every page has an OCR TEXT layer (pdfminer/camelot read the cell
       text from it) but essentially NO vector path ops — zero `re`
       rectangles, ≤2 stray m/l ops per page: the lattice RULES are not
       in the content streams;
    2. every page's only image XObject is a 1-bit JBIG2Decode scan
       (camelot's Ghostscript raster renders it, OpenCV finds the rules
       there);
    3. those JBIG2 streams use SYMBOL-DICTIONARY + TEXT-REGION coding
       (ITU-T T.88 §6.4-6.5) — decoding needs the MQ arithmetic coder
       plus symbol-dictionary and text-region composition, a full T.88
       implementation, NOT a 'minimal raster row/column projection';
       the container ships zlib only.
    """
    import re as _re

    from rad_database_parse_spark.sources.pdf_lattice import (
        PdfDoc,
        _Name,
    )

    content = open(os.path.join(DOCS, "2007-nasa-compendium.pdf"), "rb").read()
    doc = PdfDoc(content)
    pages = doc.pages()
    assert len(pages) == 8
    for pg in pages:
        data = doc.content_bytes(pg)
        # an OCR text layer exists...
        assert len(_re.findall(rb"\bTj\b|\bTJ\b", data)) > 40
        # ...but no vector rules (camelot-lattice needs them from the
        # raster instead)
        assert len(_re.findall(rb"\bre\b", data)) == 0
        assert len(_re.findall(rb"\b[ml]\b", data)) <= 2
        res = doc.resolve(pg.get(_Name("Resources")))
        xo = doc.resolve(res[_Name("XObject")])
        assert len(xo) == 1
        im = doc.resolve(next(iter(xo.values())))
        assert str(doc.resolve(im.dict.get(_Name("Filter")))) == "JBIG2Decode"
        assert doc.resolve(im.dict.get(_Name("BitsPerComponent"))) == 1
        segs = _jbig2_segment_types(im.raw)
        assert "symbol-dict" in segs and "imm-text" in segs
