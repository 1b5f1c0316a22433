"""One-off probe (round 8): compare three dedup semantics per compendium
file against the reference's golden per-file counts (main.db).

  tuple   — the current pipeline/test model: whole-key dedup on the
            row's mapped-value tuple (set membership).
  subset  — the reference's real check_if_exists semantics
            (database.py:17-60 via tables.py map_row): a new row is
            skipped iff ANY previously-inserted row of the same file
            agrees on ALL of the new row's mapped columns (query values
            quote-stripped; stored values kept verbatim, '\n'->' ').
  subset_global — same, but matching rows from ANY earlier file too
            (the real query has source_paper/source_paper_filename in
            the keys, so this should equal `subset`; kept as a sanity
            arm).
"""

import os
import re
import sqlite3
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rad_database_parse_spark.operators.header_map import _partial_ratio  # noqa: E402
from rad_database_parse_spark.sources.pdf_lattice import extract_tables  # noqa: E402

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


def rows_for_file(content):
    """Yield (mapped {cat: value}) dicts in reference insertion order,
    pre-dedup (density gate, continuation merge, classification,
    header map, validity all applied)."""
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
    out = []
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
            if any(not v for v in vals.values()):
                continue
            out.append({c: v.replace("\n", " ") for c, v in vals.items()})
    return out


def strip_q(v):
    return v.replace('"', "").replace("'", "")


def count_tuple(rows):
    seen, n = set(), 0
    for m in rows:
        key = tuple(strip_q(v) for v in m.values())
        if key not in seen:
            seen.add(key)
            n += 1
    return n


def count_subset(rows, inserted=None):
    if inserted is None:
        inserted = []
    n = 0
    for m in rows:
        dup = any(
            all(p.get(c) == strip_q(v) for c, v in m.items()) for p in inserted
        )
        if not dup:
            inserted.append(dict(m))
            n += 1
    return n


def main():
    db = sqlite3.connect("/root/reference/main.db")
    gold = dict(
        db.execute(
            "SELECT source_paper_filename, COUNT(*) FROM rad_table "
            "GROUP BY source_paper_filename"
        ).fetchall()
    )
    print("golden per-file:", gold)
    global_inserted = []
    for fname in sorted(os.listdir(DOCS)):
        content = open(os.path.join(DOCS, fname), "rb").read()
        rows = rows_for_file(content)
        if rows is None:
            print(f"{fname}: skipped (no metadata)")
            continue
        t = count_tuple(rows)
        s = count_subset(rows)
        sg = count_subset(rows, global_inserted)
        gkey = [k for k in gold if fname.split("-")[0] in k]
        g = gold.get(f"docs/{fname}", gold.get(fname, gkey and gold[gkey[0]]))
        print(f"{fname}: tuple={t} subset={s} subset_global={sg} golden={g}")


if __name__ == "__main__":
    main()
