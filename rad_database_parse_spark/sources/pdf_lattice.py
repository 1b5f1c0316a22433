"""Pure-Python PDF lattice table extractor — the REAL A2/A3/A4 path.

The container ships no camelot/Ghostscript/pdfminer, so this module
re-implements the minimum of that toolchain from the public PDF 1.7
specification using only the stdlib (zlib, re): object graph + classic
xref parsing, FlateDecode content streams, a content-stream interpreter
that yields positioned text glyphs and vector rule segments, and a
lattice table builder (grid cells from ruled lines, vertical-span text
copy, nearest-heading title guess).

Behavioral reference (studied, not copied): the reference pipeline runs
camelot in lattice flavor with ``line_scale=40, copy_text=['v']``
(tables.py:54), guesses each table's title from the closest short text
above it (tables.py:28-48), and concatenates the PDF metadata Title +
ModDate through a ``repr``-of-bytes round-trip that leaves a literal
``b`` between them (tables.py:68-77) — all three quirks are reproduced
here so the golden per-file row counts in BASELINE.md land exactly.

Scope and verified coverage (against the reference's own main.db):
classic xref tables AND PDF 1.5+ cross-reference/object streams (with
PNG predictors), FlateDecode, simple Type1/TrueType fonts with
StandardEncoding + /Differences, tables drawn as thin filled rects or
stroked segments, pages with baked-in 90-degree rotation.

- 2006 compendium: 28/28 rows, all six mapped fields byte-identical
- 2011 -> 91/91 rows exact (81/91 byte-identical; the rest differ by a
  single space inside long multi-line cells), 2015 -> 64/64,
  2017 -> 16/16 row counts exact
- 2010/2013/2014/2016/2018 within rows of the golden counts (the
  reference run included a MANUAL CSV gate, so residual diffs are not
  all mechanically reproducible)
- 2005/2019: correctly skipped (no metadata — the reference ignores
  them too); 2007 (scanned/OCR: rules live in the page raster) degrades
  gracefully to zero rows — recovering it needs a raster decoder, which
  this container lacks.

Type0/Identity-H CID fonts decode through their /ToUnicode CMap;
WinAnsiEncoding via cp1252; super/subscripts merge into their base
line (0.45em of the larger glyph), and rules up to 6pt thick count as
lattice lines (some generations draw header separators as bars).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

# ----------------------------------------------------------------------
# Object-level parser
# ----------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref(tuple):
    """Indirect reference (num, gen)."""


class _Name(str):
    """PDF name object (distinct from strings)."""


@dataclass
class _Stream:
    dict: dict
    raw: bytes

    def data(self, doc: "PdfDoc") -> bytes:
        filt = doc.resolve(self.dict.get("Filter"))
        if filt is None:
            return self.raw
        filters = filt if isinstance(filt, list) else [filt]
        out = self.raw
        for f in filters:
            f = str(f)
            if f == "FlateDecode":
                out = zlib.decompress(out)
            else:  # DCTDecode images etc. — opaque, callers skip them
                return b""
        return out


def _png_unpredict(body: bytes, rowlen: int) -> bytes:
    """Undo PNG row predictors (Predictor >= 10): each row is prefixed
    with a filter byte; xref streams in practice use Up (2), but Sub,
    Average and Paeth are implemented for completeness."""
    out = bytearray()
    prev = bytearray(rowlen)
    stride = rowlen + 1
    for r in range(0, len(body) - stride + 1, stride):
        ft = body[r]
        row = bytearray(body[r + 1 : r + 1 + rowlen])
        if ft == 1:  # Sub (bpp=1 for xref fields)
            for i in range(1, rowlen):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # '%' comment
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            break
    return i


def _parse_name(data: bytes, i: int):
    j = i + 1
    n = len(data)
    while j < n and data[j] not in _WS and data[j] not in _DELIM:
        j += 1
    raw = data[i + 1 : j]
    # #xx hex escapes in names
    raw = re.sub(
        rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
    )
    return _Name(raw.decode("latin-1")), j


def _parse_string(data: bytes, i: int):
    # literal string with nested parens and backslash escapes -> bytes
    out = bytearray()
    depth = 1
    j = i + 1
    n = len(data)
    while j < n and depth:
        c = data[j]
        if c == 0x5C:  # backslash
            nxt = data[j + 1 : j + 2]
            if nxt in (b"n", b"r", b"t", b"b", b"f"):
                out.append({"n": 10, "r": 13, "t": 9, "b": 8, "f": 12}[nxt.decode()])
                j += 2
            elif nxt in (b"(", b")", b"\\"):
                out.append(nxt[0])
                j += 2
            elif nxt and nxt[0:1].isdigit():
                m = re.match(rb"[0-7]{1,3}", data[j + 1 : j + 4])
                if m is None:  # \8 or \9: not octal — PDF spec says the
                    out.append(nxt[0])  # backslash is simply ignored
                    j += 2
                else:
                    out.append(int(m.group(0), 8) & 0xFF)
                    j += 1 + m.end()
            elif nxt in (b"\n",):
                j += 2  # line continuation
            elif nxt == b"\r":
                j += 3 if data[j + 2 : j + 3] == b"\n" else 2
            else:
                j += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            j += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            j += 1
        else:
            out.append(c)
            j += 1
    return bytes(out), j


def _parse_hex(data: bytes, i: int):
    j = data.find(b">", i)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode()), j + 1


def _parse_value(data: bytes, i: int):
    i = _skip_ws(data, i)
    c = data[i : i + 1]
    if c == b"<":
        if data[i : i + 2] == b"<<":
            return _parse_dict(data, i)
        return _parse_hex(data, i)
    if c == b"(":
        return _parse_string(data, i)
    if c == b"/":
        return _parse_name(data, i)
    if c == b"[":
        out = []
        j = i + 1
        while True:
            j = _skip_ws(data, j)
            if data[j : j + 1] == b"]":
                return out, j + 1
            v, j = _parse_value(data, j)
            out.append(v)
    m = re.match(rb"(\d+)\s+(\d+)\s+R(?![A-Za-z0-9])", data[i : i + 48])
    if m:
        return _Ref((int(m.group(1)), int(m.group(2)))), i + m.end()
    m = re.match(rb"[-+]?(?:\d+\.\d*|\.\d+|\d+)", data[i : i + 64])
    if m:
        s = m.group(0)
        return (float(s) if b"." in s else int(s)), i + m.end()
    for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data[i : i + len(kw)] == kw:
            return val, i + len(kw)
    raise ValueError(f"unparseable PDF value at offset {i}: {data[i:i+24]!r}")


def _parse_dict(data: bytes, i: int):
    out: dict = {}
    j = i + 2
    while True:
        j = _skip_ws(data, j)
        if data[j : j + 2] == b">>":
            return out, j + 2
        key, j = _parse_name(data, j)
        val, j = _parse_value(data, j)
        out[str(key)] = val


class PdfDoc:
    """Minimal PDF reader: classic xref chains, object cache, page walk."""

    def __init__(self, data: bytes):
        self.data = data
        self._cache: dict[int, object] = {}
        self.xref: dict[int, int] = {}
        self._in_objstm: dict[int, tuple[int, int]] = {}
        self.trailer: dict = {}
        try:
            self._load_xref()
        except Exception:
            self.xref = {}
        if not self.xref:  # damaged/odd xref: fall back to a full scan
            for m in re.finditer(rb"(?:^|[\r\n])(\d+)\s+0\s+obj\b", data):
                self.xref[int(m.group(1))] = m.start(1)
            tr = data.rfind(b"trailer")
            if tr >= 0:
                self.trailer, _ = _parse_dict(
                    data, _skip_ws(data, tr + len(b"trailer"))
                )

    def _load_xref(self) -> None:
        data = self.data
        m = re.search(rb"startxref\s+(\d+)", data[-256:])
        if not m:
            raise ValueError("no startxref")
        queue = [int(m.group(1))]
        seen: set[int] = set()
        while queue:
            off = queue.pop(0)
            if not off or off in seen:
                continue
            seen.add(off)
            i = _skip_ws(data, off)
            if data[i : i + 4] == b"xref":
                queue.extend(self._load_xref_table(i + 4))
            else:
                queue.extend(self._load_xref_stream(i))

    def _load_xref_table(self, i: int) -> list[int]:
        data = self.data
        nxt: list[int] = []
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 7] == b"trailer":
                i = _skip_ws(data, i + 7)
                tr, i = _parse_dict(data, i)
                if not self.trailer:
                    self.trailer = tr
                if tr.get("Prev") is not None:
                    nxt.append(int(tr["Prev"]))
                # hybrid-reference files: the classic table is sparse and
                # the companion xref STREAM holds the real entries
                if tr.get("XRefStm") is not None:
                    nxt.insert(0, int(tr["XRefStm"]))
                return nxt
            m = re.match(rb"(\d+)\s+(\d+)", data[i : i + 48])
            if not m:
                raise ValueError("bad xref subsection")
            start, count = int(m.group(1)), int(m.group(2))
            i += m.end()
            i = _skip_ws(data, i)
            for k in range(count):
                ent = data[i : i + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", ent)
                if em and em.group(3) == b"n":
                    # earlier (newer) xref sections win
                    self.xref.setdefault(start + k, int(em.group(1)))
                i += 20 if ent[18:19] in b"\r\n " else len(ent)

    def _load_xref_stream(self, i: int) -> list[int]:
        """PDF 1.5 cross-reference STREAM: /W field widths, optional
        /Index subsections, FlateDecode + PNG predictors; type-2 entries
        point into object streams."""
        data = self.data
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj\b", data[i : i + 48])
        if not m:
            raise ValueError("xref offset points at neither table nor stream")
        j = i + m.end()
        d, j = _parse_value(data, j)
        if not isinstance(d, dict) or str(d.get("Type")) != "XRef":
            raise ValueError("not an XRef stream")
        j = _skip_ws(data, j)
        if data[j : j + 6] != b"stream":
            raise ValueError("XRef stream body missing")
        j += 6
        if data[j : j + 2] == b"\r\n":
            j += 2
        elif data[j : j + 1] in (b"\r", b"\n"):
            j += 1
        raw = data[j : j + int(d["Length"])]
        body = zlib.decompress(raw)
        parms = d.get("DecodeParms") or {}
        if isinstance(parms, list):
            parms = parms[0] or {}
        pred = int(parms.get("Predictor", 1) or 1)
        w = [int(x) for x in d["W"]]
        rowlen = sum(w)
        if pred >= 10:
            body = _png_unpredict(body, rowlen)
        index = d.get("Index") or [0, int(d["Size"])]
        if not self.trailer:
            self.trailer = d
        pairs = [
            (int(index[k]), int(index[k + 1])) for k in range(0, len(index), 2)
        ]
        pos = 0

        def field(width):
            nonlocal pos
            v = int.from_bytes(body[pos : pos + width], "big") if width else None
            pos += width
            return v

        for start, count in pairs:
            for k in range(count):
                t = field(w[0])
                f2 = field(w[1])
                f3 = field(w[2])
                if t is None:
                    t = 1  # default type when W[0] == 0
                num = start + k
                if num in self.xref or num in self._in_objstm:
                    pos_skip = None  # newer sections win
                    continue
                if t == 1:
                    self.xref[num] = f2
                elif t == 2:
                    self._in_objstm[num] = (f2, f3)  # (objstm num, index)
        return [int(d["Prev"])] if d.get("Prev") is not None else []

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.xref.get(num)
        if off is None:
            loc = self._in_objstm.get(num)
            if loc is None:
                return None
            val = self._load_from_objstm(num, *loc)
            self._cache[num] = val
            return val
        data = self.data
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj\b", data[off : off + 48])
        if not m:
            return None
        i = off + m.end()
        val, i = _parse_value(data, i)
        i = _skip_ws(data, i)
        if data[i : i + 6] == b"stream":
            i += 6
            if data[i : i + 2] == b"\r\n":
                i += 2
            elif data[i : i + 1] in (b"\r", b"\n"):
                i += 1
            length = self.resolve(val.get("Length")) if isinstance(val, dict) else None
            if isinstance(length, (int, float)):
                raw = data[i : i + int(length)]
            else:  # unresolvable length: scan to endstream
                end = data.find(b"endstream", i)
                raw = data[i:end].rstrip(b"\r\n")
            val = _Stream(dict=val, raw=raw)
        self._cache[num] = val
        return val

    def _load_from_objstm(self, num: int, stm_num: int, idx: int):
        """Load a compressed object out of its /Type/ObjStm container."""
        stm = self.obj(stm_num)
        if not isinstance(stm, _Stream):
            return None
        body = stm.data(self)
        n = int(self.resolve(stm.dict.get("N")) or 0)
        first = int(self.resolve(stm.dict.get("First")) or 0)
        # header: N pairs of (object number, offset relative to First)
        hdr = body[:first].split()
        pairs = [
            (int(hdr[2 * k]), int(hdr[2 * k + 1])) for k in range(n)
        ]
        for onum, ooff in pairs:
            if onum == num:
                val, _ = _parse_value(body, first + ooff)
                return val
        return None

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.obj(v[0])
        return v

    def info(self) -> dict:
        return self.resolve(self.trailer.get("Info")) or {}

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root")) or {}
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []

        def walk(node, inherited):
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            merged = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    merged[k] = node[k]
            if str(node.get("Type")) == "Pages":
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, merged)
            else:
                page = dict(node)
                for k, v in merged.items():
                    page.setdefault(k, v)
                out.append(page)

        walk(tree, {})
        return out

    def content_bytes(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if isinstance(c, _Stream):
            return c.data(self)
        if isinstance(c, list):
            return b"\n".join(
                s.data(self)
                for s in (self.resolve(x) for x in c)
                if isinstance(s, _Stream)
            )
        return b""


# ----------------------------------------------------------------------
# Fonts: byte -> unicode via StandardEncoding + /Differences, widths
# ----------------------------------------------------------------------

# The handful of non-ASCII glyph names these documents use, plus the
# StandardEncoding codes that differ from Latin-1 in the printable range.
_GLYPH_UNICODE = {
    "space": " ",
    "quoteright": "’",
    "quoteleft": "‘",
    "quotedblleft": "“",
    "quotedblright": "”",
    "quotesingle": "'",
    "quotedbl": '"',
    "endash": "–",
    "emdash": "—",
    "mu": "µ",
    "bullet": "•",
    "degree": "°",
    "plusminus": "±",
    "multiply": "×",
    "fi": "fi",
    "fl": "fl",
    "copyright": "©",
    "registered": "®",
    "trademark": "™",
    "ellipsis": "…",
    "dagger": "†",
    "minus": "−",
}
# StandardEncoding high codes actually seen in these files
_STANDARD_HIGH = {
    0xA9: "'",  # quotesingle
    0xAA: "“",
    0xB1: "–",
    0xB4: "·",
    0xD0: "—",
}


class _Font:
    def __init__(self, doc: PdfDoc, fdict: dict):
        fdict = fdict or {}
        self.two_byte = str(fdict.get("Subtype")) == "Type0"
        self.map: dict[int, str] = {}
        for b in range(32, 127):
            self.map[b] = chr(b)
        enc = doc.resolve(fdict.get("Encoding"))
        base_enc = (
            str(enc)
            if isinstance(enc, _Name)
            else str((enc or {}).get("BaseEncoding", ""))
            if isinstance(enc, dict)
            else ""
        )
        if "WinAnsi" in base_enc:
            for b in range(128, 256):
                try:
                    self.map[b] = bytes([b]).decode("cp1252")
                except UnicodeDecodeError:
                    pass
        else:
            self.map.update(_STANDARD_HIGH)
        if isinstance(enc, dict):
            diffs = doc.resolve(enc.get("Differences")) or []
            code = 0
            for item in diffs:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    name = str(item)
                    self.map[code] = _GLYPH_UNICODE.get(
                        name, chr(code) if 32 <= code < 127 else ""
                    )
                    code += 1
        if self.two_byte:  # Identity-H CID font: ToUnicode CMap is the map
            self.map = _parse_tounicode(doc, fdict)
        self.first = int(doc.resolve(fdict.get("FirstChar")) or 0)
        w = doc.resolve(fdict.get("Widths"))
        self.widths = [float(x) for x in w] if isinstance(w, list) else None
        fd = doc.resolve(fdict.get("FontDescriptor")) or {}
        mw = doc.resolve(fd.get("MissingWidth"))
        self.missing = float(mw) if isinstance(mw, (int, float)) else 500.0

    def codes(self, s: bytes):
        if self.two_byte:
            for i in range(0, len(s) - 1, 2):
                yield (s[i] << 8) | s[i + 1]
        else:
            yield from s

    def decode(self, code: int) -> str:
        return self.map.get(code, "")

    def width(self, code: int) -> float:
        if self.widths is not None:
            idx = code - self.first
            if 0 <= idx < len(self.widths):
                return self.widths[idx]
        return self.missing


def _parse_tounicode(doc: PdfDoc, fdict: dict) -> dict[int, str]:
    """bfchar/bfrange sections of a /ToUnicode CMap -> {code: str}."""
    out: dict[int, str] = {}
    tu = doc.resolve(fdict.get("ToUnicode"))
    if not isinstance(tu, _Stream):
        return out
    body = tu.data(doc)

    def uni(hx: bytes) -> str:
        raw = bytes.fromhex(hx.decode())
        return raw.decode("utf-16-be", errors="ignore")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", body, re.S):
        for cm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            out[int(cm.group(1), 16)] = uni(cm.group(2))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", body, re.S):
        for cm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
            m.group(1),
        ):
            lo, hi = int(cm.group(1), 16), int(cm.group(2), 16)
            u0 = int(cm.group(3), 16)
            for k in range(hi - lo + 1):
                out[lo + k] = chr(u0 + k)
    return out


# ----------------------------------------------------------------------
# Content-stream interpreter -> glyphs + rule segments
# ----------------------------------------------------------------------


def _mat_mul(a, b):
    # 3x2 affine [a b c d e f]: result = a x b
    return [
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    ]


def _apply(m, x, y):
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


_ID = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]


@dataclass
class Glyph:
    x: float
    y: float
    w: float
    size: float
    ch: str
    dir: str = "r"  # advance direction: r/l horizontal, u/d vertical


@dataclass
class PageContent:
    glyphs: list = field(default_factory=list)
    hlines: list = field(default_factory=list)  # (x0, x1, y)
    vlines: list = field(default_factory=list)  # (y0, y1, x)
    # text-advance direction votes: 'r' (left->right), 'd' (downward,
    # page content rotated clockwise), 'u' (upward, rotated ccw)
    rot_votes: dict = field(default_factory=dict)


def derotate(pc: PageContent, pw: float, ph: float):
    """De-rotate a page whose CONTENT was baked in rotated (the NASA
    compendium's landscape tables ship as portrait pages with 90-degree
    text; camelot detects this from pdfminer's vertical chars and
    rotates the page before parsing — get_rotation + _save_page).
    Returns (pc', pw', ph') with text advancing left->right."""
    votes = pc.rot_votes
    if not votes or max(votes, key=votes.get) == "r":
        return pc, pw, ph
    rot = max(votes, key=votes.get)
    out = PageContent(rot_votes={"r": 1})
    if rot == "d":  # advance (0,-1) -> (1,0): (x, y) -> (ph - y, x)
        dmap = {"d": "r", "r": "u", "u": "l", "l": "d"}
        for g in pc.glyphs:
            out.glyphs.append(
                Glyph(
                    x=ph - g.y,
                    y=g.x,
                    w=g.w,
                    size=g.size,
                    ch=g.ch,
                    dir=dmap[g.dir],
                )
            )
        for (x0, x1, y) in pc.hlines:
            out.vlines.append((x0, x1, ph - y))
        for (y0, y1, x) in pc.vlines:
            out.hlines.append((ph - y1, ph - y0, x))
    else:  # 'u': advance (0,1) -> (1,0): (x, y) -> (y, pw - x)
        dmap = {"u": "r", "r": "d", "d": "l", "l": "u"}
        for g in pc.glyphs:
            out.glyphs.append(
                Glyph(
                    x=g.y,
                    y=pw - g.x,
                    w=g.w,
                    size=g.size,
                    ch=g.ch,
                    dir=dmap[g.dir],
                )
            )
        for (x0, x1, y) in pc.hlines:
            out.vlines.append((pw - x1, pw - x0, y))
        for (y0, y1, x) in pc.vlines:
            out.hlines.append((y0, y1, pw - x))
    return out, ph, pw


_TOKEN_RE = re.compile(
    rb"\(|\[|\]|<<|>>|<[0-9A-Fa-f\s]*>|/[^\s()<>\[\]{}/%]*"
    rb"|[-+]?(?:\d+\.\d*|\.\d+|\d+)|[A-Za-z'\"*]{1,3}"
)


def _tokenize(cs: bytes):
    i = 0
    n = len(cs)
    while i < n:
        c = cs[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # comment
            j = cs.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:
            s, i = _parse_string(cs, i)
            yield ("str", s)
            continue
        m = _TOKEN_RE.match(cs, i)
        if not m:
            i += 1
            continue
        tok = m.group(0)
        i = m.end()
        if tok == b"[":
            yield ("arr_open", None)
        elif tok == b"]":
            yield ("arr_close", None)
        elif tok == b"<<":
            # inline dict (BI images / gs params): parse and discard
            d, i = _parse_dict(cs, m.start())
            yield ("dict", d)
        elif tok.startswith(b"<"):
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode()))
        elif tok.startswith(b"/"):
            yield ("name", tok[1:].decode("latin-1"))
        elif tok[0:1].isdigit() or tok[0:1] in b"+-.":
            yield ("num", float(tok))
        else:
            yield ("op", tok.decode("latin-1"))


def interpret_page(doc: PdfDoc, page: dict) -> PageContent:
    """Run the content stream; emit device-space glyphs and h/v rules."""
    cs = doc.content_bytes(page)
    res = doc.resolve(page.get("Resources")) or {}
    fonts_dict = doc.resolve(res.get("Font")) or {}
    fonts = {k: _Font(doc, doc.resolve(v)) for k, v in fonts_dict.items()}

    out = PageContent()
    ctm = list(_ID)
    stack: list[list] = []
    path: list[list[tuple]] = []  # subpaths as point lists
    rects: list[tuple] = []  # (x, y, w, h) in current user space + ctm snapshot
    cur: list[tuple] | None = None

    tm = list(_ID)
    tlm = list(_ID)
    font: _Font | None = None
    size = 0.0
    leading = 0.0
    tc = 0.0
    tw = 0.0
    th = 1.0
    rise = 0.0

    def emit_seg(p0, p1):
        x0, y0 = p0
        x1, y1 = p1
        if abs(y1 - y0) <= 0.5 and abs(x1 - x0) > 1e-6:
            out.hlines.append((min(x0, x1), max(x0, x1), (y0 + y1) / 2.0))
        elif abs(x1 - x0) <= 0.5 and abs(y1 - y0) > 1e-6:
            out.vlines.append((min(y0, y1), max(y0, y1), (x0 + x1) / 2.0))

    def paint(stroke: bool, fill: bool):
        nonlocal path, rects
        if stroke:
            for sp in path:
                for a, b in zip(sp, sp[1:]):
                    emit_seg(a, b)
        for (rx, ry, rw, rh, mat) in rects:
            c0 = _apply(mat, rx, ry)
            c1 = _apply(mat, rx + rw, ry)
            c2 = _apply(mat, rx + rw, ry + rh)
            c3 = _apply(mat, rx, ry + rh)
            xs = [c[0] for c in (c0, c1, c2, c3)]
            ys = [c[1] for c in (c0, c1, c2, c3)]
            w_dev = max(xs) - min(xs)
            h_dev = max(ys) - min(ys)
            if fill:
                # thin filled rect == ruled line (Ghostscript tables);
                # thicker bars (header separators in some generations)
                # still register as rules up to 6pt thickness
                if h_dev <= 6.0 and w_dev > h_dev:
                    out.hlines.append((min(xs), max(xs), (min(ys) + max(ys)) / 2))
                elif w_dev <= 6.0 and h_dev >= w_dev:
                    out.vlines.append((min(ys), max(ys), (min(xs) + max(xs)) / 2))
            if stroke:
                emit_seg(c0, c1)
                emit_seg(c1, c2)
                emit_seg(c2, c3)
                emit_seg(c3, c0)
        path = []
        rects = []

    def show(s: bytes):
        nonlocal tm
        if font is None:
            return
        for code in font.codes(s):
            ch = font.decode(code)
            trm = _mat_mul([size * th, 0, 0, size, 0, rise], _mat_mul(tm, ctm))
            x, y = trm[4], trm[5]
            w0 = font.width(code) / 1000.0 * size + tc + (tw if code == 32 else 0.0)
            wx, wy = (
                trm[0] * (font.width(code) / 1000.0),
                trm[1] * (font.width(code) / 1000.0),
            )
            sdev = (trm[2] * trm[2] + trm[3] * trm[3]) ** 0.5 or size
            if ch:
                if abs(trm[0]) >= abs(trm[1]):
                    gdir = "r" if trm[0] >= 0 else "l"
                else:
                    gdir = "u" if trm[1] > 0 else "d"
                out.glyphs.append(
                    Glyph(
                        x=x,
                        y=y,
                        w=(wx * wx + wy * wy) ** 0.5,
                        size=sdev,
                        ch=ch,
                        dir=gdir,
                    )
                )
                if ch != " ":  # advance-direction vote for page rotation
                    out.rot_votes[gdir] = out.rot_votes.get(gdir, 0) + 1
            tm = _mat_mul([1, 0, 0, 1, w0 * th, 0], tm)

    arr_stack: list[list] = []
    operands: list = []

    for kind, val in _tokenize(cs):
        if kind == "arr_open":
            arr_stack.append([])
            continue
        if kind == "arr_close":
            a = arr_stack.pop()
            (arr_stack[-1] if arr_stack else operands).append(a)
            continue
        if kind in ("num", "str", "name", "dict"):
            (arr_stack[-1] if arr_stack else operands).append(
                val if kind != "name" else _Name(val)
            )
            continue
        op = val
        try:
            if op == "q":
                stack.append(list(ctm))
            elif op == "Q":
                if stack:
                    ctm = stack.pop()
            elif op == "cm" and len(operands) >= 6:
                ctm = _mat_mul([float(v) for v in operands[-6:]], ctm)
            elif op == "m" and len(operands) >= 2:
                cur = [_apply(ctm, float(operands[-2]), float(operands[-1]))]
                path.append(cur)
            elif op == "l" and len(operands) >= 2:
                if cur is None:
                    cur = []
                    path.append(cur)
                cur.append(_apply(ctm, float(operands[-2]), float(operands[-1])))
            elif op in ("c", "v", "y"):
                if cur is not None and len(operands) >= 2:
                    cur.append(_apply(ctm, float(operands[-2]), float(operands[-1])))
            elif op == "h":
                if cur:
                    cur.append(cur[0])
            elif op == "re" and len(operands) >= 4:
                rx, ry, rw, rh = (float(v) for v in operands[-4:])
                rects.append((rx, ry, rw, rh, list(ctm)))
                cur = None
            elif op in ("S",):
                paint(stroke=True, fill=False)
                cur = None
            elif op == "s":
                if cur:
                    cur.append(cur[0])
                paint(stroke=True, fill=False)
                cur = None
            elif op in ("f", "F", "f*"):
                paint(stroke=False, fill=True)
                cur = None
            elif op in ("B", "B*", "b", "b*"):
                paint(stroke=True, fill=True)
                cur = None
            elif op == "n":
                path = []
                rects = []
                cur = None
            elif op == "BT":
                tm = list(_ID)
                tlm = list(_ID)
            elif op == "ET":
                pass
            elif op == "Tf" and len(operands) >= 2:
                fname = str(operands[-2])
                font = fonts.get(fname)
                size = float(operands[-1])
            elif op == "TL" and operands:
                leading = float(operands[-1])
            elif op == "Tc" and operands:
                tc = float(operands[-1])
            elif op == "Tw" and operands:
                tw = float(operands[-1])
            elif op == "Tz" and operands:
                th = float(operands[-1]) / 100.0
            elif op == "Ts" and operands:
                rise = float(operands[-1])
            elif op == "Td" and len(operands) >= 2:
                tlm = _mat_mul(
                    [1, 0, 0, 1, float(operands[-2]), float(operands[-1])], tlm
                )
                tm = list(tlm)
            elif op == "TD" and len(operands) >= 2:
                leading = -float(operands[-1])
                tlm = _mat_mul(
                    [1, 0, 0, 1, float(operands[-2]), float(operands[-1])], tlm
                )
                tm = list(tlm)
            elif op == "Tm" and len(operands) >= 6:
                tlm = [float(v) for v in operands[-6:]]
                tm = list(tlm)
            elif op == "T*":
                tlm = _mat_mul([1, 0, 0, 1, 0, -leading], tlm)
                tm = list(tlm)
            elif op == "Tj" and operands and isinstance(operands[-1], bytes):
                show(operands[-1])
            elif op == "'" and operands and isinstance(operands[-1], bytes):
                tlm = _mat_mul([1, 0, 0, 1, 0, -leading], tlm)
                tm = list(tlm)
                show(operands[-1])
            elif op == '"' and len(operands) >= 3:
                tw = float(operands[-3])
                tc = float(operands[-2])
                tlm = _mat_mul([1, 0, 0, 1, 0, -leading], tlm)
                tm = list(tlm)
                if isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op == "TJ" and operands and isinstance(operands[-1], list):
                for item in operands[-1]:
                    if isinstance(item, bytes):
                        show(item)
                    elif isinstance(item, (int, float)):
                        tm = _mat_mul(
                            [1, 0, 0, 1, -float(item) / 1000.0 * size * th, 0],
                            tm,
                        )
            # everything else (gs, w, J, j, d, i, ri, W, cs, CS, sc, scn,
            # rg, RG, g, G, k, K, Do, BI..EI, MP, BMC, BDC, EMC): ignored
        finally:
            operands = []
    return out


# ----------------------------------------------------------------------
# Line merging + lattice grid
# ----------------------------------------------------------------------


def _merge_1d(lines, pos_tol=2.0, gap_tol=4.0):
    """Merge collinear segments: lines = [(lo, hi, pos)] -> same, merged."""
    out = []
    for lo, hi, pos in sorted(lines, key=lambda t: (round(t[2] / pos_tol), t[0])):
        merged = False
        for seg in out:
            if abs(seg[2] - pos) <= pos_tol and lo <= seg[1] + gap_tol and hi >= seg[0] - gap_tol:
                seg[0] = min(seg[0], lo)
                seg[1] = max(seg[1], hi)
                seg[2] = (seg[2] + pos) / 2.0
                merged = True
                break
        if not merged:
            out.append([lo, hi, pos])
    return [tuple(s) for s in out]


def _cluster(vals, tol=2.0):
    """Cluster scalar positions; return sorted representative values."""
    out: list[list[float]] = []
    for v in sorted(vals):
        if out and v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(c) / len(c) for c in out]


@dataclass
class Table:
    bbox: tuple  # (x0, y0, x1, y1)
    page: int
    grid: list  # rows (top->bottom) of cell text strings
    # per-cell border presence for vertical-span copy
    top_open: list  # [row][col] True when no rule between cell and the one above


def _word_runs(glyphs: list[Glyph]) -> list[list[Glyph]]:
    """Split horizontal glyphs into WORD runs — maximal stream-order
    sequences of touching glyphs, where a space glyph ends its run
    (attaching to the word on its LEFT). Cell assignment then places a
    run atomically by its midpoint, which fixes two per-glyph
    mis-assignments found by the r8 field-exactness audit WITHOUT
    fusing adjacent cells the way whole-textline assignment would:
    - a word hugging a column rule in a justified cell ('…failures at '
      where the final 't' and trailing space cross the rule) stays in
      the cell that holds its bulk instead of leaking 't ' into the
      neighbor;
    - a subscript that touches its base word ('I' + 'off') stays with
      it, so the line assembly can interleave it by x.
    Word grain is the right atom because the painter NEVER splits a
    word across cells, but DOES bridge adjacent cells with a single
    spaced text run ('Technology PI') — splitting at spaces keeps those
    separable exactly as the per-glyph path always did."""
    runs: list[list[Glyph]] = []
    for g in glyphs:
        if runs:
            p = runs[-1][-1]
            vov = min(p.y + p.size, g.y + g.size) - max(p.y, g.y)
            gap = g.x - (p.x + p.w)
            if g.ch == " ":
                # a space glyph stays with its stream run even when the
                # painter kerns it BEHIND the preceding glyph ('31 '
                # printed as '3','1',' '@x-2.6pt — x-sorting the space
                # between the digits made '3 1'; pdfminer appends in
                # stream order and never splits a line on x-reversal)
                if vov > 0 and gap <= 2.0 * max(p.w, g.w, 2.0):
                    runs[-1].append(g)
                    continue
            elif p.ch != " " and vov > 0 and -1.0 <= gap <= 1.5:
                runs[-1].append(g)
                continue
        runs.append([g])
    return runs


def find_tables(pc: PageContent, page_w: float, page_h: float) -> list[Table]:
    """Camelot-lattice-style grid discovery from ruled lines."""
    min_h = page_w / 40.0  # line_scale=40 equivalents
    min_v = page_h / 40.0
    hl = [s for s in _merge_1d(pc.hlines) if s[1] - s[0] >= min_h]
    vl = [s for s in _merge_1d(pc.vlines) if s[1] - s[0] >= min_v]
    if not hl or not vl:
        return []

    # connected components over intersecting lines
    n_h, n_v = len(hl), len(vl)
    parent = list(range(n_h + n_v))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    tol = 3.0
    for i, (hx0, hx1, hy) in enumerate(hl):
        for j, (vy0, vy1, vx) in enumerate(vl):
            if hx0 - tol <= vx <= hx1 + tol and vy0 - tol <= hy <= vy1 + tol:
                union(i, n_h + j)

    groups: dict[int, tuple[list, list]] = {}
    for i in range(n_h):
        groups.setdefault(find(i), ([], []))[0].append(hl[i])
    for j in range(n_v):
        groups.setdefault(find(n_h + j), ([], []))[1].append(vl[j])

    def _covered(segments, pos, lo, hi, pos_tol=3.0):
        """True when some rule at `pos` covers >=50% of [lo, hi]."""
        need = (hi - lo) * 0.5
        for s_lo, s_hi, s_pos in segments:
            if abs(s_pos - pos) <= pos_tol:
                ov = min(s_hi, hi) - max(s_lo, lo)
                if ov >= need:
                    return True
        return False

    # horizontal WORD runs, built ONCE per page and assigned to cells
    # atomically; vertical (rotated-header) glyphs keep the per-glyph
    # path below
    h_runs = _word_runs([g for g in pc.glyphs if g.dir in ("r", "l")])

    tables = []
    for _root, (ghs, gvs) in groups.items():
        if len(ghs) < 2 or len(gvs) < 2:
            continue
        ys = _cluster([h[2] for h in ghs])
        xs = _cluster([v[2] for v in gvs])
        if len(ys) < 2 or len(xs) < 2:
            continue
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        nrows = len(ys) - 1
        ncols = len(xs) - 1
        ys_desc = sorted(ys, reverse=True)  # top -> bottom boundaries

        # cell edge matrices (camelot set_edges equivalent): an edge
        # exists when a rule covers at least half of it
        top_edge = [
            [
                _covered(ghs, ys_desc[r], xs[c], xs[c + 1])
                for c in range(ncols)
            ]
            for r in range(nrows)
        ]
        left_edge = [
            [
                _covered(gvs, xs[c], ys_desc[r + 1], ys_desc[r])
                for c in range(ncols)
            ]
            for r in range(nrows)
        ]

        # assign text to cells — horizontal WORD runs atomically by the
        # run's midpoint, vertical glyphs individually; text inside a
        # spanning cell reduces to the span's top-left ANCHOR (camelot
        # _reduce_index): walk left across missing left edges, then up
        # across missing top edges — this is what makes a row-spanning
        # part-number land once and copy_text='v' fan it out to every
        # sub-row
        cellg: dict[tuple[int, int], list[list[Glyph]]] = {}

        def assign(gx, gy, gl):
            r = c = None
            for ri in range(nrows):
                if ys_desc[ri + 1] <= gy <= ys_desc[ri]:
                    r = ri
                    break
            for ci in range(ncols):
                if xs[ci] <= gx <= xs[ci + 1]:
                    c = ci
                    break
            if r is None or c is None:
                return
            while c > 0 and not left_edge[r][c]:
                c -= 1
            while r > 0 and not top_edge[r][c]:
                r -= 1
            cellg.setdefault((r, c), []).append(gl)

        for run in h_runs:
            # run midpoint over the NON-SPACE span (a trailing space
            # hugging the rule must not drag the word's center)
            core = [g for g in run if g.ch != " "] or run
            gx = (core[0].x + core[-1].x + core[-1].w) / 2.0
            gy = core[0].y + core[0].size * 0.35
            if not (x0 - 1 <= gx <= x1 + 1 and y0 - 1 <= gy <= y1 + 1):
                continue
            assign(gx, gy, run)
        for g in pc.glyphs:
            if g.dir == "d":  # vertical text: advance down, up vector +x
                gx, gy = g.x + g.size * 0.35, g.y - g.w / 2.0
            elif g.dir == "u":  # advance up, up vector -x
                gx, gy = g.x - g.size * 0.35, g.y + g.w / 2.0
            else:
                continue
            if not (x0 - 1 <= gx <= x1 + 1 and y0 - 1 <= gy <= y1 + 1):
                continue
            assign(gx, gy, [g])

        grid = [["" for _ in range(ncols)] for _ in range(nrows)]
        for (r, c), cruns in cellg.items():
            grid[r][c] = _runs_to_text(cruns)

        # vertical-span copy (camelot copy_text=['v']): an empty cell
        # with no top border inherits the text above it
        for c in range(ncols):
            for r in range(1, nrows):
                if not grid[r][c].strip() and not top_edge[r][c]:
                    grid[r][c] = grid[r - 1][c]

        # camelot Table.data strips each cell
        grid = [[cell.strip() for cell in row] for row in grid]
        tables.append(
            Table(bbox=(x0, y0, x1, y1), page=0, grid=grid, top_open=top_edge)
        )

    tables.sort(key=lambda t: (-t.bbox[3], t.bbox[0]))  # top-down, left-right
    return tables


def _runs_to_text(runs: list[list[Glyph]]) -> str:
    """Assemble a cell's text from word RUNS (see _word_runs):

    - horizontal runs group into LINES by vertical band overlap (> 0.5
      of the smaller height — pdfminer line_overlap) against the line's
      running band, so sub/superscript runs join their base line;
    - within a line, runs order by the x of their first NON-SPACE glyph
      and each run's glyphs emit in STREAM order (pdfminer appends in
      order and never re-sorts — a kerned space printed behind its
      predecessor must not migrate);
    - a space is SYNTHESIZED between runs whose x-gap exceeds
      word_margin=0.1 of the next glyph's size (pdfminer LTTextLine
      word spacing) — this is how 'V' + subscript 'th' + 'degrades'
      with no space glyph reads 'Vth degrades', exactly as the
      reference's pdfminer pass produced it;
    - vertical (rotated) glyphs keep the legacy assembly and append
      after the horizontal lines."""
    horiz = [r for r in runs if r and r[0].dir in ("r", "l")]
    vert = [g for r in runs for g in r if g.dir in ("u", "d")]
    lines: list[dict] = []
    for run in sorted(horiz, key=lambda r: -max(g.y + g.size for g in r)):
        lo = min(g.y for g in run)
        hi = max(g.y + g.size for g in run)
        placed = False
        for ln in lines:
            ov = min(ln["hi"], hi) - max(ln["lo"], lo)
            if ov > 0.5 * min(hi - lo, ln["hi"] - ln["lo"]):
                ln["runs"].append(run)
                ln["lo"] = min(ln["lo"], lo)
                ln["hi"] = max(ln["hi"], hi)
                placed = True
                break
        if not placed:
            lines.append({"lo": lo, "hi": hi, "runs": [run]})
    parts: list[str] = []
    for ln in lines:
        ordered = sorted(
            ln["runs"],
            key=lambda r: next((g.x for g in r if g.ch != " "), r[0].x),
        )
        buf: list[str] = []
        cursor: float | None = None
        for run in ordered:
            first = next((g for g in run if g.ch != " "), run[0])
            if cursor is not None:
                gap = first.x - cursor
                if (
                    gap > 0.1 * max(first.w, first.size)
                    and buf
                    and not buf[-1].endswith(" ")
                    and run[0].ch != " "
                ):
                    buf.append(" ")
            buf.append("".join(g.ch for g in run))
            right = max(g.x + g.w for g in run)
            cursor = right if cursor is None else max(cursor, right)
        parts.append("".join(buf))
    if vert:
        vtext = _glyphs_to_text(vert)
        if vtext:
            parts.append(vtext)
    return "\n".join(parts)


def _glyphs_to_text(glyphs: list[Glyph]) -> str:
    """Cluster glyphs into text lines and join top-to-bottom.

    Horizontal glyphs cluster by baseline y and read by x.  VERTICAL
    glyphs (rotated headers inside an otherwise-horizontal page — the
    tall column labels of the newer compendiums) cluster by baseline x
    and read along their advance direction; successive vertical lines
    stack perpendicular to it ('u' text: left-to-right, 'd' text:
    right-to-left), matching how pdfminer's vertical textlines read."""
    if not glyphs:
        return ""
    horiz = [g for g in glyphs if g.dir in ("r", "l")]
    vert = [g for g in glyphs if g.dir in ("u", "d")]
    parts: list[str] = []
    lines: list[dict] = []
    for g in sorted(horiz, key=lambda g: -(g.y + g.size)):
        # pdfminer-style grouping: a glyph joins a line when its
        # vertical band overlaps the line's RUNNING band by more than
        # half the smaller height (line_overlap=0.5). This absorbs
        # super- AND subscripts into the base line even when a
        # superscript seeded it — the old first-glyph 0.45em baseline
        # rule rejected a subscript 4.4pt below a superscript seed,
        # exiling 'off' of 'Ioff' to its own trailing line (r8
        # field-exactness audit, 2017 misses)
        glo, ghi = g.y, g.y + g.size
        placed = False
        for ln in lines:
            ov = min(ln["hi"], ghi) - max(ln["lo"], glo)
            if ov > 0.5 * min(ghi - glo, ln["hi"] - ln["lo"]):
                ln["glyphs"].append(g)
                ln["lo"] = min(ln["lo"], glo)
                ln["hi"] = max(ln["hi"], ghi)
                placed = True
                break
        if not placed:
            lines.append({"lo": glo, "hi": ghi, "glyphs": [g]})
    for ln_d in lines:
        ln = ln_d["glyphs"]
        # quantize the x-key to 1pt: near-coincident glyphs keep their
        # STREAM order (stable sort), matching pdfminer's in-order line
        # assembly — a kerned space printed 0.1pt LEFT of the glyph it
        # follows must not jump ahead of it ('errors ' -> 'error s',
        # r8 field-exactness audit)
        ln.sort(key=lambda g: round(g.x))
        parts.append("".join(g.ch for g in ln))
    if vert:
        up = sum(1 for g in vert if g.dir == "u") >= len(vert) / 2
        vlines: list[list[Glyph]] = []
        for g in sorted(vert, key=lambda g: (g.x if up else -g.x)):
            placed = False
            for ln in vlines:
                if abs(ln[0].x - g.x) <= max(2.0, ln[0].size * 0.3):
                    ln.append(g)
                    placed = True
                    break
            if not placed:
                vlines.append([g])
        for ln in vlines:
            ln.sort(key=lambda g: g.y, reverse=not up)
            parts.append("".join(g.ch for g in ln))
    return "\n".join(parts)


def page_text_lines(pc: PageContent) -> list[tuple]:
    """pdfminer-ish horizontal text lines: [(x0, y0, x1, y1, text)],
    ordered top->bottom.  Lines split on x-gaps wider than ~2 chars
    (LAParams char_margin analogue) so table cells on one baseline
    don't fuse into a single long line."""
    lines: list[list[Glyph]] = []
    for g in sorted(pc.glyphs, key=lambda g: -g.y):
        placed = False
        for ln in lines:
            if abs(ln[0].y - g.y) <= max(2.0, max(ln[0].size, g.size) * 0.45):
                ln.append(g)
                placed = True
                break
        if not placed:
            lines.append([g])
    out = []
    for ln in lines:
        ln.sort(key=lambda g: g.x)
        runs: list[list[Glyph]] = [[ln[0]]]
        for prev, g in zip(ln, ln[1:]):
            gap = g.x - (prev.x + max(prev.w, prev.size * 0.25))
            if gap > max(2.0 * prev.size, 6.0):
                runs.append([g])
            else:
                runs[-1].append(g)
        for run in runs:
            text = "".join(g.ch for g in run)
            x0 = run[0].x
            x1 = run[-1].x + run[-1].w
            ymin = min(g.y for g in run)
            ymax = max(g.y + g.size for g in run)
            out.append((x0, ymin, x1, ymax, text))
    out.sort(key=lambda t: (-t[3], t[0]))
    return out


# ----------------------------------------------------------------------
# Reference title heuristics
# ----------------------------------------------------------------------


def closest_heading(table_bbox: tuple, text_lines: list[tuple]) -> str:
    """The reference's get_closest_text (tables.py:28-48): nearest short
    text by distance from the text's bottom-mid to the table's top-mid,
    extended by one fragment once a candidate mentions 'table'; ''
    when no 'table'-bearing heading is found."""
    x0, _y0, x1, y1 = table_bbox
    table_mid = ((x0 + x1) / 2.0, y1)
    min_distance = 100.0
    best = None
    table_flag = False
    for (tx0, ty0, tx1, _ty1, text) in text_lines:
        text = text.strip()
        text_mid = ((tx0 + tx1) / 2.0, ty0)
        d = (
            (text_mid[0] - table_mid[0]) ** 2
            + (text_mid[1] - table_mid[1]) ** 2
        ) ** 0.5
        if d < min_distance and len(text) < 50:
            if table_flag:
                return f"{best} {text}"
            best = text
            if "table" in best.lower():
                table_flag = True
            min_distance = d
    if not table_flag:
        return ""
    return best


def metadata_title(doc: PdfDoc) -> str | None:
    """The reference's get_pdf_title (tables.py:68-77) including its
    repr-of-bytes artifact: pdfminer hands back raw byte strings, the
    reference f-strings them (producing b'..' / b".." reprs), strips
    the "b'" prefix and every quote — leaving a literal 'b' where
    ModDate's repr used double quotes.  None -> whole file skipped."""
    info = doc.info()
    title = info.get("Title")
    mod = info.get("ModDate")
    if title is None or mod is None:
        return None
    # replicate re.sub(r"b'", "") + quote strips exactly: a ModDate whose
    # repr uses double quotes (it contains apostrophes) keeps its 'b'
    raw = f"{title!r}{mod!r}"
    return re.sub(r"b'", "", raw).replace("'", "").replace('"', "")


# ----------------------------------------------------------------------
# Extractor entry point (sources/pdf.py Extractor signature)
# ----------------------------------------------------------------------


def extract_tables(content: bytes) -> tuple[str | None, list[tuple]]:
    """content -> (doc_title, [(page_no, bbox, grid), ...])."""
    doc = PdfDoc(content)
    title = metadata_title(doc)
    if title is None:
        return None, []
    out = []
    for pno, page in enumerate(doc.pages(), start=1):
        mb = [float(v) for v in (doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792])]
        pw, ph = mb[2] - mb[0], mb[3] - mb[1]
        pc = interpret_page(doc, page)
        pc, pw, ph = derotate(pc, pw, ph)
        tlines = page_text_lines(pc)
        for tb in find_tables(pc, pw, ph):
            heading = closest_heading(tb.bbox, tlines)
            out.append((pno, tb.bbox, tb.grid, heading))
    return title, out


def lattice_extractor(filename: str, content: bytes) -> list[tuple]:
    """sources/pdf.py Extractor: bytes -> RAW_CELLS tuples
    (doc_title, page, table_idx, table_title, row_idx, col_idx, value)."""
    try:
        title, tables = extract_tables(content)
    except Exception:
        return []
    if title is None:
        return []
    rows: list[tuple] = []
    for tidx, (pno, _bbox, grid, heading) in enumerate(tables):
        for ridx, row in enumerate(grid):
            for cidx, val in enumerate(row):
                rows.append((title, pno, tidx, heading, ridx, cidx, val))
    return rows
