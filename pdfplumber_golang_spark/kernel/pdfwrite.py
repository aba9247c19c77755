"""Deterministic minimal-PDF writer (fixture generator).

Emits byte-exact classic-layout PDFs (`%PDF-1.4` header, `N 0 obj` bodies,
`stream`/`endstream`, classic `xref` table, `trailer`, `startxref`) — the
exact file shape the reference's from-scratch parser consumes
(/root/reference/pkg/parser/parser.go:94-302). Used only to synthesize test
corpora; the extraction engine never imports this at run time.

Variants (FIXTURES.md §2):
  plain     — one page, uncompressed stream, Tf/Tm/Tj/T* only
  flate     — same, FlateDecode content stream (parser.go:642-655 path)
  kerned    — TJ arrays with kern numbers + Td/' operators (SURVEY §2.3 I2-I5)
  cmap      — Type0/Identity-H font + ToUnicode CMap (bfchar + bfrange),
              hex-string Tj operands (SURVEY §2.4 D1-D5)
  multipage — page tree with Kids + inherited Resources/MediaBox
              (parser.go:722-861 path)
  graphics  — ruled table grid (m/l/re + S/f) with cell text (SURVEY §2.7)
"""

from __future__ import annotations

import zlib

from .. import spec

_FONT_SIMPLE = (
    b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Name /F1 >>"
)


def _esc(s: str) -> bytes:
    """Escape a PDF literal string."""
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def _text_stream_plain(lines: list[str]) -> bytes:
    ops = [b"BT", b"/F1 12 Tf", b"%g TL" % spec.LEADING]
    ops.append(b"1 0 0 1 %g %g Tm" % (spec.TEXT_X0, spec.TEXT_Y0))
    for i, ln in enumerate(lines):
        if i > 0:
            ops.append(b"T*")
        ops.append(b"(" + _esc(ln) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def _text_stream_kerned(lines: list[str]) -> bytes:
    """Same rendered text via TJ kern arrays, Td moves and the ' operator.

    Kern values are small (|v| <= 60 -> |shift| <= 0.72pt at 12pt font),
    below X_TOLERANCE, so extracted text is identical to plain.
    """
    ops = [b"BT", b"/F1 12 Tf", b"%g TL" % spec.LEADING]
    ops.append(b"%g %g Td" % (spec.TEXT_X0, spec.TEXT_Y0))
    for i, ln in enumerate(lines):
        mid = len(ln) // 2
        a, b = ln[:mid], ln[mid:]
        if i == 0:
            if b:
                ops.append(b"[(" + _esc(a) + b") 60 (" + _esc(b) + b") -40 ()] TJ")
            else:
                ops.append(b"[(" + _esc(a) + b")] TJ")
        elif i == 1:
            # ' : move to next line (uses leading) then show
            ops.append(b"(" + _esc(ln) + b") '")
        else:
            ops.append(b"0 -%g Td" % spec.LEADING)
            if b:
                ops.append(b"[(" + _esc(a) + b") 60 (" + _esc(b) + b")] TJ")
            else:
                ops.append(b"[(" + _esc(a) + b")] TJ")
    ops.append(b"ET")
    return b"\n".join(ops)


# --- cmap variant: CID = ord(ch) + 0x0100, two-byte codes -----------------

CMAP_CID_OFFSET = 0x0100


def _cid_hex(s: str) -> bytes:
    return "".join(f"{ord(c) + CMAP_CID_OFFSET:04X}" for c in s).encode()


def _text_stream_cmap(lines: list[str]) -> bytes:
    ops = [b"BT", b"/F1 12 Tf", b"%g TL" % spec.LEADING]
    ops.append(b"1 0 0 1 %g %g Tm" % (spec.TEXT_X0, spec.TEXT_Y0))
    for i, ln in enumerate(lines):
        if i > 0:
            ops.append(b"T*")
        ops.append(b"<" + _cid_hex(ln) + b"> Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def _tounicode_cmap() -> bytes:
    """ToUnicode CMap: bfchar for 'A'..'D' codes, contiguous bfrange for the
    full printable-ASCII band (mirrors the shapes unit-tested in
    /root/reference/pkg/pdf/cmap_test.go:20-175)."""
    bfchars = b"\n".join(
        b"<%04X> <%04X>" % (ord(c) + CMAP_CID_OFFSET, ord(c))
        for c in "ABCD"
    )
    lo, hi = 0x20 + CMAP_CID_OFFSET, 0x7E + CMAP_CID_OFFSET
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"4 beginbfchar\n" + bfchars + b"\nendbfchar\n"
        b"1 beginbfrange\n"
        + b"<%04X> <%04X> <0020>\n" % (lo, hi)
        + b"endbfrange\nendcmap\n"
        b"CMapName currentdict /CMap defineresource pop\nend\nend"
    )


# --- graphics variant: 3x3 ruled grid + cell text --------------------------

# cell pitch must stay under the reference's 30pt line-group gap
# (table_extractor.go:215) or the lattice splits into per-line groups
GRID_X, GRID_Y = 72.0, 400.0   # top-left of grid (y = top line)
CELL_W, CELL_H = 28.0, 24.0
GRID_COLS, GRID_ROWS = 3, 3
GRID_FONT = 6.0                # cell text must fit in CELL_W


def grid_cell_text(doc_id: int, r: int, c: int) -> str:
    return f"c{doc_id % 100}r{r}c{c}"


def _graphics_stream(doc_id: int, lines: list[str]) -> bytes:
    """Body text + a ruled GRID_ROWS x GRID_COLS table with cell text."""
    ops = [_text_stream_plain(lines)]
    # ruling lines: horizontal via m/l/S, vertical via re (degenerate) + S
    x1 = GRID_X + GRID_COLS * CELL_W
    y_bot = GRID_Y - GRID_ROWS * CELL_H
    ops.append(b"1 w")
    for r in range(GRID_ROWS + 1):
        y = GRID_Y - r * CELL_H
        ops.append(b"%g %g m %g %g l S" % (GRID_X, y, x1, y))
    for c in range(GRID_COLS + 1):
        x = GRID_X + c * CELL_W
        ops.append(b"%g %g m %g %g l S" % (x, y_bot, x, GRID_Y))
    # cell text (centered-ish inside each cell)
    cell_ops = [b"BT", b"/F1 %g Tf" % GRID_FONT]
    for r in range(GRID_ROWS):
        for c in range(GRID_COLS):
            tx = GRID_X + c * CELL_W + 2.0
            ty = GRID_Y - r * CELL_H - 16.0
            cell_ops.append(b"1 0 0 1 %g %g Tm" % (tx, ty))
            cell_ops.append(b"(" + _esc(grid_cell_text(doc_id, r, c)) + b") Tj")
    cell_ops.append(b"ET")
    ops.append(b"\n".join(cell_ops))
    return b"\n".join(ops)


def _texttable_stream(doc_id: int) -> bytes:
    """Ruling-free table: ONLY the grid cell text, no lines/rects — the T12
    text-based-detection fixture (x-aligned word columns, nothing to
    lattice). Same geometry as _graphics_stream's cell block."""
    cell_ops = [b"BT", b"/F1 %g Tf" % GRID_FONT]
    for r in range(GRID_ROWS):
        for c in range(GRID_COLS):
            tx = GRID_X + c * CELL_W + 2.0
            ty = GRID_Y - r * CELL_H - 16.0
            cell_ops.append(b"1 0 0 1 %g %g Tm" % (tx, ty))
            cell_ops.append(b"(" + _esc(grid_cell_text(doc_id, r, c)) + b") Tj")
    cell_ops.append(b"ET")
    return b"\n".join(cell_ops)


ROWRECT_ROWS = 4


def _rowrects_stream(doc_id: int) -> bytes:
    """Row-rectangle table: ROWRECT_ROWS stacked full-width filled rects
    (same x0/x1) + cell text at aligned columns, NO ruling lines — the
    T7/T9/T10/T11 fixture (extractTableFromRowRectangles,
    table_extractor.go:510-586)."""
    ops = []
    w = GRID_COLS * CELL_W
    for r in range(ROWRECT_ROWS):
        y = GRID_Y - (r + 1) * CELL_H
        ops.append(b"%g %g %g %g re f" % (GRID_X, y, w, CELL_H))
    cell_ops = [b"BT", b"/F1 %g Tf" % GRID_FONT]
    for r in range(ROWRECT_ROWS):
        for c in range(GRID_COLS):
            tx = GRID_X + c * CELL_W + 2.0
            ty = GRID_Y - r * CELL_H - 16.0
            cell_ops.append(b"1 0 0 1 %g %g Tm" % (tx, ty))
            cell_ops.append(b"(" + _esc(grid_cell_text(doc_id, r, c)) + b") Tj")
    cell_ops.append(b"ET")
    ops.append(b"\n".join(cell_ops))
    return b"\n".join(ops)


def _curves_stream(doc_id: int) -> bytes:
    """Curve fixture: K = 2 + doc_id%3 stroked beziers (non-axis point
    chains -> CurveObjects) plus one filled triangle (non-rect fill ->
    CurveObject). All geometry closed-form in doc_id."""
    k = 2 + doc_id % 3
    ops = [b"1 w"]
    for i in range(k):
        x, y = 72.0 + 10 * i, 300.0 - 30 * i
        ops.append(
            b"%g %g m %g %g %g %g %g %g c %g %g %g %g %g %g c S"
            % (x, y,
               x + 10, y + 30, x + 30, y + 30, x + 40, y + 10,
               x + 50, y - 30, x + 70, y - 30, x + 80, y - 10)
        )
    ops.append(b"200 500 m 240 500 l 220 540 l f")
    return b"\n".join(ops)


# --- assembler --------------------------------------------------------------


def _assemble_xrefstream(objects: dict[int, bytes], compressible: set[int]) -> bytes:
    """PDF 1.5 layout: objects in `compressible` are packed into one object
    stream (/Type/ObjStm); the cross-reference table is a /Type/XRef stream
    (W [1 2 1], FlateDecode with PNG up-predictor) — the modern file shape
    the classic-xref-only reference cannot read."""
    maxnum = max(objects) + 2
    objstm_num, xref_num = max(objects) + 1, max(objects) + 2

    # build the object stream: header of "objnum offset" pairs, then bodies
    packed = sorted(compressible)
    bodies, offsets, pos = [], [], 0
    for num in packed:
        body = objects[num]
        offsets.append((num, pos))
        bodies.append(body)
        pos += len(body) + 1
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b"\n"
    content = header + b"\n".join(bodies) + b"\n"
    first = len(header)
    objstm_data = zlib.compress(content)

    out = bytearray(b"%PDF-1.5\n")
    byte_off: dict[int, int] = {}
    for num in sorted(objects):
        if num in compressible:
            continue
        byte_off[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    byte_off[objstm_num] = len(out)
    out += (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d"
        b" /Filter /FlateDecode >>\nstream\n" % (objstm_num, len(packed), first, len(objstm_data))
        + objstm_data
        + b"\nendstream\nendobj\n"
    )

    # xref stream rows, W = [1 4 1] (4-byte offsets: no 64KiB file-size
    # ceiling, ADVICE r1)
    ROWW = 6
    rows = bytearray()
    for num in range(maxnum + 1):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") + bytes([255])
        elif num in byte_off or num == xref_num:
            off = byte_off.get(num, 0)  # xref stream offset patched below
            rows += bytes([1]) + off.to_bytes(4, "big") + bytes([0])
        elif num in compressible:
            idx = packed.index(num)
            rows += bytes([2]) + objstm_num.to_bytes(4, "big") + bytes([idx])
        else:  # gap object numbers are free entries
            rows += bytes([0]) + (0).to_bytes(4, "big") + bytes([0])
    xref_off = len(out)
    # patch the xref stream's own offset into its row
    row = bytes([1]) + xref_off.to_bytes(4, "big") + bytes([0])
    rows[ROWW * xref_num : ROWW * xref_num + ROWW] = row
    # PNG up-predictor (12), columns = ROWW
    pred = bytearray()
    prev = bytes(ROWW)
    for i in range(0, len(rows), ROWW):
        cur = bytes(rows[i : i + ROWW])
        pred += bytes([2]) + bytes((c - p) & 0xFF for c, p in zip(cur, prev))
        prev = cur
    xref_data = zlib.compress(bytes(pred))
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 1] /Root 1 0 R"
        b" /Info 9 0 R"
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 6 >>"
        b" /Length %d >>\nstream\n" % (xref_num, maxnum + 1, len(xref_data))
        + xref_data
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def _assemble(
    objects: dict[int, bytes],
    encrypt_num: int | None = None,
    id0: bytes | None = None,
) -> bytes:
    """Serialize numbered objects into a classic-xref PDF."""
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    maxnum = max(objects)
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += objects[num]
        out += b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:  # gap object numbers are free entries (ADVICE r1)
            out += b"0000000000 65535 f \n"
    trailer = b"<< /Size %d /Root 1 0 R" % (maxnum + 1)
    if 9 in objects:  # obj 9 is reserved for /Info
        trailer += b" /Info 9 0 R"
    if encrypt_num is not None:
        hex0 = id0.hex().encode()
        trailer += b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (encrypt_num, hex0, hex0)
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\n"
    out += b"startxref\n%d\n" % xref_off
    out += b"%%EOF\n"
    return bytes(out)


ENCRYPT_P = -44  # permission bits (print allowed, modify denied)


def _encrypt_pdf(objects: dict[int, bytes], doc_id: int) -> tuple[dict[int, bytes], int, bytes]:
    """Apply the standard security handler (R2/V1 RC4-40, empty user pw):
    encrypt stream bodies and the /Info strings per-object; append the
    /Encrypt dict. RC4 preserves length, so /Length stays valid."""
    import hashlib as _hl

    from . import crypt

    id0 = _hl.md5(b"doc-id:%d" % doc_id).digest()
    o_val = crypt.owner_value(b"", b"")
    key = crypt.file_key(b"", o_val, ENCRYPT_P, id0)
    u_val = crypt.user_value(key)

    out: dict[int, bytes] = {}
    for num, body in objects.items():
        marker = b"\nstream\n"
        if marker in body and body.endswith(b"endstream"):
            head, rest = body.split(marker, 1)
            data = rest[: -len(b"\nendstream")]
            enc = crypt.crypt_object_bytes(key, num, 0, data)
            out[num] = head + marker + enc + b"\nendstream"
        elif num == 9:
            # /Info: encrypt string values, re-emit as hex strings
            h = doc_id % 97
            fields = {
                b"Title": b"doc %d" % doc_id,
                b"Author": b"host%d.example" % h,
                b"Producer": b"pdfplumber-golang-spark",
                b"CreationDate": b"D:20240101000000Z",
            }
            parts = [b"<<"]
            for k, v in fields.items():
                enc = crypt.crypt_object_bytes(key, num, 0, v)
                parts.append(b" /%s <%s>" % (k, enc.hex().encode()))
            parts.append(b" >>")
            out[num] = b"".join(parts)
        else:
            out[num] = body  # no strings in catalog/pages/page/font dicts
    enc_num = max(objects) + 1
    out[enc_num] = (
        b"<< /Filter /Standard /V 1 /R 2 /Length 40"
        b" /O <%s> /U <%s> /P %d >>"
        % (o_val.hex().encode(), u_val.hex().encode(), ENCRYPT_P)
    )
    return out, enc_num, id0


def _info_dict(doc_id: int) -> bytes:
    h = doc_id % 97
    return (
        b"<< /Title (doc %d) /Author (host%d.example)"
        b" /Producer (pdfplumber-golang-spark)"
        b" /CreationDate (D:20240101000000Z) >>" % (doc_id, h)
    )


def _stream_obj(data: bytes, flate: bool, extra: bytes = b"") -> bytes:
    if flate:
        data = zlib.compress(data)
        extra = extra + b" /Filter /FlateDecode"
    return (
        b"<< /Length %d%s >>\nstream\n" % (len(data), extra)
        + data
        + b"\nendstream"
    )


def build_pdf(doc_id: int, text: str, variant: str) -> tuple[bytes, str]:
    """Build a deterministic PDF for (doc_id, text); return (bytes, golden).

    golden = expected extract_text output with pages joined by '\\n'
    (equal to spec.pdf_golden(text) for every variant).
    """
    lines = spec.wrap_chars(text)
    golden = spec.pdf_golden(text)
    per_page = (
        spec.PDF_MULTIPAGE_LINES if variant == "pdf_multipage"
        else spec.PDF_LINES_PER_PAGE
    )
    pages_lines = [lines[i : i + per_page] for i in range(0, len(lines), per_page)]

    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[9] = _info_dict(doc_id)  # document metadata (/Info in trailer)

    flate = variant == "pdf_flate"
    n_pages = len(pages_lines)
    page_obj_base = 10  # pages at 10, 12, 14...; streams at 11, 13, 15...

    if variant == "pdf_cmap":
        # Type0 font with ToUnicode CMap stream (obj 4)
        objects[3] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-Identity"
            b" /Encoding /Identity-H /ToUnicode 4 0 R /Name /F1 >>"
        )
        objects[4] = _stream_obj(_tounicode_cmap(), flate=False)
    else:
        objects[3] = _FONT_SIMPLE

    kids = []
    for p, plines in enumerate(pages_lines):
        pnum = page_obj_base + 2 * p
        snum = pnum + 1
        kids.append(b"%d 0 R" % pnum)
        if variant == "pdf_kerned":
            content = _text_stream_kerned(plines)
        elif variant == "pdf_cmap":
            content = _text_stream_cmap(plines)
        elif variant == "pdf_graphics":
            content = _graphics_stream(doc_id, plines)
        elif variant == "pdf_texttable":
            content = _texttable_stream(doc_id)
        elif variant == "pdf_rowrects":
            content = _rowrects_stream(doc_id)
        elif variant == "pdf_curves":
            content = _curves_stream(doc_id)
        else:
            content = _text_stream_plain(plines)
        objects[snum] = _stream_obj(content, flate=flate)
        if variant == "pdf_multipage":
            # inherit Resources + MediaBox from the Pages node
            objects[pnum] = (
                b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % snum
            )
        else:
            objects[pnum] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %g %g]"
                b" /Resources << /Font << /F1 3 0 R >> >>"
                b" /Contents %d 0 R >>" % (spec.PAGE_W, spec.PAGE_H, snum)
            )

    pages_dict = b"<< /Type /Pages /Kids [" + b" ".join(kids) + b"] /Count %d" % n_pages
    if variant == "pdf_multipage":
        pages_dict += (
            b" /MediaBox [0 0 %g %g]"
            b" /Resources << /Font << /F1 3 0 R >> >>" % (spec.PAGE_W, spec.PAGE_H)
        )
    pages_dict += b" >>"
    objects[2] = pages_dict

    if variant == "pdf_encrypted":
        enc_objects, enc_num, id0 = _encrypt_pdf(objects, doc_id)
        return _assemble(enc_objects, encrypt_num=enc_num, id0=id0), golden

    if variant == "pdf_xrefstream":
        # dict-only objects (catalog/pages/page/font/info) go into the
        # object stream; stream objects stay top-level
        compressible = {
            n for n in objects
            if b"\nstream\n" not in objects[n] and not objects[n].endswith(b"endstream")
        }
        return _assemble_xrefstream(objects, compressible), golden
    return _assemble(objects), golden


def build_payload(doc_id: int, text: str) -> tuple[bytes, str, str]:
    """Full corpus row payload: (payload_bytes, golden_text, variant)."""
    variant = spec.variant_of(doc_id)
    if variant == "malformed":
        return b"%PDF-1.4\n\x00\x01truncated-garbage", "", variant
    if variant == "html":
        from .htmlwrite import build_html  # local import: avoids cycle

        body = spec.body_of(doc_id, text)
        return build_html(doc_id, body), spec.html_golden(body), variant
    return (*build_pdf(doc_id, text, variant), variant)


def build_image_pdf(doc_id: int) -> bytes:
    """Single-page PDF with 1 + doc_id%3 image XObjects (8-bit DeviceGray,
    FlateDecode samples), each placed by a `W*10 0 0 H*10 tx ty cm /Imk Do`
    sequence — every header field and placement bbox is closed-form in
    doc_id so the pdf_images oracle can state them in SQL.  Query-local
    fixture (not part of the spec'd variant corpus)."""
    n = 1 + doc_id % 3
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R] /Count 1"
           b" /MediaBox [0 0 612 792] >>",
    }
    xrefs = []
    content = []
    for k in range(n):
        w = 1 + (doc_id + k) % 16
        h = 1 + (doc_id + k) % 12
        num = 20 + k
        samples = bytes(((doc_id + k + i) % 256 for i in range(w * h)))
        objects[num] = _stream_obj(
            samples,
            flate=True,
            extra=b" /Type /XObject /Subtype /Image /Width %d /Height %d"
                  b" /ColorSpace /DeviceGray /BitsPerComponent 8" % (w, h),
        )
        xrefs.append(b"/Im%d %d 0 R" % (k, num))
        content.append(
            b"q %d 0 0 %d %d %d cm /Im%d Do Q"
            % (10 * w, 10 * h, 50 + 60 * k, 100 + 40 * k, k)
        )
    # one inline image per doc too (BI/ID/EI): 2x2 gray, placed at a
    # closed-form bbox — inline images join the images relation with the
    # synthetic name 'inline'
    content.append(
        b"q 20 0 0 10 400 600 cm BI /W 2 /H 2 /CS /G /BPC 8 ID "
        b"\x01\x02\x03\x04 EI Q"
    )
    objects[10] = (
        b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
        b" /Resources << /XObject << " + b" ".join(xrefs) + b" >> >> >>"
    )
    objects[11] = _stream_obj(b"\n".join(content), flate=False)
    return _assemble(objects)


def build_annot_pdf(doc_id: int) -> bytes:
    """Single-page PDF with 1 + doc_id%2 Link annotations (closed-form
    /Rect and /A→/URI) plus one Text annotation with /Contents — every
    field stated in SQL by the pdf_annots oracle.  Query-local fixture
    (the reference's AnnotationObject is never populated there)."""
    n_links = 1 + doc_id % 2
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R] /Count 1"
           b" /MediaBox [0 0 612 792] >>",
    }
    annot_refs = []
    for k in range(n_links):
        num = 30 + k
        x0, y0 = 40 + 80 * k, 700 - 20 * k
        objects[num] = (
            b"<< /Type /Annot /Subtype /Link /Rect [%d %d %d %d]"
            b" /A << /S /URI /URI (https://link%d-%d.example) >> >>"
            % (x0, y0, x0 + 60, y0 + 12, doc_id, k)
        )
        annot_refs.append(b"%d 0 R" % num)
    objects[40] = (
        b"<< /Type /Annot /Subtype /Text /Rect [500 50 520 70]"
        b" /Contents (note %d) >>" % doc_id
    )
    annot_refs.append(b"40 0 R")
    objects[10] = (
        b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
        b" /Annots [" + b" ".join(annot_refs) + b"] >>"
    )
    objects[11] = _stream_obj(b"", flate=False)
    return _assemble(objects)


def build_form_pdf(doc_id: int) -> bytes:
    """Single-page PDF whose visible text lives entirely inside a Form
    XObject with its OWN /Resources/Font, placed twice by page-level cm
    translations (y 700 and y 700-120) — extracted text must read the
    form's line twice in top-down order.  Exercises recursive content
    execution + resource swapping (no form support exists in the
    reference).  Query-local fixture."""
    line = f"form line {doc_id}"
    form_stream = (
        b"BT /F1 12 Tf 72 700 Td (" + _esc(line) + b") Tj ET"
    )
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R] /Count 1"
           b" /MediaBox [0 0 612 792] >>",
        3: _FONT_SIMPLE,
        20: _stream_obj(
            form_stream,
            flate=False,
            extra=b" /Type /XObject /Subtype /Form /BBox [0 0 612 792]"
                  b" /Resources << /Font << /F1 3 0 R >> >>",
        ),
        10: (
            b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
            b" /Resources << /XObject << /Fm0 20 0 R >> >> >>"
        ),
        11: _stream_obj(
            b"q 1 0 0 1 0 0 cm /Fm0 Do Q\n"
            b"q 1 0 0 1 0 -120 cm /Fm0 Do Q",
            flate=False,
        ),
    }
    return _assemble(objects)
