"""PDF document parser: header → xref → objects → page tree.

From-scratch reimplementation of the reference's file-structure parser
semantics (/root/reference/pkg/parser/parser.go — SURVEY §2.1 S3-S13):
header verify, tail-scan startxref discovery, classic xref-table parse with
/Prev chains, indirect-object fetch with memoization, stream reads with
direct-or-indirect /Length, filter decode (FlateDecode with raw-DEFLATE
fallback, ASCIIHexDecode, ASCII85Decode — improving on the reference's
ascii85 stub at parser.go:686-690), and recursive page-tree walk with
Resources/MediaBox/CropBox/Rotate attribute inheritance
(parser.go:722-861).

Object model: Python natives (int/float/bytes/list/dict) + Name/Ref/Stream
wrappers, mirroring the tagged-union PDFObject model
(/root/reference/pkg/parser/types.go:8-115; PDFString stays *bytes* until
CMap decode, types.go:45).
"""

from __future__ import annotations

import base64
import binascii
import zlib

from . import lexer as lx


class Name(str):
    """A /Name (distinct from text strings)."""
    __slots__ = ()


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __hash__(self):
        return hash((self.num, self.gen))

    def __eq__(self, o):
        return isinstance(o, Ref) and o.num == self.num and o.gen == self.gen

    def __repr__(self):  # pragma: no cover
        return f"{self.num} {self.gen} R"


class Stream:
    __slots__ = ("dict", "raw", "_decoded")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw
        self._decoded: bytes | None = None


class PDFError(ValueError):
    pass


class Page:
    __slots__ = ("number", "dict", "resources", "contents", "mediabox",
                 "rotate", "cropbox")

    def __init__(self, number, d, resources, contents, mediabox, rotate,
                 cropbox=None):
        self.number = number
        self.dict = d
        self.resources = resources
        self.contents = contents  # list[bytes] (decoded)
        self.mediabox = mediabox  # (x0, y0, x1, y1)
        self.rotate = rotate
        # inherited /CropBox, defaulting to the mediabox like the
        # reference (parser.go:850-856 getPageBox fallback)
        self.cropbox = cropbox if cropbox is not None else mediabox


class PDFDocument:
    """Parsed PDF: xref + object cache + page list."""

    def __init__(self, data: bytes, password: bytes = b""):
        self.data = data
        self.xref: dict[int, int] = {}      # objnum -> byte offset
        #: objnum -> (objstm_num, index) for compressed objects (PDF 1.5)
        self.xref_compressed: dict[int, tuple[int, int]] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._crypt_key: bytes | None = None
        self._encrypt_num: int | None = None
        self.version = self._verify_header()
        self._parse_xref_chain()
        self._setup_encryption(password)
        self.pages: list[Page] = self._build_pages()

    # ------------------------------------------------------- encryption ---
    def _setup_encryption(self, password: bytes) -> None:
        """Standard security handler R2/V1 (RC4-40) — the OpenWithPassword
        capability (reference document.go:27-67 via pdfcpu)."""
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        if isinstance(enc_ref, Ref):
            self._encrypt_num = enc_ref.num
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PDFError("bad /Encrypt dict")
        from . import crypt

        filt = str(self.resolve(enc.get("Filter")) or "")
        r = int(self.resolve(enc.get("R")) or 0)
        if filt != "Standard" or r != 2:
            raise PDFError(f"unsupported encryption (filter={filt} R={r})")
        o = self.resolve(enc.get("O")) or b""
        u = self.resolve(enc.get("U")) or b""
        p = int(self.resolve(enc.get("P")) or 0)
        ids = self.resolve(self.trailer.get("ID")) or [b""]
        id0 = self.resolve(ids[0]) if ids else b""
        key = crypt.file_key(password, bytes(o), p, bytes(id0))
        if crypt.user_value(key) != bytes(u):
            raise PDFError("encrypted: wrong password")
        self._crypt_key = key

    def _decrypt_value(self, val, num: int, gen: int):
        """Recursively decrypt strings and stream bytes of object `num`."""
        from .crypt import crypt_object_bytes

        if isinstance(val, bytes):
            return crypt_object_bytes(self._crypt_key, num, gen, val)
        if isinstance(val, list):
            return [self._decrypt_value(v, num, gen) for v in val]
        if isinstance(val, Stream):
            val.raw = crypt_object_bytes(self._crypt_key, num, gen, val.raw)
            val.dict = self._decrypt_value(val.dict, num, gen)
            return val
        if isinstance(val, dict):
            return {k: self._decrypt_value(v, num, gen) for k, v in val.items()}
        return val

    # ---------------------------------------------------------- header ---
    def _verify_header(self) -> str:
        if not self.data.startswith(b"%PDF-"):
            raise PDFError("missing %PDF- header")
        eol = self.data.find(b"\n", 0, 32)
        return self.data[5 : eol if eol > 0 else 16].decode("latin-1", "replace").strip()

    # ------------------------------------------------------------ xref ---
    def _find_startxref(self) -> int:
        tail = self.data[-1024:]
        idx = tail.rfind(b"startxref")
        if idx < 0:
            raise PDFError("startxref not found in last 1KB")
        lex = lx.Lexer(tail, idx + len(b"startxref"))
        tok = lex.next()
        if tok.kind != lx.NUM:
            raise PDFError("bad startxref offset")
        return int(tok.val)

    def _parse_xref_chain(self) -> None:
        offset = self._find_startxref()
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            trailer = self._parse_xref_section(offset)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            prev = trailer.get("Prev")
            offset = int(prev) if isinstance(prev, (int, float)) else 0

    def _parse_xref_section(self, offset: int) -> dict:
        lex = lx.Lexer(self.data, offset)
        tok = lex.next()
        if tok.kind == lx.NUM:
            # PDF 1.5+: startxref points at a cross-reference STREAM object
            # (beyond the classic-only reference parser)
            lex.push_back(tok)
            return self._parse_xref_stream(lex)
        if not (tok.kind == lx.KEYWORD and tok.val == "xref"):
            raise PDFError(f"no xref table or stream at {offset}")
        while True:
            tok = lex.next()
            if tok.kind == lx.KEYWORD and tok.val == "trailer":
                break
            if tok.kind != lx.NUM:
                raise PDFError("malformed xref subsection header")
            start = int(tok.val)
            count_t = lex.next()
            if count_t.kind != lx.NUM:
                raise PDFError("malformed xref count")
            count = int(count_t.val)
            lex._skip_ws()
            if self._parse_xref_fixed(lex, start, count):
                continue
            for i in range(count):
                off_t, gen_t, flag_t = lex.next(), lex.next(), lex.next()
                if off_t.kind != lx.NUM or flag_t.kind != lx.KEYWORD:
                    raise PDFError("malformed xref entry")
                if flag_t.val == "n":
                    self.xref.setdefault(start + i, int(off_t.val))
        return self._parse_value(lex)

    def _parse_xref_fixed(self, lex, start: int, count: int) -> bool:
        """Fast path: spec-conformant 20-byte xref rows
        ('nnnnnnnnnn ggggg n \\n'); falls back to token parsing if the
        section isn't exactly fixed-width."""
        pos = lex.pos
        end = pos + 20 * count
        if end > len(self.data):
            return False
        block = self.data[pos:end]
        setdefault = self.xref.setdefault
        for i in range(count):
            row = block[20 * i : 20 * i + 20]
            if row[10:11] != b" " or row[16:17] != b" ":
                return False
            flag = row[17:18]
            if flag not in (b"n", b"f"):
                return False
            if flag == b"n":
                try:
                    setdefault(start + i, int(row[:10]))
                except ValueError:
                    return False
        lex.pos = end
        return True

    def _parse_xref_stream(self, lex: lx.Lexer) -> dict:
        """/Type/XRef stream: W-field-encoded rows; type 1 = byte offset,
        type 2 = (object-stream number, index)."""
        t1, t2, t3 = lex.next(), lex.next(), lex.next()
        if not (t1.kind == lx.NUM and t2.kind == lx.NUM
                and t3.kind == lx.KEYWORD and t3.val == "obj"):
            raise PDFError("xref stream: not an indirect object")
        st = self._parse_value(lex)
        if not isinstance(st, Stream) or str(self.resolve(st.dict.get("Type"))) != "XRef":
            raise PDFError("xref stream: /Type /XRef missing")
        data = self.stream_data(st)
        w = [int(self.resolve(v)) for v in self.resolve(st.dict.get("W")) or []]
        if len(w) != 3:
            raise PDFError("xref stream: bad /W")
        size = int(self.resolve(st.dict.get("Size")) or 0)
        index = self.resolve(st.dict.get("Index")) or [0, size]
        index = [int(self.resolve(v)) for v in index]
        rowlen = sum(w)

        def field(row: bytes, start: int, width: int, default: int) -> int:
            if width == 0:
                return default
            return int.from_bytes(row[start : start + width], "big")

        pos = 0
        for i in range(0, len(index), 2):
            start, count = index[i], index[i + 1]
            for k in range(count):
                row = data[pos : pos + rowlen]
                pos += rowlen
                if len(row) < rowlen:
                    break
                typ = field(row, 0, w[0], 1)
                f2 = field(row, w[0], w[1], 0)
                f3 = field(row, w[0] + w[1], w[2], 0)
                num = start + k
                if typ == 1:
                    self.xref.setdefault(num, f2)
                elif typ == 2 and num not in self.xref_compressed:
                    self.xref_compressed.setdefault(num, (f2, f3))
        return dict(st.dict)

    def _load_objstm(self, num: int) -> dict[int, object]:
        """Parse a /Type/ObjStm container: N pairs of (objnum, offset) then
        the concatenated object bodies starting at /First."""
        if num in self._objstm_cache:
            return self._objstm_cache[num]
        container = self.get_object(Ref(num, 0))
        out: dict[int, object] = {}
        if isinstance(container, Stream):
            data = self.stream_data(container)
            n = int(self.resolve(container.dict.get("N")) or 0)
            first = int(self.resolve(container.dict.get("First")) or 0)
            hlex = lx.Lexer(data[:first])
            pairs = []
            for _ in range(n):
                a, b = hlex.next(), hlex.next()
                if a.kind != lx.NUM or b.kind != lx.NUM:
                    break
                pairs.append((int(a.val), int(b.val)))
            for objnum, off in pairs:
                blex = lx.Lexer(data, first + off)
                out[objnum] = self._parse_value(blex)
        self._objstm_cache[num] = out
        return out

    # --------------------------------------------------------- objects ---
    def _parse_value(self, lex: lx.Lexer):
        """Recursive-descent object parse with `N G R` lookahead."""
        tok = lex.next()
        k = tok.kind
        if k == lx.NUM:
            if isinstance(tok.val, int):
                save = lex.pos
                t2 = lex.next()
                if t2.kind == lx.NUM and isinstance(t2.val, int):
                    t3 = lex.next()
                    if t3.kind == lx.KEYWORD and t3.val == "R":
                        return Ref(tok.val, t2.val)
                lex.pos = save
                lex._pushback = None
            return tok.val
        if k == lx.NAME:
            return Name(tok.val)
        if k == lx.STRING:
            return tok.val
        if k == lx.ARRAY_OPEN:
            arr = []
            while True:
                save = lex.pos
                t = lex.next()
                if t.kind in (lx.ARRAY_CLOSE, lx.EOF):
                    return arr
                lex.pos = save
                lex._pushback = None
                arr.append(self._parse_value(lex))
        if k == lx.DICT_OPEN:
            d = {}
            while True:
                t = lex.next()
                if t.kind in (lx.DICT_CLOSE, lx.EOF):
                    break
                if t.kind != lx.NAME:
                    continue  # skip junk keys
                d[t.val] = self._parse_value(lex)
            return self._maybe_stream(d, lex)
        if k == lx.KEYWORD:
            if tok.val == "true":
                return True
            if tok.val == "false":
                return False
            if tok.val == "null":
                return None
            return Name(tok.val)  # tolerate bare keywords
        return None

    def _maybe_stream(self, d: dict, lex: lx.Lexer):
        save = lex.pos
        t = lex.next()
        if not (t.kind == lx.KEYWORD and t.val == "stream"):
            lex.pos = save
            lex._pushback = None
            return d
        # skip EOL after 'stream' (CR LF or LF)
        pos = lex.pos
        if self.data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif self.data[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(d.get("Length"))
        if not isinstance(length, (int, float)):
            end = self.data.find(b"endstream", pos)
            length = max(end - pos, 0)
        raw = self.data[pos : pos + int(length)]
        lex.pos = pos + int(length)
        # consume 'endstream'
        t = lex.next()
        while t.kind != lx.EOF and not (t.kind == lx.KEYWORD and t.val == "endstream"):
            t = lex.next()
        return Stream(d, raw)

    def get_object(self, ref: Ref):
        if ref.num in self._cache:
            return self._cache[ref.num]
        off = self.xref.get(ref.num)
        if off is None:
            loc = self.xref_compressed.get(ref.num)
            if loc is not None:
                val = self._load_objstm(loc[0]).get(ref.num)
                self._cache[ref.num] = val
                return val
            return None
        lex = lx.Lexer(self.data, off)
        t1, t2, t3 = lex.next(), lex.next(), lex.next()
        if not (
            t1.kind == lx.NUM
            and t2.kind == lx.NUM
            and t3.kind == lx.KEYWORD
            and t3.val == "obj"
        ):
            raise PDFError(f"object {ref.num} not at xref offset {off}")
        val = self._parse_value(lex)
        if self._crypt_key is not None and ref.num != self._encrypt_num:
            val = self._decrypt_value(val, ref.num, ref.gen)
        self._cache[ref.num] = val
        return val

    def resolve(self, val):
        depth = 0
        while isinstance(val, Ref) and depth < 32:
            val = self.get_object(val)
            depth += 1
        return val

    # -------------------------------------------------------- metadata ---
    def metadata(self) -> dict[str, str]:
        """Document /Info dict (Title/Author/Subject/Creator/Producer/
        CreationDate…) decoded to text. The reference defines the Metadata
        struct (/root/reference/pkg/pdf/types.go:48-58) but never populates
        it (document.go:75-87); we implement the actual trailer /Info read."""
        info = self.resolve(self.trailer.get("Info"))
        out: dict[str, str] = {}
        if not isinstance(info, dict):
            return out
        for k, v in info.items():
            v = self.resolve(v)
            if isinstance(v, bytes):
                if v[:2] == b"\xfe\xff":
                    out[str(k)] = v[2:].decode("utf-16-be", "replace")
                else:
                    out[str(k)] = v.decode("latin-1")
            elif isinstance(v, (str, int, float, bool)):
                out[str(k)] = str(v)
        return out

    # --------------------------------------------------------- streams ---
    def stream_data(self, st: Stream) -> bytes:
        if st._decoded is not None:
            return st._decoded
        data = st.raw
        filt = self.resolve(st.dict.get("Filter"))
        filters = (
            [filt] if isinstance(filt, (str, Name)) else (filt or [])
        )
        parms = self.resolve(st.dict.get("DecodeParms") or st.dict.get("DP"))
        parms_list = [parms] if isinstance(parms, (dict, type(None))) else parms
        for i, f in enumerate(filters):
            data = _decode_filter(str(self.resolve(f)), data)
            p = None
            if parms_list and i < len(parms_list):
                p = self.resolve(parms_list[i])
            if isinstance(p, dict):
                pred = int(self.resolve(p.get("Predictor")) or 1)
                if pred >= 10:
                    cols = int(self.resolve(p.get("Columns")) or 1)
                    colors = int(self.resolve(p.get("Colors")) or 1)
                    bpc = int(self.resolve(p.get("BitsPerComponent")) or 8)
                    data = _png_unpredict(data, cols * colors * bpc // 8,
                                          colors * bpc // 8)
        st._decoded = data
        return data

    # ------------------------------------------------------- page tree ---
    def _build_pages(self) -> list[Page]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PDFError("missing /Root catalog")
        pages_node = self.resolve(root.get("Pages"))
        if not isinstance(pages_node, dict):
            raise PDFError("missing /Pages")
        out: list[Page] = []
        self._walk(pages_node, {}, out, depth=0)
        return out

    _INHERIT = ("Resources", "MediaBox", "CropBox", "Rotate")

    def _walk(self, node: dict, inherited: dict, out: list[Page], depth: int) -> None:
        if depth > 64:
            raise PDFError("page tree too deep")
        inh = dict(inherited)
        for key in self._INHERIT:
            if key in node:
                inh[key] = node[key]
        ntype = str(self.resolve(node.get("Type")) or "")
        kids = self.resolve(node.get("Kids"))
        if ntype == "Pages" or isinstance(kids, list):
            for kid in kids or []:
                kd = self.resolve(kid)
                if isinstance(kd, dict):
                    self._walk(kd, inh, out, depth + 1)
            return
        # leaf page
        merged = dict(inh)
        merged.update(node)
        mb = self.resolve(merged.get("MediaBox")) or [0, 0, 612, 792]
        mediabox = tuple(float(self.resolve(v)) for v in mb[:4])
        cb = self.resolve(merged.get("CropBox"))
        cropbox = (
            tuple(float(self.resolve(v)) for v in cb[:4])
            if isinstance(cb, list) and len(cb) >= 4 else None
        )
        rotate = int(self.resolve(merged.get("Rotate")) or 0)
        resources = self.resolve(merged.get("Resources")) or {}
        contents = self.resolve(merged.get("Contents"))
        streams: list[bytes] = []
        if isinstance(contents, Stream):
            streams.append(self.stream_data(contents))
        elif isinstance(contents, list):
            for c in contents:
                cs = self.resolve(c)
                if isinstance(cs, Stream):
                    streams.append(self.stream_data(cs))
        out.append(
            Page(
                number=len(out) + 1,
                d=merged,
                resources=resources,
                contents=streams,
                mediabox=mediabox,
                rotate=rotate,
                cropbox=cropbox,
            )
        )


def _png_unpredict(data: bytes, rowlen: int, bpp: int) -> bytes:
    """Reverse PNG row filters (predictors 10-15): each encoded row is one
    filter-type byte + rowlen bytes; filters None/Sub/Up/Average/Paeth."""
    if rowlen <= 0:
        return data
    out = bytearray()
    prev = bytearray(rowlen)
    stride = rowlen + 1
    for r in range(0, len(data) - stride + 1, stride):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + rowlen])
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _decode_filter(name: str, data: bytes) -> bytes:
    if name in ("FlateDecode", "Fl"):
        try:
            return zlib.decompress(data)
        except zlib.error:
            return zlib.decompressobj(-15).decompress(data)  # raw DEFLATE
    if name in ("ASCIIHexDecode", "AHx"):
        hexs = bytes(c for c in data if c not in b" \t\r\n\x0c\x00>")
        if len(hexs) % 2:
            hexs += b"0"
        return binascii.unhexlify(hexs)
    if name in ("ASCII85Decode", "A85"):
        s = data.rstrip()
        if s.endswith(b"~>"):
            s = s[:-2]
        return base64.a85decode(s)
    if name in ("RunLengthDecode", "RL"):
        return _rle_decode(data)
    if name in ("LZWDecode", "LZW"):
        return _lzw_decode(data)
    if name in ("DCTDecode", "DCT"):
        # image-XObject JPEG payloads (PDF 32000-1 §7.4.8): decode to raw
        # grayscale samples with the stdlib baseline decoder (r5 — the
        # reference's filter table names DCTDecode but never decodes it)
        from ..functions.multimodal import decode_jpeg_pixels

        return decode_jpeg_pixels(data)[3]
    # unknown filter: pass through (reference behavior for unsupported)
    return data


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode (PDF 32000-1 §7.4.5; the reference stubs it,
    parser.go:603-611): length byte L then literal run (L+1 bytes) for
    L <= 127, repeat-next-byte (257-L copies) for L >= 129, EOD at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            if i + 1 >= n:
                break  # truncated repeat run: emit what we have
            out += data[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """LZWDecode (PDF 32000-1 §7.4.4; absent from the reference,
    parser.go:613-621): MSB-first variable-width codes, 9->12 bits,
    ClearTable=256, EOD=257, with the PDF/TIFF "early change" convention
    (code width bumps one entry before the table fills)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # ClearTable
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # early change: width grows when the NEXT code could overflow
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)
