"""Stream-filter decode tests (S8-S11): Flate, raw-DEFLATE fallback,
ASCIIHexDecode, ASCII85Decode (the reference stubs A85 —
/root/reference/pkg/parser/parser.go:686-690 — we implement it), and
filter chains."""

import base64
import binascii
import zlib

from pdfplumber_golang_spark.kernel.pdfparse import PDFDocument, _decode_filter
from pdfplumber_golang_spark.kernel.pdfwrite import _assemble


def test_flate_and_raw_deflate():
    data = b"hello stream " * 10
    assert _decode_filter("FlateDecode", zlib.compress(data)) == data
    raw = zlib.compressobj(wbits=-15)
    blob = raw.compress(data) + raw.flush()
    assert _decode_filter("FlateDecode", blob) == data


def test_asciihex():
    assert _decode_filter("ASCIIHexDecode", b"48 65 6C 6C 6F>") == b"Hello"
    # odd digit count pads with '0'
    assert _decode_filter("ASCIIHexDecode", b"486>") == b"H`"


def test_ascii85():
    data = b"binary \x00\x01 payload"
    enc = base64.a85encode(data) + b"~>"
    assert _decode_filter("ASCII85Decode", enc) == data


def test_unknown_filter_passthrough():
    assert _decode_filter("Mystery", b"abc") == b"abc"


def test_filter_chain_in_document():
    """A85(Flate(content)) chain resolved through a real document object."""
    content = b"BT /F1 12 Tf 72 720 Td (Hi) Tj ET"
    blob = base64.a85encode(zlib.compress(content))
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1"
           b" /Resources << /Font << /F1 4 0 R >> >>"
           b" /MediaBox [0 0 612 792] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        # decode applies filters in listed order: a85 first, then flate
        5: b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n" % len(blob)
           + blob + b"\nendstream",
    }
    doc = PDFDocument(_assemble(objects))
    assert len(doc.pages) == 1
    assert doc.pages[0].contents == [content]


def test_indirect_length():
    content = b"BT ET"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 10 10] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R >>\nstream\n" + content + b"\nendstream",
        5: b"%d" % len(content),
    }
    doc = PDFDocument(_assemble(objects))
    assert doc.pages[0].contents == [content]


def test_runlength_decode():
    """RunLengthDecode vectors (PDF 32000-1 §7.4.5): literal runs, repeat
    runs, EOD, truncation tolerance."""
    from pdfplumber_golang_spark.kernel.pdfparse import _rle_decode

    assert _rle_decode(b"\x02abc") == b"abc"              # literal, L+1 bytes
    assert _rle_decode(b"\xffx") == b"xx"                 # 257-255 copies
    assert _rle_decode(b"\xfey") == b"yyy"
    assert _rle_decode(b"\x00a\xfeb\x80IGNORED") == b"abbb"  # EOD stops
    assert _rle_decode(b"") == b""
    assert _rle_decode(b"\xfe") == b""                    # truncated repeat


def test_lzw_decode_known_vector():
    """Hand-assembled code stream for b'-----' (the PDF spec's classic
    example shape): Clear, 45, 258, 258, EOD at 9 bits MSB-first."""
    from pdfplumber_golang_spark.kernel.pdfparse import _lzw_decode

    codes = [256, 45, 258, 258, 257]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert _lzw_decode(bytes(out)) == b"-----"


def test_lzw_roundtrip_random():
    """Round-trip against an independent encoder (standard LZW with the
    PDF early-change convention)."""
    import random

    from pdfplumber_golang_spark.kernel.pdfparse import _lzw_decode

    def encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        codes = [256]
        w = b""
        widths = [9]
        for b in data:
            wk = w + bytes([b])
            if wk in table:
                w = wk
                continue
            codes.append(table[w])
            widths.append(width)
            table[wk] = next_code
            next_code += 1
            # early change: the DECODER grows when len(table)+1 fills the
            # width, i.e. after it has added next_code-1 entries; encoder
            # mirrors that so both sides agree on each code's width
            if next_code + 1 > (1 << width) and width < 12:
                width += 1
            w = bytes([b])
        if w:
            codes.append(table[w])
            widths.append(width)
        codes.append(257)
        widths.append(width)
        acc = nbits = 0
        out = bytearray()
        for c, wd in zip(codes, widths):
            acc = (acc << wd) | c
            nbits += wd
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    rng = random.Random(11)
    cases = [
        b"",
        b"a",
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        bytes(rng.randrange(4) for _ in range(5000)),   # repetitive
        bytes(rng.randrange(256) for _ in range(3000)),  # incompressible
        (b"the quick brown fox " * 200),
    ]
    for data in cases:
        assert _lzw_decode(encode(data)) == data, len(data)


def test_filter_chain_with_rl_and_lzw():
    """_decode_filter dispatch reaches the new codecs by PDF name + abbrev."""
    from pdfplumber_golang_spark.kernel.pdfparse import _decode_filter

    assert _decode_filter("RunLengthDecode", b"\x02abc") == b"abc"
    assert _decode_filter("RL", b"\xffz") == b"zz"
    # LZW of a single 'A': Clear(256), 65, EOD(257) at 9 bits
    codes = [256, 65, 257]
    acc = nbits = 0
    raw = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            raw.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        raw.append((acc << (8 - nbits)) & 0xFF)
    assert _decode_filter("LZWDecode", bytes(raw)) == b"A"
    assert _decode_filter("LZW", bytes(raw)) == b"A"


def test_dctdecode_filter_decodes_jpeg_samples():
    """r5: DCTDecode (PDF 32000-1 §7.4.8) routes image-XObject JPEG
    payloads through the stdlib baseline decoder — the reference's
    filter table names the filter but never decodes it."""
    from pdfplumber_golang_spark.functions import multimodal as mm
    from pdfplumber_golang_spark.kernel.pdfparse import _decode_filter

    out = _decode_filter("DCTDecode", mm.jpeg_bytes(8, 8))
    assert out == bytes([129] * 64)
    out = _decode_filter("DCT", mm.jpeg_bytes(9, 8))
    assert len(out) == 72  # cropped to 9x8 from the two-block MCU row
