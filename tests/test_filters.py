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
