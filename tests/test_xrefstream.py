"""PDF 1.5 cross-reference streams + object streams + PNG predictors.

Beyond the reference's classic-xref-only parser (parser.go:168-302) — most
real Common-Crawl PDFs are 1.5+, so the scale path needs this."""

from pdfplumber_golang_spark import spec
from pdfplumber_golang_spark.kernel.extract import extract_document
from pdfplumber_golang_spark.kernel.pdfparse import PDFDocument, _png_unpredict
from pdfplumber_golang_spark.kernel.pdfwrite import build_pdf

TEXT = ("the quick brown fox jumps over the lazy dog " * 5).strip()


def test_xrefstream_roundtrip():
    data, golden = build_pdf(42, TEXT, "pdf_xrefstream")
    assert data.startswith(b"%PDF-1.5")
    doc = PDFDocument(data)
    assert len(doc.xref_compressed) >= 4  # catalog/pages/page/font/info
    pages, err = extract_document("u", data)
    assert err is None
    assert "\n".join(p.text for p in pages) == golden == spec.pdf_golden(TEXT)


def test_objstm_metadata():
    data, _ = build_pdf(7, TEXT, "pdf_xrefstream")
    meta = PDFDocument(data).metadata()
    assert meta["Title"] == "doc 7"


def test_png_predictors_all_filters():
    import zlib

    rows = [bytes([10 * r + c for c in range(4)]) for r in range(5)]
    raw = b"".join(rows)
    # encode with a mix of filter types, decode must reconstruct
    for ft in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(4)
        for row in rows:
            if ft == 0:
                f = row
            elif ft == 1:
                f = bytes([(row[i] - (row[i - 1] if i >= 1 else 0)) & 0xFF for i in range(4)])
            elif ft == 2:
                f = bytes([(row[i] - prev[i]) & 0xFF for i in range(4)])
            elif ft == 3:
                f = bytes([(row[i] - (((row[i - 1] if i >= 1 else 0) + prev[i]) >> 1)) & 0xFF for i in range(4)])
            else:
                def paeth(a, b, c):
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f = bytes([(row[i] - paeth(row[i - 1] if i >= 1 else 0, prev[i], prev[i - 1] if i >= 1 else 0)) & 0xFF for i in range(4)])
            enc += bytes([ft]) + f
            prev = row
        assert _png_unpredict(bytes(enc), 4, 1) == raw, ft


def test_corpus_mix_includes_modern_variants():
    assert spec.variant_of(16) == "pdf_xrefstream"
    assert spec.variant_of(36) == "pdf_encrypted"
    assert spec.variant_of(6) == "pdf_plain"
