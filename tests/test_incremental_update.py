"""Incremental-update PDFs: appended revision with /Prev-chained xref.

Newest xref section must win for overridden objects (the reference's chain
walk, parser.go:168-302 + /Prev handling)."""

from pdfplumber_golang_spark.kernel.extract import extract_document
from pdfplumber_golang_spark.kernel.pdfparse import PDFDocument
from pdfplumber_golang_spark.kernel.pdfwrite import build_pdf

TEXT = ("incremental update body text for the page " * 3).strip()


def _incremental_update(base: bytes) -> bytes:
    """Append a revision replacing object 9 (/Info) with a new Title."""
    tail = base[-1024:]
    idx = tail.rfind(b"startxref")
    prev_off = int(tail[idx + 9 :].split()[0])

    out = bytearray(base)
    new_obj_off = len(out)
    out += b"9 0 obj\n<< /Title (updated title) /Producer (rev2) >>\nendobj\n"
    xref_off = len(out)
    out += b"xref\n9 1\n"
    out += b"%010d 00000 n \n" % new_obj_off
    out += b"trailer\n<< /Size 20 /Root 1 0 R /Info 9 0 R /Prev %d >>\n" % prev_off
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def test_prev_chain_newest_wins():
    base, golden = build_pdf(11, TEXT, "pdf_plain")
    updated = _incremental_update(base)
    doc = PDFDocument(updated)
    meta = doc.metadata()
    assert meta["Title"] == "updated title"
    assert meta["Producer"] == "rev2"
    # content objects still resolve through the old section
    pages, err = extract_document("u", updated)
    assert err is None
    assert "\n".join(p.text for p in pages) == golden


def test_original_unchanged_without_update():
    base, _ = build_pdf(11, TEXT, "pdf_plain")
    assert PDFDocument(base).metadata()["Title"] == "doc 11"
