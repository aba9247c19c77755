"""Golden end-to-end kernel assertions (no Spark).

Port of the reference's golden-fixture strategy
(/root/reference/pdf_test.go:22-106, cmd/compare_accurate/main.go:85-128):
known text, first-char identity, page dims, per-variant byte-identity over
the real driver corpus."""

import duckdb
import pytest

from pdfplumber_golang_spark import spec
from pdfplumber_golang_spark.kernel.extract import extract_document, parse_pdf_objects
from pdfplumber_golang_spark.kernel.pdfwrite import build_payload, build_pdf

SAMPLE_TEXT = "Dummy PDF file"


def test_plain_pdf_golden_text():
    data, golden = build_pdf(0, SAMPLE_TEXT, "pdf_plain")
    pages, err = extract_document("u", data)
    assert err is None
    assert len(pages) == 1
    assert pages[0].text == SAMPLE_TEXT == golden


def test_first_char_position():
    # mirror of compare_accurate: first char, exact position and font size
    data, _ = build_pdf(0, SAMPLE_TEXT, "pdf_plain")
    [(page_no, mediabox, interp)] = list(parse_pdf_objects(data))
    first = interp.chars[0]
    assert first[0] == "D"
    assert first[2] == spec.FONT_SIZE
    assert first[3] == spec.TEXT_X0  # x0
    assert first[4] == spec.TEXT_Y0  # y0 (baseline, PDF coords)
    assert mediabox == (0.0, 0.0, spec.PAGE_W, spec.PAGE_H)


def test_multipage_inheritance():
    text = "x" * (spec.PDF_WRAP * spec.PDF_MULTIPAGE_LINES * 2 + 5)
    data, golden = build_pdf(0, text, "pdf_multipage")
    pages, err = extract_document("u", data)
    assert err is None
    assert len(pages) == 3  # 2 full pages + remainder
    # MediaBox inherited from the Pages node
    assert pages[0].width == spec.PAGE_W and pages[0].height == spec.PAGE_H
    assert "\n".join(p.text for p in pages) == golden


@pytest.mark.parametrize("variant", ["pdf_plain", "pdf_flate", "pdf_kerned", "pdf_cmap"])
def test_variant_byte_identity(variant):
    text = "the quick brown fox jumps over the lazy dog " * 4
    text = text.strip()
    data, golden = build_pdf(7, text, variant)
    pages, err = extract_document("u", data)
    assert err is None
    got = "\n".join(p.text for p in pages)
    assert got == golden == spec.pdf_golden(text)


def test_malformed_yields_error_not_crash():
    pages, err = extract_document("u", b"%PDF-1.4\n\x00junk")
    assert pages == [] and err is not None
    pages, err = extract_document("u", b"")
    assert err is None  # empty -> html route, empty text
    assert pages[0].text == ""


def test_full_corpus_byte_identity_sf0001():
    rows = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    for doc_id, text in rows:
        payload, golden, variant = build_payload(doc_id, text)
        pages, err = extract_document(spec.url_of(doc_id), payload)
        if variant == "malformed":
            assert err is not None
            continue
        assert err is None, (doc_id, variant, err)
        assert "\n".join(p.text for p in pages) == golden, (doc_id, variant)


def test_form_xobject_execution():
    """Form XObjects execute recursively with their own resources and the
    /Matrix prepended to the CTM; state (fonts, text matrices, graphics
    state) never leaks back to the page (kernel/content.op_Do)."""
    from pdfplumber_golang_spark.kernel.extract import (
        extract_document, parse_pdf_objects,
    )
    from pdfplumber_golang_spark.kernel.pdfwrite import build_form_pdf

    pages, err = extract_document("u", build_form_pdf(9))
    assert err is None
    assert pages[0].text == "form line 9\nform line 9"
    # both placements emit the same chars 120pt apart vertically
    for _, _, interp in parse_pdf_objects(build_form_pdf(9)):
        ys = sorted({round(c[4], 1) for c in interp.chars}, reverse=True)
        assert ys == [700.0, 580.0]


def test_form_xobject_depth_guard():
    """A self-referential form must terminate via the depth bound."""
    from pdfplumber_golang_spark.kernel.pdfwrite import (
        _FONT_SIMPLE, _assemble, _stream_obj,
    )
    from pdfplumber_golang_spark.kernel.extract import extract_document

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R] /Count 1"
           b" /MediaBox [0 0 612 792] >>",
        3: _FONT_SIMPLE,
        20: _stream_obj(
            b"/Fm0 Do BT /F1 12 Tf 72 700 Td (x) Tj ET",
            flate=False,
            extra=b" /Type /XObject /Subtype /Form /BBox [0 0 612 792]"
                  b" /Resources << /Font << /F1 3 0 R >>"
                  b" /XObject << /Fm0 20 0 R >> >>",
        ),
        10: b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
            b" /Resources << /XObject << /Fm0 20 0 R >> >> >>",
        11: _stream_obj(b"/Fm0 Do", flate=False),
    }
    pages, err = extract_document("u", _assemble(objects))
    assert err is None  # bounded recursion, no stack overflow
    assert pages[0].text.count("x") <= 8


def test_cropbox_inherited_and_defaulted():
    """/CropBox inherits through the page tree and defaults to the
    mediabox (reference parser.go:850-856)."""
    from pdfplumber_golang_spark.kernel.pdfparse import PDFDocument
    from pdfplumber_golang_spark.kernel.pdfwrite import (
        _FONT_SIMPLE, _assemble, _stream_obj,
    )

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R 12 0 R] /Count 2"
           b" /MediaBox [0 0 612 792] /CropBox [10 10 600 780] >>",
        3: _FONT_SIMPLE,
        10: b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R >>",
        11: _stream_obj(b"", flate=False),
        12: b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
            b" /CropBox [0 0 300 400] >>",
    }
    doc = PDFDocument(_assemble(objects))
    assert doc.pages[0].cropbox == (10.0, 10.0, 600.0, 780.0)  # inherited
    assert doc.pages[1].cropbox == (0.0, 0.0, 300.0, 400.0)    # overridden
    # absent everywhere -> defaults to mediabox
    del objects[12]
    objects[2] = (b"<< /Type /Pages /Kids [10 0 R] /Count 1"
                  b" /MediaBox [0 0 612 792] >>")
    doc2 = PDFDocument(_assemble(objects))
    assert doc2.pages[0].cropbox == doc2.pages[0].mediabox


def test_form_xobject_text_state_does_not_leak():
    """ADVICE r3: Tc/Tw/Tz/TL/Ts/Tr set INSIDE a form are graphics state
    under q/Q semantics — after the Do returns, page-level text must see
    the defaults again (not the form's spacing), so glyph advances after
    the form are unchanged."""
    from pdfplumber_golang_spark.kernel.extract import parse_pdf_objects
    from pdfplumber_golang_spark.kernel.pdfwrite import (
        _FONT_SIMPLE, _assemble, _stream_obj,
    )

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R] /Count 1"
           b" /MediaBox [0 0 612 792] >>",
        3: _FONT_SIMPLE,
        20: _stream_obj(
            b"BT /F1 12 Tf 9 Tc 7 Tw 50 Tz 33 TL 4 Ts 2 Tr"
            b" 72 700 Td (inside) Tj ET",
            flate=False,
            extra=b" /Type /XObject /Subtype /Form /BBox [0 0 612 792]"
                  b" /Resources << /Font << /F1 3 0 R >> >>",
        ),
        10: (
            b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
            b" /Resources << /XObject << /Fm0 20 0 R >>"
            b" /Font << /F1 3 0 R >> >> >>"
        ),
        11: _stream_obj(
            b"/Fm0 Do BT /F1 12 Tf 72 600 Td (ab cd) Tj ET",
            flate=False,
        ),
    }
    data = _assemble(objects)
    for _, _, interp in parse_pdf_objects(data):
        assert interp.char_space == 0.0
        assert interp.word_space == 0.0
        assert interp.hscale == 100.0
        assert interp.leading == 0.0
        assert interp.rise == 0.0
        assert interp.render_mode == 0
        # the page text after the form advances with DEFAULT spacing:
        # consecutive glyphs at 12pt differ by width*12 (<= 9.6), with no
        # leaked +9 Tc / +7 Tw; chars are (ch, font, size, x, y, ...)
        xs = sorted(c[3] for c in interp.chars if c[4] == 600.0)
        assert len(xs) == 5, interp.chars
        gaps = [round(b - a, 2) for a, b in zip(xs, xs[1:])]
        assert gaps and all(g < 10 for g in gaps), gaps
