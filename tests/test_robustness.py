"""Adversarial-input robustness: the kernel must never raise out of
extract_document — malformed inputs become error rows (executor safety at
10^12 docs is non-negotiable). Property-based via hypothesis."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfplumber_golang_spark.kernel.extract import extract_document
from pdfplumber_golang_spark.kernel.pdfwrite import build_pdf

BASE_PDF, _ = build_pdf(3, "some sample body text for fuzzing " * 6, "pdf_plain")
BASE_FLATE, _ = build_pdf(3, "compressed body text " * 8, "pdf_flate")
BASE_XREFSTM, _ = build_pdf(3, "xref stream body " * 8, "pdf_xrefstream")
BASE_ENC, _ = build_pdf(3, "encrypted body " * 8, "pdf_encrypted")


@settings(max_examples=120, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
    prefix=st.sampled_from([b"", b"%PDF-", b"%PDF-1.4\n", b"<html>", b"\x00\xff"]),
)
def test_arbitrary_bytes_never_crash(data, prefix):
    pages, err = extract_document("u", prefix + data)
    assert (pages == [] and err is not None) or err is None


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=len(BASE_PDF) - 1),
    byte=st.integers(min_value=0, max_value=255),
)
def test_single_byte_corruption_never_crashes(pos, byte):
    corrupted = BASE_PDF[:pos] + bytes([byte]) + BASE_PDF[pos + 1 :]
    pages, err = extract_document("u", corrupted)
    # either parses (possibly different text) or reports an error row
    assert isinstance(pages, list)
    if err is None:
        for p in pages:
            assert isinstance(p.text, str)


@settings(max_examples=60, deadline=None)
@given(cut=st.integers(min_value=0, max_value=len(BASE_FLATE)))
def test_truncation_never_crashes(cut):
    pages, err = extract_document("u", BASE_FLATE[:cut])
    assert isinstance(pages, list)


@settings(max_examples=80, deadline=None)
@given(
    base=st.sampled_from(["xrefstm", "enc"]),
    pos=st.integers(min_value=0, max_value=900),
    byte=st.integers(min_value=0, max_value=255),
)
def test_modern_variant_corruption_never_crashes(base, pos, byte):
    """xref-stream and encrypted files: corruption in predictors, object
    streams, or crypto material must become error rows, never crashes."""
    data = BASE_XREFSTM if base == "xrefstm" else BASE_ENC
    pos = pos % len(data)
    corrupted = data[:pos] + bytes([byte]) + data[pos + 1 :]
    pages, err = extract_document("u", corrupted)
    assert isinstance(pages, list)
    if err is None:
        for p in pages:
            assert isinstance(p.text, str)


def test_pathological_structures():
    # cyclic indirect reference: resolve() depth cap
    from pdfplumber_golang_spark.kernel.pdfwrite import _assemble

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"2 0 R",  # self-referential object
    }
    pages, err = extract_document("u", _assemble(objects))
    assert err is not None
    # page tree cycle: Pages node listing itself as kid -> depth cap
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>",
    }
    pages, err = extract_document("u", _assemble(objects))
    assert err is not None
    # enormous TJ kern array must not blow up
    body = b"BT /F1 12 Tf [" + b"(x) 5 " * 5000 + b"] TJ ET"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792]"
           b" /Resources << /Font << /F1 4 0 R >> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        5: b"<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream",
    }
    pages, err = extract_document("u", _assemble(objects))
    assert err is None and pages[0].n_chars == 5000


def test_inline_image_embedded_ei_bytes():
    """'EI' inside unencoded inline-image data must not terminate the skip
    (ADVICE r1: require whitespace delimiters around the EI keyword)."""
    from pdfplumber_golang_spark.kernel import content as C
    from pdfplumber_golang_spark.kernel import lexer as lx

    # image payload contains a bare 'EI' with no surrounding whitespace;
    # the real terminator follows. After it, a Tj must still be parsed.
    stream = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (before) Tj ET\n"
        b"BI /W 2 /H 2 /BPC 8 ID xxEIyy(fake) Tj\x00\xffzz EI\n"
        b"BT /F1 12 Tf 1 0 0 1 72 680 Tm (after) Tj ET\n"
    )
    f1 = C.Font(name="F1", base="Helvetica", cmap=None, two_byte=False)
    interp = C.Interpreter(fonts={"F1": f1})
    interp.run(stream)
    got = "".join(c[0] for c in interp.chars)
    # old behavior resumed at the embedded 'EI' and emitted 'fake'
    assert got == "beforeafter"


def test_inline_image_data_abutting_ei_recovers():
    """ISO 32000 does not require whitespace before EI; when no delimited
    terminator exists at all, fall back to the first bare 'EI' instead of
    discarding the rest of the stream."""
    from pdfplumber_golang_spark.kernel import content as C

    f1 = C.Font(name="F1", base="H", cmap=None, two_byte=False)
    interp = C.Interpreter(fonts={"F1": f1})
    interp.run(
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (before) Tj ET\n"
        b"BI /W 2 /H 2 /BPC 8 ID \x00\x01\x02\x03EI\n"  # data abuts EI
        b"BT /F1 12 Tf 1 0 0 1 72 680 Tm (after) Tj ET\n"
    )
    got = "".join(c[0] for c in interp.chars)
    assert "before" in got and "after" in got


def test_new_fixture_families_survive_corruption():
    """The round-3 kernel surfaces (image/annot/form PDFs, inline images)
    obey the executor-safety contract: corrupted or truncated inputs
    return an error or degrade, never raise out of extract_document."""
    import random

    from pdfplumber_golang_spark.kernel.extract import extract_document
    from pdfplumber_golang_spark.kernel.pdfwrite import (
        build_annot_pdf, build_form_pdf, build_image_pdf,
    )

    rng = random.Random(5)
    for builder in (build_image_pdf, build_annot_pdf, build_form_pdf):
        base = builder(7)
        for _ in range(40):
            buf = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            pages, err = extract_document("u", bytes(buf))
            assert isinstance(pages, list)  # never raises
        for cut in (10, len(base) // 2, len(base) - 3):
            pages, err = extract_document("u", base[:cut])
            assert isinstance(pages, list)


def test_dangling_xobject_and_annot_refs():
    """References to missing XObjects//Annots objects degrade to empty
    relations, not errors."""
    from pdfplumber_golang_spark.kernel.extract import (
        extract_document, parse_pdf_objects,
    )
    from pdfplumber_golang_spark.kernel.pdfwrite import (
        _FONT_SIMPLE, _assemble, _stream_obj,
    )

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R] /Count 1"
           b" /MediaBox [0 0 612 792] >>",
        3: _FONT_SIMPLE,
        10: b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R"
            b" /Resources << /Font << /F1 3 0 R >>"
            b" /XObject << /Im0 77 0 R /Fm0 88 0 R >> >>"
            b" /Annots [99 0 R] >>",
        11: _stream_obj(
            b"/Im0 Do /Fm0 Do BT /F1 12 Tf 72 700 Td (ok) Tj ET",
            flate=False,
        ),
    }
    data = _assemble(objects)
    pages, err = extract_document("u", data)
    assert err is None and "ok" in pages[0].text
    for _, _, interp in parse_pdf_objects(data):
        assert interp.images == []


@given(
    w=st.integers(min_value=1, max_value=80),
    h=st.integers(min_value=1, max_value=60),
)
@settings(max_examples=40, deadline=None)
def test_codec_roundtrips_exact_at_any_dims(w, h):
    """r5: all three fixture codecs must roundtrip EXACTLY at arbitrary
    dimensions — PNG through inflate+unfilter, JPEG through
    Huffman+IDCT, GIF through LZW+color table — including edge-cropped
    MCU grids and single-pixel images."""
    from pdfplumber_golang_spark.functions import multimodal as mm

    W, H, _b, px = mm.decode_png_pixels(mm.png_bytes(w, h))
    assert (W, H) == (w, h)
    assert px == bytes((x * 7 + y) % 256 for y in range(h) for x in range(w))

    W, H, _b, px = mm.decode_jpeg_pixels(mm.jpeg_bytes(w, h))
    assert (W, H) == (w, h)
    bw = (w + 7) // 8
    assert px == bytes(
        129 if ((y // 8) * bw + x // 8) % 2 == 0 else 128
        for y in range(h)
        for x in range(w)
    )

    W, H, _b, px = mm.decode_gif_pixels(mm.gif_bytes(w, h))
    assert (W, H) == (w, h)
    assert px == bytes((x * 5 + y * 3) % 256 for y in range(h) for x in range(w))


@given(data=st.binary(min_size=0, max_size=300))
@settings(max_examples=80, deadline=None)
def test_pixel_decoders_never_crash_on_arbitrary_bytes(data):
    """Arbitrary bytes into any pixel decoder: ValueError or a valid
    decode, never another exception type."""
    from pdfplumber_golang_spark.functions import multimodal as mm

    for fn in (mm.decode_png_pixels, mm.decode_jpeg_pixels,
               mm.decode_gif_pixels, mm.decode_pixels):
        try:
            fn(data)
        except ValueError:
            pass
