"""Encrypted PDFs: standard security handler R2/V1 (RC4-40).

The reference opens encrypted files via pdfcpu's OpenWithPassword
(document.go:27-67); we implement the public spec algorithms directly."""

import pytest

from pdfplumber_golang_spark import spec
from pdfplumber_golang_spark.kernel import crypt
from pdfplumber_golang_spark.kernel.extract import extract_document
from pdfplumber_golang_spark.kernel.pdfparse import PDFDocument, PDFError
from pdfplumber_golang_spark.kernel.pdfwrite import build_pdf

TEXT = ("encrypted body text for the round trip check " * 4).strip()


def test_rc4_symmetry():
    key = b"\x01\x02\x03\x04\x05"
    data = b"some plaintext \x00\xff bytes"
    assert crypt.rc4(key, crypt.rc4(key, data)) == data


def test_encrypted_roundtrip_empty_user_password():
    data, golden = build_pdf(23, TEXT, "pdf_encrypted")
    assert b"/Encrypt" in data
    # content must actually be encrypted (plaintext absent)
    assert b"(encrypted body" not in data and b"Tj" not in data.split(b"stream")[1][:200]
    doc = PDFDocument(data)  # empty user password
    pages, err = extract_document("u", data)
    assert err is None
    assert "\n".join(p.text for p in pages) == golden == spec.pdf_golden(TEXT)


def test_encrypted_metadata_strings_decrypt():
    data, _ = build_pdf(23, TEXT, "pdf_encrypted")
    meta = PDFDocument(data).metadata()
    assert meta["Title"] == "doc 23"
    assert meta["Author"] == "host23.example"


def test_wrong_password_rejected():
    data, _ = build_pdf(23, TEXT, "pdf_encrypted")
    with pytest.raises(PDFError, match="wrong password"):
        PDFDocument(data, password=b"not-the-password")


def test_extract_document_routes_unreadable_encryption_to_error():
    # unsupported revision -> error row, never a crash
    data, _ = build_pdf(23, TEXT, "pdf_encrypted")
    broken = data.replace(b"/R 2", b"/R 4")
    pages, err = extract_document("u", broken)
    assert pages == [] and err is not None and "unsupported encryption" in err
