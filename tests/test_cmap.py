"""CMap decoder unit vectors.

Table-driven tests with the same coverage shapes as the reference's
/root/reference/pkg/pdf/cmap_test.go:20-226,307-366 (bfchar incl. Hangul +
UTF-16 forms, bfrange contiguous/array/multiple, 2-byte decode with
single-byte fallback and unmapped passthrough, odd-byte tails)."""

from pdfplumber_golang_spark.kernel.cmap import CMap

BFCHAR_SRC = b"""
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
4 beginbfchar
<0001> <0041>
<0002> <0042>
<0003> <AC00>
<0004> <D55C>
endbfchar
endcmap
"""


def test_bfchar_basic_and_hangul():
    cm = CMap.parse(BFCHAR_SRC)
    assert cm.map_cid(1) == "A"
    assert cm.map_cid(2) == "B"
    assert cm.map_cid(3) == "가"  # Hangul GA
    assert cm.map_cid(4) == "한"  # Hangul HAN
    assert cm.map_cid(5) is None


BFRANGE_SRC = b"""
begincmap
2 beginbfrange
<0010> <001F> <0061>
<0100> <0102> [<0058> <0059> <005A>]
endbfrange
endcmap
"""


def test_bfrange_contiguous():
    cm = CMap.parse(BFRANGE_SRC)
    assert cm.map_cid(0x10) == "a"
    assert cm.map_cid(0x15) == "f"
    assert cm.map_cid(0x1F) == "p"
    assert cm.map_cid(0x20) is None


def test_bfrange_array_form():
    # array form is a TODO in the reference (cmap.go:189-193); we support it
    cm = CMap.parse(BFRANGE_SRC)
    assert cm.map_cid(0x100) == "X"
    assert cm.map_cid(0x101) == "Y"
    assert cm.map_cid(0x102) == "Z"


def test_decode_two_byte_with_fallback():
    cm = CMap.parse(BFCHAR_SRC)
    # <0001><0002> -> "AB"
    assert cm.decode(bytes.fromhex("00010002")) == "AB"
    # unmapped 2-byte code 0x4142 -> falls back per byte -> chr(0x41)+chr(0x42)
    assert cm.decode(bytes.fromhex("4142")) == "AB"
    # odd tail: trailing byte passes through
    assert cm.decode(bytes.fromhex("000141")) == "A" + "A"


def test_decode_empty_and_unmapped_passthrough():
    cm = CMap.parse(b"begincmap endcmap")
    assert cm.decode(b"") == ""
    assert cm.decode(bytes.fromhex("0041")) == "\x00A"  # per-byte fallback
