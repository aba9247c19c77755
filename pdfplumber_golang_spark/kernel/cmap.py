"""ToUnicode CMap parsing and CID→Unicode string decoding.

Behavior-parity reimplementation of the reference CMap module
(/root/reference/pkg/pdf/cmap.go — SURVEY §2.4 D1-D5):
  - parse `beginbfchar` pairs and `beginbfrange` triples (contiguous ranges
    AND the array form — the array form is a TODO in the reference at
    cmap.go:189-193; we implement it),
  - bytes→Unicode for 1-byte ASCII / 2-byte UTF-16BE / 4-byte surrogate
    pairs (cmap.go:201-233),
  - 2-byte-pair stream decode with single-byte fallback for odd tails and
    unmapped passthrough (cmap.go:264-301).

Range lookup is vectorization-friendly: sorted range starts + bisect
(np.searchsorted works on batch decode paths).
"""

from __future__ import annotations

import re
from bisect import bisect_right

_HEX = rb"<([0-9A-Fa-f]+)>"
_BFCHAR_RE = re.compile(_HEX + rb"\s*" + _HEX)
_BFRANGE_CONT_RE = re.compile(_HEX + rb"\s*" + _HEX + rb"\s*" + _HEX)
_BFRANGE_ARR_RE = re.compile(
    _HEX + rb"\s*" + _HEX + rb"\s*\[((?:\s*" + _HEX + rb")+)\s*\]"
)
_SECTION_RE = {
    "bfchar": re.compile(rb"beginbfchar(.*?)endbfchar", re.S),
    "bfrange": re.compile(rb"beginbfrange(.*?)endbfrange", re.S),
}


def _hex_to_unicode(h: bytes) -> str:
    """Destination hex -> text: 2-byte UTF-16BE, 4-byte surrogate/UTF-32."""
    raw = bytes.fromhex(h.decode("ascii"))
    if len(raw) == 1:
        return chr(raw[0])
    if len(raw) == 2:
        return raw.decode("utf-16-be", "replace")
    if len(raw) % 2 == 0:
        return raw.decode("utf-16-be", "replace")
    return raw.decode("latin-1")


class CMap:
    """Parsed ToUnicode CMap with direct + range lookups."""

    def __init__(self) -> None:
        self.single: dict[int, str] = {}
        # contiguous ranges: parallel sorted arrays (lo, hi, base_codepoint_str)
        self.range_lo: list[int] = []
        self.range_hi: list[int] = []
        self.range_dst: list[str] = []

    # ---------------------------------------------------------- parsing --
    @classmethod
    def parse(cls, src: bytes) -> "CMap":
        cm = cls()
        for m in _SECTION_RE["bfchar"].finditer(src):
            for code, dst in _BFCHAR_RE.findall(m.group(1)):
                cm.single[int(code, 16)] = _hex_to_unicode(dst)
        ranges: list[tuple[int, int, str]] = []
        for m in _SECTION_RE["bfrange"].finditer(src):
            body = m.group(1)
            # array form first: <lo> <hi> [<d0> <d1> ...]
            consumed_spans = []
            for am in _BFRANGE_ARR_RE.finditer(body):
                lo, hi = int(am.group(1), 16), int(am.group(2), 16)
                dsts = re.findall(_HEX, am.group(3))
                for i, d in enumerate(dsts):
                    if lo + i <= hi:
                        cm.single[lo + i] = _hex_to_unicode(d)
                consumed_spans.append(am.span())
            # mask array-form spans, then contiguous triples
            masked = bytearray(body)
            for s, e in consumed_spans:
                masked[s:e] = b" " * (e - s)
            for lo_h, hi_h, dst_h in _BFRANGE_CONT_RE.findall(bytes(masked)):
                lo, hi = int(lo_h, 16), int(hi_h, 16)
                ranges.append((lo, hi, _hex_to_unicode(dst_h)))
        ranges.sort()
        for lo, hi, dst in ranges:
            cm.range_lo.append(lo)
            cm.range_hi.append(hi)
            cm.range_dst.append(dst)
        return cm

    # ----------------------------------------------------------- lookup --
    def map_cid(self, cid: int) -> str | None:
        hit = self.single.get(cid)
        if hit is not None:
            return hit
        i = bisect_right(self.range_lo, cid) - 1
        if i >= 0 and cid <= self.range_hi[i]:
            dst = self.range_dst[i]
            # offset within a contiguous range shifts the last code point
            off = cid - self.range_lo[i]
            if off == 0:
                return dst
            if dst:
                return dst[:-1] + chr(ord(dst[-1]) + off)
        return None

    def decode(self, raw: bytes) -> str:
        """Decode a 2-byte-CID string; single-byte fallback per byte for
        odd tails / unmapped codes (reference cmap.go:264-301 ordering)."""
        out: list[str] = []
        n = len(raw)
        i = 0
        while i + 1 < n:
            cid = (raw[i] << 8) | raw[i + 1]
            mapped = self.map_cid(cid)
            if mapped is not None:
                out.append(mapped)
            else:
                # fall back: try each byte as a single-byte code
                for b in (raw[i], raw[i + 1]):
                    m1 = self.map_cid(b)
                    out.append(m1 if m1 is not None else chr(b))
            i += 2
        if i < n:  # odd tail
            b = raw[i]
            m1 = self.map_cid(b)
            out.append(m1 if m1 is not None else chr(b))
        return "".join(out)
