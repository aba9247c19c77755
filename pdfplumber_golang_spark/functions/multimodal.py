"""Multimodal column plumbing: opaque binary media + typed metadata.

The Spark-side shape is the production pattern: a pruned ``(url, data:
binary)`` projection into ONE Arrow ``mapInPandas`` stage that emits typed
feature columns — no per-row Python UDFs, no payload shuffle (the stage is
scan-aligned).

The codec layer is a REAL pure-Python container-header parser (PNG IHDR,
JPEG SOFn, GIF logical-screen descriptor, BMP DIB header): media type and
pixel dimensions are read from the actual bytes, no image library needed.
Pixel-level decode (which WOULD need PIL/libvips — absent from this
container) is still marked by ``decode_pixels``; everything the oracle
checks is parsed for real.

Correctness: the synthetic media table builds structurally-valid PNG / GIF
/ JPEG files deterministically from ``doc_id`` (PNG uses a hand-rolled
stored-block zlib stream so the file length is closed-form), which lets the
DuckDB oracle state expected type, dimensions, and byte count in plain SQL
— a genuine end-to-end check that the parser reads the right header fields.
"""

from __future__ import annotations

import os
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import spec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

# deterministic synthetic dimensions (shared with the oracle SQL)
_W_MOD, _H_MOD = 64, 48


# ---------------------------------------------------------------------------
# real header parsers (pure Python, no image libraries)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers carrying dimensions (all SOFn except the
# DHT/JPG/DAC pseudo-markers C4/C8/CC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image(data: bytes) -> tuple[str, int | None, int | None]:
    """(media_type, width, height) from container headers; unknown or
    truncated input degrades to ('application/octet-stream', None, None)."""
    try:
        if data[:8] == _PNG_SIG and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            return "image/png", w, h
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return "image/gif", w, h
        if data[:2] == b"\xff\xd8":
            pos = 2
            while pos + 9 <= len(data):
                if data[pos] != 0xFF:
                    break
                marker = data[pos + 1]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                    return "image/jpeg", w, h
                if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                    pos += 2  # standalone marker, no length field
                    continue
                (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
                pos += 2 + seglen
            return "image/jpeg", None, None
        if data[:2] == b"BM" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return "image/bmp", w, abs(h)  # negative h = top-down DIB
    except (struct.error, IndexError):
        pass
    return "application/octet-stream", None, None


def decode_pixels(data: bytes):  # pragma: no cover - integration stub
    """Pixel-level decode hook (PIL/libvips at deployment). Header metadata
    above is fully parsed without it."""
    raise NotImplementedError("pixel codec not available in this container")


# ---------------------------------------------------------------------------
# deterministic synthetic media payloads (builders double as test fixtures)
# ---------------------------------------------------------------------------


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload))
    )


def png_bytes(width: int, height: int) -> bytes:
    """Valid 8-bit grayscale PNG with a hand-rolled STORED-block zlib
    stream, so total length is closed-form: 68 + height*(width+1)."""
    raw = b"".join(b"\x00" + bytes((x * 7 + y) % 256 for x in range(width))
                   for y in range(height))
    blocks = []
    for off in range(0, len(raw), 0xFFFF) or [0]:
        chunk = raw[off : off + 0xFFFF]
        final = off + 0xFFFF >= len(raw)
        blocks.append(
            (b"\x01" if final else b"\x00")  # BFINAL flag, BTYPE=stored
            + struct.pack("<HH", len(chunk), len(chunk) ^ 0xFFFF)
            + chunk
        )
    idat = (
        b"\x78\x01"  # zlib header
        + b"".join(blocks)
        + struct.pack(">I", zlib.adler32(raw))
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def gif_bytes(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor (no color table) +
    trailer: always 14 bytes."""
    return b"GIF89a" + struct.pack("<HHBBB", width, height, 0, 0, 0) + b"\x3b"


def jpeg_bytes(width: int, height: int) -> bytes:
    """SOI + APP0/JFIF + SOF0(1 component) + EOI: always 33 bytes."""
    app0 = b"\xff\xe0" + struct.pack(">H", 14) + b"JFIF\x00" + bytes(
        (1, 1, 0, 0, 1, 0, 1)
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes(
        (1, 0x11, 0)
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


PNG_N_BYTES = "68 + (1 + doc_id % 48) * (2 + doc_id % 64)"
GIF_N_BYTES = "14"
JPEG_N_BYTES = "33"


def build_media(doc_id: int) -> bytes:
    """Deterministic payload: format rotates by doc_id % 3, dims are
    1+doc_id%64 x 1+doc_id%48 (the oracle states both in closed form)."""
    w, h = 1 + doc_id % _W_MOD, 1 + doc_id % _H_MOD
    k = doc_id % 3
    if k == 0:
        return png_bytes(w, h)
    if k == 1:
        return gif_bytes(w, h)
    return jpeg_bytes(w, h)


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def media_features(media: DataFrame) -> DataFrame:
    """(url, data:binary) → typed metadata via one Arrow mapInPandas stage
    with the input pruned to exactly the two consumed columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("url", "media_type", "n_bytes", "width", "height")}
            for url, data in zip(pdf["url"], pdf["data"]):
                raw = bytes(data)
                mt, w, h = parse_image(raw)
                out["url"].append(url)
                out["media_type"].append(mt)
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return media.select("url", "data").mapInPandas(batches, schema=MEDIA_SCHEMA)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table: one structurally-valid image per document,
    built in the same scan-aligned pattern a binary ingest column has."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "data": [build_media(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select(
        "doc_id", F.expr(spec.SQL_URL).alias("url")
    ).mapInPandas(build, schema=schema)


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_features(media_table(spark, sf_dir))


def media_features_oracle() -> str:
    """Expected header metadata in closed form (the payload builders are
    deterministic in doc_id, PNG length via the stored-block zlib layout)."""
    return f"""
SELECT {spec.SQL_URL} AS url,
       CASE doc_id % 3 WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'image/gif'
                       ELSE 'image/jpeg' END AS media_type,
       CAST(CASE doc_id % 3 WHEN 0 THEN {PNG_N_BYTES}
                            WHEN 1 THEN {GIF_N_BYTES}
                            ELSE {JPEG_N_BYTES} END AS BIGINT) AS n_bytes,
       CAST(1 + doc_id % {_W_MOD} AS BIGINT) AS width,
       CAST(1 + doc_id % {_H_MOD} AS BIGINT) AS height
FROM documents
"""
