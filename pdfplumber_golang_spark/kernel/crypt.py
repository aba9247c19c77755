"""PDF standard security handler (R2/V1, RC4-40) — encrypt + decrypt.

Public algorithms from the PDF spec (ISO 32000-1 §7.6.3; same scheme the
reference reaches via pdfcpu's OpenWithPassword, SURVEY §2.1 S2):
  Alg 2  file key = MD5(padded_pw + O + P_le32 + ID0)[:5]
  Alg 3  O value  = RC4(padded_user_pw, MD5(padded_owner_pw)[:5])
  Alg 4  U value  = RC4(PAD, file_key)            (R = 2)
  Alg 1  per-object key = MD5(key + num_le24 + gen_le16)[:min(len+5, 16)]

RC4 is implemented inline (stdlib has none); fine for small metadata and
content streams.
"""

from __future__ import annotations

import hashlib
import struct

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def owner_value(owner_pw: bytes, user_pw: bytes) -> bytes:
    """Alg 3 (R=2): O = RC4(padded user pw, MD5(padded owner pw)[:5])."""
    key = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()[:5]
    return rc4(key, _pad_pw(user_pw))


def file_key(user_pw: bytes, o_value: bytes, p: int, id0: bytes) -> bytes:
    """Alg 2 (R=2, 40-bit)."""
    m = hashlib.md5()
    m.update(_pad_pw(user_pw))
    m.update(o_value)
    m.update(struct.pack("<i", p))
    m.update(id0)
    return m.digest()[:5]


def user_value(key: bytes) -> bytes:
    """Alg 4 (R=2): U = RC4(PAD, key)."""
    return rc4(key, PAD)


def object_key(key: bytes, num: int, gen: int) -> bytes:
    """Alg 1 per-object key."""
    m = hashlib.md5()
    m.update(key)
    m.update(struct.pack("<I", num)[:3])
    m.update(struct.pack("<I", gen)[:2])
    return m.digest()[: min(len(key) + 5, 16)]


def crypt_object_bytes(key: bytes, num: int, gen: int, data: bytes) -> bytes:
    """RC4 is symmetric: same call encrypts and decrypts."""
    return rc4(object_key(key, num, gen), data)
