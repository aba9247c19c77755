"""PDF byte lexer (file-level and content-stream-level tokens).

From-scratch tokenizer for the PDF object syntax: numbers, literal strings
with escapes + octal, hex strings, /names with #xx, arrays, dicts, keywords
and indirect-reference `R` tokens, with one-token pushback.

Behavioral parity target: the reference's typed lexers
(/root/reference/pkg/parser/lexer.go:91-443 file-level and
/root/reference/pkg/content/extractor.go:709-972 content-level — SURVEY §2.2
L1/L3; the typed L3 semantics are the canonical ones). Implementation is
original Python over a memoryview.
"""

from __future__ import annotations

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMS = b"()<>[]{}/%"

# token kinds
NUM = "num"
NAME = "name"
STRING = "str"     # literal or hex string -> value is bytes
KEYWORD = "kw"     # obj endobj stream R true false null xref trailer ... or
                   # any content-stream operator (Tj, TJ, BT, ...)
ARRAY_OPEN, ARRAY_CLOSE = "[", "]"
DICT_OPEN, DICT_CLOSE = "<<", ">>"
EOF = "eof"

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


class Token:
    __slots__ = ("kind", "val")

    def __init__(self, kind: str, val=None):
        self.kind = kind
        self.val = val

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Token({self.kind},{self.val!r})"


EOF_TOKEN = Token(EOF)

import re as _re2

#: fast path for Lexer.next(): one C-level match covering the token kinds
#: that dominate structure parsing (names without #-escapes, numbers,
#: dict/array delimiters, keywords). Strings, hex strings, comments, '>'
#: singletons and #-escaped names fall back to the byte-wise readers —
#: identical semantics, the regex only accelerates the common cases.
#: Name requires a proper terminator (delimiter/ws/EOF) so '/A#42' falls
#: back to the full reader; keyword may contain '#' (matching
#: _read_keyword, which only stops at ws/delims).
_SIMPLE_TOKEN_RE = _re2.compile(
    rb"[\x00\t\n\x0c\r ]*"
    rb"(?:(?P<dopen><<)|(?P<dclose>>>)|(?P<aopen>\[)|(?P<aclose>\])"
    rb"|/(?P<name>[^\x00\t\n\x0c\r ()<>\[\]{}/%#]*)"
    rb"(?=[\x00\t\n\x0c\r ()<>\[\]{}/%]|\Z)"
    rb"|(?P<num>[-+]?[0-9.]+)"
    rb"|(?P<kw>[^\x00\t\n\x0c\r ()<>\[\]{}/%0-9+.-][^\x00\t\n\x0c\r ()<>\[\]{}/%]*))"
)

_DOPEN_TOKEN = Token(DICT_OPEN)
_DCLOSE_TOKEN = Token(DICT_CLOSE)
_AOPEN_TOKEN = Token(ARRAY_OPEN)
_ACLOSE_TOKEN = Token(ARRAY_CLOSE)


class Lexer:
    __slots__ = ("data", "pos", "_pushback")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self._pushback: Token | None = None

    # ------------------------------------------------------------------
    def push_back(self, tok: Token) -> None:
        assert self._pushback is None
        self._pushback = tok

    def _skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        i = self.pos
        while i < n:
            c = data[i]
            if c in WHITESPACE:
                i += 1
            elif c == 0x25:  # '%' comment to EOL
                while i < n and data[i] not in b"\r\n":
                    i += 1
            else:
                break
        self.pos = i

    # ------------------------------------------------------------------
    def next(self) -> Token:
        if self._pushback is not None:
            t, self._pushback = self._pushback, None
            return t
        m = _SIMPLE_TOKEN_RE.match(self.data, self.pos)
        if m is not None:
            g = m.lastgroup
            self.pos = m.end()
            if g == "name":
                return Token(NAME, m.group("name").decode("latin-1"))
            if g == "num":
                raw = m.group("num")
                try:
                    return Token(NUM, float(raw) if b"." in raw else int(raw))
                except ValueError:  # malformed number soup ('5.5.3', '..')
                    return Token(NUM, 0)
            if g == "kw":
                return Token(KEYWORD, m.group("kw").decode("latin-1"))
            if g == "dopen":
                return _DOPEN_TOKEN
            if g == "dclose":
                return _DCLOSE_TOKEN
            if g == "aopen":
                return _AOPEN_TOKEN
            return _ACLOSE_TOKEN
        self._skip_ws()
        data, n = self.data, len(self.data)
        i = self.pos
        if i >= n:
            return EOF_TOKEN
        c = data[i]
        if c == 0x2F:  # '/'
            return self._read_name()
        if c == 0x28:  # '('
            return self._read_literal_string()
        if c == 0x3C:  # '<'
            if i + 1 < n and data[i + 1] == 0x3C:
                self.pos = i + 2
                return Token(DICT_OPEN)
            return self._read_hex_string()
        if c == 0x3E:  # '>'
            if i + 1 < n and data[i + 1] == 0x3E:
                self.pos = i + 2
                return Token(DICT_CLOSE)
            self.pos = i + 1
            return Token(KEYWORD, ">")
        if c == 0x5B:
            self.pos = i + 1
            return Token(ARRAY_OPEN)
        if c == 0x5D:
            self.pos = i + 1
            return Token(ARRAY_CLOSE)
        if c == 0x7B:
            self.pos = i + 1
            return Token(KEYWORD, "{")
        if c == 0x7D:
            self.pos = i + 1
            return Token(KEYWORD, "}")
        if (0x30 <= c <= 0x39) or c in (0x2B, 0x2D, 0x2E):  # digit + - .
            return self._read_number()
        return self._read_keyword()

    # ------------------------------------------------------------------
    def _read_name(self) -> Token:
        data, n = self.data, len(self.data)
        i = self.pos + 1
        out = bytearray()
        while i < n:
            c = data[i]
            if c in WHITESPACE or c in DELIMS:
                break
            if c == 0x23 and i + 2 < n:  # '#xx' hex escape
                try:
                    out.append(int(data[i + 1 : i + 3], 16))
                    i += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            i += 1
        self.pos = i
        return Token(NAME, out.decode("latin-1"))

    def _read_number(self) -> Token:
        data, n = self.data, len(self.data)
        i = self.pos
        j = i
        if data[j] in (0x2B, 0x2D):
            j += 1
        isfloat = False
        while j < n and ((0x30 <= data[j] <= 0x39) or data[j] == 0x2E):
            if data[j] == 0x2E:
                isfloat = True
            j += 1
        raw = data[i:j]
        self.pos = j
        try:
            return Token(NUM, float(raw) if isfloat else int(raw))
        except ValueError:  # malformed number soup ('5.5.3', '..')
            return Token(NUM, 0)

    def _read_literal_string(self) -> Token:
        data, n = self.data, len(self.data)
        i = self.pos + 1
        depth = 1
        out = bytearray()
        while i < n:
            c = data[i]
            if c == 0x5C:  # backslash
                if i + 1 >= n:
                    break
                e = data[i + 1]
                if e in _ESCAPES:
                    out += _ESCAPES[e]
                    i += 2
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    j = i + 1
                    val = 0
                    while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                        val = val * 8 + (data[j] - 0x30)
                        j += 1
                    out.append(val & 0xFF)
                    i = j
                elif e in (0x0A, 0x0D):  # line continuation
                    i += 2
                    if e == 0x0D and i < n and data[i] == 0x0A:
                        i += 1
                else:
                    out.append(e)
                    i += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return Token(STRING, bytes(out))

    def _read_hex_string(self) -> Token:
        data, n = self.data, len(self.data)
        i = self.pos + 1
        hexdigits = bytearray()
        while i < n and data[i] != 0x3E:
            c = data[i]
            if (
                0x30 <= c <= 0x39
                or 0x41 <= c <= 0x46
                or 0x61 <= c <= 0x66
            ):
                hexdigits.append(c)
            i += 1
        self.pos = min(i + 1, n)
        if len(hexdigits) % 2:
            hexdigits.append(0x30)  # odd length: pad with '0'
        return Token(STRING, bytes.fromhex(hexdigits.decode("ascii")))

    def _read_keyword(self) -> Token:
        data, n = self.data, len(self.data)
        i = self.pos
        j = i
        while j < n and data[j] not in WHITESPACE and data[j] not in DELIMS:
            j += 1
        if j == i:  # lone delimiter we don't handle: consume one byte
            j = i + 1
        self.pos = j
        return Token(KEYWORD, data[i:j].decode("latin-1"))


import re as _re

#: one C-level scan per content stream: numbers, names, hex strings, simple
#: literal strings (no escapes/nesting), array/dict delimiters, operators.
#: Complex literal strings fall back to the stateful Lexer.
_CONTENT_RE = _re.compile(
    rb"(?P<num>[-+]?(?:\d+\.?\d*|\.\d+))"
    rb"|/(?P<name>[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<sstr>\([^()\\]*\))"
    rb"|<(?P<hex>[0-9A-Fa-f \t\r\n]*)>"
    rb"|(?P<delim><<|>>|[\[\]{}])"
    rb"|(?P<op>[A-Za-z'\"][A-Za-z0-9'\"*]*)"
    rb"|(?P<comment>%[^\r\n]*)"
    rb"|(?P<ws>[\x00\t\n\x0c\r ]+)"
    rb"|(?P<other>.)",
    _re.S,
)


def content_tokens(data: bytes):
    """Fast content-stream token generator (same token vocabulary as
    Lexer.next, ~2x less Python overhead). Yields (kind, value)."""
    pos = 0
    n = len(data)
    scanner = _CONTENT_RE.finditer(data)
    for m in scanner:
        if m.start() < pos:
            continue  # region consumed by a slow-path Lexer excursion
        g = m.lastgroup
        if g == "ws" or g == "comment":
            continue
        if g == "num":
            raw = m.group("num")
            if b"." in raw:
                yield NUM, float(raw)
            else:
                try:
                    yield NUM, int(raw)
                except ValueError:
                    yield NUM, 0
            continue
        if g == "op":
            yield KEYWORD, m.group("op").decode("latin-1")
            continue
        if g == "name":
            raw = m.group("name")
            if b"#" in raw:  # rare: defer to the full name reader
                lex = Lexer(data, m.start())
                t = lex.next()
                yield t.kind, t.val
                pos = lex.pos
                continue
            yield NAME, raw.decode("latin-1")
            continue
        if g == "sstr":
            yield STRING, m.group("sstr")[1:-1]
            continue
        if g == "hex":
            h = bytes(
                c for c in m.group("hex")
                if c not in b" \t\r\n"
            )
            if len(h) % 2:
                h += b"0"
            yield STRING, bytes.fromhex(h.decode("ascii"))
            continue
        if g == "delim":
            d = m.group("delim")
            if d == b"[":
                yield ARRAY_OPEN, None
            elif d == b"]":
                yield ARRAY_CLOSE, None
            elif d == b"<<":
                yield DICT_OPEN, None
            elif d == b">>":
                yield DICT_CLOSE, None
            else:
                yield KEYWORD, d.decode("latin-1")
            continue
        # 'other': complex literal string or stray byte -> stateful Lexer
        if data[m.start()] == 0x28:  # '('
            lex = Lexer(data, m.start())
            t = lex.next()
            yield t.kind, t.val
            pos = lex.pos
            continue
        # stray delimiter byte: emit as keyword (parity with Lexer)
        yield KEYWORD, data[m.start() : m.start() + 1].decode("latin-1")


