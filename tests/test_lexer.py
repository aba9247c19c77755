"""PDF lexer unit tests (escapes, octal, hex strings, names, numbers)."""

from pdfplumber_golang_spark.kernel import lexer as lx


def toks(data: bytes):
    lexer = lx.Lexer(data)
    out = []
    while True:
        t = lexer.next()
        if t.kind == lx.EOF:
            return out
        out.append((t.kind, t.val))


def test_numbers():
    assert toks(b"42 -17 3.14 +2.5 .5") == [
        (lx.NUM, 42), (lx.NUM, -17), (lx.NUM, 3.14), (lx.NUM, 2.5), (lx.NUM, 0.5),
    ]


def test_literal_string_escapes():
    assert toks(rb"(a\(b\)c\\d)") == [(lx.STRING, b"a(b)c\\d")]
    assert toks(rb"(tab\there)") == [(lx.STRING, b"tab\there")]
    assert toks(rb"(\101\102\103)") == [(lx.STRING, b"ABC")]
    assert toks(b"(nested (parens) ok)") == [(lx.STRING, b"nested (parens) ok")]


def test_hex_string_odd_pad():
    assert toks(b"<414243>") == [(lx.STRING, b"ABC")]
    assert toks(b"<41424>") == [(lx.STRING, b"AB@")]  # odd: pad with '0'
    assert toks(b"<41 42 43>") == [(lx.STRING, b"ABC")]  # ws ignored


def test_names_with_hash_escape():
    assert toks(b"/Name /A#20B") == [(lx.NAME, "Name"), (lx.NAME, "A B")]


def test_dict_array_keywords():
    out = toks(b"<< /K [1 2 R] >> stream")
    assert out[0][0] == lx.DICT_OPEN
    assert (lx.KEYWORD, "R") in out
    assert out[-1] == (lx.KEYWORD, "stream")


def test_comment_skipped():
    assert toks(b"% comment\n42") == [(lx.NUM, 42)]


def test_fast_path_differential_vs_fallback():
    """The regex fast path in Lexer.next() must be token-for-token identical
    to the byte-wise fallback readers (property fuzz over token soup)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdfplumber_golang_spark.kernel import lexer as lx

    _never = re.compile(rb"(?!x)x")  # matches nothing -> fallback-only

    def tokens(data: bytes, fast: bool):
        orig = lx._SIMPLE_TOKEN_RE
        if not fast:
            lx._SIMPLE_TOKEN_RE = _never
        try:
            lex = lx.Lexer(data)
            out = []
            for _ in range(300):
                t = lex.next()
                out.append((t.kind, t.val))
                if t.kind == lx.EOF:
                    break
            return out
        finally:
            lx._SIMPLE_TOKEN_RE = orig

    piece = st.sampled_from([
        b"/Name", b"/A#42B", b"/", b"123", b"-4.5", b"+.5", b"5.5.3", b"-",
        b"<< /K 1 >>", b"[1 2 R]", b"(lit (nest) \\) end)", b"<48656C>",
        b"obj", b"endobj", b"stream", b"R", b"true", b"% comment\n",
        b"{", b"}", b">", b"]", b"[", b"\x00", b"e#f", b"a1b",
    ])
    sep = st.sampled_from([b" ", b"\n", b"\r\n", b"\t", b"", b"  "])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(piece, sep), min_size=0, max_size=12))
    def check(parts):
        data = b"".join(p + s for p, s in parts)
        assert tokens(data, True) == tokens(data, False), data

    check()
