"""Table detection/extraction tests (SURVEY §2.7) — structural checks in the
style of the reference's table_test.go:111-150 plus exact goldens."""

from pdfplumber_golang_spark.kernel.extract import parse_pdf_objects
from pdfplumber_golang_spark.kernel.pdfwrite import build_pdf, grid_cell_text
from pdfplumber_golang_spark.kernel.tables import extract_tables


def _graphics_objects(doc_id=6, text="some body text for the page " * 8):
    data, _ = build_pdf(doc_id, text.strip(), "pdf_graphics")
    [(_, _, interp)] = list(parse_pdf_objects(data))
    return interp


def test_lattice_exact_cells():
    interp = _graphics_objects()
    tabs = extract_tables(interp.chars, interp.edges, interp.rects)
    assert len(tabs) == 1
    rows = tabs[0]["rows"]
    # rows ascend in PDF y (bottom-to-top): row i holds writer row 2-i
    want = [[grid_cell_text(6, 2 - i, j) for j in range(3)] for i in range(3)]
    assert rows == want


def test_table_structural_invariants():
    interp = _graphics_objects(doc_id=46)
    tabs = extract_tables(interp.chars, interp.edges, interp.rects)
    for t in tabs:
        assert t["rows"], "table must have rows"
        ncols = {len(r) for r in t["rows"]}
        assert len(ncols) == 1, "consistent column count"
        x0, y0, x1, y1 = t["bbox"]
        assert x0 < x1 and y0 < y1


def test_rect_edges_expansion_forms_lattice():
    # a table drawn as 9 filled cell rects (no ruling lines) must still be
    # found via T3 rect->edge expansion
    rects = []
    for r in range(3):
        for c in range(3):
            x0 = 72 + c * 28.0
            y1 = 400 - r * 24.0
            rects.append((x0, y1 - 24.0, x0 + 28.0, y1, 1.0, True, False))
    tabs = extract_tables([], [], rects)
    assert len(tabs) == 1
    assert len(tabs[0]["rows"]) == 3 and len(tabs[0]["rows"][0]) == 3


def test_text_based_fallback():
    # no edges at all; words aligned in 3 columns x 4 lines -> T12 path
    chars = []
    for ln in range(4):
        y = 700.0 - 12 * ln
        for col, cx in enumerate((72.0, 150.0, 228.0)):
            word = f"w{ln}{col}"
            for k, ch in enumerate(word):
                x = cx + 6.0 * k
                chars.append((ch, "F1", 12.0, x, y, x + 6.0, y + 12.0, 6.0, 12.0))
    tabs = extract_tables(chars, [], [])
    assert len(tabs) == 1
    rows = tabs[0]["rows"]
    assert len(rows) == 4 and all(len(r) == 3 for r in rows)
    assert rows[0] == ["w00", "w01", "w02"]


def test_no_table_when_nothing_aligned():
    chars = [("a", "F1", 12.0, 72.0, 700.0, 78.0, 712.0, 6.0, 12.0)]
    assert extract_tables(chars, [], []) == []


def test_option_matrix():
    """Mirror of the reference's option matrix (table_test.go:50-109 via
    WithTableStrategy / WithMinTableSize / WithTextTolerance), with concrete
    assertions instead of t.Logf."""
    interp = _graphics_objects()
    lat = extract_tables(interp.chars, interp.edges, interp.rects)
    assert len(lat) == 1 and len(lat[0]["rows"]) == 3

    # ("text", "text") skips the line pass entirely (ExtractTables,
    # table_extractor.go:55-61) -> T12 over ALL words, not the ruled grid
    txt = extract_tables(
        interp.chars, interp.edges, interp.rects,
        vertical_strategy="text", horizontal_strategy="text",
    )
    assert txt != lat

    # min_table_size above the grid's 3 rows rejects the lattice
    # (rows >= minTableSize gate, table_extractor.go:118)
    big = extract_tables(
        interp.chars, interp.edges, interp.rects, min_table_size=4
    )
    assert all(len(t["rows"]) >= 4 for t in big)
    assert lat[0] not in big

    # a text_tolerance comfortably above the grid jitter changes nothing
    # (cells are single-line)
    tol = extract_tables(
        interp.chars, interp.edges, interp.rects, text_tolerance=5.0
    )
    assert tol == lat

    # a coarse snap merges the 24pt-spaced rulings -> lattice degenerates
    coarse = extract_tables(
        interp.chars, interp.edges, interp.rects, snap_tolerance=30.0
    )
    assert coarse != lat

    # join_tolerance is accepted (dead in the reference too) and inert
    jt = extract_tables(
        interp.chars, interp.edges, interp.rects, join_tolerance=99.0
    )
    assert jt == lat


def test_api_page_extract_tables_kwargs():
    from pdfplumber_golang_spark import api

    data, _ = build_pdf(6, "some body text for the page " * 8, "pdf_graphics")
    doc = api.open_bytes(data)
    page = doc.pages[0]
    assert page.extract_tables() == page.extract_tables(
        vertical_strategy="lines", horizontal_strategy="lines",
        min_table_size=3, text_tolerance=3.0, snap_tolerance=3.0,
        join_tolerance=3.0,
    )
    assert page.extract_tables(
        vertical_strategy="text", horizontal_strategy="text"
    ) != page.extract_tables()


def test_snap_half_values_match_reference_and_spark_semantics():
    """Exact-half coordinates must snap half-AWAY-from-zero (Go math.Round,
    table_extractor.go:285) — Python's banker's round() would give 6 for
    7.5/3; Spark F.round and DuckDB ROUND agree with the reference."""
    from pdfplumber_golang_spark.kernel.tables import _snap

    assert _snap(7.5, 3.0) == 9.0   # 2.5 -> 3 (banker's would say 2 -> 6.0)
    assert _snap(4.5, 3.0) == 6.0   # 1.5 -> 2
    assert _snap(7.4, 3.0) == 6.0
    assert _snap(0.0, 3.0) == 0.0
