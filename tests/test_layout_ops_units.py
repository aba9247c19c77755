"""Unit tests for DataFrame-level geometric operators (G6/G7) and the T7
row-rectangle kernel path."""

from pdfplumber_golang_spark.kernel.tables import extract_tables
from pdfplumber_golang_spark.operators.layout_ops import (
    filter_page_border_lines,
    filter_table_candidate_lines,
)


def _edges_df(spark, rows):
    return spark.createDataFrame(
        rows, ["url", "page_no", "x0", "y0", "x1", "y1", "width"]
    )


def test_page_border_filter(spark):
    df = _edges_df(
        spark,
        [
            ("u", 1, 0.5, 10.0, 0.5, 700.0, 1.0),     # left border vertical
            ("u", 1, 10.0, 791.5, 600.0, 791.5, 1.0), # top border horizontal
            ("u", 1, 72.0, 400.0, 300.0, 400.0, 1.0), # interior line
        ],
    )
    out = filter_page_border_lines(df, page_w=612.0, page_h=792.0).collect()
    assert len(out) == 1 and out[0].x0 == 72.0


def test_table_candidate_filter(spark):
    df = _edges_df(
        spark,
        [
            ("u", 1, 5.0, 100.0, 5.0, 300.0, 1.0),     # x < 20: out
            ("u", 1, 72.0, 10.0, 300.0, 10.0, 1.0),    # y < 20: out
            ("u", 1, 72.0, 100.0, 300.0, 100.0, 1.0),  # in
            ("u", 1, 72.0, 100.0, 300.0, 320.0, 1.0),  # diagonal: out
        ],
    )
    out = filter_table_candidate_lines(df).collect()
    assert len(out) == 1 and out[0].y0 == 100.0


def test_relational_lattice_multi_region(spark):
    """Two separated grids on one page -> two tables (T4 group split as a
    window sessionize in the relational path)."""
    from pdfplumber_golang_spark.operators.table_ops import lattice_cells

    rows = []
    # grid A: y 400..352, x 72..128 (2x2 cells); grid B: y 200..176, x 300..328
    for y in (400.0, 376.0, 352.0):
        rows.append(("u", 1, 72.0, y, 128.0, y, 1.0))
    for x in (72.0, 100.0, 128.0):
        rows.append(("u", 1, x, 352.0, x, 400.0, 1.0))
    for y in (200.0, 176.0):
        rows.append(("u", 1, 300.0, y, 328.0, y, 1.0))
    for x in (300.0, 328.0):
        rows.append(("u", 1, x, 176.0, x, 200.0, 1.0))
    edges = spark.createDataFrame(
        rows, ["url", "page_no", "x0", "y0", "x1", "y1", "width"]
    )
    cells = lattice_cells(edges).toPandas()
    by_table = cells.groupby("table_no").size().to_dict()
    # faithful reference semantics (findTableRegions): every h-group x
    # v-group pair forms a region, including the two cross "ghost" pairs —
    # 2x2 and 1x1 real grids plus 2x1 and 1x2 ghosts
    assert len(by_table) == 4
    assert sorted(by_table.values()) == [1, 2, 2, 4]
    # kernel path produces the same region count on the same edges once
    # the rows >= minTableSize gate is lowered out of the way
    from pdfplumber_golang_spark.kernel.tables import extract_tables

    ek = [(r.x0, r.y0, r.x1, r.y1, r.width) for r in edges.collect()]
    tabs = extract_tables([], ek, [], min_table_size=1)
    assert len(tabs) == 4
    # at the reference default (minTableSize=3, gate at
    # table_extractor.go:118) every region here has <= 2 rows -> all
    # dropped; the dispatch then tries T12, which finds no chars
    assert extract_tables([], ek, []) == []


def test_row_rectangle_table_path():
    # 4 full-width stacked row rects + 2-column char layout -> T7 path
    chars = []
    rects = []
    for row in range(4):
        y1 = 700.0 - row * 20.0
        y0 = y1 - 20.0
        rects.append((72.0, y0, 400.0, y1, 1.0, True, False))
        for col, cx in enumerate((80.0, 240.0)):
            word = f"r{row}c{col}"
            for k, ch in enumerate(word):
                x = cx + 6.0 * k
                y = y0 + 4.0
                chars.append((ch, "F1", 12.0, x, y, x + 6.0, y + 12.0, 6.0, 12.0))
    # an extra decoy rect with different alignment
    rects.append((10.0, 100.0, 50.0, 120.0, 1.0, True, False))
    tabs = extract_tables(chars, [], rects)
    assert len(tabs) == 1
    rows = tabs[0]["rows"]
    assert len(rows) == 4 and all(len(r) == 2 for r in rows)
    assert rows[0] == ["r0c0", "r0c1"]  # Y1 desc: top row first
    assert rows[3] == ["r3c0", "r3c1"]


def test_empty_column_pruning_in_row_rect_path():
    # chars cluster at 3 histogram columns but the middle one is all blanks
    chars = []
    rects = []
    for row in range(3):
        y1 = 700.0 - row * 20.0
        y0 = y1 - 20.0
        rects.append((72.0, y0, 400.0, y1, 1.0, True, False))
        for cx, word in ((80.0, f"a{row}"), (300.0, f"b{row}")):
            for k, ch in enumerate(word):
                x = cx + 6.0 * k
                chars.append((ch, "F1", 12.0, x, y0 + 4, x + 6.0, y0 + 16, 6.0, 12.0))
    # histogram decoy column at x=180 from chars OUTSIDE all rects
    for k in range(3):
        chars.append(("z", "F1", 12.0, 180.0, 50.0 - k, 186.0, 62.0 - k, 6.0, 12.0))
    rects.append((10.0, 900.0, 20.0, 910.0, 1.0, True, False))  # len(rects)>3
    tabs = extract_tables(chars, [], rects)
    assert len(tabs) == 1
    rows = tabs[0]["rows"]
    # decoy column pruned: only 2 columns survive
    assert all(len(r) == 2 for r in rows)
    assert rows[0] == ["a0", "b0"]


def _jitter_chars(ys):
    """One char per y value; x advances so reading order is deterministic."""
    return [
        (chr(97 + i % 26), "F1", 12.0, 72.0 + 6.0 * i, y,
         78.0 + 6.0 * i, y + 12.0, 6.0, 12.0)
        for i, y in enumerate(ys)
    ]


def _kernel_line_of(chars):
    from pdfplumber_golang_spark.kernel import layout

    ordered = layout.sort_reading_order(chars)
    out = {}
    for li, line in enumerate(layout.group_lines(ordered)):
        for ch in line:
            out[ch[0]] = li
    return out


def _relational_line_of(spark, chars):
    from pdfplumber_golang_spark.operators.layout_ops import with_line_ids

    rows = [
        ("u", 1, i, c[0], c[3], c[4], c[5], c[6], c[7], c[8])
        for i, c in enumerate(chars)
    ]
    df = spark.createDataFrame(
        rows,
        ["url", "page_no", "char_idx", "text",
         "x0", "y0", "x1", "y1", "width", "height"],
    )
    return {r.text: r.line_id - 1 for r in with_line_ids(df).collect()}


def test_lag_sessionize_matches_anchor_sweep_within_envelope(spark):
    """VERDICT r1 #8 jitter guard: with intra-line y-jitter at the
    tolerance boundary (±1.4, spread 2.8 < yTol=3) and inter-line gaps
    > yTol, the lag-based DataFrame sessionize assigns exactly the same
    line partition as the kernel's anchor sweep."""
    ys = []
    for base in (700.0, 688.0, 676.0):
        ys += [base, base + 1.4, base - 1.4, base + 0.7]
    chars = _jitter_chars(ys)
    k = _kernel_line_of(chars)
    r = _relational_line_of(spark, chars)
    assert k == r
    assert len(set(k.values())) == 3


def test_lag_sessionize_divergence_is_the_documented_staircase(spark):
    """The FIRST input where the two implementations diverge (documented
    at layout_ops.py:10-14): a y staircase stepping by 2.8 (< yTol) per
    char. Every consecutive gap is within tolerance, so the lag chain
    fuses everything into one line; the anchor sweep splits when the
    cumulative drift from the line anchor exceeds yTol."""
    ys = [700.0 - 2.8 * i for i in range(6)]  # drift 14 total
    chars = _jitter_chars(ys)
    k = _kernel_line_of(chars)
    r = _relational_line_of(spark, chars)
    assert len(set(r.values())) == 1      # lag: one fused line
    assert len(set(k.values())) == 3      # anchor: split every 2 steps
    assert k != r
