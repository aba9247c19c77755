"""Table detection & extraction (SURVEY §2.7 T1-T12).

Behavior-parity reimplementation of the reference's table extractor
(/root/reference/pkg/pdf/table_extractor.go):
  T1  strategy dispatch: lines first, text-based fallback when 0 found
      (table_extractor.go:49-73)
  T2  h/v classification with snapTolerance=3 (:127-148)
  T3  rect → 4 border edges (:94-108)
  T4  group lines into regions: sort by position, split on gap > 30 (:187-228)
  T5  intersection lattice: unique round(pos/3)*3 positions; >=2x2 (:231-299)
      — note cells are ordered by ASCENDING y (PDF coords: row 0 is the
      BOTTOM row); replicated faithfully
  T6  cell fill: chars whose center lies in the cell; sort (y asc within
      tol, then x); '\n' on y jump > tol, ' ' on x gap > tol (:302-367)
  T7  row-rectangle path when len(rects) > minTableSize (:510-586)
  T12 text-based fallback: word lines → aligned columns (>= max(2, 30% of
      lines)) → nearest column within 3*snapTol (:370-394, 731-886)

Defaults: snap=3.0, join=3.0, minTableSize=3, textTolerance=3.0 (:22-46).
"""

from __future__ import annotations

import math

from .. import spec
from . import layout

SNAP_TOL = 3.0
TEXT_TOL = 3.0
GROUP_GAP = 30.0
MIN_TABLE_SIZE = 3


def _snap(p: float, tol: float) -> float:
    """round(p/tol)*tol with Go math.Round semantics (half away from zero
    — the reference uses math.Round, table_extractor.go:285/490/596/812),
    which for the positive page coordinates equals floor(x+0.5).  Python's
    built-in round() is banker's rounding and diverges on exact halves;
    Spark F.round / DuckDB ROUND agree with the reference."""
    return math.floor(p / tol + 0.5) * tol

_TEXT, _FONT, _SIZE, _X0, _Y0, _X1, _Y1, _W, _H = range(9)


def classify_lines(edges: list[tuple], snap_tolerance: float = SNAP_TOL) -> tuple[list, list]:
    """T2: (h_lines, v_lines) by |Δ| < snap tolerance."""
    h, v = [], []
    for e in edges:
        x0, y0, x1, y1 = e[0], e[1], e[2], e[3]
        if abs(y1 - y0) < snap_tolerance:
            h.append(e)
        elif abs(x1 - x0) < snap_tolerance:
            v.append(e)
    return h, v


def rects_to_edges(rects: list[tuple]) -> tuple[list, list]:
    """T3: each rect contributes top/bottom h edges and left/right v edges."""
    h, v = [], []
    for r in rects:
        x0, y0, x1, y1 = r[0], r[1], r[2], r[3]
        w = r[4] if len(r) > 4 else 1.0
        h.append((x0, y0, x1, y0, w))
        h.append((x0, y1, x1, y1, w))
        v.append((x0, y0, x0, y1, w))
        v.append((x1, y0, x1, y1, w))
    return h, v


def group_lines(lines: list, horizontal: bool) -> list[list]:
    """T4: sort by axis position; split where consecutive gap > 30."""
    if not lines:
        return []
    key = (lambda e: e[1]) if horizontal else (lambda e: e[0])
    lines = sorted(lines, key=key)
    groups: list[list] = []
    cur = [lines[0]]
    for prev, ln in zip(lines, lines[1:]):
        if abs(key(ln) - key(prev)) > GROUP_GAP:
            groups.append(cur)
            cur = [ln]
        else:
            cur.append(ln)
    groups.append(cur)
    return groups


def unique_positions(lines: list, horizontal: bool, snap_tolerance: float = SNAP_TOL) -> list[float]:
    """T5: snapped unique positions (round(pos/snap)*snap)."""
    pos = set()
    for e in lines:
        p = e[1] if horizontal else e[0]
        pos.add(_snap(p, snap_tolerance))
    return sorted(pos)


def cell_text(cell: tuple[float, float, float, float], chars: list,
              text_tolerance: float = TEXT_TOL) -> str:
    """T6: chars whose center lies within the cell, reading order within."""
    cx0, cy0, cx1, cy1 = cell
    members = [
        ch
        for ch in chars
        if cx0 <= (ch[_X0] + ch[_X1]) / 2 <= cx1
        and cy0 <= (ch[_Y0] + ch[_Y1]) / 2 <= cy1
    ]
    members.sort(key=lambda c: (c[_Y0], c[_X0]))
    # faithful tolerance-relative compare degraded to strict (deterministic)
    out: list[str] = []
    last_y, last_x = -1000.0, -1000.0
    for ch in members:
        if last_y > 0 and abs(ch[_Y0] - last_y) > text_tolerance:
            out.append("\n")
            last_x = -1000.0
        elif last_x > 0 and ch[_X0] - last_x > text_tolerance:
            out.append(" ")
        out.append(ch[_TEXT])
        last_y, last_x = ch[_Y0], ch[_X1]
    return "".join(out)


def extract_tables(
    chars: list,
    edges: list,
    rects: list,
    *,
    vertical_strategy: str = "lines",
    horizontal_strategy: str = "lines",
    min_table_size: int = MIN_TABLE_SIZE,
    text_tolerance: float = TEXT_TOL,
    snap_tolerance: float = SNAP_TOL,
    join_tolerance: float = 3.0,
) -> list[dict]:
    """T1 dispatch. Returns [{'rows': [[str]], 'bbox': (x0,y0,x1,y1)}].

    Option surface mirrors the reference (WithTableStrategy /
    WithMinTableSize / WithTextTolerance, types.go:366-393; constructor
    defaults table_extractor.go:22-46).  Strategies: the line-based pass
    runs iff either strategy is "lines" (ExtractTables, :55-61); the
    text-based pass always backstops an empty result (:64-69) — so
    ("text", "text") goes straight to T12.  ``join_tolerance`` is accepted
    for parity but, exactly as in the reference, no computation consumes
    it (declared :17, default :43, never read).
    """
    del join_tolerance  # parity-only, dead in the reference too
    tables: list[dict] = []
    if vertical_strategy == "lines" or horizontal_strategy == "lines":
        # T7: row-rectangle path first when enough rects exist
        # (extractLineBasedTables, table_extractor.go:76-88)
        if len(rects) > min_table_size:
            t = _row_rectangle_table(chars, rects, min_table_size, snap_tolerance)
            if t is not None and len(t["rows"]) >= min_table_size:
                return [t]
        tables = _line_based(
            chars, edges, rects, min_table_size, text_tolerance, snap_tolerance
        )
    if not tables:
        tables = _text_based(chars, min_table_size, text_tolerance, snap_tolerance)
    return tables


def _row_rectangle_table(
    chars: list,
    rects: list,
    min_table_size: int = MIN_TABLE_SIZE,
    snap_tolerance: float = SNAP_TOL,
) -> dict | None:
    """T7: aligned stacked rects (same x0/x1 within snap) form table rows;
    each rect's chars are distributed over text-derived columns
    (extractTableFromRowRectangles, table_extractor.go:510-586; column
    inference T8/T9, row fill T10, empty-column pruning T11)."""
    from collections import Counter

    groups: dict[tuple[float, float], list] = {}
    for r in rects:
        key = (
            _snap(r[0], snap_tolerance),
            _snap(r[2], snap_tolerance),
        )
        groups.setdefault(key, []).append(r)
    aligned = max(groups.values(), key=len)
    if len(aligned) < min_table_size:
        return None
    aligned.sort(key=lambda r: -r[3])  # Y1 descending (top row first)
    # T8: column x-positions from snapped WORD-start x0 histogram (count >=
    # 3). Canonical deviation from the reference's char-level histogram
    # (findTextColumns, table_extractor.go:589-613), which degenerates to
    # one column per character for grid-aligned text; word starts are what
    # its own text-based path T12 uses (findAlignedColumnsFromWords).
    words = layout.extract_words(chars)
    counts = Counter(
        _snap(w["x0"], snap_tolerance) for w in words
    )
    cols = sorted(p for p, n in counts.items() if n >= 3)
    if len(cols) < 2:
        return None
    rows = []
    for r in aligned:
        y0, y1 = r[1], r[3]
        members = [c for c in chars if y0 <= (c[_Y0] + c[_Y1]) / 2 <= y1]
        row = [""] * len(cols)
        for ch in sorted(members, key=lambda c: c[_X0]):
            ci = _find_column(ch[_X0], cols, snap_tolerance)
            if ci is not None:
                row[ci] += ch[_TEXT]
        rows.append([cell.strip() for cell in row])
    rows, cols_kept = _prune_empty_columns(rows)
    if not rows or len(rows) < min_table_size:
        return None
    x0 = min(r[0] for r in aligned)
    y0 = min(r[1] for r in aligned)
    x1 = max(r[2] for r in aligned)
    y1 = max(r[3] for r in aligned)
    return {"rows": rows, "bbox": (x0, y0, x1, y1)}


def _find_column(
    x: float, cols: list[float], snap_tolerance: float = SNAP_TOL
) -> int | None:
    """T9: first column whose [col, next_col) brackets x
    (findColumnIndex, table_extractor.go:642-658)."""
    for i, c in enumerate(cols):
        hi = cols[i + 1] if i + 1 < len(cols) else float("inf")
        if c - snap_tolerance <= x < hi:
            return i
    return None


def _prune_empty_columns(rows: list[list[str]]) -> tuple[list[list[str]], list[int]]:
    """T11: drop columns with no non-blank cell across all rows
    (removeEmptyColumns, table_extractor.go:661-691)."""
    if not rows:
        return rows, []
    ncols = len(rows[0])
    keep = [
        j for j in range(ncols) if any(r[j].strip() for r in rows)
    ]
    return [[r[j] for j in keep] for r in rows], keep


def _line_based(
    chars: list,
    edges: list,
    rects: list,
    min_table_size: int = MIN_TABLE_SIZE,
    text_tolerance: float = TEXT_TOL,
    snap_tolerance: float = SNAP_TOL,
) -> list[dict]:
    h, v = classify_lines(edges, snap_tolerance)
    rh, rv = rects_to_edges(rects)
    h, v = h + rh, v + rv
    tables = []
    for hg in group_lines(h, horizontal=True):
        for vg in group_lines(v, horizontal=False):
            if len(hg) < 2 or len(vg) < 2:
                continue
            hpos = unique_positions(hg, horizontal=True, snap_tolerance=snap_tolerance)
            vpos = unique_positions(vg, horizontal=False, snap_tolerance=snap_tolerance)
            if len(hpos) < 2 or len(vpos) < 2:
                continue
            rows = []
            for i in range(len(hpos) - 1):
                row = []
                for j in range(len(vpos) - 1):
                    row.append(
                        cell_text(
                            (vpos[j], hpos[i], vpos[j + 1], hpos[i + 1]),
                            chars,
                            text_tolerance,
                        )
                    )
                rows.append(row)
            # rows >= minTableSize gate (table_extractor.go:118)
            if len(rows) < min_table_size:
                continue
            tables.append(
                {
                    "rows": rows,
                    "bbox": (vpos[0], hpos[0], vpos[-1], hpos[-1]),
                }
            )
    return tables


def _text_based(
    chars: list,
    min_table_size: int = MIN_TABLE_SIZE,
    text_tolerance: float = TEXT_TOL,
    snap_tolerance: float = SNAP_TOL,
) -> list[dict]:
    """T12: word lines → column histogram → nearest-column assignment."""
    words = layout.extract_words(chars)
    if not words:
        return []
    # group words into lines by y (same sweep as chars)
    words.sort(key=lambda w: (-w["y0"], w["x0"]))
    lines: list[list[dict]] = []
    cur: list[dict] = []
    anchor = words[0]["y0"]
    for wd in words:
        if abs(wd["y0"] - anchor) > text_tolerance:
            if cur:
                lines.append(cur)
            cur = [wd]
            anchor = wd["y0"]
        else:
            cur.append(wd)
    if cur:
        lines.append(cur)
    if len(lines) < min_table_size:
        return []
    # column positions: snapped word x0 appearing in >= max(2, 30% of lines)
    from collections import Counter

    counts = Counter()
    for ln in lines:
        seen = {_snap(wd["x0"], snap_tolerance) for wd in ln}
        counts.update(seen)
    need = max(2, int(0.3 * len(lines)))
    cols = sorted(p for p, c in counts.items() if c >= need)
    if len(cols) < 2:
        return []
    rows = []
    for ln in lines:
        row = [""] * len(cols)
        for wd in sorted(ln, key=lambda w: w["x0"]):
            # nearest column, strictly within 3*snap
            # (dist < te.snapTolerance*3, table_extractor.go:879)
            best, bestd = None, 3 * snap_tolerance
            for ci, cx in enumerate(cols):
                d = abs(wd["x0"] - cx)
                if d < bestd:
                    best, bestd = ci, d
            if best is None:
                continue
            row[best] = (row[best] + " " + wd["text"]).strip()
        rows.append(row)
    if len(rows) < min_table_size:
        return []
    x0 = min(w["x0"] for w in words)
    y0 = min(w["y0"] for w in words)
    x1 = max(w["x1"] for w in words)
    y1 = max(w["y1"] for w in words)
    return [{"rows": rows, "bbox": (x0, y0, x1, y1)}]
