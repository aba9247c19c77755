"""Table detection as pure DataFrame operators (T2+T5+T6 relationally).

The kernel path (kernel/tables.py) runs per page inside mapInPandas; this
module expresses the same lattice algorithm as Catalyst-visible relational
algebra — the SURVEY §2.8 design: the chars↔cells containment is a
range/interval join realized as a per-page equi-join plus range predicate
(the page key bounds the join fan-out; cells-per-page and chars-per-page
are small constants, so the "bin" IS the page).

T12 (text-based detection for ruling-free pages) exists relationally too:
``text_tables`` — word-line sessionize, aligned-column histogram with the
max(2, 30%-of-lines) support gate, nearest-column assignment as a
rank-over-distance join. ``extract_tables_relational`` composes it as the
fallback for pages the lattice leaves empty, mirroring the kernel dispatch
(ExtractTables, table_extractor.go:64-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import spec
from ..kernel.tables import MIN_TABLE_SIZE  # single source for both paths
from ..plans import cache
from .layout_ops import classify_orientation

SNAP_TOL = 3.0
TEXT_TOL = 3.0
GROUP_GAP = 30.0


def _cuts(edges: DataFrame, orientation: str) -> DataFrame:
    """T4+T5: distinct snapped axis positions → 30pt-gap position groups
    (the T4 region split, as a lag+cumsum sessionize) → consecutive
    (lo, hi) bands within each group."""
    pos = F.round(
        (F.col("y0") if orientation == "h" else F.col("x0")) / SNAP_TOL
    ) * SNAP_TOL
    distinct = (
        edges.where(F.col("orientation") == orientation)
        .select("url", "page_no", pos.alias("pos"))
        .distinct()
    )
    wp = Window.partitionBy("url", "page_no").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(wp)
    new_grp = F.when(gap.isNull() | (gap > GROUP_GAP), 1).otherwise(0)
    grouped = distinct.withColumn(
        "grp", F.sum(new_grp).over(wp.rowsBetween(Window.unboundedPreceding, 0))
    )
    wg = Window.partitionBy("url", "page_no", "grp").orderBy("pos")
    return (
        grouped.withColumn("next_pos", F.lead("pos").over(wg))
        .where(F.col("next_pos").isNotNull())
        .withColumn("band_no", F.row_number().over(wg) - 1)
    )


def lattice_cells(edges: DataFrame) -> DataFrame:
    """T2+T4+T5: edges → cell grids (url, page_no, table_no, row_no,
    col_no, bounds), one table per (h-group × v-group) pair with >= 1 band
    on each axis (findTableRegions, table_extractor.go:159-186).

    row_no ascends with PDF y (bottom-to-top), matching the kernel/reference
    cell ordering (table_extractor.go:254-276)."""
    e = classify_orientation(edges, SNAP_TOL)
    hbands = _cuts(e, "h").select(
        "url", "page_no",
        F.col("grp").alias("h_grp"),
        F.col("band_no").alias("row_no"),
        F.col("pos").alias("y_lo"), F.col("next_pos").alias("y_hi"),
    )
    vbands = _cuts(e, "v").select(
        "url", "page_no",
        F.col("grp").alias("v_grp"),
        F.col("band_no").alias("col_no"),
        F.col("pos").alias("x_lo"), F.col("next_pos").alias("x_hi"),
    )
    cells = hbands.join(vbands, ["url", "page_no"])
    # table_no: dense rank of the (h_grp, v_grp) pair per page
    wt = Window.partitionBy("url", "page_no").orderBy("h_grp", "v_grp")
    return cells.withColumn("table_no", F.dense_rank().over(wt) - 1)


def fill_cells(cells: DataFrame, chars: DataFrame) -> DataFrame:
    """T6: chars whose center falls inside a cell, reading order within.

    Range join = equi-join on the page key + center-in-bounds predicate;
    newline/space insertion identical to the kernel's cell_text."""
    cx = (F.col("x0") + F.col("x1")) / 2
    cy = (F.col("y0") + F.col("y1")) / 2
    ch = chars.select(
        "url", "page_no", "char_idx", "text",
        F.col("x0").alias("cx0"), F.col("x1").alias("cx1"),
        cx.alias("cx"), cy.alias("cy"), F.col("y0").alias("cy0"),
    )
    joined = cells.join(ch, ["url", "page_no"]).where(
        (F.col("cx") >= F.col("x_lo")) & (F.col("cx") <= F.col("x_hi"))
        & (F.col("cy") >= F.col("y_lo")) & (F.col("cy") <= F.col("y_hi"))
    )
    w = Window.partitionBy(
        "url", "page_no", "table_no", "row_no", "col_no"
    ).orderBy("cy0", "cx0", "char_idx")
    y_jump = F.abs(F.col("cy0") - F.lag("cy0").over(w)) > TEXT_TOL
    x_gap = (F.col("cx0") - F.lag("cx1").over(w)) > TEXT_TOL
    piece = (
        F.when(F.lag("cy0").over(w).isNull(), F.col("text"))
        .when(y_jump, F.concat(F.lit("\n"), F.col("text")))
        .when(x_gap, F.concat(F.lit(" "), F.col("text")))
        .otherwise(F.col("text"))
    )
    filled = (
        joined.withColumn("piece", piece)
        .groupBy("url", "page_no", "table_no", "row_no", "col_no")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("cy0", "cx0", "char_idx", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("cell_text")
        )
    )
    # empty cells must still appear (left join back onto the full grid)
    keys = ["url", "page_no", "table_no", "row_no", "col_no"]
    return (
        cells.select(*keys)
        .join(filled, keys, "left")
        .fillna("", ["cell_text"])
    )


def text_tables(chars: DataFrame, min_table_size: int = MIN_TABLE_SIZE) -> DataFrame:
    """T12 relationally: word lines → aligned-column histogram →
    nearest-column assignment (findAlignedColumnsFromWords +
    createTableFromAlignedText, table_extractor.go:731-886).

    Shape: one narrow words relation, two windowed aggs, one per-page
    equi-join against the (tiny) column set — the join fan-out per page is
    n_words x n_cols with n_cols bounded by distinct snapped x positions,
    so the plan scales linearly in pages like the lattice path.

    Line grouping uses the Y2 char sweep's line_id (same tolerance); the
    kernel re-sweeps at word level — identical whenever intra-line y jitter
    is below Y_TOLERANCE, the same documented envelope as layout_ops'
    lag-based sessionize (layout_ops.py:10-14).
    """
    from .layout_ops import words as words_op

    w = words_op(chars).select(
        "url", "page_no", "line_id", "word_id",
        F.col("word_text"), "x0", "x1", "y0", "y1",
    )
    pagekey = ["url", "page_no"]
    # lines >= minTableSize gate (:386), counted per page
    nlines = w.groupBy(*pagekey).agg(
        F.countDistinct("line_id").alias("n_lines")
    ).where(F.col("n_lines") >= min_table_size)

    snapped = F.round(F.col("x0") / SNAP_TOL) * SNAP_TOL
    # column support: lines containing a word starting at the snapped x
    support = (
        w.select(*pagekey, "line_id", snapped.alias("col_x"))
        .distinct()
        .groupBy(*pagekey, "col_x")
        .agg(F.count("*").alias("n_sup"))
        .join(nlines, pagekey)
        .where(
            F.col("n_sup")
            >= F.greatest(F.lit(2), F.floor(0.3 * F.col("n_lines")))
        )
    )
    wc = Window.partitionBy(*pagekey).orderBy("col_x")
    cols = (
        support.withColumn("col_no", F.row_number().over(wc) - 1)
        .withColumn("n_cols", F.count("*").over(Window.partitionBy(*pagekey)))
        .where(F.col("n_cols") >= 2)  # len(columns) > 1 (:386)
        .select(*pagekey, "col_x", "col_no")
    )
    # nearest column strictly within 3*snap (:879); ties go to the leftmost
    # column (the kernel iterates columns ascending with a strict <)
    dist = F.abs(F.col("x0") - F.col("col_x"))
    assigned = (
        w.join(cols, pagekey)
        .where(dist < 3 * SNAP_TOL)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(*pagekey, "line_id", "word_id")
                .orderBy(dist.asc(), F.col("col_x").asc())
            ),
        )
        .where(F.col("rk") == 1)
    )
    # cell text: member words joined by ' ' in x order (:855-864)
    filled = assigned.groupBy(*pagekey, "line_id", "col_no").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("x0", "word_text"))),
                lambda s: s["word_text"],
            ),
        ).alias("cell_text")
    )
    # full grid: every (line, col) pair, empties included; row_no follows
    # line_id (top line first — the kernel sorts words by -y0)
    grid = (
        w.select(*pagekey, "line_id").distinct()
        .join(cols.select(*pagekey, "col_no"), pagekey)
    )
    wr = Window.partitionBy(*pagekey).orderBy("line_id")
    return (
        grid.join(filled, [*pagekey, "line_id", "col_no"], "left")
        .fillna("", ["cell_text"])
        .withColumn("row_no", F.dense_rank().over(wr) - 1)
        .withColumn("table_no", F.lit(0))
        .select(*pagekey, "table_no", "row_no", "col_no", "cell_text")
    )


def extract_tables_relational(edges: DataFrame, chars: DataFrame) -> DataFrame:
    """Full relational path: lattice first; pages it leaves empty fall back
    to T12 text detection (kernel/reference dispatch, ExtractTables
    :64-69). The anti-join keys are (url, page_no) — control-flow rows,
    never payload."""
    # persist: the lattice subplan feeds both the union output and the
    # covered-pages anti-join, and recomputing it re-runs the upstream
    # char/edge extraction; the cached relation is cell rows, tiny next to
    # the payload.  Registered with plans.cache so the harness releases it
    # after the result is materialized (ADVICE r2: never leaked again).
    lattice = cache.persist(fill_cells(lattice_cells(edges), chars))
    # rows >= minTableSize gate (table_extractor.go:118), twin of the
    # kernel's _line_based gate
    n_rows = F.max("row_no").over(
        Window.partitionBy("url", "page_no", "table_no")
    ) + 1
    lattice = lattice.withColumn("_nr", n_rows).where(
        F.col("_nr") >= MIN_TABLE_SIZE
    ).drop("_nr")
    covered = lattice.select("url", "page_no").distinct()
    fallback = text_tables(
        chars.join(covered, ["url", "page_no"], "left_anti")
    ).select(
        "url", "page_no", "table_no", "row_no", "col_no", "cell_text"
    )
    return lattice.select(
        "url", "page_no", "table_no", "row_no", "col_no", "cell_text"
    ).unionByName(fallback)
