"""The extraction pipeline: pages table → per-page rows → per-doc text.

Spark-first design (SURVEY §3.2 "Spark shape"):
  * one ``mapInPandas`` stage runs the whole per-document kernel
    (bytes → chars → layout → text) — no cross-node boundary inside a doc;
  * explicit column pruning before the UDF (a pandas UDF is opaque to
    Catalyst, so we select only (url, html) ourselves);
  * skew: repartition by ``xxhash64(url)`` with an extra salt bucket for
    mega-payloads (``length(html) > threshold``) so one hot partition can't
    stall the stage (north_rule skew requirement) — docs are atomic units so
    salting spreads *documents*, pages explode afterwards;
  * per-doc text reassembly is a groupBy over (url), shuffle keyed the same
    way as the repartition so AQE can coalesce.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernel.extract import extract_document

PAGE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_edges", T.IntegerType()),
        T.StructField("n_rects", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)

CHAR_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("char_idx", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("font", T.StringType()),
        T.StructField("font_size", T.DoubleType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
    ]
)

IMAGE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("img_idx", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("bpc", T.LongType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
    ]
)

ANNOT_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("annot_idx", T.IntegerType()),
        T.StructField("subtype", T.StringType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("contents", T.StringType()),
        T.StructField("link_url", T.StringType()),
    ]
)

TABLE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("table_no", T.IntegerType()),
        T.StructField("row_no", T.IntegerType()),
        T.StructField("col_no", T.IntegerType()),
        T.StructField("cell_text", T.StringType()),
    ]
)

#: payloads above this byte size get their own salt buckets (mega-docs)
MEGA_BYTES = 64 * 1024
N_SALT = 8


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows: dict[str, list] = {f.name: [] for f in PAGE_ROWS_SCHEMA.fields}
        for url, raw in zip(pdf["url"], pdf["html"]):
            pages, err = extract_document(url, bytes(raw))
            if err is not None:
                rows["url"].append(url)
                rows["page_no"].append(0)
                rows["kind"].append("error")
                rows["text"].append(None)
                rows["n_chars"].append(0)
                rows["n_words"].append(0)
                rows["n_edges"].append(0)
                rows["n_rects"].append(0)
                rows["error"].append(err)
                continue
            for p in pages:
                rows["url"].append(url)
                rows["page_no"].append(p.page_no)
                rows["kind"].append(p.kind)
                rows["text"].append(p.text)
                rows["n_chars"].append(p.n_chars)
                rows["n_words"].append(p.n_words)
                rows["n_edges"].append(p.n_edges)
                rows["n_rects"].append(p.n_rects)
                rows["error"].append(None)
        yield pd.DataFrame(rows)


def _char_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in CHAR_ROWS_SCHEMA.fields]
    for pdf in it:
        out: dict[str, list] = {c: [] for c in cols}
        for url, raw in zip(pdf["url"], pdf["html"]):
            pages, err = extract_document(url, bytes(raw))
            if err is not None:
                continue
            for p in pages:
                for i, ch in enumerate(p.chars):
                    t, font, size, x0, y0, x1, y1, w, h = ch
                    out["url"].append(url)
                    out["page_no"].append(p.page_no)
                    out["char_idx"].append(i)
                    out["text"].append(t)
                    out["font"].append(font)
                    out["font_size"].append(size)
                    out["x0"].append(x0)
                    out["y0"].append(y0)
                    out["x1"].append(x1)
                    out["y1"].append(y1)
                    out["width"].append(w)
                    out["height"].append(h)
        yield pd.DataFrame(out)


def _salted(
    pages: DataFrame,
    parallelism: int,
    salt: bool,
    mega_bytes: int = MEGA_BYTES,
) -> DataFrame:
    """Prune to (url, html); optionally spread docs by url-hash + mega salt.

    Shuffling raw payload bytes is expensive (measured: the repartition of
    a ~6GB payload column made the extract stage I/O-bound and killed
    scaling, 0.32 efficiency at 8→32 cores). Default is scan-aligned
    extraction — the parquet/Iceberg reader already splits input by
    ``spark.sql.files.maxPartitionBytes``, so partitions are balanced
    without moving bytes. Use salt=True only when the SOURCE layout is
    skewed (few giant files / hot key ranges); then the explicit url-hash +
    mega-doc salt repartition is the remedy the north_rule names."""
    pruned = pages.select("url", "html")
    if not salt:
        return pruned
    salt_col = F.when(
        F.length("html") > mega_bytes,
        F.pmod(F.xxhash64("url", F.lit(1)), F.lit(N_SALT)),
    ).otherwise(F.lit(0))
    return pruned.repartition(parallelism, F.xxhash64("url"), salt_col)


def extract_pages(
    pages: DataFrame,
    parallelism: int = 32,
    salt: bool = False,
    mega_bytes: int = MEGA_BYTES,
) -> DataFrame:
    """pages table → per-page extraction rows (the core stage)."""
    return _salted(pages, parallelism, salt, mega_bytes).mapInPandas(
        _extract_batches, schema=PAGE_ROWS_SCHEMA
    )


def extract_chars(
    pages: DataFrame, parallelism: int = 32, salt: bool = False
) -> DataFrame:
    """pages table → flat chars relation (SURVEY §1.1: the central relation)."""
    return _salted(pages, parallelism, salt).mapInPandas(
        _char_batches, schema=CHAR_ROWS_SCHEMA
    )


def _image_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .kernel.extract import parse_pdf_objects

    cols = [f.name for f in IMAGE_ROWS_SCHEMA.fields]
    for pdf in it:
        out: dict[str, list] = {c: [] for c in cols}
        for url, raw in zip(pdf["url"], pdf["html"]):
            try:
                for page_no, _mb, interp in parse_pdf_objects(bytes(raw)):
                    for i, im in enumerate(interp.images):
                        name, w, h, cs, bpc, x0, y0, x1, y1 = im
                        out["url"].append(url)
                        out["page_no"].append(page_no)
                        out["img_idx"].append(i)
                        out["name"].append(name)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["colorspace"].append(cs)
                        out["bpc"].append(bpc)
                        out["x0"].append(x0)
                        out["y0"].append(y0)
                        out["x1"].append(x1)
                        out["y1"].append(y1)
            except Exception:
                continue  # error routing parity: bad docs emit no rows
        yield pd.DataFrame(out)


def extract_images(
    pages: DataFrame, parallelism: int = 32, salt: bool = False
) -> DataFrame:
    """pages table → images relation (image-XObject metadata + placed
    bbox per Do; the reference's ImageObject schema slot made real)."""
    return _salted(pages, parallelism, salt).mapInPandas(
        _image_batches, schema=IMAGE_ROWS_SCHEMA
    )


def _annot_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .kernel.extract import load_annotations
    from .kernel.pdfparse import PDFDocument

    cols = [f.name for f in ANNOT_ROWS_SCHEMA.fields]
    for pdf in it:
        out: dict[str, list] = {c: [] for c in cols}
        for url, raw in zip(pdf["url"], pdf["html"]):
            try:
                doc = PDFDocument(bytes(raw))
                for page in doc.pages:
                    for i, (sub, x0, y0, x1, y1, txt, lurl) in enumerate(
                        load_annotations(doc, page)
                    ):
                        out["url"].append(url)
                        out["page_no"].append(page.number)
                        out["annot_idx"].append(i)
                        out["subtype"].append(sub)
                        out["x0"].append(x0)
                        out["y0"].append(y0)
                        out["x1"].append(x1)
                        out["y1"].append(y1)
                        out["contents"].append(txt)
                        out["link_url"].append(lurl)
            except Exception:
                continue  # error routing parity: bad docs emit no rows
        yield pd.DataFrame(out)


def extract_annotations(
    pages: DataFrame, parallelism: int = 32, salt: bool = False
) -> DataFrame:
    """pages table → annotations relation (/Annots subtype, rect,
    contents, link URI — the reference's AnnotationObject slot made real)."""
    return _salted(pages, parallelism, salt).mapInPandas(
        _annot_batches, schema=ANNOT_ROWS_SCHEMA
    )


def _table_batches(
    it: Iterator[pd.DataFrame], **table_opts
) -> Iterator[pd.DataFrame]:
    from .kernel.extract import parse_pdf_objects
    from .kernel.tables import extract_tables as kernel_tables

    cols = [f.name for f in TABLE_ROWS_SCHEMA.fields]
    for pdf in it:
        out: dict[str, list] = {c: [] for c in cols}
        for url, raw in zip(pdf["url"], pdf["html"]):
            raw = bytes(raw)
            if raw[:5] != b"%PDF-":
                continue
            try:
                for page_no, _mb, interp in parse_pdf_objects(raw):
                    tabs = kernel_tables(
                        interp.chars, interp.edges, interp.rects, **table_opts
                    )
                    for tno, tab in enumerate(tabs):
                        for rno, row in enumerate(tab["rows"]):
                            for cno, cell in enumerate(row):
                                out["url"].append(url)
                                out["page_no"].append(page_no)
                                out["table_no"].append(tno)
                                out["row_no"].append(rno)
                                out["col_no"].append(cno)
                                out["cell_text"].append(cell)
            except Exception:
                continue  # malformed: no table rows
        yield pd.DataFrame(out)


def extract_tables_df(
    pages: DataFrame, parallelism: int = 32, salt: bool = False, **table_opts
) -> DataFrame:
    """pages table → flattened table cells (SURVEY §2.7). ``table_opts``
    are the kernel extract_tables options (vertical_strategy=,
    horizontal_strategy=, min_table_size=, text_tolerance=,
    snap_tolerance=, join_tolerance=) — plan-build-time constants closed
    over by the Arrow stage, exactly like the reference's functional
    options (types.go:366-393)."""
    import functools

    fn = functools.partial(_table_batches, **table_opts)
    return _salted(pages, parallelism, salt).mapInPandas(
        fn, schema=TABLE_ROWS_SCHEMA
    )


CURVE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("curve_no", T.IntegerType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
    ]
)


def _curve_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .kernel.extract import parse_pdf_objects

    cols = [f.name for f in CURVE_ROWS_SCHEMA.fields]
    for pdf in it:
        out: dict[str, list] = {c: [] for c in cols}
        for url, raw in zip(pdf["url"], pdf["html"]):
            raw = bytes(raw)
            if raw[:5] != b"%PDF-":
                continue
            try:
                for page_no, _mb, interp in parse_pdf_objects(raw):
                    for cno, (pts,) in enumerate(interp.curves):
                        xs = [p[0] for p in pts]
                        ys = [p[1] for p in pts]
                        out["url"].append(url)
                        out["page_no"].append(page_no)
                        out["curve_no"].append(cno)
                        out["n_points"].append(len(pts))
                        out["x0"].append(min(xs))
                        out["y0"].append(min(ys))
                        out["x1"].append(max(xs))
                        out["y1"].append(max(ys))
            except Exception:
                continue
        yield pd.DataFrame(out)


def extract_curves(
    pages: DataFrame, parallelism: int = 32, salt: bool = False
) -> DataFrame:
    """pages table → curves relation (url, page_no, curve_no, n_points,
    bbox). CurveObjects are non-axis stroked point chains and non-rect
    fills (kernel/content.py _emit_stroke/_emit_fill; reference populates
    them at content_stream_parser.go:1259-1357)."""
    return _salted(pages, parallelism, salt).mapInPandas(
        _curve_batches, schema=CURVE_ROWS_SCHEMA
    )


EDGE_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("src", T.StringType()),
    ]
)


def _edge_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .kernel.extract import parse_pdf_objects
    from .kernel.tables import rects_to_edges

    cols = [f.name for f in EDGE_ROWS_SCHEMA.fields]
    for pdf in it:
        out: dict[str, list] = {c: [] for c in cols}

        def emit(url, page_no, e, src):
            out["url"].append(url)
            out["page_no"].append(page_no)
            out["x0"].append(e[0])
            out["y0"].append(e[1])
            out["x1"].append(e[2])
            out["y1"].append(e[3])
            out["width"].append(e[4] if len(e) > 4 else 1.0)
            out["src"].append(src)

        for url, raw in zip(pdf["url"], pdf["html"]):
            raw = bytes(raw)
            if raw[:5] != b"%PDF-":
                continue
            try:
                for page_no, _mb, interp in parse_pdf_objects(raw):
                    for e in interp.edges:
                        emit(url, page_no, e, "line")
                    rh, rv = rects_to_edges(interp.rects)
                    for e in rh + rv:
                        emit(url, page_no, e, "rect_edge")
            except Exception:
                continue
        yield pd.DataFrame(out)


def extract_edges(
    pages: DataFrame, parallelism: int = 32, salt: bool = False
) -> DataFrame:
    """pages table → flat edges relation (lines + rect-expanded edges, T3)."""
    return _salted(pages, parallelism, salt).mapInPandas(
        _edge_batches, schema=EDGE_ROWS_SCHEMA
    )


METADATA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("producer", T.StringType()),
    ]
)


def _metadata_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .kernel.pdfparse import PDFDocument

    for pdf in it:
        out: dict[str, list] = {"url": [], "title": [], "author": [], "producer": []}
        for url, raw in zip(pdf["url"], pdf["html"]):
            raw = bytes(raw)
            if raw[:5] != b"%PDF-":
                continue
            try:
                meta = PDFDocument(raw).metadata()
            except Exception:
                continue
            out["url"].append(url)
            out["title"].append(meta.get("Title"))
            out["author"].append(meta.get("Author"))
            out["producer"].append(meta.get("Producer"))
        yield pd.DataFrame(out)


def extract_metadata_df(
    pages: DataFrame, parallelism: int = 32, salt: bool = False
) -> DataFrame:
    """pages table → PDF /Info metadata rows (Title/Author/Producer)."""
    return _salted(pages, parallelism, salt).mapInPandas(
        _metadata_batches, schema=METADATA_SCHEMA
    )


def doc_text(page_rows: DataFrame) -> DataFrame:
    """Per-doc extracted text: pages '\n'-joined in page order.

    sort_array over (page_no, text) structs keeps the agg shuffle-free of
    window functions; one groupBy shuffle keyed by url.
    """
    return (
        page_rows.where(F.col("error").isNull())
        .groupBy("url")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("page_no", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.count("*").cast("long").alias("n_pages"),
        )
    )
