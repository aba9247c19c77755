#!/usr/bin/env python
"""Basic usage — mirror of the reference's examples/basic_usage.go.

Single-document facade (driver-side) AND the Spark pipeline over a corpus.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pdfplumber_golang_spark import api
from pdfplumber_golang_spark.kernel.pdfwrite import build_pdf


def facade_demo() -> None:
    data, _ = build_pdf(1, "Dummy PDF file for the basic usage example", "pdf_plain")
    doc = api.open_bytes(data)

    meta = doc.metadata()
    print(f"Title: {meta.get('Title')}")
    print(f"Author: {meta.get('Author')}")
    print(f"Pages: {doc.page_count()}")

    page = doc.get_page(1)
    print(f"Page 1 dimensions: {page.width:.2f} x {page.height:.2f}")
    print(f"Text: {page.extract_text()}")
    print(f"Found {len(page.extract_tables())} tables")
    print(f"Characters: {len(page.chars)}")
    print(f"Lines: {len(page.edges)}")
    print(f"Rectangles: {len(page.rects)}")

    cropped = page.crop((0, 700, 300, 792))
    print(f"Cropped chars: {len(cropped.chars)}")

    wide = page.filter(lambda c: c[7] > 4.0)  # width > 4pt
    print(f"Wide chars: {len(wide.chars)}")


def pipeline_demo() -> None:
    from pdfplumber_golang_spark import pipeline
    from pdfplumber_golang_spark.session import get_spark
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    spark = get_spark(app="basic_usage", cores=4)
    pages = load_or_build_pages(spark, "/root/testdata/sf0.001").limit(50)
    docs = pipeline.doc_text(pipeline.extract_pages(pages, parallelism=4))
    for row in docs.limit(3).collect():
        print(f"{row.url}: {row.n_pages} page(s), {row.n_chars} chars")
    spark.stop()


if __name__ == "__main__":
    facade_demo()
    if "--spark" in sys.argv:
        pipeline_demo()
