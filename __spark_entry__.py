"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (byte-identity oracle:
the goldens are pure SQL functions of the ``documents`` table, see
``pdfplumber_golang_spark/spec.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfplumber_golang_spark import pipeline, spec
from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction (PDF parse + HTML strip) on sf0.001."""
    pages = load_or_build_pages(spark, "/root/testdata/sf0.001")
    page_rows = pipeline.extract_pages(pages)
    return pipeline.doc_text(page_rows)


# --------------------------------------------------------------- queries ---

def _q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate-strip: extracted text per url (byte-identity)."""
    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "html")
    return pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")


def _q_extract_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF parse + layout: extracted text per url (byte-identity)."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    return pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")


def _q_page_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url page/char counts for PDF docs (structural invariants)."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    rows = pipeline.extract_pages(pages)
    return (
        rows.where(F.col("error").isNull())
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def _q_error_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed payloads must produce exactly one error row each."""
    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "malformed")
    rows = pipeline.extract_pages(pages)
    return (
        rows.where(F.col("error").isNotNull())
        .select("url")
        .groupBy("url")
        .agg(F.count("*").cast("long").alias("n_errors"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_text_html": _q_extract_html,
        "extract_text_pdf": _q_extract_pdf,
        "pdf_page_counts": _q_page_counts,
        "error_routing": _q_error_routing,
    }


def oracle_sql() -> dict[str, str]:
    w, mp_lines = spec.PDF_WRAP, spec.PDF_MULTIPAGE_LINES
    per_page = spec.PDF_LINES_PER_PAGE
    return {
        "extract_text_html": spec.html_golden_duckdb_sql(spec.SQL_IS_HTML),
        "extract_text_pdf": spec.pdf_golden_duckdb_sql(spec.SQL_IS_PDF),
        # n_lines = ceil(len/80); multipage docs have ceil(n_lines/3) pages,
        # others 1 page (driver docs are < 3200 chars); n_chars = len(text)
        # (spaces are real char objects).
        "pdf_page_counts": f"""
SELECT {spec.SQL_URL} AS url,
       CASE WHEN doc_id % 10 = 9
            THEN CAST(((length(text) - 1) // {w}) // {mp_lines} + 1 AS BIGINT)
            ELSE CAST(((length(text) - 1) // {w}) // {per_page} + 1 AS BIGINT)
       END AS n_pages,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE {spec.SQL_IS_PDF}
""",
        "error_routing": f"""
SELECT {spec.SQL_URL} AS url, CAST(1 AS BIGINT) AS n_errors
FROM documents
WHERE doc_id % {spec.MALFORMED_MOD} = {spec.MALFORMED_REM}
""",
    }
