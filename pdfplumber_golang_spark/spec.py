"""Deterministic corpus spec — single source of truth.

Everything that the pages-table generator, the extraction kernels, the
golden-text builders, and the DuckDB oracle SQL must agree on lives here.
The corpus is synthesized from the driver's ``documents`` parquet
(``doc_id, text, lang, source, n_chars``) with NO randomness: every byte of
every page is a pure function of ``(doc_id, text)``, so the expected
("golden") extracted text is computable independently in ANSI SQL.

Input-table shape per BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Reference for the capability being reproduced: pyhub-apps/pdfplumber-golang
(see SURVEY.md). Fixture-design mirror of /root/reference/pdf_test.go and
cmd/compare_accurate/main.go: goldens are produced once by the canonical
kernel and checked in / recomputed deterministically.
"""

from __future__ import annotations

# ---------------------------------------------------------------- layout ---
#: chars per PDF text line (PDF golden = text re-wrapped at this width)
PDF_WRAP = 80
#: text lines per PDF page (single-page for all driver docs except multipage)
PDF_LINES_PER_PAGE = 40
#: text lines per page for the 'multipage' variant (forces a page-tree walk)
PDF_MULTIPAGE_LINES = 3
#: words per HTML paragraph (HTML golden = text with '\n' at chunk bounds)
HTML_CHUNK_WORDS = 12

#: PDF page geometry / font (US Letter, Helvetica 12, leading 12)
PAGE_W, PAGE_H = 612.0, 792.0
TEXT_X0, TEXT_Y0 = 72.0, 720.0
FONT_SIZE = 12.0
LEADING = 12.0

#: layout-analysis tolerances (reference defaults, text_organizer.go:17-22)
X_TOLERANCE = 3.0
Y_TOLERANCE = 3.0

# ------------------------------------------------------------- variants ----
# Pure function of doc_id. Percentages approximate FIXTURES.md §1
# (~60% HTML, ~40% PDF across four PDF variants).
#   m = doc_id % 10
#   0-5 -> html ; 6 -> pdf_plain ; 7 -> pdf_flate ;
#   8 -> pdf_cmap (doc_id % 20 == 8) / pdf_kerned (doc_id % 20 == 18)
#   9 -> pdf_multipage
# Malformed rows (error-path): doc_id % 97 == 13  (payload = truncated junk)
# Mega rows (skew-path, HTML only): doc_id % 499 == 7 -> body repeated x50
MALFORMED_MOD, MALFORMED_REM = 97, 13
MEGA_MOD, MEGA_REM = 499, 7
MEGA_REPEAT = 50


def variant_of(doc_id: int) -> str:
    if doc_id % MALFORMED_MOD == MALFORMED_REM:
        return "malformed"
    m = doc_id % 10
    if m <= 5:
        return "html"
    if m == 6:
        # classic-xref, PDF 1.5 xref-stream, and RC4-encrypted files
        if doc_id % 40 == 16:
            return "pdf_xrefstream"
        if doc_id % 40 == 36:
            return "pdf_encrypted"
        return "pdf_plain"
    if m == 7:
        return "pdf_flate"
    if m == 8:
        return "pdf_cmap" if doc_id % 20 == 8 else "pdf_kerned"
    return "pdf_multipage"


def url_of(doc_id: int) -> str:
    return f"https://host{doc_id % 97}.example/doc{doc_id}"


# SQL fragments (ANSI, runnable by both DuckDB and Spark SQL) -------------

#: url expression over a `documents` row
#: portable: Spark SQL requires STRING; DuckDB accepts STRING as VARCHAR alias
SQL_URL = "'https://host' || CAST(doc_id % 97 AS STRING) || '.example/doc' || CAST(doc_id AS STRING)"

#: predicate selecting rows of a given variant class
SQL_IS_HTML = f"(doc_id % {MALFORMED_MOD} <> {MALFORMED_REM} AND doc_id % 10 <= 5)"
SQL_IS_PDF = f"(doc_id % {MALFORMED_MOD} <> {MALFORMED_REM} AND doc_id % 10 >= 6)"
SQL_IS_MEGA = f"(doc_id % {MEGA_MOD} = {MEGA_REM})"

#: HTML body text (mega rows repeat the body MEGA_REPEAT times, space-joined)
SQL_HTML_BODY = (
    f"CASE WHEN {SQL_IS_MEGA} THEN repeat(text || ' ', {MEGA_REPEAT - 1}) || text "
    "ELSE text END"
)


def html_golden_duckdb_sql(where: str) -> str:
    """DuckDB query: (url, text) with golden HTML-extracted text = body
    re-chunked into HTML_CHUNK_WORDS-word paragraphs joined by newline.
    Scalar list functions only (no lateral joins)."""
    n = HTML_CHUNK_WORDS
    return f"""
WITH base AS (
  SELECT doc_id, {SQL_URL} AS url, string_split({SQL_HTML_BODY}, ' ') AS words
  FROM documents WHERE {where}
)
SELECT url,
       array_to_string(
         list_transform(
           generate_series(0, CAST((len(words) - 1) // {n} AS BIGINT)),
           i -> array_to_string(list_slice(words, i * {n} + 1, i * {n} + {n}), ' ')
         ), chr(10)) AS text
FROM base
"""


def pdf_golden_duckdb_sql(where: str) -> str:
    """DuckDB query: (url, text) with golden PDF-extracted text =
    original text hard-wrapped at PDF_WRAP chars, lines joined by \\n
    (page boundaries are transparent: pages are '\\n'-joined too)."""
    w = PDF_WRAP
    return f"""
SELECT {SQL_URL} AS url,
       array_to_string(
         list_transform(
           generate_series(0, CAST((length(text) - 1) // {w} AS BIGINT)),
           i -> substr(text, CAST(i * {w} + 1 AS INT), {w})
         ), chr(10)) AS text
FROM documents WHERE {where}
"""


def chunk_words(body: str, n: int = HTML_CHUNK_WORDS) -> list[str]:
    """Split single-spaced text into n-word paragraphs (generator + golden)."""
    words = body.split(" ")
    return [" ".join(words[i : i + n]) for i in range(0, len(words), n)]


def wrap_chars(text: str, n: int = PDF_WRAP) -> list[str]:
    """Hard-wrap text at n chars (PDF line content + golden)."""
    return [text[i : i + n] for i in range(0, len(text), n)] or [""]


def html_golden(body: str) -> str:
    return "\n".join(chunk_words(body))


def pdf_golden(text: str) -> str:
    return "\n".join(wrap_chars(text))


def body_of(doc_id: int, text: str) -> str:
    """HTML body text for a doc (mega rows get the repeated body)."""
    if doc_id % MEGA_MOD == MEGA_REM:
        return " ".join([text] * MEGA_REPEAT)
    return text
