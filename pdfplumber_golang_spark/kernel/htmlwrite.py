"""Deterministic synthetic-HTML writer (fixture generator).

Builds a Common-Crawl-style page: nav/header/sidebar/footer boilerplate
(short, link-dense blocks) wrapping the main content as <article><p> chunks
of HTML_CHUNK_WORDS words. Golden extracted text = the <p> chunk texts joined
by '\n' (spec.html_golden). Used only to synthesize corpora.
"""

from __future__ import annotations

from .. import spec


def build_html(doc_id: int, body: str) -> bytes:
    chunks = spec.chunk_words(body)
    paras = "".join(f"<p>{c}</p>\n" for c in chunks)
    h = doc_id % 97
    nav_links = " ".join(
        f'<a href="/s{j}">section {j}</a>' for j in range(5)
    )
    side_items = "".join(
        f'<li><a href="/rel{doc_id % 7}/{j}">related item {j}</a></li>'
        for j in range(4)
    )
    page = f"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>doc {doc_id} — host{h}.example</title>
<style>body {{ font: 14px sans-serif; }} nav a {{ color: blue; }}</style>
<script>var pageId = {doc_id}; trackView(pageId);</script>
</head>
<body>
<nav>{nav_links}</nav>
<header><h1>Document {doc_id}</h1><p>host{h}.example archive</p></header>
<div class="layout">
<aside class="sidebar"><h3>Related</h3><ul>{side_items}</ul></aside>
<article id="main">
{paras}</article>
</div>
<footer><p>&copy; 2024 host{h}.example — <a href="/terms">terms</a>
<a href="/privacy">privacy</a> <a href="/about">about</a></p></footer>
</body>
</html>
"""
    return page.encode("utf-8")
