"""WARC source tests: round-trip records (plain + per-record gzip members,
the Common Crawl layout), Spark binaryFile ingestion, end-to-end extraction
parity with the parquet-sourced pipeline."""

import datetime
import os

import pytest

from pdfplumber_golang_spark import pipeline, spec
from pdfplumber_golang_spark.kernel.pdfwrite import build_payload
from pdfplumber_golang_spark.sources import warc

TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _records(n=12):
    import duckdb

    rows = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet'"
        f" where doc_id % 97 <> 13 limit {n}"
    ).fetchall()
    recs, goldens = [], {}
    for doc_id, text in rows:
        payload, golden, _v = build_payload(doc_id, text)
        url = spec.url_of(doc_id)
        recs.append((url, TS + datetime.timedelta(seconds=doc_id), payload))
        goldens[url] = golden
    return recs, goldens


def test_record_roundtrip_plain_and_gzip():
    recs, _ = _records(5)
    for gz in (False, True):
        blob = warc.build_warc(recs, gz=gz)
        parsed = warc.parse_warc(blob)
        assert [(u, p) for u, _, p in parsed] == [(u, p) for u, _, p in recs]
        assert parsed[0][1].year == 2024


def test_warc_ignores_non_response_records():
    recs, _ = _records(2)
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    blob = info + warc.build_warc(recs)
    assert len(warc.parse_warc(blob)) == 2


def test_spark_warc_extraction_parity(spark, tmp_path):
    recs, goldens = _records(12)
    d = tmp_path / "warcs"
    os.makedirs(d)
    (d / "part-0.warc").write_bytes(warc.build_warc(recs[:6]))
    (d / "part-1.warc.gz").write_bytes(warc.build_warc(recs[6:], gz=True))
    pages = warc.read_warc_pages(spark, str(d))
    assert dict(pages.dtypes)["html"] == "binary"
    out = pipeline.doc_text(pipeline.extract_pages(pages, parallelism=4))
    got = {r.url: r.text for r in out.collect()}
    assert got == goldens
