"""Spark end-to-end pipeline tests at sf0.001 (driver-contract mirror)."""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from pdfplumber_golang_spark import pipeline, spec
from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return load_or_build_pages(spark, SF_DIR).cache()


def test_pages_table_shape(pages):
    cols = dict(pages.dtypes)
    assert cols["url"] == "string"
    assert cols["warc_ts"] == "timestamp"
    assert cols["html"] == "binary"
    assert cols["text"] == "string"
    assert cols["lang"] == "string"
    assert pages.count() == 500


def test_entry_byte_identity(spark, pages):
    got = {r.url: r.text for r in entrymod.entry(spark).collect()}
    want = {r.url: r.text for r in pages.where("variant <> 'malformed'").collect()}
    assert len(got) == len(want) == 494
    mismatches = [u for u in want if got.get(u) != want[u]]
    assert mismatches == []


def test_queries_match_oracles(spark):
    """Mini version of the driver's CORRECTNESS gate at sf0.001."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "region", "nation",
              "customer", "supplier", "part", "orders", "lineitem"):
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR).toPandas()
        assert name in oracles, name
        odf = con.sql(oracles[name]).df()
        assert len(sdf) == len(odf), (name, len(sdf), len(odf))
        assert sorted(sdf.columns) == sorted(odf.columns), name
        # order-insensitive: sort both by ALL columns (driver-gate semantics)
        cols = sorted(sdf.columns)
        svals = sorted(tuple(str(v) for v in r) for r in sdf[cols].itertuples(index=False))
        ovals = sorted(tuple(str(v) for v in r) for r in odf[cols].itertuples(index=False))
        assert svals == ovals, (name, next((a, b) for a, b in zip(svals, ovals) if a != b))


def test_mega_doc_salting_routes(pages, spark):
    mega = pages.where(f"doc_id % {spec.MEGA_MOD} = {spec.MEGA_REM}")
    n_mega = mega.count()
    assert n_mega >= 1
    # salt=True exercises the explicit skew path (url-hash + mega salt)
    out = pipeline.doc_text(pipeline.extract_pages(mega, salt=True)).collect()
    assert len(out) == n_mega
    want = {r.url: r.text for r in mega.collect()}
    for r in out:
        assert r.text == want[r.url]


def test_chars_relation(spark, pages):
    one = pages.where("variant = 'pdf_plain'").limit(4)
    chars = pipeline.extract_chars(one)
    pdf = chars.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) >= {"url", "page_no", "char_idx", "text", "x0", "y0"}
    # chars per url equals golden length (spaces are chars; newlines are not)
    got = pdf.groupby("url").size().to_dict()
    for r in one.select("url", F.length(F.regexp_replace("text", "\n", "")).alias("n")).collect():
        assert got[r.url] == r.n
