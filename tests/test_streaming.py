"""Streaming-ingestion parity: streamed extraction == batch extraction."""

import os
import shutil
import tempfile

import pytest

from pdfplumber_golang_spark import pipeline
from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages
from pdfplumber_golang_spark.streaming.ingest import stream_extract

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_")
    paths = {k: os.path.join(root, k) for k in ("in", "out", "ckpt")}
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def test_stream_matches_batch(spark, dirs):
    pages = load_or_build_pages(spark, SF_DIR).limit(120).cache()
    pages.write.mode("overwrite").parquet(dirs["in"])

    q = stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)

    streamed = spark.read.parquet(dirs["out"])
    batch = pipeline.extract_pages(pages, parallelism=8)
    s = {(r.url, r.page_no): r.text for r in streamed.collect()}
    b = {(r.url, r.page_no): r.text for r in batch.collect()}
    assert s == b

    # restart with no new files: exactly-once, no duplicate outputs
    q2 = stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(60)
    assert spark.read.parquet(dirs["out"]).count() == len(s)


def test_windowed_agg_stream_matches_batch(spark, dirs):
    import shutil as sh

    from pdfplumber_golang_spark.streaming.windowed import (
        stream_windowed_event_counts,
        windowed_event_counts,
    )

    os.makedirs(dirs["in"], exist_ok=True)
    sh.copy(f"{SF_DIR}/events.parquet", os.path.join(dirs["in"], "part-0.parquet"))
    streamed = stream_windowed_event_counts(spark, dirs["in"], dirs["ckpt"]).toPandas()
    batch = windowed_event_counts(spark, SF_DIR).toPandas()
    key = ["window_start", "event_type"]
    s = streamed.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    for col in ("window_start", "event_type", "n_events", "sum_value"):
        assert s[col].astype(str).tolist() == b[col].astype(str).tolist(), col
