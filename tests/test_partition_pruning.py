"""Input-table partition pruning: the Iceberg-style layout the 10^12-doc
pipeline reads (partitioned by capture time) must prune at plan time, so a
time-bounded extraction job scans only its slice."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_dir(spark):
    root = tempfile.mkdtemp(prefix="partpages_")
    pages = load_or_build_pages(spark, SF_DIR).withColumn(
        "capture_hour", F.date_format("warc_ts", "yyyy-MM-dd-HH")
    )
    pages.write.mode("overwrite").partitionBy("capture_hour").parquet(root)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_date_filter_prunes_partitions(spark, part_dir):
    df = spark.read.parquet(part_dir)
    n_dates = df.select("capture_hour").distinct().count()
    assert n_dates > 1
    one_day = df.where(F.col("capture_hour") == "2024-01-01-00")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the date predicate must be a partition filter on the scan, not a
    # post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    assert "capture_hour" in plan.split("PartitionFilters:")[1][:200]
    # and it actually restricts the scan
    assert one_day.count() < df.count()
    assert one_day.select("capture_hour").distinct().count() == 1


def test_payload_columns_pruned_from_scan(spark, part_dir):
    """Column pruning: a metadata-only query must not read the payload."""
    df = spark.read.parquet(part_dir).select("url", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in read_schema and "text" not in read_schema
