"""Checkpointed, resumable extraction runs with per-partition lineage.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Design (SURVEY §4.3):

  * documents are bucketed by ``pmod(xxhash64(url), n_buckets)`` — a stable,
    data-independent assignment, so a resumed run sees identical buckets;
  * buckets are processed in ``group_size`` batches; each batch writes its
    page rows to ``out/pages/bucket=<b>/`` (parquet, overwrite-idempotent)
    and appends one lineage row per bucket to ``out/lineage/`` with
    (bucket, n_docs, n_pages, n_chars, n_words, n_errors, kernel_sha,
    wall_s, completed_at_run);
  * resume = read the lineage table, skip buckets already recorded
    (anti-join on bucket id), process the remainder.

At 10^12 docs each bucket group is one Spark job over a bounded slice, so a
preempted cluster loses at most one group's work, and the lineage table is
the audit trail tying every output partition to the kernel version that
produced it.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline
from ..session import package_zip


def kernel_sha() -> str:
    """Content hash of the shipped kernel (from the --py-files zip name)."""
    return os.path.basename(package_zip()).split("-")[-1].split(".")[0]


def bucketed(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    """Buckets already recorded in the lineage table. Probed THROUGH Spark
    (read + catch AnalysisException) rather than os.path, so resume works
    on hdfs:// and s3a:// paths — the cluster scenario this module exists
    for — not just the local filesystem (ADVICE r1)."""
    from pyspark.errors import AnalysisException

    lineage_dir = os.path.join(out_dir, "lineage")
    try:
        lineage = spark.read.parquet(lineage_dir)
    except AnalysisException:  # PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA
        return set()
    # bounded: one control row per bucket, never document payload
    rows = lineage.select("bucket").distinct().collect()
    return {r.bucket for r in rows}


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    group_size: int = 4,
    parallelism: int = 32,
    max_groups: int | None = None,
    salt: bool = False,
) -> dict:
    """Extract all pages, checkpointing per bucket group. Returns stats.

    Safe to re-invoke after a crash: completed buckets are skipped via the
    lineage table; a partially-written bucket group is overwritten whole
    (parquet dir per bucket, overwrite mode -> idempotent)."""
    src = bucketed(pages, n_buckets)
    done = completed_buckets(spark, out_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    sha = kernel_sha()
    stats = {"buckets_done_before": len(done), "buckets_run": 0, "docs": 0}
    run_id = int(time.time() * 1000)

    for gi, gstart in enumerate(range(0, len(todo), group_size)):
        if max_groups is not None and gi >= max_groups:
            break  # incremental operation / crash simulation in tests
        group = todo[gstart : gstart + group_size]
        t0 = time.perf_counter()
        batch = src.where(F.col("bucket").isin(group))
        rows = pipeline.extract_pages(
            batch.select("url", "html"), parallelism=parallelism, salt=salt
        )
        rows = rows.join(
            bucketed(pages.select("url"), n_buckets), "url", "left"
        )
        rows.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(out_dir, "pages", f"group={group[0]}")
        )
        wall = time.perf_counter() - t0
        # lineage: one row per bucket in this group (explicit schema so an
        # empty bucket group — zero matching docs — still reads back)
        from pyspark.sql import types as T

        out_schema = T.StructType(
            pipeline.PAGE_ROWS_SCHEMA.fields
            + [T.StructField("bucket", T.IntegerType())]
        )
        written = spark.read.schema(out_schema).parquet(
            os.path.join(out_dir, "pages", f"group={group[0]}")
        )
        metrics = written.groupBy("bucket").agg(
            F.countDistinct("url").alias("n_docs"),
            F.count("*").alias("n_pages"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_words").alias("n_words"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
        # every bucket in the group gets a lineage row, even if it matched
        # zero docs — otherwise empty buckets re-run on every resume
        group_df = spark.createDataFrame([(b,) for b in group], ["bucket"])
        lineage = (
            group_df.join(metrics, "bucket", "left")
            .fillna(0, ["n_docs", "n_pages", "n_chars", "n_words", "n_errors"])
            .withColumn("kernel_sha", F.lit(sha))
            .withColumn("wall_s", F.lit(round(wall, 3)))
            .withColumn("run_id", F.lit(run_id))
        )
        lineage.write.mode("append").parquet(os.path.join(out_dir, "lineage"))
        stats["buckets_run"] += len(group)
        stats["docs"] += written.select("url").distinct().count()
    return stats


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(out_dir, "pages")).parquet(
        os.path.join(out_dir, "pages", "group=*")
    )


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "lineage"))
