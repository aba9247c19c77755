"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely (the SURVEY §4 'co-locate joins via bucketing'
scale lever). Asserted on the physical plan, not just the result."""


import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select(
        "doc_id", F.length("text").alias("n"), (F.col("doc_id") % 7).alias("grp")
    )
    # default spark-warehouse dir (cwd, gitignored); warehouse.dir is static.
    # a fresh session's in-memory catalog doesn't know tables left by a
    # previous run, so clear the locations on disk too
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_stats")
    for t in ("b_docs", "b_stats"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    (docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
         .saveAsTable("b_docs"))
    (stats.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
          .saveAsTable("b_stats"))
    a = spark.table("b_docs")
    b = spark.table("b_stats")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id").select("doc_id", "lang", "n")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located sort-merge join: buckets align, no shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
