#!/usr/bin/env python
"""Cluster entry point: checkpointed extraction via spark-submit.

  spark-submit --py-files $(python -c 'from pdfplumber_golang_spark.session \
      import package_zip; print(package_zip())') \
      scripts/run_extract.py --input <pages parquet/iceberg> --output <dir> \
      [--buckets 256] [--group-size 16] [--salt]

On a real cluster the SparkSession comes from spark-submit's conf (master,
executor counts); locally this falls back to session.get_spark. The job is
resumable: re-submitting with the same --output skips completed buckets via
the lineage table (plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table path (parquet)")
    ap.add_argument("--output", required=True, help="checkpointed output dir")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--group-size", type=int, default=16)
    ap.add_argument("--parallelism", type=int, default=32)
    ap.add_argument("--salt", action="store_true",
                    help="explicit url-hash+mega-doc salted repartition "
                         "(use when the source layout is skewed)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:
        from pdfplumber_golang_spark.session import get_spark

        spark = get_spark(app="run_extract", cores=args.parallelism)
    else:  # spark-submit provided the session/conf
        spark = active

    from pdfplumber_golang_spark.plans import checkpoint

    pages = spark.read.parquet(args.input)
    stats = checkpoint.run_checkpointed(
        spark,
        pages,
        args.output,
        n_buckets=args.buckets,
        group_size=args.group_size,
        parallelism=args.parallelism,
        salt=args.salt,
    )
    lineage = checkpoint.lineage_table(spark, args.output)
    agg = lineage.groupBy().sum("n_docs", "n_pages", "n_errors").collect()[0]
    stats["total_docs"] = int(agg[0] or 0)
    stats["total_pages"] = int(agg[1] or 0)
    stats["total_errors"] = int(agg[2] or 0)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
