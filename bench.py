#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: run the extraction job in fresh subprocess JVMs at N and 4N
cores on the SAME input and report throughput at both plus scaling
efficiency (the sandbox stand-in for the north rule's N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))


def _sf_tag(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_extraction(spark, sf_dir: str, parallelism: int) -> tuple[int, int]:
    """The headline job: full extraction over the pages table.
    Returns (n_docs, n_pages)."""
    from pyspark.sql import functions as F

    from pdfplumber_golang_spark import pipeline
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    pages = load_or_build_pages(spark, sf_dir)
    rows = pipeline.extract_pages(pages, parallelism=parallelism)
    agg = pipeline.doc_text(rows).agg(
        F.count("*").alias("docs"), F.sum("n_pages").alias("pages")
    ).collect()[0]
    return int(agg["docs"]), int(agg["pages"])


def main() -> None:
    sys.path.insert(0, REPO)
    from pdfplumber_golang_spark.session import get_spark
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    spark = get_spark(app="bench", cores=CPUS)

    # pages-table build is one-time input materialization (excluded from
    # timing, like the Iceberg table it stands in for)
    load_or_build_pages(spark, SF_DIR).count()

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    n_docs, n_pages = run_extraction(spark, SF_DIR, parallelism=CPUS)
    timings["extract_full"] = round(time.perf_counter() - t0, 3)

    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "layout_page_text",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "text_langid",
        "ann_bruteforce",
    ):
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "extraction+ops wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_tag(SF_DIR),
        "docs": n_docs,
        "pages": n_pages,
        "extract_docs_per_sec": round(n_docs / timings["extract_full"], 1),
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


_CHILD_CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pdfplumber_golang_spark.session import get_spark
import bench
spark = get_spark(app="bench-scale", cores={cores})
bench.load_warm(spark, {sf_dir!r})
t0 = time.perf_counter()
docs, pages = bench.run_extraction(spark, {sf_dir!r}, parallelism={cores})
dt = time.perf_counter() - t0
print(json.dumps({{"cores": {cores}, "sec": round(dt, 3),
                   "docs": docs, "docs_per_sec": round(docs / dt, 1)}}))
spark.stop()
"""


def load_warm(spark, sf_dir):
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    load_or_build_pages(spark, sf_dir).count()


def scaling(n: int = 8) -> None:
    """Same job, fresh JVM, at local[n] and local[4n]."""
    results = []
    for cores in (n, 4 * n):
        code = _CHILD_CODE.format(repo=REPO, cores=cores, sf_dir=SF_DIR)
        env = dict(os.environ)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, env=env
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    r1, r4 = results
    eff = (r4["docs_per_sec"] / r1["docs_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling efficiency N->4N",
                "value": round(eff, 3),
                "unit": "ratio",
                "runs": results,
                "sf": _sf_tag(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling(int(os.environ.get("SPARK_GRAFT_SCALE_N", "8")))
    else:
        main()
