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


def run_extraction(
    spark, sf_dir: str, parallelism: int, repeat: int = 1
) -> tuple[int, int]:
    """The headline job: full extraction over the pages table.
    Returns (n_docs, n_pages)."""
    from pyspark.sql import functions as F

    from pdfplumber_golang_spark import pipeline
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    pages = load_or_build_pages(spark, sf_dir).select("url", "html")
    if repeat > 1:
        # deterministic job scaling: replay payloads under url#rN suffixes —
        # amortizes fixed overheads without regenerating corpora
        reps = spark.range(repeat).select(F.col("id").cast("int").alias("rep"))
        pages = pages.crossJoin(F.broadcast(reps)).select(
            F.concat_ws("#r", "url", "rep").alias("url"), "html"
        )
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

    # Same-window hardware calibration (VERDICT r2 #1): this shared box's
    # absolute speed swings ~2x between windows on git-identical code, so
    # every BENCH_rN stamps (a) best-of-N per query and (b) the box's raw
    # multiprocess zlib throughput measured immediately before AND after
    # the query loop.  Cross-round comparison = normalize each query's
    # best-of-N by the calib ratio; a "regression" inside the calib delta
    # is box noise, not code.
    best_of = int(os.environ.get("SPARK_GRAFT_BENCH_BESTOF", "3"))
    calib_before = box_speed()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}

    def timed(name: str, fn) -> None:
        secs = []
        for _ in range(best_of):
            t0 = time.perf_counter()
            fn()
            secs.append(round(time.perf_counter() - t0, 3))
        runs[name] = secs
        timings[name] = min(secs)

    extract_counts: list[tuple[int, int]] = []
    timed(
        "extract_full",
        lambda: extract_counts.append(
            run_extraction(spark, SF_DIR, parallelism=CPUS)
        ),
    )
    n_docs, n_pages = extract_counts[0]

    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "layout_page_text",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "text_langid",
        "ann_bruteforce",
        # relational + curation headliners (added r4): the scan-agg, the
        # 6-way broadcast star, the two-phase cumsum, and the JVM-side
        # PII scrubber — the non-extraction shapes a corpus run exercises
        "tpch_q1",
        "tpch_q5",
        "shard_packing",
        "curation_pii_scrub",
        # r5: the exact substring baseline and its mod-p sampled scale
        # path, benched as a pair — the winnowed wall-time win is the
        # visible part of a ~p x shuffle-volume cut (11.1 s vs 6.9 s at
        # sf0.1/32 cores in the r5 quiet-window measurement)
        "dedup_substring",
        "dedup_substring_winnowed",
    ):
        timed(name, lambda: qs[name](spark, SF_DIR).count())

    # big-corpus extraction (VERDICT r1 #7): the kernel-dominated number —
    # at ~160x the sf0.1 corpus the ~4s fixed stage overhead is <2% of
    # wall, so round-over-round deltas and the scaling harness measure the
    # same thing. Corpus materialization is one-time (.bench_cache).
    from pyspark.sql import functions as F

    from pdfplumber_golang_spark import pipeline

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "160"))
    big = spark.read.parquet(_scale_corpus(repeat))
    # warm every Python worker (package import paid outside the timing)
    pipeline.extract_pages(big.limit(3000), parallelism=CPUS).count()
    big_counts: list[int] = []

    def run_big() -> None:
        rows = pipeline.extract_pages(big, parallelism=CPUS)
        agg = pipeline.doc_text(rows).agg(
            F.count("*").alias("docs"), F.sum("n_pages").alias("pages")
        ).collect()[0]
        big_counts.append(int(agg["docs"]))

    timed("extract_big", run_big)
    big_docs = big_counts[0]

    calib_after = box_speed()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "extraction+ops wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_runs": runs,
        "best_of": best_of,
        "calib_zlib_kops_per_sec": {
            "before": calib_before,
            "after": calib_after,
        },
        "hw_ceiling_eff": hw_ceiling(4),
        "sf": _sf_tag(SF_DIR),
        "docs": n_docs,
        "pages": n_pages,
        "extract_docs_per_sec": round(n_docs / timings["extract_full"], 1),
        "big_docs": big_docs,
        "big_repeat": repeat,
        "big_docs_per_sec": round(big_docs / timings["extract_big"], 1),
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


_CHILD_CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pdfplumber_golang_spark.session import get_spark
from pdfplumber_golang_spark import pipeline
spark = get_spark(app="bench-scale", cores={cores})
big = spark.read.parquet({corpus!r})
# warm: pre-spawn every Python worker + import the kernel (untimed)
pipeline.extract_pages(big.limit(3000), parallelism={cores}).count()
t0 = time.perf_counter()
rows = pipeline.extract_pages(big, parallelism={cores})
agg = pipeline.doc_text(rows).agg(F.count("*").alias("d"),
                                  F.sum("n_pages").alias("p")).collect()[0]
dt = time.perf_counter() - t0
docs = int(agg["d"])
print(json.dumps({{"cores": {cores}, "sec": round(dt, 3),
                   "docs": docs, "docs_per_sec": round(docs / dt, 1)}}))
spark.stop()
"""


def load_warm(spark, sf_dir, parallelism=8):
    """Materialize input AND pre-spawn/warm every Python worker (package
    import cost is paid here, not inside the timed run)."""
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    load_or_build_pages(spark, sf_dir).count()
    run_extraction(spark, sf_dir, parallelism=parallelism)


def _scale_corpus(repeat: int, n_files: int = 256) -> str:
    """One-time materialization of the repeat-scaled corpus as a many-file
    parquet: fine-grained balanced scan splits, the shape a real 10^12-doc
    Iceberg table presents (many files >> cores), so task skew — one hot
    partition gating the stage — can't mask scaling."""
    tag = f"{os.path.basename(os.path.normpath(SF_DIR))}_rep{repeat}_{n_files}"
    path = os.path.join(REPO, ".bench_cache", tag)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdfplumber_golang_spark.session import get_spark
    from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

    active = SparkSession.getActiveSession()
    spark = active or get_spark(app="bench-corpus", cores=CPUS)
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html")
    reps = spark.range(repeat).select(F.col("id").cast("int").alias("rep"))
    big = pages.crossJoin(F.broadcast(reps)).select(
        F.concat_ws("#r", "url", "rep").alias("url"), "html"
    )
    big.repartition(n_files).write.mode("overwrite").parquet(path)
    if active is None:
        spark.stop()
    return path


def box_speed(nproc: int = 16, total_kops: int = 96) -> float:
    """Absolute same-window hardware calibration: multiprocess zlib
    compress+decompress round-trips (in thousands) per second at ``nproc``
    workers — the raw speed of the resource the extraction kernel is bound
    on.  Stamped before/after the headline query loop so BENCH_rN numbers
    are comparable across rounds on this noisy shared box: normalize a
    query's best-of-N by the calib ratio before calling it a regression."""
    import multiprocessing as mp

    total = total_kops * 1000
    with mp.Pool(nproc) as p:
        p.map(_HW_WORK, [50] * nproc)  # warm the workers
        t0 = time.perf_counter()
        p.map(_HW_WORK, [total // nproc] * nproc, chunksize=1)
        dt = time.perf_counter() - t0
    return round(total / dt / 1000.0, 2)


def hw_ceiling(n: int) -> float:
    """Hardware calibration: raw multiprocess zlib throughput efficiency
    from n to 4n processes — the best ANY pipeline can scale on this box.
    (Measured here: linear to 16 procs, flat 16->32 — an effective 16-core
    ceiling despite nproc=32 — so the honest in-sandbox pair is 4 -> 16.)"""
    import multiprocessing as mp
    import zlib

    data = b"abcdefgh" * 4000

    def work(k):
        x = 0
        for _ in range(k):
            x += len(zlib.decompress(zlib.compress(data, 6)))
        return x

    def run(nproc, total):
        with mp.Pool(nproc) as p:
            p.map(_HW_WORK, [50] * nproc)
            t0 = time.perf_counter()
            p.map(_HW_WORK, [total // nproc] * nproc, chunksize=1)
            return time.perf_counter() - t0

    total = 64000
    t1 = run(n, total)
    t4 = run(4 * n, total)
    return round((t1 / t4) / 4.0, 3)


def _HW_WORK(k):
    import zlib

    data = b"abcdefgh" * 4000
    x = 0
    for _ in range(k):
        x += len(zlib.decompress(zlib.compress(data, 6)))
    return x


def scaling(n: int = 4) -> None:
    """Same materialized job, fresh JVM, at local[n] and local[4n]."""
    repeat = int(os.environ.get("SPARK_GRAFT_SCALE_REPEAT", "160"))
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))
    corpus = _scale_corpus(repeat)
    best: dict[int, dict] = {}
    all_runs = []
    # interleave rounds: this box's background noise swings absolute
    # throughput ±20%, so take the best observation per core count
    for _ in range(rounds):
        for cores in (n, 4 * n):
            code = _CHILD_CODE.format(repo=REPO, cores=cores, corpus=corpus)
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, env=dict(os.environ),
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            r = json.loads(line)
            all_runs.append(r)
            if cores not in best or r["docs_per_sec"] > best[cores]["docs_per_sec"]:
                best[cores] = r
    r1, r4 = best[n], best[4 * n]
    eff = (r4["docs_per_sec"] / r1["docs_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling efficiency N->4N",
                "value": round(eff, 3),
                "unit": "ratio",
                "runs": [r1, r4],
                "all_runs": all_runs,
                "hw_ceiling_eff": hw_ceiling(n),
                "n": n,
                "sf": _sf_tag(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling(int(os.environ.get("SPARK_GRAFT_SCALE_N", "4")))
    else:
        main()
