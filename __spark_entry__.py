"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (byte-identity oracle:
the goldens are pure SQL functions of the ``documents`` table, see
``pdfplumber_golang_spark/spec.py``).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfplumber_golang_spark import pipeline, spec
from pdfplumber_golang_spark.functions import ann, curation, dedup, multimodal, text_analysis
from pdfplumber_golang_spark.operators import layout_ops, synth_rel, table_ops, tpch
from pdfplumber_golang_spark.plans import cache as plan_cache
from pdfplumber_golang_spark.sources.pagesgen import (
    build_graphics_pages,
    build_curves_pages,
    build_rowrects_pages,
    build_texttable_pages,
    load_or_build_pages,
)


_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package zip to executors of an externally created session
    (the driver harness builds its own SparkSession without addPyFile;
    pandas-UDF closures are pickled by reference and need the package
    importable on workers)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    try:
        from pdfplumber_golang_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added or local import fallback (cwd) applies
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction (PDF parse + HTML strip) on sf0.001."""
    _ensure_shipped(spark)
    pages = load_or_build_pages(spark, "/root/testdata/sf0.001")
    page_rows = pipeline.extract_pages(pages)
    return pipeline.doc_text(page_rows)


# --------------------------------------------------------------- queries ---

def _q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate-strip: extracted text per url (byte-identity)."""
    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "html")
    return pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")


def _q_extract_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew remedy under the byte-identity gate (VERDICT r2 #5): the same
    HTML extraction as extract_text_html but with salt=True and the
    mega-doc threshold forced down to 1 KiB, so BOTH salt branches run —
    roughly half the corpus (payloads > 1 KiB) scatters into the N_SALT
    mega buckets, the rest takes the url-hash path.  The oracle is the
    UNCHANGED html golden: a green row proves the salting repartition is
    output-invariant (it only moves rows between partitions)."""
    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "html")
    rows = pipeline.extract_pages(pages, salt=True, mega_bytes=1024)
    return pipeline.doc_text(rows).select("url", "text")


def _q_extract_text_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source end-to-end: the HTML docs serialized as Common-Crawl
    layout .warc.gz (one gzip member per record), read back through
    sources/warc.read_warc_pages (binaryFile scan -> mapInPandas record
    parser), routed through extraction — output must equal the same html
    goldens the pages-table path produces (source parity, S1/S15)."""
    import datetime
    import os as _os
    import shutil
    import tempfile

    from pdfplumber_golang_spark.kernel.htmlwrite import build_html
    from pdfplumber_golang_spark.sources import warc as W

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .where(F.expr(spec.SQL_IS_HTML))
        .toPandas()
    )
    epoch = datetime.datetime(2024, 1, 1)
    files: dict[int, list] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        rec = (
            spec.url_of(doc_id),
            epoch + datetime.timedelta(seconds=13 * doc_id),
            build_html(doc_id, spec.body_of(doc_id, text)),
        )
        files.setdefault(doc_id % 8, []).append(rec)
    root = tempfile.mkdtemp(prefix="warc_q_")
    try:
        for k, recs in files.items():
            with open(_os.path.join(root, f"part-{k}.warc.gz"), "wb") as f:
                f.write(W.build_warc(recs, gz=True))
        pages = W.read_warc_pages(spark, root)
        out = pipeline.doc_text(pipeline.extract_pages(pages)).select(
            "url", "text"
        )
        pdf = out.toPandas()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=out.schema)


def _q_extract_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table incremental consumption under the hash gate
    (sources/snapshots.py — the Iceberg workflow stand-in): half the html
    corpus committed as snapshot v1 and extracted; the other half APPENDED
    as v2 and extracted via read_incremental (only the added files reach
    Spark); the union of the two extraction outputs must equal the direct
    path's byte-identical goldens."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.sources import snapshots as S

    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant") == "html"
    ).select("url", "html")
    first = pages.where(F.crc32(F.col("url")) % 2 == 0)
    second = pages.where(F.crc32(F.col("url")) % 2 == 1)
    root = tempfile.mkdtemp(prefix="snap_q_")
    try:
        S.write_snapshot(first, root)
        out1 = pipeline.doc_text(
            pipeline.extract_pages(S.read_snapshot(spark, root))
        ).select("url", "text")
        S.append_snapshot(second, root)
        inc = S.read_incremental(spark, root, since_version=1)
        out2 = pipeline.doc_text(pipeline.extract_pages(inc)).select(
            "url", "text"
        )
        out = out1.unionByName(out2)
        pdf = out.toPandas()  # materialize before the table dir disappears
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=out.schema)


def _q_snapshot_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full snapshot-table lifecycle under one oracle row: write half
    the corpus as v1, append the rest (v2), COMPACT the layout (v3 — a
    replace snapshot; row set must be unchanged), then an add-column
    schema-evolution append (v4) of late rows carrying only (doc_id,
    tag) — the evolved reader must fill the old rows' new column and the
    new rows' old columns with NULL.  The final read's (doc_id, tag)
    pairs are stated closed-form by the oracle."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.sources import snapshots as S

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="snap_life_")
    try:
        t = os.path.join(root, "tbl")
        S.write_snapshot(docs.where(F.col("doc_id") % 2 == 0), t)
        S.append_snapshot(docs.where(F.col("doc_id") % 2 == 1), t)
        S.compact(spark, t, target_files=4)
        late = docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.lit("late").alias("tag"),
        )
        S.append_snapshot_evolving(late, t)
        out = S.read_snapshot(spark, t).select(
            F.col("doc_id").cast("long").alias("doc_id"), "tag"
        )
        pdf = out.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema="doc_id long, tag string")


def _q_dedup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming exact dedup under the oracle gate (VERDICT r3
    #7): the documents table replayed as a file stream — event times 13 s
    apart from doc_id, PLUS a duplicate copy of every 5th doc one hour
    later, so the stream really must drop rows — deduped by md5(text) via
    dropDuplicatesWithinWatermark and drained with Trigger.AvailableNow
    into an exactly-once parquet sink.  The horizon covers the replay
    span, so the emitted hash set must equal the batch DISTINCT set
    exactly: one row per distinct content hash, none lost, none doubled.
    (Which group member wins inside a microbatch is execution-order
    dependent, so the gate projects the deterministic content hash;
    first-occurrence semantics are pinned by the batch-twin parity test
    in tests/test_streaming.py.)"""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.streaming.dedup import stream_dedup_docs

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, 13 * doc_id)"
        ).alias("ts"),
        "text",
    )
    dups = base.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("ts + make_dt_interval(0, 1, 0, 0)").alias("ts"),
        "text",
    )
    root = tempfile.mkdtemp(prefix="sdedup_q_")
    try:
        in_dir = os.path.join(root, "in")
        base.unionAll(dups).repartition(8).write.parquet(in_dir)
        q = stream_dedup_docs(
            spark, in_dir, os.path.join(root, "out"), os.path.join(root, "ckpt")
        )
        q.awaitTermination(600)
        out = spark.read.parquet(os.path.join(root, "out")).select("h")
        pdf = out.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema="h string")


def _q_event_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment under the oracle gate: the events stream
    joined per-micro-batch against the broadcast static user dimension
    (customer -> segment).  Stateless (no watermark); the drained result
    must equal the batch inner join the oracle states."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.streaming.enrich import stream_enrich, user_dim

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    root = tempfile.mkdtemp(prefix="senrich_q_")
    try:
        in_dir = os.path.join(root, "in")
        ev.repartition(8).write.parquet(in_dir)
        q = stream_enrich(
            spark, in_dir, user_dim(spark, sf_dir),
            os.path.join(root, "out"), os.path.join(root, "ckpt"),
        )
        q.awaitTermination(600)
        out = spark.read.schema(
            "event_id long, user_id long, event_type string, segment string"
        ).parquet(os.path.join(root, "out"))
        pdf = out.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        pdf, schema="event_id long, user_id long, event_type string, segment string"
    )


def _q_event_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join under the oracle gate: the events
    table replayed as a file stream on BOTH sides (clicks, views), each
    watermarked; a click attributes the same user's views from the
    preceding 6 hours.  The watermark horizon covers the replay span, so
    the drained result must equal the batch inner join the oracle
    states — row-exact, both join keys and the interval bound."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.streaming.join import stream_interval_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    root = tempfile.mkdtemp(prefix="sjoin_q_")
    try:
        in_dir = os.path.join(root, "in")
        ev.repartition(8).write.parquet(in_dir)
        q = stream_interval_join(
            spark, in_dir, os.path.join(root, "out"), os.path.join(root, "ckpt")
        )
        q.awaitTermination(600)
        out = spark.read.schema(
            "click_id long, view_id long, user_id long"
        ).parquet(os.path.join(root, "out"))
        pdf = out.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema="click_id long, view_id long, user_id long")


def _q_event_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT-outer interval join under the oracle gate: the
    unmatched-click class the inner form drops.  The replay ends with
    two punctuation (barrier) files so the AvailableNow drain actually
    acts on its final watermark (see streaming.join.write_join_barriers
    for the three traps); barriers use negative users and never reach
    the output, so the drained result must equal the plain batch LEFT
    JOIN the oracle states — including every NULL-view click.  view_id
    is COALESCEd to -1 on both engines (a NULL long becomes float64 NaN
    in pandas on one engine and nullable Int64 on the other depending on
    version — -1 keeps the hash comparison in integer space)."""
    import datetime
    import shutil
    import tempfile

    from pdfplumber_golang_spark.streaming.join import (
        stream_interval_join_left,
        write_join_barriers,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    root = tempfile.mkdtemp(prefix="sjoinl_q_")
    try:
        in_dir = os.path.join(root, "in")
        ev.repartition(8).write.parquet(in_dir)
        maxts = ev.agg(F.max("ts")).collect()[0][0]
        write_join_barriers(spark, in_dir, maxts, watermark_days=45)
        q = stream_interval_join_left(
            spark, in_dir, os.path.join(root, "out"), os.path.join(root, "ckpt")
        )
        q.awaitTermination(600)
        out = spark.read.schema(
            "click_id long, view_id long, user_id long"
        ).parquet(os.path.join(root, "out"))
        pdf = out.select(
            "click_id",
            F.coalesce("view_id", F.lit(-1)).alias("view_id"),
            "user_id",
            F.col("view_id").isNotNull().alias("matched"),
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        pdf,
        schema="click_id long, view_id long, user_id long, matched boolean",
    )


def _q_extract_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming extraction under the hash gate: the pages
    table written as many parquet files, drained by streaming/ingest.
    stream_extract (readStream → the same mapInPandas kernel →
    exactly-once parquet file sink, Trigger.AvailableNow); the sink's
    reassembled text must be byte-identical to the direct-path goldens."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.streaming.ingest import stream_extract

    pages = load_or_build_pages(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_q_")
    try:
        in_dir = os.path.join(root, "in")
        pages.repartition(16).write.parquet(in_dir)
        q = stream_extract(
            spark, in_dir,
            os.path.join(root, "out"), os.path.join(root, "ckpt"),
            parallelism=16,
        )
        q.awaitTermination(600)
        rows = spark.read.schema(pipeline.PAGE_ROWS_SCHEMA).parquet(
            os.path.join(root, "out")
        )
        out = pipeline.doc_text(rows).select("url", "text")
        pdf = out.toPandas()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=out.schema)


def _q_extract_checkpointed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resumable checkpointed runner (plans/checkpoint.run_checkpointed:
    url-hash buckets, per-bucket lineage + metrics, overwrite-idempotent
    groups) driven end-to-end: its materialized output must reassemble to
    the SAME byte-identical goldens as the direct path — the north rule's
    checkpoint/resume machinery under the hash gate, not just pytest."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.plans import checkpoint

    pages = load_or_build_pages(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ckpt_q_")
    try:
        checkpoint.run_checkpointed(
            spark, pages, root, n_buckets=8, group_size=4, parallelism=16
        )
        rows = spark.read.parquet(os.path.join(root, "pages"))
        out = pipeline.doc_text(rows.drop("bucket", "group")).select(
            "url", "text"
        )
        pdf = out.toPandas()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=out.schema)


def _q_extract_ckpt_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kill-after-k-buckets RESUME under the hash gate (VERDICT r2 #7):
    the first run_checkpointed invocation stops after one bucket group
    (max_groups=1 — the simulated preemption), the second resumes from
    the lineage table.  Before returning the reassembled text (which must
    still be byte-identical to the direct-path goldens), the query asserts
    from lineage that the first group's buckets were NOT recomputed: they
    keep the first run_id, appear exactly once, and the resume reports
    them as already done."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.plans import checkpoint

    pages = load_or_build_pages(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ckpt_rsm_")
    try:
        st1 = checkpoint.run_checkpointed(
            spark, pages, root, n_buckets=8, group_size=4, parallelism=16,
            max_groups=1,
        )
        st2 = checkpoint.run_checkpointed(
            spark, pages, root, n_buckets=8, group_size=4, parallelism=16
        )
        lin = checkpoint.lineage_table(spark, root).toPandas()
        assert st1["buckets_run"] == 4 and st2["buckets_done_before"] == 4
        run_ids = sorted(lin["run_id"].unique())
        assert len(run_ids) == 2, run_ids
        first = lin[lin["run_id"] == run_ids[0]]
        # the crashed run's buckets survive resume untouched: one lineage
        # row each, still stamped with the first run_id
        assert len(first) == 4 and lin["bucket"].nunique() == len(lin)
        rows = spark.read.parquet(os.path.join(root, "pages"))
        out = pipeline.doc_text(rows.drop("bucket", "group")).select(
            "url", "text"
        )
        pdf = out.toPandas()  # materialize before the temp dir disappears
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=out.schema)


def _q_extract_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF parse + layout: extracted text per url (byte-identity)."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    return pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")


def _q_page_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url page/char counts for PDF docs (structural invariants)."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    rows = pipeline.extract_pages(pages)
    return (
        rows.where(F.col("error").isNull())
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def _q_error_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed payloads must produce exactly one error row each."""
    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "malformed")
    rows = pipeline.extract_pages(pages)
    return (
        rows.where(F.col("error").isNotNull())
        .select("url")
        .groupBy("url")
        .agg(F.count("*").cast("long").alias("n_errors"))
    )


# ---- M2: layout analysis as DataFrame window/agg operators (SURVEY §2.5-7)

def _q_line_sessionize(spark, sf_dir):
    """Y2 sessionize: line count per url from lag+cumsum line ids."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    return (
        layout_ops.with_line_ids(chars)
        .groupBy("url")
        .agg(
            F.max("line_id").cast("long").alias("n_lines"),
            F.count("*").cast("long").alias("n_chars"),
        )
    )


def _q_line_texts(spark, sf_dir):
    """Y3+Y6: per-line reassembled text (gap space-insertion rule)."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    return layout_ops.lines(chars).select(
        "url", F.col("line_id").cast("long").alias("line_id"), "line_text"
    )


def _q_word_agg(spark, sf_dir):
    """Y4+Y5: word sessionize + aggregation — counts per url."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    return (
        layout_ops.words(chars)
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def _q_layout_page_text(spark, sf_dir):
    """Y7: full document text re-assembled by the DataFrame pipeline —
    must be byte-identical to the PDF golden wrap."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    return layout_ops.doc_text_from_chars(chars).select("url", "text")


def _q_edge_dedup(spark, sf_dir):
    """G4/G5: near-duplicate segment removal on snapped keys."""
    edges = synth_rel.edges_rel(spark, sf_dir)
    return (
        layout_ops.dedup_edges(edges)
        .groupBy("url")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )


def _q_edge_orientation(spark, sf_dir):
    """T2: h/v classification counts per url."""
    edges = synth_rel.edges_rel(spark, sf_dir)
    return (
        layout_ops.classify_orientation(edges)
        .groupBy("url", "orientation")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )


def _q_edge_consolidate(spark, sf_dir):
    """G8: collinear segment consolidation — runs + total span per url."""
    edges = synth_rel.edges_rel(spark, sf_dir)
    runs = layout_ops.consolidate_edges(edges)
    return runs.groupBy("url").agg(
        F.count("*").cast("long").alias("n_runs"),
        F.round(F.sum(F.col("hi") - F.col("lo")), 3).alias("total_span"),
        F.sum("n_segments").cast("long").alias("n_segments"),
    )


def _q_column_histogram(spark, sf_dir):
    """T8: snapped char-x0 histogram, count >= 3."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    return layout_ops.column_histogram(chars).select(
        "url", F.col("col_x").cast("double").alias("col_x"), "n_chars"
    )


#: crop window for the G1/G2 bbox-filter query
CROP = (100.0, 500.0, 300.0, 720.0)


def _q_crop_filter(spark, sf_dir):
    """G1/G2: bbox-intersection filter (Intersects predicate,
    /root/reference/pkg/pdf/types.go:43-45) over the chars relation."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    cx0, cy0, cx1, cy1 = CROP
    kept = chars.where(
        (F.col("x0") <= cx1) & (F.col("x1") >= cx0)
        & (F.col("y0") <= cy1) & (F.col("y1") >= cy0)
    )
    return kept.groupBy("url").agg(
        F.count("*").cast("long").alias("n_in_crop"),
        F.round(F.min("x0"), 3).alias("min_x0"),
        F.round(F.max("x1"), 3).alias("max_x1"),
    )


def _q_y_inversion(spark, sf_dir):
    """Y9: pdfplumber top-left coordinate projection
    (top = page_height - y1; document_ledongthuc.go:185-196)."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    top = F.lit(spec.PAGE_H) - F.col("y1")
    return chars.groupBy("url").agg(
        F.round(F.min(top), 3).alias("min_top"),
        F.round(F.max(top), 3).alias("max_top"),
    )


def _q_pdf_words(spark, sf_dir):
    """Kernel chars → DataFrame word aggregation over REAL parsed PDFs:
    per-url word count and word-char count."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    chars = pipeline.extract_chars(pages)
    return (
        layout_ops.words(chars)
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def _q_word_bboxes(spark, sf_dir):
    """Y5 full output check: word text + bbox values (not just counts),
    oracle = independent SQL window implementation of the same sessionize."""
    chars = synth_rel.chars_rel(spark, sf_dir)
    w = layout_ops.words(chars)
    return w.select(
        "url",
        F.col("line_id").cast("long").alias("line_id"),
        F.col("word_id").cast("long").alias("word_id"),
        "word_text",
        F.round("x0", 3).alias("x0"),
        F.round("y0", 3).alias("y0"),
        F.round("x1", 3).alias("x1"),
        F.round("y1", 3).alias("y1"),
        "n_chars",
    )


def _q_word_spans(spark, sf_dir):
    """Span-level provenance over the EXTRACTED corpus: every token of
    the final extracted text with its exact [start, end) character
    offsets — the substring invariants a training pipeline needs to map
    quality signals / annotations back into documents.  The extracted
    text joins tokens with single-byte separators (space within lines,
    newline between), so offsets derive from token lengths alone; the
    oracle restates the same cumulative form over the byte-identical
    golden text, making any extraction OR offset defect a hash break.
    Offsets are defined in UTF-8 BYTES (octet_length here, strlen in the
    oracle): an engine-native length() would count UTF-16 code units on
    Spark but code points on DuckDB, diverging on any non-BMP char —
    bytes are the one unit both engines (and downstream slicing of the
    stored UTF-8 text) agree on."""
    from pyspark.sql import Window

    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "html")
    docs = pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")
    toks = docs.select(
        "url",
        F.posexplode(
            F.split(F.regexp_replace("text", "\n", " "), " ")
        ).alias("idx", "word"),
    )
    w = (
        Window.partitionBy("url")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.octet_length("word") + 1).over(w), F.lit(0)
    )
    return toks.select(
        "url",
        F.col("idx").cast("long").alias("idx"),
        "word",
        start.cast("long").alias("span_start"),
        (start + F.octet_length("word")).cast("long").alias("span_end"),
    )


def _q_word_spans_pdf(spark, sf_dir):
    """The PDF twin of word_spans: provenance offsets over text that came
    through the full byte-level kernel (xref -> filters -> content
    interpreter -> layout reassembly).  Together with the HTML row this
    closes the north rule's "extracted text/spans per document" for both
    document classes; the same single-char-separator invariant holds
    because layout assembly joins words with spaces and lines with
    newlines.  Offsets are UTF-8 bytes (octet_length / strlen) — see
    _q_word_spans for why engine-native length() is not portable."""
    from pyspark.sql import Window

    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    docs = pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")
    toks = docs.select(
        "url",
        F.posexplode(
            F.split(F.regexp_replace("text", "\n", " "), " ")
        ).alias("idx", "word"),
    )
    w = (
        Window.partitionBy("url")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.octet_length("word") + 1).over(w), F.lit(0))
    return toks.select(
        "url",
        F.col("idx").cast("long").alias("idx"),
        "word",
        start.cast("long").alias("span_start"),
        (start + F.octet_length("word")).cast("long").alias("span_end"),
    )


def _q_pdf_metadata(spark, sf_dir):
    """Trailer /Info metadata per PDF url (reference defines the Metadata
    struct but never fills it — we implement the read)."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    return pipeline.extract_metadata_df(pages)


def _q_pdf_line_texts(spark, sf_dir):
    """Y3+Y6 over REAL parsed PDF chars: per-line reassembled text must be
    byte-identical to the wrapped source lines."""
    pages = load_or_build_pages(spark, sf_dir).where(
        F.col("variant").startswith("pdf_")
    )
    chars = pipeline.extract_chars(pages)
    lines = layout_ops.lines(chars)
    # line_id restarts per page; global line number = (page_no-1)*per_page
    # + line_id (multipage variant has its own lines/page)
    return lines.select(
        "url",
        ((F.col("page_no") - 1) * _lines_per_page_col() + F.col("line_id"))
        .cast("long")
        .alias("line_no"),
        "line_text",
    )


def _lines_per_page_col():
    """Lines per page differ for the multipage variant (doc_id % 10 == 9);
    recover doc_id from the url suffix."""
    doc_id = F.regexp_extract("url", r"doc(\d+)$", 1).cast("long")
    return F.when(doc_id % 10 == 9, F.lit(spec.PDF_MULTIPAGE_LINES)).otherwise(
        F.lit(spec.PDF_LINES_PER_PAGE)
    )


def _q_extract_tables(spark, sf_dir):
    """T1-T6: ruling-line lattice table extraction, flattened to cells."""
    pages = build_graphics_pages(spark, sf_dir)
    return pipeline.extract_tables_df(pages).select(
        "url",
        F.col("table_no").cast("long").alias("table_no"),
        F.col("row_no").cast("long").alias("row_no"),
        F.col("col_no").cast("long").alias("col_no"),
        "cell_text",
    )


def _q_extract_tables_text(spark, sf_dir):
    """T12 via the kernel path with the text strategy FORCED (skips the
    line pass, ExtractTables table_extractor.go:55-61) on a ruling-free
    corpus — the option-plumbing oracle (VERDICT r1 #3)."""
    pages = build_texttable_pages(spark, sf_dir)
    return pipeline.extract_tables_df(
        pages, vertical_strategy="text", horizontal_strategy="text"
    ).select(
        "url",
        F.col("table_no").cast("long").alias("table_no"),
        F.col("row_no").cast("long").alias("row_no"),
        F.col("col_no").cast("long").alias("col_no"),
        "cell_text",
    )


def _q_extract_tables_text_relational(spark, sf_dir):
    """T12 as pure DataFrame algebra (table_ops.text_tables) on the same
    ruling-free corpus — the relational-fallback oracle (VERDICT r1 #4).
    The lattice path finds nothing here (zero edges), so these cells come
    entirely from the text-detection fallback."""
    # persist: edges and chars both consume the generated pages; without
    # it the PDF build+parse mapInPandas runs twice (measured 21 s -> 9 s
    # at sf0.1). At scale the source is a real table and this is a cheap
    # double scan instead.
    pages = plan_cache.persist(build_texttable_pages(spark, sf_dir))
    edges = pipeline.extract_edges(pages)
    chars = pipeline.extract_chars(pages)
    return table_ops.extract_tables_relational(edges, chars).select(
        "url",
        F.col("table_no").cast("long").alias("table_no"),
        F.col("row_no").cast("long").alias("row_no"),
        F.col("col_no").cast("long").alias("col_no"),
        "cell_text",
    )


def _q_extract_tables_rowrects(spark, sf_dir):
    """T7 row-rectangle path + T9 column assignment + T10 row fill + T11
    empty-column pruning, end-to-end on the stacked-rects corpus
    (extractTableFromRowRectangles, table_extractor.go:510-586)."""
    pages = build_rowrects_pages(spark, sf_dir)
    return pipeline.extract_tables_df(pages).select(
        "url",
        F.col("table_no").cast("long").alias("table_no"),
        F.col("row_no").cast("long").alias("row_no"),
        F.col("col_no").cast("long").alias("col_no"),
        "cell_text",
    )


_TRAP_EDGES = [
    # one trap per filter clause (page 612x792):
    (0.5, 100.0, 0.5, 300.0),      # vertical ON the left border  -> G6 drop
    (100.0, 791.5, 300.0, 791.5),  # horizontal ON the top border -> G6 drop
    (580.0, 100.0, 580.0, 300.0),  # right of x_max=575           -> G7 drop
    (100.0, 10.0, 300.0, 10.0),    # below y_min=20               -> G7 drop
    (100.0, 100.0, 200.0, 200.0),  # diagonal (not axis-aligned)  -> G7 drop
]


def _q_edge_filter_funnel(spark, sf_dir):
    """G6 (page-border line filter) -> G7 (content-margin candidate
    filter) over the synthetic edges relation augmented with one trap edge
    per filter clause; the grid edges all survive."""
    edges = synth_rel.edges_rel(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.expr(spec.SQL_URL).alias("url")
    )
    traps = docs.select(
        "url",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("x0"), F.lit(b).alias("y0"),
                        F.lit(c).alias("x1"), F.lit(d).alias("y1"),
                    )
                    for a, b, c, d in _TRAP_EDGES
                ]
            )
        ).alias("e"),
    ).select(
        "url",
        F.lit(1).alias("page_no"),
        F.col("e.x0").cast("double").alias("x0"),
        F.col("e.y0").cast("double").alias("y0"),
        F.col("e.x1").cast("double").alias("x1"),
        F.col("e.y1").cast("double").alias("y1"),
        F.lit(1.0).alias("width"),
        F.lit("line").alias("src"),
    )
    all_edges = edges.unionByName(traps)
    kept = layout_ops.filter_table_candidate_lines(
        layout_ops.filter_page_border_lines(all_edges, 612.0, 792.0)
    )
    return kept.groupBy("url").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.round(F.sum(F.col("x0") + F.col("y1")), 3).alias("sum_x0y1"),
    )


def _q_pdf_images(spark, sf_dir):
    """Images relation end-to-end (beyond-parity: the reference defines
    ImageObject, types.go:216-245, but only ever initializes empty Images
    slices): per-doc fixture PDFs with 1+doc_id%3 DeviceGray XObjects
    built closed-form in doc_id (kernel/pdfwrite.build_image_pdf), parsed
    by the kernel's Do operator, every header field and placed bbox
    hash-checked against the oracle's independent restatement."""
    import pandas as pd
    from pyspark.sql import types as T

    from pdfplumber_golang_spark.kernel.pdfwrite import build_image_pdf

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("html", T.BinaryType()),
        ]
    )

    def build(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "html": [build_image_pdf(int(d)) for d in pdf["doc_id"]],
                }
            )

    pages = docs.select(
        "doc_id", F.expr(spec.SQL_URL).alias("url")
    ).mapInPandas(build, schema=schema)
    return pipeline.extract_images(pages).select(
        "url",
        F.col("img_idx").cast("long").alias("img_idx"),
        "name", "width", "height", "colorspace", "bpc",
        "x0", "y0", "x1", "y1",
    )


def _pdf_images_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {spec.SQL_URL} AS url FROM documents
),
ks AS (SELECT unnest(generate_series(0, 2)) AS k),
img AS (
  SELECT url, k,
         1 + (doc_id + k) % 16 AS w, 1 + (doc_id + k) % 12 AS h
  FROM d, ks WHERE k < 1 + doc_id % 3
)
SELECT url, CAST(k AS BIGINT) AS img_idx, 'Im' || CAST(k AS STRING) AS name,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       'DeviceGray' AS colorspace, CAST(8 AS BIGINT) AS bpc,
       CAST(50 + 60 * k AS DOUBLE) AS x0,
       CAST(100 + 40 * k AS DOUBLE) AS y0,
       CAST(50 + 60 * k + 10 * w AS DOUBLE) AS x1,
       CAST(100 + 40 * k + 10 * h AS DOUBLE) AS y1
FROM img
UNION ALL
SELECT url, CAST(1 + doc_id % 3 AS BIGINT) AS img_idx, 'inline' AS name,
       CAST(2 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
       'G' AS colorspace, CAST(8 AS BIGINT) AS bpc,
       CAST(400 AS DOUBLE) AS x0, CAST(600 AS DOUBLE) AS y0,
       CAST(420 AS DOUBLE) AS x1, CAST(610 AS DOUBLE) AS y1
FROM d
"""


def _q_pdf_annots(spark, sf_dir):
    """Annotations relation end-to-end (beyond-parity: the reference's
    AnnotationObject, types.go:247-276, is never populated there): per-doc
    fixture PDFs with 1+doc_id%2 Link annots (/A→/URI) plus one Text
    annot (/Contents), all fields closed-form in doc_id."""
    import pandas as pd
    from pyspark.sql import types as T

    from pdfplumber_golang_spark.kernel.pdfwrite import build_annot_pdf

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("html", T.BinaryType()),
        ]
    )

    def build(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "html": [build_annot_pdf(int(d)) for d in pdf["doc_id"]],
                }
            )

    pages = docs.select(
        "doc_id", F.expr(spec.SQL_URL).alias("url")
    ).mapInPandas(build, schema=schema)
    return pipeline.extract_annotations(pages).select(
        "url",
        F.col("annot_idx").cast("long").alias("annot_idx"),
        "subtype", "x0", "y0", "x1", "y1", "contents", "link_url",
    )


def _pdf_annots_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {spec.SQL_URL} AS url, 1 + doc_id % 2 AS n_links
  FROM documents
),
ks AS (SELECT unnest(generate_series(0, 1)) AS k),
links AS (
  SELECT url, k AS annot_idx, 'Link' AS subtype,
         CAST(40 + 80 * k AS DOUBLE) AS x0,
         CAST(700 - 20 * k AS DOUBLE) AS y0,
         CAST(40 + 80 * k + 60 AS DOUBLE) AS x1,
         CAST(700 - 20 * k + 12 AS DOUBLE) AS y1,
         '' AS contents,
         'https://link' || CAST(doc_id AS STRING) || '-' ||
           CAST(k AS STRING) || '.example' AS link_url
  FROM d, ks WHERE k < n_links
),
notes AS (
  SELECT url, n_links AS annot_idx, 'Text' AS subtype,
         CAST(500 AS DOUBLE) AS x0, CAST(50 AS DOUBLE) AS y0,
         CAST(520 AS DOUBLE) AS x1, CAST(70 AS DOUBLE) AS y1,
         'note ' || CAST(doc_id AS STRING) AS contents, '' AS link_url
  FROM d
)
SELECT url, CAST(annot_idx AS BIGINT) AS annot_idx, subtype,
       x0, y0, x1, y1, contents, link_url
FROM (SELECT * FROM links UNION ALL SELECT * FROM notes)
"""


def _q_pdf_forms(spark, sf_dir):
    """Form-XObject execution end-to-end (no form support exists in the
    reference): the visible text lives inside a Form XObject with its own
    /Resources/Font, placed twice by page-level cm translations — the
    extracted text must read the form's line twice in top-down order."""
    import pandas as pd
    from pyspark.sql import types as T

    from pdfplumber_golang_spark.kernel.pdfwrite import build_form_pdf

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("html", T.BinaryType()),
        ]
    )

    def build(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "html": [build_form_pdf(int(d)) for d in pdf["doc_id"]],
                }
            )

    pages = docs.select(
        "doc_id", F.expr(spec.SQL_URL).alias("url")
    ).mapInPandas(build, schema=schema)
    return pipeline.doc_text(pipeline.extract_pages(pages)).select(
        "url", "text"
    )


def _q_pdf_curves(spark, sf_dir):
    """Curves relation: non-axis stroked point chains + non-rect fills
    (kernel/content.py _emit_stroke/_emit_fill; reference
    content_stream_parser.go:1259-1357) — counts + per-curve bboxes."""
    pages = build_curves_pages(spark, sf_dir)
    return pipeline.extract_curves(pages).select(
        "url",
        F.col("curve_no").cast("long").alias("curve_no"),
        F.col("n_points").cast("long").alias("n_points"),
        F.round("x0", 3).alias("x0"),
        F.round("y0", 3).alias("y0"),
        F.round("x1", 3).alias("x1"),
        F.round("y1", 3).alias("y1"),
    )


def _q_event_sessions_stateful(spark, sf_dir):
    """Custom stateful streaming operator: session-gap sessionization via
    applyInPandasWithState (EventTimeTimeout). Emits a session when a
    successor event closes it or when the event-time watermark passes
    session_end + GAP; sessions still open at drain stay in state. The
    oracle states that exact set in SQL (lag/cumsum sessionize + LEAD /
    final-watermark predicate). Integer-valued columns only (float sums
    are order-sensitive across engines)."""
    import shutil
    import tempfile

    from pdfplumber_golang_spark.streaming.sessionize import stream_sessionize

    root = tempfile.mkdtemp(prefix="sessionize_q_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    # time-ordered files (the operator's in-order-arrival contract)
    ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(in_dir)
    try:
        out = stream_sessionize(spark, in_dir, os.path.join(root, "ckpt"))
        result = out.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_start").cast("long").alias("session_start"),
            F.col("session_end").cast("long").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        # materialize before the temp input dir disappears
        pdf = result.toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=result.schema)


def _q_event_sessions(spark, sf_dir):
    """Classic sessionization over the events stream table: a new session
    starts after a >30-minute gap per user (same lag+cumsum shape as the
    layout line/word sweeps, on a real timestamped relation)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_id").cast("long").alias("session_id"),
        "n_events",
        "sum_value",
    )


def _q_events_windowed(spark, sf_dir):
    """Event-time tumbling-window aggregation (batch twin of the
    Structured Streaming path in streaming/windowed.py)."""
    from pdfplumber_golang_spark.streaming.windowed import windowed_event_counts

    return windowed_event_counts(spark, sf_dir)


def _q_extract_tables_relational(spark, sf_dir):
    """T2+T5+T6 as pure DataFrame algebra: lattice from distinct snapped
    cuts, cell fill via page-keyed range join — same cells as the kernel."""
    pages = plan_cache.persist(build_graphics_pages(spark, sf_dir))  # two consumers
    edges = pipeline.extract_edges(pages)
    chars = pipeline.extract_chars(pages)
    return table_ops.extract_tables_relational(edges, chars).select(
        "url",
        F.col("row_no").cast("long").alias("row_no"),
        F.col("col_no").cast("long").alias("col_no"),
        "cell_text",
    )


def _shipped(fn: Callable) -> Callable:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        # release the PREVIOUS query's persisted intermediates (its result
        # is materialized by the time the harness builds the next query) —
        # bounds cache accumulation in long-lived drivers (ADVICE r2)
        plan_cache.release()
        return fn(spark, sf_dir)

    wrapper.__doc__ = fn.__doc__
    wrapper.__name__ = getattr(fn, "__name__", "query")
    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _shipped(fn)
        for name, fn in _raw_queries().items()
    }


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry ORDER is deliberate (VERDICT r4 #4): the driver harness
    # boards only the first 50 entries per round, so each round rotates
    # queries that have not yet had a driver-green row into positions
    # 1-50.  Round 5 fronts TPC-H, ANN, media, and the table/PDF-geometry
    # suite (driver-unchecked through r4); the r6 rotation should front
    # the events/curation tail marked below.  The FULL board is always
    # regenerated via scripts/full_gate.py into CORRECTNESS_SELF_r{N}.json.
    return {
        # --- rotation r5: driver-unchecked through round 4 (50) ---
        "tpch_q1": tpch.tpch_q1,
        "tpch_q2": tpch.tpch_q2,
        "tpch_q3": tpch.tpch_q3,
        "tpch_q4": tpch.tpch_q4,
        "tpch_q5": tpch.tpch_q5,
        "tpch_q6": tpch.tpch_q6,
        "tpch_q7": tpch.tpch_q7,
        "tpch_q8": tpch.tpch_q8,
        "tpch_q9": tpch.tpch_q9,
        "tpch_q10": tpch.tpch_q10,
        "tpch_q11": tpch.tpch_q11,
        "tpch_q12": tpch.tpch_q12,
        "tpch_q13": tpch.tpch_q13,
        "tpch_q14": tpch.tpch_q14,
        "tpch_q15": tpch.tpch_q15,
        "tpch_q16": tpch.tpch_q16,
        "tpch_q17": tpch.tpch_q17,
        "tpch_q18": tpch.tpch_q18,
        "tpch_q19": tpch.tpch_q19,
        "tpch_q20": tpch.tpch_q20,
        "tpch_q21": tpch.tpch_q21,
        "tpch_q22": tpch.tpch_q22,
        "tpch_q1_rollup": tpch.tpch_q1_rollup,
        "dedup_embedding_cosine": ann.embedding_cosine_dups,
        "dedup_embedding_lsh": ann.dedup_embedding_lsh,
        "ann_bruteforce": ann.ann_bruteforce,
        "ann_lsh": ann.ann_lsh,
        "ann_ivf": ann.ann_ivf,
        "ann_pq": ann.ann_pq,
        "media_features": multimodal.media_features_q,
        "media_pixel_stats": multimodal.media_pixel_stats_q,
        "media_resize": multimodal.media_resize_q,
        "media_frame_sample": multimodal.media_frame_sample_q,
        "extract_tables_lattice": _q_extract_tables,
        "extract_tables_text": _q_extract_tables_text,
        "extract_tables_rowrects": _q_extract_tables_rowrects,
        "extract_tables_text_relational": _q_extract_tables_text_relational,
        "extract_tables_relational": _q_extract_tables_relational,
        "pdf_curves": _q_pdf_curves,
        "pdf_images": _q_pdf_images,
        "pdf_annots": _q_pdf_annots,
        "pdf_forms": _q_pdf_forms,
        "edge_filter_funnel": _q_edge_filter_funnel,
        "crop_filter": _q_crop_filter,
        "y_inversion": _q_y_inversion,
        "pdf_words": _q_pdf_words,
        "pdf_metadata": _q_pdf_metadata,
        "pdf_line_texts": _q_pdf_line_texts,
        "word_bboxes": _q_word_bboxes,
        "shard_packing": curation.shard_packing,
        # --- rotation r6 candidates: still driver-unchecked (10) ---
        "events_windowed_agg": _q_events_windowed,
        "event_sessionize": _q_event_sessions,
        "event_sessionize_stateful": _q_event_sessions_stateful,
        "event_asof_join": synth_rel.asof_join_events,
        "event_range_join": synth_rel.event_range_join,
        "corpus_build": curation.corpus_build,
        "curation_url_canonicalize": curation.url_canonicalize,
        "curation_web_pipeline": curation.web_pipeline,
        "crawl_host_windows": curation.crawl_host_windows_q,
        "mixture_sample": curation.mixture_sample,
        # --- new in r5 (also r6-rotation candidates) ---
        "dedup_substring_winnowed": dedup.substring_pairs_winnowed,
        "ann_ivfpq": ann.ann_ivfpq,
        "event_stream_join_left": _q_event_stream_join_left,
        "bpe_train": text_analysis.bpe_train,
        "text_quality_classifier": text_analysis.quality_classifier,
        "bpe_tokenize": text_analysis.bpe_tokenize,
        # --- driver-green in earlier rounds ---
        "extract_text_html": _q_extract_html,
        "extract_text_warc": _q_extract_text_warc,
        "extract_text_salted": _q_extract_salted,
        "extract_text_checkpointed": _q_extract_checkpointed,
        "extract_text_incremental": _q_extract_incremental,
        "extract_text_streamed": _q_extract_streamed,
        "snapshot_lifecycle": _q_snapshot_lifecycle,
        "dedup_streamed": _q_dedup_streamed,
        "event_stream_join": _q_event_stream_join,
        "event_stream_enrich": _q_event_stream_enrich,
        "extract_text_ckpt_resume": _q_extract_ckpt_resume,
        "extract_text_pdf": _q_extract_pdf,
        "pdf_page_counts": _q_page_counts,
        "page_render": multimodal.render_pdf_pages,
        "error_routing": _q_error_routing,
        "layout_line_sessionize": _q_line_sessionize,
        "layout_line_texts": _q_line_texts,
        "layout_word_agg": _q_word_agg,
        "word_spans": _q_word_spans,
        "word_spans_pdf": _q_word_spans_pdf,
        "layout_page_text": _q_layout_page_text,
        "edge_dedup": _q_edge_dedup,
        "edge_orientation": _q_edge_orientation,
        "edge_consolidate": _q_edge_consolidate,
        "column_histogram": _q_column_histogram,
        # training-data pipeline operators
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash_lsh": dedup.minhash_lsh_candidates,
        "dedup_simhash": dedup.simhash,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_jaccard_verified": dedup.jaccard_verified,
        "dedup_components": dedup.dedup_components,
        "dedup_canonical": dedup.dedup_canonical,
        "dedup_substring": dedup.substring_pairs,
        "dedup_incremental": dedup.dedup_incremental,
        "dedup_bloom_incremental": dedup.dedup_bloom_incremental,
        "text_langid": text_analysis.lang_id,
        "text_langid_trigram": text_analysis.lang_id_trigram,
        "text_quality": text_analysis.quality_score,
        "text_token_count": text_analysis.token_count,
        "text_fingerprint": text_analysis.fingerprint,
        "text_fingerprint_rolling": text_analysis.fingerprint_rolling,
        "corpus_curation": text_analysis.corpus_curation,
        "text_fluency": text_analysis.text_fluency,
        "curation_gopher": curation.gopher_quality,
        "curation_c4_line_dedup": curation.c4_line_dedup,
        "curation_domain_cap": curation.domain_cap,
        "curation_domain_cap_salted": curation.domain_cap_salted,
        "curation_pii_scrub": curation.pii_scrub,
        "curation_gopher_repetition": curation.gopher_repetition,
        "curation_scorecard": curation.curation_scorecard,
    }


def oracle_sql() -> dict[str, str]:
    w, mp_lines = spec.PDF_WRAP, spec.PDF_MULTIPAGE_LINES
    per_page = spec.PDF_LINES_PER_PAGE
    return {
        "extract_text_html": spec.html_golden_duckdb_sql(spec.SQL_IS_HTML),
        "extract_text_warc": spec.html_golden_duckdb_sql(spec.SQL_IS_HTML),
        "extract_text_salted": spec.html_golden_duckdb_sql(spec.SQL_IS_HTML),
        "extract_text_incremental": spec.html_golden_duckdb_sql(spec.SQL_IS_HTML),
        "extract_text_streamed": (
            spec.html_golden_duckdb_sql(spec.SQL_IS_HTML)
            + " UNION ALL "
            + spec.pdf_golden_duckdb_sql(spec.SQL_IS_PDF)
        ),
        "snapshot_lifecycle": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS tag
FROM documents
UNION ALL
SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id, 'late' AS tag
FROM documents WHERE doc_id % 10 = 0
""",
        "dedup_streamed": "SELECT DISTINCT md5(text) AS h FROM documents",
        "event_stream_join": """
SELECT CAST(c.event_id AS BIGINT) AS click_id,
       CAST(v.event_id AS BIGINT) AS view_id,
       CAST(c.user_id AS BIGINT) AS user_id
FROM events c JOIN events v
  ON c.event_type = 'click' AND v.event_type = 'view'
 AND c.user_id = v.user_id
 AND v.ts >= c.ts - INTERVAL 6 HOUR AND v.ts <= c.ts
""",
        "event_stream_join_left": """
SELECT CAST(c.event_id AS BIGINT) AS click_id,
       CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_id,
       CAST(c.user_id AS BIGINT) AS user_id,
       v.event_id IS NOT NULL AS matched
FROM events c LEFT JOIN events v
  ON v.event_type = 'view'
 AND c.user_id = v.user_id
 AND v.ts >= c.ts - INTERVAL 6 HOUR AND v.ts <= c.ts
WHERE c.event_type = 'click'
""",
        "event_stream_enrich": """
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       e.event_type, c.c_mktsegment AS segment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
        "extract_text_checkpointed": (
            spec.html_golden_duckdb_sql(spec.SQL_IS_HTML)
            + " UNION ALL "
            + spec.pdf_golden_duckdb_sql(spec.SQL_IS_PDF)
        ),
        "extract_text_ckpt_resume": (
            spec.html_golden_duckdb_sql(spec.SQL_IS_HTML)
            + " UNION ALL "
            + spec.pdf_golden_duckdb_sql(spec.SQL_IS_PDF)
        ),
        "extract_text_pdf": spec.pdf_golden_duckdb_sql(spec.SQL_IS_PDF),
        # n_lines = ceil(len/80); multipage docs have ceil(n_lines/3) pages,
        # others 1 page (driver docs are < 3200 chars); n_chars = len(text)
        # (spaces are real char objects).
        "pdf_page_counts": f"""
SELECT {spec.SQL_URL} AS url,
       CASE WHEN doc_id % 10 = 9
            THEN CAST(((length(text) - 1) // {w}) // {mp_lines} + 1 AS BIGINT)
            ELSE CAST(((length(text) - 1) // {w}) // {per_page} + 1 AS BIGINT)
       END AS n_pages,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE {spec.SQL_IS_PDF}
""",
        "page_render": f"""
WITH p AS (
  SELECT {spec.SQL_URL} AS url,
         CASE WHEN doc_id % 10 = 9
              THEN ((length(text) - 1) // {w}) // {mp_lines} + 1
              ELSE ((length(text) - 1) // {w}) // {per_page} + 1
         END AS n_pages
  FROM documents WHERE {spec.SQL_IS_PDF}
)
SELECT url, CAST(i AS BIGINT) AS page_no,
       CAST(612 AS BIGINT) AS w_px, CAST(792 AS BIGINT) AS h_px,
       TRUE AS has_glyphs, TRUE AS levels_ok
FROM (SELECT url, unnest(generate_series(1, n_pages)) AS i FROM p)
""",
        "error_routing": f"""
SELECT {spec.SQL_URL} AS url, CAST(1 AS BIGINT) AS n_errors
FROM documents
WHERE doc_id % {spec.MALFORMED_MOD} = {spec.MALFORMED_REM}
""",
        # ---- M2 layout/edge operators: closed-form oracles -------------
        "layout_line_sessionize": f"""
SELECT {spec.SQL_URL} AS url,
       CAST((length(text) - 1) // {w} + 1 AS BIGINT) AS n_lines,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
        "layout_line_texts": f"""
SELECT {spec.SQL_URL} AS url, CAST(i + 1 AS BIGINT) AS line_id,
       substr(text, CAST(i * {w} + 1 AS INT), {w}) AS line_text
FROM (SELECT doc_id, text,
             unnest(generate_series(0, (length(text) - 1) // {w})) AS i
      FROM documents)
""",
        "word_spans_pdf": f"""
WITH g AS ({spec.pdf_golden_duckdb_sql(spec.SQL_IS_PDF).strip()}),
toks AS (
  SELECT url, i - 1 AS idx, t[i] AS word
  FROM (SELECT url, string_split(replace(text, chr(10), ' '), ' ') AS t,
               unnest(generate_series(1,
                 len(string_split(replace(text, chr(10), ' '), ' ')))) AS i
        FROM g)
)
SELECT url, CAST(idx AS BIGINT) AS idx, word,
       CAST(COALESCE(SUM(strlen(word) + 1) OVER (
              PARTITION BY url ORDER BY idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS span_start,
       CAST(COALESCE(SUM(strlen(word) + 1) OVER (
              PARTITION BY url ORDER BY idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + strlen(word) AS BIGINT) AS span_end
FROM toks
""",
        "word_spans": f"""
WITH g AS ({spec.html_golden_duckdb_sql(spec.SQL_IS_HTML).strip()}),
toks AS (
  SELECT url, i - 1 AS idx, t[i] AS word
  FROM (SELECT url, string_split(replace(text, chr(10), ' '), ' ') AS t,
               unnest(generate_series(1,
                 len(string_split(replace(text, chr(10), ' '), ' ')))) AS i
        FROM g)
)
SELECT url, CAST(idx AS BIGINT) AS idx, word,
       CAST(COALESCE(SUM(strlen(word) + 1) OVER (
              PARTITION BY url ORDER BY idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS span_start,
       CAST(COALESCE(SUM(strlen(word) + 1) OVER (
              PARTITION BY url ORDER BY idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + strlen(word) AS BIGINT) AS span_end
FROM toks
""",
        "layout_word_agg": f"""
WITH lines AS (
  SELECT doc_id,
         substr(text, CAST(i * {w} + 1 AS INT), {w}) AS line
  FROM (SELECT doc_id, text,
               unnest(generate_series(0, (length(text) - 1) // {w})) AS i
        FROM documents)
)
SELECT {spec.SQL_URL} AS url,
       CAST(SUM(len(list_filter(string_split(line, ' '), x -> x <> ''))) AS BIGINT) AS n_words,
       CAST(SUM(length(replace(line, ' ', ''))) AS BIGINT) AS n_chars
FROM lines GROUP BY doc_id
""",
        "layout_page_text": spec.pdf_golden_duckdb_sql("1=1"),
        "edge_dedup": """
SELECT 'https://host' || CAST(doc_id % 97 AS STRING) || '.example/doc' || CAST(doc_id AS STRING) AS url,
       CAST(2 * (3 + doc_id % 3 + 1) + (3 + doc_id % 2 + 1) AS BIGINT) AS n_edges
FROM documents
""",
        "edge_orientation": """
SELECT 'https://host' || CAST(doc_id % 97 AS STRING) || '.example/doc' || CAST(doc_id AS STRING) AS url,
       'h' AS orientation, CAST(4 * (3 + doc_id % 3 + 1) AS BIGINT) AS n_edges
FROM documents
UNION ALL
SELECT 'https://host' || CAST(doc_id % 97 AS STRING) || '.example/doc' || CAST(doc_id AS STRING) AS url,
       'v' AS orientation, CAST(2 * (3 + doc_id % 2 + 1) AS BIGINT) AS n_edges
FROM documents
""",
        "edge_consolidate": f"""
SELECT {spec.SQL_URL} AS url,
       CAST((3 + doc_id % 3 + 1) + (3 + doc_id % 2 + 1) AS BIGINT) AS n_runs,
       CAST((3 + doc_id % 3 + 1) * (3 + doc_id % 2) * {synth_rel.GRID_CELL_W}
          + (3 + doc_id % 2 + 1) * (3 + doc_id % 3) * {synth_rel.GRID_CELL_H} AS DOUBLE) AS total_span,
       CAST(4 * (3 + doc_id % 3 + 1) + 2 * (3 + doc_id % 2 + 1) AS BIGINT) AS n_segments
FROM documents
""",
        "column_histogram": f"""
WITH {synth_rel.CHARS_REL_DUCKDB.strip()}
SELECT url, CAST(round(x0 / 3) * 3 AS DOUBLE) AS col_x,
       CAST(COUNT(*) AS BIGINT) AS n_chars
FROM chars_rel GROUP BY url, col_x HAVING COUNT(*) >= 3
""",
        # training-data pipeline operators
        "dedup_exact": dedup.dedup_exact_oracle(),
        "dedup_minhash_lsh": dedup.minhash_lsh_oracle(),
        "dedup_simhash": dedup.simhash_oracle(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_oracle(),
        "dedup_jaccard_verified": dedup.jaccard_verified_oracle(),
        "dedup_components": dedup.dedup_components_oracle(),
        "dedup_canonical": dedup.dedup_canonical_oracle(),
        "dedup_substring": dedup.substring_pairs_oracle(),
        "dedup_substring_winnowed": dedup.substring_pairs_winnowed_oracle(),
        "dedup_incremental": dedup.dedup_incremental_oracle(),
        "dedup_bloom_incremental": dedup.dedup_bloom_incremental_oracle(),
        "text_langid": text_analysis.lang_id_oracle(),
        "text_langid_trigram": text_analysis.lang_id_trigram_oracle(),
        "text_quality": text_analysis.quality_score_oracle(),
        "text_token_count": text_analysis.token_count_oracle(),
        "text_fingerprint": text_analysis.fingerprint_oracle(),
        "text_fingerprint_rolling": text_analysis.fingerprint_rolling_oracle(),
        "corpus_curation": text_analysis.corpus_curation_oracle(),
        "text_fluency": text_analysis.text_fluency_oracle(),
        "bpe_train": text_analysis.bpe_train_oracle(),
        "text_quality_classifier": text_analysis.quality_classifier_oracle(),
        "bpe_tokenize": text_analysis.bpe_tokenize_oracle(),
        "curation_gopher": curation.gopher_quality_oracle(),
        "curation_c4_line_dedup": curation.c4_line_dedup_oracle(),
        "curation_domain_cap": curation.domain_cap_oracle(),
        "curation_domain_cap_salted": curation.domain_cap_salted_oracle(),
        "curation_pii_scrub": curation.pii_scrub_oracle(),
        "curation_gopher_repetition": curation.gopher_repetition_oracle(),
        "curation_scorecard": curation.curation_scorecard_oracle(),
        "corpus_build": curation.corpus_build_oracle(),
        "curation_url_canonicalize": curation.url_canonicalize_oracle(),
        "curation_web_pipeline": curation.web_pipeline_oracle(),
        "crawl_host_windows": curation.crawl_host_windows_oracle(),
        "mixture_sample": curation.mixture_sample_oracle(),
        "shard_packing": curation.shard_packing_oracle(),
        "dedup_embedding_cosine": ann.embedding_cosine_dups_oracle(),
        "dedup_embedding_lsh": ann.dedup_embedding_lsh_oracle(),
        "ann_bruteforce": ann.ann_bruteforce_oracle(),
        "ann_lsh": ann.ann_lsh_oracle(),
        "ann_ivf": ann.ann_ivf_oracle(),
        "ann_pq": ann.ann_pq_oracle(),
        "ann_ivfpq": ann.ann_ivfpq_oracle(),
        "media_features": multimodal.media_features_oracle(),
        "media_pixel_stats": multimodal.media_pixel_stats_oracle(),
        "media_resize": multimodal.media_resize_oracle(),
        "media_frame_sample": multimodal.media_frame_sample_oracle(),
        # lattice cells: rows are bottom-to-top (ascending PDF y — faithful
        # to createTableRegion, table_extractor.go:254-276), so cell (i, j)
        # holds writer cell (r = 2 - i, c = j)
        "extract_tables_lattice": f"""
SELECT {spec.SQL_URL} AS url, CAST(0 AS BIGINT) AS table_no,
       CAST(i AS BIGINT) AS row_no, CAST(j AS BIGINT) AS col_no,
       'c' || CAST(doc_id % 100 AS STRING) || 'r' || CAST(2 - i AS STRING)
           || 'c' || CAST(j AS STRING) AS cell_text
FROM (SELECT doc_id, unnest(generate_series(0, 2)) AS i FROM documents
      WHERE doc_id % 10 = 6),
     (SELECT unnest(generate_series(0, 2)) AS j)
""",
        "pdf_images": _pdf_images_oracle(),
        "pdf_annots": _pdf_annots_oracle(),
        "pdf_forms": f"""
SELECT {spec.SQL_URL} AS url,
       'form line ' || CAST(doc_id AS STRING) || chr(10) ||
       'form line ' || CAST(doc_id AS STRING) AS text
FROM documents
""",
        "pdf_curves": f"""
WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 6),
stroked AS (
  SELECT doc_id, i AS curve_no, 3 AS n_points,
         72.0 + 10 * i AS x0, 290.0 - 30 * i AS y0,
         152.0 + 10 * i AS x1, 310.0 - 30 * i AS y1
  FROM (SELECT doc_id, unnest(generate_series(0, 1 + doc_id % 3)) AS i FROM docs)
),
filled AS (
  SELECT doc_id, 2 + doc_id % 3 AS curve_no, 3 AS n_points,
         200.0 AS x0, 500.0 AS y0, 240.0 AS x1, 540.0 AS y1
  FROM docs
),
allc AS (SELECT * FROM stroked UNION ALL SELECT * FROM filled)
SELECT {spec.SQL_URL} AS url, CAST(curve_no AS BIGINT) AS curve_no,
       CAST(n_points AS BIGINT) AS n_points,
       ROUND(x0, 3) AS x0, ROUND(y0, 3) AS y0,
       ROUND(x1, 3) AS x1, ROUND(y1, 3) AS y1
FROM allc
""",
        "event_asof_join": synth_rel.asof_join_events_oracle(),
        "event_range_join": synth_rel.event_range_join_oracle(),
        "tpch_q1": tpch.tpch_q1_oracle(),
        "tpch_q3": tpch.tpch_q3_oracle(),
        "tpch_q5": tpch.tpch_q5_oracle(),
        "tpch_q6": tpch.tpch_q6_oracle(),
        "tpch_q18": tpch.tpch_q18_oracle(),
        "tpch_q14": tpch.tpch_q14_oracle(),
        "tpch_q4": tpch.tpch_q4_oracle(),
        "tpch_q22": tpch.tpch_q22_oracle(),
        "tpch_q1_rollup": tpch.tpch_q1_rollup_oracle(),
        "tpch_q13": tpch.tpch_q13_oracle(),
        "tpch_q17": tpch.tpch_q17_oracle(),
        "tpch_q21": tpch.tpch_q21_oracle(),
        "tpch_q7": tpch.tpch_q7_oracle(),
        "tpch_q8": tpch.tpch_q8_oracle(),
        "tpch_q9": tpch.tpch_q9_oracle(),
        "tpch_q10": tpch.tpch_q10_oracle(),
        "tpch_q15": tpch.tpch_q15_oracle(),
        "tpch_q19": tpch.tpch_q19_oracle(),
        "tpch_q20": tpch.tpch_q20_oracle(),
        "tpch_q2": tpch.tpch_q2_oracle(),
        "tpch_q11": tpch.tpch_q11_oracle(),
        "tpch_q12": tpch.tpch_q12_oracle(),
        "tpch_q16": tpch.tpch_q16_oracle(),
        "event_sessionize_stateful": """
WITH ev AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
),
wm AS (SELECT MAX(epoch(ts)) - 1800 AS final_wm FROM events),
flagged AS (
  SELECT user_id, ts_s,
         CASE WHEN LAG(ts_s) OVER w IS NULL
                OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
),
g AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
agg AS (
  SELECT user_id, MIN(ts_s) AS session_start, MAX(ts_s) AS session_end,
         COUNT(*) AS n_events
  FROM g GROUP BY user_id, sid
),
closed AS (
  SELECT a.*,
         LEAD(session_start) OVER (PARTITION BY user_id
                                   ORDER BY session_start) AS next_start
  FROM agg a
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_start AS BIGINT) AS session_start,
       CAST(session_end AS BIGINT) AS session_end,
       CAST(n_events AS BIGINT) AS n_events
FROM closed, wm
WHERE next_start IS NOT NULL OR session_end + 1800 < final_wm
""",
        "extract_tables_rowrects": f"""
SELECT {spec.SQL_URL} AS url, CAST(0 AS BIGINT) AS table_no,
       CAST(i AS BIGINT) AS row_no, CAST(j AS BIGINT) AS col_no,
       'c' || CAST(doc_id % 100 AS STRING) || 'r' || CAST(i AS STRING)
           || 'c' || CAST(j AS STRING) AS cell_text
FROM (SELECT doc_id, unnest(generate_series(0, 3)) AS i FROM documents
      WHERE doc_id % 10 = 6),
     (SELECT unnest(generate_series(0, 2)) AS j)
""",
        "edge_filter_funnel": f"""
WITH {synth_rel.EDGES_REL_DUCKDB.strip()},
traps AS (
  SELECT {spec.SQL_URL} AS url, 1 AS page_no, t.x0, t.y0, t.x1, t.y1,
         1.0 AS width, 'line' AS src
  FROM documents,
       (VALUES (0.5, 100.0, 0.5, 300.0), (100.0, 791.5, 300.0, 791.5),
               (580.0, 100.0, 580.0, 300.0), (100.0, 10.0, 300.0, 10.0),
               (100.0, 100.0, 200.0, 200.0)) t(x0, y0, x1, y1)
),
all_edges AS (
  SELECT url, x0, y0, x1, y1 FROM edges_rel
  UNION ALL SELECT url, x0, y0, x1, y1 FROM traps
),
g6 AS (
  SELECT * FROM all_edges WHERE NOT (
    ((LEAST(x0, x1) < 1.0 OR GREATEST(x0, x1) > 611.0) AND ABS(x1 - x0) < 1.0)
    OR ((LEAST(y0, y1) < 1.0 OR GREATEST(y0, y1) > 791.0) AND ABS(y1 - y0) < 1.0))
),
g7 AS (
  SELECT * FROM g6
  WHERE (ABS(y1 - y0) < 3.0 OR ABS(x1 - x0) < 3.0)
    AND LEAST(x0, x1) >= 20.0 AND GREATEST(x0, x1) <= 575.0
    AND LEAST(y0, y1) >= 20.0
)
SELECT url, CAST(COUNT(*) AS BIGINT) AS n_kept,
       ROUND(SUM(x0 + y1), 3) AS sum_x0y1
FROM g7 GROUP BY url
""",
        "extract_tables_text": f"""
SELECT {spec.SQL_URL} AS url, CAST(0 AS BIGINT) AS table_no,
       CAST(i AS BIGINT) AS row_no, CAST(j AS BIGINT) AS col_no,
       'c' || CAST(doc_id % 100 AS STRING) || 'r' || CAST(i AS STRING)
           || 'c' || CAST(j AS STRING) AS cell_text
FROM (SELECT doc_id, unnest(generate_series(0, 2)) AS i FROM documents
      WHERE doc_id % 10 = 6),
     (SELECT unnest(generate_series(0, 2)) AS j)
""",
        "extract_tables_text_relational": f"""
SELECT {spec.SQL_URL} AS url, CAST(0 AS BIGINT) AS table_no,
       CAST(i AS BIGINT) AS row_no, CAST(j AS BIGINT) AS col_no,
       'c' || CAST(doc_id % 100 AS STRING) || 'r' || CAST(i AS STRING)
           || 'c' || CAST(j AS STRING) AS cell_text
FROM (SELECT doc_id, unnest(generate_series(0, 2)) AS i FROM documents
      WHERE doc_id % 10 = 6),
     (SELECT unnest(generate_series(0, 2)) AS j)
""",
        "extract_tables_relational": f"""
SELECT {spec.SQL_URL} AS url,
       CAST(i AS BIGINT) AS row_no, CAST(j AS BIGINT) AS col_no,
       'c' || CAST(doc_id % 100 AS STRING) || 'r' || CAST(2 - i AS STRING)
           || 'c' || CAST(j AS STRING) AS cell_text
FROM (SELECT doc_id, unnest(generate_series(0, 2)) AS i FROM documents
      WHERE doc_id % 10 = 6),
     (SELECT unnest(generate_series(0, 2)) AS j)
""",
        "crop_filter": f"""
WITH {synth_rel.CHARS_REL_DUCKDB.strip()}
SELECT url, CAST(COUNT(*) AS BIGINT) AS n_in_crop,
       ROUND(MIN(x0), 3) AS min_x0, ROUND(MAX(x1), 3) AS max_x1
FROM chars_rel
WHERE x0 <= {CROP[2]} AND x1 >= {CROP[0]} AND y0 <= {CROP[3]} AND y1 >= {CROP[1]}
GROUP BY url
""",
        "y_inversion": f"""
WITH {synth_rel.CHARS_REL_DUCKDB.strip()}
SELECT url, ROUND(MIN({spec.PAGE_H} - y1), 3) AS min_top,
       ROUND(MAX({spec.PAGE_H} - y1), 3) AS max_top
FROM chars_rel GROUP BY url
""",
        # real-PDF words: every wrapped {w}-char line contributes its
        # space-delimited non-empty tokens
        "pdf_words": f"""
WITH lines AS (
  SELECT doc_id, substr(text, CAST(i * {w} + 1 AS INT), {w}) AS line
  FROM (SELECT doc_id, text,
               unnest(generate_series(0, (length(text) - 1) // {w})) AS i
        FROM documents WHERE {spec.SQL_IS_PDF})
)
SELECT {spec.SQL_URL} AS url,
       CAST(SUM(len(list_filter(string_split(line, ' '), x -> x <> ''))) AS BIGINT) AS n_words,
       CAST(SUM(length(replace(line, ' ', ''))) AS BIGINT) AS n_chars
FROM lines GROUP BY doc_id
""",
        "pdf_metadata": f"""
SELECT {spec.SQL_URL} AS url,
       'doc ' || CAST(doc_id AS STRING) AS title,
       'host' || CAST(doc_id % 97 AS STRING) || '.example' AS author,
       'pdfplumber-golang-spark' AS producer
FROM documents WHERE {spec.SQL_IS_PDF}
""",
        "pdf_line_texts": f"""
SELECT {spec.SQL_URL} AS url, CAST(i + 1 AS BIGINT) AS line_no,
       substr(text, CAST(i * {w} + 1 AS INT), {w}) AS line_text
FROM (SELECT doc_id, text,
             unnest(generate_series(0, (length(text) - 1) // {w})) AS i
      FROM documents WHERE {spec.SQL_IS_PDF})
""",
        # independent SQL implementation of Y2+Y4+Y5 (lag/cumsum sessionize)
        "word_bboxes": f"""
WITH {synth_rel.CHARS_REL_DUCKDB.strip()},
lined AS (
  SELECT *, CAST(SUM(CASE WHEN prev_y0 IS NULL OR prev_y0 - y0 > {spec.Y_TOLERANCE}
                          THEN 1 ELSE 0 END)
       OVER (PARTITION BY url, page_no ORDER BY y0 DESC, x0 ASC, char_idx ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS line_id
  FROM (SELECT *, LAG(y0) OVER (PARTITION BY url, page_no
                                ORDER BY y0 DESC, x0 ASC, char_idx ASC) AS prev_y0
        FROM chars_rel)
),
worded AS (
  SELECT *, CAST(SUM(CASE WHEN prev_x1 IS NULL OR x0 - prev_x1 > {spec.X_TOLERANCE}
                               OR x0 - prev_x1 > width * 0.3
                               OR prev_text = ' '
                          THEN 1 ELSE 0 END)
       OVER (PARTITION BY url, page_no, line_id ORDER BY x0 ASC, char_idx ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS word_id
  FROM (SELECT *, LAG(x1) OVER wl AS prev_x1, LAG(text) OVER wl AS prev_text
        FROM lined
        WINDOW wl AS (PARTITION BY url, page_no, line_id
                      ORDER BY x0 ASC, char_idx ASC))
)
SELECT url, line_id, word_id,
       string_agg(text, '' ORDER BY x0 ASC, char_idx ASC) AS word_text,
       ROUND(MIN(x0), 3) AS x0, ROUND(MIN(y0), 3) AS y0,
       ROUND(MAX(x1), 3) AS x1, ROUND(MAX(y1), 3) AS y1,
       CAST(COUNT(*) AS BIGINT) AS n_chars
FROM worded WHERE text <> ' '
GROUP BY url, page_no, line_id, word_id
""",
        "events_windowed_agg": _events_windowed_oracle(),
        "event_sessionize": """
WITH gapped AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 3) AS sum_value
FROM sess GROUP BY user_id, session_id
""",
    }


def _events_windowed_oracle() -> str:
    from pdfplumber_golang_spark.streaming.windowed import (
        windowed_event_counts_oracle,
    )

    return windowed_event_counts_oracle()
