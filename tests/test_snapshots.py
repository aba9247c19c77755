"""Snapshot-table source: commits, time travel, incremental reads, and the
incremental-extraction composition (sources/snapshots.py — the Iceberg
workflow the north rule names, over plain parquet + JSON manifests)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdfplumber_golang_spark import pipeline
from pdfplumber_golang_spark.sources import snapshots as S
from pdfplumber_golang_spark.sources.pagesgen import load_or_build_pages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="snap_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_commit_time_travel_and_append(spark, tdir):
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html")
    first = pages.where(F.length("url") % 2 == 0)
    second = pages.where(F.length("url") % 2 == 1)

    v1 = S.write_snapshot(first, tdir)
    assert v1 == 1
    n1 = S.read_snapshot(spark, tdir).count()
    assert n1 == first.count()

    v2 = S.append_snapshot(second, tdir)
    assert v2 == 2
    # current = both; time travel to v1 = only the first batch
    assert S.read_snapshot(spark, tdir).count() == pages.count()
    assert S.read_snapshot(spark, tdir, version=1).count() == n1
    # snapshot reads are exact sets, not prefixes of a directory listing
    got = {r.url for r in S.read_snapshot(spark, tdir, 1).select("url").collect()}
    want = {r.url for r in first.select("url").collect()}
    assert got == want


def test_incremental_read_sees_only_new_files(spark, tdir):
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html")
    a = pages.limit(100)
    S.write_snapshot(a, tdir)
    b = pages.subtract(a).limit(50)
    S.append_snapshot(b, tdir)
    inc = S.read_incremental(spark, tdir, since_version=1)
    assert inc.count() == 50
    got = {r.url for r in inc.select("url").collect()}
    want = {r.url for r in b.select("url").collect()}
    assert got == want
    # nothing new after the head
    assert S.read_incremental(spark, tdir, since_version=2).count() == 0


def test_incremental_refuses_overwrite_boundary(spark, tdir):
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html").limit(20)
    S.write_snapshot(pages, tdir)
    S.write_snapshot(pages, tdir)  # v2 = overwrite
    with pytest.raises(ValueError, match="overwrite"):
        S.read_incremental(spark, tdir, since_version=1)


def test_incremental_extraction_composition(spark, tdir):
    """The production loop: each append's NEW docs route through the
    extraction pipeline alone, and accumulated outputs equal a full run."""
    pages = load_or_build_pages(spark, SF_DIR).where("variant = 'html'")
    batches = [
        pages.where(F.col("url").substr(-1, 1).isin(*"01234")),
        pages.where(~F.col("url").substr(-1, 1).isin(*"01234")),
    ]
    S.write_snapshot(batches[0].select("url", "html"), tdir)
    out1 = pipeline.doc_text(
        pipeline.extract_pages(S.read_snapshot(spark, tdir))
    ).select("url", "text")
    S.append_snapshot(batches[1].select("url", "html"), tdir)
    out2 = pipeline.doc_text(
        pipeline.extract_pages(S.read_incremental(spark, tdir, since_version=1))
    ).select("url", "text")
    full = pipeline.doc_text(
        pipeline.extract_pages(pages.select("url", "html"))
    ).select("url", "text")
    merged = out1.unionByName(out2)
    assert merged.count() == full.count()
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_empty_append_yields_empty_changelog(spark, tdir):
    """ADVICE r3: an append that commits zero data files must make
    read_incremental return NOTHING — the [-0:] slice of the cumulative
    file list would otherwise replay every prior row."""
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html").limit(10)
    v1 = S.write_snapshot(pages, tdir)
    v2 = S.append_snapshot(pages.where(F.lit(False)), tdir)
    assert v2 == v1 + 1
    assert S.read_incremental(spark, tdir, since_version=v1).count() == 0
    # and the snapshot itself still reads the full prior contents
    assert S.read_snapshot(spark, tdir).count() == 10


def test_orphan_manifest_self_heals(spark, tdir):
    """ADVICE r4: a committer that crashes BETWEEN the manifest CAS and
    the version-hint swap leaves an orphan v(N+1) manifest with the hint
    still at N.  The head must derive from the max committed manifest
    (the CAS is the commit point), or every later commit re-targets
    v(N+1), hits the CAS, and the table is wedged forever."""
    import json
    import os

    pages = load_or_build_pages(spark, SF_DIR).select("url", "html").limit(10)
    S.write_snapshot(pages, tdir)
    v2 = S.append_snapshot(pages.limit(3), tdir)
    assert v2 == 2
    # simulate the crash: v3 manifest exists (CAS won), hint still says 2
    m2 = S.read_manifest(tdir, 2)
    m3 = dict(m2, version=3, parent_version=2, operation="append",
              added_files=0, snapshot_id="deadbeef")
    with open(S._manifest_path(tdir, 3), "w") as f:
        json.dump(m3, f)
    with open(S._hint_path(tdir) + ".tmp", "w") as f:
        f.write("2")
    os.replace(S._hint_path(tdir) + ".tmp", S._hint_path(tdir))
    # head self-heals to the orphan commit; the next append advances
    assert S.current_version(tdir) == 3
    v4 = S.append_snapshot(pages.limit(2), tdir)
    assert v4 == 4
    assert S.read_manifest(tdir, 4)["parent_version"] == 3
    # and a second append keeps advancing (no permanent wedge)
    assert S.append_snapshot(pages.limit(1), tdir) == 5


def test_concurrent_commit_loser_fails_not_overwrites(spark, tdir):
    """ADVICE r3: two writers racing to the same parent version must not
    both 'win' — the second manifest create fails (compare-and-swap), so
    no committed snapshot is ever silently discarded."""
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html").limit(10)
    S.write_snapshot(pages, tdir)
    # simulate the race: both writers read parent=1, writer A commits v2
    files_a = S._write_files(pages.limit(3), tdir, "aaaa")
    files_b = S._write_files(pages.limit(5), tdir, "bbbb")
    schema = pages.schema.json()
    S._commit(tdir, files_a, schema, 1, "append", len(files_a))
    with pytest.raises(S.ConcurrentCommitError):
        S._commit(tdir, files_b, schema, 1, "append", len(files_b))
    # writer A's commit is intact and current
    assert S.current_version(tdir) == 2
    m = S.read_manifest(tdir, 2)
    assert m["added_files"] == len(files_a)


def test_compaction_preserves_rows_and_history(spark, tdir):
    """compact() rewrites the layout, not the data: same row set after,
    fewer files, old versions still time-travel, incremental reads
    refuse to cross the replace boundary."""
    pages = load_or_build_pages(spark, SF_DIR).select("url", "html")
    S.write_snapshot(pages.repartition(16), tdir)
    v1_files = len(S.read_manifest(tdir, 1)["files"])
    before = {r.url for r in S.read_snapshot(spark, tdir).select("url").collect()}
    v2 = S.compact(spark, tdir, target_files=2)
    assert v2 == 2
    m = S.read_manifest(tdir, v2)
    assert m["operation"] == "replace"
    assert len(m["files"]) <= 2 < v1_files
    after = {r.url for r in S.read_snapshot(spark, tdir).select("url").collect()}
    assert after == before
    # old layout still time-travels
    assert len(S.read_manifest(tdir, 1)["files"]) == v1_files
    with pytest.raises(ValueError, match="replace"):
        S.read_incremental(spark, tdir, since_version=1)


def test_schema_evolution_add_column(spark, tdir):
    """append_snapshot_evolving: new columns join the table schema; rows
    from pre-evolution files read back as NULL for them."""
    from pyspark.sql import functions as F

    pages = load_or_build_pages(spark, SF_DIR).select("url", "html").limit(10)
    S.write_snapshot(pages, tdir)
    evolved = pages.limit(4).withColumn("lang", F.lit("en"))
    v2 = S.append_snapshot_evolving(evolved, tdir)
    assert v2 == 2
    cur = S.read_snapshot(spark, tdir)
    assert "lang" in cur.columns
    assert cur.count() == 14
    assert cur.where(F.col("lang").isNull()).count() == 10
    assert cur.where(F.col("lang") == "en").count() == 4
    # incremental read across the evolving append sees only the new rows
    inc = S.read_incremental(spark, tdir, since_version=1)
    assert inc.count() == 4
