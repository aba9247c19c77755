"""Snapshot-versioned parquet tables: the Iceberg workflow, stdlib-only.

The north rule targets "Iceberg tables of Common-Crawl-style web pages";
this container has no Iceberg runtime jar, so this module implements the
three Iceberg behaviors the pipeline actually depends on — atomic snapshot
commits, time travel, and incremental (changelog) reads — over plain
parquet files with JSON manifests, mirroring Iceberg's metadata layout:

  table_dir/
    data/part-<snapshot>-<n>.parquet      immutable data files
    metadata/v<N>.metadata.json           snapshot manifest: file list,
                                          parent, schema, row count
    metadata/version-hint.text            current version pointer

Commit protocol = write data files, write v<N>.metadata.json, then atomically
replace version-hint.text (os.replace) — a reader always sees a complete
snapshot.  A real deployment swaps this module for `spark.read.format
("iceberg")` / `.option("start-snapshot-id", ...)`; the pipeline code is
unchanged because both present plain DataFrames.

Scale notes: manifests list files, never rows, so metadata stays O(files);
incremental reads hand Spark exactly the added files (no diff scan); data
files are immutable so snapshots share unchanged files structurally, like
Iceberg manifests reuse.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Two writers raced to commit the same version; the loser must
    re-read the table head and retry its commit."""


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _hint_path(table_dir: str) -> str:
    return os.path.join(_meta_dir(table_dir), "version-hint.text")


def current_version(table_dir: str) -> int | None:
    """Head = the highest committed manifest, NOT the version hint.

    The manifest CAS (``os.link`` in ``_commit``) is the commit point;
    the hint swap after it is only a reader fast-path.  A committer that
    crashes between the two leaves an orphan v(N+1) manifest with a hint
    still saying N — if the head were derived from the hint, every later
    commit would re-target v(N+1), hit FileExistsError, and raise
    ConcurrentCommitError forever (retrying "re-read the head" never
    advances: the table is permanently wedged).  Scanning the metadata
    dir for the max vN self-heals that crash; the hint remains as a
    fallback for layouts that carry only a hint.  Cost is one O(#snapshots)
    listdir per commit/read — manifests are O(files) rows, never data."""
    best = None
    try:
        for name in os.listdir(_meta_dir(table_dir)):
            if name.startswith("v") and name.endswith(".metadata.json"):
                try:
                    best = max(best or 0, int(name[1 : -len(".metadata.json")]))
                except ValueError:
                    continue
    except FileNotFoundError:
        pass
    if best is not None:
        return best
    try:
        with open(_hint_path(table_dir)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_meta_dir(table_dir), f"v{version}.metadata.json")


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshot in {table_dir}")
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _write_files(df: DataFrame, table_dir: str, snap_tag: str) -> list[dict]:
    """Materialize df as immutable data files; returns manifest entries."""
    staging = os.path.join(table_dir, "data", f"_stage-{snap_tag}")
    df.write.mode("overwrite").parquet(staging)
    entries = []
    data_dir = os.path.join(table_dir, "data")
    for i, name in enumerate(sorted(os.listdir(staging))):
        if not name.endswith(".parquet"):
            continue
        final = f"part-{snap_tag}-{i:05d}.parquet"
        os.replace(os.path.join(staging, name), os.path.join(data_dir, final))
        entries.append(
            {
                "path": os.path.join("data", final),
                "bytes": os.path.getsize(os.path.join(data_dir, final)),
            }
        )
    # remove staging remnants (_SUCCESS, checksums)
    for name in os.listdir(staging):
        os.remove(os.path.join(staging, name))
    os.rmdir(staging)
    return entries


def _commit(
    table_dir: str,
    files: list[dict],
    schema_json: str,
    parent: int | None,
    operation: str,
    added: int,
) -> int:
    version = 1 if parent is None else parent + 1
    manifest = {
        "format_version": 1,
        "snapshot_id": uuid.uuid4().hex,
        "version": version,
        "parent_version": parent,
        "operation": operation,
        "committed_at_ms": int(time.time() * 1000),
        "schema": schema_json,
        "files": files,
        "added_files": added,
    }
    path = _manifest_path(table_dir, version)
    tmp = path + f".{manifest['snapshot_id']}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    # Compare-and-swap: exclusive-create the manifest via os.link so a
    # concurrent committer that raced to the same parent fails with
    # FileExistsError instead of silently overwriting this commit (the
    # same optimistic-concurrency contract as Iceberg's metadata swap).
    try:
        os.link(tmp, path)
    except FileExistsError:
        os.remove(tmp)
        raise ConcurrentCommitError(
            f"snapshot v{version} already committed by another writer; "
            "re-read the current version and retry"
        )
    os.remove(tmp)
    # the atomic pointer swap IS the commit
    tmp = _hint_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _hint_path(table_dir))
    return version


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Create (or replace) the table with df as snapshot v1 (or vN+1 with
    operation=overwrite: prior snapshots stay readable via time travel)."""
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    parent = current_version(table_dir)
    tag = uuid.uuid4().hex[:12]
    files = _write_files(df, table_dir, tag)
    return _commit(
        table_dir, files, df.schema.json(), parent, "overwrite", len(files)
    )


def append_snapshot(df: DataFrame, table_dir: str) -> int:
    """Append df as a new snapshot: new files + the parent's file list."""
    parent = current_version(table_dir)
    if parent is None:
        return write_snapshot(df, table_dir)
    prior = read_manifest(table_dir, parent)
    tag = uuid.uuid4().hex[:12]
    new_files = _write_files(df, table_dir, tag)
    return _commit(
        table_dir,
        prior["files"] + new_files,
        prior["schema"],
        parent,
        "append",
        len(new_files),
    )


def _read_files(spark: SparkSession, table_dir: str, files: list[dict],
                schema_json: str) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(schema_json))
    paths = [os.path.join(table_dir, f["path"]) for f in files]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table at a snapshot (None = current).  Time travel = pass
    an older version; the manifest pins the exact file set."""
    m = read_manifest(table_dir, version)
    return _read_files(spark, table_dir, m["files"], m["schema"])


def read_incremental(
    spark: SparkSession, table_dir: str, since_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows added strictly after ``since_version`` (the changelog read that
    drives incremental extraction: only new files reach Spark, no diff
    scan).  Only append snapshots are incremental; crossing an overwrite
    raises, as Iceberg's incremental scan does."""
    m = read_manifest(table_dir, to_version)
    chain = []
    cur = m
    while cur["version"] > since_version:
        if cur["version"] != since_version + 1 and cur["parent_version"] is None:
            break
        chain.append(cur)
        if cur["version"] == since_version + 1:
            break
        cur = read_manifest(table_dir, cur["parent_version"])
    added: list[dict] = []
    for snap in chain:
        if snap["operation"] != "append":
            raise ValueError(
                f"snapshot v{snap['version']} is {snap['operation']!r}; "
                "incremental reads only cross appends"
            )
        # an append of an empty DataFrame commits zero data files; guard
        # the slice — [-0:] would return the ENTIRE cumulative file list
        # and duplicate every prior row in the changelog read
        if snap["added_files"]:
            added.extend(snap["files"][-snap["added_files"]:])
    return _read_files(spark, table_dir, added, m["schema"])


def compact(spark: SparkSession, table_dir: str, target_files: int = 8) -> int:
    """Small-file compaction — the Iceberg ``rewrite_data_files``
    maintenance action: read the current snapshot, rewrite the same rows
    into ``target_files`` right-sized files, commit as a new REPLACE
    snapshot.  Row set is unchanged (readers see identical data before
    and after); prior snapshots still time-travel to the original file
    layout; incremental reads refuse to cross the boundary exactly like
    an overwrite (a compaction rewrites history's layout, not a data
    change, so the changelog is undefined across it)."""
    parent = current_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no snapshot in {table_dir}")
    prior = read_manifest(table_dir, parent)
    df = read_snapshot(spark, table_dir).repartition(target_files)
    tag = uuid.uuid4().hex[:12]
    files = _write_files(df, table_dir, tag)
    return _commit(
        table_dir, files, prior["schema"], parent, "replace", len(files)
    )


def append_snapshot_evolving(df: DataFrame, table_dir: str) -> int:
    """Append with add-column schema evolution (Iceberg's only
    always-safe evolution): columns present in df but not in the table
    schema are added to the manifest schema; prior data files simply
    lack them and read back as NULL (the parquet reader fills missing
    columns when given the table schema).  Dropping or retyping columns
    is NOT supported — that needs Iceberg's field-id machinery."""
    import json as _json

    from pyspark.sql import types as T

    parent = current_version(table_dir)
    if parent is None:
        return write_snapshot(df, table_dir)
    prior = read_manifest(table_dir, parent)
    old_schema = T.StructType.fromJson(_json.loads(prior["schema"]))
    old_names = {f.name for f in old_schema.fields}
    new_fields = [f for f in df.schema.fields if f.name not in old_names]
    for f in df.schema.fields:
        if f.name in old_names:
            old_type = next(
                o.dataType for o in old_schema.fields if o.name == f.name
            )
            if old_type != f.dataType:
                raise ValueError(
                    f"column retype not supported: {f.name}: "
                    f"{old_type} -> {f.dataType}"
                )
    evolved = T.StructType(list(old_schema.fields) + new_fields)
    # write the new batch with the FULL evolved schema (old columns that
    # df lacks become null columns) so every file is readable under it
    from pyspark.sql import functions as F

    out = df
    for f in evolved.fields:
        if f.name not in df.columns:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    out = out.select(*[f.name for f in evolved.fields])
    tag = uuid.uuid4().hex[:12]
    new_files = _write_files(out, table_dir, tag)
    return _commit(
        table_dir,
        prior["files"] + new_files,
        evolved.json(),
        parent,
        "append",
        len(new_files),
    )
