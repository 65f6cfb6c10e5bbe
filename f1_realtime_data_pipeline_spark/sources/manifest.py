"""Minimal atomic-manifest table format (the Delta-lite commit core).

SCALE.md promised the idempotent sink's call site maps to a lakehouse
``MERGE`` — this module supplies the missing transactional substrate
without vendoring a table format: a committed SNAPSHOT is a JSON
manifest listing immutable parquet directories, and a commit is the
EXCLUSIVE creation of ``_manifests/manifest-<v+1>.json``. Readers
resolve the highest committed version and read exactly its files, so
they can never observe half an epoch: data files become visible only
when the manifest naming them exists, and manifest creation is a
single atomic ``create(overwrite=false)``.

This is the same optimistic-concurrency protocol Delta Lake builds on
(put-if-absent on the next log entry): two writers racing to commit
version v+1 — one wins the exclusive create, the loser re-reads and
retries. The streaming sink is a single serial writer, so it treats a
lost race as corruption and raises; a multi-writer deployment retries
the conflict loop. Crash between data write and manifest commit leaves
an ORPHAN directory no manifest references — invisible to readers,
reclaimed by :func:`vacuum`.

All filesystem I/O goes through the Hadoop ``FileSystem`` API resolved
from the path (local FS here; HDFS/ABFS give atomic create/rename on a
cluster; S3 needs the usual commit-service story, same as every
manifest format). Manifests carry the bucket id of each data directory
(the sink lays data out by key-hash bucket), so the manifest doubles
as the pruning index: an epoch's anti-join reads only the entries
whose bucket appears in the batch — file-level skipping driven by
commit metadata, which is exactly how lakehouse formats prune.

Manifests list the FULL snapshot (entries = epochs × buckets rows of
path+bucket). At 100 TB cadence that file grows with epoch count —
the production forms are incremental logs + periodic checkpoints
(Delta) and manifest compaction; ``o_compaction_plan`` already plans
the data-file side of that maintenance.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
_NAME_RE = re.compile(r"manifest-(\d+)\.json")


def fs_for(spark: SparkSession, path_str: str):
    """(Hadoop FileSystem, Path) for ``path_str`` — cluster-correct
    existence/listing/atomic-create, unlike driver-local ``os.path``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _read_text(spark: SparkSession, path_str: str) -> str:
    fs, p = fs_for(spark, path_str)
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _create_exclusive(spark: SparkSession, path_str: str, text: str) -> bool:
    """Atomically create ``path_str`` with ``text``; False if it
    already exists (a concurrent committer won the race)."""
    from py4j.protocol import Py4JJavaError

    fs, p = fs_for(spark, path_str)
    try:
        out = fs.create(p, False)
    except Py4JJavaError:
        return False
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def resolve_snapshot(
    spark: SparkSession, table_path: str
) -> tuple[int, list[dict[str, Any]]]:
    """(version, entries) of the highest committed manifest; (0, [])
    when nothing has ever been committed. Entries are
    ``{"path": "data/epoch-N/__kb=B", "bucket": B}`` relative dirs."""
    fs, mdir = fs_for(spark, f"{table_path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return 0, []
    best = 0
    for st in fs.listStatus(mdir):
        m = _NAME_RE.fullmatch(st.getPath().getName())
        if m:
            best = max(best, int(m.group(1)))
    if best == 0:
        return 0, []
    doc = json.loads(
        _read_text(spark, f"{table_path}/{MANIFEST_DIR}/manifest-{best:012d}.json")
    )
    return best, doc["entries"]


def commit_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int,
    entries: list[dict[str, Any]],
) -> bool:
    """Commit ``entries`` as snapshot ``version`` via exclusive
    manifest creation. False = lost the race for this version."""
    doc = json.dumps({"version": version, "entries": entries}, sort_keys=True)
    return _create_exclusive(
        spark, f"{table_path}/{MANIFEST_DIR}/manifest-{version:012d}.json", doc
    )


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    buckets: list[int] | None = None,
) -> DataFrame | None:
    """DataFrame over the latest committed snapshot (optionally pruned
    to ``buckets`` — manifest-metadata skipping, no file listing of
    unrelated buckets). None when the snapshot is empty. The file list
    is resolved NOW: a commit racing this read does not change what
    this DataFrame reads (immutable files), so concurrent readers see
    a consistent snapshot."""
    _, entries = resolve_snapshot(spark, table_path)
    want = None if buckets is None else set(buckets)
    paths = [
        f"{table_path}/{e['path']}"
        for e in entries
        if want is None or e["bucket"] in want
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def vacuum(spark: SparkSession, table_path: str) -> list[str]:
    """Delete data directories no manifest-referenced snapshot uses
    (orphans of crashed commits). Returns the removed directory names.
    Single-writer assumption: run it from the writer, not concurrently
    with an in-flight (written-but-not-yet-committed) epoch."""
    _, entries = resolve_snapshot(spark, table_path)
    referenced = {e["path"].split("/")[1] for e in entries}
    fs, ddir = fs_for(spark, f"{table_path}/data")
    removed: list[str] = []
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            name = st.getPath().getName()
            if name not in referenced:
                fs.delete(st.getPath(), True)
                removed.append(name)
    return sorted(removed)
