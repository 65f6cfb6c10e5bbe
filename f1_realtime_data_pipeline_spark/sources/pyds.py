"""Spark 4 Python DataSource for the replay topic — the idiomatic
``spark.read.format("f1replay")`` / ``readStream.format("f1replay")``
face of ``sources.replay``.

The file-based replay directory (``sources.replay`` — each
``batch-NNNNN.txt`` file is one producer flush, each line one raw JSON
payload, the ``value`` a Kafka source would deliver; reference wire
shape at kafka_producer.py:133-147) gets a first-class source
implementation on the Python DataSource API Spark 4 added, instead of
piggy-backing on the text source:

- **batch**: one ``InputPartition`` per batch file — the listing
  parallelizes across executors exactly like the built-in file source,
  and a 100k-file replay directory scans wide, not single-threaded.
- **streaming**: REAL offset management instead of the text source's
  opaque file log. The offset is ``{"index": n}`` — the count of
  batch files consumed from the lexicographically-sorted listing
  (``write_replay_batch``'s zero-padded, atomically-published,
  never-reused names make that order the publish order). The engine
  checkpoints these offsets, so restart-resume and exactly-once replay
  accounting fall out of the contract: ``partitions(start, end)``
  returns one partition per newly-published file, ``read`` runs on
  executors, ``commit`` is a no-op (the directory is immutable
  history — nothing to acknowledge, the Kafka-replay semantics
  SURVEY.md §3.2 documents).

Scale posture: offsets are O(1) metadata (two ints per trigger); the
per-trigger listing is one ``os.listdir`` on the driver (the same cost
the built-in file source pays, without its ever-growing compact log);
payload bytes flow only through executor-side ``read``. Determinism:
the sorted listing + atomic publish means every run of the same
directory yields the same batches in the same order at any
parallelism.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

#: published replay batches: zero-padded so the lexicographic listing
#: IS the publish order (write_replay_batch's naming contract)
_PREFIX = "batch-"
_SUFFIX = ".txt"


def _list_batches(path: str) -> list[str]:
    """Sorted published batch files (in-flight dot-temps excluded)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        f
        for f in os.listdir(path)
        if f.startswith(_PREFIX) and f.endswith(_SUFFIX)
    )


def _read_lines(path: str):
    # UTF-8 explicitly — same contract as write_replay_batch; a line
    # is one raw payload, the trailing newline is the separator
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            yield (line.rstrip("\n"),)


@dataclass
class _FilePartition(InputPartition):
    file_path: str


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("f1replay requires option 'path'")

    def partitions(self):
        parts = [
            _FilePartition(os.path.join(self._path, f))
            for f in _list_batches(self._path)
        ]
        # an empty partition list makes the engine schedule ONE task
        # with partition=None (the API's no-partitioning default) —
        # an empty/missing replay directory is a valid zero-row scan,
        # so hand that task an explicit empty sentinel instead
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if partition is None or not partition.file_path:
            return
        yield from _read_lines(partition.file_path)


class _ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("f1replay requires option 'path'")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_list_batches(self._path))}

    def partitions(self, start: dict, end: dict):
        files = _list_batches(self._path)
        return [
            _FilePartition(os.path.join(self._path, f))
            for f in files[start["index"] : end["index"]]
        ]

    def read(self, partition: _FilePartition):
        yield from _read_lines(partition.file_path)

    def commit(self, end: dict) -> None:
        # immutable replay history: nothing to acknowledge upstream
        pass


class F1ReplayDataSource(DataSource):
    """``format("f1replay")`` — batch + streaming replay-topic source."""

    @classmethod
    def name(cls) -> str:
        return "f1replay"

    def schema(self) -> StructType:
        # the Kafka value column post-cast (SURVEY.md P1): one string
        # payload per record; parsing stays in the query (from_json),
        # where the transform contract owns it
        return StructType([StructField("value", StringType(), True)])

    def reader(self, schema) -> DataSourceReader:
        return _ReplayBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ReplayStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        # append-only topic: overwrite has no meaning on immutable
        # replay history (the engine passes False for append mode)
        return _ReplayStreamWriter(self.options)


def register_replay_source(spark) -> None:
    """Register the f1replay format on this session (idempotent —
    re-registration replaces the entry, latest wins)."""
    spark.dataSource.register(F1ReplayDataSource)


# ---------------------------------------------------------------------------
# writer side: the PRODUCER face of the replay topic
# ---------------------------------------------------------------------------

import uuid

from pyspark import TaskContext
from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class _TaskFile(WriterCommitMessage):
    """One executor task's staged dot-temp file (picklable).

    ``partition_id`` is the task's input-partition id — the STABLE
    identity that names the published file. A retried epoch re-runs
    the same partitions over the same deterministic micro-batch, so
    partition k stages the same rows on every attempt and the
    temp→final mapping cannot shuffle between attempts (a
    ``sorted(uuid-temps)`` mapping could: a crash after publishing one
    file, then a retry whose arbitrary first temp held different rows,
    would lose and duplicate rows).
    """

    temp_path: str = ""
    n_rows: int = 0
    partition_id: int = -1


class _ReplayStreamWriter(DataSourceStreamWriter):
    """Micro-batch sink publishing replay batch files with the same
    atomic write-then-publish discipline as ``write_replay_batch``:

    - ``write`` (executor): the task's rows go to a dot-prefixed temp
      (invisible to the reader's listing) under the topic directory,
      and the commit message carries the task's PARTITION ID;
    - ``commit`` (driver): every staged temp is renamed to its final
      ``batch-{batchId:05d}-p{partitionId:05d}.txt`` name — rename is
      atomic, so a reader lists either nothing or a complete file.
      Both indices are zero-padded, so published names sort in publish
      order (the stream reader's count-offset contract; an unpadded
      ``p10`` would sort before ``p2`` and break the
      sorted-listing==publish-order invariant at >=11 files/epoch).
      Names embed (batchId, partitionId), so an engine RETRY of a
      partially-committed epoch is idempotent: partition k re-stages
      the SAME rows (deterministic micro-batch replay — the same
      assumption Spark's built-in file committers make), an
      already-published name keeps the published file and drops the
      retry's duplicate temp, and the never-published partitions
      publish from their temps;
    - ``abort`` (driver): staged temps are deleted; nothing was ever
      visible.

    Row contract: one ``value`` string column (the payload line), the
    reader's schema. Empty tasks stage nothing (no phantom files).
    """

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("f1replay requires option 'path'")

    def write(self, iterator) -> _TaskFile:
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f".stage-{uuid.uuid4().hex}.tmp")
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        n = 0
        fh = None
        try:
            for row in iterator:
                if fh is None:
                    fh = open(tmp, "w", encoding="utf-8")
                fh.write((row.value or "") + "\n")
                n += 1
        finally:
            if fh is not None:
                fh.close()
        return _TaskFile(temp_path=tmp if n else "", n_rows=n, partition_id=pid)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            tmp = getattr(m, "temp_path", "") if m is not None else ""
            if not tmp:
                continue
            final = os.path.join(
                self._path,
                f"{_PREFIX}{batchId:05d}-p{m.partition_id:05d}{_SUFFIX}",
            )
            if os.path.exists(final):
                # retried commit of a partially-published epoch: this
                # partition's file is already out (same rows — stable
                # partition identity); drop the duplicate stage
                os.unlink(tmp)
            else:
                os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            tmp = getattr(m, "temp_path", "") if m is not None else ""
            if tmp and os.path.exists(tmp):
                os.unlink(tmp)
