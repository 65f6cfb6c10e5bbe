"""File-based replay source — the broker-less stand-in for the Kafka
topic (SURVEY.md §3.2 semantics: re-runs re-emit everything; pacing is
a trigger concern, not a source concern).

A directory of text files plays the role of the topic: each line is
one raw JSON payload (the ``value`` column a Kafka source would
deliver), each file is a unit the stream picks up per trigger
(``maxFilesPerTrigger=1`` ≈ one producer flush). Tests write fixture
batches here and drive the identical transform/sink pipeline that a
Kafka deployment would run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_replay_batch(directory: str, lines: list[str], batch_no: int) -> str:
    """Append one batch file of raw payloads to the replay directory.

    Written to a hidden temp name and atomically renamed in (r6
    review fix): Spark's file source lists the directory between
    triggers and NEVER re-reads a seen filename, so a file caught
    mid-write would be consumed partially and its remaining payloads
    lost forever — the file-source contract requires files to appear
    atomically (the same write-then-publish discipline as the
    manifest commits). The dot-prefixed temp name is invisible to the
    source while in flight."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"batch-{batch_no:05d}.txt")
    # loud on batch-number reuse (r7 review): the file source NEVER
    # re-reads a seen filename, so an os.replace over a published
    # batch would silently lose the replacement payloads forever — a
    # reset counter or two producers sharing a directory must fail
    # here, not downstream as missing data.
    if os.path.exists(path):
        raise FileExistsError(
            f"replay batch {batch_no} already published at {path}: the "
            "file source will never re-read it — use a fresh batch_no"
        )
    # empty batch = no file (r7 review): writing just a newline would
    # feed the source one phantom empty-string record that from_json
    # turns into a spurious corrupt-record row
    if not lines:
        return path
    tmp = os.path.join(directory, f".batch-{batch_no:05d}.tmp")
    # UTF-8 explicitly (r7 review): Spark's text source always reads
    # UTF-8; a locale-dependent default could emit latin-1 bytes (name
    # mojibake) or crash on non-ASCII payloads under a C locale
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def raw_value_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming DataFrame with a single ``value`` string column —
    shape-compatible with a Kafka source after CAST(value AS STRING)."""
    return (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(directory)
    )
