"""CSV / JSON-lines file sources (batch + streaming-capable).

The reference ingests only Kafka JSON (spark_ingestion.py:88-95) and
CSV-ish season data via its producer (kafka_producer.py:40-60); a
standalone engine needs first-class file readers too. Conventions
shared with the rest of the engine:

- **Explicit schemas, never inference** — inference is a full extra
  pass over the data at 100 TB and is non-deterministic under schema
  drift. Callers pass a DDL string or StructType.
- **PERMISSIVE parsing with a visible corrupt-record column** — bad
  rows land in ``_corrupt_record`` instead of killing the job; the
  caller decides whether to route them to a quarantine sink (the
  same policy the streaming layer uses for malformed Kafka JSON).
- Both readers work unchanged under ``spark.readStream`` (pass
  ``streaming=True``) — file sources are Structured Streaming's
  replay-friendly source, which the tests use in place of a broker.
  ``split_quarantine`` itself is BATCH-only (its one-scan trick needs
  a cache a stream cannot have); a stream lands WITH the corrupt
  column and splits from the landed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: StructType | str) -> StructType:
    from pyspark.sql.types import StringType, StructField

    st = (
        schema
        if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    if CORRUPT_COL in st.fieldNames():
        return st
    # COPY before extending (r7 review, confirmed on this PySpark):
    # StructType.add appends to self and returns self, so extending
    # the caller's schema object in place would permanently grow a
    # shared module-level schema by a phantom _corrupt_record field.
    return StructType(list(st.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
    streaming: bool = False,
) -> DataFrame:
    """CSV scan with an explicit schema and quarantine column."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(_with_corrupt_col(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    streaming: bool = False,
) -> DataFrame:
    """JSON-lines scan with an explicit schema and quarantine column."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(_with_corrupt_col(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(good rows without the quarantine column, quarantined rows,
    the PERSISTED parsed parent — unpersist it when done with both
    derived frames; r7 review).

    BATCH inputs only (r6 review fix — a clear error instead of a
    confusing planner crash): Spark refuses queries over raw JSON/CSV
    sources that reference ONLY the corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parsed frame is
    persisted once and both sides read the cache — one scan total.
    ``persist`` is undefined on a stream, so the streaming quarantine
    posture is different: route the stream to the landing sink WITH
    the corrupt column and split from the landed parquet (one pass —
    the same advice as the 100 TB batch posture below), or filter
    null required-fields inline like the admission pipeline does. At
    100 TB the batch equivalent is likewise to land the parsed frame
    to parquet first and split from there; the restriction is
    raw-file-source-only.
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    if df.isStreaming:
        raise ValueError(
            "split_quarantine is batch-only: a stream cannot cache the "
            "parse (persist) and Spark disallows filtering the raw "
            "corrupt-record column uncached — land the stream with the "
            "corrupt column and split from the landed table instead"
        )
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    # hand the PERSISTED parent back too (r7 review): good/bad are
    # derived frames, so without this handle the caller could never
    # unpersist — every call pinned the whole parsed input for the
    # session's lifetime (until the periodic ContextCleaner GC'd it).
    return good, bad, df


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """ORC scan — the other columnar format Spark reads natively
    (vectorized reader, predicate pushdown and column pruning reach
    the scan exactly like parquet). Batch reads take the schema from
    the ORC footers (no inference pass); STREAMING reads require an
    explicit ``schema`` — Structured Streaming refuses footer
    discovery because the directory's future files are unknown, the
    same explicit-schema rule the CSV/JSONL readers enforce."""
    if streaming:
        if schema is None:
            raise ValueError("streaming ORC requires an explicit schema")
        return spark.readStream.schema(schema).orc(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC write — interop surface for warehouses standardized on ORC
    (Hive-lineage stacks); engine-side everything downstream is
    format-agnostic DataFrames."""
    df.write.mode(mode).orc(path)


def read_binary_files(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Binary-file source — the real ingestion path for multimodal
    corpora: each file becomes a row of (path, modificationTime,
    length, content BINARY), which feeds the Arrow decode operators
    (operators.multimodal) directly. ``pattern`` filters by glob
    (e.g. ``*.png``) AT THE LISTING, so non-matching files are never
    opened. Spark parallelizes by file; at 100 TB pair this with the
    small-files compaction story (millions of tiny blobs → archive
    them into parquet BINARY columns via this reader + a write, after
    which every downstream op is columnar)."""
    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(path)
