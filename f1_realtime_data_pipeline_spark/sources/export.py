"""Training-shard export — the write side of the corpus pipeline.

A trainer consumes the prepared corpus as a fixed set of shard files
with a deterministic doc→shard mapping AND within-shard order (so a
re-export after a pipeline fix replaces each shard with the identical
row sequence — resumable loaders keyed on (shard, row offset) keep
working; physical file NAMES still carry fresh task UUIDs, as with
any Spark write). The assignment is a pure column expression
(:func:`shard_assign` — md5-keyed, engine-portable, oracle-checkable);
the writer materializes it with one hash-partitioned write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.functions.text import md5_id

#: default shard count for the test corpus; a 100 TB export sizes this
#: as corpus_bytes / target_shard_bytes (~256-1024 MB per shard)
N_SHARDS = 8


def shard_assign(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """(doc_id, shard): deterministic shard for every doc — md5 of the
    id mod ``n_shards``, so the mapping is stable across runs and
    engines (no round-robin, no partition-id dependence)."""
    return docs.select(
        "doc_id",
        (
            md5_id(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
            % n_shards
        )
        .cast("int")
        .alias("shard"),
    )


def shard_assign_sql(n_shards: int = N_SHARDS) -> str:
    from f1_realtime_data_pipeline_spark.functions.text import md5_id_sql

    return f"""SELECT doc_id,
       CAST({md5_id_sql("('shard:' || CAST(doc_id AS VARCHAR))")} % {n_shards} AS INT) AS shard
FROM documents"""


def write_training_shards(
    docs: DataFrame, out_dir: str, n_shards: int = N_SHARDS
) -> None:
    """Materialize the corpus as ``shard=K/`` parquet partitions with
    the deterministic assignment. One hash shuffle on the shard key
    (repartition by the column so each shard is written by one task —
    files per shard stay bounded), then a partitioned write; a re-run
    overwrites shard-for-shard with identical row sets in identical
    within-shard order.

    r6 review fixes: the shard column is attached as a COLUMN
    EXPRESSION (a self-join on doc_id re-scanned the corpus twice and
    would fan out duplicate ids), and rows are sorted by doc_id
    WITHIN each shard before the write — without the sort,
    within-shard order follows input split order/executor count, so a
    re-export produced different bytes per shard and a loader
    resuming by (shard, row offset) — the stated contract — would
    resume at the wrong documents.

    At 100 TB this is the terminal job of the prep pipeline; shard
    boundaries AND within-shard order never depend on input layout —
    only on doc ids.
    """
    shard = (
        md5_id(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
        % n_shards
    ).cast("int")
    (
        docs.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
