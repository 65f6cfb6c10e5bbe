"""Kafka source/sink builders (SURVEY.md §2.1 S1/S3/S4).

Mirrors the reference's subscription semantics (spark_ingestion.py:
80-88): earliest offsets, tolerate data loss, JSON value payloads
keyed by driver_number (kafka_producer.py:145-155).

The container has no Kafka broker and no spark-sql-kafka connector
jar, so these builders CONSTRUCT the readers/writers (pure
configuration, unit-testable) but calling ``.load()``/``.start()``
requires ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``
on a real deployment. The file-based replay source
(``sources.replay``) is the broker-less stand-in the tests drive; the
transform and sink layers are identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The reference's exact subscription posture (spark_ingestion.py:80-88)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def kafka_stream_reader(
    spark: SparkSession, bootstrap_servers: str, topic: str, **kwargs
):
    """readStream builder for the race-results topic (S1). Call
    ``.load()`` on a cluster with the Kafka connector on the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kwargs).items():
        reader = reader.option(k, v)
    return reader


def to_kafka_payload(df: DataFrame, key_col: str) -> DataFrame:
    """Kafka producer projection (S3, kafka_producer.py:145-148):
    key = CAST(key_col AS STRING), value = to_json(struct(*))."""
    value_cols = list(df.columns)
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        # explicit nulls (r7 review): to_json DROPS null fields by
        # default, but the reference producer's json.dumps emits
        # "field": null — schema-less consumers of the topic would see
        # a different payload shape (key-presence checks, registry
        # compatibility) without this option
        F.to_json(
            F.struct(*value_cols), {"ignoreNullFields": "false"}
        ).alias("value"),
    )


def kafka_stream_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    key_col: str = "driver_number",
):
    """writeStream builder mirroring the producer side (S3) — e.g. the
    control/processed topic republish (kafka_consumer.py:55-62)."""
    return (
        to_kafka_payload(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )
