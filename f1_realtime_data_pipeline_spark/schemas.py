"""Explicit schemas — the engine's posture is declared StructTypes with
PERMISSIVE parsing, mirroring the reference (SURVEY.md §1.3).

Reference-shaped schemas carry file:line citations into
/root/reference/ so parity is checkable:

- RACE_RESULT_MSG: the Kafka message schema, spark_ingestion.py:67-77
  (all driver-identity fields are strings end-to-end — driver_number is
  TEXT, §3.4; position nullable is load-bearing, README.md:62).
- RACE_RESULTS: the post-transform fact table, spark_ingestion.py:23-36
  (adds points INTEGER, date TIMESTAMP).
- DRIVERS: the dimension, spark_ingestion.py:38-44 /
  kafka_producer.py:19-25 (PK driver_number, headshot_url nullable).
"""

from __future__ import annotations

from pyspark.sql import types as T

RACE_RESULT_MSG = T.StructType(
    [
        T.StructField("grand_prix", T.StringType(), True),
        T.StructField("date", T.StringType(), True),  # ISO-8601, cast in-stream
        T.StructField("driver_number", T.StringType(), True),
        T.StructField("position", T.IntegerType(), True),  # null while race runs
        T.StructField("laps_completed", T.IntegerType(), True),
        T.StructField("dnf", T.BooleanType(), True),
        T.StructField("gap_to_leader", T.StringType(), True),  # display-only
        T.StructField("meeting_key", T.StringType(), True),
        T.StructField("session_key", T.StringType(), True),
    ]
)

#: RACE_RESULT_MSG + corrupt-record column for PERMISSIVE observability
RACE_RESULT_MSG_WITH_CORRUPT = T.StructType(
    [*RACE_RESULT_MSG.fields, T.StructField("_corrupt_record", T.StringType(), True)]
)

RACE_RESULTS = T.StructType(
    [
        T.StructField("grand_prix", T.StringType(), True),
        T.StructField("date", T.TimestampType(), True),
        T.StructField("driver_number", T.StringType(), True),
        T.StructField("position", T.IntegerType(), True),
        T.StructField("laps_completed", T.IntegerType(), True),
        T.StructField("dnf", T.BooleanType(), True),
        T.StructField("gap_to_leader", T.StringType(), True),
        T.StructField("meeting_key", T.StringType(), True),
        T.StructField("session_key", T.StringType(), True),
        T.StructField("points", T.IntegerType(), True),
    ]
)

DRIVERS = T.StructType(
    [
        T.StructField("driver_number", T.StringType(), False),
        T.StructField("driver_name", T.StringType(), True),
        T.StructField("headshot_url", T.StringType(), True),
    ]
)
