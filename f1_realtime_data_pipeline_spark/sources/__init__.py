"""Connectors: batch parquet, Kafka (gated behind the connector jar),
REST batch fetch, and a file-based replay source for broker-less tests.
"""

from f1_realtime_data_pipeline_spark.sources.parquet import read_events, read_table

__all__ = ["read_events", "read_table"]
