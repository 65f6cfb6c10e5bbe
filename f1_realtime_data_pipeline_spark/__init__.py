"""f1_realtime_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``RidaAdar/f1-realtime-data-pipeline``
(see SURVEY.md for the what-it-computes contract), extended with the
operators a large-scale LLM training-data pipeline needs (dedup,
similarity search, multimodal columns, text analysis).

Layout
------
- ``session``     SparkSession factory + star-schema table loader
- ``schemas``     explicit StructTypes (reference-shaped + star schema)
- ``functions``   scalar/column expression builders (points ladder, text,
                  vector math, deterministic hashing)
- ``operators``   relational operator library (projections, filters,
                  joins, aggregations, sorts, set ops, dedup, similarity)
- ``plans``       composed queries: the reference's contract queries
                  Q0-Q4, star-schema analogs, TPC-H-style headliners
- ``sources``     connectors: parquet, Kafka (gated), REST fetcher,
                  file-based replay source for tests
- ``streaming``   Structured Streaming wiring: Q0 pipeline, idempotent
                  sinks, event-time windows, stateful ops

Everything is stock DataFrame/SQL on Catalyst — no custom physical
execution. Operators are written for a 1000-executor / 100 TB posture
(broadcast the dims, shuffle only on declared keys, no driver-side
collects in any operator path) even though tests run on local[*].
"""

__version__ = "0.1.0"
