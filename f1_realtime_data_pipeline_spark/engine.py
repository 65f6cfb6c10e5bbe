"""``F1Engine`` — the one-object facade a user of the reference
switches to.

The reference's UX is: run ``kafka_producer.py`` (ingest), run
``spark_ingestion.py`` (stream → table), open the Streamlit app (the
four serving queries). Here that is::

    from f1_realtime_data_pipeline_spark.engine import F1Engine

    eng = F1Engine.from_parquet(spark, fact_path, dim_path)
    eng.standings()            # Q1 (streamlit-app.py:41-60)
    eng.champion()             # Q2 (streamlit-app.py:65-66)
    eng.classification("Monza")# Q3 (streamlit-app.py:107-121)
    eng.podium()               # Q4 (streamlit-app.py:127-133)
    eng.available_gps()        # the GP picker
    q = eng.start_ingest(src_dir, fact_path, ckpt)   # Q0, idempotent

Every method returns a DataFrame (lazy); rendering is the caller's
concern, same as the reference's Streamlit layer. ``dedup=True``
(default) repairs duplicate (session_key, driver_number) rows before
serving — the §3.4 at-least-once hazard the reference carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from f1_realtime_data_pipeline_spark.plans import contract_f1 as c
from f1_realtime_data_pipeline_spark.schemas import DRIVERS, RACE_RESULTS


class F1Engine:
    def __init__(
        self,
        spark: SparkSession,
        results: DataFrame,
        drivers: DataFrame,
        *,
        dedup: bool = True,
        season_total: int = c.SEASON_TOTAL_GPS,
    ) -> None:
        self.spark = spark
        self._raw_results = results
        self.results = c.dedup_results(results) if dedup else results
        self.drivers = drivers
        self.season_total = season_total

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_parquet(
        cls, spark: SparkSession, fact_path: str, dim_path: str, **kw
    ) -> "F1Engine":
        return cls(
            spark,
            spark.read.schema(RACE_RESULTS).parquet(fact_path),
            spark.read.schema(DRIVERS).parquet(dim_path),
            **kw,
        )

    @classmethod
    def from_jdbc(
        cls, spark: SparkSession, url: str, properties: dict[str, str], **kw
    ) -> "F1Engine":
        """Read the reference's own Postgres tables (S6)."""
        return cls(
            spark,
            spark.read.jdbc(url, "race_results", properties=properties),
            spark.read.jdbc(url, "drivers", properties=properties),
            **kw,
        )

    # -- serving queries (§2.9) -------------------------------------------

    def standings(self) -> DataFrame:
        return c.standings(self.results, self.drivers)

    def champion(self) -> DataFrame:
        return c.champion(self.results, self.drivers, self.season_total)

    def classification(self, grand_prix: str) -> DataFrame:
        return c.classification(self.results, self.drivers, grand_prix)

    def podium(self) -> DataFrame:
        return c.podium(self.results, self.drivers)

    def available_gps(self) -> DataFrame:
        return c.available_gps(self.results)

    # -- ingest (Q0) -------------------------------------------------------

    def start_ingest(
        self, source_dir: str, sink_dir: str, checkpoint_dir: str
    ) -> StreamingQuery:
        """Broker-less replay ingest: JSON files → Q0 transform →
        idempotent keyed sink (exactly-once on replay)."""
        from f1_realtime_data_pipeline_spark.streaming.pipeline import (
            start_replay_pipeline,
        )

        return start_replay_pipeline(self.spark, source_dir, sink_dir, checkpoint_dir)

    def start_kafka_ingest(
        self, bootstrap: str, topic: str, sink_dir: str, checkpoint_dir: str
    ) -> StreamingQuery:
        """Kafka ingest with the reference's source semantics (S1:
        earliest offsets, failOnDataLoss=false)."""
        from f1_realtime_data_pipeline_spark.streaming.pipeline import (
            start_kafka_pipeline,
        )

        return start_kafka_pipeline(
            self.spark, bootstrap, topic, sink_dir, checkpoint_dir
        )
