"""End-to-end test of the F1Engine facade: ingest → serve, the full
reference workflow in one object."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark import fixtures
from f1_realtime_data_pipeline_spark.engine import F1Engine
from f1_realtime_data_pipeline_spark.sources.replay import write_replay_batch


def test_engine_serves_reference_queries(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    fixtures.race_results(spark).write.parquet(fact_path)
    fixtures.drivers(spark).write.parquet(dim_path)

    eng = F1Engine.from_parquet(spark, fact_path, dim_path)

    s = eng.standings().collect()
    assert s[0].driver_number == "1" and s[0].points == 68  # 25+18+25
    assert {r.driver_number for r in s} >= {"1", "44", "16", "63", "99"}
    zero_wins = {r.driver_number: r.wins for r in s}
    assert zero_wins["63"] == 0  # coalesce(wins, 0)

    # 3 distinct GPs < 22 → no champion yet
    assert eng.champion().count() == 0
    eng22 = F1Engine.from_parquet(spark, fact_path, dim_path, season_total=3)
    champ = eng22.champion().collect()
    assert len(champ) == 1 and champ[0].driver_number == "1"

    cls = eng.classification("Bahrain").collect()
    assert [r.driver_number for r in cls] == ["1", "44", "99", "16"]
    assert cls[0].gap_to_leader == "N/A"  # null gap coalesced

    pod = eng.podium().collect()
    assert [r.podium_rank for r in pod] == [1, 2, 3]
    assert pod[0].driver_number == "1"

    gps = [r.grand_prix for r in eng.available_gps().collect()]
    assert gps == ["Monza", "Jeddah", "Bahrain"]  # newest first


def test_engine_ingest_then_serve(spark, tmp_path):
    # Q0 end-to-end through the facade: raw JSON replay → idempotent
    # sink → the engine serves from what it ingested.
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    dim_path = str(tmp_path / "dim")
    fixtures.drivers(spark).write.parquet(dim_path)
    lines = [r.value for r in fixtures.raw_messages(spark).collect()]
    write_replay_batch(src, lines, 0)

    bootstrap = F1Engine(
        spark, fixtures.race_results(spark).limit(0), fixtures.drivers(spark)
    )
    q = bootstrap.start_ingest(src, sink, ckpt)
    q.awaitTermination(120)

    eng = F1Engine.from_parquet(spark, sink, dim_path)
    s = eng.standings()
    assert s.count() > 0
    # ingest filtered unfinished rows: every served row has a position
    assert eng.results.filter(F.col("position").isNull()).count() == 0
