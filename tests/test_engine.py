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


def test_engine_lakehouse_points_view_and_upsert(spark, tmp_path):
    """r5 facade surface: the live points materialized view end to end
    (stream → exactly-once agg table → joined serving read, resumed
    run adds nothing), from_lakehouse serving a snapshot table, and
    the driver-dimension upsert."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "points_view")
    ckpt = str(tmp_path / "ckpt_view")
    dim_path = str(tmp_path / "dim")
    fixtures.drivers(spark).write.parquet(dim_path)
    lines = [r.value for r in fixtures.raw_messages(spark).collect()]
    write_replay_batch(src, lines, 0)

    eng = F1Engine(
        spark, fixtures.race_results(spark).limit(0), fixtures.drivers(spark)
    )
    eng.start_points_view(src, view, ckpt).awaitTermination(120)
    pv = eng.points_view(view).collect()
    assert pv[0].total_points == pv[0].total_points  # materialized
    got = {r.driver_number: r.total_points for r in pv}
    # oracle: batch sum over the same transformed lines
    from f1_realtime_data_pipeline_spark.streaming.pipeline import transform_stream

    raw = spark.createDataFrame([(v,) for v in lines], ["value"])
    want = {
        r.driver_number: r.pts
        for r in transform_stream(raw, value_col="value")
        .groupBy("driver_number")
        .agg(F.sum("points").alias("pts"))
        .collect()
    }
    assert got == want
    # the view is ordered like the board and dim-joined
    assert pv[0].total_points == max(want.values())
    assert all(r.driver_name is not None for r in pv)
    # resume: no new data, totals unchanged (exactly-once)
    eng.start_points_view(src, view, ckpt).awaitTermination(120)
    assert {r.driver_number: r.total_points for r in eng.points_view(view).collect()} == want

    # from_lakehouse: serve standings from a manifest fact table
    from f1_realtime_data_pipeline_spark.streaming.sinks import (
        transactional_parquet_sink,
    )
    from f1_realtime_data_pipeline_spark.streaming.pipeline import RESULT_KEYS

    fact_table = str(tmp_path / "fact_table")
    transactional_parquet_sink(
        fact_table, RESULT_KEYS, order_cols=["date", "grand_prix"]
    )(transform_stream(raw, value_col="value"), 0)
    eng2 = F1Engine.from_lakehouse(spark, fact_table, dim_path)
    assert eng2.standings().count() > 0

    # driver-dim upsert: renamed driver serves under the new name
    ups = spark.createDataFrame(
        [("1", "M. VERSTAPPEN II", "Red Bull")],
        ["driver_number", "driver_name", "team"],
    )
    eng3 = eng2.upsert_drivers(ups.select("driver_number", "driver_name"))
    names = {r.driver_number: r.driver_name for r in eng3.standings().collect()}
    assert names["1"] == "M. VERSTAPPEN II"
