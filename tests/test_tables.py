"""Tests for table lifecycle utilities (SURVEY.md §2.1 S7-S9)."""

from __future__ import annotations

from pyspark.sql import Row

from f1_realtime_data_pipeline_spark.sources.tables import (
    create_table_if_not_exists,
    drop_all_user_tables,
    list_user_tables,
    upsert_last_wins,
)


def test_upsert_last_wins_replaces_and_passes_through(spark):
    base = spark.createDataFrame(
        [Row(k="1", v="old1"), Row(k="2", v="old2"), Row(k="3", v="old3")]
    )
    updates = spark.createDataFrame([Row(k="2", v="new2"), Row(k="9", v="new9")])
    out = {r.k: r.v for r in upsert_last_wins(base, updates, ["k"]).collect()}
    assert out == {"1": "old1", "2": "new2", "3": "old3", "9": "new9"}


def test_upsert_idempotent(spark):
    base = spark.createDataFrame([Row(k="1", v="a")])
    updates = spark.createDataFrame([Row(k="1", v="b")])
    once = upsert_last_wins(base, updates, ["k"])
    twice = upsert_last_wins(once, updates, ["k"])
    assert [r.v for r in twice.collect()] == ["b"]


def test_ddl_catalog_roundtrip(spark):
    # S8 create-if-not-exists is idempotent; S9 listing sees it and
    # the cascade drop removes it.
    drop_all_user_tables(spark)
    create_table_if_not_exists(spark, "t_life", "id BIGINT, name STRING")
    create_table_if_not_exists(spark, "t_life", "id BIGINT, name STRING")  # no error
    create_table_if_not_exists(spark, "t_life2", "id BIGINT")
    names = list_user_tables(spark)
    assert {"t_life", "t_life2"} <= set(names)
    dropped = drop_all_user_tables(spark)
    assert {"t_life", "t_life2"} <= set(dropped)
    assert list_user_tables(spark) == []
