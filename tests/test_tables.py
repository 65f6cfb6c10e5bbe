"""Tests for table lifecycle utilities (SURVEY.md §2.1 S7-S9)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

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


def test_partition_pruning(spark, sf_dir, tmp_path):
    import contextlib
    import io

    from f1_realtime_data_pipeline_spark.sources.parquet import read_events
    from f1_realtime_data_pipeline_spark.sources.tables import write_partitioned

    ev = read_events(spark, sf_dir)
    path = str(tmp_path / "events_part")
    write_partitioned(ev, path, ["event_type"])
    pruned = spark.read.parquet(path).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("\n")[0]
    # pruning is semantic too: the filtered read equals the base filter
    assert pruned.count() == ev.filter(F.col("event_type") == "click").count()


def test_compact_file_count(spark, sf_dir, tmp_path):
    from f1_realtime_data_pipeline_spark.sources.tables import compact
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    # simulate the small-files problem: 32 splits of 6000 rows, then
    # compact to ceil(6000/2000) = 3 files (coalesce merges splits,
    # it cannot split — exactly the compaction direction)
    li = read_table(spark, sf_dir, "lineitem").repartition(32)
    out = str(tmp_path / "compacted")
    compact(li, target_rows_per_file=2000).write.parquet(out)
    import glob

    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 3
    assert spark.read.parquet(out).count() == 6000


def test_csv_jsonl_readers_and_quarantine(spark, tmp_path):
    from f1_realtime_data_pipeline_spark.sources.files import (
        read_csv,
        read_jsonl,
        split_quarantine,
    )

    csv = tmp_path / "in.csv"
    csv.write_text("k,v\n1,alpha\n2,beta\nnot_an_int,gamma\n")
    df = read_csv(spark, str(csv), "k bigint, v string")
    good, bad, parsed = split_quarantine(df)
    assert {(r.k, r.v) for r in good.collect()} == {(1, "alpha"), (2, "beta")}
    assert bad.count() == 1
    assert "not_an_int" in bad.collect()[0]._corrupt_record

    jl = tmp_path / "in.jsonl"
    jl.write_text('{"k": 1, "v": "alpha"}\n{bad json\n{"k": 2, "v": "beta"}\n')
    dj = read_jsonl(spark, str(jl), "k bigint, v string")
    goodj, badj, parsedj = split_quarantine(dj)
    assert {(r.k, r.v) for r in goodj.collect()} == {(1, "alpha"), (2, "beta")}
    assert badj.count() == 1

    # the same reader under readStream (file-replay source)
    stream = read_jsonl(spark, str(tmp_path), "k bigint, v string", streaming=True)
    assert stream.isStreaming


def test_drop_cascade_views(spark):
    # S9 CASCADE (VERDICT r4 missing #3): dropping a table removes
    # every view that reads it — directly, transitively, and temp —
    # while unrelated views survive.
    from f1_realtime_data_pipeline_spark.sources.tables import (
        drop_cascade,
        relation_dependencies,
    )

    drop_all_user_tables(spark)
    spark.sql("CREATE TABLE casc_t1 (id BIGINT) USING parquet")
    spark.sql("CREATE TABLE casc_t2 (id BIGINT) USING parquet")
    spark.sql("CREATE OR REPLACE VIEW casc_pv1 AS SELECT id + 1 AS id2 FROM casc_t1")
    spark.sql("CREATE OR REPLACE VIEW casc_pv2 AS SELECT * FROM casc_pv1")
    spark.sql("CREATE OR REPLACE VIEW casc_pv3 AS SELECT * FROM casc_t2")
    spark.sql("CREATE OR REPLACE TEMP VIEW casc_tv1 AS SELECT * FROM casc_pv1")

    # analyzed-plan dependency walk sees the transitive chain
    deps = relation_dependencies(spark, "casc_pv2")
    assert "spark_catalog.default.casc_t1" in deps
    assert "spark_catalog.default.casc_pv1" in deps

    dropped = drop_cascade(spark, "casc_t1")
    assert set(dropped) == {
        "default.casc_pv1",
        "default.casc_pv2",
        "casc_tv1",
        "default.casc_t1",
    }
    # the target drops LAST: no intermediate state has a dangling view
    assert dropped[-1] == "default.casc_t1"
    remaining = set(list_user_tables(spark))
    assert remaining == {"casc_pv3", "casc_t2"}
    assert spark.sql("SELECT * FROM casc_pv3").count() == 0  # still resolvable

    # cascading a VIEW drops its dependents and uses DROP VIEW
    spark.sql("CREATE OR REPLACE TEMP VIEW casc_tv2 AS SELECT * FROM casc_pv3")
    dropped2 = drop_cascade(spark, "casc_pv3")
    assert set(dropped2) == {"casc_tv2", "default.casc_pv3"}
    drop_all_user_tables(spark)


def test_drop_cascade_temp_view_target(spark):
    # cascading a TEMP view target: its dependents drop, it drops via
    # DROP VIEW (temp views shadow tables in resolution precedence)
    from f1_realtime_data_pipeline_spark.sources.tables import drop_cascade

    spark.sql("CREATE OR REPLACE TEMP VIEW casc_base AS SELECT 1 AS x")
    spark.sql("CREATE OR REPLACE TEMP VIEW casc_dep AS SELECT * FROM casc_base")
    dropped = drop_cascade(spark, "casc_base")
    assert set(dropped) == {"casc_dep", "casc_base"}
    temps = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert not temps & {"casc_base", "casc_dep"}


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC interop (r5): write/read roundtrip preserves rows and
    schema, and filters + column pruning reach the ORC scan exactly
    like parquet (PushedFilters / narrow ReadSchema in the plan)."""
    import contextlib
    import io

    from f1_realtime_data_pipeline_spark.sources.files import read_orc, write_orc
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    d = read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(d, out)
    back = read_orc(spark, out)
    assert back.count() == d.count() and back.columns == d.columns
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in d.select("doc_id").collect()
    }
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("doc_id") == 7).select("doc_id").explain("formatted")
    plan = buf.getvalue()
    assert "EqualTo(doc_id,7)" in plan.split("PushedFilters")[1].split("\n")[0]
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    # streaming mode: the same path is a file-replay source (explicit
    # schema required — footer discovery is batch-only)
    assert read_orc(spark, out, schema=back.schema, streaming=True).isStreaming
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_orc(spark, out, streaming=True)


def test_drop_all_user_tables_survives_temp_name_shadowing(spark):
    # r7 review (confirmed live before the fix): with a TEMP view
    # sharing a persistent object's name, the unqualified DROP
    # resolved the temp view first — destroying the innocent temp view
    # while reporting the (surviving) persistent object as dropped.
    from f1_realtime_data_pipeline_spark.sources.tables import (
        drop_all_user_tables,
    )

    spark.sql("CREATE TABLE IF NOT EXISTS pt_shadow_r7 (k INT) USING parquet")
    spark.sql("CREATE OR REPLACE VIEW pv_shadow_r7 AS SELECT 1 AS one")
    spark.range(3).createOrReplaceTempView("pt_shadow_r7")
    spark.range(4).createOrReplaceTempView("pv_shadow_r7")
    try:
        dropped = drop_all_user_tables(spark)
        assert "pt_shadow_r7" in dropped and "pv_shadow_r7" in dropped
        # persistent objects actually gone...
        persistent = {
            t.name for t in spark.catalog.listTables() if not t.isTemporary
        }
        assert "pt_shadow_r7" not in persistent
        assert "pv_shadow_r7" not in persistent
        # ...and the same-named TEMP views untouched
        temps = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        assert {"pt_shadow_r7", "pv_shadow_r7"} <= temps
        assert spark.table("pt_shadow_r7").count() == 3
    finally:
        spark.catalog.dropTempView("pt_shadow_r7")
        spark.catalog.dropTempView("pv_shadow_r7")
        spark.sql("DROP TABLE IF EXISTS default.pt_shadow_r7")
        spark.sql("DROP VIEW IF EXISTS default.pv_shadow_r7")
