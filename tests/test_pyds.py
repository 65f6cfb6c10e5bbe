"""Python DataSource replay format (sources/pyds.py).

Drives the f1replay format through batch AND streaming reads against
the same replay directory `sources.replay` writes, including a real
checkpoint-resume (the offset contract the engine persists).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.sources.pyds import register_replay_source
from f1_realtime_data_pipeline_spark.sources.replay import write_replay_batch


def _payload(i: int) -> str:
    return json.dumps({"driver_number": str(i), "position": i})


def test_pyds_batch_read_matches_text_source(spark, tmp_path):
    d = str(tmp_path / "topic")
    write_replay_batch(d, [_payload(1), _payload(2)], 0)
    write_replay_batch(d, [_payload(3)], 1)
    register_replay_source(spark)
    got = spark.read.format("f1replay").option("path", d).load()
    assert got.columns == ["value"]
    want = spark.read.text(d).withColumnRenamed("value", "v")
    assert sorted(r.value for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )
    # parallelism contract: one partition per published batch file
    assert got.rdd.getNumPartitions() == 2


def test_pyds_batch_empty_and_missing_dir(spark, tmp_path):
    register_replay_source(spark)
    missing = spark.read.format("f1replay").option(
        "path", str(tmp_path / "nope")
    ).load()
    assert missing.count() == 0


def test_pyds_streaming_offsets_and_resume(spark, tmp_path):
    d = str(tmp_path / "topic")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_replay_batch(d, [_payload(1), _payload(2)], 0)
    register_replay_source(spark)

    def start():
        return (
            spark.readStream.format("f1replay")
            .option("path", d)
            .load()
            .select(F.get_json_object("value", "$.driver_number").alias("drv"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(120)
    assert sorted(r.drv for r in spark.read.parquet(out).collect()) == ["1", "2"]

    # publish two more batches, RESTART from the same checkpoint: the
    # persisted {"index": n} offset must resume AFTER the consumed
    # files — old payloads appear exactly once, new ones all arrive
    write_replay_batch(d, [_payload(3)], 1)
    write_replay_batch(d, [_payload(4)], 2)
    q = start()
    q.awaitTermination(120)
    assert sorted(r.drv for r in spark.read.parquet(out).collect()) == [
        "1",
        "2",
        "3",
        "4",
    ]


def test_pyds_stream_writer_roundtrip(spark, tmp_path):
    # topic A --stream--> topic B via the f1replay SINK, then read B
    # back with the f1replay batch reader: the full producer/consumer
    # loop on one format
    src_d = str(tmp_path / "a")
    dst_d = str(tmp_path / "b")
    ckpt = str(tmp_path / "ck")
    write_replay_batch(src_d, [_payload(1), _payload(2)], 0)
    write_replay_batch(src_d, [_payload(3)], 1)
    register_replay_source(spark)
    q = (
        spark.readStream.format("f1replay")
        .option("path", src_d)
        .load()
        .writeStream.format("f1replay")
        .option("path", dst_d)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.format("f1replay").option("path", dst_d).load()
    assert sorted(r.value for r in out.collect()) == sorted(
        [_payload(1), _payload(2), _payload(3)]
    )
    # publish discipline: only final batch-*.txt names remain — no
    # dot-temp stage files survive a committed epoch
    import os

    leftovers = [f for f in os.listdir(dst_d) if not f.startswith("batch-")]
    assert leftovers == []
    # a second micro-batch appends NEW files (batchId-embedded names),
    # never rewrites published ones
    before = sorted(os.listdir(dst_d))
    write_replay_batch(src_d, [_payload(4)], 2)
    q = (
        spark.readStream.format("f1replay")
        .option("path", src_d)
        .load()
        .writeStream.format("f1replay")
        .option("path", dst_d)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    after = sorted(os.listdir(dst_d))
    assert set(before) <= set(after) and len(after) > len(before)
    out2 = spark.read.format("f1replay").option("path", dst_d).load()
    assert sorted(r.value for r in out2.collect()) == sorted(
        [_payload(i) for i in (1, 2, 3, 4)]
    )
