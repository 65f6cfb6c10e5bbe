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


def test_pyds_writer_names_sort_in_publish_order(tmp_path):
    # >=11 staged files in one epoch: the published names must STILL
    # sort lexicographically in partition order — an unpadded p10
    # would sort before p2 and break the stream reader's count-offset
    # slicing (duplicated p8/p9, skipped p10/p11)
    import os

    from f1_realtime_data_pipeline_spark.sources.pyds import (
        _ReplayStreamWriter,
        _TaskFile,
    )

    d = str(tmp_path / "topic")
    os.makedirs(d)
    msgs = []
    for pid in range(13):
        tmp = os.path.join(d, f".stage-{pid}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"row-{pid}\n")
        msgs.append(_TaskFile(temp_path=tmp, n_rows=1, partition_id=pid))
    _ReplayStreamWriter({"path": d}).commit(msgs, batchId=0)
    names = sorted(os.listdir(d))
    # lexicographic order == partition order for all 13 files
    contents = []
    for f in names:
        with open(os.path.join(d, f), encoding="utf-8") as fh:
            contents.append(fh.read().strip())
    assert contents == [f"row-{pid}" for pid in range(13)]


def test_pyds_writer_retry_partial_epoch_is_idempotent(tmp_path):
    # Crash-after-partial-publish retry: attempt 1 published only p0;
    # the retry re-stages ALL partitions (same rows — stable partition
    # identity). The retry must keep the published p0, drop its
    # duplicate temp, and publish p1/p2 — no lost or duplicated rows.
    import os

    from f1_realtime_data_pipeline_spark.sources.pyds import (
        _ReplayStreamWriter,
        _TaskFile,
    )

    d = str(tmp_path / "topic")
    os.makedirs(d)

    def stage(pid: int, attempt: int) -> _TaskFile:
        tmp = os.path.join(d, f".stage-a{attempt}-{pid}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"row-{pid}\n")
        return _TaskFile(temp_path=tmp, n_rows=1, partition_id=pid)

    w = _ReplayStreamWriter({"path": d})
    # attempt 1: only partition 0's rename lands before the "crash"
    w.commit([stage(0, attempt=1)], batchId=7)
    assert os.listdir(d) == ["batch-00007-p00000.txt"]
    # attempt 2: full re-stage of the same epoch
    w.commit([stage(pid, attempt=2) for pid in range(3)], batchId=7)
    names = sorted(os.listdir(d))
    assert names == [
        "batch-00007-p00000.txt",
        "batch-00007-p00001.txt",
        "batch-00007-p00002.txt",
    ]
    rows = []
    for f in names:
        with open(os.path.join(d, f), encoding="utf-8") as fh:
            rows.extend(fh.read().split())
    assert sorted(rows) == ["row-0", "row-1", "row-2"]
