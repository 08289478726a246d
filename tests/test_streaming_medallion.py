"""Medallion pipeline: streaming CDC through an exactly-once bronze
layer into a latest-wins silver snapshot. Asserts (a) the snapshot
equals the batch CDC rule over all changes, (b) a later-batch delete
removes a key that an earlier batch upserted, (c) bronze epoch replay
does not duplicate."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.medallion import (
    MedallionPipeline,
    apply_latest_wins,
)

CHANGE_SCHEMA = "key long, op string, seq long, payload string"


def _write(spark, path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    t = pa.table(
        {
            "key": pa.array(cols[0], pa.int64()),
            "op": pa.array(cols[1], pa.string()),
            "seq": pa.array(cols[2], pa.int64()),
            "payload": pa.array(cols[3], pa.string()),
        }
    )
    pq.write_table(t, str(path))


def test_medallion_cross_batch_latest_wins(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    bronze, silver = str(tmp_path / "bronze"), str(tmp_path / "silver")
    # batch 1: keys 1,2 upserted; key 3 deleted-before-ever-seen
    _write(spark, in_dir / "b1.parquet", [(1, "U", 10, "a"), (2, "U", 10, "b"), (3, "D", 10, "x")])

    pipe = MedallionPipeline(bronze, silver, key="key", seq_cols=["seq"])
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        stream.writeStream.foreachBatch(pipe.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        s1 = {r.key: r.payload for r in pipe.snapshot(spark).collect()}
        assert s1 == {1: "a", 2: "b"}
        time.sleep(0.2)
        # batch 2: key 1 updated, key 2 DELETED (cross-batch tombstone)
        _write(spark, in_dir / "b2.parquet", [(1, "U", 20, "a2"), (2, "D", 20, "z")])
        q.processAllAvailable()
    finally:
        q.stop()

    s2 = {r.key: r.payload for r in pipe.snapshot(spark).collect()}
    assert s2 == {1: "a2"}

    # silver must equal the batch rule applied to ALL changes at once
    allchanges = spark.read.parquet(str(in_dir))
    want = {
        r.key: r.payload
        for r in apply_latest_wins(allchanges, "key", ["seq"]).collect()
    }
    assert s2 == want

    # bronze epoch replay idempotence: re-running epoch 0's write leaves
    # per-epoch row counts unchanged
    fn = pipe.foreach_batch()
    b1 = spark.read.parquet(str(in_dir / "b1.parquet"))
    before = spark.read.parquet(bronze).groupBy("_epoch").count().collect()
    fn(b1, 0)
    after = spark.read.parquet(bronze).groupBy("_epoch").count().collect()
    assert sorted((r["_epoch"], r["count"]) for r in before) == sorted(
        (r["_epoch"], r["count"]) for r in after
    )
