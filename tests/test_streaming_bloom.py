"""Streaming incremental Bloom dedup: per-batch scan-side membership
against all previously-seen keys, bitmap folded forward by bytewise OR
(set union == bitmap OR — the mergeability that makes Bloom state work
across batches), plus exact checkpoint recovery by rebuilding from the
emitted rows."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.dedup_bloom import (
    StreamingBloomDedup,
)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_streaming_bloom_dedup_across_batches(spark, tmp_path):
    log_dir = tmp_path / "in"
    log_dir.mkdir()
    _write(log_dir / "b1.txt", ["alpha", "beta", "gamma"])

    dedup = StreamingBloomDedup("value")
    out: list[tuple[int, str, bool]] = []

    def writer(df, epoch_id):
        for r in df.collect():
            out.append((epoch_id, r["value"], r["is_candidate_dup"]))

    stream = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(log_dir))
    q = (
        stream.writeStream.foreachBatch(dedup.foreach_batch(writer))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.2)
        _write(log_dir / "b2.txt", ["beta", "delta", "alpha"])
        q.processAllAvailable()
    finally:
        q.stop()

    by_val = {(v): d for (_e, v, d) in out}
    first_batch = {v: d for (e, v, d) in out if e == 0}
    # batch 1: empty bitmap — everything definitely new
    assert first_batch == {"alpha": False, "beta": False, "gamma": False}
    # batch 2: repeats flagged as candidates, fresh key passes clean
    assert by_val["delta"] is False
    second = {v: d for (e, v, d) in out if e > 0}
    assert second["beta"] is True and second["alpha"] is True


def test_streaming_bloom_rebuild_matches_incremental(spark):
    """Recovery contract: a bitmap rebuilt from the seen rows equals the
    incrementally-OR-folded one (the bitmap is a pure function of the
    seen key set)."""
    seen = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "value string")
    inc = StreamingBloomDedup("value")
    inc.foreach_batch(lambda df, e: df.collect())(
        seen.filter(F.col("value") != "gamma"), 0
    )
    inc.foreach_batch(lambda df, e: df.collect())(
        seen.filter(F.col("value") == "gamma"), 1
    )
    re = StreamingBloomDedup("value")
    re.rebuild_from(seen)
    assert inc.bitmap == re.bitmap
