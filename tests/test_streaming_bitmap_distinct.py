"""Streaming bitmap exact-distinct: running counts must equal exact
COUNT(DISTINCT) over everything seen so far, and replaying a batch
must be a no-op (OR-merge idempotence = exactly-once)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.bitmap_distinct import (
    merge_bitmap_batch,
    start_bitmap_distinct,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

T0 = dt.datetime(2024, 7, 1)


def _write_events(path, rows):
    from conftest import write_events_parquet

    write_events_parquet(path, rows)


def _rows(pairs, start_eid=0):
    return [
        (start_eid + i, T0, uid, etype, 1.0, "{}")
        for i, (uid, etype) in enumerate(pairs)
    ]


def test_running_counts_match_exact_distinct(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    b1 = [(1, "view"), (2, "view"), (1, "view"), (70000, "click")]
    b2 = [(2, "view"), (3, "view"), (1, "click"), (70000, "click")]
    _write_events(in_dir / "b1.parquet", _rows(b1))
    q = start_bitmap_distinct(
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir)),
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        _write_events(in_dir / "b2.parquet", _rows(b2, start_eid=100))
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "out"))
    last = out.filter(F.col("batch_id") == out.agg(F.max("batch_id")).collect()[0][0])
    got = {r.event_type: r.distinct_users for r in last.collect()}
    # union of both batches: view {1,2,3}, click {1,70000}
    assert got == {"view": 3, "click": 2}


def test_replay_is_idempotent(spark, tmp_path):
    """Invoking the merge body twice with the same batch_id (the
    failure/replay scenario) leaves state and counts identical."""
    batch = spark.createDataFrame(
        [(1, "view"), (2, "view"), (70000, "view")], "user_id long, event_type string"
    )
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    merge_bitmap_batch(batch, 0, state, out)
    first = {
        (r.event_type, r.batch_id): r.distinct_users
        for r in spark.read.parquet(out).collect()
    }
    merge_bitmap_batch(batch, 0, state, out)  # replay
    again = {
        (r.event_type, r.batch_id): r.distinct_users
        for r in spark.read.parquet(out).collect()
    }
    assert first == again == {("view", 0): 3}
    # and a LATER batch re-adding seen users changes nothing
    merge_bitmap_batch(batch, 1, state, out)
    last = spark.read.parquet(out).filter(F.col("batch_id") == 1).collect()
    assert {r.event_type: r.distinct_users for r in last} == {"view": 3}


def test_checkpoint_state_mismatch_fails_loud(spark, tmp_path):
    """A batch id BEHIND an existing newer state version means the
    checkpoint was reset while state_dir was kept — the merge must
    refuse (silently rebasing would write undercounted state while the
    stale newer version lingers)."""
    import pytest

    batch = spark.createDataFrame(
        [(1, "view")], "user_id long, event_type string"
    )
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    merge_bitmap_batch(batch, 0, state, out)
    merge_bitmap_batch(batch, 1, state, out)
    with pytest.raises(RuntimeError, match="checkpoint/state-dir mismatch"):
        merge_bitmap_batch(batch, 0, state, out)
