"""Streaming last-touch attribution: the stateful stream must reproduce
the batch twin's (oracle-checked) per-channel rollup on the same events,
and carry the last touch ACROSS batches — a click in batch 1 attributes
a purchase in batch 2 without reprocessing batch 1."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.attribution import (
    attribution_stream,
)
from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops4 import (
    attribution_last_touch,
)

T0 = dt.datetime(2024, 6, 1, 8, 0, 0)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(path, rows):
    from conftest import write_events_parquet

    write_events_parquet(path, rows)


def _mixed_corpus():
    """Deterministic multi-user timeline covering every attribution case:
    touch→purchase, purchase-before-touch, touch-after-purchase,
    multiple purchases off one touch, view-vs-click last-touch races."""
    kinds = ["view", "click", "purchase", "other", "click", "purchase", "view"]
    rows = []
    eid = 0
    for u in range(8):
        for i in range(7):
            kind = kinds[(i + u) % len(kinds)]
            rows.append(
                (eid, T0 + dt.timedelta(minutes=3 * i + u * 200), u, kind, float(eid % 13) + 0.25)
            )
            eid += 1
    # equal-timestamp collisions: purchase/click and click/purchase pairs
    # sharing a ts, ordered only by event_id — the (ts, event_id) sort-key
    # regression (a natural tuple sort would compare event_type here)
    t = T0 + dt.timedelta(days=2)
    rows += [
        (eid, t, 90, "view", 1.0),
        (eid + 1, t + dt.timedelta(minutes=1), 90, "purchase", 2.0),  # lower id first
        (eid + 2, t + dt.timedelta(minutes=1), 90, "click", 0.0),
        (eid + 3, t, 91, "click", 0.0),
        (eid + 4, t + dt.timedelta(minutes=1), 91, "click", 0.0),  # same ts as next
        (eid + 5, t + dt.timedelta(minutes=1), 91, "purchase", 4.0),
    ]
    return rows


def _run_stream(spark, in_dir, tmp_path, name, one_file_per_batch=False):
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = attribution_stream(reader.parquet(str(in_dir)))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    return q


def test_stream_matches_batch_rollup(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = _mixed_corpus()
    _write_events(in_dir / "events.parquet", rows)

    q = _run_stream(spark, in_dir, tmp_path, "attr_all")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = (
        spark.sql("SELECT * FROM attr_all")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    got = {r.channel: (r.n_purchases, r.total_value) for r in streamed.collect()}

    # Batch twin reads events.parquet from an sf-style dir.
    batch_dir = tmp_path / "sf"
    batch_dir.mkdir()
    shutil.copy(in_dir / "events.parquet", batch_dir / "events.parquet")
    want = {
        r.channel: (r.n_purchases, r.total_value)
        for r in attribution_last_touch(spark, str(batch_dir)).collect()
    }
    assert got == want and got, got


def test_touch_carries_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # Batch 1: user 1 clicks; user 2 purchases untouched.
    _write_events(
        in_dir / "b1.parquet",
        [
            (1, T0, 1, "click", 0.0),
            (2, T0, 2, "purchase", 5.0),
        ],
    )
    q = _run_stream(spark, in_dir, tmp_path, "attr_xbatch", one_file_per_batch=True)
    try:
        q.processAllAvailable()
        # Batch 2: user 1 purchases — must credit the batch-1 click from state.
        _write_events(
            in_dir / "b2.parquet",
            [(3, T0 + dt.timedelta(minutes=5), 1, "purchase", 9.0)],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.channel): r.value
        for r in spark.sql("SELECT * FROM attr_xbatch").collect()
    }
    assert got == {(2, "direct"): 5.0, (1, "click"): 9.0}
