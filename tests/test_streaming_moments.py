"""Streaming running moments: after all batches the per-key statistics
must equal a one-shot computation over everything (additive-state
mergeability across the streaming surface), and the fold must be
order-free."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.moments import (
    _SCALE,
    _fold_moments,
    moments_stream,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

T0 = dt.datetime(2024, 9, 1)


def _write_events(path, rows):
    from conftest import write_events_parquet

    write_events_parquet(path, rows)


def test_fold_is_order_free_and_additive():
    vals = [1.25, 3.5, 0.125, 9.0, 2.75, 6.0]
    a = _fold_moments(vals, None)
    b = _fold_moments(list(reversed(vals)), None)
    assert a == b
    # additivity: fold(all) == fold(second half, fold(first half))
    c = _fold_moments(vals[3:], _fold_moments(vals[:3], None))
    assert c == a


def test_stream_final_stats_match_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    b1 = [(i, T0, 1, "view", float(i % 7) + 0.5, "{}") for i in range(30)]
    b2 = [(100 + i, T0, 1, "view", float(i % 5) * 2 + 0.25, "{}")
          for i in range(20)]
    _write_events(in_dir / "b1.parquet", b1)
    q = (
        moments_stream(
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("moments")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(in_dir / "b2.parquet", b2)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM moments").collect()
    final = max((r for r in rows if r.event_type == "view"), key=lambda r: r.n)
    vals = [v for *_a, v, _p in (r for r in b1 + b2)]
    qs = [math.floor(v * _SCALE) for v in vals]
    n = len(qs)
    mean = sum(qs) / _SCALE / n
    var = sum(x * x for x in qs) / (_SCALE * _SCALE) / n - mean * mean
    assert final.n == n
    assert abs(final.mean - mean) < 1e-9
    assert abs(final.std - math.sqrt(var)) < 1e-9
    assert abs(final.cv - math.sqrt(var) / mean) < 1e-9


def test_zero_mean_cv_is_null_not_nan(spark, tmp_path):
    """All-zero values → mean 0 → cv must surface as SQL NULL (None),
    not NaN: NULL = NULL compares true across engines and parquet
    round-trips; NaN != NaN does not."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_events(in_dir / "b1.parquet",
                  [(i, T0, 1, "zero", 0.0, "{}") for i in range(5)])
    q = (
        moments_stream(
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("moments_zero")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM moments_zero").collect()
    final = max((r for r in rows if r.event_type == "zero"), key=lambda r: r.n)
    assert final.mean == 0.0 and final.std == 0.0
    assert final.cv is None  # NULL, not NaN
