"""Streaming per-key CUSUM: the stateful recurrence must equal the
batch closed form (S_t = P_t − min(0, min_{j≤t} P_j)) on the same
series, carry the statistic across batches, and alarm on an injected
step change."""

from __future__ import annotations

import datetime as dt

from prometheus_clickhouselog_exporter_spark.streaming.cusum import (
    _fold_cusum,
    cusum_stream,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(path, rows):
    from conftest import write_events_parquet

    write_events_parquet(path, rows)


def _series_rows(counts_by_type: dict[str, list[int]], start_eid=0):
    rows, eid = [], start_eid
    for etype, series in counts_by_type.items():
        for day, c in enumerate(series):
            for _ in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(days=day), 1, etype, 1.0, "{}")
                )
                eid += 1
    return rows


def _closed_form(series: list[int], kref: int) -> list[int]:
    """Batch closed form S_t = P_t − min(0, min_{j≤t} P_j) over the
    observed-day counts (the events_cusum_per_key oracle shape)."""
    p, prefixes, out = 0, [], []
    for c in series:
        p += c - kref
        prefixes.append(p)
        out.append(p - min(0, min(prefixes)))
    return out


def test_fold_equals_closed_form():
    series = [5, 5, 9, 2, 14, 14, 3, 5, 20, 1]
    kref = 6
    days = []
    for d, c in enumerate(series):
        days += [d] * c
    days.append(99)  # sentinel later day closes the last real day
    out, _ = _fold_cusum(days, None, kref, threshold=10)
    got = [o["cusum"] for o in out]
    want = _closed_form(series, kref)
    assert got == want
    # recurrence sanity: independent replay
    s, rec = 0, []
    for c in series:
        s = max(0, s + c - kref)
        rec.append(s)
    assert got == rec


def _run(spark, in_dir, tmp_path, name, kref, threshold, per_file=False):
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = cusum_stream(reader.parquet(str(in_dir)), kref, threshold)
    return (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )


def test_stream_alarms_on_step_change(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    flat = [5] * 12
    step = [5] * 6 + [12] * 6
    rows = _series_rows({"flat": flat, "step": step})
    _write_events(in_dir / "events.parquet", rows)
    q = _run(spark, in_dir, tmp_path, "cusum_step", kref=6, threshold=10)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM cusum_step").collect()
    by_type: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    # 11 closed days each (the 12th stays open in state)
    assert len(by_type["flat"]) == 11 and len(by_type["step"]) == 11
    assert all(not r.alarm for r in by_type["flat"])
    assert any(r.alarm for r in by_type["step"])
    # statistics replay the recurrence
    s, want = 0, []
    for c in step[:11]:
        s = max(0, s + c - 6)
        want.append(s)
    assert [r.cusum for r in by_type["step"]] == want


def test_statistic_carries_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 1: days 0-2 at 9/day (kref 6 -> S grows 3,6 after closing 0,1)
    _write_events(
        in_dir / "b1.parquet", _series_rows({"k": [9, 9, 9]})
    )
    q = _run(spark, in_dir, tmp_path, "cusum_xb", kref=6, threshold=100,
             per_file=True)
    try:
        q.processAllAvailable()
        # batch 2: day 3 closes day 2 -> S = 9; continuity proves state carry
        _write_events(
            in_dir / "b2.parquet",
            [(900, T0 + dt.timedelta(days=3), 1, "k", 1.0, "{}")],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        spark.sql("SELECT * FROM cusum_xb").collect(), key=lambda r: r.day
    )
    assert [r.cusum for r in got] == [3, 6, 9]
    assert [r.n for r in got] == [9, 9, 9]


def test_late_day_after_close_is_dropped(spark, tmp_path):
    """Cross-batch straggler for an already-closed day must be DROPPED
    (the documented watermark-style policy), not re-open the day."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_events(in_dir / "b1.parquet", _series_rows({"k": [4, 4]}))  # days 0,1
    q = _run(spark, in_dir, tmp_path, "cusum_late", kref=3, threshold=100,
             per_file=True)
    try:
        q.processAllAvailable()  # closes day 0 (S=1); day 1 open
        # straggler for day 0 plus a day-2 event that closes day 1
        _write_events(
            in_dir / "b2.parquet",
            [
                (800, T0, 1, "k", 1.0, "{}"),  # late: day 0 already closed
                (801, T0 + dt.timedelta(days=2), 1, "k", 1.0, "{}"),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(spark.sql("SELECT * FROM cusum_late").collect(),
                 key=lambda r: r.day)
    # day 0 emitted once with its ORIGINAL count; day 1 count unchanged
    assert [(r.n, r.cusum) for r in got] == [(4, 1), (4, 2)]
