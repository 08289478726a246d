"""Order-sensitive streaming monitors (runs / lag-1 autocorr): the
boundary element must stitch across micro-batches — a run continuing
over a batch boundary is ONE run, and the (last-of-batch-1,
first-of-batch-2) pair must be counted — so the final state equals the
batch statistic over the full ordered series."""

from __future__ import annotations

import datetime as dt
import math

from prometheus_clickhouselog_exporter_spark.streaming.sequential import (
    _SCALE,
    acf1_stream,
    fold_acf1,
    fold_runs,
    runs_stream,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

T0 = dt.datetime(2024, 9, 1)


def _write_events(path, rows):
    from conftest import write_events_parquet

    write_events_parquet(path, rows)


def _rows(values, start_eid=0):
    return [
        (start_eid + i, T0 + dt.timedelta(seconds=start_eid + i), 1, "view", v, "{}")
        for i, v in enumerate(values)
    ]


def test_fold_runs_additive_with_boundary():
    vals = [1.0, 9.0, 8.0, 2.0, 3.0, 7.0]  # signs: 0 1 1 0 0 1 → 4 runs
    whole = fold_runs(vals, None, 5.0)
    split = fold_runs(vals[3:], fold_runs(vals[:3], None, 5.0), 5.0)
    assert whole == split
    assert whole[2] == 4
    # boundary continuation: split inside a run must NOT add a run
    cont = fold_runs(vals[2:], fold_runs(vals[:2], None, 5.0), 5.0)
    assert cont == whole


def test_fold_acf1_counts_boundary_pair():
    vals = [1.0, 2.0, 3.0, 4.0]
    whole = fold_acf1(vals, None)
    split = fold_acf1(vals[2:], fold_acf1(vals[:2], None))
    assert whole == split
    assert whole[1] == 3  # 3 pairs from 4 values — includes (2.0, 3.0)


def _run_stream(spark, tmp_path, build, b1_vals, b2_vals, qname):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_events(in_dir / "b1.parquet", _rows(b1_vals))
    q = (
        build(
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(in_dir / "b2.parquet", _rows(b2_vals, start_eid=100))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    return max((r for r in rows if r.event_type == "view"), key=lambda r: r.n)


def test_runs_stream_across_batches(spark, tmp_path):
    # batch 1 ends ABOVE, batch 2 starts ABOVE: the run must continue
    b1 = [1.0, 9.0, 8.0]  # runs so far: [below][above,above] = 2
    b2 = [7.0, 2.0, 6.0]  # continues above, then below, then above → 4 total
    final = _run_stream(
        spark, tmp_path, lambda s: runs_stream(s, threshold=5.0), b1, b2, "runs_x"
    )
    assert final.n == 6 and final.n_above == 4 and final.n_below == 2
    assert final.n_runs == 4
    na, nb, n = 4, 2, 6
    expect = math.floor((1.0 + (2.0 * na * nb) / n) * 1e6 + 0.5) / 1e6
    assert final.expected_runs == expect


def test_acf1_stream_across_batches(spark, tmp_path):
    b1 = [1.5, 2.5, 3.5]
    b2 = [4.5, 0.5, 2.0]
    final = _run_stream(spark, tmp_path, acf1_stream, b1, b2, "acf1_x")
    vals = b1 + b2
    qs = [math.floor(v * _SCALE) for v in vals]
    hq, tq = qs[:-1], qs[1:]
    m = len(hq)
    assert final.n == 6 and final.n_pairs == m  # the (3.5, 4.5) pair counted
    num = float(m * sum(h * t for h, t in zip(hq, tq)) - sum(hq) * sum(tq))
    da = float(m * sum(h * h for h in hq) - sum(hq) ** 2)
    db = float(m * sum(t * t for t in tq) - sum(tq) ** 2)
    expect = math.floor((num / (da * db) ** 0.5) * 1e6 + 0.5) / 1e6
    assert final.r1 == expect


def test_fold_delta_sum_boundary():
    from prometheus_clickhouselog_exporter_spark.streaming.sequential import (
        fold_delta_sum,
    )

    vals = [1.00, 3.50, 2.00, 2.25, 9.00]
    # deltas (cents): +250, -150(drop), +25, +675 → ds = 950, drops = 1
    whole = fold_delta_sum(vals, None)
    split = fold_delta_sum(vals[2:], fold_delta_sum(vals[:2], None))
    assert whole == split
    assert whole[:3] == (5, 950, 1)


def test_delta_sum_stream_across_batches(spark, tmp_path):
    from prometheus_clickhouselog_exporter_spark.streaming.sequential import (
        delta_sum_stream,
    )

    # the batch boundary splits a POSITIVE delta (3.0 → 4.0): the
    # boundary cent must carry or the +100 is lost
    b1 = [1.0, 2.0, 3.0]
    b2 = [4.0, 1.5, 5.0]
    final = _run_stream(spark, tmp_path, delta_sum_stream, b1, b2, "dsum_x")
    # deltas: +100 +100 | +100 -250(drop) +350 → ds 650, drops 1
    assert final.n == 6
    assert final.delta_sum_cents == 650
    assert final.n_drops == 1
