"""Hand-value tests for the round-3 batch-4 operators: skyline dominance
semantics (strict-dominance ties, duplicate points both kept) and the
OHLC open/close tie-break at equal timestamps."""

from __future__ import annotations

import datetime as dt

from prometheus_clickhouselog_exporter_spark.workloads.relational6 import (
    pareto_frontier_parts,
    timeseries_ohlc_bars,
)


def _write_parts(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
            "p_size": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_pareto_frontier_hand_values(spark, tmp_path):
    # (key, price, size); frontier = min price / max size, strict dominance
    rows = [
        (1, 10.0, 5),  # frontier; duplicate of 2 — neither dominates
        (2, 10.0, 5),  # frontier (duplicate point kept)
        (3, 12.0, 5),  # dominated by 1 (strictly cheaper, same size)
        (4, 12.0, 7),  # frontier (biggest at ≤12)
        (5, 9.0, 3),   # frontier (cheapest overall)
        (6, 13.0, 7),  # dominated by 4 (cheaper, same size)
        (7, 13.0, 8),  # frontier (global max size)
    ]
    sf = _write_parts(tmp_path, rows)
    got = {r.p_partkey for r in pareto_frontier_parts(spark, sf).collect()}
    assert got == {1, 2, 4, 5, 7}


def test_ohlc_open_close_tiebreak(spark, tmp_path):
    from conftest import write_events_parquet

    t0 = dt.datetime(2024, 3, 1, 9, 30)
    rows = [
        # two events at the SAME timestamp: event_id must break the tie —
        # open is id 1's value, not id 2's
        (1, t0, 1, "trade", 5.0),
        (2, t0, 1, "trade", 7.0),
        (3, t0 + dt.timedelta(hours=1), 1, "trade", 6.0),
        # same-ts pair at the close: close must be id 5's value
        (4, t0 + dt.timedelta(hours=2), 1, "trade", 9.0),
        (5, t0 + dt.timedelta(hours=2), 1, "trade", 4.0),
    ]
    write_events_parquet(tmp_path / "events.parquet", rows)
    bars = timeseries_ohlc_bars(spark, str(tmp_path)).collect()
    assert len(bars) == 1
    bar = bars[0]
    assert bar.day == "2024-03-01"
    assert bar.open == 5.0
    assert bar.close == 4.0
    assert bar.high == 9.0
    assert bar.low == 4.0
    assert bar.n_events == 5


def test_interval_overlap_bucket_boundaries(spark, tmp_path):
    from conftest import write_events_parquet

    from prometheus_clickhouselog_exporter_spark.workloads.relational6 import (
        interval_overlap_incidents,
    )

    t = lambda h, m: dt.datetime(2024, 5, 1, h, m)
    rows = [
        # user 1 active 10:30–12:10 → covers hour buckets 10, 11, 12
        (1, t(10, 30), 1, "view", 1.0),
        (2, t(12, 10), 1, "view", 1.0),
        # user 2 triggers incidents in hours 9, 11, 12 (value > 340);
        # its own activity interval is 9:15–12:05 → hours 9..12
        (3, t(9, 15), 2, "error", 400.0),
        (4, t(11, 45), 2, "error", 400.0),
        (5, t(12, 5), 2, "error", 400.0),
    ]
    write_events_parquet(tmp_path / "events.parquet", rows)
    got = {
        r.user_id: (r.n_pairs, r.n_hours, r.first_hour, r.last_hour)
        for r in interval_overlap_incidents(spark, str(tmp_path)).collect()
    }
    # hour 9's incident must NOT hit user 1 (activity starts 10:30) —
    # the bucket explode may not generate hour buckets outside [s, e]
    assert got == {
        1: (2, 2, "2024-05-01 11:00:00", "2024-05-01 12:00:00"),
        2: (3, 3, "2024-05-01 09:00:00", "2024-05-01 12:00:00"),
    }
