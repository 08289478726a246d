"""Streaming Misra–Gries heavy hitters: the deterministic sketch
guarantee must hold on the final summary — estimates never exceed true
counts, undercount is bounded by n/k, and every item above the n/k
threshold is PRESENT — including when the same input arrives split
across micro-batches (state carries the summary forward)."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from prometheus_clickhouselog_exporter_spark.streaming.heavyhitters import (
    heavy_hitters_stream,
    mg_fold,
)

T0 = dt.datetime(2024, 7, 1, 9, 0, 0)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

K = 8


def _corpus():
    """One event_type; user 7 is a true heavy hitter (40% of the stream),
    user 3 moderate, the rest a spread-out tail."""
    pattern = [7, 7, 3, 7, 1, 7, 3, 2, 7, 4, 5, 6, 8, 9, 10, 11, 12, 13]
    rows = []
    for i in range(180):
        u = pattern[i % len(pattern)]
        rows.append((i, T0 + dt.timedelta(seconds=i), u, "click", 1.0))
    return rows


def _check_guarantee(summary_rows, true_counts, n):
    got = {r.user_id: r.est_count for r in summary_rows}
    for u, est in got.items():
        assert est <= true_counts[u], f"overcount for {u}"
        assert true_counts[u] - est <= n / K, f"undercount bound broken for {u}"
    for u, f in true_counts.items():
        if f > n / K:
            assert u in got, f"true heavy hitter {u} missing"


def test_mg_fold_unit_guarantee():
    items = [1] * 50 + [2] * 30 + list(range(100, 140))
    summary = mg_fold({}, items, K)
    c = Counter(items)
    n = len(items)
    assert all(summary[u] <= c[u] for u in summary)
    assert all(u in summary for u in c if c[u] > n / K)


def test_streaming_summary_guarantee_cross_batch(spark, tmp_path):
    from conftest import write_events_parquet

    rows = _corpus()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # two files → with maxFilesPerTrigger=1 the fold spans two batches
    write_events_parquet(in_dir / "a.parquet", rows[:90])
    write_events_parquet(in_dir / "b.parquet", rows[90:])

    stream = heavy_hitters_stream(
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir)),
        k=K,
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("hh")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM hh").collect()
    n_final = max(r.n_seen for r in out)
    assert n_final == len(rows)
    final = [r for r in out if r.n_seen == n_final]
    true_counts = Counter(r[2] for r in rows)
    _check_guarantee(final, true_counts, n_final)
    # the 40% user must be present with a near-exact estimate
    est7 = {r.user_id: r.est_count for r in final}[7]
    assert true_counts[7] - est7 <= n_final / K
