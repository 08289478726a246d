"""Round 8 batch 10: windowFunnel strict modes, M4 downsampling."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_modes_are_ordered(spark):
    """Strict modes can only lose levels vs base; real users' base
    column equals the standalone funnel; the planted users pin every
    mode branch."""
    base = {
        r.user_id: r.funnel_level
        for r in QUERIES["clickhouse_window_funnel"](spark, SF_DIR).collect()
    }
    rows = QUERIES["clickhouse_window_funnel_modes"](spark, SF_DIR).collect()
    got = {r.user_id: r for r in rows}
    assert {u: r.funnel_level for u, r in got.items() if u >= 0} == base
    for r in rows:
        assert 1 <= r.funnel_strict_order <= r.funnel_level <= 3
        assert 1 <= r.funnel_strict_dedup <= r.funnel_level
    # planted user -1: dup click aborts strict_dedup AND strict_order
    p1 = got[-1]
    assert (p1.funnel_level, p1.funnel_strict_order, p1.funnel_strict_dedup) == (3, 2, 2)
    # planted user -2: interleaved signup aborts ONLY strict_order
    p2 = got[-2]
    assert (p2.funnel_level, p2.funnel_strict_order, p2.funnel_strict_dedup) == (3, 1, 3)


def test_m4_bucket_invariants(spark):
    rows = QUERIES["timeseries_m4_downsample"](spark, SF_DIR).collect()
    assert len(rows) == 30
    total = sum(r.n_points for r in rows)
    from pyspark.sql import functions as F

    n = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull())
        .count()
    )
    assert total == n  # every point lands in exactly one bucket
    for r in rows:
        assert r.y_min <= r.y_max
        assert r.y_min <= r.y_first <= r.y_max
        assert r.y_min <= r.y_last <= r.y_max
        assert r.y_min_event != r.y_max_event or r.n_points == 1 or r.y_min == r.y_max
