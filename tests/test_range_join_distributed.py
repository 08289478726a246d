"""Distributed-CDF fallback for the range self-join: on an outlier-heavy
value domain (span ≫ the dense cap) the helper must AUTO-SELECT the
two-level distributed prefix sum (never a driver-side dense array, never
a raise) and produce the exact brute-force counts; on a moderate domain
both paths must agree row-for-row."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads.relational2 import (
    _neighbor_counts,
)

RADIUS, BW = 5.0, 0.01


def _brute(vals):
    out = {}
    for eid, v in vals:
        n = sum(
            1
            for eid2, v2 in vals
            if eid2 != eid and (v - RADIUS) <= v2 <= (v + RADIUS)
        )
        if n > 0:
            out[eid] = n
    return out


def _df(spark, vals):
    return spark.createDataFrame(vals, "event_id long, value double")


def _run(spark, vals, dense_cap):
    df = _neighbor_counts(
        spark, _df(spark, vals), radius=RADIUS, bw=BW, dense_cap=dense_cap
    )
    return {r.event_id: r.n_neighbors for r in df.collect()}


def _moderate_vals():
    # clustered values with half-open neighborhoods; deterministic
    return [(i, float((i * 37) % 90) / 3.0 + (i % 7) * 0.125) for i in range(120)]


def test_both_paths_agree_on_moderate_domain(spark):
    vals = _moderate_vals()
    expect = _brute(vals)
    assert _run(spark, vals, dense_cap=4_000_000) == expect  # dense
    assert _run(spark, vals, dense_cap=0) == expect  # distributed


def test_outlier_domain_auto_selects_distributed_exact(spark):
    # ±1e7 at bw=0.01 → ~2e9 buckets: far past any sane dense array.
    # With the DEFAULT cap the helper must fall back to the distributed
    # prefix sum on its own (the pre-check is a min/max aggregate, so no
    # giant collect happens first) and still be exact.
    vals = _moderate_vals() + [(1000, 1.0e7), (1001, 1.0e7 + 2.0), (1002, -1.0e7)]
    got = _run(spark, vals, dense_cap=4_000_000)
    assert got == _brute(vals)
    # the outlier pair sees only each other
    assert got[1000] == 1 and got[1001] == 1 and 1002 not in got
    # and the forced-distributed run is identical
    assert _run(spark, vals, dense_cap=0) == got


def test_probe_on_empty_and_boundary_buckets(spark):
    # exact-boundary hits (v2 == v ± radius) are inclusive both sides
    vals = [(1, 0.0), (2, 5.0), (3, -5.0), (4, 10.0), (5, 100.0)]
    expect = _brute(vals)
    assert expect[1] == 2  # ±5 inclusive
    assert _run(spark, vals, dense_cap=0) == expect
    assert _run(spark, vals, dense_cap=4_000_000) == expect
