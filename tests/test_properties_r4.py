"""Property-based checks for the round-4 kernels: the two range-join CDF
engines must agree with each other AND with brute force on arbitrary
value sets (including pathological clustering/outliers hypothesis
invents), and the integer-DCT pHash kernel must match an independent
pure-Python evaluation of the same quantized transform on arbitrary
images."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

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


value_lists = st.lists(
    st.floats(min_value=-1000.0, max_value=1000.0, allow_nan=False, width=32),
    min_size=2,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(value_lists)
def test_range_cdf_engines_agree_with_bruteforce(spark, values):
    vals = [(i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(vals, "event_id long, value double")
    expect = _brute(vals)
    dense = {
        r.event_id: r.n_neighbors
        for r in _neighbor_counts(spark, df, RADIUS, BW, dense_cap=4_000_000).collect()
    }
    dist = {
        r.event_id: r.n_neighbors
        for r in _neighbor_counts(spark, df, RADIUS, BW, dense_cap=0).collect()
    }
    assert dense == expect
    assert dist == expect


def _phash_reference(w, h, pid):
    """Independent pure-Python evaluation of the quantized DCT pHash from
    the synth_bmp pixel closed form (math.cos, plain loops — no numpy,
    no shared code path with the kernel)."""
    qc = [
        [
            math.floor(math.cos(math.pi * (2 * x + 1) * u / 64) * 10000 + 0.5)
            for x in range(32)
        ]
        for u in range(8)
    ]
    lum = [[0] * 32 for _ in range(32)]
    for y in range(32):
        sy = (y * h) // 32
        for x in range(32):
            sx = (x * w) // 32
            r = (7 * sx + pid) % 256
            g = (11 * sy + pid) % 256
            b = (sx + sy) % 256
            lum[y][x] = 299 * r + 587 * g + 114 * b
    d = [[0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            acc = 0
            for y in range(32):
                for x in range(32):
                    acc += qc[u][x] * qc[v][y] * lum[y][x]
            d[u][v] = acc
    ac = [d[u][v] for u in range(8) for v in range(8)][1:]
    med = sorted(ac)[31]
    bits = 0
    for pos, val in enumerate(ac):
        if val > med:
            bits |= 1 << pos
    return bits, d[0][0], med


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=0, max_value=100_000))
def test_phash_kernel_matches_pure_python(spark, doc_id):
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        phash_dct,
        synth_bmp,
    )

    df = spark.createDataFrame([(doc_id,)], "doc_id long")
    row = phash_dct(synth_bmp(df, "doc_id")).collect()[0]
    w, h = 16 + doc_id % 16, 8 + (doc_id * 3) % 16
    bits, dc, med = _phash_reference(w, h, doc_id)
    assert row.phash == bits
    assert row.dc_coeff == dc
    assert row.ac_median == med
