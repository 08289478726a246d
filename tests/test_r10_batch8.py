"""Round 10 batch 8: grid DBSCAN, Hilbert manifest, closeness
centrality, sumMap combinators, Horvitz-Thompson, Hodges-Lehmann,
mRMR — semantic invariants beyond the hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_dbscan_recovers_planted_blobs(spark):
    rows = QUERIES["spatial_dbscan_grid"](spark, SF_DIR).collect()
    assert all(r.converged for r in rows)
    # the plan plants exactly 3 dense 7x7 blobs at (10,10)/(25,35)/(40,15)
    assert len(rows) == 3
    ids = sorted(r.cluster_id for r in rows)
    # each cluster id is the min core pid of its blob: within the blob's
    # 7x7 (+1 border) bounding box
    boxes = [(10, 10), (25, 35), (40, 15)]
    for cid in ids:
        x, y = cid // 50, cid % 50
        assert any(abs(x - bx) <= 4 and abs(y - by) <= 4 for bx, by in boxes)
    assert all(7 * 7 - 10 <= r.n_core_cells <= 9 * 9 for r in rows)
    assert all(r.n_events >= r.n_core_cells for r in rows)


def test_hilbert_is_a_bijection_and_locality(spark):
    # the 16-bit Hilbert index must be a bijection on the 256x256 grid:
    # check on a synthetic full 64x64 quadrant via the registered query
    # path over a crafted events table
    import tempfile

    rows = [
        (i * 64 + j, "2024-01-01 00:00:00", i, "view", j / 10.0, None)
        for i in range(64)
        for j in range(64)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = QUERIES["layout_hilbert_manifest"](spark, td).collect()
    # 4096 distinct points -> 4096 distinct h values (bijection within
    # the visited range): per-tile counts sum to 4096 and h ranges are
    # disjoint across tiles
    assert sum(r.n_rows for r in out) == 4096
    spans = sorted((r.h_min, r.h_max) for r in out)
    assert all(a2 > b1 for (_, b1), (a2, _) in zip(spans, spans[1:]))
    # Hilbert locality: each tile's x/y bounding box is narrow —
    # a 4096-cell contiguous Hilbert segment fits in a box far smaller
    # than the full 256-wide domain (Morton's worst case)
    assert all(r.x_max - r.x_min <= 64 and r.y_max - r.y_min <= 64 for r in out)


def test_closeness_monotone_and_bounds(spark):
    rows = QUERIES["graph_closeness_centrality"](spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n1 == r.degree  # radius-1 set IS the neighbor set
        assert r.harmonic6 == 6 * r.n1 + 3 * r.n2 + 2 * r.n3
        if r.closeness3 is not None:
            assert 1.0 / 3 - 1e-9 <= r.closeness3 <= 1.0


def test_summap_consistency(spark):
    rows = QUERIES["clickhouse_summap_battery"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_cents <= r.max_cents
        assert r.min_cents * r.n_maps <= r.sum_cents <= r.max_cents * r.n_maps


def test_horvitz_thompson_pps_identity(spark):
    r = QUERIES["sample_horvitz_thompson"](spark, SF_DIR).collect()[0]
    assert r.n_certainty == 0
    assert r.n_sampled > 0
    # y proportional to size -> every sampled HT term is exactly sum/n,
    # so the ratio IS n_sampled/n up to per-row quantization; the
    # deviation from 1.0 is pure Poisson sample-size noise
    assert abs(r.revenue_ratio - r.n_sampled / 500.0) < 1e-6
    assert abs(r.revenue_ratio - 1.0) < 0.2
    # population-size estimate is unbiased but noisy; sane-range check
    assert 0.3 * r.n_pop < r.est_n < 3.0 * r.n_pop


def test_hodges_lehmann_between_min_max(spark):
    rows = QUERIES["stats_hodges_lehmann"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_pairs >= 1
        assert r.hl_dollars > 0
        # hl2 is a realized Walsh sum: even parity impossible to assert,
        # but the dollars form must equal hl2/200 rounded
        assert abs(r.hl_dollars - round(r.hl2_cents / 200.0, 4)) < 1e-6


def test_mrmr_structure(spark):
    rows = QUERIES["ml_mrmr_feature_select"](spark, SF_DIR).collect()
    assert len(rows) == 4
    assert sum(1 for r in rows if r.is_first) == 1
    first = next(r for r in rows if r.is_first)
    # the first pick maximizes relevance
    assert all(first.rel_q >= r.rel_q for r in rows)
    assert first.mrmr_q is None
    # later picks: mrmr score = relevance - redundancy <= relevance
    for r in rows:
        if not r.is_first:
            assert r.mrmr_q <= r.rel_q
